#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs AFTER `sbt "runMain graft.Verify <sfDir> <outDir>"`:
reads each <outDir>/<name> parquet (Spark result), runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB over the same
testdata parquet, and compares row count, column names, and a
value hash (columns sorted by name, rows sorted).

Usage: python3 tools/selfcheck.py <sfDir> <outDir>
"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(val):
    import math, decimal, datetime
    if val is None:
        return "NULL"
    if isinstance(val, float):
        if math.isnan(val):
            return "NaN"
        return repr(round(val, 9))
    if isinstance(val, decimal.Decimal):
        # exact canonicalization — float() would collapse >53-bit decimals
        return str(val.normalize())
    if isinstance(val, (datetime.datetime, datetime.date)):
        return val.isoformat()
    if isinstance(val, list):
        return "[" + ",".join(canon(v) for v in val) + "]"
    if isinstance(val, bytes):
        return val.hex()
    return str(val)


def table_hash(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    canon_rows = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    import hashlib
    h = hashlib.sha256()
    for r in canon_rows:
        h.update(r.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        spark_dir = f"{out_dir}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        srel = con.sql(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
        scols, srows = srel.columns, srel.fetchall()
        try:
            orel = con.sql(oracle[name])
            ocols, orows = orel.columns, orel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            n_fail += 1
            continue
        ok = True
        msgs = []
        if sorted(scols) != sorted(ocols):
            ok = False
            msgs.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
        if len(srows) != len(orows):
            ok = False
            msgs.append(f"rows spark={len(srows)} oracle={len(orows)}")
        if ok and table_hash(srows, scols) != table_hash(orows, ocols):
            ok = False
            # find first differing row for debugging
            so = sorted(range(len(scols)), key=lambda i: scols[i])
            oo = sorted(range(len(ocols)), key=lambda i: ocols[i])
            sc = sorted("|".join(canon(r[i]) for i in so) for r in srows)
            oc = sorted("|".join(canon(r[i]) for i in oo) for r in orows)
            for a, b in zip(sc, oc):
                if a != b:
                    msgs.append(f"first diff:\n  spark : {a[:300]}\n  oracle: {b[:300]}")
                    break
        # Type-parity lint: the driver's hash canon is representational, so
        # wide DECIMALs / HUGEINT / cross-engine type drift can hash red even
        # when values match bit-for-bit (round 2: 12 such gates). Warn-only —
        # a couple of long-green gates still carry DECIMAL(38,x).
        stypes = {c: str(t) for c, t in zip(scols, srel.types)}
        otypes = {c: str(t) for c, t in zip(ocols, orel.types)}
        warns = []
        for c in sorted(set(stypes) | set(otypes)):
            st, ot = stypes.get(c), otypes.get(c)
            if st != ot:
                warns.append(f"{c}: spark={st} oracle={ot}")
            for t in (st, ot):
                if t and ("HUGEINT" in t or
                          (t.startswith("DECIMAL") and int(t.split("(")[1].split(",")[0]) > 18)):
                    warns.append(f"{c}: wide {t}")
        for w in sorted(set(warns)):
            print(f"TYPEWARN {name}: {w}")
        if ok:
            n_pass += 1
            print(f"PASS {name} ({len(srows)} rows)")
        else:
            n_fail += 1
            print(f"FAIL {name}: " + "; ".join(msgs))
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
