package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Domain-level curation: URL canonicalization, registered-domain
  * extraction, and per-domain blocklist/cap policy — the provenance
  * stage every large crawl-derived corpus runs before mixing.
  *
  * Everything here is pure `Column` expression composition (regexes +
  * higher-order array functions), deliberately NOT `parse_url`: the
  * exact same regexes replay in any engine with regexp_extract
  * (DuckDB, Trino, ...), so canonical URLs computed by an upstream
  * system and by this library agree byte-for-byte — the property that
  * makes URL-keyed dedup and blocklists composable across systems.
  * Scale: narrow maps, fully codegen'd, no shuffle; the blocklist is a
  * broadcast anti-join and the cap is [[Sampling.capPerGroup]]'s
  * group-limit-pushed window.
  */
object Domains {

  /** RFC-3986-shaped component extraction. Each regex returns "" when
    * the component is absent (both Spark and DuckDB `regexp_extract`
    * contract), so downstream CASEs need no null handling. */
  private def scheme(c: Column): Column =
    lower(regexp_extract(c, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
  private def authority(c: Column): Column =
    regexp_extract(c, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1)
  private def afterUserinfo(c: Column): Column =
    regexp_extract(authority(c), "^(?:[^@]*@)?(.*)$", 1)

  /** Lowercased host with any userinfo@ and :port stripped. A bracketed
    * IPv6 literal keeps its brackets and its inner colons — a bare
    * `[^:]*` capture would truncate `[::1]` to `[`, merging every IPv6
    * host into one key. */
  def hostOf(c: Column): Column = {
    val a = afterUserinfo(c)
    lower(when(a.startsWith("["), regexp_extract(a, "^(\\[[^\\]]*\\])", 1))
      .otherwise(regexp_extract(a, "^([^:]*)", 1)))
  }

  private def port(c: Column): Column = {
    val a = afterUserinfo(c)
    when(a.startsWith("["), regexp_extract(a, "^\\[[^\\]]*\\]:([0-9]+)$", 1))
      .otherwise(regexp_extract(a, "^[^:]*:([0-9]+)$", 1))
  }
  private def rawPath(c: Column): Column =
    regexp_extract(c, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)
  /** Query = after the first `?` of the PRE-FRAGMENT prefix. Matching
    * `\?` over the whole URL would find a `?` inside the fragment
    * (`#/route?tab=2`) and leak fragment content into the canonical
    * query, splitting identical resources. */
  private def rawQuery(c: Column): Column =
    regexp_extract(regexp_extract(c, "^([^#]*)", 1), "\\?(.*)$", 1)

  /** Query params that identify a CLICK, not a resource — their removal
    * is what lets the same article fetched from a newsletter and from
    * search collapse to one canonical key. */
  private val TrackingParam = "^(utm_[^=]*|gclid|fbclid|msclkid|ref)="

  /** Canonical form of a URL, the key for URL-level dedup and domain
    * policy: lowercase scheme+host, `www.` prefix dropped, default
    * ports (http:80, https:443) dropped, duplicate slashes collapsed
    * and the trailing slash trimmed (root stays `/`, empty path becomes
    * `/`), tracking params dropped and the survivors sorted by byte
    * order, fragment dropped. Non-default ports and non-tracking param
    * VALUES are preserved — canonicalization must never merge two
    * genuinely different resources. Input without a `scheme://` yields
    * "" (callers filter, nothing invents a scheme). */
  def canonicalizeUrl(c: Column): Column = {
    val host = regexp_replace(hostOf(c), "^www\\.", "")
    val sch = scheme(c)
    val portPart = when(
      port(c) === "" ||
        (sch === "http" && port(c) === "80") ||
        (sch === "https" && port(c) === "443"), "")
      .otherwise(concat(lit(":"), port(c)))
    val path0 = regexp_replace(rawPath(c), "/{2,}", "/")
    val path = when(path0 === "", "/")
      .otherwise(regexp_replace(path0, "(.)/$", "$1"))
    val params = array_sort(filter(
      split(rawQuery(c), "&"),
      p => p =!= "" && !p.rlike(TrackingParam)))
    val queryPart = when(size(params) === 0, "")
      .otherwise(concat(lit("?"), array_join(params, "&")))
    when(sch === "" || host === "", "")
      .otherwise(concat(sch, lit("://"), host, portPart, path, queryPart))
  }

  /** The second-level public suffixes under which the registered domain
    * is the THIRD label from the right. A deliberately small embedded
    * list (the common ccTLD second levels), not the full Mozilla PSL —
    * the policy decisions this feeds (blocklists, per-domain caps) key
    * on these; swap in the full list as a dim table join if a corpus
    * needs exotic suffixes. */
  val SecondLevelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "co.jp", "ne.jp", "or.jp",
    "com.au", "net.au", "org.au", "co.nz", "com.br", "com.cn", "com.tw",
    "co.in", "co.kr", "com.mx", "com.sg", "com.tr", "com.ar")

  /** eTLD+1 of a URL's host: the last two labels, or the last three
    * when the last two are a second-level public suffix (`a.b.co.uk` →
    * `b.co.uk`). Hosts with fewer labels than that pass through
    * unchanged (a bare `localhost` is its own domain), and IP literals
    * — bracketed IPv6 or dotted IPv4 — are their own domain whole (the
    * public-suffix rule is for DNS names; slicing an IPv4's last two
    * octets would pool unrelated addresses under one policy key). */
  def registeredDomain(c: Column): Column = {
    val host = regexp_replace(hostOf(c), "^www\\.", "")
    val labels = split(host, "\\.")
    val last2 = array_join(slice(labels, -2, 2), ".")
    val last3 = array_join(slice(labels, -3, 3), ".")
    when(host.startsWith("[") || host.rlike("^[0-9.]+$"), host)
      .otherwise(when(size(labels) <= lit(2), host)
        .otherwise(when(last2.isin(SecondLevelSuffixes: _*), last3)
          .otherwise(last2)))
  }

  /** [[registeredDomain]] with the suffix list as a DIM TABLE instead of
    * the embedded constant — the shape for a FULL public-suffix list
    * (Mozilla's PSL is ~10k second-level entries): the list ships as
    * one broadcast left join keyed on the host's last two labels, so
    * the corpus never shuffles and the suffix set updates without a
    * code change. One column `suffix` ("co.uk", "com.bd", ...); hosts
    * whose last two labels match a row take three labels, all others
    * two — the identical rule as the embedded list, IP-literal and
    * short-host cases included. Adds `outCol`; input must not carry
    * __-prefixed columns (reserved for internals, rejected loudly).
    * The join key is the host's LAST TWO labels, so only two-label
    * suffix rows can ever match — a full PSL carries deeper entries
    * ("pref.aichi.jp") and wildcards ("*.ck") this rule cannot honor,
    * and silently ignoring them would hand out wrong policy keys; such
    * rows fail the job loudly instead (filter the PSL to its two-label
    * subset deliberately if that is the intended policy). */
  def withRegisteredDomain(df: DataFrame, urlCol: String, outCol: String,
      suffixes: DataFrame): DataFrame = {
    val reserved = df.columns.filter(_.startsWith("__"))
    require(reserved.isEmpty,
      "withRegisteredDomain: __-prefixed input columns collide with " +
        s"internals: ${reserved.mkString(", ")}")
    val host = regexp_replace(hostOf(col(urlCol)), "^www\\.", "")
    val sfx = lower(col("suffix"))
    val dim = broadcast(suffixes.select(
      when(size(split(sfx, "\\.")) === 2, sfx)
        .otherwise(raise_error(concat(
          lit("withRegisteredDomain: suffix '"), sfx,
          lit("' is not a two-label public suffix — this rule matches the " +
            "host's last two labels only; filter deeper/wildcard PSL " +
            "entries out deliberately")))).as("__sfx")).distinct())
    val labels = split(col("__host"), "\\.")
    df.withColumn("__host", host)
      .withColumn("__l2", array_join(slice(labels, -2, 2), "."))
      .withColumn("__l3", array_join(slice(labels, -3, 3), "."))
      .join(dim, col("__l2") === col("__sfx"), "left")
      .withColumn(outCol,
        when(col("__host").startsWith("[") ||
            col("__host").rlike("^[0-9.]+$"), col("__host"))
          .otherwise(when(size(labels) <= lit(2), col("__host"))
            .otherwise(when(col("__sfx").isNotNull, col("__l3"))
              .otherwise(col("__l2")))))
      .drop("__host", "__l2", "__l3", "__sfx")
  }

  /** Registered domain under FULL public-suffix-list semantics — the
    * Mozilla PSL algorithm (publicsuffix.org/list): among all rules
    * matching the host, an exception rule (`!www.ck`) prevails and its
    * public suffix is the rule minus its first label; otherwise the rule
    * with the MOST labels prevails, a wildcard label (`*.ck`) matching
    * exactly one host label; no match falls back to the implicit `*`
    * rule (the bare TLD is the suffix). The registered domain is the
    * public suffix plus one more label.
    *
    * `psl` is one column `rule` in raw PSL file syntax — comment lines
    * (`//`) and blanks are dropped (that is file syntax, not data);
    * anything else malformed — embedded whitespace, empty labels, a `*`
    * anywhere but as the whole first label, a wildcard exception, or a
    * rule deeper than `maxLabels` — fails the job loudly (raising
    * `maxLabels` is a deliberate caller decision; the real PSL's deepest
    * rules are 5 labels).
    *
    * Shape at scale: the PSL ships ONCE as a broadcast dim keyed by rule
    * pattern; the corpus takes `2·maxLabels−1` broadcast-hash probes (one
    * exact key per depth, one wildcard key per depth ≥ 2 — the broadcast
    * exchange is built once and reused) and never shuffles. Per-row cost
    * is a handful of hash lookups, NOT a scan of the 10k-rule list —
    * this is why the rules pre-aggregate to a (pattern → kind) map
    * instead of a per-TLD rule array evaluated with interpreted
    * higher-order functions.
    *
    * Unlike [[registeredDomain]] the host is NOT `www.`-stripped: the
    * algorithm already collapses `www.example.com` → `example.com`, and
    * stripping would corrupt exception domains (`www.ck` IS the
    * registered domain for `*.www.ck`). IP literals (bracketed IPv6 or
    * dotted IPv4), hosts carrying a literal `*`, and empty hosts pass
    * through whole — the PSL is a DNS-name rule set. Hosts with no more
    * labels than their public suffix (the host IS a suffix) also pass
    * through whole, matching [[registeredDomain]]'s convention. */
  def withRegisteredDomainPsl(df: DataFrame, urlCol: String, outCol: String,
      psl: DataFrame, maxLabels: Int = 4): DataFrame = {
    require(maxLabels >= 2 && maxLabels <= 8,
      s"withRegisteredDomainPsl: maxLabels must be in [2,8], got $maxLabels")
    val reservedHit = df.columns.filter(_.startsWith("__"))
    require(reservedHit.isEmpty,
      "withRegisteredDomainPsl: __-prefixed input columns collide with " +
        s"internals: ${reservedHit.mkString(", ")}")

    // ---- dim: validate + normalize rules, aggregate to pattern → kinds
    val raw = lower(trim(col("rule")))
    val isE = col("__raw").startsWith("!")
    val body0 = when(isE, expr("substring(__raw, 2)")).otherwise(col("__raw"))
    val checked = when(
        col("__body").rlike("\\s") || col("__body") === "" ||
          col("__body").startsWith(".") || col("__body").endsWith(".") ||
          col("__body").contains(".."),
        raise_error(concat(lit("withRegisteredDomainPsl: malformed PSL rule '"),
          col("__raw"), lit("'"))))
      .when(col("__body").contains("*") &&
          (isE || !col("__body").rlike("^\\*\\.[^*]+$")),
        raise_error(concat(lit("withRegisteredDomainPsl: rule '"), col("__raw"),
          lit("' — '*' is only valid as the whole first label of a " +
            "non-exception rule"))))
      .when(size(split(col("__body"), "\\.")) > maxLabels,
        raise_error(concat(lit("withRegisteredDomainPsl: rule '"), col("__raw"),
          lit(s"' is deeper than maxLabels=$maxLabels labels — raise " +
            "maxLabels deliberately"))))
      .otherwise(col("__body"))
    val dim = broadcast(psl
      .select(raw.as("__raw"))
      .filter(col("__raw") =!= "" && !col("__raw").startsWith("//"))
      .select(col("__raw"), body0.as("__body"))
      .select(checked.as("__pat"), isE.as("__is_e"))
      .groupBy("__pat")
      .agg(max(when(col("__is_e"), 1).otherwise(0)).===(1).as("__has_e"),
        max(when(col("__is_e"), 0).otherwise(1)).===(1).as("__has_r")))

    // ---- corpus: one candidate key per (depth, kind), one broadcast
    // probe each; a key is null when the host is too shallow for it, so
    // a short host can never false-match a deeper rule
    val host = hostOf(col(urlCol))
    val labels = split(col("__h"), "\\.")
    val n = size(labels)
    def lastK(k: Int): Column = array_join(slice(labels, -k, k), ".")
    var cur = df.withColumn("__h", host)
    for (d <- 1 to maxLabels)
      cur = cur.withColumn(s"__x$d", when(n >= d, lastK(d)))
    for (d <- 2 to maxLabels)
      cur = cur.withColumn(s"__y$d",
        when(n >= d, concat(lit("*."), lastK(d - 1))))
    for (d <- 1 to maxLabels)
      cur = cur.join(
        dim.select(col("__pat").as(s"__px$d"), col("__has_e").as(s"__e$d"),
          col("__has_r").as(s"__r$d")),
        col(s"__x$d") === col(s"__px$d"), "left")
    for (d <- 2 to maxLabels)
      cur = cur.join(
        dim.select(col("__pat").as(s"__py$d"), col("__has_r").as(s"__w$d")),
        col(s"__y$d") === col(s"__py$d"), "left")

    // exception prevails (deepest first; suffix = rule minus first
    // label), else the deepest normal/wildcard rule, else implicit `*`
    val exc = (maxLabels to 1 by -1).foldRight(lit(null).cast("int")) {
      (d, elseC) => when(coalesce(col(s"__e$d"), lit(false)), lit(d - 1)).otherwise(elseC)
    }
    def hit(d: Int): Column = {
      val r = coalesce(col(s"__r$d"), lit(false))
      if (d >= 2) r || coalesce(col(s"__w$d"), lit(false)) else r
    }
    val norm = (maxLabels to 2 by -1).foldRight(lit(1)) {
      (d, elseC) => when(hit(d), lit(d)).otherwise(elseC)
    }
    val ps = coalesce(exc, norm)
    val out = when(col("__h").startsWith("[") ||
        col("__h").rlike("^[0-9.]+$") || col("__h").contains("*") ||
        col("__h") === "", col("__h"))
      .otherwise(when(n <= ps, col("__h"))
        .otherwise(array_join(slice(labels, -(ps + lit(1)), ps + lit(1)), ".")))
    val internal = cur.columns.filter(_.startsWith("__"))
    cur.withColumn(outCol, out).drop(internal: _*)
  }

  /** Drop every row whose URL's registered domain is blocklisted.
    * Blocklists are curated by hand — thousands of entries at most — so
    * the list ships as a broadcast anti-join and the corpus never
    * shuffles. Matching is on the registered domain (the unit takedown
    * requests name), not the full host: blocking `spam.example`
    * blocks `cdn.spam.example` too. */
  def filterBlockedDomains(df: DataFrame, urlCol: String,
      blockedDomains: Seq[String]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val block = blockedDomains.map(_.toLowerCase).distinct.toDF("__blocked")
    df.join(broadcast(block),
        registeredDomain(col(urlCol)) === col("__blocked"), "left_anti")
  }

  /** Keep at most `n` rows per registered domain, best-first by
    * `orderBy` — the anti-monoculture cap that stops one mega-site from
    * dominating a training mix. Delegates to [[Sampling.capPerGroup]],
    * so the map-side WindowGroupLimit bounds a hot domain's shuffle
    * cost at O(n), not O(domain). */
  def capPerDomain(df: DataFrame, urlCol: String,
      orderBy: Seq[Column], n: Int): DataFrame =
    Sampling.capPerGroup(
      df.withColumn("domain", registeredDomain(col(urlCol))),
      "domain", orderBy, n)
}
