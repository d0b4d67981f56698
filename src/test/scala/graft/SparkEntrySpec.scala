package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the driver contract's map hygiene — the registries are the
  * correctness gate's roster, so a structural slip here silently
  * changes WHAT gets verified, which no per-gate signal can catch. */
class SparkEntrySpec extends AnyFunSuite {

  test("every oracle names a registered gate; every gate carries an oracle") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    // an oracle without a gate is dead text that LOOKS like coverage
    assert((o -- q).isEmpty,
      s"oracleSql entries with no gate: ${(o -- q).toSeq.sorted.mkString(", ")}")
    // the contract allows rows-only gates (no oracle), but every gate
    // today is hash-checked — a NEW gate landing without its oracle is
    // almost always an oversight, so the set difference must be
    // consciously acknowledged here if one is ever intended
    assert((q -- o).isEmpty,
      s"gates with no oracle (rows-only): ${(q -- o).toSeq.sorted.mkString(", ")}")
  }

  test("gate names are stable identifiers: non-empty, no whitespace or path separators") {
    val bad = SparkEntry.queries.keySet.filter(n =>
      n.isEmpty || n.exists(c => c.isWhitespace || c == '/' || c == '\\'))
    // Verify writes each gate's parquet to outDir/<name>: a separator or
    // space in a name silently nests or mangles the output path
    assert(bad.isEmpty, s"unusable gate names: ${bad.mkString(", ")}")
  }
}
