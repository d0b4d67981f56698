package graft

/** The one JSON escaper behind both driver-facing mains (Verify's
  * oracle_sql.json, Bench's stdout line + bench_full.json). One
  * definition: an escaping fix cannot silently reach one consumer and
  * miss the other — the two hand-rolled copies had already drifted in
  * their explicit-arm lists. Locale hazard note: every NUMBER printed
  * next to these strings must go through [[num]], not `f"$v%.3f"` —
  * Scala's f interpolator delegates to the JVM default locale, and a
  * de_DE/fr_FR machine renders 1.234 as "1,234", which is invalid JSON
  * that zeroes the round when the driver's json.load throws. */
private[graft] object JsonOut {
  /** Escape backslash, quote, and ALL control chars (<0x20). */
  def str(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' =>
      String.format(java.util.Locale.ROOT, "\\u%04x", Integer.valueOf(c.toInt))
    case c => c.toString
  } + "\""

  /** Locale-independent fixed-point rendering for JSON number fields. */
  def num(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
}
