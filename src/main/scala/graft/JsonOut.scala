package graft

/** Tiny shared JSON emission helpers for the driver-facing mains.
  *
  * One implementation for both Verify (oracle_sql.json) and Bench
  * (BENCH_OUT.json) so the hardening cannot diverge: full string
  * escaping (backslash, quote, ALL control chars — a tab in
  * builder-authored SQL or a quoted path would make the driver's
  * json.load fail and silently zero a round's results) and
  * locale-independent number formatting (a decimal-comma default locale
  * would emit invalid JSON through the f interpolator).
  */
object JsonOut {

  def str(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  def num(v: Double, dp: Int): String =
    String.format(java.util.Locale.ROOT, s"%.${dp}f", Double.box(v))
}
