package graft

/** Minimal JSON string escaping, shared by every driver-side JSON
  * emitter (Verify's oracle_sql.json, Graph's D3 force-layout export)
  * so the escape table lives in exactly one place. */
object Strings {
  def jsonEscape(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }
}
