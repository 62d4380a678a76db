package graft

/** Minimal JSON string escaping shared by the harness writers (Bench's
  * error fields, Verify's oracle_sql.json): backslash, quote, and ALL
  * control chars — a partially-escaped Spark plan dump or builder-authored
  * SQL would make the driver's json.load fail and zero the round's
  * record. */
private[graft] object JsonUtil {
  def escape(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  def quote(s: String): String = "\"" + escape(s) + "\""
}
