package graft.io

/** Minimal JSON string escaping shared by the driver-contract mains
  * ([[graft.Verify]] writes oracle_sql.json, [[graft.Bench]] prints the
  * metrics line). ONE copy: the two hand-rolled escapers had already
  * diverged in strategy, and an escaping fix applied to only one would
  * silently corrupt the other's output. Escapes backslash, quote, and ALL
  * control chars (< 0x20) — a tab or CR in builder-authored SQL would
  * otherwise make the driver's json.load fail and zero the round's
  * correctness. */
object JsonText {
  def quote(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
