package graft

/** ONE JSON string escaper for the two CLI mains — Verify's oracle/
  * failure manifests and Bench's result line are both parsed by the
  * driver's json.load, and two hand-rolled escapers had already
  * drifted (named escapes vs \\u00XX). Escapes backslash, quote, and
  * ALL control chars; everything else passes through.
  */
object Json {
  def str(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""
}
