package graft.util

/** Shared minimal JSON string encoding — one spelling of the escape rules
  * ([[graft.Verify]]'s oracle_sql.json dump and [[graft.Bench]]'s in-window
  * oracle handoff must produce bytes `json.load` accepts; a stray tab or CR
  * in builder-authored SQL would otherwise silently zero a round's
  * correctness sheet). */
object JsonText {
  /** Escape backslash, quote, and ALL control chars (<0x20) and wrap in
    * double quotes. */
  def str(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** `{"k": "v", ...}` object of string pairs. */
  def obj(kvs: Iterable[(String, String)]): String =
    kvs.map { case (k, v) => s"${str(k)}: ${str(v)}" }.mkString("{", ",", "}")
}
