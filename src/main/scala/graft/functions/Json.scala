package graft.functions

/** Minimal JSON string escaping, shared by every hand-rolled JSON emitter
  * in the repo (Bench result line, Verify's oracle_sql.json, the REST
  * facade) — one implementation so an escaping fix can't silently miss a
  * copy. Escapes quote, backslash, and ALL control chars (named escapes
  * for the common ones, \\uXXXX for the rest). */
object Json {

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
