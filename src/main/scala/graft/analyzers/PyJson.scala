package graft.analyzers

/** Python `json.dumps` compatible primitives, shared by every serializer
  * that upholds the byte-identity contract (tables, diagrams, verify
  * dumps) — one copy so the escape/repr rules cannot drift apart. */
object PyJson {

  /** String escaping exactly as json.dumps: named escapes for the common
    * controls, \\uXXXX only for the rest below 0x20. */
  def jsString(s: String): String = "\"" + s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case '\b' => "\\b"
    case '\f' => "\\f"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Python float repr for JSON/CSV: integral doubles render with a
    * trailing .0 (json.dumps(2.0) == "2.0"); others via shortest
    * Double.toString (matches repr for the fixture value range). */
  def floatRepr(d: Double): String =
    if (d == d.toLong.toDouble && math.abs(d) < 1e15) s"${d.toLong}.0"
    else d.toString
}
