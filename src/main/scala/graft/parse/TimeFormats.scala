package graft.parse

/** Layout translation for the time parser
  * (`pkg/stanza/operator/helper/time.go:19-83` in `/root/reference`):
  * reference configs carry strptime (`%Y-%m-%d`) or Go reference-time
  * (`2006-01-02`) layouts; Spark's `to_timestamp` wants Java
  * DateTimeFormatter patterns. The strptime directive table mirrors
  * `internal/coreinternal/timeutils/internal/ctimefmt/ctimefmt.go:22-63`.
  *
  * Literal text between directives is single-quoted whenever it contains
  * letters — unquoted letters are pattern characters to Java (a layout
  * like `%Y-%m-%dT%H:%M:%SZ` has literal `T`/`Z` that must not parse as
  * directives).
  */
object TimeFormats {

  /** strptime directive → Java DateTimeFormatter fragment. Directives
    * with no Java equivalent (`%s` epoch, `%w`/`%k` exotic zone forms)
    * are rejected — callers use the epoch layout type for those. */
  private val strptimeToJavaTable: Map[String, String] = Map(
    "%Y" -> "yyyy", "%y" -> "yy",
    "%m" -> "MM", "%q" -> "M",
    "%b" -> "MMM", "%h" -> "MMM", "%B" -> "MMMM",
    "%d" -> "dd", "%g" -> "d", "%e" -> "d",
    "%a" -> "EEE", "%A" -> "EEEE",
    "%H" -> "HH", "%I" -> "hh", "%l" -> "h",
    "%p" -> "a", "%P" -> "a",
    "%M" -> "mm", "%S" -> "ss",
    "%L" -> "SSS", "%f" -> "SSSSSS",
    "%Z" -> "zzz", "%z" -> "XX", "%i" -> "X", "%j" -> "XXX",
    "%D" -> "MM/dd/yyyy", "%x" -> "MM/dd/yyyy", "%F" -> "yyyy-MM-dd",
    "%T" -> "HH:mm:ss", "%X" -> "HH:mm:ss",
    "%r" -> "hh:mm:ss a", "%R" -> "HH:mm",
    "%n" -> "\n", "%t" -> "\t", "%%" -> "%"
  )

  /** Go reference-time token → Java fragment, longest-match-first
    * (the gotime layout type; `time.go:62-66` passes these through to
    * Go's time.Parse). */
  private val gotimeTokens: Seq[(String, String)] = Seq(
    "2006" -> "yyyy", "06" -> "yy",
    "January" -> "MMMM", "Jan" -> "MMM",
    "Monday" -> "EEEE", "Mon" -> "EEE",
    "01" -> "MM", "02" -> "dd", "03" -> "hh", "04" -> "mm", "05" -> "ss",
    "15" -> "HH",
    ".000000000" -> ".SSSSSSSSS", ".000000" -> ".SSSSSS", ".000" -> ".SSS",
    ".999999999" -> "[.SSSSSSSSS]", ".999999" -> "[.SSSSSS]", ".999" -> "[.SSS]",
    "PM" -> "a", "pm" -> "a",
    "MST" -> "zzz",
    "Z070000" -> "XXXX", "Z0700" -> "XX", "Z07:00" -> "XXX", "Z07" -> "X",
    "-070000" -> "xxxx", "-0700" -> "xx", "-07:00" -> "xxx", "-07" -> "x",
    "_2" -> "d", "1" -> "M", "2" -> "d", "3" -> "h", "4" -> "m", "5" -> "s"
  )

  private def quoteLiteral(s: String): String =
    if (s.isEmpty) s
    else if (s.exists(c => c.isLetter || c == '\'')) "'" + s.replace("'", "''") + "'"
    else s

  /** Translate a strptime layout to a Java pattern. */
  def strptimeToJava(layout: String): String = {
    val out = new StringBuilder
    val lit = new StringBuilder
    def flush(): Unit = { out ++= quoteLiteral(lit.result()); lit.clear() }
    var i = 0
    while (i < layout.length) {
      if (layout(i) == '%' && i + 1 < layout.length) {
        val d = layout.substring(i, i + 2)
        strptimeToJavaTable.get(d) match {
          case Some(j) => flush(); out ++= j
          case None => throw new IllegalArgumentException(
            s"unsupported strptime directive '$d' (use layout_type=epoch for %s)")
        }
        i += 2
      } else { lit += layout(i); i += 1 }
    }
    flush()
    out.result()
  }

  /** Translate a Go reference-time layout to a Java pattern. */
  def gotimeToJava(layout: String): String = {
    val out = new StringBuilder
    val lit = new StringBuilder
    def flush(): Unit = { out ++= quoteLiteral(lit.result()); lit.clear() }
    var i = 0
    while (i < layout.length) {
      gotimeTokens.find { case (tok, _) => layout.startsWith(tok, i) } match {
        case Some((tok, j)) => flush(); out ++= j; i += tok.length
        case None => lit += layout(i); i += 1
      }
    }
    flush()
    out.result()
  }
}
