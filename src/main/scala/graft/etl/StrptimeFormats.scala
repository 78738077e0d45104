package graft.etl

/** Translation of Python `strptime`/`strftime` directives (the
  * reference's configured date formats, `config/app_config.yaml:12-24`)
  * to java.time patterns usable by Spark's `to_timestamp`/`date_format`.
  *
  * Two modes:
  *  - parse patterns use single-letter fields (`M`, `d`, `H`, ...) so
  *    1-or-2-digit values parse, matching strptime's leniency
  *    (`strptime("3/4/2025", "%m/%d/%Y")` succeeds);
  *  - format patterns use padded fields (`MM`, `dd`, ...) matching
  *    strftime's zero-padding on output.
  *
  * Documented divergences from CPython (SURVEY §7.4.3):
  *  - `%z` → `XX`: accepts `+0000` and `Z` but not `+00:00`;
  *  - `%f` → `SSSSSS`: requires exactly 6 fractional digits on parse
  *    (strptime accepts 1–6);
  *  - offsets are normalized to the session zone (UTC) rather than
  *    preserved, so `%z` output is always `+0000`.
  */
object StrptimeFormats {

  private val parseMap = Map(
    'Y' -> "y", 'y' -> "yy", 'm' -> "M", 'd' -> "d",
    'H' -> "H", 'I' -> "h", 'M' -> "m", 'S' -> "s",
    'p' -> "a", 'z' -> "XX", 'f' -> "SSSSSS", 'j' -> "D")

  private val formatMap = Map(
    'Y' -> "yyyy", 'y' -> "yy", 'm' -> "MM", 'd' -> "dd",
    'H' -> "HH", 'I' -> "hh", 'M' -> "mm", 'S' -> "ss",
    'p' -> "a", 'z' -> "XX", 'f' -> "SSSSSS", 'j' -> "DDD")

  def toParsePattern(strptime: String): String = translate(strptime, parseMap)

  def toFormatPattern(strftime: String): String = translate(strftime, formatMap)

  /** True when the directive string carries a UTC-offset field — the
    * transform uses this to decide whether the canonical datetime output
    * gets an offset suffix (naive datetimes print without one, exactly
    * like strftime's empty `%z` on a naive value).
    */
  def hasOffsetDirective(strptime: String): Boolean = strptime.contains("%z")

  private def translate(fmt: String, map: Map[Char, String]): String = {
    val out = new StringBuilder
    val quoted = new StringBuilder
    def flushQuoted(): Unit = if (quoted.nonEmpty) {
      out.append('\'').append(quoted.toString).append('\'')
      quoted.clear()
    }
    var i = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%') {
        if (i + 1 >= fmt.length)
          throw new ConfigError(s"Dangling '%' in date format '$fmt'.")
        val d = fmt.charAt(i + 1)
        if (d == '%') quoted.append('%')
        else {
          flushQuoted()
          out.append(map.getOrElse(d,
            throw new ConfigError(s"Unsupported strptime directive '%$d' in '$fmt'.")))
        }
        i += 2
      } else {
        if (c.isLetter) quoted.append(c)
        else if (c == '\'') { flushQuoted(); out.append("''") }
        else { flushQuoted(); out.append(c) }
        i += 1
      }
    }
    flushQuoted()
    out.toString
  }
}
