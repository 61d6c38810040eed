package graft.sql

/** Druid SQL's `UNNEST` (Druid 26+) — the shape the web console and
  * dashboards emit against multi-value dimensions:
  *
  * {{{
  *   SELECT d, count(*) FROM t CROSS JOIN UNNEST(MV_TO_ARRAY("tags"))
  *     AS u (d) GROUP BY 1
  *   SELECT d FROM t, UNNEST(tags) AS u (d)
  * }}}
  *
  * Spark has no UNNEST keyword; the exact equivalent is a lateral
  * generator: `FROM t LATERAL VIEW explode(expr) u AS d`. Both Druid's
  * inner-unnest semantics and explode drop null/empty arrays, so the
  * rewrite is semantics-preserving. The scan is literal- and
  * identifier-quote-aware (an UNNEST inside a string stays text), the
  * array expression is taken with a balanced-paren scan, and anything
  * outside the modeled grammar (`[CROSS JOIN | ,] UNNEST ( expr ) AS
  * alias ( col )`) is left for Spark's parser to reject loudly —
  * never silently reshaped.
  */
object Unnest {

  def rewrite(sql: String): String = {
    if (!sql.toUpperCase(java.util.Locale.ROOT).contains("UNNEST")) return sql
    val out = new java.lang.StringBuilder
    val n = sql.length
    val upper = sql.toUpperCase(java.util.Locale.ROOT)
    var i = 0
    while (i < n) {
      val c = sql.charAt(i)
      if (c == '\'') {
        val end = literalEnd(sql, i)
        out.append(sql, i, end); i = end
      } else if (c == '"' || c == '`') {
        val close = sql.indexOf(c, i + 1)
        val end = if (close < 0) n else close + 1
        out.append(sql, i, end); i = end
      } else if (c == '-' && i + 1 < n && sql.charAt(i + 1) == '-') {
        // line comment: a commented-out UNNEST must stay text
        val nl = sql.indexOf('\n', i)
        val end = if (nl < 0) n else nl + 1
        out.append(sql, i, end); i = end
      } else if (c == '/' && i + 1 < n && sql.charAt(i + 1) == '*') {
        val close = sql.indexOf("*/", i + 2)
        val end = if (close < 0) n else close + 2
        out.append(sql, i, end); i = end
      } else if ((c == 'C' || c == 'c') && upper.startsWith("CROSS", i) &&
                 wordBoundary(sql, i - 1)) {
        matchUnnest(sql, upper, i, lead = "CROSS") match {
          case Some((repl, end)) => out.append(repl); i = end
          case None              => out.append(c); i += 1
        }
      } else if (c == ',') {
        matchUnnest(sql, upper, i, lead = ",") match {
          case Some((repl, end)) => out.append(repl); i = end
          case None              => out.append(c); i += 1
        }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  private def wordBoundary(s: String, i: Int): Boolean =
    i < 0 || !(Character.isLetterOrDigit(s.charAt(i)) || s.charAt(i) == '_')

  private def literalEnd(s: String, start: Int): Int = {
    var i = start + 1
    while (i < s.length) {
      if (s.charAt(i) == '\'') {
        if (i + 1 < s.length && s.charAt(i + 1) == '\'') i += 2
        else return i + 1
      } else i += 1
    }
    s.length
  }

  /** Match `<lead> UNNEST ( expr ) AS alias ( col )` starting at `i`
    * (`lead` = "CROSS" expecting "CROSS JOIN UNNEST", or "," expecting
    * ", UNNEST"). Returns the LATERAL VIEW replacement text and the
    * index past the matched region.
    */
  private def matchUnnest(sql: String, upper: String, i: Int,
                          lead: String): Option[(String, Int)] = {
    var p = i
    def skipWs(): Unit =
      while (p < sql.length && Character.isWhitespace(sql.charAt(p))) p += 1
    def word(w: String): Boolean = {
      skipWs()
      if (upper.startsWith(w, p) && wordBoundary(sql, p - 1) &&
          wordBoundary(sql, p + w.length)) { p += w.length; true }
      else false
    }
    def identifier(): Option[String] = {
      skipWs()
      if (p < sql.length && sql.charAt(p) == '"') {
        val close = sql.indexOf('"', p + 1)
        if (close < 0) return None
        val name = sql.substring(p + 1, close)
        p = close + 1
        Some(s"`$name`")
      } else {
        val start = p
        while (p < sql.length && (Character.isLetterOrDigit(sql.charAt(p)) ||
               sql.charAt(p) == '_')) p += 1
        if (p == start) None else Some(sql.substring(start, p))
      }
    }
    if (lead == "CROSS") {
      if (!word("CROSS") || !word("JOIN")) return None
    } else p += 1 // the comma
    if (!word("UNNEST")) return None
    skipWs()
    if (p >= sql.length || sql.charAt(p) != '(') return None
    // balanced-paren scan over the array expression
    val exprStart = p + 1
    var depth = 1
    p += 1
    while (p < sql.length && depth > 0) {
      sql.charAt(p) match {
        case '\'' => p = literalEnd(sql, p)
        case '('  => depth += 1; p += 1
        case ')'  => depth -= 1; p += 1
        case _    => p += 1
      }
    }
    if (depth != 0) return None
    val expr = sql.substring(exprStart, p - 1)
    if (!word("AS")) return None
    val alias = identifier() getOrElse { return None }
    skipWs()
    if (p >= sql.length || sql.charAt(p) != '(') return None
    p += 1
    val col = identifier() getOrElse { return None }
    skipWs()
    if (p >= sql.length || sql.charAt(p) != ')') return None
    p += 1
    Some((s" LATERAL VIEW explode($expr) $alias AS $col ", p))
  }
}
