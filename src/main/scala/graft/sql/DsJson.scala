package graft.sql

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Druid SQL's JSON function family over the engine's JSON-text
  * surface (COMPLEX&lt;json&gt; columns read back as JSON strings —
  * both the blob and the NestedCommonFormat encodings):
  * JSON_VALUE / JSON_QUERY / JSON_KEYS / JSON_PATHS /
  * PARSE_JSON / TRY_PARSE_JSON. Jackson-based row functions for the
  * SQL-compat tail — not hot-path expressions; equality filters on
  * json_value still get bitmap pushdown through MvBitmapRewrite
  * because the selection contract is text-rendering-superset.
  *
  * Path subset: `$` root, `.key` object steps, `[n]` array steps
  * (Druid's simple-path dialect). Anything else fails loudly at parse.
  */
object DsJson {
  private val mapper = new ObjectMapper()

  private sealed trait Step
  private final case class Key(k: String) extends Step
  private final case class Idx(i: Int) extends Step

  private def parsePath(path: String): Seq[Step] = {
    require(path != null && path.startsWith("$"),
      s"JSON path must start with '$$': $path")
    val out = scala.collection.mutable.ArrayBuffer[Step]()
    var i = 1
    while (i < path.length) path.charAt(i) match {
      case '.' =>
        val end0 = path.indexWhere(c => c == '.' || c == '[', i + 1)
        val end = if (end0 < 0) path.length else end0
        require(end > i + 1, s"empty key in JSON path: $path")
        out += Key(path.substring(i + 1, end))
        i = end
      case '[' =>
        val end = path.indexOf(']', i)
        require(end > i + 1, s"unterminated [ in JSON path: $path")
        val inner = path.substring(i + 1, end)
        require(inner.forall(_.isDigit), s"non-numeric array index in: $path")
        out += Idx(inner.toInt)
        i = end + 1
      case c => throw new IllegalArgumentException(
        s"unexpected '$c' in JSON path: $path")
    }
    out.toSeq
  }

  /** Node at `path` within `text`, or null when missing/unnavigable. */
  private def nodeAt(text: String, path: String): JsonNode = {
    if (text == null) return null
    val root =
      try mapper.readTree(text)
      catch { case _: Exception => return null }
    parsePath(path).foldLeft(root) { (n, s) =>
      if (n == null) return null
      s match {
        case Key(k) => if (n.isObject) n.get(k) else return null
        case Idx(i) => if (n.isArray) n.get(i) else return null
      }
    }
  }

  /** SCALAR text at path (Druid JSON_VALUE): numbers/booleans render
    * their JSON text, strings come back raw (unquoted); objects,
    * arrays, JSON null, and missing paths answer SQL NULL.
    */
  def jsonValue(text: String, path: String): String = {
    val n = nodeAt(text, path)
    if (n == null || n.isNull || n.isContainerNode) null else n.asText()
  }

  /** JSON serialization of ANY node at path (Druid JSON_QUERY):
    * strings come back QUOTED, containers as their JSON text; missing
    * answers SQL NULL.
    */
  def jsonQuery(text: String, path: String): String = {
    val n = nodeAt(text, path)
    if (n == null) null else n.toString
  }

  /** Keys of the OBJECT at path (Druid JSON_KEYS); null when the node
    * is not an object. Declaration order (Jackson preserves it).
    */
  def jsonKeys(text: String, path: String): Array[String] = {
    val n = nodeAt(text, path)
    if (n == null || !n.isObject) null
    else {
      val out = scala.collection.mutable.ArrayBuffer[String]()
      n.fieldNames().forEachRemaining(out += _)
      out.toArray
    }
  }

  /** All LEAF paths in the document (Druid JSON_PATHS), array steps as
    * `[i]`, sorted for determinism. An empty object/array is itself a
    * leaf. Null text answers SQL NULL.
    */
  def jsonPaths(text: String): Array[String] = {
    if (text == null) return null
    val root =
      try mapper.readTree(text)
      catch { case _: Exception => return null }
    val out = scala.collection.mutable.ArrayBuffer[String]()
    def walk(prefix: String, n: JsonNode): Unit =
      if (n.isObject && n.size() > 0)
        n.properties().forEach(e => walk(s"$prefix.${e.getKey}", e.getValue))
      else if (n.isArray && n.size() > 0)
        (0 until n.size()).foreach(i => walk(s"$prefix[$i]", n.get(i)))
      else out += prefix
    walk("$", root)
    out.toArray.sorted
  }

  /** Parse-validate-normalize (Druid PARSE_JSON): canonical Jackson
    * serialization of the text; INVALID input throws (the strict
    * form).
    */
  def parseJson(text: String): String =
    if (text == null) null
    else try mapper.writeValueAsString(mapper.readTree(text))
    catch { case e: Exception => throw new IllegalArgumentException(
      s"PARSE_JSON: invalid JSON: ${e.getMessage}") }

  /** Like parseJson but answers SQL NULL on invalid input
    * (Druid TRY_PARSE_JSON).
    */
  def tryParseJson(text: String): String =
    if (text == null) null
    else try mapper.writeValueAsString(mapper.readTree(text))
    catch { case _: Exception => null }
}
