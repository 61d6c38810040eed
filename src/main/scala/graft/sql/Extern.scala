package graft.sql

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Druid MSQ's `TABLE(EXTERN('<inputSource>', '<inputFormat>',
  * '<signature>'))` table function — the standard wire shape for
  * SQL-based batch ingestion from external files (`INSERT INTO t
  * SELECT ... FROM TABLE(EXTERN(...)) PARTITIONED BY DAY`) and for
  * ad-hoc querying of raw files. Real Druid hands the three JSON
  * literals to MSQ workers; here the rewrite compiles them to a
  * `spark.read` and substitutes a registered temp view into the SQL
  * text, so the broker's SQL endpoints (sync, statements, ingestion)
  * all accept the EXTERN shape unchanged.
  *
  * Supported inputSources: `local` (`files` list or `baseDir` +
  * `filter` glob) and `inline` (`data`). Supported inputFormats:
  * `json`, `csv`, `tsv` (delimiter + `findColumnsFromHeader` /
  * explicit `columns`), and `parquet`. Signature types: string / long
  * / double / float. Anything else fails loudly with the unsupported
  * piece named — never a silent partial read. Scale note: the rewrite
  * only BUILDS a plan; file listing and reading stay Spark's
  * (splittable, partition-parallel, pushdown-capable for parquet).
  *
  * The rewrite is textual but string-literal-aware: EXTERN inside a
  * quoted literal is left alone; the three arguments are parsed with
  * SQL `''` escape handling.
  */
object Extern {
  private val mapper = new ObjectMapper()

  /** Rewrite every `TABLE(EXTERN(...))` into a temp-view reference.
    * Returns the SQL unchanged when no EXTERN call is present.
    */
  def rewrite(spark: SparkSession, sql: String): String = {
    if (!sql.toUpperCase(java.util.Locale.ROOT).contains("EXTERN")) return sql
    // java.lang.StringBuilder: scala's overloads turn append(s, i, j)
    // into varargs-of-Any (a stringified tuple)
    val out = new java.lang.StringBuilder
    var i = 0
    val n = sql.length
    val upper = sql.toUpperCase(java.util.Locale.ROOT)
    while (i < n) {
      val c = sql.charAt(i)
      if (c == '\'') { // skip string literals ('' = escaped quote)
        val end = literalEnd(sql, i)
        out.append(sql, i, end)
        i = end
      } else if (c == '"' || c == '`') { // quoted identifiers
        val close = sql.indexOf(c, i + 1)
        val end = if (close < 0) n else close + 1
        out.append(sql, i, end)
        i = end
      } else if (c == '-' && i + 1 < n && sql.charAt(i + 1) == '-') {
        // line comment: a commented-out EXTERN must stay text
        val nl = sql.indexOf('\n', i)
        val end = if (nl < 0) n else nl + 1
        out.append(sql, i, end)
        i = end
      } else if (c == '/' && i + 1 < n && sql.charAt(i + 1) == '*') {
        val close = sql.indexOf("*/", i + 2)
        val end = if (close < 0) n else close + 2
        out.append(sql, i, end)
        i = end
      } else if ((c == 'T' || c == 't') && upper.startsWith("TABLE", i) &&
                 isWordBoundary(sql, i - 1)) {
        matchTableExtern(sql, i) match {
          case Some((argText, end0)) =>
            // Druid 26+'s console emits the EXTENDS form: a 2-argument
            // EXTERN followed by SQL-typed columns
            val (extendsSig, end) = matchExtends(sql, end0)
            out.append(registerView(spark, argText, extendsSig))
            i = end
          case None =>
            out.append(c); i += 1
        }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  private def isWordBoundary(s: String, i: Int): Boolean =
    i < 0 || !(Character.isLetterOrDigit(s.charAt(i)) || s.charAt(i) == '_')

  /** End index (exclusive) of the string literal starting at `start`. */
  private def literalEnd(s: String, start: Int): Int = {
    var i = start + 1
    while (i < s.length) {
      if (s.charAt(i) == '\'') {
        if (i + 1 < s.length && s.charAt(i + 1) == '\'') i += 2
        else return i + 1
      } else i += 1
    }
    throw new IllegalArgumentException(
      s"EXTERN rewrite: unterminated string literal at offset $start")
  }

  /** If `TABLE` at `i` opens `TABLE ( EXTERN ( ... ) )`, return the
    * EXTERN argument text and the index just past TABLE's ')'.
    */
  private def matchTableExtern(sql: String, i: Int)
      : Option[(String, Int)] = {
    var p = i + "TABLE".length
    def skipWs(): Unit =
      while (p < sql.length && Character.isWhitespace(sql.charAt(p))) p += 1
    skipWs()
    if (p >= sql.length || sql.charAt(p) != '(') return None
    p += 1; skipWs()
    val up = sql.toUpperCase(java.util.Locale.ROOT)
    if (!up.startsWith("EXTERN", p) ||
        !isWordBoundary(sql, p - 1)) return None
    p += "EXTERN".length; skipWs()
    if (p >= sql.length || sql.charAt(p) != '(') return None
    // balanced-paren scan over EXTERN's args, literal-aware
    val argStart = p + 1
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
    if (depth != 0) throw new IllegalArgumentException(
      "EXTERN rewrite: unbalanced parentheses in EXTERN(...)")
    val argEnd = p - 1
    var q = p
    while (q < sql.length && Character.isWhitespace(sql.charAt(q))) q += 1
    if (q >= sql.length || sql.charAt(q) != ')')
      throw new IllegalArgumentException(
        "EXTERN rewrite: TABLE(EXTERN(...)) missing the closing ')'")
    Some((sql.substring(argStart, argEnd), q + 1))
  }

  /** If an `EXTENDS (col TYPE, ...)` clause follows position `i`,
    * parse it into a schema (Druid's SQL-typed signature form — what
    * the console's data-loader wizard emits with a 2-argument EXTERN).
    * Returns (None, i) when no EXTENDS follows.
    */
  private def matchExtends(sql: String, i: Int): (Option[StructType], Int) = {
    var p = i
    def skipWs(): Unit =
      while (p < sql.length && Character.isWhitespace(sql.charAt(p))) p += 1
    skipWs()
    val up = sql.toUpperCase(java.util.Locale.ROOT)
    if (!up.startsWith("EXTENDS", p) || !isWordBoundary(sql, p - 1) ||
        !isWordBoundary(sql, p + "EXTENDS".length)) return (None, i)
    p += "EXTENDS".length; skipWs()
    if (p >= sql.length || sql.charAt(p) != '(')
      throw new IllegalArgumentException(
        "EXTERN ... EXTENDS must be followed by a (col TYPE, ...) list")
    p += 1
    val cols = Seq.newBuilder[StructField]
    var done = false
    while (!done) {
      skipWs()
      val name =
        if (p < sql.length && sql.charAt(p) == '"') {
          val close = sql.indexOf('"', p + 1)
          if (close < 0) throw new IllegalArgumentException(
            "EXTENDS: unterminated quoted column name")
          val s = sql.substring(p + 1, close); p = close + 1; s
        } else {
          val start = p
          while (p < sql.length && (Character.isLetterOrDigit(sql.charAt(p)) ||
                 sql.charAt(p) == '_')) p += 1
          if (p == start) throw new IllegalArgumentException(
            s"EXTENDS: expected a column name at: ${sql.substring(p).take(20)}")
          sql.substring(start, p)
        }
      skipWs()
      val tStart = p
      while (p < sql.length && Character.isLetter(sql.charAt(p))) p += 1
      val sqlType = sql.substring(tStart, p)
      cols += StructField(name, sqlType.toUpperCase(java.util.Locale.ROOT) match {
        case "VARCHAR" | "STRING"          => StringType
        case "BIGINT" | "INTEGER" | "INT"  => LongType
        case "DOUBLE"                      => DoubleType
        case "FLOAT" | "REAL"              => FloatType
        case other => throw new IllegalArgumentException(
          s"EXTENDS: unsupported column type '$other' " +
            "(VARCHAR|BIGINT|DOUBLE|FLOAT)")
      })
      skipWs()
      if (p >= sql.length) throw new IllegalArgumentException(
        "EXTENDS: unterminated column list")
      sql.charAt(p) match {
        case ',' => p += 1
        case ')' => p += 1; done = true
        case ch => throw new IllegalArgumentException(
          s"EXTENDS: expected ',' or ')', got '$ch'")
      }
    }
    (Some(StructType(cols.result())), p)
  }

  /** Parse EXTERN's comma-separated SQL string-literal arguments. */
  private[sql] def parseArgs(argText: String): Seq[String] = {
    val args = Seq.newBuilder[String]
    var i = 0
    def skipWs(): Unit =
      while (i < argText.length &&
             Character.isWhitespace(argText.charAt(i))) i += 1
    var expect = true
    while ({ skipWs(); i < argText.length }) {
      if (expect) {
        if (argText.charAt(i) != '\'')
          throw new IllegalArgumentException(
            "EXTERN arguments must be string literals, got: " +
              argText.substring(i).take(30))
        val end = literalEnd(argText, i)
        args += argText.substring(i + 1, end - 1).replace("''", "'")
        i = end; expect = false
      } else {
        if (argText.charAt(i) != ',')
          throw new IllegalArgumentException(
            s"EXTERN: expected ',' between arguments at: " +
              argText.substring(i).take(30))
        i += 1; expect = true
      }
    }
    args.result()
  }

  private def sparkType(t: String): DataType =
    t.toLowerCase(java.util.Locale.ROOT) match {
      case "string" => StringType
      case "long"   => LongType
      case "double" => DoubleType
      case "float"  => FloatType
      case other => throw new IllegalArgumentException(
        s"EXTERN signature: unsupported column type '$other' " +
          "(string|long|double|float)")
    }

  private def schemaOf(signature: JsonNode): StructType = {
    if (!signature.isArray || !signature.elements().hasNext)
      throw new IllegalArgumentException(
        "EXTERN signature must be a non-empty JSON array of " +
          """{"name":...,"type":...} columns""")
    import scala.jdk.CollectionConverters._
    StructType(signature.elements().asScala.map { c =>
      val name = c.path("name").asText("")
      if (name.isEmpty) throw new IllegalArgumentException(
        s"EXTERN signature column missing a name: $c")
      StructField(name, sparkType(c.path("type").asText("string")))
    }.toSeq)
  }

  /** Build the DataFrame for one EXTERN call and register it as a
    * deterministic content-keyed temp view; returns the view name.
    */
  private def registerView(spark: SparkSession, argText: String,
                           extendsSig: Option[StructType]): String = {
    val args = parseArgs(argText)
    val schema = (args.length, extendsSig) match {
      case (3, None)      => schemaOf(mapper.readTree(args(2)))
      case (2, Some(sig)) => sig
      case (3, Some(_)) => throw new IllegalArgumentException(
        "EXTERN: give the signature EITHER as the 3rd argument OR as " +
          "an EXTENDS clause, not both")
      case (nArgs, _) => throw new IllegalArgumentException(
        s"EXTERN takes (inputSource, inputFormat, signature) or " +
          s"(inputSource, inputFormat) EXTENDS (col TYPE, ...); got " +
          s"$nArgs arguments" +
          (if (extendsSig.isDefined) " with EXTENDS" else ""))
    }
    val srcJson = args(0)
    val fmtJson = args(1)
    val df = read(spark, mapper.readTree(srcJson), mapper.readTree(fmtJson),
      schema)
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest((srcJson + "|" + fmtJson + "|" + schema.catalogString)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(8).map(b => f"$b%02x").mkString
    val view = s"extern_$key"
    df.createOrReplaceTempView(view)
    view
  }

  private def read(spark: SparkSession, src: JsonNode, fmt: JsonNode,
                   schema: StructType): DataFrame = {
    import scala.jdk.CollectionConverters._
    val fmtType = fmt.path("type").asText("")
    // reader options shared by the path and inline branches
    def csvOptions: Map[String, String] = {
      val delim = fmtType match {
        case "tsv" => Option(fmt.get("delimiter")).map(_.asText())
          .getOrElse("\t")
        case _ => ","
      }
      Map("delimiter" -> delim,
        "header" -> fmt.path("findColumnsFromHeader").asBoolean(false)
          .toString)
    }
    src.path("type").asText("") match {
      case "local" =>
        val files: Seq[String] =
          if (src.hasNonNull("files"))
            src.path("files").elements().asScala.map(_.asText()).toSeq
          else {
            val base = src.path("baseDir").asText("")
            val filter = src.path("filter").asText("*")
            if (base.isEmpty) throw new IllegalArgumentException(
              "EXTERN local inputSource needs 'files' or 'baseDir'")
            Seq(s"${base.stripSuffix("/")}/$filter")
          }
        if (files.isEmpty) throw new IllegalArgumentException(
          "EXTERN local inputSource: empty files list")
        fmtType match {
          case "json" => spark.read.schema(schema).json(files: _*)
          case "csv" | "tsv" =>
            spark.read.schema(schema).options(csvOptions).csv(files: _*)
          case "parquet" =>
            // signature projects + casts (Druid reads parquet columns
            // by name; extra file columns are dropped)
            import org.apache.spark.sql.functions.col
            spark.read.parquet(files: _*)
              .select(schema.fields.toSeq
                .map(f => col(f.name).cast(f.dataType)): _*)
          case other => throw new IllegalArgumentException(
            s"EXTERN: unsupported inputFormat type '$other' " +
              "(json|csv|tsv|parquet)")
        }
      case "inline" =>
        val data = src.path("data").asText("")
        import spark.implicits._
        val lines = spark.createDataset(
          data.split("\n", -1).toIndexedSeq.filter(_.nonEmpty))
        fmtType match {
          case "json" => spark.read.schema(schema).json(lines)
          case "csv" | "tsv" =>
            spark.read.schema(schema).options(csvOptions).csv(lines)
          case other => throw new IllegalArgumentException(
            s"EXTERN: unsupported inline inputFormat '$other' (json|csv|tsv)")
        }
      case other => throw new IllegalArgumentException(
        s"EXTERN: unsupported inputSource type '$other' (local|inline) — " +
          "remote sources (http/s3/...) are not reachable from this engine")
    }
  }
}
