package graft.query

import java.sql.Timestamp
import java.time.{Instant, LocalDateTime, ZoneOffset}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType, LongType, StringType, StructField, StructType}

/** Compiler from Druid NATIVE QUERY JSON to a Spark DataFrame plan.
  *
  * Druid's primary wire API is not SQL but native JSON queries
  * (timeseries / topN / groupBy / scan / search / timeBoundary); every
  * Druid SQL statement is itself planned into one of these. The
  * reference bridge only accepts SQL (/root/reference/src/main.rs:65,
  * 186-191), so a Druid user's existing dashboards and native-query
  * clients cannot run against it. This object closes that gap the
  * Spark-first way: the JSON is compiled into a declarative
  * DataFrame plan — filters become `Column` predicates that flow
  * through the DSv2 connector's pushdowns (interval zone pruning,
  * dictionary bitmap selection, metadata aggregates), aggregations
  * become Catalyst aggregate expressions, and Catalyst/Tungsten pick
  * the physical strategy. Nothing here executes row-at-a-time.
  *
  * Supported surface (unsupported constructs throw
  * `IllegalArgumentException` naming the construct — never silently
  * wrong):
  *
  *  - query types: `timeseries`, `topN`, `groupBy`, `scan`, `search`,
  *    `timeBoundary`, `segmentMetadata` (merged, relationalized),
  *    `dataSourceMetadata`
  *  - `intervals`: ISO-8601 `start/end` ranges (plain array or
  *    `{"type":"intervals"}` object), OR-ed, end-exclusive
  *  - `filter`: selector, equals, in, bound (orderings lexicographic,
  *    numeric, alphanumeric, strlen — others fail loudly),
  *    range, like, regex, search (contains / insensitive_contains /
  *    fragment), null, interval, and/or/not, columnComparison
  *    (null-safe, like Druid's), spatial (rectangular + radius over
  *    comma-joined coordinate dimensions), and `expression` in
  *    Druid's native expression language (translated by [[DruidExpr]];
  *    plain Spark SQL also accepted as a fallback). Dimension filters
  *    (selector/in/bound/like/regex/search) honor an attached
  *    `extractionFn`, comparing the transformed value like Druid.
  *  - `virtualColumns`: type `expression`, same dialect handling —
  *    `timestamp_floor(__time, 'P1D')`, `case_searched`, `&&`/`==`,
  *    double-quoted identifiers, 0-based substring/strpos all work as
  *    a real Druid client sends them
  *  - `granularity`: `all`, the simple string granularities
  *    second/minute/hour/day/week/month/quarter/year, and
  *    `{"type":"period"}` for their ISO-period spellings — including
  *    a `timeZone`: buckets are LOCAL calendar periods (truncated in
  *    local wall time, reported as UTC instants; 23/25-hour days
  *    across DST), Druid's period-granularity semantics. `origin`
  *    fails loudly.
  *  - `aggregations`: count, longSum/doubleSum/floatSum,
  *    longMin/longMax/doubleMin/doubleMax/floatMin/floatMax,
  *    doubleMean, the first/last-by-__time family
  *    (long/double/float/string First/Last → min_by/max_by), the
  *    sketch family — `thetaSketch` (build over raw values, merge over
  *    COMPLEX blobs; real DataSketches wire format),
  *    `quantilesDoublesSketch`, `HLLSketchBuild`, `hyperUnique`
  *    (mapped to DataSketches HLL), `cardinality` (byRow and by-value),
  *    `arrayOfDoublesSketch` (Tuple: build from `metricColumns` or
  *    merge blobs without them; finalizes to the distinct estimate),
  *    `tDigestSketch` (build or blob-merge; stays a mergeable blob —
  *    Druid returns the sketch itself),
  *    `variance`/`varianceFold` (druid-stats; estimator "population"
  *    vs default sample) — and `filtered` wrapping any of those.
  *    Sketch aggregators
  *    follow Druid's finalization contract: raw mergeable blobs feed
  *    the post-aggregators, and result columns finalize to
  *    estimate / stream-length unless `context.finalize: false`.
  *  - `postAggregations`: arithmetic (+ - * / with Druid's
  *    divide-by-zero→0 rule, and `quotient` for plain FP division),
  *    fieldAccess / finalizingFieldAccess, constant, expression,
  *    thetaSketchEstimate, thetaSketchSetOp (UNION/INTERSECT/NOT),
  *    quantilesDoublesSketchToQuantile(s), hllSketchEstimate, the
  *    arrayOfDoublesSketch family (ToEstimate / ToMetricsSumEstimate /
  *    ToNumEntries / SetOp UNION|INTERSECT|NOT),
  *    quantile(s)FromTDigestSketch, stddev
  *    (druid-stats, over a variance aggregator)
  *  - timeseries empty-bucket fill (context `skipEmptyBuckets` absent
  *    or false): bucket spine generated with `sequence()` and
  *    left-joined; count-family aggregates fill with 0, value
  *    aggregates with NULL — Druid's SQL-compatible null mode. Fill
  *    needs exactly one interval and a real granularity; otherwise
  *    only the non-empty buckets are returned. `context.grandTotal`
  *    appends the all-buckets combined row (timestamp null) last,
  *    outside any limit, like Druid's.
  *  - search runs over string dimensions and (beyond Druid) multi-value
  *    dimensions by exploding them; result rows are
  *    (dimension, value, count) like Druid's.
  *
  * Documented deviations, chosen for engine determinism:
  *  - topN is exact, not approximate (Druid's topN trades accuracy for
  *    per-node heaps; on Spark the exact groupBy-sort-limit is one
  *    shuffle anyway), and ties on the metric break by dimension value
  *    ascending (Druid leaves ties unspecified).
  *  - groupBy with no `limitSpec` sorts by the dimensions ascending
  *    (Druid's default ordering); a `limitSpec` ordering gets the
  *    remaining dimensions appended ascending as tie-breaks. limitSpec
  *    columns honor an explicit `dimensionOrder` and topN honors the
  *    dimension-metric `ordering` (the same StringComparators as bound
  *    filters: lexicographic/numeric/alphanumeric/strlen); dimension
  *    specs honor `outputType`.
  *  - `granularity: "all"` timeseries returns the bare aggregate row
  *    without a synthetic interval-start timestamp column; with
  *    `context.grandTotal` the single result row already IS the grand
  *    total, so no duplicate total row is appended (Druid emits the
  *    same values twice).
  */
object NativeQuery {

  private val mapper = new ObjectMapper()

  /** Compile and run `json` against tables resolved by name. */
  def run(json: String, resolve: String => DataFrame): DataFrame =
    runNode(mapper.readTree(json), resolve)

  private def runNode(q: JsonNode, resolve: String => DataFrame): DataFrame = {
    val base0 = resolveDataSource(q.path("dataSource"), resolve)
    val base0b = pushComparatorBounds(base0, q)
    val base0c = pushMvContains(base0b, q)
    val base0d = pushNestedEq(base0c, q)
    val base1 = withVirtualColumns(base0d, q)
    val base = applyWhere(base1, q)
    q.path("queryType").asText() match {
      case "timeseries"   => timeseries(base, q)
      case "topN"         => topN(base, q)
      case "groupBy"      => groupByQuery(base, q)
      case "scan"         => scan(base, q)
      case "search"       => search(base, q)
      case "timeBoundary" => timeBoundary(base, q)
      case "segmentMetadata"    => segmentMetadata(base, q)
      case "dataSourceMetadata" => dataSourceMetadata(base, q)
      case other =>
        fail(s"queryType '$other' (supported: timeseries, topN, groupBy, scan, search, timeBoundary, segmentMetadata, dataSourceMetadata)")
    }
  }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"native query: unsupported $msg")

  /** Column reference by Druid name. Prefixed join columns ("l.v")
    * contain dots, which Spark's bare `col` would read as struct
    * access — backtick anything beyond plain identifiers.
    */
  private def ref(name: String): Column =
    if (name.forall(c => c.isLetterOrDigit || c == '_')) col(name)
    else col(s"`$name`")

  /** A Druid expression-language string → Catalyst. Translated by
    * [[DruidExpr]] (the real wire dialect: `==`, `&&`, `^`,
    * double-quoted identifiers, 0-based offsets, `timestamp_floor`,
    * `case_searched`, ...); text that is not parseable Druid-expr
    * falls back to Spark SQL verbatim, so SQL-leaning clients keep
    * working. Either way the result is a declarative expression —
    * never a row-at-a-time evaluator.
    */
  private def druidExpr(s: String): Column = {
    // translated output references compat functions (time_*, mv_*,
    // lookup, ...): make this self-sufficient rather than depending on
    // some earlier query having registered them (once-guarded → cheap)
    graft.sql.DruidSqlCompat.register(SparkSession.active)
    try expr(DruidExpr.toSparkSql(s))
    catch { case _: IllegalArgumentException => expr(s) }
  }

  // ---- datasources -------------------------------------------------------

  /** Druid's datasource tree → a DataFrame. Beyond plain table names
    * this covers the composite datasources a real Druid cluster serves
    * (the reference accepts only a single segment directory):
    *
    *  - `table` / bare string — resolved by name
    *  - `union` — unionByName over the members (Druid aligns by column
    *    name and null-fills columns a member lacks)
    *  - `query` — a nested native query, compiled recursively (Druid's
    *    groupBy-on-groupBy shape); the inner plan stays declarative so
    *    Catalyst fuses it with the outer aggregation
    *  - `join` — Druid's broadcast-style join: right columns take
    *    `rightPrefix`, the condition is a Druid expression over
    *    left columns and prefixed right columns. INNER and LEFT only,
    *    like Druid. At scale Spark plans the small right side (lookup /
    *    inline / sub-aggregate) as a broadcast hash join — exactly
    *    Druid's execution model for joinable datasources.
    *  - `inline` — literal rows shipped in the query (columnNames /
    *    columnTypes / rows)
    *  - `lookup` — a registered [[graft.sql.DruidLookups]] map exposed
    *    with Druid's (k, v) schema
    */
  private def resolveDataSource(ds: JsonNode, resolve: String => DataFrame): DataFrame =
    if (ds.isTextual) resolve(ds.asText())
    else if (!ds.isObject) fail("dataSource (need a table name or datasource object)")
    else ds.path("type").asText() match {
      case "table" => resolve(ds.path("name").asText())
      case "" if ds.hasNonNull("name") => resolve(ds.path("name").asText())
      case "union" =>
        val parts = ds.path("dataSources").elements().asScala
          .map(resolveDataSource(_, resolve)).toSeq
        if (parts.isEmpty) fail("union dataSource with no members")
        parts.reduce(_.unionByName(_, allowMissingColumns = true))
      case "query" => runNode(ds.path("query"), resolve)
      case "join" =>
        val left = resolveDataSource(ds.path("left"), resolve)
        val prefix = ds.path("rightPrefix").asText()
        if (prefix.isEmpty) fail("join dataSource without rightPrefix")
        val right0 = resolveDataSource(ds.path("right"), resolve)
        val right = right0.columns.foldLeft(right0)((d, c) =>
          d.withColumnRenamed(c, prefix + c))
        val joinType = ds.path("joinType").asText("INNER").toUpperCase match {
          case "INNER" => "inner"
          case "LEFT"  => "left"
          case other   => fail(s"joinType '$other' (Druid joins are INNER or LEFT)")
        }
        left.join(right, joinCondition(ds.path("condition").asText()), joinType)
      case "inline" =>
        val names = textSeq(ds.path("columnNames"))
        if (names.isEmpty) fail("inline dataSource with no columnNames")
        val types = textSeq(ds.path("columnTypes")).map(_.toUpperCase)
        val fields = names.zip(types.padTo(names.size, "STRING")).map { case (n, t) =>
          StructField(n, t match {
            case "STRING" => StringType
            case "LONG"   => LongType
            case "DOUBLE" => DoubleType
            case "FLOAT"  => FloatType
            case other    => fail(s"inline columnType '$other'")
          })
        }
        val rows: java.util.List[Row] = ds.path("rows").elements().asScala.map { r =>
          Row.fromSeq(r.elements().asScala.zip(fields.iterator).map { case (v, f) =>
            if (v.isNull) null
            else f.dataType match {
              case StringType => v.asText()
              case LongType   => v.asLong()
              case DoubleType => v.asDouble()
              case FloatType  => v.asDouble().toFloat
              case _          => v.asText()
            }
          }.toSeq)
        }.toSeq.asJava
        SparkSession.active.createDataFrame(rows, StructType(fields))
      case "lookup" =>
        val name = ds.path("lookup").asText()
        val m = graft.sql.DruidLookups.get(name).getOrElse(
          fail(s"lookup dataSource '$name' (not registered)"))
        val rows: java.util.List[Row] =
          m.toSeq.sortBy(_._1).map { case (k, v) => Row(k, v): Row }.asJava
        SparkSession.active.createDataFrame(rows, StructType(Seq(
          StructField("k", StringType), StructField("v", StringType))))
      case "unnest" =>
        // Druid's unnest dataSource (what SQL CROSS JOIN UNNEST plans
        // to): the virtualColumn's array value explodes to one row per
        // element under the virtual column's name; empty/null arrays
        // drop the row, SQL UNNEST semantics (the MV auto-unnest in
        // groupBy/topN keeps its null-group explode_outer — different
        // contract). A single-value expression unnests as a 1-element
        // array, like Druid.
        val baseDf = resolveDataSource(ds.path("base"), resolve)
        val vc = ds.path("virtualColumn")
        if (vc.path("type").asText() != "expression")
          fail(s"unnest virtualColumn type '${vc.path("type").asText()}'")
        val outName = vc.path("name").asText()
        val valueCol = druidExpr(vc.path("expression").asText())
        val isArray = baseDf.select(valueCol.as(outName))
          .schema.head.dataType.isInstanceOf[ArrayType]
        val unnested = baseDf.withColumn(outName,
          explode(if (isArray) valueCol else array(valueCol)))
        val uf = ds.path("unnestFilter")
        if (uf.isMissingNode || uf.isNull) unnested
        else unnested.filter(compileFilter(uf))
      case other => fail(s"dataSource type '$other'")
    }

  /** Druid join-condition expression → Catalyst. A join condition is a
    * Druid expression over left columns and double-quote-prefixed
    * right columns (`channel == "j.k"`); [[DruidExpr]] handles the
    * full dialect (and the SQL fallback, via [[druidExpr]]).
    */
  private def joinCondition(s: String): Column = {
    if (s.isEmpty) fail("join dataSource without condition")
    druidExpr(s)
  }

  // ---- time intervals ----------------------------------------------------

  /** "2024-01-05T00:00:00.000Z/2024-01-15T00:00:00.000Z" (or zoneless,
    * read as UTC — the engine runs sessions in UTC).
    */
  private def parseInstant(s: String): Instant = {
    // Joda-tolerant like a real Druid broker: instants with Z or any
    // UTC offset (2024-01-02T00:00:00.000+01:00), zoneless local
    // datetimes (read as UTC — the engine runs sessions in UTC), and
    // bare dates (2024-01-02 = midnight UTC). Instant.parse alone
    // rejects the last three valid Joda forms.
    type PE = java.time.format.DateTimeParseException
    try java.time.OffsetDateTime.parse(s).toInstant
    catch { case _: PE =>
      try LocalDateTime.parse(s).toInstant(ZoneOffset.UTC)
      catch { case _: PE =>
        try java.time.LocalDate.parse(s).atStartOfDay.toInstant(ZoneOffset.UTC)
        catch {
          // surface the compiler's loud contract, not a raw
          // DateTimeParseException (fuzz-caught)
          case _: PE => fail(
            s"interval timestamp '$s' (ISO instant, offset/local " +
              "datetime, or date)")
        }
      }
    }
  }

  private def intervalsOf(q: JsonNode): Seq[(Instant, Instant)] = {
    val node0 = q.path("intervals")
    val node = if (node0.isObject) node0.path("intervals") else node0
    if (node.isMissingNode || node.isNull) Seq.empty
    else node.elements().asScala.map { iv =>
      iv.asText().split('/') match {
        case Array(a, b) => (parseInstant(a), parseInstant(b))
        case _           => fail(s"interval '${iv.asText()}'")
      }
    }.toSeq
  }

  private def intervalPred(ivs: Seq[(Instant, Instant)]): Option[Column] =
    ivs.map { case (a, b) =>
      col("__time") >= lit(Timestamp.from(a)) &&
        col("__time") < lit(Timestamp.from(b))
    }.reduceOption(_ || _)

  /** Dictionary-side comparator-bound pushdown. A bound filter under a
    * non-lexicographic StringComparator has no V1 Filter form (and
    * even a lexicographic string range is not served by this source's
    * pushFilters), so Spark would evaluate the comparator per ROW.
    * Druid evaluates bounds on dictionary-encoded dimensions per
    * DICTIONARY VALUE and row-selects via bitmaps. When the datasource
    * is a bare druid relation and an AND-reachable bound lands on a
    * plain string dimension (no extractionFn, not shadowed by a
    * virtual column), re-load the relation with a `graft.bounds`
    * option: the reader runs the comparator once per dictionary entry
    * and unions qualifying-id bitmaps. The compiled Catalyst predicate
    * STAYS on the plan as the residual final word — the option is a
    * row-selection hint whose removal cannot change results.
    */
  private def pushComparatorBounds(df: DataFrame, q: JsonNode): DataFrame = {
    val f = q.path("filter")
    if (f.isMissingNode || f.isNull) return df
    val vcNames: Set[String] = {
      val vcs = q.path("virtualColumns")
      if (vcs.isMissingNode || vcs.isNull) Set.empty
      else vcs.elements().asScala.map(vc =>
        if (vc.hasNonNull("outputName")) vc.path("outputName").asText()
        else vc.path("name").asText()).toSet
    }
    def andReachableBounds(n: JsonNode): Seq[JsonNode] =
      n.path("type").asText() match {
        case "and"   => n.path("fields").elements().asScala.toSeq
                          .flatMap(andReachableBounds)
        case "bound" => Seq(n)
        case _       => Nil
      }
    import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
    import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
    def unwrap(p: LogicalPlan): LogicalPlan = p match {
      case s: SubqueryAlias => unwrap(s.child)
      case other            => other
    }
    val rel = unwrap(df.queryExecution.analyzed) match {
      case r: DataSourceV2Relation
          if r.table.isInstanceOf[graft.sources.druid.DruidTable] => r
      case _ => return df
    }
    val stringCols = rel.schema.fields
      .filter(f => (f.dataType == StringType ||
          // MV dims qualify too: the reader unions the per-value
          // bitmaps of every dictionary value satisfying the bound
          // (a value's bitmap marks rows CONTAINING it), which is
          // exactly "rows where ANY value is in range" — the compiled
          // exists(...) predicate stays the residual final word
          f.dataType == org.apache.spark.sql.types.ArrayType(StringType, true) ||
          f.dataType == org.apache.spark.sql.types.ArrayType(StringType, false)) &&
        !f.metadata.contains("druid.complexType"))
      .map(_.name).toSet
    val supported = Set("lexicographic", "strlen", "alphanumeric", "version")
    val bounds: Seq[(String, graft.sources.druid.DimBound)] =
      andReachableBounds(f).flatMap { b =>
        val d = b.path("dimension").asText()
        // malformed comparator nodes drop out here; compileFilter will
        // fail loudly on the same node moments later
        val ordering =
          (if (!b.hasNonNull("ordering") &&
               b.path("alphaNumeric").asBoolean(false)) Some("alphanumeric")
           else try Some(comparatorOf(b.path("ordering")))
           catch { case _: IllegalArgumentException => None })
            .map(o => if (o.isEmpty) "lexicographic" else o)
            .getOrElse("unsupported")
        val lower =
          if (b.hasNonNull("lower")) Some(b.path("lower").asText()) else None
        val upper =
          if (b.hasNonNull("upper")) Some(b.path("upper").asText()) else None
        if (b.hasNonNull("extractionFn") || vcNames(d) || !stringCols(d) ||
            !supported(ordering) || (lower.isEmpty && upper.isEmpty)) None
        else Some(d -> graft.sources.druid.DimBound(ordering,
          lower, b.path("lowerStrict").asBoolean(false),
          upper, b.path("upperStrict").asBoolean(false)))
      }
    if (bounds.isEmpty) return df
    val byCol = bounds.groupBy(_._1).map { case (c, v) => c -> v.map(_._2) }
    val opts = rel.options.asCaseSensitiveMap().asScala.toMap +
      ("graft.bounds" -> graft.sources.druid.DimBound.toJson(byCol)) +
      ("path" -> rel.table.asInstanceOf[graft.sources.druid.DruidTable].rootDir)
    SparkSession.active.read.format("druid").options(opts).load()
  }

  /** Selector/in filters on PLAIN multi-value dimensions, shipped as
    * the `graft.mvContains` read option when the datasource is a bare
    * druid relation: the reader serves them from the MV column's
    * per-value bitmap section (a value's bitmap marks rows CONTAINING
    * it — Druid's own MV selector execution) instead of decoding every
    * array. The compiled array_contains predicate STAYS on the plan
    * as the residual final word; like graft.bounds, the option is a
    * row-selection hint whose removal cannot change results.
    */
  private def pushMvContains(df: DataFrame, q: JsonNode): DataFrame = {
    val f = q.path("filter")
    if (f.isMissingNode || f.isNull) return df
    val vcNames: Set[String] = {
      val vcs = q.path("virtualColumns")
      if (vcs.isMissingNode || vcs.isNull) Set.empty
      else vcs.elements().asScala.map(vc =>
        if (vc.hasNonNull("outputName")) vc.path("outputName").asText()
        else vc.path("name").asText()).toSet
    }
    def andReachable(n: JsonNode): Seq[JsonNode] =
      n.path("type").asText() match {
        case "and" => n.path("fields").elements().asScala.toSeq
          .flatMap(andReachable)
        case "selector" | "in" => Seq(n)
        case _ => Nil
      }
    import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
    import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
    def unwrap(p: LogicalPlan): LogicalPlan = p match {
      case s: SubqueryAlias => unwrap(s.child)
      case other            => other
    }
    val rel = unwrap(df.queryExecution.analyzed) match {
      case r: DataSourceV2Relation
          if r.table.isInstanceOf[graft.sources.druid.DruidTable] => r
      case _ => return df
    }
    val mvCols = mvColsOf(df)
    val clauses: Seq[(String, Seq[String])] = andReachable(f).flatMap { n =>
      val d = n.path("dimension").asText()
      if (n.hasNonNull("extractionFn") || vcNames(d) || !mvCols(d)) None
      else n.path("type").asText() match {
        case "selector" if n.hasNonNull("value") =>
          Some(d -> Seq(n.path("value").asText()))
        case "in" =>
          val vs = textSeq(n.path("values"))
          if (vs.nonEmpty) Some(d -> vs) else None
        case _ => None
      }
    }
    if (clauses.isEmpty) return df
    val opts = rel.options.asCaseSensitiveMap().asScala.toMap +
      ("graft.mvContains" -> graft.sources.druid.MvContains.toJson(clauses)) +
      ("path" -> rel.table.asInstanceOf[graft.sources.druid.DruidTable].rootDir)
    SparkSession.active.read.format("druid").options(opts).load()
  }

  /** Selector/in filters on a `nested-field` VIRTUAL COLUMN over a
    * NestedCommonFormat column, shipped as the `graft.nestedEq` read
    * option: the reader serves them from the nested column's per-field
    * value bitmaps instead of reconstructing every row's JSON. STRING
    * expectedType only — the selector then compares exactly the
    * rendered text our bitmap probe models; a typed vc's cast can
    * match texts the probe would miss ('5.0' as LONG matches long 5),
    * so typed vcs stay residual-only. The compiled predicate is the
    * residual final word either way.
    */
  private def pushNestedEq(df: DataFrame, q: JsonNode): DataFrame = {
    val f = q.path("filter")
    if (f.isMissingNode || f.isNull) return df
    // nested-field STRING vcs: outputName -> (columnName, path)
    // dot steps plus optional [N] indices (the array-of-objects
    // shredding); eqBitmap declines scalar-array element paths itself
    val simplePath = """^\$(\.[^.\[\]'"*]+(\[(0|[1-9]\d*)\])?)+$""".r
    val nestedVcs: Map[String, (String, String)] = {
      val vcs = q.path("virtualColumns")
      if (vcs.isMissingNode || vcs.isNull) Map.empty
      else vcs.elements().asScala.collect {
        case vc if vc.path("type").asText() == "nested-field" &&
            vc.path("expectedType").asText("STRING")
              .toUpperCase(java.util.Locale.ROOT) == "STRING" &&
            simplePath.matches(vc.path("path").asText("")) =>
          val out =
            if (vc.hasNonNull("outputName")) vc.path("outputName").asText()
            else vc.path("name").asText()
          out -> (vc.path("columnName").asText(), vc.path("path").asText())
      }.toMap
    }
    if (nestedVcs.isEmpty) return df
    val nestedCols: Set[String] = df.schema.fields.collect {
      case fld if fld.dataType == org.apache.spark.sql.types.StringType &&
          fld.metadata.contains("druid.complexType") &&
          fld.metadata.getString("druid.complexType") ==
            graft.format.NestedColumn.PartType => fld.name
    }.toSet
    def andReachable(n: JsonNode): Seq[JsonNode] =
      n.path("type").asText() match {
        case "and" => n.path("fields").elements().asScala.toSeq
          .flatMap(andReachable)
        case "selector" | "in" => Seq(n)
        case _ => Nil
      }
    import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias}
    import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
    def unwrap(p: LogicalPlan): LogicalPlan = p match {
      case s: SubqueryAlias => unwrap(s.child)
      case other            => other
    }
    val rel = unwrap(df.queryExecution.analyzed) match {
      case r: DataSourceV2Relation
          if r.table.isInstanceOf[graft.sources.druid.DruidTable] => r
      case _ => return df
    }
    val clauses: Seq[(String, String, Seq[String])] =
      andReachable(f).flatMap { n =>
        val d = n.path("dimension").asText()
        nestedVcs.get(d).filter { case (c, _) => nestedCols(c) }
          .filterNot(_ => n.hasNonNull("extractionFn")).flatMap {
            case (c, p) =>
              n.path("type").asText() match {
                case "selector" if n.hasNonNull("value") =>
                  Some((c, p, Seq(n.path("value").asText())))
                case "in" =>
                  val vs = textSeq(n.path("values"))
                  if (vs.nonEmpty) Some((c, p, vs)) else None
                case _ => None
              }
          }
      }
    if (clauses.isEmpty) return df
    val opts = rel.options.asCaseSensitiveMap().asScala.toMap +
      ("graft.nestedEq" -> graft.sources.druid.NestedEq.toJson(clauses)) +
      ("path" -> rel.table.asInstanceOf[graft.sources.druid.DruidTable].rootDir)
    SparkSession.active.read.format("druid").options(opts).load()
  }

  /** Multi-value (array&lt;string&gt;) dimensions of a datasource. */
  private def mvColsOf(df: DataFrame): Set[String] =
    df.schema.fields.collect {
      case f if f.dataType == org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType, true) ||
        f.dataType == org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType, false) => f.name
    }.toSet

  private def applyWhere(df: DataFrame, q: JsonNode): DataFrame = {
    val time = intervalPred(intervalsOf(q))
    val f = q.path("filter")
    val pred = (time, if (f.isMissingNode || f.isNull) None
      else Some(compileFilter(f, mvColsOf(df)))) match {
      case (Some(t), Some(p)) => Some(t && p)
      case (t, p)             => t.orElse(p)
    }
    pred.fold(df)(df.filter)
  }

  // ---- filters -----------------------------------------------------------

  private def textSeq(node: JsonNode): Seq[String] =
    node.elements().asScala.map(_.asText()).toSeq

  /** One Druid filter node → one Catalyst predicate. Kept total over
    * the documented surface; everything else fails loudly.
    */
  def compileFilter(f: JsonNode): Column = compileFilter(f, Set.empty)

  /** `mvCols` = multi-value (array&lt;string&gt;) dimensions of the
    * queried datasource: Druid's selector/in semantics on an MV dim
    * are CONTAINS (a row matches when ANY of its values matches), so
    * those two filters compile to array_contains instead of equality.
    */
  def compileFilter(f: JsonNode, mvCols: Set[String]): Column = {
    // dimension filters may carry an extractionFn (older dashboards
    // send these constantly): the filter compares the TRANSFORMED value
    def dim(f: JsonNode): Column = {
      val base = ref(f.path("dimension").asText())
      val ef = f.path("extractionFn")
      if (ef.isMissingNode || ef.isNull) base else extractionFn(base, ef)
    }
    // selector/in on a PLAIN (no extractionFn) MV dimension: contains
    def isPlainMv(f: JsonNode): Boolean =
      mvCols.contains(f.path("dimension").asText()) &&
        (f.path("extractionFn").isMissingNode || f.path("extractionFn").isNull)
    f.path("type").asText() match {
    case "selector" if isPlainMv(f) =>
      val d = dim(f)
      val v = f.path("value")
      if (v.isMissingNode || v.isNull) d.isNull
      else array_contains(d, lit(v.asText()))
    case "selector" =>
      val d = dim(f)
      val v = f.path("value")
      if (v.isMissingNode || v.isNull) d.isNull else d === lit(v.asText())
    case "equals" =>
      val c = ref(f.path("column").asText())
      f.path("matchValueType").asText() match {
        case "LONG"             => c === lit(f.path("matchValue").asLong())
        case "DOUBLE" | "FLOAT" => c === lit(f.path("matchValue").asDouble())
        case _                  => c === lit(f.path("matchValue").asText())
      }
    case "in" if isPlainMv(f) =>
      val d = dim(f)
      textSeq(f.path("values")).map(v => array_contains(d, lit(v)))
        .reduceOption(_ || _).getOrElse(lit(false))
    case "in" =>
      dim(f).isin(textSeq(f.path("values")): _*)
    case "bound" =>
      // Druid's StringComparators: lexicographic (default), numeric,
      // alphanumeric (digit runs compare as numbers), strlen (length
      // first, then lexicographic), version (Maven version ordering).
      // Anything else fails loudly — a silent lexicographic fallback
      // would return different rows than the client's Druid cluster.
      // legacy clients predate `ordering` and send the boolean
      // `alphaNumeric` flag instead — ignoring it would compare
      // lexicographically and return different rows
      val ordering =
        if (!f.hasNonNull("ordering") && f.path("alphaNumeric").asBoolean(false))
          "alphanumeric"
        else comparatorOf(f.path("ordering"))
      def boundPred(c: Column): Column = {
        def side(key: String, strictKey: String, lower: Boolean): Option[Column] = {
          val v = f.path(key)
          if (v.isMissingNode || v.isNull) None
          else {
            val strict = f.path(strictKey).asBoolean(false)
            // version/alphanumeric: one codegen'd static call per row
            // against a driver-side pre-computed bound — the interpreted
            // HOF key towers stay sort-path-only (see StringComparators).
            // Other orderings: the literal side is the same key
            // expression over a literal — Catalyst constant-folds it, so
            // both sides share one encoding.
            val (lhs, rhs) = ordering match {
              case "version" =>
                graft.sql.StringComparatorFns.register(SparkSession.active)
                (call_function("version_cmp", c.cast("string"),
                   lit(v.asText())), lit(0))
              case "alphanumeric" =>
                graft.sql.StringComparatorFns.register(SparkSession.active)
                (call_function("alphanum_key", c.cast("string")),
                 lit(graft.sql.Alphanum.keyOf(v.asText())))
              case _ =>
                (orderingKey(c, ordering), orderingKey(lit(v.asText()), ordering))
            }
            Some((lower, strict) match {
              case (true, true)   => lhs > rhs
              case (true, false)  => lhs >= rhs
              case (false, true)  => lhs < rhs
              case (false, false) => lhs <= rhs
            })
          }
        }
        val sides = side("lower", "lowerStrict", lower = true).toSeq ++
          side("upper", "upperStrict", lower = false).toSeq
        if (sides.isEmpty) fail("bound filter with neither lower nor upper")
        sides.reduce(_ && _)
      }
      // bound on a plain MV dim: Druid matches the row if ANY array
      // value satisfies the bound
      if (isPlainMv(f)) exists(dim(f), boundPred) else boundPred(dim(f))
    case "range" =>
      val c = ref(f.path("column").asText())
      val numeric = f.path("matchValueType").asText("STRING") match {
        case "LONG" | "DOUBLE" | "FLOAT" => true
        case _                           => false
      }
      def side(key: String, openKey: String, lower: Boolean): Option[Column] = {
        val v = f.path(key)
        if (v.isMissingNode || v.isNull) None
        else {
          val open = f.path(openKey).asBoolean(false)
          val (lhs, rhs) =
            if (numeric) (c.cast("double"), lit(v.asDouble()))
            else (c.cast("string"), lit(v.asText()))
          Some((lower, open) match {
            case (true, true)   => lhs > rhs
            case (true, false)  => lhs >= rhs
            case (false, true)  => lhs < rhs
            case (false, false) => lhs <= rhs
          })
        }
      }
      val sides = side("lower", "lowerOpen", lower = true).toSeq ++
        side("upper", "upperOpen", lower = false).toSeq
      if (sides.isEmpty) fail("range filter with neither lower nor upper")
      sides.reduce(_ && _)
    case "like" =>
      // Druid's like filter carries an optional escape character; a
      // client matching literal %/_ relies on it. On a plain MV dim
      // the row matches if ANY array value matches (MV semantics,
      // same as selector/in/bound).
      val pat = f.path("pattern").asText()
      def likePred(c: Column): Column =
        if (!f.hasNonNull("escape")) c.like(pat)
        else {
          val esc = f.path("escape").asText()
          if (esc.length != 1) fail("like escape (must be one character)")
          call_function("like", c, lit(pat), lit(esc))
        }
      if (isPlainMv(f)) exists(dim(f), likePred) else likePred(dim(f))
    case "regex" =>
      val pat = f.path("pattern").asText()
      if (isPlainMv(f)) exists(dim(f), _.rlike(pat)) else dim(f).rlike(pat)
    case "search" =>
      if (isPlainMv(f)) exists(dim(f), searchPredicate(_, f.path("query")))
      else searchPredicate(dim(f), f.path("query"))
    case "null" =>
      ref(f.path("column").asText()).isNull
    case "interval" =>
      val d = ref(f.path("dimension").asText())
      f.path("intervals").elements().asScala.map { iv =>
        iv.asText().split('/') match {
          case Array(a, b) =>
            d >= lit(Timestamp.from(parseInstant(a))) &&
              d < lit(Timestamp.from(parseInstant(b)))
          case _ => fail(s"interval '${iv.asText()}'")
        }
      }.reduceOption(_ || _).getOrElse(fail("interval filter with no intervals"))
    case "and" =>
      f.path("fields").elements().asScala
        .map(compileFilter(_, mvCols)).reduce(_ && _)
    case "or" =>
      f.path("fields").elements().asScala
        .map(compileFilter(_, mvCols)).reduce(_ || _)
    case "not" =>
      !compileFilter(f.path("field"), mvCols)
    case "expression" =>
      druidExpr(f.path("expression").asText())
    case "spatial" =>
      // druid-spatial: the dimension holds comma-joined coordinates
      // ("x,y"), the bound selects points inside a shape. All three
      // shapes (rectangular, radius, polygon) compile to plain
      // arithmetic over the split coordinates (codegen'd,
      // residual-checked like every filter).
      val coords = split(dim(f).cast("string"), ",")
      // `get` (0-based, null out-of-bounds) + try_cast: a malformed
      // coordinate string ("5", "5,abc") yields null comparisons and
      // the row simply doesn't match — Druid's behavior — instead of
      // an ANSI runtime error aborting the query
      def coord(i: Int): Column = get(coords, lit(i)).try_cast("double")
      val b = f.path("bound")
      b.path("type").asText() match {
        case "rectangular" =>
          val mins = b.path("minCoords").elements().asScala.map(_.asDouble()).toSeq
          val maxs = b.path("maxCoords").elements().asScala.map(_.asDouble()).toSeq
          if (mins.isEmpty || mins.size != maxs.size)
            fail("spatial rectangular bound (minCoords/maxCoords must be same-length, non-empty)")
          mins.indices.map(i =>
            coord(i) >= lit(mins(i)) && coord(i) <= lit(maxs(i))).reduce(_ && _)
        case "radius" =>
          val ctr = b.path("coords").elements().asScala.map(_.asDouble()).toSeq
          if (ctr.isEmpty) fail("spatial radius bound with no coords")
          val r = b.path("radius").asDouble()
          val dist2 = ctr.indices
            .map(i => (coord(i) - lit(ctr(i))) * (coord(i) - lit(ctr(i))))
            .reduce(_ + _)
          dist2 <= lit(r * r)
        case "polygon" =>
          // ray casting, the same even-odd rule Druid's PolygonBound
          // applies (druid-spatial PolygonBound.contains): count edges
          // whose span crosses the point's y and whose x-intersect
          // lies left of the point; odd count = inside. The vertex
          // lists are query constants, so the whole test unrolls into
          // one codegen'd arithmetic expression — per-edge crossing
          // terms summed, parity checked; no UDF. Handles concave
          // polygons (the rule is per-edge, not convexity-based).
          // Malformed coordinate strings make px/py null, every
          // comparison null, every term 0 — the row doesn't match,
          // same as rectangular/radius above.
          val xs = b.path("abscissa").elements().asScala.map(_.asDouble()).toSeq
          val ys = b.path("ordinate").elements().asScala.map(_.asDouble()).toSeq
          if (xs.size < 3 || xs.size != ys.size)
            fail("spatial polygon bound (abscissa/ordinate must be same-length, >= 3 vertices)")
          val px = coord(0)
          val py = coord(1)
          val crossings = xs.indices.map { i =>
            val j = if (i == 0) xs.size - 1 else i - 1
            val (xi, yi, xj, yj) = (xs(i), ys(i), xs(j), ys(j))
            val spans = (lit(yi) < py && lit(yj) >= py) ||
              (lit(yj) < py && lit(yi) >= py)
            // yi != yj whenever `spans` holds, and double division
            // never throws under ANSI anyway, so the unconditional
            // intersect computation is safe
            val xAtY = lit(xi) + (py - lit(yi)) / lit(yj - yi) * lit(xj - xi)
            when(spans && xAtY < px, lit(1)).otherwise(lit(0))
          }.reduce(_ + _)
          // bounding-box conjunct FIRST: a point outside the polygon's
          // envelope can't be inside it, so the cheap four-comparison
          // test short-circuits the O(vertices) crossing sum for every
          // such row — and, being plain range predicates, the bbox is
          // what the planner can push toward scans and zone maps,
          // which the parity arithmetic never will be
          val bbox = px >= lit(xs.min) && px <= lit(xs.max) &&
            py >= lit(ys.min) && py <= lit(ys.max)
          bbox && crossings % 2 === 1
        case other => fail(s"spatial bound '$other'")
      }
    case "true"  => lit(true)
    case "false" => lit(false)
    case "columnComparison" =>
      // equality between two (possibly extracted) dimension columns —
      // NULL-SAFE: Druid's columnComparison matches rows where both
      // dimensions are null, so a null-rejecting === would drop them
      val ds = f.path("dimensions").elements().asScala
        .map(d => dimensionSpec(d)._1).toSeq
      if (ds.size < 2) fail("columnComparison needs two dimensions")
      ds.sliding(2).map { case Seq(a, b) =>
        a.cast("string") <=> b.cast("string")
      }.reduce(_ && _)
    case other => fail(s"filter type '$other'")
    }
  }

  /** A StringComparator reference from the wire, which Druid
    * serializes EITHER as a bare string ("version") or as an object
    * ({"type": "version"}) — reading it with asText() alone silently
    * turns the object form into the lexicographic default and returns
    * different rows than the client's cluster.
    */
  private def comparatorOf(node: JsonNode): String =
    if (node.isMissingNode || node.isNull) "lexicographic"
    else if (node.isTextual) node.asText()
    else if (node.isObject && node.path("type").isTextual)
      node.path("type").asText()
    else
      // a number / array / type-less object here is a client bug; a
      // silent lexicographic default would return differently-ordered
      // (and under limit, DIFFERENT) rows than the client's cluster
      fail(s"string comparator $node (expected a comparator name or " +
        "{\"type\": <name>})")

  /** One of Druid's StringComparators as a sort-key expression:
    * lexicographic (default), numeric, alphanumeric, strlen, version —
    * the complete StringComparators set. Shared by the bound filter,
    * limitSpec `dimensionOrder`, and topN dimension metrics.
    */
  private def orderingKey(c: Column, ordering: String): Column =
    ordering match {
      case "lexicographic" | "" => c.cast("string")
      // try_cast: Druid's numeric comparator tolerates unparseable
      // values (they sort as null) — an ANSI cast error would abort
      // the whole query on one bad dimension value
      case "numeric"            => c.try_cast("double")
      case "alphanumeric"       =>
        // same encoding as the HOF alphanumKey (the spec pins both),
        // one static call per row instead of an interpreted HOF chain
        graft.sql.StringComparatorFns.register(SparkSession.active)
        call_function("alphanum_key", c.cast("string"))
      case "strlen" => struct(length(c.cast("string")), c.cast("string"))
      case "version"            => versionKey(c.cast("string"))
      case other => fail(s"string comparator '$other' (supported: lexicographic, numeric, alphanumeric, strlen, version)")
    }

  /** Order-preserving sort key for Druid's ALPHANUMERIC comparator
    * (Koelle's Alphanum: digit runs compare as numbers, other chars as
    * themselves). Encoding per chunk: a digit run becomes
    * `'0' + chr(32 + len(stripped)) + stripped` (leading zeros
    * dropped), so among digit runs the magnitude-length compares first
    * and equal-length runs compare digit-wise — numeric order — while
    * the fixed '0' prefix keeps a digit run in the ['0'..'9'] ASCII
    * band relative to non-digit chunks, matching the char-wise rule
    * when chunk kinds differ. Built from native Catalyst expressions
    * (split on digit/non-digit boundaries via zero-width regex,
    * transform, array_join) — no UDF, no serialization boundary; the
    * higher-order `transform` evaluates interpreted inside the stage,
    * an accepted cost for a comparator clients use rarely. Digit runs
    * longer than 223 digits would wrap `chr`; real dimension values
    * are nowhere near that. Package-visible so AlphanumKeySpec can pin
    * THIS Catalyst encoding against the driver-side mirror.
    */
  private[query] def alphanumKey(c: Column): Column = {
    val chunks = split(c, "(?<=[0-9])(?=[^0-9])|(?<=[^0-9])(?=[0-9])")
    array_join(
      transform(chunks, x => {
        val stripped = regexp_replace(x, "^0+", "")
        when(x.rlike("^[0-9]+$"),
          concat(lit("0"), call_function("char", length(stripped) + lit(32)),
                 stripped))
          .otherwise(x)
      }), "")
  }

  /** The same alphanumeric sort key computed driver-side for the
    * constant bound value (package-visible for the ordering property
    * spec).
    */
  private[query] def alphanumKeyOf(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val ch = s.charAt(i)
      if (ch >= '0' && ch <= '9') {
        var j = i
        while (j < s.length && s.charAt(j) >= '0' && s.charAt(j) <= '9') j += 1
        val stripped = s.substring(i, j).dropWhile(_ == '0')
        sb.append('0').append((32 + stripped.length).toChar).append(stripped)
        i = j
      } else { sb.append(ch); i += 1 }
    }
    sb.toString
  }

  /** Order-preserving sort key for Druid's VERSION comparator, which
    * delegates to Maven's version ordering (StringComparators.VERSION
    * → DefaultArtifactVersion). Encodes the version as an
    * `array<struct<r:int, n:bigint, s:string>>` — Spark's array/struct
    * orderings ARE element-wise lexicographic comparison, so the
    * encoded column sorts and range-compares exactly like the item
    * list:
    *
    *  - tokenize (case-folded) on `.`/`-` and digit↔non-digit
    *    transitions, like Maven;
    *  - numeric tokens rank above every qualifier and compare by
    *    value; known qualifiers rank alpha < beta < milestone < rc=cr
    *    < snapshot < "" (release, incl. ga/final) < sp; unknown
    *    qualifiers rank above sp and compare lexically (`s`);
    *  - trailing "null" items (numeric 0, release-rank) are trimmed
    *    per dash-segment, so `1.2.0` == `1.2` == `1.2.ga` and
    *    `1.0-alpha` tokenizes as `[1, alpha]`, below the bare `1.0`;
    *  - an explicit release terminator is appended, so a shorter
    *    version with a qualifier sorts BELOW the bare release
    *    (`1.2-alpha` < `1.2` < `1.2.1`) — bare array-prefix ordering
    *    would get that backwards.
    *
    * Documented subset vs full Maven: flat token list (no nested list
    * semantics at `-` boundaries) and no single-letter `a1`/`b1`/`m1`
    * aliases — Druid segment versions (ISO timestamps) and
    * semver-style strings, the inputs this comparator sees in
    * practice, never use either. `transform`/`aggregate` evaluate
    * interpreted inside the stage, the same accepted cost as the
    * alphanumeric key; for a bound-filter literal the whole key
    * constant-folds. Digit runs beyond Long.MaxValue clamp.
    * Package-visible so VersionKeySpec can pin THIS encoding against
    * the independent driver-side comparator [[versionCompareOf]].
    */
  private[query] def versionKey(c: Column): Column = {
    // trailing "null" items (numeric 0 / release-rank qualifiers) trim
    // PER DASH-SEGMENT, like Maven's normalization at '-' boundaries —
    // a flat global trim would turn "1.0-alpha" into [1, 0, alpha] and
    // sort the bare release "1.0" ([1]) BELOW it (release-rank 5 <
    // number-rank 8 at position 1), inverting Maven's 1.0-alpha < 1.0
    val segItems = transform(split(lower(c), "-", -1), seg => {
      // the transition lookarounds EXCLUDE '.', else a digit-dot
      // boundary double-fires (zero-width split + dot split) and
      // injects spurious empty tokens mid-list
      val toks = split(seg, "[.]|(?<=[0-9])(?=[^0-9.])|(?<=[^0-9.])(?=[0-9])")
      val items = transform(toks, t => {
        val isNum = t.rlike("^[0-9]+$")
        val rank = when(isNum, lit(8))
          .when(t === "alpha", lit(0))
          .when(t === "beta", lit(1))
          .when(t === "milestone", lit(2))
          .when(t === "rc" || t === "cr", lit(3))
          .when(t === "snapshot", lit(4))
          .when(t === "" || t === "ga" || t === "final" || t === "release", lit(5))
          .when(t === "sp", lit(6))
          .otherwise(lit(7))
        struct(
          rank.as("r"),
          when(isNum, coalesce(t.try_cast("long"), lit(Long.MaxValue)))
            .otherwise(lit(0L)).as("n"),
          when(rank === 7, t).otherwise(lit("")).as("s"))
      })
      // single-pass trailing-trim: fold the REVERSED items, dropping
      // leading trivia then prepending survivors — `items` (an
      // interpreted HOF chain with no CSE) is referenced ONCE, where a
      // count-then-slice would evaluate it three times per row
      val emptyItems = array().cast("array<struct<r:int,n:bigint,s:string>>")
      aggregate(
        reverse(items),
        struct(emptyItems.as("arr"), lit(true).as("drop")),
        (acc, x) => {
          val trivial = (x("r") === 8 && x("n") === 0L) || x("r") === 5
          val stillDropping = acc("drop") && trivial
          struct(
            when(stillDropping, acc("arr"))
              .otherwise(concat(array(x), acc("arr"))).as("arr"),
            stillDropping.as("drop"))
        },
        acc => acc("arr"))
    })
    concat(flatten(segItems),
      array(struct(lit(5).as("r"), lit(0L).as("n"), lit("").as("s"))))
  }

  /** Independent driver-side mirror of the VERSION ordering for the
    * property spec: a direct three-way comparator over the item lists
    * (no key encoding), so a bug in the array-encoding trick and a bug
    * in the comparator would have to agree to slip through.
    */
  private[query] def versionCompareOf(a: String, b: String): Int = {
    def items(s: String): Vector[(Int, Long, String)] = {
      val flat = s.toLowerCase.split("-", -1).toVector.flatMap { seg =>
        val toks = seg
          .split("[.]|(?<=[0-9])(?=[^0-9.])|(?<=[^0-9.])(?=[0-9])", -1)
          .toVector
        val raw = toks.map { t =>
          if (t.nonEmpty && t.forall(ch => ch >= '0' && ch <= '9'))
            (8, try t.toLong catch { case _: NumberFormatException => Long.MaxValue }, "")
          else t match {
            case "alpha"                       => (0, 0L, "")
            case "beta"                        => (1, 0L, "")
            case "milestone"                   => (2, 0L, "")
            case "rc" | "cr"                   => (3, 0L, "")
            case "snapshot"                    => (4, 0L, "")
            case "" | "ga" | "final" | "release" => (5, 0L, "")
            case "sp"                          => (6, 0L, "")
            case other                         => (7, 0L, other)
          }
        }
        raw.reverse.dropWhile(it =>
          (it._1 == 8 && it._2 == 0L) || it._1 == 5).reverse
      }
      flat :+ ((5, 0L, ""))
    }
    val (ia, ib) = (items(a), items(b))
    ia.zip(ib).foldLeft(0) { (acc, pair) =>
      if (acc != 0) acc
      else {
        val ((ra, na, sa), (rb, nb, sb)) = pair
        if (ra != rb) Integer.compare(ra, rb)
        else if (na != nb) java.lang.Long.compare(na, nb)
        else sa.compareTo(sb)
      }
    } match {
      case 0 => Integer.compare(ia.size, ib.size)
      case n => n
    }
  }

  /** The search-query sub-object shared by the search filter and the
    * search query type.
    */
  private def searchPredicate(c: Column, qn: JsonNode): Column =
    qn.path("type").asText() match {
      case "insensitive_contains" =>
        lower(c).contains(lower(lit(qn.path("value").asText())))
      case "contains" =>
        if (qn.path("caseSensitive").asBoolean(true))
          c.contains(lit(qn.path("value").asText()))
        else lower(c).contains(lower(lit(qn.path("value").asText())))
      case "fragment" =>
        val cs = qn.path("caseSensitive").asBoolean(true)
        textSeq(qn.path("values"))
          .map(v => if (cs) c.contains(lit(v)) else lower(c).contains(lower(lit(v))))
          .reduceOption(_ && _)
          .getOrElse(fail("fragment search with no values"))
      case "regex" =>
        // RegexSearchQuerySpec: find semantics (a match anywhere in the
        // value), which is exactly rlike
        c.rlike(qn.path("pattern").asText())
      case other => fail(s"search query type '$other'")
    }

  // ---- virtual columns ---------------------------------------------------

  private def withVirtualColumns(df: DataFrame, q: JsonNode): DataFrame = {
    val vcs = q.path("virtualColumns")
    if (vcs.isMissingNode || vcs.isNull) df
    else vcs.elements().asScala.foldLeft(df) { (d, vc) =>
      vc.path("type").asText() match {
        case "expression" =>
          d.withColumn(vc.path("name").asText(),
            druidExpr(vc.path("expression").asText()))
        case "nested-field" =>
          // Druid's NestedFieldVirtualColumn over a COMPLEX<json>
          // column — our json columns surface as JSON STRINGS, so the
          // JSONPath extraction is get_json_object; expectedType casts
          // leniently (mismatches null out, like Druid)
          val out =
            if (vc.hasNonNull("outputName")) vc.path("outputName").asText()
            else vc.path("name").asText()
          val extracted = get_json_object(
            col(vc.path("columnName").asText()).cast("string"),
            vc.path("path").asText())
          val typed = vc.path("expectedType").asText("STRING").toUpperCase match {
            case "STRING" => extracted
            case "LONG"   => extracted.try_cast("long")
            case "DOUBLE" => extracted.try_cast("double")
            case "FLOAT"  => extracted.try_cast("float")
            case other    => fail(s"nested-field expectedType '$other'")
          }
          d.withColumn(out, typed)
        case other => fail(s"virtualColumn type '$other'")
      }
    }
  }

  // ---- granularity -------------------------------------------------------

  private val periodUnits = Map(
    "PT1S" -> "second", "PT1M" -> "minute", "PT1H" -> "hour",
    "P1D" -> "day", "P1W" -> "week", "P1M" -> "month",
    "P3M" -> "quarter", "P1Y" -> "year")

  private val simpleUnits =
    Set("second", "minute", "hour", "day", "week", "month", "quarter", "year")

  /** A resolved bucketing granularity: how a timestamp maps to its
    * bucket start, and how a dense bucket spine is built for zero-fill.
    */
  private sealed trait Gran {
    def bucket(c: Column): Column
    /** One-column ("__time") frame of bucket starts covering
      * [trunc(start), end) — the zero-fill spine. */
    def spineDF(spark: SparkSession,
                start: java.time.Instant, end: java.time.Instant): DataFrame
  }

  /** Calendar-unit granularity + optional bucket timezone. With a
    * timezone, bucketing converts to LOCAL wall time, truncates, and
    * converts the local boundary back to its UTC instant — so "one
    * day in America/Los_Angeles" is a real local calendar day (23/25 h
    * across DST), exactly Druid's period-granularity semantics.
    */
  private case class UnitGran(unit: String, tz: Option[String]) extends Gran {
    def bucket(c: Column): Column = tz match {
      case None    => date_trunc(unit, c)
      case Some(z) => to_utc_timestamp(date_trunc(unit, from_utc_timestamp(c, z)), z)
    }
    def spineDF(spark: SparkSession,
                start: java.time.Instant, end: java.time.Instant): DataFrame = {
      // with a bucket timezone the spine steps in LOCAL wall time (so
      // day/month boundaries and DST hold) and each local boundary
      // converts back to its UTC instant
      val seq0 = tz match {
        case None => sequence(
          date_trunc(unit, lit(Timestamp.from(start))),
          lit(Timestamp.from(end)),
          expr(unitStep(unit)))
        case Some(z) => sequence(
          date_trunc(unit, from_utc_timestamp(lit(Timestamp.from(start)), z)),
          from_utc_timestamp(lit(Timestamp.from(end)), z),
          expr(unitStep(unit)))
      }
      spark.range(1)
        .select(explode(seq0).as("__t0"))
        .select((tz match {
          case None    => col("__t0")
          case Some(z) => to_utc_timestamp(col("__t0"), z)
        }).as("__time"))
        .filter(col("__time") < lit(Timestamp.from(end)))
    }
  }

  /** Calendar-period granularity anchored at an `origin` (Druid's
    * period granularity with a non-epoch origin — fiscal months, weeks
    * starting Sunday 6pm, ...): bucket boundaries sit at
    * origin + k·period evaluated in the period's LOCAL calendar, for
    * all integer k. Two exact strategies, both pure column arithmetic:
    *
    *  - sub-month units (second..week): the origin's offset within its
    *    own period is a fixed wall-clock delta, so shift into the
    *    anchored lattice, reuse the local-calendar `date_trunc`, shift
    *    back ("floor in the origin's frame").
    *  - month-based units (month/quarter/year): month lengths vary, so
    *    a fixed shift would drift; instead the bucket index is computed
    *    on the month-number lattice (k = floor((monthIndex(t) −
    *    monthIndex(origin)) / n)), the candidate boundary rebuilt with
    *    `add_months` from the origin's month, and stepped back one
    *    period when t precedes it — exactly Joda's
    *    `months().getDifference` + floor + `add` sequence Druid runs.
    *
    * Month-based boundaries reproduce Joda's month-end clamping
    * exactly: Druid computes boundary(k) = months().add(origin, k·n),
    * where Joda clamps the day-of-month PER ADD from the origin
    * (Jan 31 + 1M = Feb 28, Jan 31 + 2M = Mar 31 — no cumulative
    * drift), keeping the origin's wall time. The column form splits
    * the origin into (month start, day-of-month, time-of-day) and
    * rebuilds each boundary with `add_months` + a `last_day` clamp +
    * the time offset — `add_months` clamps exactly like Joda, and for
    * origins at day <= 28 the clamp never fires, collapsing to the
    * plain fixed-offset lattice. The candidate/step-back selection is
    * unaffected by clamping (boundary(k) stays inside its month, so
    * the month-index ordering argument still pins k to within one).
    */
  private case class OriginGran(unit: String, nMonths: Int,
                                tz: Option[String], origin: Instant)
      extends Gran {
    private val zone = tz.map(java.time.ZoneId.of)
      .getOrElse(ZoneOffset.UTC: java.time.ZoneId)
    private val oLocal = LocalDateTime.ofInstant(origin, zone)
    // wall-clock offset of the origin within its truncation unit (for
    // month-based units: within its MONTH — the calendar part of the
    // offset rides the month-index lattice instead)
    private val truncTo: LocalDateTime = unit match {
      case "second" => oLocal.truncatedTo(java.time.temporal.ChronoUnit.SECONDS)
      case "minute" => oLocal.truncatedTo(java.time.temporal.ChronoUnit.MINUTES)
      case "hour"   => oLocal.truncatedTo(java.time.temporal.ChronoUnit.HOURS)
      case "day"    => oLocal.toLocalDate.atStartOfDay
      case "week"   => oLocal.toLocalDate.`with`(
        java.time.temporal.TemporalAdjusters.previousOrSame(
          java.time.DayOfWeek.MONDAY)).atStartOfDay
      case _ /* month-based */ =>
        oLocal.toLocalDate.withDayOfMonth(1).atStartOfDay
    }
    private val offMs =
      java.time.Duration.between(truncTo, oLocal).toMillis
    private val monthBased = nMonths > 0
    private val oMonthIdx = oLocal.getYear * 12 + oLocal.getMonthValue - 1
    private val oMonthStart = java.sql.Date.valueOf(
      oLocal.toLocalDate.withDayOfMonth(1))
    // month-based origins decompose as (month start, day, time-of-day):
    // the day is re-clamped per boundary like Joda's months().add
    private val oDay = oLocal.getDayOfMonth
    private val timeMs = java.time.Duration.between(
      oLocal.toLocalDate.atStartOfDay, oLocal).toMillis

    private def localize(c: Column): Column =
      tz.fold(c)(z => from_utc_timestamp(c, z))
    private def delocalize(c: Column): Column =
      tz.fold(c)(z => to_utc_timestamp(c, z))

    /** Bucket start of a LOCAL wall-time column, in local wall time. */
    private def bucketLocal(local: Column): Column =
      if (!monthBased) {
        val shifted = timestamp_millis(unix_millis(local) - lit(offMs))
        timestamp_millis(unix_millis(date_trunc(unit, shifted)) + lit(offMs))
      } else {
        val mIdx = year(local) * 12 + month(local) - lit(1)
        val d = mIdx - lit(oMonthIdx)
        // floor division on the month lattice (pmod handles pre-origin)
        val k = (d - pmod(d, lit(nMonths))) / lit(nMonths)
        val cand = boundary(k.cast("long"))
        when(local < cand, boundary(k.cast("long") - lit(1L))).otherwise(cand)
      }

    /** Boundary k·nMonths periods from the origin, in local wall time:
      * origin-month start advanced with `add_months`, the origin's
      * day-of-month clamped to the target month's length (exactly
      * Joda's months().add — per-boundary from the origin, never
      * cumulative), plus the origin's time-of-day.
      */
    private def boundary(periods: Column): Column = {
      val mStart = add_months(lit(oMonthStart),
        (periods * lit(nMonths)).cast("int"))
      val day = least(lit(oDay), dayofmonth(last_day(mStart)))
      timestamp_millis(
        unix_millis(to_timestamp(date_add(mStart, day - lit(1)))) + lit(timeMs))
    }

    /** Driver-side mirror of [[boundary]]/[[bucketLocal]] on
      * java.time (whose plusMonths clamps like Joda), for computing
      * the spine's k range without a column round-trip.
      */
    private def mirrorBoundary(k: Long): LocalDateTime = {
      val m0 = oLocal.toLocalDate.withDayOfMonth(1).plusMonths(k * nMonths)
      m0.withDayOfMonth(math.min(oDay, m0.lengthOfMonth)).atStartOfDay
        .plus(java.time.Duration.ofMillis(timeMs))
    }
    private def mirrorBucketK(tLocal: LocalDateTime): Long = {
      val d = (tLocal.getYear.toLong * 12 + tLocal.getMonthValue - 1) - oMonthIdx
      val k = Math.floorDiv(d, nMonths.toLong)
      if (mirrorBoundary(k).isAfter(tLocal)) k - 1 else k
    }
    def bucket(c: Column): Column = delocalize(bucketLocal(localize(c)))
    def spineDF(spark: SparkSession,
                start: java.time.Instant, end: java.time.Instant): DataFrame =
      if (monthBased) {
        // stepping a sequence by `interval n month` would clamp
        // CUMULATIVELY (Jan 31 -> Feb 28 -> Mar 28) where Joda clamps
        // each boundary independently from the origin (-> Mar 31);
        // enumerate the k lattice instead and rebuild every boundary
        // from the origin
        val kStart = mirrorBucketK(LocalDateTime.ofInstant(start, zone))
        val kEnd = mirrorBucketK(LocalDateTime.ofInstant(end, zone)) + 1
        spark.range(kStart, kEnd + 1)
          .select(delocalize(boundary(col("id"))).as("__time"))
          .filter(col("__time") < lit(Timestamp.from(end)))
      } else {
        val startB = bucketLocal(localize(lit(Timestamp.from(start))))
        val endL = localize(lit(Timestamp.from(end)))
        spark.range(1)
          .select(explode(sequence(startB, endL, expr(unitStep(unit)))).as("__t0"))
          .select(delocalize(col("__t0")).as("__time"))
          .filter(col("__time") < lit(Timestamp.from(end)))
      }
  }

  /** Fixed-millisecond granularity (Druid's `duration` type), bucketing
    * by floor-division from `origin` (epoch by default). Pure integer
    * arithmetic — the mod-mod form floors correctly for pre-origin
    * timestamps, where a truncating div would round toward zero.
    */
  private case class DurationGran(durMs: Long, originMs: Long) extends Gran {
    def bucket(c: Column): Column = {
      val x = unix_millis(c) - lit(originMs)
      timestamp_millis(
        x - (((x % lit(durMs)) + lit(durMs)) % lit(durMs)) + lit(originMs))
    }
    def spineDF(spark: SparkSession,
                start: java.time.Instant, end: java.time.Instant): DataFrame =
      spark.range(1)
        .select(explode(sequence(
          bucket(lit(Timestamp.from(start))),
          lit(Timestamp.from(end)),
          expr(s"interval $durMs millisecond"))).as("__time"))
        .filter(col("__time") < lit(Timestamp.from(end)))
  }

  /** None = granularity "all" (a single bucket). */
  private def truncUnit(q: JsonNode): Option[Gran] = {
    val g = q.path("granularity")
    def originMs: Long =
      if (!g.isObject || !g.hasNonNull("origin")) 0L
      else try java.time.Instant.parse(g.path("origin").asText()).toEpochMilli
      catch { case _: java.time.format.DateTimeParseException =>
        fail(s"granularity origin '${g.path("origin").asText()}' (ISO instant)") }
    if (g.isObject && g.path("type").asText() == "duration") {
      val dur = g.path("duration").asLong()
      if (dur <= 0) fail("duration granularity (duration must be > 0 ms)")
      return Some(DurationGran(dur, originMs))
    }
    if (g.isObject && g.hasNonNull("origin")) {
      // Three origin regimes, matching Joda's field taxonomy (which is
      // what Druid's PeriodGranularity delegates to):
      //  - sub-day periods (PT1S/PT1M/PT1H) are PRECISE fields —
      //    instant-timeline arithmetic in ANY zone (an hour is 3600 s
      //    even across a DST fold) → the duration form;
      //  - day/week are precise in UTC (no DST) → duration form; in
      //    other zones they are local-calendar adds (23/25-hour days)
      //    → OriginGran's wall-frame lattice;
      //  - months/quarters/years are always calendar adds →
      //    OriginGran's month-index lattice.
      val subDayMs = Map("PT1S" -> 1000L, "PT1M" -> 60000L,
        "PT1H" -> 3600000L)
      val dayWeekMs = Map("P1D" -> 86400000L, "P1W" -> 604800000L)
      val tzIsUtc = !g.hasNonNull("timeZone") ||
        Set("UTC", "Etc/UTC", "+00:00")(g.path("timeZone").asText())
      if (g.path("type").asText() != "period")
        fail(s"granularity origin on type '${g.path("type").asText()}' " +
          "(supported: duration, period)")
      val period = g.path("period").asText()
      (subDayMs.get(period), dayWeekMs.get(period)) match {
        case (Some(ms), _) =>
          return Some(DurationGran(ms, originMs))
        case (_, Some(ms)) if tzIsUtc =>
          return Some(DurationGran(ms, originMs))
        case _ =>
          val unit = periodUnits.getOrElse(period,
            fail(s"period granularity '$period'"))
          val n = unit match {
            case "month" => 1
            case "quarter" => 3
            case "year" => 12
            case _ => 0
          }
          val tzo =
            if (tzIsUtc) None else Some(g.path("timeZone").asText())
          return Some(OriginGran(unit, n, tzo,
            java.time.Instant.ofEpochMilli(originMs)))
      }
    }
    // UTC spellings mean the default path; anything else is honored
    val tz =
      if (g.isObject && g.hasNonNull("timeZone"))
        Some(g.path("timeZone").asText())
          .filterNot(z => z == "UTC" || z == "Etc/UTC" || z == "+00:00")
      else None
    val name =
      if (g.isMissingNode || g.isNull) "all"
      else if (g.isTextual) g.asText()
      else g.path("type").asText() match {
        case "all" => "all"
        case "period" =>
          periodUnits.getOrElse(g.path("period").asText(),
            fail(s"period granularity '${g.path("period").asText()}'"))
        case other => fail(s"granularity type '$other'")
      }
    name match {
      case "all"                          => None
      case u if simpleUnits.contains(u)   => Some(UnitGran(u, tz))
      case other                          => fail(s"granularity '$other'")
    }
  }

  private val unitStep = Map(
    "second" -> "interval 1 second", "minute" -> "interval 1 minute",
    "hour" -> "interval 1 hour", "day" -> "interval 1 day",
    "week" -> "interval 7 day", "month" -> "interval 1 month",
    "quarter" -> "interval 3 month", "year" -> "interval 1 year")

  // ---- aggregations ------------------------------------------------------

  /** (output name, aggregate column, fills-with-zero-on-empty-bucket,
    * finalizer applied to the raw aggregate in the query result).
    *
    * `finalizer` is the Druid sketch-aggregator contract: the
    * aggregation itself produces the raw sketch blob (so
    * post-aggregators can `fieldAccess` it for set ops / quantiles),
    * and the RESULT column is the finalized value — estimate for
    * theta/HLL, stream length n for quantiles — unless the query sets
    * `context.finalize: false`.
    */
  private case class Agg(name: String, column: Column, countLike: Boolean,
                         finalizer: Option[Column => Column] = None)

  /** Sketch aggregates compile to the same registered Catalyst
    * aggregates the Druid SQL compat layer uses (SketchBuildAggs /
    * DsTheta / DsQuantiles / Spark's own DataSketches HLL) — real
    * DataSketches wire blobs, map-side partial aggregation, binary
    * merge at shuffle boundaries. Registration is idempotent.
    */
  private def sketchFns(): Unit = {
    val s = SparkSession.active
    graft.sql.DruidSqlCompat.register(s)
    graft.sql.DsQuantilesFunctions.register(s)
  }

  /** Druid HLL estimates are doubles unless `round: true`; Spark's
    * `hll_sketch_estimate` is already integral (long), so round just
    * picks the output type.
    */
  private def hllEstimate(c: Column, round: Boolean): Column =
    if (round) call_udf("hll_sketch_estimate", c)
    else call_udf("hll_sketch_estimate", c).cast("double")

  private def aggsOf(q: JsonNode): Seq[Agg] = {
    val node = q.path("aggregations")
    if (node.isMissingNode || node.isNull) Seq.empty
    else node.elements().asScala.map(compileAgg(_, pred = None)).toSeq
  }

  private def compileAgg(a: JsonNode, pred: Option[Column]): Agg = {
    val name = a.path("name").asText()
    def field: Column = {
      val c = ref(a.path("fieldName").asText())
      pred.fold(c)(p => when(p, c))
    }
    def intOpt(key: String, dflt: Int): Int =
      if (a.hasNonNull(key)) a.path(key).asInt() else dflt
    a.path("type").asText() match {
      case "count" =>
        Agg(name, pred.fold(count(lit(1)))(p => count(when(p, lit(1)))), countLike = true)
      case "longSum"              => Agg(name, sum(field.cast("long")), countLike = false)
      case "doubleSum" | "floatSum" => Agg(name, sum(field.cast("double")), countLike = false)
      case "longMin"              => Agg(name, min(field.cast("long")), countLike = false)
      case "longMax"              => Agg(name, max(field.cast("long")), countLike = false)
      case "doubleMin" | "floatMin" => Agg(name, min(field.cast("double")), countLike = false)
      case "doubleMax" | "floatMax" => Agg(name, max(field.cast("double")), countLike = false)
      case "doubleMean" => Agg(name, avg(field.cast("double")), countLike = false)
      case t @ ("longAny" | "doubleAny" | "floatAny" | "stringAny") =>
        // Druid ANY = "whichever value is cheapest". That freedom makes
        // results run-dependent; we pin it to first-by-__time — a legal
        // ANY, and deterministic, so it stays oracle-checkable.
        val raw = ref(a.path("fieldName").asText())
        val v =
          if (t.startsWith("long")) raw.cast("long")
          else if (t.startsWith("double")) raw.cast("double")
          else if (t.startsWith("float")) raw.cast("float")
          else raw.cast("string")
        Agg(name, min_by(v, pred.fold(col("__time"))(p => when(p, col("__time")))),
          countLike = false)
      case t @ ("longFirst" | "doubleFirst" | "floatFirst" | "stringFirst" |
                "longLast" | "doubleLast" | "floatLast" | "stringLast") =>
        // Druid's first/last-by-__time aggregators → min_by/max_by.
        // For the filtered wrapper the PREDICATE gates the ordering key
        // (min_by skips null orderings), not the value — first among
        // the filtered rows, exactly Druid's semantics.
        val raw = ref(a.path("fieldName").asText())
        val v =
          if (t.startsWith("long")) raw.cast("long")
          else if (t.startsWith("double")) raw.cast("double")
          else if (t.startsWith("float")) raw.cast("float")
          else raw.cast("string")
        val ord = pred.fold(col("__time"))(p => when(p, col("__time")))
        Agg(name,
          if (t.endsWith("First")) min_by(v, ord) else max_by(v, ord),
          countLike = false)
      case "thetaSketch" | "thetaSketchBuild" | "thetaSketchMerge" =>
        // build over raw values OR merge over COMPLEX blobs — the
        // registered ThetaSketchAgg dispatches on child type, exactly
        // Druid's overload rule for the thetaSketch aggregator
        sketchFns()
        Agg(name, call_udf("ds_theta", field, lit(intOpt("size", 16384))),
          countLike = false,
          finalizer = Some(c => call_udf("theta_sketch_estimate", c)))
      case "quantilesDoublesSketch" =>
        sketchFns()
        Agg(name, call_udf("ds_quantiles_sketch", field, lit(intOpt("k", 128))),
          countLike = false,
          // Druid finalizes a quantiles sketch to its stream length n
          finalizer = Some(c => call_udf("ds_quantiles_n", c)))
      case "arrayOfDoublesSketch" =>
        // datasketches-contrib Tuple sketch: distinct keys + per-key
        // summed metric vectors in one pass. With metricColumns it
        // BUILDS from raw rows; without, it MERGES pre-built blobs
        // (the re-aggregation path over a COMPLEX column) — Druid's
        // own overload rule for this aggregator. Finalizes to the
        // distinct-key estimate, like Druid's factory.
        sketchFns()
        val nom = intOpt("nominalEntries", 16384)
        val metricCols = a.path("metricColumns").elements().asScala.toSeq
        if (metricCols.isEmpty)
          Agg(name, call_udf("ds_tuple_merge", field, lit(nom)),
            countLike = false,
            finalizer = Some(c => call_udf("ds_tuple_estimate", c)))
        else {
          if (a.hasNonNull("numberOfValues") &&
              a.path("numberOfValues").asInt() != metricCols.size)
            fail("arrayOfDoublesSketch numberOfValues != metricColumns length")
          val ms = metricCols.map(m => ref(m.asText()).cast("double"))
          Agg(name, call_udf("ds_tuple", field, array(ms: _*), lit(nom)),
            countLike = false,
            finalizer = Some(c => call_udf("ds_tuple_estimate", c)))
        }
      case "tDigestSketch" =>
        // druid-tdigest extension: build over raw values or merge over
        // COMPLEX blobs (child-type dispatch, like thetaSketch). No
        // finalizer — Druid returns the sketch itself; clients read it
        // through the quantile(s)FromTDigestSketch post-aggregators.
        sketchFns()
        Agg(name,
          call_udf("tdigest_agg", field, lit(intOpt("compression", 100))),
          countLike = false)
      case "HLLSketchBuild" | "hyperUnique" =>
        // hyperUnique (Druid's legacy HyperLogLogCollector) maps to the
        // DataSketches HLL build — same semantics, exact in the
        // low-cardinality regime, documented substitute encoding
        sketchFns()
        val round = a.path("round").asBoolean(false)
        Agg(name, call_udf("ds_hll", field, lit(intOpt("lgK", 12))),
          countLike = false, finalizer = Some(c => hllEstimate(c, round)))
      case "cardinality" =>
        sketchFns()
        val fields = a.path("fields").elements().asScala.toSeq.map { f =>
          if (f.isTextual) ref(f.asText()) else dimensionSpec(f)._1
        }
        if (fields.isEmpty) fail("cardinality aggregator with no fields")
        val round = a.path("round").asBoolean(false)
        def sk(c: Column) =
          call_udf("ds_hll", pred.fold(c)(p => when(p, c)), lit(12))
        val sketch =
          if (fields.size == 1) sk(fields.head.cast("string"))
          else if (a.path("byRow").asBoolean(false))
            // distinct field TUPLES: one update per row over the
            // separator-joined values. Each field gets an explicit null
            // sentinel first — concat_ws silently SKIPS nulls, which
            // would hash ('a', null) and (null, 'a') identically; Druid
            // hashes nulls positionally and counts them distinct.
            sk(concat_ws("\u0001",
              fields.map(c => coalesce(c.cast("string"), lit("\u0000"))): _*))
          else
            // distinct values across ALL fields: per-field sketches
            // unioned with Spark's binary hll_union — still one
            // aggregation pass, map-side partials per field
            fields.map(c => sk(c.cast("string")))
              .reduce((x, y) => call_udf("hll_union", x, y))
        Agg(name, sketch, countLike = false,
          finalizer = Some(c => hllEstimate(c, round)))
      case "variance" | "varianceFold" =>
        // druid-stats extension (the most common non-sketch extension
        // aggregator in dashboards). Druid's estimator contract:
        // "population" divides by n, anything else — including the
        // default — is the n-1 sample estimator. varianceFold (Druid's
        // combine-partials form) is the same result computed over raw
        // rows here, because Spark's var_pop/var_samp already merge
        // partials at shuffle boundaries.
        val pop = a.path("estimator").asText("") equalsIgnoreCase "population"
        val v = field.cast("double")
        Agg(name,
          if (pop) var_pop(v)
          // Druid's sample estimator returns 0 for a single-row group
          // (VarianceAggregatorCollector), where var_samp yields NULL
          else coalesce(var_samp(v), when(count(v) > 0, lit(0.0))),
          countLike = false)
      case "filtered" =>
        // nested filtered wrappers conjoin their predicates — a row
        // must satisfy every enclosing filter, exactly Druid's
        // FilteredAggregator-in-FilteredAggregator behavior
        val own = compileFilter(a.path("filter"))
        val p = pred.fold(own)(outer => outer && own)
        val inner = compileAgg(a.path("aggregator"), pred = Some(p))
        // Druid names a filtered aggregator by the INNER aggregator's
        // name; an outer "name" (some clients set both) wins if present.
        Agg(if (name.nonEmpty) name else inner.name, inner.column,
          inner.countLike, inner.finalizer)
      case other => fail(s"aggregation type '$other'")
    }
  }

  // ---- post-aggregations -------------------------------------------------

  private def postAggsOf(q: JsonNode,
                         fins: Map[String, Column => Column]): Seq[(String, Column)] = {
    val node = q.path("postAggregations")
    if (node.isMissingNode || node.isNull) Seq.empty
    else node.elements().asScala
      .map(p => p.path("name").asText() -> compilePost(p, fins)).toSeq
  }

  private def compilePost(p: JsonNode,
                          fins: Map[String, Column => Column]): Column =
    p.path("type").asText() match {
    case "fieldAccess" => ref(p.path("fieldName").asText())
    case "finalizingFieldAccess" =>
      // finalized view of the referenced aggregator: the estimate / n
      // for sketches, the raw value for everything else
      val f = p.path("fieldName").asText()
      fins.get(f).fold(ref(f))(fin => fin(ref(f)))
    case "constant"   => lit(p.path("value").asDouble())
    case "expression" => druidExpr(p.path("expression").asText())
    case "arithmetic" =>
      val fields = p.path("fields").elements().asScala
        .map(compilePost(_, fins)).toSeq
      if (fields.isEmpty) fail("arithmetic post-aggregator with no fields")
      p.path("fn").asText() match {
        case "+" => fields.reduce(_ + _)
        case "-" => fields.reduce(_ - _)
        case "*" => fields.reduce(_ * _)
        // Druid's "/" yields 0 on division by zero; "quotient" is plain
        // floating-point division (Inf/NaN allowed).
        case "/" =>
          fields.reduce((a, b) =>
            when(b.cast("double") === 0.0, lit(0.0)).otherwise(a.cast("double") / b.cast("double")))
        case "quotient" => fields.reduce(_.cast("double") / _.cast("double"))
        case other      => fail(s"arithmetic fn '$other'")
      }
    case "thetaSketchEstimate" =>
      sketchFns()
      call_udf("theta_sketch_estimate", compilePost(p.path("field"), fins))
    case "thetaSketchSetOp" =>
      sketchFns()
      val fields = p.path("fields").elements().asScala
        .map(compilePost(_, fins)).toSeq
      if (fields.size < 2) fail("thetaSketchSetOp with fewer than 2 fields")
      val fn = p.path("func").asText().toUpperCase match {
        case "UNION"     => "theta_sketch_union"
        case "INTERSECT" => "theta_sketch_intersect"
        case "NOT"       => "theta_sketch_not"
        case other       => fail(s"thetaSketchSetOp func '$other'")
      }
      fields.reduce((a, b) => call_udf(fn, a, b))
    case "quantilesDoublesSketchToQuantile" =>
      sketchFns()
      call_udf("ds_get_quantile", compilePost(p.path("field"), fins),
        lit(p.path("fraction").asDouble()))
    case "quantilesDoublesSketchToQuantiles" =>
      sketchFns()
      val f = compilePost(p.path("field"), fins)
      val fractions = p.path("fractions").elements().asScala
        .map(_.asDouble()).toSeq
      if (fractions.isEmpty) fail("quantilesDoublesSketchToQuantiles with no fractions")
      array(fractions.map(fr => call_udf("ds_get_quantile", f, lit(fr))): _*)
    case "hllSketchEstimate" =>
      sketchFns()
      hllEstimate(compilePost(p.path("field"), fins),
        p.path("round").asBoolean(false))
    case "quantileFromTDigestSketch" =>
      sketchFns()
      call_udf("tdigest_sketch_quantile", compilePost(p.path("field"), fins),
        lit(p.path("fraction").asDouble()))
    case "quantilesFromTDigestSketch" =>
      sketchFns()
      val f = compilePost(p.path("field"), fins)
      val fractions = p.path("fractions").elements().asScala
        .map(_.asDouble()).toSeq
      if (fractions.isEmpty) fail("quantilesFromTDigestSketch with no fractions")
      array(fractions.map(fr => call_udf("tdigest_sketch_quantile", f, lit(fr))): _*)
    case "arrayOfDoublesSketchToEstimate" =>
      sketchFns()
      call_udf("ds_tuple_estimate", compilePost(p.path("field"), fins))
    case "arrayOfDoublesSketchToMetricsSumEstimate" =>
      sketchFns()
      call_udf("ds_tuple_metrics_sum", compilePost(p.path("field"), fins))
    case "arrayOfDoublesSketchToNumEntries" =>
      sketchFns()
      call_udf("ds_tuple_n", compilePost(p.path("field"), fins))
    case "arrayOfDoublesSketchSetOp" =>
      sketchFns()
      val fields = p.path("fields").elements().asScala
        .map(compilePost(_, fins)).toSeq
      if (fields.size < 2) fail("arrayOfDoublesSketchSetOp with fewer than 2 fields")
      val nom =
        if (p.hasNonNull("nominalEntries")) p.path("nominalEntries").asInt()
        else 16384
      p.path("operation").asText().toUpperCase match {
        case "UNION" =>
          fields.reduce((a, b) => call_udf("ds_tuple_union", a, b, lit(nom)))
        case "INTERSECT" =>
          fields.reduce((a, b) => call_udf("ds_tuple_intersect", a, b, lit(nom)))
        case "NOT" =>
          fields.reduce((a, b) => call_udf("ds_tuple_not", a, b))
        case other => fail(s"arrayOfDoublesSketchSetOp operation '$other'")
      }
    case "stddev" =>
      // druid-stats StandardDeviationPostAggregator: square root of
      // the variance aggregator it references (the estimator choice
      // lives on that aggregator)
      sqrt(ref(p.path("fieldName").asText()))
    case t @ ("doubleGreatest" | "longGreatest" | "doubleLeast" | "longLeast") =>
      // Druid's n-ary greatest/least post-aggregators; nulls are
      // skipped (the greatest/least of the non-null inputs), matching
      // Spark's GREATEST/LEAST
      val castTo = if (t.startsWith("double")) "double" else "long"
      val fields = p.path("fields").elements().asScala
        .map(f => compilePost(f, fins).cast(castTo)).toSeq
      if (fields.isEmpty) fail(s"$t with no fields")
      if (fields.size == 1) fields.head
      else if (t.endsWith("Greatest")) greatest(fields: _*) else least(fields: _*)
    case other => fail(s"post-aggregation type '$other'")
  }

  /** Post-aggregations over the RAW aggregate columns, then Druid's
    * result finalization: each sketch aggregator's output column is
    * replaced by its finalized value unless `context.finalize: false`
    * keeps the blobs (the shape a client uses to fetch mergeable
    * sketches for its own set operations).
    */
  private def applyPost(df: DataFrame, q: JsonNode, aggs: Seq[Agg]): DataFrame = {
    val fins = aggs.collect { case Agg(n, _, _, Some(f)) => n -> f }.toMap
    val posted = postAggsOf(q, fins).foldLeft(df) {
      case (d, (name, c)) => d.withColumn(name, c)
    }
    if (!q.path("context").path("finalize").asBoolean(true)) posted
    else fins.foldLeft(posted) { case (d, (n, f)) =>
      if (d.columns.contains(n)) d.withColumn(n, f(col(n))) else d
    }
  }

  // ---- dimension specs ---------------------------------------------------

  /** (source column, output name). An explicit `outputType`
    * (STRING/LONG/FLOAT/DOUBLE) casts the dimension like Druid does.
    */
  private def castOutputType(c: Column, d: JsonNode): Column =
    if (!d.isObject || !d.hasNonNull("outputType")) c
    else d.path("outputType").asText().toUpperCase match {
      case "STRING" => c.cast("string")
      case "LONG"   => c.cast("long")
      case "FLOAT"  => c.cast("float")
      case "DOUBLE" => c.cast("double")
      case other    => fail(s"dimension outputType '$other'")
    }

  private def dimensionSpec(d: JsonNode): (Column, String) = {
    def typed(c: Column): Column = castOutputType(c, d)
    if (d.isTextual) (ref(d.asText()), d.asText())
    else d.path("type").asText() match {
      case "default" =>
        val dim = d.path("dimension").asText()
        val out = if (d.hasNonNull("outputName")) d.path("outputName").asText() else dim
        (typed(ref(dim)), out)
      case "extraction" =>
        val dim = d.path("dimension").asText()
        val out = if (d.hasNonNull("outputName")) d.path("outputName").asText() else dim
        (typed(extractionFn(ref(dim), d.path("extractionFn"))), out)
      case "listFiltered" | "regexFiltered" | "prefixFiltered" =>
        // the VALUE comes from the per-spec column unnestMvDims
        // materialized; the delegate contributes naming + outputType
        val out = outNameOf(d)
        (castOutputType(col(filteredColName(out)), d.path("delegate")), out)
      case other => fail(s"dimension spec type '$other'")
    }
  }

  /** Druid extractionFn -> Column transform (the dimension-rewrite half
    * of Druid's extraction dimension specs). Druid's contract is
    * string-in/string-out, so numeric results (strlen) cast back to
    * string.
    */
  private def extractionFn(c: Column, fn: JsonNode): Column =
    fn.path("type").asText() match {
      case "substring" =>
        // Druid: 0-based index, optional length; out-of-range -> null
        val index = fn.path("index").asInt(0)
        val len =
          if (fn.hasNonNull("length")) fn.path("length").asInt()
          else Int.MaxValue
        when(length(c) > index, c.substr(lit(index + 1), lit(len)))
      case "lower" => lower(c)
      case "upper" => upper(c)
      case "strlen" => length(c).cast("string")
      case "regex" =>
        // group 1 of the match; Druid's default replaceMissingValue=false
        // keeps the original value when the pattern misses
        val pat = fn.path("expr").asText()
        val g = regexp_extract(c, pat, 1)
        if (fn.path("replaceMissingValue").asBoolean(false))
          when(g =!= "", g).otherwise(
            if (fn.hasNonNull("replaceMissingValueWith"))
              lit(fn.path("replaceMissingValueWith").asText())
            else lit(null).cast("string"))
        else when(g =!= "", g).otherwise(c)
      case "timeFormat" =>
        // Joda patterns restricted to the JDK-compatible subset
        val pat = fn.path("format").asText("yyyy-MM-dd")
        date_format(c, pat)
      case "lookup" =>
        // inline map lookup; retainMissingValue=true keeps unmapped
        // values, otherwise they become replaceMissingValueWith/null.
        // The map compiles to a literal Catalyst CreateMap — at scale
        // this is Druid's broadcast lookup join expressed as a
        // partition-local expression, no shuffle.
        val lk = fn.path("lookup")
        if (lk.path("type").asText() != "map")
          fail(s"lookup type '${lk.path("type").asText()}'")
        val entries = lk.path("map").fields().asScala.toSeq
          .flatMap(e => Seq(lit(e.getKey), lit(e.getValue.asText())))
        val mapped =
          if (entries.isEmpty) lit(null).cast("string")
          else element_at(map(entries: _*), c)
        if (fn.path("retainMissingValue").asBoolean(false))
          coalesce(mapped, c)
        else if (fn.hasNonNull("replaceMissingValueWith"))
          coalesce(mapped, lit(fn.path("replaceMissingValueWith").asText()))
        else mapped
      case "registeredLookup" =>
        // session-registered lookup by name — the form dashboards send
        // (the inline-map "lookup" type above is the ad-hoc variant).
        // Compiles through DruidLookups: small maps inline as a
        // codegen'd CASE switch, larger ones ride the task closure —
        // Druid's broadcast-lookup execution shape, no shuffle.
        val name = fn.path("lookup").asText()
        if (graft.sql.DruidLookups.get(name).isEmpty)
          fail(s"registeredLookup '$name' (not registered)")
        val mapped = graft.sql.DruidLookups.lookupColumn(c, name)
        if (fn.path("retainMissingValue").asBoolean(false))
          coalesce(mapped, c)
        else if (fn.hasNonNull("replaceMissingValueWith"))
          coalesce(mapped, lit(fn.path("replaceMissingValueWith").asText()))
        else mapped
      case "cascade" =>
        // left-to-right composition of extraction functions
        fn.path("extractionFns").elements().asScala
          .foldLeft(c)((acc, sub) => extractionFn(acc, sub))
      case "bucket" =>
        // BucketExtractionFn: floor the numeric value into
        // offset-aligned buckets of `size`; non-numeric values null out
        // (try_cast) like Druid. Output is the bucket START as a
        // string, Druid's String.valueOf(double) rendering.
        val size = fn.path("size").asDouble(1.0)
        val offset = fn.path("offset").asDouble(0.0)
        val v = c.try_cast("double")
        (floor((v - lit(offset)) / lit(size)) * lit(size) + lit(offset))
          .cast("string")
      case "stringFormat" =>
        // StringFormatExtractionFn; nullHandling nullString (default,
        // Java Formatter renders "null"), emptyString, or returnNull
        val f = fn.path("format").asText()
        fn.path("nullHandling").asText("nullString") match {
          case "nullString"  => format_string(f, c)
          case "emptyString" => format_string(f, coalesce(c, lit("")))
          case "returnNull"  =>
            when(c.isNotNull, format_string(f, c))
          case other => fail(s"stringFormat nullHandling '$other'")
        }
      case "partial" =>
        // MatchingDimExtractionFn: keep values the regex FINDS a match
        // in, null otherwise
        when(c.rlike(fn.path("expr").asText()), c)
      case "searchQuery" =>
        // SearchQuerySpecDimExtractionFn: keep values the search spec
        // matches, null otherwise
        when(searchPredicate(c, fn.path("query")), c)
      case other => fail(s"extractionFn type '$other'")
    }

  // ---- query types -------------------------------------------------------

  private def timeseries(base: DataFrame, q: JsonNode): DataFrame = {
    val aggs = aggsOf(q)
    if (aggs.isEmpty) fail("timeseries with no aggregations")
    val aggCols = aggs.map(a => a.column.as(a.name))
    truncUnit(q) match {
      case None =>
        applyPost(base.agg(aggCols.head, aggCols.tail: _*), q, aggs)
      case Some(g) =>
        val grouped = base
          .groupBy(g.bucket(col("__time")).as("__time"))
          .agg(aggCols.head, aggCols.tail: _*)
        val skipEmpty = q.path("context").path("skipEmptyBuckets").asBoolean(false)
        val ivs = intervalsOf(q)
        val filled =
          if (skipEmpty || ivs.size != 1) grouped
          else {
            // Bucket spine: granularity-aligned from trunc(start), end-
            // exclusive. Left join + identity fill = Druid's default
            // dense timeseries (count-family 0, value aggregates NULL).
            val (start, end) = ivs.head
            val spine = g.spineDF(base.sparkSession, start, end)
            spine.join(grouped, Seq("__time"), "left").select(
              col("__time") +: aggs.map(a =>
                if (a.countLike) coalesce(col(a.name), lit(0L).cast("long")).as(a.name)
                else col(a.name)): _*)
          }
        val ordered = applyPost(filled, q, aggs)
        val sorted =
          if (q.path("descending").asBoolean(false)) ordered.orderBy(col("__time").desc)
          else ordered.orderBy(col("__time"))
        val lim = q.path("limit")
        val limited =
          if (lim.isMissingNode || lim.isNull) sorted else sorted.limit(lim.asInt())
        if (!q.path("context").path("grandTotal").asBoolean(false)) limited
        else {
          // Druid's `context.grandTotal`: one extra result row with the
          // aggregates combined across ALL buckets (timestamp null),
          // appended AFTER the bucket rows and outside any limit.
          // Computed from the filtered base in one aggregate pass —
          // for every supported aggregator this equals Druid's
          // combine-of-bucket-partials (sums of sums, min of mins, a
          // Welford merge for variance, sketch unions, ...).
          val total = applyPost(
            base.agg(aggCols.head, aggCols.tail: _*)
              .withColumn("__time", lit(null).cast("timestamp")),
            q, aggs)
          limited.unionByName(total.select(limited.columns.map(col): _*))
        }
    }
  }

  private def topN(base0: DataFrame, q: JsonNode): DataFrame = {
    val base = unnestMvDims(base0, Seq(q.path("dimension")))
    val (dimCol, outName) = dimensionSpec(q.path("dimension"))
    val threshold = q.path("threshold").asInt()
    if (threshold <= 0) fail("topN threshold <= 0")
    val aggs = aggsOf(q)
    if (aggs.isEmpty) fail("topN with no aggregations")
    val aggCols = aggs.map(a => a.column.as(a.name))
    // a non-"all" granularity means PER-BUCKET top-K (Druid emits one
    // result entry per time bucket) — the bucket joins the grouping
    // key and the limit applies within each bucket, not globally
    val unit = truncUnit(q)
    val keys = unit.map(g => g.bucket(col("__time")).as("__time")).toSeq :+
      dimCol.as(outName)
    val grouped = applyPost(
      base.groupBy(keys: _*).agg(aggCols.head, aggCols.tail: _*), q, aggs)
    val metric = q.path("metric")
    // dimension-ordered metric specs accept `previousStop`, Druid's
    // pagination token: only dimension values strictly AFTER it (under
    // the spec's comparator) appear in this page
    def afterStop(ordering: String): DataFrame =
      if (!metric.hasNonNull("previousStop")) grouped
      else grouped.filter(orderingKey(col(outName), ordering) >
        orderingKey(lit(metric.path("previousStop").asText()), ordering))
    val (paged, order): (DataFrame, Seq[Column]) =
      if (metric.isTextual)
        (grouped, Seq(col(metric.asText()).desc, col(outName).asc))
      else metric.path("type").asText() match {
        case "numeric" =>
          (grouped, Seq(col(metric.path("metric").asText()).desc, col(outName).asc))
        case "inverted" =>
          val inner = metric.path("metric")
          val m = if (inner.isTextual) inner.asText() else inner.path("metric").asText()
          (grouped, Seq(col(m).asc, col(outName).asc))
        case "dimension" =>
          // DimensionTopNMetricSpec: sort by the dimension itself under
          // an optional StringComparator ordering
          val ord = comparatorOf(metric.path("ordering"))
          (afterStop(ord), Seq(orderingKey(col(outName), ord).asc))
        case "lexicographic" =>
          (afterStop("lexicographic"), Seq(col(outName).asc))
        case "alphaNumeric" => // legacy TopNMetricSpec, same comparator as
          // the modern {type: dimension, ordering: alphanumeric}
          (afterStop("alphanumeric"),
            Seq(orderingKey(col(outName), "alphanumeric").asc))
        case other => fail(s"topN metric type '$other'")
      }
    unit match {
      case None => paged.orderBy(order: _*).limit(threshold)
      case Some(_) =>
        // rank within each bucket; the window shuffles on __time only,
        // which is exactly the partial-agg-then-one-exchange shape a
        // per-bucket top-K needs (the groupBy above already reduced
        // cardinality to buckets × dimension values)
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("__time")).orderBy(order: _*)
        paged.withColumn("__rank", row_number().over(w))
          .filter(col("__rank") <= threshold).drop("__rank")
          .orderBy(col("__time").asc +: order: _*)
    }
  }

  /** Druid groups/topNs a MULTI-VALUE dimension by VALUE, not by the
    * whole array: each row contributes once per value (rows with no
    * values contribute a null). Unnest the referenced array dimensions
    * before grouping — filters have already run against the intact
    * rows, like Druid.
    */
  /** The underlying dimension NAME of a spec, looking through the
    * filtered-spec wrappers (their delegate carries the name).
    */
  private def dimNameOf(d: JsonNode): String =
    if (d.isTextual) d.asText()
    else d.path("type").asText() match {
      case "listFiltered" | "regexFiltered" | "prefixFiltered" =>
        dimNameOf(d.path("delegate"))
      case _ => d.path("dimension").asText()
    }

  /** Druid's filtered dimension specs (listFiltered / regexFiltered /
    * prefixFiltered) as a per-value predicate: on a multi-value
    * dimension the row's value list is filtered BEFORE unnesting (a
    * row with no surviving values reports the null group, like Druid);
    * on a single-value dimension an unmatched value becomes null.
    * Only `default`/textual delegates are accepted — Druid filters the
    * DELEGATE's output, so an extraction delegate would need
    * post-extraction filtering, and a silent pre-extraction filter
    * would return different groups than the client's cluster.
    */
  private def mvValuePredicate(d: JsonNode): Option[Column => Column] = {
    def checkDelegate(): Unit = {
      val del = d.path("delegate")
      val ok = del.isTextual || del.path("type").asText("default") == "default"
      if (!ok) fail(s"filtered dimension spec over a " +
        s"'${del.path("type").asText()}' delegate (only default)")
    }
    d.path("type").asText() match {
      case "listFiltered" =>
        checkDelegate()
        val values = textSeq(d.path("values"))
        val white = d.path("isWhitelist").asBoolean(true)
        Some(c => if (white) c.isin(values: _*)
                  else !coalesce(c.isin(values: _*), lit(false)))
      case "regexFiltered" =>
        checkDelegate()
        val p = d.path("pattern").asText()
        Some(c => c.rlike(p))
      case "prefixFiltered" =>
        checkDelegate()
        val p = d.path("prefix").asText()
        Some(c => c.startsWith(p))
      case _ => None
    }
  }

  /** The OUTPUT name of a dimension spec (the delegate's for filtered
    * wrappers) — also keys the per-spec filtered column.
    */
  private def outNameOf(d: JsonNode): String =
    if (d.isTextual) d.asText()
    else d.path("type").asText() match {
      case "listFiltered" | "regexFiltered" | "prefixFiltered" =>
        outNameOf(d.path("delegate"))
      case _ =>
        if (d.hasNonNull("outputName")) d.path("outputName").asText()
        else d.path("dimension").asText()
    }

  private def filteredColName(out: String): String = "__filtered_" + out

  private def isArrayCol(df: DataFrame, name: String): Boolean =
    df.schema.fields.exists(f =>
      f.name == name && f.dataType.isInstanceOf[ArrayType])

  private def unnestMvDims(df: DataFrame, dimNodes: Seq[JsonNode]): DataFrame = {
    // filtered specs materialize into their OWN per-spec column, so
    // the SOURCE column — and any aggregator or second dimension spec
    // reading it — keeps its unfiltered values (Druid filters only the
    // dimension selector's output, never the underlying column)
    val (filtered, plain) = dimNodes.partition(d => mvValuePredicate(d).isDefined)
    val exploded = plain
      .map(dimNameOf)
      .distinct
      .foldLeft(df)((acc, name) =>
        if (isArrayCol(acc, name)) acc.withColumn(name, explode_outer(col(name)))
        else acc)
    filtered.foldLeft(exploded) { (acc, d) =>
      val name = dimNameOf(d)
      val p = mvValuePredicate(d).get
      val out = filteredColName(outNameOf(d))
      if (isArrayCol(acc, name))
        // explode_outer turns an emptied-out list into one null row —
        // Druid's "no surviving values → null group"
        acc.withColumn(out, explode_outer(filter(col(name), p)))
      else
        acc.withColumn(out, when(p(col(name)), col(name)))
    }
  }

  private def groupByQuery(base0: DataFrame, q: JsonNode): DataFrame = {
    val dimNodes = q.path("dimensions").elements().asScala.toSeq
    val base = unnestMvDims(base0, dimNodes)
    val dims = dimNodes.map(dimensionSpec)
    if (dims.isEmpty) fail("groupBy with no dimensions (use timeseries)")
    val aggs = aggsOf(q)
    val aggCols = aggs.map(a => a.column.as(a.name))
    val unit = truncUnit(q)
    val keys = unit.map(g => g.bucket(col("__time")).as("__time")).toSeq ++
      dims.map { case (c, n) => c.as(n) }
    val subtotals = q.path("subtotalsSpec")
    val grouped0 =
      if (subtotals.isMissingNode || subtotals.isNull)
        base.groupBy(keys: _*).agg(aggCols.head, aggCols.tail: _*)
      else {
        // Druid subtotalsSpec = SQL GROUPING SETS over the dimension
        // OUTPUT names: each listed set is grouped independently and
        // dimensions outside the set come back null. The granularity
        // time bucket (when present) stays in every set, as in Druid.
        // One pass, one shuffle — Spark's Expand feeds a single
        // aggregate rather than re-scanning per set.
        val keyed = (unit.map(g => ("__time", g.bucket(col("__time")))).toSeq ++
          dims.map { case (c, n) => (n, c) })
          .foldLeft(base) { case (d, (n, c)) => d.withColumn(n, c) }
        val keyNames = unit.map(_ => "__time").toSeq ++ dims.map(_._2)
        val sets = subtotals.elements().asScala.map(setNode =>
          (unit.map(_ => "__time").toSeq ++ textSeq(setNode)).map(col)).toSeq
        if (sets.isEmpty) fail("subtotalsSpec with no sets")
        keyed.groupingSets(sets, keyNames.map(col): _*)
          .agg(aggCols.head, aggCols.tail: _*)
      }
    val grouped = applyPost(grouped0, q, aggs)
    val havingNode = q.path("having")
    val held =
      if (havingNode.isMissingNode || havingNode.isNull) grouped
      else grouped.filter(compileHaving(havingNode))
    val dimNames = unit.map(_ => "__time").toSeq ++ dims.map(_._2)
    val limitSpec = q.path("limitSpec")
    if (limitSpec.isMissingNode || limitSpec.isNull)
      held.orderBy(dimNames.map(col): _*)
    else {
      val cols = limitSpec.path("columns").elements().asScala.map { c =>
        if (c.isTextual) col(c.asText()).asc
        else {
          // an explicit dimensionOrder picks the StringComparator the
          // column sorts under (Druid's OrderByColumnSpec); without
          // one the column's natural type order applies
          val name = c.path("dimension").asText()
          val dimOrder = c.path("dimensionOrder")
          val base =
            if (dimOrder.isMissingNode || dimOrder.isNull) col(name)
            else orderingKey(col(name), comparatorOf(dimOrder))
          if (c.path("direction").asText("ascending") == "descending") base.desc
          else base.asc
        }
      }.toSeq
      val named = limitSpec.path("columns").elements().asScala.map { c =>
        if (c.isTextual) c.asText() else c.path("dimension").asText()
      }.toSet
      val tieBreak = dimNames.filterNot(named).map(col(_).asc)
      val sorted = held.orderBy(cols ++ tieBreak: _*)
      val lim = limitSpec.path("limit")
      if (lim.isMissingNode || lim.isNull) sorted else sorted.limit(lim.asInt())
    }
  }

  private def compileHaving(h: JsonNode): Column = h.path("type").asText() match {
    case "dimSelector" =>
      col(h.path("dimension").asText()).cast("string") ===
        lit(h.path("value").asText())
    case "greaterThan" => col(h.path("aggregation").asText()) > lit(h.path("value").asDouble())
    case "lessThan"    => col(h.path("aggregation").asText()) < lit(h.path("value").asDouble())
    case "equalTo"     => col(h.path("aggregation").asText()) === lit(h.path("value").asDouble())
    case "and" => h.path("havingSpecs").elements().asScala.map(compileHaving).reduce(_ && _)
    case "or"  => h.path("havingSpecs").elements().asScala.map(compileHaving).reduce(_ || _)
    case "not" => !compileHaving(h.path("havingSpec"))
    case "filter" => compileFilter(h.path("filter"))
    case other => fail(s"having type '$other'")
  }

  private def scan(base: DataFrame, q: JsonNode): DataFrame = {
    val colsNode = q.path("columns")
    val projected =
      if (colsNode.isMissingNode || colsNode.isNull || !colsNode.elements().hasNext) base
      else base.select(textSeq(colsNode).map(ref): _*)
    // modern Druid scans send an `orderBy` COLUMN LIST; the legacy
    // `order` string sorts by __time only. orderBy wins when both
    // appear (Druid rejects the combination; the list subsumes it).
    val orderByNode = q.path("orderBy")
    val ordered =
      if (!orderByNode.isMissingNode && !orderByNode.isNull &&
          orderByNode.elements().hasNext) {
        val sorts = orderByNode.elements().asScala.map { ob =>
          val c = ref(ob.path("columnName").asText())
          ob.path("order").asText("ascending") match {
            case "ascending"  => c.asc
            case "descending" => c.desc
            case other        => fail(s"scan orderBy order '$other'")
          }
        }.toSeq
        projected.orderBy(sorts: _*)
      } else q.path("order").asText("none") match {
        case "none"       => projected
        case "ascending"  => projected.orderBy(col("__time").asc)
        case "descending" => projected.orderBy(col("__time").desc)
        case other        => fail(s"scan order '$other'")
      }
    val off = q.path("offset")
    val shifted = if (off.isMissingNode || off.isNull) ordered else ordered.offset(off.asInt())
    val lim = q.path("limit")
    if (lim.isMissingNode || lim.isNull) shifted else shifted.limit(lim.asInt())
  }

  private def search(base: DataFrame, q: JsonNode): DataFrame = {
    val dims = textSeq(q.path("searchDimensions"))
    if (dims.isEmpty) fail("search with no searchDimensions")
    val qn = q.path("query")
    // a non-"all" granularity counts hits PER TIME BUCKET (the bucket
    // leads the output), like every other bucketed query type —
    // ignoring it would silently merge buckets a Druid client expects
    // separate
    val unit = truncUnit(q)
    val bucketKey = unit.map(g => g.bucket(col("__time")).as("__time")).toSeq
    val perDim = dims.map { d =>
      // Multi-value (array) dimensions explode to per-value rows first —
      // Druid's search counts value occurrences the same way.
      val isArray = base.schema.fields.exists(f =>
        f.name == d && f.dataType.isInstanceOf[ArrayType])
      val values =
        if (isArray) base.select(bucketKey :+ explode(ref(d)).as("value"): _*)
        else base.select(bucketKey :+ ref(d).cast("string").as("value"): _*)
      values.filter(searchPredicate(col("value"), qn))
        .groupBy(unit.map(_ => col("__time")).toSeq :+ col("value"): _*)
        .agg(count(lit(1)).as("count"))
        .select(unit.map(_ => col("__time")).toSeq ++
          Seq(lit(d).as("dimension"), col("value"), col("count")): _*)
    }
    // Druid's SearchSortSpec picks the comparator hit values sort
    // under (lexicographic default; alphanumeric/strlen/numeric/
    // version ride the shared orderingKey)
    val sortType = comparatorOf(q.path("sort"))
    val all = perDim.reduce(_.unionAll(_))
      .orderBy(unit.map(_ => col("__time").asc).toSeq ++
        Seq(col("dimension").asc, orderingKey(col("value"), sortType).asc): _*)
    val lim = q.path("limit")
    if (lim.isMissingNode || lim.isNull) all else all.limit(lim.asInt())
  }

  private def timeBoundary(base: DataFrame, q: JsonNode): DataFrame =
    q.path("bound").asText("") match {
      case "minTime" => base.agg(min(col("__time")).as("minTime"))
      case "maxTime" => base.agg(max(col("__time")).as("maxTime"))
      case "" =>
        base.agg(min(col("__time")).as("minTime"), max(col("__time")).as("maxTime"))
      case other => fail(s"timeBoundary bound '$other'")
    }

  /** Druid's schema-discovery query (what the console and most client
    * libraries send first). MERGED analysis relationalized: one row per
    * column with the Druid type name, multi-value flag, cardinality
    * (string/multi-value dimensions only — Druid reports dictionary
    * cardinality; numerics get null like Druid's -1), and stringified
    * min/max (timestamps as epoch millis — Druid's time unit). A
    * trailing `numRows` field carries the total row count on every row.
    *
    * One declarative pass: every per-column aggregate lands in a single
    * `agg(...)` over one scan (count-distinct columns get Spark's
    * Expand-based planning; at 100 TB you'd request fewer
    * `analysisTypes`, exactly as in Druid). `analysisTypes` controls
    * the work: default [cardinality, minmax]; an empty list answers
    * from the schema + row count alone.
    */
  private def segmentMetadata(base: DataFrame, q: JsonNode): DataFrame = {
    import org.apache.spark.sql.types._
    val at = q.path("analysisTypes")
    val analyses: Set[String] =
      if (at.isMissingNode || at.isNull) Set("cardinality", "minmax")
      else textSeq(at).toSet
    val colsIn = q.path("toInclude") match {
      case n if n.isObject && n.path("type").asText() == "list" =>
        val keep = textSeq(n.path("columns")).toSet
        base.columns.filter(keep)
      case _ => base.columns
    }
    def druidType(dt: DataType): (String, Boolean) = dt match {
      case StringType                    => ("STRING", false)
      case ArrayType(StringType, _)      => ("STRING", true)
      case LongType | IntegerType        => ("LONG", false)
      case TimestampType                 => ("LONG", false) // __time: epoch millis
      case DoubleType                    => ("DOUBLE", false)
      case FloatType                     => ("FLOAT", false)
      case BinaryType                    => ("COMPLEX", false)
      case other                         => (other.sql, false)
    }
    def str(c: Column, dt: DataType): Column = dt match {
      // epoch millis — Druid's time unit (and segment __time precision)
      case TimestampType => unix_millis(c).cast("string")
      case _             => c.cast("string")
    }
    val fields = colsIn.map(n => base.schema(n))
    val aggCols = fields.flatMap { f =>
      val (_, multi) = druidType(f.dataType)
      val card =
        if (!analyses("cardinality")) Nil
        else f.dataType match {
          case StringType =>
            Seq(countDistinct(col(f.name)).as(s"__card_${f.name}"))
          case ArrayType(StringType, _) =>
            // dictionary cardinality of a multi-value dim = distinct VALUES
            Seq(size(array_distinct(flatten(collect_set(col(f.name)))))
              .cast("long").as(s"__card_${f.name}"))
          case _ => Nil
        }
      val minmax =
        if (!analyses("minmax") || multi || f.dataType == BinaryType) Nil
        else Seq(str(min(col(f.name)), f.dataType).as(s"__min_${f.name}"),
                 str(max(col(f.name)), f.dataType).as(s"__max_${f.name}"))
      card ++ minmax
    } :+ count(lit(1)).as("__numRows")
    val one = base.agg(aggCols.head, aggCols.tail: _*)
    val hasCol = one.columns.toSet
    def opt(name: String): Column =
      if (hasCol(name)) col(name) else lit(null)
    val rows = fields.map { f =>
      val (tpe, multi) = druidType(f.dataType)
      struct(lit(f.name).as("column"), lit(tpe).as("type"),
        lit(multi).as("hasMultipleValues"),
        opt(s"__card_${f.name}").cast("long").as("cardinality"),
        opt(s"__min_${f.name}").cast("string").as("minValue"),
        opt(s"__max_${f.name}").cast("string").as("maxValue"),
        col("__numRows").as("numRows"))
    }
    one.select(explode(array(rows: _*)).as("c")).select(col("c.*"))
      .orderBy(col("column"))
  }

  /** maxIngestedEventTime — Druid's dataSourceMetadata query. Over a
    * segment table this answers from interval metadata like
    * timeBoundary (no decode).
    */
  private def dataSourceMetadata(base: DataFrame, q: JsonNode): DataFrame =
    base.agg(max(col("__time")).as("maxIngestedEventTime"))
}
