package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation
import org.apache.spark.sql.types.{ArrayType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.druid.DruidScan

/** Plain-SQL multi-value bitmap pushdown: `array_contains(mvdim, 'x')`
  * (and `arrays_overlap(mvdim, array('a','b'))`) over a druid table
  * gets bitmap row selection from the MV column's per-value bitmap
  * section — previously only the native-query path had this
  * (NativeQuery ships the `graft.mvContains` read option), while
  * ordinary Spark SQL over the same table decoded every array.
  *
  * The rule runs post-pushdown (experimental.extraOptimizations, after
  * V2ScanRelationPushDown — array_contains has no V1 Filter form so it
  * always survives as the residual Filter): it collects AND-reachable
  * contains/overlap conjuncts on array&lt;string&gt; attributes of a
  * Filter directly over a druid scan relation and re-plans the scan
  * with the merged clause set. The Filter itself is LEFT IN PLACE as
  * the residual final word, so the hint is a pure row-selection
  * superset whose removal cannot change results — identical contract
  * to the option path (DruidScan.scala's mvContains doc).
  *
  * Idempotent under the fixed-point batch: clauses already present on
  * the scan produce the same plan object, and AQE re-optimization
  * passes through unchanged.
  *
  * At 100 TB this is the difference between touching |matching
  * bitmap| rows and decoding every multi-value array in every
  * segment for tag-filter queries — the dominant filter shape on
  * tag/label columns in event pipelines.
  *
  * Armed automatically on first druid-table resolution
  * (DruidDataSource.getTable) and by GraftExtensions-built sessions;
  * `MvBitmapRewrite.arm(spark)` is the programmatic hook.
  */
object MvBitmapRewrite extends Rule[LogicalPlan] {

  private val injected =
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())

  /** Idempotently append this rule to the session's optimizer. */
  def arm(spark: SparkSession): Unit = injected.synchronized {
    if (injected.add(spark))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    // post-pushdown shape (extraOptimizations / AQE): the scan exists,
    // copy it with the merged clause sets
    case f @ Filter(cond, sr: DataSourceV2ScanRelation)
        if sr.scan.isInstanceOf[DruidScan] =>
      val scan = sr.scan.asInstanceOf[DruidScan]
      val clauses = extract(cond, sr.output)
      val nested = extractNested(cond, sr.output)
      if (clauses.isEmpty && nested.isEmpty) f
      else {
        val next = scan.withMvContains(clauses).withNestedEq(nested)
        if (next eq scan) f else f.copy(child = sr.copy(scan = next))
      }
    // pre-pushdown shape (injectOptimizerRule, operator batch): merge
    // the clauses into the relation's read options — the ScanBuilder
    // picks them up, exactly the native-query path
    case f @ Filter(cond,
        rel: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation)
        if rel.table.isInstanceOf[graft.sources.druid.DruidTable] =>
      val clauses = extract(cond, rel.output)
      val nested = extractNested(cond, rel.output)
      if (clauses.isEmpty && nested.isEmpty) f
      else {
        import scala.jdk.CollectionConverters._
        val curMv = graft.sources.druid.MvContains.fromJson(
          rel.options.get("graft.mvContains"))
        val curNe = graft.sources.druid.NestedEq.fromJson(
          rel.options.get("graft.nestedEq"))
        // clauses AND together: same-column clauses stay separate
        // (never flattened into one weaker any-of clause); dedup by
        // exact canonical clause
        def canonMv(c: (String, Seq[String])) = (c._1, c._2.distinct.sorted)
        def canonNe(c: (String, String, Seq[String])) =
          (c._1, c._2, c._3.distinct.sorted)
        val freshMv = clauses.map(canonMv).distinct
          .filterNot(curMv.map(canonMv).toSet)
        val freshNe = nested.map(canonNe).distinct
          .filterNot(curNe.map(canonNe).toSet)
        if (freshMv.isEmpty && freshNe.isEmpty) f
        else {
          var opts = rel.options.asCaseSensitiveMap().asScala.toMap
          if (freshMv.nonEmpty) opts += ("graft.mvContains" ->
            graft.sources.druid.MvContains.toJson(curMv ++ freshMv))
          if (freshNe.nonEmpty) opts += ("graft.nestedEq" ->
            graft.sources.druid.NestedEq.toJson(curNe ++ freshNe))
          f.copy(child = rel.copy(options =
            new org.apache.spark.sql.util.CaseInsensitiveStringMap(
              opts.asJava)))
        }
      }
  }

  /** AND-reachable nested-field equality clauses:
    * `get_json_object(col, '$.path') = 'v'` (either side) and
    * `get_json_object(col, '$.path') IN (...)` on a NestedCommonFormat
    * column. Served by the per-field value bitmaps; a SUPERSET
    * selection — long 5 and string "5" both render as "5", the
    * residual is the final word. Only simple dot paths (no wildcards,
    * no array steps), matching what the nested writer stores.
    */
  private[graft] def extractNested(cond: Expression, output: Seq[Attribute])
      : Seq[(String, String, Seq[String])] = {
    val nestedAttrs: Map[ExprId, String] = output.collect {
      case a if a.dataType == org.apache.spark.sql.types.StringType &&
          a.metadata.contains("druid.complexType") &&
          a.metadata.getString("druid.complexType") ==
            graft.format.NestedColumn.PartType =>
        a.exprId -> a.name
    }.toMap
    if (nestedAttrs.isEmpty) return Nil
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other     => Seq(other)
    }
    // dot steps plus optional [N] indices (the array-of-objects
    // shredding); eqBitmap declines scalar-array element paths itself
    val simplePath = """^\$(\.[^.\[\]'"*]+(\[(0|[1-9]\d*)\])?)+$""".r
    def stripCast(e: Expression): Expression = e match {
      case c: Cast => stripCast(c.child)
      case x       => x
    }
    def jsonArgs(json: Expression, path: Expression)
        : Option[(String, String)] = (stripCast(json), stripCast(path)) match {
      case (a: AttributeReference, Literal(p: UTF8String, _))
          if nestedAttrs.contains(a.exprId) && p != null &&
            simplePath.matches(p.toString) =>
        Some((nestedAttrs(a.exprId), p.toString))
      case _ => None
    }
    def field(e: Expression): Option[(String, String)] = e match {
      case g: GetJsonObject => jsonArgs(g.json, g.path)
      // the SQL-compat json_value(expr, path): scalar-or-null text —
      // every row it can match also matches the rendered-text probe,
      // so the same superset selection applies
      case u: ScalaUDF if u.udfName.contains("json_value") &&
          u.children.length == 2 =>
        jsonArgs(u.children.head, u.children(1))
      case _ => None
    }
    def lit(e: Expression): Option[String] = e match {
      case Literal(s: UTF8String, org.apache.spark.sql.types.StringType)
          if s != null => Some(s.toString)
      case _ => None
    }
    conjuncts(cond).flatMap {
      case EqualTo(l, r) =>
        field(l).flatMap(f => lit(r).map(v => (f._1, f._2, Seq(v))))
          .orElse(field(r).flatMap(f => lit(l).map(v => (f._1, f._2, Seq(v)))))
      case EqualNullSafe(l, r) =>
        field(l).flatMap(f => lit(r).map(v => (f._1, f._2, Seq(v))))
          .orElse(field(r).flatMap(f => lit(l).map(v => (f._1, f._2, Seq(v)))))
      case In(g, vs) =>
        field(g).flatMap { f =>
          val lits = vs.map(lit)
          if (lits.isEmpty || lits.exists(_.isEmpty)) None
          else Some((f._1, f._2, lits.map(_.get)))
        }
      case _ => None
    }
  }

  /** AND-reachable (column, any-of values) clauses on array<string>
    * attributes of `output`. Only plain attribute + literal shapes —
    * anything else stays Spark-side untouched.
    */
  private[graft] def extract(cond: Expression, output: Seq[Attribute])
      : Seq[(String, Seq[String])] = {
    val mvAttrs: Map[ExprId, String] = output.collect {
      case a if a.dataType.isInstanceOf[ArrayType] &&
          a.dataType.asInstanceOf[ArrayType].elementType == StringType =>
        a.exprId -> a.name
    }.toMap
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other     => Seq(other)
    }
    def strLit(e: Expression): Option[String] = e match {
      case Literal(s: UTF8String, StringType) if s != null => Some(s.toString)
      case _ => None
    }
    // literal array of non-null strings; null elements make the
    // overlap tri-state — skip the clause entirely then
    def strArray(e: Expression): Option[Seq[String]] = e match {
      case Literal(d: org.apache.spark.sql.catalyst.util.ArrayData,
          ArrayType(StringType, _)) if d != null =>
        val vs = (0 until d.numElements()).map { i =>
          if (d.isNullAt(i)) null else d.getUTF8String(i).toString
        }
        if (vs.contains(null) || vs.isEmpty) None else Some(vs)
      case CreateArray(children, _) =>
        val vs = children.map(strLit)
        if (vs.exists(_.isEmpty) || vs.isEmpty) None
        else Some(vs.map(_.get))
      case _ => None
    }
    def attrName(e: Expression): Option[String] = e match {
      case a: AttributeReference => mvAttrs.get(a.exprId)
      case _ => None
    }
    conjuncts(cond).flatMap {
      case ArrayContains(a, v) =>
        for (c <- attrName(a); s <- strLit(v)) yield c -> Seq(s)
      case ArraysOverlap(a, arr) if attrName(a).isDefined =>
        for (c <- attrName(a); vs <- strArray(arr)) yield c -> vs
      case ArraysOverlap(arr, a) if attrName(a).isDefined =>
        for (c <- attrName(a); vs <- strArray(arr)) yield c -> vs
      case _ => None
    }
  }
}
