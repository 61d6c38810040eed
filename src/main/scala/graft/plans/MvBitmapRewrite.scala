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
    // copy it with the merged clause set
    case f @ Filter(cond, sr: DataSourceV2ScanRelation)
        if sr.scan.isInstanceOf[DruidScan] =>
      val scan = sr.scan.asInstanceOf[DruidScan]
      val clauses = extract(cond, sr.output)
      if (clauses.isEmpty) f
      else {
        val next = scan.withMvContains(clauses)
        if (next eq scan) f else f.copy(child = sr.copy(scan = next))
      }
    // pre-pushdown shape (injectOptimizerRule, operator batch): merge
    // the clauses into the relation's graft.mvContains read option —
    // the ScanBuilder picks them up, exactly the native-query path
    case f @ Filter(cond,
        rel: org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation)
        if rel.table.isInstanceOf[graft.sources.druid.DruidTable] =>
      val clauses = extract(cond, rel.output)
      if (clauses.isEmpty) f
      else {
        import scala.jdk.CollectionConverters._
        val cur = graft.sources.druid.MvContains.fromJson(
          rel.options.get("graft.mvContains"))
        // clauses AND together: same-column clauses stay separate
        // (never flattened into one weaker any-of clause); dedup by
        // exact canonical clause
        def canon(c: (String, Seq[String])) = (c._1, c._2.distinct.sorted)
        val have = cur.map(canon).toSet
        val fresh = clauses.map(canon).distinct.filterNot(have)
        val merged = cur ++ fresh
        if (fresh.isEmpty) f
        else {
          val opts = rel.options.asCaseSensitiveMap().asScala.toMap +
            ("graft.mvContains" ->
              graft.sources.druid.MvContains.toJson(merged))
          f.copy(child = rel.copy(options =
            new org.apache.spark.sql.util.CaseInsensitiveStringMap(
              opts.asJava)))
        }
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
