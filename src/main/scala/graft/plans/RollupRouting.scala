package graft.plans

import java.util.concurrent.CopyOnWriteArrayList

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Materialized-rollup ROUTING — the engine's first whole-plan Catalyst
  * rewrite: aggregates over a registered BASE table silently answer
  * from its pre-aggregated rollup when (and only when) the rewrite is
  * semantically exact, the way an OLAP engine's materialized-view
  * selection works. Druid itself gets this effect by making users
  * query the rolled-up datasource; here the USER'S query stays on the
  * base table and Catalyst swaps the relation — at 100 TB that is the
  * difference between scanning the raw event log and scanning a table
  * ~granularity-cardinality smaller.
  *
  * Soundness contract (enforced structurally, conservatively — any
  * non-matching shape leaves the plan untouched):
  *  - the aggregate's child must be the registered base plan (or a
  *    Filter over it whose condition references registered DIMENSIONS
  *    only — such filters commute with the rollup's grouping);
  *  - every grouping expression is a registered dimension or a
  *    `date_trunc(G, timeCol)` with G equal to or COARSER than the
  *    rollup's granularity (trunc-of-trunc is exact for the
  *    day-aligned family in the session zone);
  *  - every aggregate is sum/min/max over a registered measure
  *    (rewritten to sum/min/max of the rollup's pre-aggregate) or
  *    `count(*)`/`count(1)` (rewritten to sum of the rollup's count);
  *  - at least one grouping expression exists (a GLOBAL count over an
  *    EMPTY base would answer 0 from base but NULL from an empty
  *    rollup, so global aggregates are never routed).
  *
  * Output attribute ids are preserved (each rewritten projection
  * re-aliases under the original exprId), so parent operators resolve
  * unchanged.
  */
object RollupRouting {

  /** Granularities answerable from a rollup at `gran` (session zone;
    * all members are aligned unions of the finer buckets).
    */
  private val coarserOrEqual: Map[String, Set[String]] = Map(
    "HOUR" -> Set("HOUR", "DAY", "WEEK", "MONTH", "QUARTER", "YEAR"),
    "DAY" -> Set("DAY", "WEEK", "MONTH", "QUARTER", "YEAR"),
    "MONTH" -> Set("MONTH", "QUARTER", "YEAR"),
    "YEAR" -> Set("YEAR"))

  final case class Registered(base: LogicalPlan, rollup: LogicalPlan,
                              timeCol: String, granularity: String,
                              dims: Set[String],
                              sums: Map[String, String],
                              mins: Map[String, String],
                              maxs: Map[String, String],
                              countCol: Option[String])

  private val registry = new CopyOnWriteArrayList[Registered]()
  private val injected =
    java.util.Collections.synchronizedSet(new java.util.HashSet[Int]())

  /** Register `rollupDf` as the exact (dims, granularity) rollup of
    * `baseDf` and arm the rewrite rule on the session. The caller owns
    * the EXACTNESS of the rollup (build it from the base with the same
    * dims/granularity); the rule owns structural applicability.
    */
  def register(spark: SparkSession, baseDf: DataFrame, rollupDf: DataFrame,
               timeCol: String, granularity: String, dims: Seq[String],
               sums: Map[String, String] = Map.empty,
               mins: Map[String, String] = Map.empty,
               maxs: Map[String, String] = Map.empty,
               countCol: Option[String] = None): Unit = {
    val g = granularity.toUpperCase(java.util.Locale.ROOT)
    require(coarserOrEqual.contains(g), s"unsupported granularity $g")
    val entry = Registered(baseDf.queryExecution.analyzed,
      rollupDf.queryExecution.analyzed, timeCol, g, dims.toSet,
      sums, mins, maxs, countCol)
    // idempotent: re-registering the same (base, rollup) shape replaces
    registry.removeIf(r => r.base.sameResult(entry.base) &&
      r.granularity == entry.granularity && r.dims == entry.dims)
    registry.add(entry)
    val key = System.identityHashCode(spark)
    if (injected.add(key))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RollupRewrite
  }

  /** Test/diagnostic hook: drop every registration. */
  def clear(): Unit = registry.clear()

  object RollupRewrite extends Rule[LogicalPlan] {
    override def apply(plan: LogicalPlan): LogicalPlan =
      if (registry.isEmpty) plan
      else plan.transformDown {
        case agg @ Aggregate(groups, _, _, _) if groups.nonEmpty =>
          val it = registry.iterator()
          var out: LogicalPlan = agg
          var done = false
          while (it.hasNext && !done) tryRewrite(agg, it.next()) match {
            case Some(p) => out = p; done = true
            case None    =>
          }
          out
      }

    /** Structural expression equality with attribute identity reduced
      * to NAME (the two sides come from different plans, so exprIds
      * never line up; names are the contract the registration is
      * keyed on).
      */
    private def sameByName(a: Expression, b: Expression): Boolean = {
      def norm(e: Expression): Expression = e.transformUp {
        case attr: AttributeReference =>
          Literal(org.apache.spark.unsafe.types.UTF8String
            .fromString("attr:" + attr.name),
            org.apache.spark.sql.types.StringType)
      }
      norm(a).canonicalized == norm(b).canonicalized
    }

    private def stripCast(e: Expression): Expression = e match {
      case c: Cast => stripCast(c.child)
      case x       => x
    }

    private def leafOf(p: LogicalPlan): LogicalPlan =
      p.collectLeaves() match { case Seq(l) => l; case _ => p }

    /** Peel Projects and Filters off a plan, recording every alias
      * definition (the optimizer pulls grouping expressions and column
      * conversions into such Projects) and collecting filter
      * conditions. Fails (None) on any non-deterministic alias — an
      * inlined copy of one would change semantics.
      */
    private def peel(p: LogicalPlan)
        : Option[(Map[ExprId, Expression], List[Expression], LogicalPlan)] =
      p match {
        case Project(pl, c) if pl.forall {
              case _: AttributeReference => true
              case al: Alias             => al.child.deterministic
              case _                     => false
            } =>
          peel(c).map { case (defs, conds, core) =>
            val mine = pl.collect { case al: Alias => al.exprId -> al.child }
            (defs ++ mine, conds, core)
          }
        case Filter(cond, c) =>
          peel(c).map { case (defs, conds, core) =>
            (defs, cond :: conds, core)
          }
        case other => Some((Map.empty[ExprId, Expression], Nil, other))
      }

    /** Inline `defs` into `e` to fixpoint: the result references only
      * attributes of the plan BELOW the peeled projections.
      */
    private def inline(e: Expression, defs: Map[ExprId, Expression]): Expression = {
      var cur = e
      var rounds = 0
      var changed = true
      while (changed && rounds < 20) {
        val nxt = cur.transformUp {
          case a: AttributeReference if defs.contains(a.exprId) => defs(a.exprId)
        }
        changed = !nxt.fastEquals(cur)
        cur = nxt
        rounds += 1
      }
      cur
    }

    private def tryRewrite(agg: Aggregate, r: Registered): Option[LogicalPlan] = {
      val (defs, conds, core) = peel(agg.child).getOrElse(return None)
      // the peeled core must be the registered base or its leaf (the
      // base's own conversions, if any, arrive via the inlined defs /
      // the registered base definitions below)
      val baseLeaf = leafOf(r.base)
      if (!core.sameResult(r.base) && !core.sameResult(baseLeaf)) return None

      // base column DEFINITIONS in terms of the leaf: a passthrough
      // column defines itself; a converted column (e.g. ts rebuilt
      // from raw nanos) defines its conversion expression
      val baseDefs: Map[String, Expression] = r.base match {
        case Project(pl, _) => pl.map {
          case a: AttributeReference => a.name -> (a: Expression)
          case al: Alias             => al.name -> al.child
        }.toMap
        case _ => r.base.output.map(a => a.name -> (a: Expression)).toMap
      }
      // FRESH attribute ids per rewrite: two routed aggregates in one
      // query tree (e.g. a union or self-join of aggregates over the
      // base) must not share the rollup relation's exprIds — duplicate
      // ids across branches are the classic self-join ambiguity
      val rollupPlan: LogicalPlan = r.rollup.transformUp {
        case m: org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation =>
          m.newInstance().asInstanceOf[LogicalPlan]
      }
      val rollupAttr: Map[String, Attribute] =
        rollupPlan.output.map(a => a.name -> a).toMap
      def defOf(name: String): Option[Expression] = baseDefs.get(name)

      def matchesDef(e: Expression, name: String): Boolean =
        defOf(name).exists(d => sameByName(stripCast(e), stripCast(d)))

      def remapAggFn(fn: AggregateFunction): Option[AggregateFunction] =
        fn match {
          case s: Sum =>
            r.sums.collectFirst {
              case (m, rc) if matchesDef(s.child, m) => rc
            }.flatMap(rollupAttr.get)
              .map(ra => s.withNewChildren(Seq(ra)).asInstanceOf[Sum])
          case m: Min =>
            r.mins.collectFirst {
              case (mm, rc) if matchesDef(m.child, mm) => rc
            }.flatMap(rollupAttr.get).map(ra => Min(ra))
          case m: Max =>
            r.maxs.collectFirst {
              case (mm, rc) if matchesDef(m.child, mm) => rc
            }.flatMap(rollupAttr.get).map(ra => Max(ra))
          case c: Count if c.children.forall(_.foldable) =>
            r.countCol.flatMap(rollupAttr.get).map(cc => Sum(cc))
          case _ => None
        }

      def rollupTime: Option[Expression] = rollupAttr.get(r.timeCol).map { rt =>
        if (rt.dataType == org.apache.spark.sql.types.TimestampType) rt
        else Cast(rt, org.apache.spark.sql.types.TimestampType,
          Some(java.util.TimeZone.getDefault.getID))
      }

      // remap ANY (inlined) expression onto the rollup: aggregates via
      // remapAggFn, dims by definition match, time ONLY inside a
      // coarser-or-equal date_trunc, deterministic scalar shells pass
      // through. A bare time or measure reference finds no rule and
      // fails the whole rewrite — exactly the conservative behavior.
      def remapAny(e: Expression): Option[Expression] = e match {
        case ae: AggregateExpression
            if ae.mode == Complete && !ae.isDistinct && ae.filter.isEmpty =>
          remapAggFn(ae.aggregateFunction)
            .map(fn2 => ae.copy(aggregateFunction = fn2))
        case t: TruncTimestamp => t.format match {
          case Literal(fmt, _)
              if coarserOrEqual(r.granularity).contains(
                String.valueOf(fmt).toUpperCase(java.util.Locale.ROOT)) &&
                matchesDef(t.timestamp, r.timeCol) =>
            rollupTime.map(rt => t.withNewChildren(Seq(t.format, rt)))
          case _ => None
        }
        case _ if r.dims.exists(d => matchesDef(e, d)) =>
          r.dims.collectFirst { case d if matchesDef(e, d) => d }
            .flatMap(rollupAttr.get)
        case l: Literal => Some(l)
        case _ if e.children.nonEmpty && e.deterministic =>
          val kids = e.children.map(remapAny)
          if (kids.forall(_.isDefined))
            Some(e.withNewChildren(kids.map(_.get)))
          else None
        case _ => None
      }

      def remapNamed(ne: NamedExpression): Option[NamedExpression] = ne match {
        case al @ Alias(other, name) =>
          remapAny(inline(other, defs))
            .map(e2 => Alias(e2, name)(exprId = al.exprId))
        case a: AttributeReference =>
          remapAny(inline(a, defs))
            .map(e2 => Alias(e2, a.name)(exprId = a.exprId))
        case _ => None
      }

      val groups2 = agg.groupingExpressions
        .map(g => remapAny(inline(g, defs)))
      val aggs2 = agg.aggregateExpressions.map(remapNamed)
      val conds2 = conds.map { c =>
        val in = inline(c, defs)
        // aggregates can never appear under a Filter
        if (in.exists(_.isInstanceOf[AggregateExpression])) None
        else remapAny(in)
      }
      if (groups2.forall(_.isDefined) && aggs2.forall(_.isDefined) &&
          conds2.forall(_.isDefined)) {
        val source = conds2.map(_.get) match {
          case Nil => rollupPlan
          case cs  => Filter(cs.reduce(And), rollupPlan)
        }
        Some(Aggregate(groups2.map(_.get), aggs2.map(_.get), source, None))
      } else None
    }
  }
}
