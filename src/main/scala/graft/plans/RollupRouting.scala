package graft.plans

import java.util.concurrent.CopyOnWriteArrayList

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.types.{DoubleType, IntegerType, TimestampType}

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
  *  - the registered base must be a (chain of deterministic) Project(s)
  *    directly over ONE leaf relation — a base containing a Filter,
  *    join, or aggregate is REJECTED at register() time, because the
  *    leaf-fallback match below could otherwise route an unfiltered
  *    query to a rollup built from filtered rows;
  *  - the aggregate's child must be the registered base plan (or a
  *    Filter over it whose condition references registered DIMENSIONS
  *    only — such filters commute with the rollup's grouping);
  *  - every grouping expression is a registered dimension or a
  *    `date_trunc(G, timeCol)` with G equal to or COARSER than the
  *    rollup's granularity (trunc-of-trunc is exact for the
  *    day-aligned family in the session zone);
  *  - every aggregate is sum/min/max over a registered measure
  *    (rewritten to sum/min/max of the rollup's pre-aggregate),
  *    `count(*)`/`count(1)` (rewritten to sum of the rollup's count),
  *    `count(m)` over a measure with a registered per-measure non-null
  *    count column, or `avg(m)` over a measure with BOTH a sum and a
  *    count column (rewritten to sum(sum_col)/sum(cnt_col), the exact
  *    decomposition);
  *  - a cast in the QUERY is never dropped: definition matching strips
  *    casts only on the REGISTERED side, so `CAST(dim AS x)` re-wraps
  *    the remapped rollup attribute via the deterministic-shell
  *    recursion, and every remapped expression must keep the original
  *    expression's dataType or the whole rewrite is abandoned;
  *  - at least one grouping expression exists (a GLOBAL count over an
  *    EMPTY base would answer 0 from base but NULL from an empty
  *    rollup, so global aggregates are never routed).
  *
  * Staleness tripwire: a rollup is a FROZEN pre-aggregate while this
  * engine's druid tables are writable over HTTP (statements-API
  * ingestion, coordinator drops, auto-compaction). register() therefore
  * fingerprints every druid relation inside the base (the segment-dir
  * set — segments are immutable, so any ingest/compact/replace/drop
  * changes it) and tryRewrite re-checks the fingerprint before routing:
  * on mismatch the registration stops routing with ONE loud warning and
  * queries fall back to the raw table — never a silently stale answer.
  * Re-register after refreshing the rollup to resume routing.
  * Non-druid bases (e.g. static parquet) carry no fingerprint: Spark's
  * own file index freezes their file listing per-read.
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
                              countCol: Option[String],
                              counts: Map[String, String],
                              baseRoots: Seq[(String, String)],
                              hlls: Map[String, (String, Int)] = Map.empty)

  private val registry = new CopyOnWriteArrayList[Registered]()
  // keyed by the session OBJECT in a WeakHashMap (the Registration.once
  // pattern): identity hashes are not unique, so a GC'd session's stale
  // int key could collide with a live one and silently skip arming the
  // rule; weak keys also die with the session instead of accumulating
  private val injected = java.util.Collections.newSetFromMap(
    new java.util.WeakHashMap[SparkSession, java.lang.Boolean]())
  // registrations that have already logged their staleness warning
  // (identity set: one loud line per stale registration, not per query)
  private val staleLogged = java.util.Collections.newSetFromMap(
    new java.util.IdentityHashMap[Registered, java.lang.Boolean]())

  /** Strip alias-only wrappers; the registered base must bottom out as
    * deterministic Projects over a single leaf.
    */
  private def validateBaseShape(p: LogicalPlan): Unit = p match {
    case SubqueryAlias(_, c) => validateBaseShape(c)
    case Project(pl, c) =>
      require(pl.forall {
        case _: AttributeReference => true
        case al: Alias             => al.child.deterministic
        case _                     => false
      }, "rollup base Project must be deterministic column references/aliases")
      validateBaseShape(c)
    case leaf if leaf.children.isEmpty => ()
    case other => throw new IllegalArgumentException(
      "rollup base must be a leaf relation or deterministic Projects over " +
        s"one — a ${other.nodeName} (filter/join/aggregate) would make the " +
        "leaf-level match route rows the rollup never saw")
  }

  /** Register `rollupDf` as the exact (dims, granularity) rollup of
    * `baseDf` and arm the rewrite rule on the session. The caller owns
    * the EXACTNESS of the rollup (build it from the base with the same
    * dims/granularity); the rule owns structural applicability — and,
    * for druid-backed bases, the staleness tripwire above.
    */
  def register(spark: SparkSession, baseDf: DataFrame, rollupDf: DataFrame,
               timeCol: String, granularity: String, dims: Seq[String],
               sums: Map[String, String] = Map.empty,
               mins: Map[String, String] = Map.empty,
               maxs: Map[String, String] = Map.empty,
               countCol: Option[String] = None,
               counts: Map[String, String] = Map.empty,
               hlls: Map[String, (String, Int)] = Map.empty): Unit = {
    val g = granularity.toUpperCase(java.util.Locale.ROOT)
    require(coarserOrEqual.contains(g), s"unsupported granularity $g")
    val analyzedBase = baseDf.queryExecution.analyzed
    validateBaseShape(analyzedBase)
    val roots = druidRoots(analyzedBase).map { r =>
      r -> graft.sources.druid.SegmentCatalog.stateFingerprint(r)
    }
    val entry = Registered(analyzedBase,
      rollupDf.queryExecution.analyzed, timeCol, g, dims.toSet,
      sums, mins, maxs, countCol, counts, roots, hlls)
    // idempotent: re-registering the same (base, rollup) shape replaces
    registry.removeIf(r => r.base.sameResult(entry.base) &&
      r.granularity == entry.granularity && r.dims == entry.dims)
    registry.add(entry)
    injected.synchronized {
      if (injected.add(spark))
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ RollupRewrite
    }
  }

  /** Druid table roots referenced anywhere in `p` (for fingerprinting). */
  private def druidRoots(p: LogicalPlan): Seq[String] = p.collect {
    case r: DataSourceV2Relation
        if r.table.isInstanceOf[graft.sources.druid.DruidTable] =>
      r.table.asInstanceOf[graft.sources.druid.DruidTable].rootDir
  }

  /** Test/diagnostic hook: drop every registration. */
  def clear(): Unit = { registry.clear(); staleLogged.clear() }

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

    /** The staleness tripwire: every druid root the base reads must
      * still look exactly as it did at register() time.
      */
    private def fresh(r: Registered): Boolean =
      r.baseRoots.forall { case (root, fp) =>
        val ok =
          graft.sources.druid.SegmentCatalog.stateFingerprint(root) == fp
        if (!ok && staleLogged.add(r)) logWarning(
          s"rollup registration for base '$root' is STALE (the table " +
            "changed since register() — ingest/compaction/drop); routing " +
            "DISABLED for this registration, queries answer from the raw " +
            "table. Re-register after refreshing the rollup to resume.")
        ok
      }

    private def tryRewrite(agg: Aggregate, r: Registered): Option[LogicalPlan] = {
      val (defs, conds, core) = peel(agg.child).getOrElse(return None)
      // the peeled core must be the registered base or its leaf (the
      // base's own conversions, if any, arrive via the inlined defs /
      // the registered base definitions below; register() guarantees
      // the base holds NO row-restricting operator above the leaf, so
      // the leaf-level match cannot widen the row set). For a druid
      // base the early-scan-pushdown batch has already turned the leaf
      // into a DataSourceV2ScanRelation by the time user rules run —
      // match it back to the registered root, but ONLY when the scan
      // is a plain (column-pruned-at-most) projection: a scan carrying
      // a pushed filter/limit/aggregate answers a different row set.
      val baseLeaf = leafOf(r.base)
      val coreMatches = core.sameResult(r.base) ||
        core.sameResult(baseLeaf) || (core match {
          case sr: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
            sr.scan match {
              case ds: graft.sources.druid.DruidScan if ds.isPlainProjection =>
                baseLeaf match {
                  case rel: DataSourceV2Relation
                      if rel.table.isInstanceOf[graft.sources.druid.DruidTable] =>
                    rel.table.asInstanceOf[graft.sources.druid.DruidTable]
                      .rootDir == ds.rootDir
                  case _ => false
                }
              case _ => false
            }
          case _ => false
        })
      if (!coreMatches) return None

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

      // casts are stripped ONLY on the registered-definition side (a
      // base conversion projection may wrap the leaf column in a Cast,
      // and a query written against the pre-conversion leaf value may
      // reference it bare); the QUERY side is never stripped — a
      // user's cast either matches the def exactly (it IS the base's
      // own conversion, inlined) or re-wraps the remapped rollup
      // attribute via the deterministic-shell recursion in remapAny,
      // with the dataType guard below rejecting any type change
      def matchesDef(e: Expression, name: String): Boolean =
        defOf(name).exists(d =>
          sameByName(e, d) || sameByName(e, stripCast(d)))

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
          // count(m): non-null count of a measure, answered from the
          // rollup's per-measure non-null-count column
          case c: Count if c.children.sizeIs == 1 =>
            r.counts.collectFirst {
              case (m, rc) if matchesDef(c.children.head, m) => rc
            }.flatMap(rollupAttr.get).map(cc => Sum(cc))
          // hll_sketch_agg(m, lgK) → hll_union_agg(sketch_col): the
          // union's register state is the max-merge of the same
          // hashed values, so the routed estimate equals any
          // MULTI-PARTITION raw aggregation's bit-for-bit. (Spark's
          // own hll_sketch_agg is already partitioning-dependent — a
          // single-partition plan keeps the sketch's HIP estimator
          // while every merged plan answers from the composite
          // estimator; routing always lands on the merged value, the
          // one a distributed scan produces. Registering a sketch
          // column is the caller's opt-in to those merge semantics,
          // exactly a Druid rollup's HLL metric contract.) The
          // query's lgK literal must EQUAL the registered sketch's —
          // a union across configs would silently downsample.
          case h: HllSketchAgg => h.children match {
            case Seq(child, Literal(lgk: Int, IntegerType)) =>
              r.hlls.collectFirst {
                case (m, (rc, lgkReg))
                    if lgkReg == lgk && matchesDef(child, m) => rc
              }.flatMap(rollupAttr.get)
                .map(ra => HllUnionAgg(ra, Literal(false)))
            case _ => None
          }
          case _ => None
        }

      def aggExpr(fn: AggregateFunction): AggregateExpression =
        AggregateExpression(fn, Complete, isDistinct = false)

      def rollupTime: Option[Expression] = rollupAttr.get(r.timeCol).map { rt =>
        if (rt.dataType == TimestampType) rt
        else Cast(rt, TimestampType,
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
          ae.aggregateFunction match {
            // avg(m) = sum(sum_col)/sum(cnt_col): exact decomposition,
            // needs BOTH registered. LEGACY divide (null on 0/0 —
            // an all-null measure bucket — exactly Avg's semantics);
            // Avg's result type is Double for every non-decimal input,
            // and the decimal case fails the dataType guard below.
            case a: Average =>
              val sumCol = r.sums.collectFirst {
                case (m, rc) if matchesDef(a.child, m) => rc
              }.flatMap(rollupAttr.get)
              val cntCol = r.counts.collectFirst {
                case (m, rc) if matchesDef(a.child, m) => rc
              }.flatMap(rollupAttr.get)
              for (sc <- sumCol; cc <- cntCol) yield Divide(
                Cast(aggExpr(Sum(sc)), DoubleType),
                Cast(aggExpr(Sum(cc)), DoubleType),
                EvalMode.LEGACY)
            case fn =>
              remapAggFn(fn).map(fn2 => ae.copy(aggregateFunction = fn2))
          }
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

      // the final type guard of the untouched-or-exact contract: a
      // remap that changes an expression's result type (a dim stored
      // at a different type in the rollup, a decimal sum-of-sums
      // widening, ...) abandons the rewrite instead of shipping it
      def remapSameType(e: Expression): Option[Expression] =
        remapAny(e).filter(_.dataType == e.dataType)

      def remapNamed(ne: NamedExpression): Option[NamedExpression] = ne match {
        case al @ Alias(other, name) =>
          remapSameType(inline(other, defs))
            .map(e2 => Alias(e2, name)(exprId = al.exprId))
        case a: AttributeReference =>
          remapSameType(inline(a, defs))
            .map(e2 => Alias(e2, a.name)(exprId = a.exprId))
        case _ => None
      }

      val groups2 = agg.groupingExpressions
        .map(g => remapSameType(inline(g, defs)))
      val aggs2 = agg.aggregateExpressions.map(remapNamed)
      val conds2 = conds.map { c =>
        val in = inline(c, defs)
        // aggregates can never appear under a Filter
        if (in.exists(_.isInstanceOf[AggregateExpression])) None
        else remapSameType(in)
      }
      if (groups2.forall(_.isDefined) && aggs2.forall(_.isDefined) &&
          conds2.forall(_.isDefined) && fresh(r)) {
        val source = conds2.map(_.get) match {
          case Nil => rollupPlan
          case cs  => Filter(cs.reduce(And), rollupPlan)
        }
        Some(Aggregate(groups2.map(_.get), aggs2.map(_.get), source, None))
      } else None
    }
  }
}
