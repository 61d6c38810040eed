package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the clustering
  * step real dedup pipelines run AFTER pair generation: LSH emits
  * near-dup PAIRS, but removal must act on whole GROUPS (A~B and B~C
  * put A, C in one cluster even when A, C never shared a bucket), and a
  * pair-at-a-time drop either over- or under-removes.
  *
  * Algorithm: hash-min label propagation (the Pregel formulation GraphX
  * uses) — every node starts labeled with its own id and each round
  * takes the min label over itself and its neighbors, converging in
  * O(graph diameter) rounds. Per round the work is one equi-join of the
  * edge list against the 16-byte (node, label) table plus a min
  * aggregate: shuffles carry ids only, never payloads, so a round costs
  * what a groupBy on the edge list costs. Near-dup graphs are unions of
  * LSH-bucket cliques, so diameters stay in the single digits and the
  * round count is effectively constant; if hash-min ever exhausts its
  * round budget (an adversarial graph), the driver falls back to
  * alternating large-star/small-star contraction (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond"), which converges in
  * O(log^2 n) rounds on ANY graph — same contract, same output.
  *
  * Each round ends in `localCheckpoint` — without it the loop's lineage
  * doubles per round and Catalyst re-analyzes an exponentially growing
  * plan (the classic iterative-DataFrame trap).
  *
  * SMALL-GRAPH FAST PATH: the edge list of a near-dup graph is tiny
  * relative to the corpus that produced it (pairs, not documents — a
  * 50k-doc corpus yields ~4k candidate edges), and profiling the
  * distributed loop at that size shows >75% of wall time is per-round
  * job-scheduling convoy, not data. Below a size cutoff
  * (`localEdgeLimit`, default 2M edges ≈ 32 MB collected) the solver
  * therefore collects the edges once and runs driver-side union-find
  * with path compression and union-by-min-id (root of every set IS the
  * component minimum, so no relabeling pass) — identical output,
  * milliseconds instead of seconds. The count that gates the collect
  * is computed on the already-materialized edge list, so the decision
  * costs nothing extra; above the cutoff the distributed rounds run
  * unchanged (billions of edges never touch the driver).
  */
object Components {

  /** Edge-count cutoff below which components solve driver-side. */
  val DefaultLocalEdgeLimit = 2000000L

  /** Driver-side union-find over edge endpoints packed pairwise into a
    * primitive long array (edge i = `packed(2*i)`–`packed(2*i+1)`):
    * path compression + union-by-min-id, so `find(x)` IS the component
    * minimum. Returns one (node, component) row per distinct endpoint.
    * Packed primitives, not Rows or tuples, so the driver really holds
    * 16 bytes/edge — boxed Rows would be ~100+ bytes each and blow the
    * documented memory budget near the edge-count cutoff.
    */
  private def localSolve(packed: Array[Long]): Array[(Long, Long)] = {
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x0: Long): Long = {
      var x = x0
      var p = parent.getOrElse(x, x)
      while (p != x) { // path halving
        val gp = parent.getOrElse(p, p)
        parent(x) = gp
        x = gp
        p = parent.getOrElse(x, x)
      }
      x
    }
    val nodes = scala.collection.mutable.LongMap.empty[Unit]
    var i = 0
    while (i < packed.length) {
      val a = packed(i); val b = packed(i + 1)
      nodes(a) = (); nodes(b) = ()
      val ra = find(a); val rb = find(b)
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      i += 2
    }
    nodes.keys.toArray.map(n => n -> find(n))
  }

  /** Label every node of the undirected graph `edges` (two columns,
    * `src`/`dst`) with its component id = the minimum node id reachable
    * from it. Returns (doc_id, component), one row per distinct node.
    *
    * The per-round convergence check is one driver-side `count` on the
    * changed-label set — O(rounds) actions, each over node-count rows,
    * the standard shape for iterative algorithms on DataFrames.
    */
  def connectedComponents(edges: DataFrame, src: String = "d1",
                          dst: String = "d2", maxIter: Int = 25,
                          localEdgeLimit: Long = DefaultLocalEdgeLimit)
      : DataFrame = {
    // materialize the edge list ONCE: every round joins against it, and
    // without the checkpoint each round would re-run the whole upstream
    // pipeline that produced the edges (e.g. the LSH self-join)
    val debug = sys.env.contains("GRAFT_CC_DEBUG")
    var t0 = System.nanoTime()
    def lap(tag: String): Unit = if (debug) {
      println(f"[cc] $tag ${(System.nanoTime() - t0) / 1e9}%.2fs")
      t0 = System.nanoTime()
    }
    // gate + local path on the UNDIRECTED list: union-find needs each
    // edge once, and gating on the symmetrized list would silently
    // HALVE the effective cutoff (the round-10 sf10 probe caught d18
    // paying the distributed loop's convoy at 1.13M real edges because
    // the doubled count crossed 2M)
    val dedir = edges
      .select(col(src).cast("long").as("u"), col(dst).cast("long").as("v"))
      .localCheckpoint()
    lap("edges-materialized")
    val edgeCount = dedir.count()
    if (debug) println(s"[cc] edgeCount=$edgeCount (limit $localEdgeLimit)")
    if (edgeCount <= localEdgeLimit) {
      // small graph: driver-side union-find (see object scaladoc). The
      // collect ships one primitive long[] per partition (Rows are
      // deserialized streaming inside each task and never reach the
      // driver), so driver footprint truly is localEdgeLimit × 16 B.
      val packed = dedir.rdd.mapPartitions { it =>
        val buf = scala.collection.mutable.ArrayBuilder.make[Long]
        it.foreach { r => buf += r.getLong(0); buf += r.getLong(1) }
        Iterator.single(buf.result())
      }.collect().flatten
      val labeled = localSolve(packed)
      lap(s"local-solve(${packed.length / 2} edges)")
      if (debug) println("[cc] solved driver-side (union-find)")
      val spark = edges.sparkSession
      import spark.implicits._
      return labeled.toSeq.toDF("doc_id", "component")
    }
    // distributed rounds need both directions (min propagates both ways)
    val und0 = dedir
      .union(dedir.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint()
    // size the loop's parallelism to the GRAPH, not the session default:
    // a round is several tiny jobs, and per-task scheduling dominates
    // when the 16-byte edge rows are far fewer than the session's
    // shuffle partitioning assumes (~2M edges/partition keeps partitions
    // comfortably in memory at any scale). Both sides pre-hash on their
    // join keys so the per-round join and group-by reuse the layout.
    val parts = math.max(1, (2 * edgeCount / 2000000L).toInt)
    val und = und0.repartition(parts, col("v")).localCheckpoint()
    var labels = und.select(col("u")).distinct()
      .withColumn("component", col("u"))
      .repartition(parts, col("u"))
      .localCheckpoint()
    lap("init-labels")
    // one-hop min propagation as a plan fragment: min over own and
    // neighbors' labels; preserves any extra columns (prev)
    def hop(lbl: DataFrame): DataFrame = {
      val nbrMin = und
        .join(lbl.select(col("u").as("v"), col("component")), "v")
        .repartition(parts, col("u"))
        .groupBy(col("u")).agg(min(col("component")).as("nbr_min"))
      lbl.join(nbrMin, Seq("u"), "left")
        .withColumn("component",
          least(col("component"), coalesce(col("nbr_min"), col("component"))))
        .drop("nbr_min")
    }
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      // THREE hops per round before the pointer jump. The chain is one
      // plan (no checkpoint between hops): at scale that triples
      // per-round shuffle volume, but rounds — each a fixed-cost convoy
      // of 3 driver actions — drop proportionally (measured 9 -> 4 at
      // sf0.1), and on real near-dup graphs (many small components) the
      // round count is what dominates. Checkpointed BEFORE the
      // self-join below — both join sides read prop, and without
      // materialization the hop chain above would execute twice per
      // round.
      val prop = hop(hop(hop(labels.withColumn("prev", col("component")))))
        .localCheckpoint()
      // pointer jump: adopt the label's OWN label (every label is a node
      // id inside the same component, so this stays in-component and
      // only decreases) — turns O(diameter) rounds into O(log diameter)
      val next = prop.as("a")
        .join(prop.select(col("u").as("lu"), col("component").as("lc")).as("b"),
          col("a.component") === col("lu"), "left")
        .select(col("a.u").as("u"), col("prev"),
          coalesce(col("lc"), col("a.component")).as("component"))
        .localCheckpoint()
      // labels only ever decrease; any strict decrease means not converged
      done = next.filter(col("component") < col("prev"))
        .limit(1).count() == 0L
      labels = next.select(col("u"), col("component"))
      iter += 1
      lap(s"round-$iter")
    }
    if (sys.env.contains("GRAFT_CC_DEBUG"))
      println(s"[cc] converged=$done after $iter rounds")
    if (done) labels.select(col("u").as("doc_id"), col("component"))
    // adversarial-diameter fallback: restart with the star alternation,
    // whose round count is O(log^2 n) regardless of graph shape
    else connectedComponentsStar(edges, src, dst)
  }

  /** Connected components by alternating large-star/small-star edge
    * contraction (Kiveris et al.) — the shape-independent alternative
    * to hash-min propagation. Each round rewires edges toward local
    * minima:
    *
    *  - large-star: every node u computes m = min(N(u) ∪ {u}) over the
    *    symmetrized edge list and reconnects each STRICTLY LARGER
    *    neighbor to m;
    *  - small-star: edges orient high→low, every node reconnects its
    *    non-larger neighbors (and itself) to its minimum neighbor.
    *
    * Both steps preserve connectivity and only ever decrease edge
    * endpoints; the alternation converges — in O(log^2 n) rounds on any
    * graph, independent of diameter — to a forest of stars whose
    * centers are the component minima. Per round the work is two
    * id-only equi-joins + min aggregates (exactly the hash-min shuffle
    * cost), and the convergence check is an exact `except` on the
    * 16-byte edge set, not a probabilistic hash compare.
    *
    * Same contract as [[connectedComponents]]: returns (doc_id,
    * component = min reachable node id), one row per distinct node of
    * `edges`.
    */
  def connectedComponentsStar(edges: DataFrame, src: String = "d1",
                              dst: String = "d2",
                              maxIter: Int = 50): DataFrame = {
    val e0 = edges
      .select(col(src).cast("long").as("u"), col(dst).cast("long").as("v"))
      .localCheckpoint()
    val parts = math.max(1, (e0.count() / 2000000L).toInt)
    // node set pinned from the INPUT (contraction rewires edges, so the
    // final star edges alone don't enumerate every original node)
    val nodes = e0.select(col("u")).union(e0.select(col("v")))
      .distinct().repartition(parts, col("u")).localCheckpoint()

    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
        .filter(col("u") =!= col("v"))
      val m = sym.groupBy(col("u"))
        .agg(least(min(col("v")), col("u")).as("m"))
      sym.join(m, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      val hiLo = e.select(greatest(col("u"), col("v")).as("u"),
          least(col("u"), col("v")).as("v"))
        .filter(col("u") =!= col("v"))
      val m = hiLo.groupBy(col("u")).agg(min(col("v")).as("m"))
      hiLo.join(m, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .union(m.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct()
    }

    var e = e0.filter(col("u") =!= col("v")).distinct()
      .repartition(parts, col("u")).localCheckpoint()
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      val next = smallStar(largeStar(e))
        .repartition(parts, col("u")).localCheckpoint()
      // exact fixed-point test: the edge set stopped changing
      done = next.count() == e.count() &&
        next.except(e).limit(1).count() == 0L
      e = next
      iter += 1
    }
    require(done, s"star contraction did not converge in $maxIter rounds")
    // converged edges are (node -> component-min) stars; roots label
    // themselves, as do nodes isolated by self-loop-only input edges
    nodes.join(e.groupBy(col("u")).agg(min(col("v")).as("c")), Seq("u"), "left")
      .select(col("u").as("doc_id"),
        coalesce(col("c"), col("u")).as("component"))
  }
}
