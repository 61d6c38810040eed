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
  * round count is effectively constant; for adversarial long-chain
  * graphs the known fix is alternating large-star/small-star
  * contraction (Kiveris et al., "Connected Components in MapReduce"),
  * which this API could swap in without changing its contract.
  *
  * Each round ends in `localCheckpoint` — without it the loop's lineage
  * doubles per round and Catalyst re-analyzes an exponentially growing
  * plan (the classic iterative-DataFrame trap).
  */
object Components {

  /** Label every node of the undirected graph `edges` (two columns,
    * `src`/`dst`) with its component id = the minimum node id reachable
    * from it. Returns (doc_id, component), one row per distinct node.
    *
    * The per-round convergence check is one driver-side `count` on the
    * changed-label set — O(rounds) actions, each over node-count rows,
    * the standard shape for iterative algorithms on DataFrames.
    */
  def connectedComponents(edges: DataFrame, src: String = "d1",
                          dst: String = "d2", maxIter: Int = 25): DataFrame = {
    // materialize the edge list ONCE: every round joins against it, and
    // without the checkpoint each round would re-run the whole upstream
    // pipeline that produced the edges (e.g. the LSH self-join)
    val und0 = edges
      .select(col(src).cast("long").as("u"), col(dst).cast("long").as("v"))
      .union(edges
        .select(col(dst).cast("long").as("u"), col(src).cast("long").as("v")))
      .localCheckpoint()
    // size the loop's parallelism to the GRAPH, not the session default:
    // a round is several tiny jobs, and per-task scheduling dominates
    // when the 16-byte edge rows are far fewer than the session's
    // shuffle partitioning assumes (~2M edges/partition keeps partitions
    // comfortably in memory at any scale). Both sides pre-hash on their
    // join keys so the per-round join and group-by reuse the layout.
    val parts = math.max(1, (und0.count() / 2000000L).toInt)
    val und = und0.repartition(parts, col("v")).localCheckpoint()
    var labels = und.select(col("u")).distinct()
      .withColumn("component", col("u"))
      .repartition(parts, col("u"))
      .localCheckpoint()
    var iter = 0
    var done = false
    while (!done && iter < maxIter) {
      val nbrMin = und
        .join(labels.select(col("u").as("v"), col("component")), "v")
        .repartition(parts, col("u"))
        .groupBy(col("u")).agg(min(col("component")).as("nbr_min"))
      // one-hop propagation: min over own and neighbors' labels.
      // Checkpointed BEFORE the self-join below — both join sides read
      // prop, and without materialization the edge join + min aggregate
      // above would execute twice per round.
      val prop = labels.join(nbrMin, Seq("u"), "left")
        .select(col("u"), col("component").as("prev"),
          least(col("component"),
            coalesce(col("nbr_min"), col("component"))).as("component"))
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
    }
    require(done, s"connectedComponents did not converge in $maxIter rounds")
    labels.select(col("u").as("doc_id"), col("component"))
  }
}
