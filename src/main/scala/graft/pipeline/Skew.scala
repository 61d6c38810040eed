package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffled equi-joins — the manual tool for the
  * cases AQE's runtime skew-split cannot fix (a single hot key that
  * exceeds one executor's memory in a shuffled hash join, or skew known
  * ahead of planning).
  *
  * `saltedJoin` spreads each join key over `factor` synthetic sub-keys:
  * the fact side gets a per-row salt (any per-row value works — the
  * JOIN RESULT is salt-invariant, only the partition layout changes),
  * the dim side is replicated once per salt value, and the join runs on
  * `(key, salt)`. A key holding X rows now occupies `factor` partitions
  * of X/factor rows each, at the cost of `factor`× the dim-side shuffle
  * volume — use for fact-side skew against a mid-size dim that is too
  * big to broadcast but far smaller than the fact.
  *
  * Fact-preserving join types only (`inner`, `left`/`left_outer`):
  * every fact row carries exactly one salt and the dim is fully
  * replicated per salt, so per-row match sets — and therefore result
  * multiplicities — are identical to the unsalted join. Dim-preserving
  * types (right/full/semi-on-dim) would count each dim replica
  * separately and are rejected.
  */
object Skew {

  private val SaltCol = "__graft_salt"

  def saltedJoin(fact: DataFrame, dim: DataFrame,
                 factKey: String, dimKey: String,
                 factor: Int, joinType: String = "inner"): DataFrame = {
    require(factor > 0, s"salt factor must be positive: $factor")
    require(Set("inner", "left", "left_outer").contains(joinType),
      s"saltedJoin preserves fact-side multiplicity; '$joinType' would " +
        "multiply dim-side rows by the salt factor")
    require(!fact.columns.contains(SaltCol) && !dim.columns.contains(SaltCol),
      s"column $SaltCol already present")
    val saltedFact = fact.withColumn(SaltCol,
      pmod(monotonically_increasing_id(), lit(factor.toLong)).cast("int"))
    val saltedDim = dim.withColumn(SaltCol,
      explode(sequence(lit(0), lit(factor - 1))))
    saltedFact.join(saltedDim,
        saltedFact(factKey) === saltedDim(dimKey) &&
          saltedFact(SaltCol) === saltedDim(SaltCol), joinType)
      .drop(saltedFact(SaltCol)).drop(saltedDim(SaltCol))
  }

  /** Hot-key-ONLY salting: measure the fact key histogram first, salt
    * just the keys above `hotThreshold` rows, and join the cold
    * majority completely unsalted — the shape that actually survives
    * 100 TB. Blanket salting replicates the ENTIRE dim side ×factor
    * (the sf10 wave-3 probe measured q28's uniform ×8 salt at 2–5× the
    * plain AQE join precisely because TPC-H keys carry no skew);
    * hot-key salting pays the replication only for the handful of keys
    * that need it, and when the histogram finds NO hot key it degrades
    * to exactly the plain join.
    *
    * Mechanics: one aggregation over the fact's key column finds keys
    * with > hotThreshold rows (driver-collected — hot keys are by
    * definition few; `maxHotKeys` guards the degenerate uniform-ish
    * case and fails loudly rather than broadcasting a huge set). The
    * fact splits on broadcast membership; the hot slice joins salted,
    * the cold slice joins plain, results union. Fact-preserving join
    * types only, same contract as [[saltedJoin]]: every fact row lands
    * in exactly one slice, so multiplicities match the unsalted join.
    */
  def hotKeySaltedJoin(fact: DataFrame, dim: DataFrame,
                       factKey: String, dimKey: String,
                       factor: Int, hotThreshold: Long,
                       joinType: String = "inner",
                       maxHotKeys: Int = 10000): DataFrame = {
    require(factor > 0, s"salt factor must be positive: $factor")
    require(hotThreshold > 0, s"hotThreshold must be positive: $hotThreshold")
    require(Set("inner", "left", "left_outer").contains(joinType),
      s"hotKeySaltedJoin preserves fact-side multiplicity; '$joinType'")
    val hotRows = fact.groupBy(col(factKey))
      .agg(count(lit(1)).as("__graft_n"))
      .filter(col("__graft_n") > hotThreshold)
      .select(col(factKey))
      .limit(maxHotKeys + 1)
      .collect()
    require(hotRows.length <= maxHotKeys,
      s"hotKeySaltedJoin: more than $maxHotKeys keys exceed " +
        s"$hotThreshold rows — the distribution is not 'few hot keys'; " +
        "use saltedJoin (blanket) or repartition instead")
    if (hotRows.isEmpty) return fact.join(dim,
      fact(factKey) === dim(dimKey), joinType)
    val hotSet = hotRows.map(_.get(0)).toSet
    val isHot = col(factKey).isInCollection(hotSet)
    val dimIsHot = col(dimKey).isInCollection(hotSet)
    // null-key fact rows go COLD explicitly: isInCollection(null) is
    // null and a bare negation filter would silently drop them from a
    // left join
    val factCold = fact.filter(!isHot || col(factKey).isNull)
    val dimCold = dim.filter(!dimIsHot)
    val cold = factCold.join(dimCold,
      factCold(factKey) === dimCold(dimKey), joinType)
    val hot = saltedJoin(fact.filter(isHot), dim.filter(dimIsHot),
      factKey, dimKey, factor, joinType)
    cold.unionByName(hot)
  }
}
