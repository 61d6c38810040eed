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
}
