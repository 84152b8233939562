package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for joins on hot keys (SURVEY §4.3: the traversal
  * hop join shuffles on dst, and property graphs have hub vertices —
  * at sf0.1 a nation vid already has ~60k in-edges; at 100 TB a hub
  * key would pin one reducer).
  *
  * Two layers of defense, in order:
  *  1. AQE's skew-join splitting (spark.sql.adaptive.skewJoin.*) —
  *     free, runtime, preferred; Verify/Bench sessions enable it
  *     explicitly.
  *  2. `saltedJoin` below for the cases AQE can't split (broadcast
  *     ineligible + aggregation-after-join pipelines): the build side
  *     is replicated `salt` ways, the probe side scatters uniformly,
  *     so a hot key spreads across `salt` reducers. Deterministic
  *     scatter (hash of the whole probe row) keeps runs reproducible.
  */
object Skew {

  /** Equi-join `left ⋈ right ON key` with the RIGHT side replicated
    * `salt` ways and the LEFT side deterministically scattered.
    * Semantics identical to an inner join on `key`. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salt: Int): DataFrame = {
    require(salt >= 1, "salt must be >= 1")
    val scattered = left.withColumn("__salt",
      pmod(hash(left.columns.map(col): _*), lit(salt)))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    scattered.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase (partial → final) aggregation that pre-splits hot
    * groups: groupBy(key, salt-bucket) first, then re-aggregate by
    * key. Use for algebraic aggregates (sum/count/min/max) when one
    * group dominates; Spark's partial aggregation usually covers
    * this, but a salted pre-split also bounds the FINAL reducer's
    * input for the hot key. */
  def saltedSum(df: DataFrame, key: String, valueCol: String,
                salt: Int, as: String = "sum"): DataFrame =
    // scatter by a hash of the WHOLE row (like saltedJoin): a hot key
    // with constant/low-cardinality values still spreads across salt
    // buckets as long as any other column varies (hashing only the
    // value would leave the canonical hot-key case unsplit)
    df.withColumn("__salt", pmod(hash(df.columns.map(col): _*), lit(salt)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(as))
}
