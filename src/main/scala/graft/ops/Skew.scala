package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys (builder brief: "salting for skew").
  *
  * AQE's OptimizeSkewedJoin splits oversized sort-merge partitions at
  * runtime, which handles most cases; explicit salting remains the tool
  * when one key dominates so heavily that even a split partition is one
  * key's rows (AQE can't split a single key's hash bucket across tasks
  * for aggregation, and broadcast is off the table because the other side
  * is big).
  */
object Skew {

  /** Salted inner/left equi-join: the (big, skewed) left side gets a
    * deterministic salt derived from a high-cardinality column; the right
    * side is replicated once per salt. One key's rows now spread over
    * `nSalts` reducers. Semantically identical to `left.join(right, key,
    * joinType)` for equi-joins.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltBy: Column, nSalts: Int, joinType: String = "inner"): DataFrame = {
    val saltedLeft = left.withColumn("__salt", pmod(xxhash64(saltBy), lit(nSalts)))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0L), lit(nSalts - 1L))))
    saltedLeft.join(saltedRight, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Salted aggregation: two-phase groupBy for a skewed grouping key —
    * partial aggregate on (key, salt), then final on key. Use for
    * aggregates that compose (sum/count/min/max); Spark's own partial
    * aggregation usually makes this unnecessary, but it is the pattern
    * for non-composing custom aggregators.
    */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
                     saltBy: Column, nSalts: Int): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(saltBy), lit(nSalts)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).alias("__psum"), count(lit(1)).alias("__pcnt"))
      .groupBy(col(key))
      .agg(sum(col("__psum")).alias(s"sum_$valueCol"),
        sum(col("__pcnt")).alias("row_count"))
}
