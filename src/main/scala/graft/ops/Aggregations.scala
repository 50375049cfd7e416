package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Aggregation helpers (SURVEY §2.4 A1-A8).
  *
  * Exactness policy: double-typed SUM/AVG results depend on accumulation
  * order, which differs between partitioned Spark execution and any oracle.
  * [[exactSum]]/[[exactAvg]] accumulate in Decimal(30,8) — exact, order-
  * independent — and cast the final value back to double, making results
  * bit-identical across engines and across partition counts. The oracle SQL
  * mirrors the same cast chain. This also means results are stable when the
  * cluster size (and thus partitioning) changes — a reproducibility property
  * worth having at 100 TB, for ~no extra cost (decimal partial aggregation
  * is still map-side combined and codegen'd).
  */
object Aggregations {

  private val Acc = DecimalType(30, 8)

  /** Order-independent double sum (exact decimal accumulation). */
  def exactSum(c: Column): Column = sum(c.cast(Acc)).cast(DoubleType)

  /** Order-independent double average; SQL-standard null-skipping
    * (sum over non-null / count of non-null).
    */
  def exactAvg(c: Column): Column = sum(c.cast(Acc)).cast(DoubleType) / count(c)

  /** A1/A3: conditional count — `sum(when(cond,1).otherwise(0))`
    * (reference: silver/processor.py:336-347,588-602).
    */
  def countIf(cond: Column): Column = sum(when(cond, 1L).otherwise(0L))

  /** DuckDB-side SQL mirror of [[exactSum]].
    *
    * The final decimal→double conversion goes through VARCHAR: once the
    * sum's scaled int128 exceeds 2^53, DuckDB's native cast double-rounds
    * (int128→double, then ×10⁻⁸) and can land one ulp away from Spark's
    * correctly-rounded BigDecimal.doubleValue; string→double parsing is
    * correctly rounded in both engines.
    */
  def exactSumSql(expr: String): String =
    s"CAST(CAST(SUM(CAST(($expr) AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE)"

  /** DuckDB-side SQL mirror of [[exactAvg]]. */
  def exactAvgSql(expr: String): String =
    s"${exactSumSql(expr)} / COUNT($expr)"

  // ---- mergeable aggregate states (incremental view maintenance) --------
  //
  // The lakehouse pattern: a gold aggregate is kept as a mergeable STATE
  // (count, DECIMAL sum, min, max) so a new fact batch updates it by
  // re-aggregating `old state ∪ batch state` — no history rescan. The sum
  // state stays DECIMAL between merges: a double partial would round at
  // every merge boundary and drift off the full-scan answer, while decimal
  // partials merge exactly, so merged-then-finalized equals the one-shot
  // aggregate BIT-FOR-BIT (that equality is q162's oracle).

  import org.apache.spark.sql.DataFrame

  /** Per-group mergeable state over `valCol`: (keys..., n, sum_acc
    * DECIMAL, min_v, max_v). Map-side combined like any hash aggregate.
    */
  def aggState(df: DataFrame, keys: Seq[String], valCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).alias("n"),
        sum(col(valCol).cast(Acc)).alias("sum_acc"),
        min(col(valCol)).alias("min_v"),
        max(col(valCol)).alias("max_v"))

  /** Merge any number of compatible states: counts add, decimal sums add
    * exactly, min/max fold. Associative + commutative — batches can merge
    * in any order, any grouping.
    */
  def mergeAggStates(states: Seq[DataFrame], keys: Seq[String]): DataFrame =
    states.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).alias("n"),
        sum(col("sum_acc")).alias("sum_acc"),
        min(col("min_v")).alias("min_v"),
        max(col("max_v")).alias("max_v"))

  /** Read-time finalization: total/avg as doubles (one correctly-rounded
    * decimal→double cast + one IEEE divide — the exactSum discipline).
    */
  def finalizeAggState(state: DataFrame, keys: Seq[String]): DataFrame =
    state.select(keys.map(col) ++ Seq(
      col("n"),
      col("sum_acc").cast(DoubleType).alias("total"),
      (col("sum_acc").cast(DoubleType) / col("n")).alias("avg_v"),
      col("min_v"), col("max_v")): _*)
}
