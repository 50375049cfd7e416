package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function operators (SURVEY §2.5 W1-W2).
  *
  * Determinism: the reference's `row_number` dedup (W1) is only stable
  * because its (group, order) key is unique. Our API takes the FULL order
  * column list and callers must make it total (append a unique tiebreaker
  * key) — otherwise results vary run-to-run under different partitionings.
  *
  * Scale: one hash-exchange on the partition keys + in-partition sort. For
  * latest-per-group over massive groups, prefer [[Windows.latestPerGroupAgg]]
  * (max_by) which map-side combines instead of sorting whole partitions.
  */
object Windows {

  /** W1: keep the first row per group under `order` (reference:
    * silver/processor.py:286-293 — latest bureau_balance month per loan).
    */
  def topOnePerGroup(df: DataFrame, partitionCols: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  /** W1 at scale: same result as [[topOnePerGroup]] via `max_by` — a hash
    * aggregate with partial (map-side) combine, no full sort. `orderKey`
    * must be a totally-ordering struct, e.g.
    * `struct(col("ts"), col("event_id"))`. Returns one struct-exploded row
    * per group with `df`'s columns.
    */
  def latestPerGroupAgg(df: DataFrame, keyCols: Seq[String], orderKey: Column): DataFrame = {
    val payload = struct(df.columns.map(col).toIndexedSeq: _*)
    df.groupBy(keyCols.map(col): _*)
      .agg(max_by(payload, orderKey).alias("__row"))
      .select(df.columns.map(c => col(s"__row.$c").alias(c)).toIndexedSeq: _*)
  }

  /** W2: sequence numbering within a group (reference:
    * silver/processor.py:449-454 — payment_sequence over client timeline).
    */
  def sequenceNumber(df: DataFrame, partitionCols: Seq[String], order: Seq[Column],
                     outCol: String): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(order: _*)
    df.withColumn(outCol, row_number().over(w))
  }

  /** 2-D skyline (Pareto frontier): rows not DOMINATED — no other row
    * has `minimize` ≤ and `maximize` ≥ with at least one strict. The
    * multi-objective "best tradeoffs" operator (cheapest-for-its-size).
    *
    * NOT the quadratic NOT-EXISTS: a row survives iff it holds its
    * minimize-group's max AND strictly beats the running max of every
    * cheaper group — so the only ordered pass runs over the DISTINCT
    * minimize values (per-group max is a plain hash aggregate), and the
    * verdict joins back on the minimize key. Ties on both axes all
    * survive (none dominates another without strictness).
    */
  def skylineMinMax(df: DataFrame, minimize: String, maximize: String): DataFrame = {
    val g = df.groupBy(col(minimize)).agg(max(col(maximize)).alias("__gmax"))
    // one row per distinct minimize value — a rows-frame prefix max is
    // exactly "max over all strictly cheaper groups"
    val w = Window.orderBy(col(minimize)).rowsBetween(Window.unboundedPreceding, -1)
    val gr = g.withColumn("__pmax", max(col("__gmax")).over(w))
    df.join(gr, Seq(minimize))
      .filter(col(maximize) === col("__gmax") &&
        (col("__pmax").isNull || col(maximize) > col("__pmax")))
      .drop("__gmax", "__pmax")
  }
}
