package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join operators (SURVEY §2.3 J1-J3).
  *
  * The reference uses only left equi-joins on a USING column. We keep
  * Catalyst in charge of strategy (sort-merge vs broadcast vs AQE runtime
  * conversion) but expose an explicit broadcast flag for genuinely-small
  * sides: at 100 TB a dimension join that should broadcast but sort-merges
  * costs a full shuffle of the fact table.
  */
object Joins {

  /** Left equi-join on shared key columns (USING semantics — one copy of
    * the key in the output). `broadcastRight` for small dimension sides.
    */
  def leftUsing(left: DataFrame, right: DataFrame, keys: Seq[String],
                broadcastRight: Boolean = false): DataFrame = {
    val r = if (broadcastRight) broadcast(right) else right
    left.join(r, keys, "left")
  }

  /** J3: star enrichment — chain left joins on one key, then coalesce the
    * listed metric columns to 0 for unmatched rows (reference:
    * gold/processor.py:159-169). All feature sides join on the SAME key, so
    * they share one hash partitioning: Catalyst reuses the exchange instead
    * of re-shuffling the base per join.
    */
  def starEnrich(base: DataFrame, key: String,
                 features: Seq[DataFrame], zeroFillCols: Seq[String]): DataFrame = {
    val joined = features.foldLeft(base)((acc, f) => acc.join(f, Seq(key), "left"))
    zeroFillCols.foldLeft(joined)((acc, c) => acc.withColumn(c, coalesce(col(c), lit(0))))
  }

  /** Semi/anti joins — the serving layer's EXISTS / NOT EXISTS shapes. */
  def semi(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
    left.join(right, keys, "left_semi")
  def anti(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
    left.join(right, keys, "left_anti")

  /** Generic equi-join with arbitrary condition (inner). */
  def inner(left: DataFrame, right: DataFrame, cond: Column): DataFrame =
    left.join(right, cond, "inner")
}
