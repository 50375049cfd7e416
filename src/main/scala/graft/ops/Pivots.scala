package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pivot operator (SURVEY §2.4 A5; reference: silver/processor.py:624-642).
  *
  * The reference pre-aggregates `(key, status) → count` before pivoting so
  * the pivot works on the shrunken frame, then sanitizes the dynamic column
  * names driver-side. We keep both steps and additionally accept EXPLICIT
  * pivot values: with values given, Spark skips the extra distinct-values
  * job — one less full scan, and a stable output schema (critical at scale
  * and for oracle comparison; dynamic schemas drift with data).
  */
object Pivots {

  /** count-per-value pivot: one row per `key`, one `<prefix><value><suffix>`
    * column per pivot value, missing combinations filled with 0.
    */
  def pivotCount(df: DataFrame, key: String, pivotCol: String,
                 values: Seq[String], prefix: String = "", suffix: String = "_count"): DataFrame = {
    val pre = df.groupBy(col(key), col(pivotCol)).agg(count(lit(1)).alias("__n"))
    val piv = pre.groupBy(col(key)).pivot(pivotCol, values).sum("__n")
    val renamed = values.foldLeft(piv) { (acc, v) =>
      acc.withColumnRenamed(v, prefix + Projections.sanitizeName(v) + suffix)
    }
    renamed.na.fill(0L, values.map(v => prefix + Projections.sanitizeName(v) + suffix))
  }

  /** Dynamic-values variant (runs the distinct job; values sorted for a
    * deterministic column order). Mirrors the reference exactly.
    */
  def pivotCountDynamic(df: DataFrame, key: String, pivotCol: String,
                        prefix: String = "", suffix: String = "_count"): DataFrame = {
    val values = df.select(pivotCol).distinct()
      .collect().map(_.getString(0)).toSeq.sorted
    pivotCount(df, key, pivotCol, values, prefix, suffix)
  }
}
