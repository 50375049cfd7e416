package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset profiling for pipeline data-quality gates: one row per profiled
  * column with null/distinct/min/max statistics, computed in a SINGLE scan
  * (all aggregates in one job, stacked to long form driver-side — the
  * aggregate row is tiny).
  *
  * At 100 TB swap `countDistinct` for `approx_count_distinct` via
  * `exact = false`: exact distinct of a high-cardinality column is a full
  * shuffle per column; the HLL sketch is one pass, mergeable, and ±2%.
  */
object Profiling {

  final case class ColumnProfile(column: String, nullCount: Long, distinctCount: Long,
                                 minValue: String, maxValue: String)

  def profile(df: DataFrame, cols: Seq[String], exact: Boolean = true): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val aggs: Seq[Column] = cols.flatMap { c =>
      val distinct = if (exact) countDistinct(col(c)) else approx_count_distinct(col(c))
      Seq(
        sum(when(col(c).isNull, 1L).otherwise(0L)).alias(s"__null_$c"),
        distinct.alias(s"__distinct_$c"),
        min(col(c)).cast("string").alias(s"__min_$c"),
        max(col(c)).cast("string").alias(s"__max_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    cols.map { c =>
      ColumnProfile(c,
        row.getAs[Long](s"__null_$c"),
        row.getAs[Long](s"__distinct_$c"),
        Option(row.getAs[String](s"__min_$c")).orNull,
        Option(row.getAs[String](s"__max_$c")).orNull)
    }.toDF("column", "null_count", "distinct_count", "min_value", "max_value")
  }
}
