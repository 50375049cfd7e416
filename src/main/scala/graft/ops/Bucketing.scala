package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed tables: pre-shuffled storage for co-located joins (builder
  * brief: "bucketing for co-located joins").
  *
  * Two tables bucketed (and sorted) on the same key with the same bucket
  * count join with NO exchange and NO sort — the shuffle is paid once at
  * write time and amortized over every subsequent join. At 100 TB this is
  * the difference between re-shuffling the fact table per query and never
  * shuffling it.
  */
object Bucketing {

  def writeBucketed(df: DataFrame, spark: SparkSession, table: String,
                    path: String, key: String, buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two same-bucketed catalog tables on the bucket key. */
  def coLocatedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                    key: String, joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key), joinType)
}
