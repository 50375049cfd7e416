package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (builder brief): media as opaque `binary`
  * columns + typed metadata, processed with partition-batched executors.
  *
  * The actual byte decoding (image/audio libs) is NOT available in this
  * environment — [[decodeStub]] is a clearly-marked deterministic fake.
  * Everything around it is the real thing: schema, batched iteration via
  * `mapPartitions` (the Scala analogue of `mapInPandas` — one JVM-side
  * batch loop per partition, no per-row UDF overhead), and size-aware
  * repartitioning so one huge blob can't skew a task.
  */
object Multimodal {

  /** Canonical media schema: content + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("content", BinaryType),
    StructField("media_type", StringType),
    StructField("n_bytes", LongType)))

  /** Wrap a text corpus as a binary media table (fixture adapter — the
    * fixtures ship no real blobs).
    */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").alias("media_id"),
      encode(col("text"), "UTF-8").alias("content"),
      lit("application/octet-stream").alias("media_type"),
      length(encode(col("text"), "UTF-8")).cast(LongType).alias("n_bytes"))

  /** Repartition by cumulative byte size so each task sees a bounded
    * payload (range-partition on a size-bucketed key). At 100 TB this is
    * what keeps a partition of 4K-thumbnail rows and a partition of 4K-video
    * rows roughly equal work.
    */
  def sizeBalanced(df: DataFrame, targetPartitionBytes: Long, totalBytes: Long): DataFrame = {
    val parts = math.max(1, (totalBytes / targetPartitionBytes).toInt)
    df.repartitionByRange(parts, col("n_bytes"), col("media_id"))
  }

  /** STUB — deterministic fake "decode + feature extract".
    * ??? real implementation requires image/audio codecs not present in
    * this container. The fake derives an 8-dim feature vector from content
    * bytes (FNV-1a rolling hash per stripe) so the plumbing (batch shape,
    * schema, partitioning) is fully exercised and test-assertable.
    */
  def decodeStub(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("n_bytes", LongType),
      StructField("feature", ArrayType(DoubleType))))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("content"), col("n_bytes"))
      .mapPartitions { rows =>
        // batched loop — one buffer reused per partition, as a real decoder
        // (arrow batch / codec context) would be
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val feats = new Array[Double](8)
          var i = 0
          while (i < 8) {
            var h = 0xcbf29ce484222325L
            var j = i
            while (j < bytes.length) {
              h ^= (bytes(j) & 0xffL); h *= 0x100000001b3L
              j += 8
            }
            feats(i) = (h >>> 11).toDouble / (1L << 53).toDouble
            i += 1
          }
          Row(id, r.getLong(2), feats.toSeq)
        }
      }(enc)
  }
}
