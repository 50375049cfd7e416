package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (builder brief): media as opaque `binary`
  * columns + typed metadata, processed with partition-batched executors.
  *
  * PNG/JPEG decode is REAL ([[decodeImages]], JDK ImageIO — no external
  * codecs needed); [[decodeStub]] remains the clearly-marked deterministic
  * fake for media types the JVM cannot decode (audio/video). Batched
  * iteration via `mapPartitions` (the Scala analogue of `mapInPandas` —
  * one JVM-side batch loop per partition, no per-row UDF overhead) and
  * size-aware repartitioning keep one huge blob from skewing a task.
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

  /** Spread blobs across `ceil(totalBytes / targetPartitionBytes)`
    * partitions by hashing the media id: expected bytes per task ≈ the
    * target, one shuffle, no ordering — large blobs land in different
    * partitions with high probability instead of clustering (the failure
    * mode of range-partitioning on size, which packs all the big blobs
    * together). The workhorse at 100 TB; use [[sizeBalancedExact]] when a
    * hard per-partition byte bound matters more than sort cost.
    */
  def sizeBalanced(df: DataFrame, targetPartitionBytes: Long, totalBytes: Long): DataFrame = {
    val parts = math.max(1, math.ceil(totalBytes.toDouble / targetPartitionBytes).toInt)
    df.repartition(parts, col("media_id"))
  }

  /** Exact byte balancing: bucket on the running byte total (each bucket
    * closes at `targetPartitionBytes`), then range-partition one bucket
    * per task — every partition is bounded by target + one blob.
    * The running sum needs a total order over rows, which Spark evaluates
    * as a single-partition window: pay it when hard bounds matter (e.g.
    * feeding a memory-limited codec), not as the default.
    */
  def sizeBalancedExact(df: DataFrame, targetPartitionBytes: Long, totalBytes: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val parts = math.max(1, math.ceil(totalBytes.toDouble / targetPartitionBytes).toInt)
    val w = Window.orderBy(col("media_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // the single-partition running-sum window sees only (media_id,
    // n_bytes) — ~16 bytes/row — never the content blobs; buckets join
    // back by id before the range partitioning moves the payload
    val buckets = df.select(col("media_id"), col("n_bytes"))
      .withColumn("__bucket",
        floor((sum(col("n_bytes")).over(w) - col("n_bytes")) / targetPartitionBytes))
      .select(col("media_id"), col("__bucket"))
    df.join(buckets, "media_id")
      .repartitionByRange(parts, col("__bucket"), col("media_id"))
      .drop("__bucket")
  }

  /** Fixture adapter: render each document's leading bytes as a tiny RGB
    * image and REALLY encode it as PNG (ImageIO) — the fixtures ship no
    * media blobs, so the blobs are derived deterministically from fixture
    * text, but the bytes flowing downstream are genuine PNG files.
    */
  def pngFromDocuments(docs: DataFrame, side: Int = 8): DataFrame = {
    val outSchema = mediaSchema
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    docs.select(col("doc_id"), encode(col("text"), "UTF-8"))
      .mapPartitions { rows =>
        // one image buffer + encoder reused per partition (batched, like a
        // real codec context)
        val img = new java.awt.image.BufferedImage(side, side,
          java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          var i = 0
          while (i < side * side) {
            def b(k: Int) = if (bytes.isEmpty) 0 else bytes((i * 3 + k) % bytes.length) & 0xff
            img.setRGB(i % side, i / side, (b(0) << 16) | (b(1) << 8) | b(2))
            i += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          val png = bos.toByteArray
          Row(id, png, "image/png", png.length.toLong)
        }
      }(enc)
  }

  /** Decoded-image schema: dimensions + per-band means. */
  val imageFeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("media_type", StringType),
    StructField("n_bytes", LongType),
    StructField("decode_ok", BooleanType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("feature", ArrayType(DoubleType))))

  /** REAL image decode + feature extraction over the binary column: JDK
    * ImageIO (PNG/JPEG/BMP/GIF — present in every JVM, no external
    * codecs). Features are per-band pixel means in [0,1] (padded to 4
    * bands) plus the aspect ratio; large images are sampled on a stride so
    * per-row cost is bounded by ~`maxSamples` pixels regardless of
    * resolution. Rows whose media type is not an image type — or whose bytes
    * fail to decode — fall back to [[decodeStub]]'s hash features with
    * `decode_ok = false` and null dimensions, so one corrupt blob cannot
    * fail a 100 TB batch.
    */
  def decodeImages(media: DataFrame, maxSamples: Int = 4096): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(imageFeatureSchema)
    media.select(col("media_id"), col("content"), col("media_type"), col("n_bytes"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val mediaType = r.getString(2)
          val nBytes = r.getLong(3)
          val img =
            if (bytes != null && mediaType != null && mediaType.startsWith("image/"))
              try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
              catch { case _: Exception => null }
            else null
          if (img == null) {
            Row(id, mediaType, nBytes, false, null, null, null, stubFeatures(bytes).toSeq)
          } else {
            val raster = img.getRaster
            val w = img.getWidth; val h = img.getHeight
            val bands = raster.getNumBands
            val stride = math.max(1, math.ceil(math.sqrt(w.toLong * h / maxSamples.toDouble)).toInt)
            val sums = new Array[Double](bands)
            var n = 0
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                var b = 0
                while (b < bands) { sums(b) += raster.getSampleDouble(x, y, b); b += 1 }
                n += 1
                x += stride
              }
              y += stride
            }
            val feats = new Array[Double](5)
            var b = 0
            while (b < math.min(bands, 4)) { feats(b) = sums(b) / n / 255.0; b += 1 }
            feats(4) = w.toDouble / h
            Row(id, mediaType, nBytes, true, Int.box(w), Int.box(h), Int.box(bands), feats.toSeq)
          }
        }
      }(enc)
  }

  /** The stub's FNV-1a stripe features (shared by [[decodeStub]] and the
    * non-image fallback of [[decodeImages]]).
    */
  private def stubFeatures(bytesOrNull: Array[Byte]): Array[Double] = {
    val bytes = if (bytesOrNull == null) Array.emptyByteArray else bytesOrNull
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
    feats
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
          Row(r.getLong(0), r.getLong(2), stubFeatures(r.getAs[Array[Byte]](1)).toSeq)
        }
      }(enc)
  }
}
