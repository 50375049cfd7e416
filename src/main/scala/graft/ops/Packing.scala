package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.TextFunctions

/** Training-sequence preparation: chunking documents to a context window
  * and packing them into token-budget bins (the last hop of an LLM data
  * pipeline before tensorization).
  *
  * Scale design: chunking is pure per-row expression work (codegen'd, no
  * shuffle); packing is the one inherently SEQUENTIAL operation in the
  * pipeline — first-fit needs a running total — so it runs greedy
  * per-partition via mapPartitions (each task packs its own slice
  * independently; bins never span partitions, so the result is
  * deterministic for a deterministic partitioning and the only shuffle is
  * the range partition that creates stable slices).
  */
object Packing {

  /** Split each document's token stream into windows of `maxTokens`
    * starting every `stride` tokens (stride < maxTokens → overlapping
    * context windows). Emits one row per chunk with its token count and
    * re-joined text. Everything is array expressions on a bound token
    * column — no UDF, no explode-then-regroup.
    */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
                     maxTokens: Int, stride: Int): DataFrame = {
    require(maxTokens > 0 && stride > 0, "maxTokens and stride must be positive")
    val nChunks = ceil(size(col("__tk")).cast(DoubleType) / stride).cast(IntegerType)
    df.select(col(idCol), TextFunctions.tokens(col(textCol)).alias("__tk"))
      .withColumn("__ix", explode(sequence(lit(0), greatest(nChunks, lit(1)) - 1)))
      .select(
        col(idCol),
        col("__ix").cast(LongType).alias("chunk_ix"),
        slice(col("__tk"), col("__ix") * stride + 1, lit(maxTokens)).alias("__chunk"))
      .select(
        col(idCol),
        col("chunk_ix"),
        size(col("__chunk")).cast(LongType).alias("n_chunk_tokens"),
        concat_ws(" ", col("__chunk")).alias("chunk_text"))
  }

  /** Greedy first-fit packing of documents into token-budget bins.
    * Documents are range-partitioned and sorted by `idCol` (stable
    * slices), then each task folds its slice sequentially: a doc joins
    * the open bin while the running total fits the budget, else opens a
    * new bin. Bin ids are (partition << 32 | local) — globally unique
    * without coordination. A single document larger than the budget gets
    * a bin of its own (never split here; chunk first with
    * [[chunkDocuments]] when splitting is wanted).
    *
    * Returns (id, n_tokens, bin_id). Per-partition first-fit on a sorted
    * stream is within 2× of the partition-local optimum; the waste that
    * matters operationally — bins padded far below budget — is bounded
    * by the final bin of each partition.
    */
  def packSequences(df: DataFrame, idCol: String, textCol: String,
                    budget: Long, partitions: Int = 0): DataFrame = {
    require(budget > 0, "budget must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val sized = df.select(
      col(idCol).cast(LongType).alias("id"),
      size(TextFunctions.tokens(col(textCol))).cast(LongType).alias("n_tokens"))
    val parts =
      if (partitions > 0) sized.repartitionByRange(partitions, col("id"))
      else sized.repartitionByRange(col("id"))
    parts
      .sortWithinPartitions(col("id"))
      .as[(Long, Long)]
      .mapPartitions { rows =>
        val pid = org.apache.spark.TaskContext.getPartitionId().toLong
        var localBin = -1L
        var used = 0L
        var started = false
        rows.map { case (id, n) =>
          if (!started || used + n > budget) { localBin += 1; used = 0L; started = true }
          used += n
          (id, n, (pid << 32) | localBin)
        }
      }
      .toDF("id", "n_tokens", "bin_id")
  }
}
