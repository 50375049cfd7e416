package graft.ops

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.ops.Checkpoints._

/** Byte-pair-encoding tokenizer: REAL pair-merge training (Sennrich et
  * al. 2016) and a stateless per-row encoder, replacing the ceil(len/4)
  * subword heuristic ([[TextAnalysis.subwordCounts]]) for the ops that
  * need true token budgets.
  *
  * Training ([[fit]]) is the classic iterative loop with a FIXED merge
  * count: each round is ONE `groupBy` over adjacent-pair counts on the
  * distinct-word vocabulary (corpus-text size never re-enters after the
  * initial word count), the argmax pair is collected to the driver (one
  * row per round — bounded by construction, the dsirModel discipline),
  * and the vocabulary is rewritten by a per-row greedy merge fold.
  * Determinism: ties on pair count break on (lhs, rhs) binary string
  * order — identical in Spark and DuckDB (both compare UTF-8 bytes
  * under default collation).
  *
  * Encoding ([[encode]]) applies the merge table IN RANK ORDER, each
  * merge greedily left-to-right to fixpoint, as one chain of array-fold
  * expressions — no shuffle, no state, stream-safe. This is equivalent
  * to the usual lowest-rank-first loop because a merge can never enable
  * an EARLIER merge: merge k's output symbol did not exist when merge
  * j < k was learned, so it cannot be a component of merge j, and
  * merging never makes two previously non-adjacent old symbols
  * adjacent. One left-to-right pass per merge is likewise a fixpoint:
  * when element v is appended after u without merging, (u, v) is not
  * the pair, and u never changes afterwards (the fold only rewrites
  * the LAST accumulator element).
  *
  * At 100 TB: fit cost is one corpus scan (word counts) + N tiny
  * vocabulary rounds; encode is embarrassingly parallel and should run
  * dictionary-style (distinct tokens → encode → broadcast join back,
  * [[encodeDict]]) so each distinct word pays the fold once per batch
  * instead of once per occurrence.
  */
object Bpe {

  /** One learned merge; `pairCount` is the corpus-weighted adjacent-pair
    * frequency at the round it won. The collected model artifact.
    */
  final case class Merge(rank: Long, lhs: String, rhs: String, pairCount: Long) {
    def merged: String = lhs + rhs
  }

  /** End-of-word marker appended as a symbol of its own (the Sennrich
    * convention): lets merges distinguish word-final from word-internal
    * contexts without leaking across word boundaries.
    */
  val EndOfWord = "</w>"

  /** Initial symbol sequence of a word: one symbol per character plus
    * the [[EndOfWord]] marker.
    */
  def initSyms(word: Column): Column =
    // empty-word guard: Spark sequence(1, 0) DESCENDS ([1, 0]); an
    // all-whitespace text tokenizes to [""] and must map to [marker]
    when(length(word) === 0, array(lit(EndOfWord)))
      .otherwise(concat(
        transform(sequence(lit(1), length(word)), i => word.substr(i, lit(1))),
        array(lit(EndOfWord))))

  /** One-pass greedy left-to-right merge of the pair (l, r) over a
    * symbol array (fixpoint — see object doc): fold elements into an
    * accumulator array, replacing the last element with l+r whenever
    * (last, next) == (l, r).
    */
  def applyMerge(syms: Column, l: String, r: String): Column =
    // No short-array guard needed: a 1-symbol array folds over an empty
    // tail and returns its init (the array itself); initSyms never emits
    // an empty array. Keeping references to `syms` at 3 matters: nested
    // [[encode]] trees grow 3^N in the merge count, so prefer
    // [[encodeDict]]'s column-bound chain beyond a handful of merges.
    aggregate(
      slice(syms, lit(2), size(syms) - 1),
      slice(syms, lit(1), lit(1)),
      (acc, x) =>
        when(element_at(acc, -1) === lit(l) && x === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
          .otherwise(concat(acc, array(x))))

  /** Adjacent symbol pairs of a symbol array as (l, r) structs; empty
    * for single-symbol words. Guarded: Spark `sequence(1, 0)` would
    * DESCEND ([1, 0]), so the short case never reaches it.
    */
  private def adjacentPairs(syms: Column): Column =
    when(size(syms) >= 2,
      transform(sequence(lit(1), size(syms) - 1),
        i => struct(element_at(syms, i).alias("l"),
          element_at(syms, i + 1).alias("r"))))
      .otherwise(array().cast("array<struct<l:string,r:string>>"))

  /** Distinct-word vocabulary of a corpus column with corpus-weighted
    * counts and initial symbol arrays. ONE shuffle over the token
    * stream; everything after [[fit]]'s round 0 works on this frame.
    */
  def vocab0(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(TextFunctions.tokens(col(textCol))).alias("word"))
      .groupBy("word").agg(count(lit(1)).alias("cnt"))
      .withColumn("syms", initSyms(col("word")))

  /** Train `numMerges` BPE merges over the corpus. Returns the merge
    * table (driver-side model artifact, `numMerges` rows — bounded by
    * construction). Stops early if the vocabulary runs out of pairs.
    */
  def fit(df: DataFrame, textCol: String, numMerges: Int): Seq[Merge] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    // eager checkpoint: the corpus-wide token shuffle runs ONCE; merge
    // rounds iterate on the materialized distinct-word frame only.
    // Superseded checkpoints are released EXPLICITLY (not left to the
    // async ContextCleaner, whose GC timing made the CacheHygiene sweep
    // flaky): each new eager checkpoint has fully consumed the previous
    // one by the time it returns, and the returned merge table is
    // driver-side, so the final checkpoint releases too.
    var vocab = vocab0(df, textCol).eagerCut()
    var resident = vocab
    val merges = ArrayBuffer.empty[Merge]
    var dry = false
    for (k <- 1 to numMerges if !dry) {
      val top = vocab
        .select(col("cnt"), explode(adjacentPairs(col("syms"))).alias("p"))
        .groupBy(col("p.l").alias("l"), col("p.r").alias("r"))
        .agg(sum("cnt").alias("c"))
        .orderBy(desc("c"), asc("l"), asc("r"))
        .limit(1).collect()
      if (top.isEmpty) dry = true
      else {
        val row = top.head
        val m = Merge(k.toLong, row.getString(0), row.getString(1), row.getLong(2))
        merges += m
        vocab = vocab.withColumn("syms", applyMerge(col("syms"), m.lhs, m.rhs))
        // bound the withColumn lineage: each applyMerge references its
        // input 3+ times, so periodically cut the chain
        if (k % 4 == 0 && k < numMerges) {
          val next = vocab.eagerCut()
          org.apache.spark.sql.GraftBridge.releaseCheckpoint(resident)
          vocab = next
          resident = next
        }
      }
    }
    org.apache.spark.sql.GraftBridge.releaseCheckpoint(resident)
    merges.toSeq
  }

  /** The merge table as a frame (rank, lhs, rhs, merged, pair_count) —
    * the persistable model artifact and the q-fit query output.
    */
  def fitFrame(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.map(m => (m.rank, m.lhs, m.rhs, m.merged, m.pairCount))
      .toDF("merge_rank", "lhs", "rhs", "merged", "pair_count")
  }

  /** Stateless per-row encoder: symbol array of `word` after applying
    * the merge table in rank order. Pure expression chain — no shuffle,
    * no state; safe on batch frames and unbounded streams alike.
    */
  def encode(word: Column, merges: Seq[Merge]): Column =
    merges.foldLeft(initSyms(word)) { (syms, m) =>
      applyMerge(syms, m.lhs, m.rhs)
    }

  /** Dictionary-encoded corpus application — the 100 TB shape: encode
    * each DISTINCT token once, then broadcast the (small) dictionary
    * back onto occurrences. Returns (word, subwords, n_subwords).
    * NOTE: built column-by-column (withColumn per merge) so each fold
    * stage references the previous stage's ATTRIBUTE, not a re-expanded
    * expression tree (applyMerge uses its input 3×; naive nesting would
    * grow the tree 3^N).
    */
  def encodeDict(words: DataFrame, wordCol: String, merges: Seq[Merge]): DataFrame = {
    var d = words.select(col(wordCol).alias("word")).distinct()
      .withColumn("subwords", initSyms(col("word")))
    for (m <- merges)
      d = d.withColumn("subwords", applyMerge(col("subwords"), m.lhs, m.rhs))
    d.withColumn("n_subwords", size(col("subwords")).cast("long"))
  }

  /** Per-language fertility (subwords per word — the token-budget
    * denominator) on REAL BPE subwords: explode tokens, dictionary-
    * encode the distinct words, broadcast the dictionary back, exact
    * integer sums per language with one double division at the end.
    */
  def fertilityByLang(df: DataFrame, langCol: String, textCol: String,
                      merges: Seq[Merge]): DataFrame = {
    val tokens = df.select(col(langCol).alias("lang"),
      explode(TextFunctions.tokens(col(textCol))).alias("word"))
    val dict = encodeDict(tokens, "word", merges)
      .select(col("word"), col("n_subwords"))
    tokens.join(broadcast(dict), "word")
      .groupBy(col("lang"))
      .agg(count(lit(1)).alias("total_words"),
        sum(col("n_subwords")).alias("total_subwords"),
        round(sum(col("n_subwords")).cast("double") /
          count(lit(1)), 6).alias("fertility"))
  }
}
