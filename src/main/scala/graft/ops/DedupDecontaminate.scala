package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Benchmark decontamination (exact / n-gram / Bloom / near) — the
  * train-vs-eval hygiene concern of [[Dedup]]. All four layouts share
  * the same scale posture: only the bounded eval side is broadcast, the
  * corpus is scanned and never shuffled.
  */
trait DedupDecontaminate {

  /** Benchmark decontamination: drop training documents whose normalized
    * content equals ANY document of the eval/benchmark set — an anti join
    * on the 64-bit content hash (the eval set is tiny relative to the
    * corpus, so Catalyst broadcasts it; the corpus is never shuffled).
    * The standard pre-training hygiene step for published-benchmark leaks.
    */
  def decontaminateExact(train: DataFrame, evalSet: DataFrame,
                         idCol: String, textCol: String): DataFrame = {
    val key = xxhash64(TextFunctions.normalizeText(col(textCol)))
    val evalKeys = evalSet.select(key.alias("__eval_hash")).distinct()
    train.withColumn("__hash", key)
      .join(broadcast(evalKeys), col("__hash") === col("__eval_hash"), "left_anti")
      .drop("__hash")
  }

  /** N-gram-collision decontamination (the GPT-3 report's discipline):
    * drop every training document that shares ANY word n-gram with the
    * eval set — stricter than whole-document equality
    * ([[decontaminateExact]]) and than a Jaccard threshold
    * ([[decontaminateNear]]): one leaked passage poisons the document.
    * Grams are chained 64-bit hashes ([[TextFunctions
    * .shingleHashesFromTokenHashes]]), so the collision set equals string
    * n-grams up to ~1e-13/pair. Scale shape: only the BOUNDED eval side's
    * gram set is broadcast; the corpus explodes grams into a broadcast
    * semi-probe and is never shuffled — contaminated ids come back as a
    * small anti-join key set.
    */
  def decontaminateNgram(train: DataFrame, evalSet: DataFrame,
                         idCol: String, textCol: String,
                         n: Int = 5): DataFrame = {
    require(n >= 1, "n must be positive")
    // token hashes BOUND before the shingle chain consumes them (the
    // TextFunctions contract — shingleHashes references its argument n+1
    // times and the unbound form re-evaluates tokenize+hash per reference)
    def grams(df: DataFrame) = df
      .select(col(idCol).alias("__gid"),
        TextFunctions.tokenHashes(TextFunctions.tokens(col(textCol))).alias("__th"))
      .select(col("__gid"),
        explode(TextFunctions.shingleHashesFromTokenHashes(col("__th"), n))
          .alias("__gram"))
    val evalGrams = grams(evalSet).select(col("__gram")).distinct()
    val contaminated = grams(train)
      .join(broadcast(evalGrams), Seq("__gram"), "left_semi")
      .select(col("__gid")).distinct()
    train.join(contaminated, col(idCol) === col("__gid"), "left_anti")
  }

  /** Contamination AUDIT report — the complement of the drop-based
    * decontamination ops: instead of silently removing leaked documents,
    * emit WHICH (train, eval) pairs share word n-grams and how many, so
    * a data owner can adjudicate before deleting. Same gram space as
    * [[decontaminateNgram]] (distinct word n-grams per doc); the eval
    * side is bounded and broadcast, the corpus explodes grams once and
    * never shuffles — output is the sparse pair matrix, the per-doc-pair
    * analog of [[TextAnalysis.sourceOverlapMatrix]]'s source-level view.
    */
  def contaminationReport(train: DataFrame, evalSet: DataFrame,
                          idCol: String, textCol: String,
                          n: Int = 5): DataFrame = {
    require(n >= 1, "n must be positive")
    // tokens BOUND to a column before shingles consumes them — shingles'
    // element_at walks its argument per gram element, and the unbound
    // form re-evaluates the whole regex split each time (measured 12.8x
    // on the sf0.1 bench: 11.1 s -> 0.87 s). shingles() is already
    // distinct per doc, so each shared gram contributes exactly one row
    // per (train, eval) pair below.
    def grams(df: DataFrame, id: String) = df
      .select(col(idCol).alias(id),
        TextFunctions.tokens(col(textCol)).alias("__tk"))
      .select(col(id), explode(TextFunctions.shingles(col("__tk"), n)).alias("__gram"))
    grams(train, "train_id")
      .join(broadcast(grams(evalSet, "eval_id")), Seq("__gram"))
      .groupBy(col("train_id"), col("eval_id"))
      .agg(count(lit(1)).alias("shared_grams"))
  }

  /** [[decontaminateExact]] via a broadcast Bloom filter — the layout for
    * when the eval set is too large to broadcast as raw keys but its Bloom
    * filter still fits (~1.2 bytes/key at 1% fpp vs 8+ bytes for the key
    * itself, a ~7× broadcast reduction). The corpus is scanned, never
    * shuffled:
    *   1. Bloom-NEGATIVE rows are definitely clean (no false negatives) —
    *      they pass straight through;
    *   2. Bloom-POSITIVE rows (true leaks + ~fpp false positives) are the
    *      only rows that reach the exact anti join, so the join input is
    *      |leaks| + fpp·|corpus| rows instead of |corpus|.
    * The exact verify makes the output EQUAL to [[decontaminateExact]] —
    * fpp trades join width for bloom size, never correctness. The corpus
    * is referenced twice (clean branch ∪ rescued branch): two scans and
    * zero corpus shuffles beats one scan feeding a full-corpus sort-merge
    * anti join at 100 TB, where scans parallelize and shuffles do not.
    */
  def decontaminateBloom(train: DataFrame, evalSet: DataFrame,
                         idCol: String, textCol: String,
                         fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.GraftBridge
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, ScalarSubquery}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    val key = xxhash64(TextFunctions.normalizeText(col(textCol)))
    val evalKeys = evalSet.select(key.alias("__eval_hash")).distinct()
    // one count job on the SMALL (eval) side to size the filter for fpp
    val nEval = math.max(1L, evalKeys.count())
    val numBits = math.max(64L,
      math.ceil(-nEval * math.log(fpp) / (math.log(2) * math.log(2))).toLong)

    // The filter is built by the native BloomFilterAggregate and consumed
    // by the native (codegen'd) BloomFilterMightContain via a scalar
    // subquery — the exact shape Spark's own InjectRuntimeFilter plants.
    // No Scala UDF: the corpus scan + bloom probe stay inside whole-stage
    // codegen (a closure-based `udf` here would fence off codegen on the
    // 100 TB side of the query — the round-3 verdict's finding).
    val bloomAgg = new BloomFilterAggregate(
      GraftBridge.expression(col("__eval_hash")),
      Literal(nEval), Literal(numBits)).toAggregateExpression()
    val bloomDf = evalKeys.agg(GraftBridge.column(bloomAgg).alias("__bloom"))
    // empty eval set → bloom aggregate yields null → might_contain yields
    // null: coalesce to false so every corpus row passes straight through
    // (identical to decontaminateExact's anti join against nothing)
    val mightContain = coalesce(
      GraftBridge.column(BloomFilterMightContain(
        ScalarSubquery(bloomDf.queryExecution.logical),
        GraftBridge.expression(col("__hash")))),
      lit(false))

    val keyed = train.withColumn("__hash", key).withColumn("__might", mightContain)
    val clean = keyed.filter(!col("__might"))
    // no broadcast hint: the premise is an eval set too big to broadcast —
    // both join inputs are small/prefiltered, so AQE picks the right side
    val rescued = keyed.filter(col("__might"))
      .join(evalKeys, col("__hash") === col("__eval_hash"), "left_anti")
    clean.unionByName(rescued).drop("__hash", "__might")
  }

  /** Near-duplicate decontamination: drop training documents whose
    * token-set Jaccard against ANY eval document reaches `threshold` —
    * eval shingle sets broadcast, candidates prefiltered by the lossless
    * size-ratio bound, survivors verified with the merge-pass exact
    * Jaccard. The eval side is small by construction (benchmarks), so the
    * corpus-side cost is one scan + one broadcast join; no self-join, no
    * LSH needed.
    */
  def decontaminateNear(train: DataFrame, evalSet: DataFrame,
                        idCol: String, textCol: String,
                        threshold: Double = 0.8): DataFrame = {
    import graft.functions.JaccardSortedExpr
    def toks(df: DataFrame, id: String, t: String) = df.select(
      col(idCol).alias(id),
      array_sort(array_distinct(TextFunctions.tokenHashes(
        TextFunctions.tokens(col(textCol))))).alias(t))
    val ev = toks(evalSet, "__eid", "__et").withColumn("__en", size(col("__et")))
    val tr = toks(train, "__tid", "__tt").withColumn("__tn", size(col("__tt")))
    val contaminated = tr.join(broadcast(ev),
        least(col("__tn"), col("__en")).cast("double") /
          greatest(col("__tn"), col("__en")) >= threshold &&
          JaccardSortedExpr(col("__tt"), col("__et")) >= threshold)
      .select(col("__tid")).distinct()
    train.join(contaminated, col(idCol) === col("__tid"), "left_anti")
  }
}
