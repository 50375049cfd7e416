package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Feature-engineering operators for ML training pipelines: categorical
  * dictionary encoding, leakage-safe target encoding, and grouped
  * closed-form OLS. All three follow the exactness policy (integer /
  * decimal accumulation, one identical double derivation at the end) so
  * their outputs hash-verify cross-engine.
  */
object Features {

  private val Acc = DecimalType(30, 8)

  /** Dense dictionary encoding of a categorical column: terms get stable
    * ids 1..|vocab| in lexicographic order, and rows join their id. The
    * ordered pass runs over the DISTINCT terms (dictionary-sized, not
    * corpus-sized); the encode join broadcasts the dictionary — at 100 TB
    * the corpus never shuffles for an encode. Lexicographic ids are
    * REPRODUCIBLE across runs and engines, unlike hash or first-seen
    * ordering.
    */
  def dictionaryEncode(df: DataFrame, termCol: String, idCol: String): DataFrame = {
    val dict = df.select(col(termCol)).distinct()
      .withColumn(idCol,
        row_number().over(Window.orderBy(col(termCol))).cast("long"))
    df.join(broadcast(dict), Seq(termCol))
  }

  /** Leave-one-out target encoding: each row's category is encoded as the
    * mean of the TARGET over the OTHER rows of the category —
    * `(Σy − y) / (n − 1)` — the standard leakage control (plain mean
    * encoding lets a row see its own label; LOO is what you train on).
    * Singleton categories get null (no other rows to average).
    *
    * One hash aggregate (decimal Σy + count per category) broadcast back;
    * the per-row subtraction/divide is map-side. Exactness: Σy
    * accumulates in decimal; `(Σy − y)` happens in decimal (exact), and
    * ONE double divide ends the chain.
    */
  def targetEncodeLOO(df: DataFrame, catCol: String, targetCol: String,
                      outCol: String): DataFrame = {
    val agg = df.groupBy(col(catCol))
      .agg(sum(col(targetCol).cast(Acc)).alias("__sy"),
        count(col(targetCol)).alias("__n"))
    df.join(broadcast(agg), Seq(catCol))
      .withColumn(outCol,
        when(col("__n") > 1,
          (col("__sy") - col(targetCol).cast(Acc)).cast(DoubleType) /
            (col("__n") - 1)))
      .drop("__sy", "__n")
  }

  /** Grouped closed-form OLS of y on x: slope = cov/var, intercept =
    * ȳ − slope·x̄, plus R² — derived from exact decimal raw moments
    * (n, Σx, Σx², Σy, Σy², Σxy), the q152 discipline: one map-side-
    * combined aggregate per group, order-independent where a streaming
    * double accumulator is not, and the divide/multiply derivation is the
    * same expression chain in any engine. Degenerate groups (zero x
    * variance) yield nulls, not division blow-ups.
    */
  def groupedOls(df: DataFrame, groupCols: Seq[String], xCol: String,
                 yCol: String): DataFrame = {
    val x = col(xCol); val y = col(yCol)
    val m = df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).alias("n"),
        sum(x.cast(Acc)).alias("__sx"), sum((x * x).cast(Acc)).alias("__sx2"),
        sum(y.cast(Acc)).alias("__sy"), sum((y * y).cast(Acc)).alias("__sy2"),
        sum((x * y).cast(Acc)).alias("__sxy"))
    val n = col("n").cast(DoubleType)
    def D(c: String) = col(c).cast(DoubleType)
    val vx = D("__sx2") / n - (D("__sx") / n) * (D("__sx") / n)
    val vy = D("__sy2") / n - (D("__sy") / n) * (D("__sy") / n)
    val cov = D("__sxy") / n - (D("__sx") / n) * (D("__sy") / n)
    val slope = cov / vx
    m.select(groupCols.map(col) ++ Seq(
      col("n"),
      round(when(vx > 0, slope), 6).alias("slope"),
      round(when(vx > 0, D("__sy") / n - slope * (D("__sx") / n)), 6)
        .alias("intercept"),
      round(when(vx > 0 && vy > 0, (cov * cov) / (vx * vy)), 6).alias("r2")): _*)
  }

  /** Per-group winsorization: clip `valCol` to its group's [lo, hi]
    * exact quantiles — the robust-preprocessing step that tames fat
    * tails without dropping rows (trimming deletes information;
    * winsorizing bounds leverage). Quantile bounds follow the q38/q161
    * parity discipline (exact sort-based percentile, rounded to 6 dp
    * BEFORE the comparison so the clip decision cannot flip on a last
    * ulp); bounds are one mergeable array-percentile aggregate per
    * group, joined back group-sized — the corpus never sorts.
    */
  def winsorize(df: DataFrame, groupCols: Seq[String], valCol: String,
                lo: Double, hi: Double, outCol: String): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo < hi, s"need 0 <= lo < hi <= 1: $lo, $hi")
    val bounds = df.groupBy(groupCols.map(col): _*)
      .agg(
        round(expr(s"percentile(CAST($valCol AS DOUBLE), $lo)"), 6).alias("__lo"),
        round(expr(s"percentile(CAST($valCol AS DOUBLE), $hi)"), 6).alias("__hi"))
    df.join(broadcast(bounds), groupCols)
      .withColumn(outCol,
        least(greatest(col(valCol).cast(DoubleType), col("__lo")), col("__hi")))
      .drop("__lo", "__hi")
  }

  /** Per-group ROBUST standardization: (x − median) / MAD — immune to
    * the outlier masking that inflates [[zscore]]'s σ (a single 10⁶×
    * spike drags the mean/σ but barely moves the median/MAD). Median and
    * MAD are exact sort-based percentiles rounded to 6 dp BEFORE the
    * arithmetic (the q38/q158 parity discipline); the two-stage
    * aggregate (median first, then median absolute deviation) broadcasts
    * group-sized frames and transforms map-side. Zero-MAD groups (over
    * half the values identical) yield null, not a blow-up.
    */
  def robustScale(df: DataFrame, groupCols: Seq[String], valCol: String,
                  outCol: String): DataFrame = {
    val med = df.groupBy(groupCols.map(col): _*)
      .agg(round(expr(s"percentile(CAST($valCol AS DOUBLE), 0.5)"), 6)
        .alias("__med"))
    val withMed = df.join(broadcast(med), groupCols)
      .withColumn("__absdev", abs(col(valCol).cast(DoubleType) - col("__med")))
    val mad = withMed.groupBy(groupCols.map(col): _*)
      .agg(round(expr("percentile(__absdev, 0.5)"), 6).alias("__mad"))
    withMed.join(broadcast(mad), groupCols)
      .withColumn(outCol,
        when(col("__mad") > 0,
          round((col(valCol).cast(DoubleType) - col("__med")) / col("__mad"), 6)))
      .drop("__absdev", "__med", "__mad")
  }

  /** Exact ROC AUC per group — the Mann–Whitney U formulation, computed
    * from tie-aware integer ranks (never a sampled/trapezoid curve):
    * ties take the midrank, and to stay integral the accumulator is
    * 2·avgrank = 2·rank + ties − 1, so
    *
    *   AUC = (Σ_{positives} 2r − np(np+1)) / (2·np·nn)
    *
    * is all-integer until ONE double division (rounded at 6 dp).
    * Single-class groups yield null. The rank window partitions by
    * group — a hot group funnels its sort, which is inherent to exact
    * ranking; pre-aggregate to (group, score) counts first when scores
    * are low-cardinality.
    */
  def rocAuc(df: DataFrame, groupCols: Seq[String], scoreCol: String,
             labelCol: String): DataFrame = {
    import graft.ops.Aggregations.countIf
    // Null labels must not occupy ranks: they'd inflate other rows'
    // midranks while contributing to neither np nor nn.
    val r = df.filter(col(labelCol).isNotNull)
      .withColumn("__rnk", rank().over(
        Window.partitionBy(groupCols.map(col): _*).orderBy(col(scoreCol)))
        .cast("long"))
      .withColumn("__tie", count(lit(1)).over(
        Window.partitionBy((groupCols.map(col) :+ col(scoreCol)): _*)))
    r.groupBy(groupCols.map(col): _*)
      .agg(
        countIf(col(labelCol)).alias("np"),
        countIf(!col(labelCol)).alias("nn"),
        sum(when(col(labelCol), lit(2L) * col("__rnk") + col("__tie") - 1L)
          .otherwise(0L)).alias("__s2"))
      .select((groupCols.map(col) :+ col("np") :+ col("nn") :+
        round(when(col("np") > 0 && col("nn") > 0,
          (col("__s2") - col("np") * (col("np") + 1L)).cast(DoubleType) /
            (lit(2.0) * col("np") * col("nn"))), 6).alias("auc")): _*)
  }

  /** Per-group z-score standardization from exact decimal moments
    * (population σ): z = (x − μ) / σ, null for zero-variance groups.
    * One map-side-combined aggregate to the group frame, broadcast back,
    * map-side transform — the feature-scaling pass of an ML pipeline at
    * corpus scale. The μ/σ derivation is the identical double chain in
    * any engine; z is rounded at 6 dp.
    */
  def zscore(df: DataFrame, groupCols: Seq[String], valCol: String,
             outCol: String): DataFrame = {
    val x = col(valCol)
    val m = df.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).alias("__n"),
        sum(x.cast(Acc)).alias("__sx"), sum((x * x).cast(Acc)).alias("__sx2"))
    val n = col("__n").cast(DoubleType)
    val mu = col("__sx").cast(DoubleType) / n
    val vx = col("__sx2").cast(DoubleType) / n - mu * mu
    val stats = m.select((groupCols.map(col) :+ mu.alias("__mu") :+
      when(vx > 0, sqrt(vx)).alias("__sigma")): _*)
    df.join(broadcast(stats), groupCols)
      .withColumn(outCol,
        round((x.cast(DoubleType) - col("__mu")) / col("__sigma"), 6))
      .drop("__mu", "__sigma")
  }

  /** Token → bucket under the portable-md5 discipline (the dsir/q224
    * rule): first 16 md5 bits mod `buckets` — any engine reproduces the
    * assignment bit-for-bit, unlike JVM hashCode or xxhash.
    */
  def hashBucket(term: Column, buckets: Int): Column =
    conv(substring(md5(term), 1, 4), 16, 10).cast("long") % buckets

  /** Hashing-trick sparse featurization (Weinberger et al. 2009 — the
    * classical-ML counterpart of the embedding tier): per-document
    * SPARSE hashed term counts (doc_id, bucket, cnt), vocabulary-free by
    * construction — the feature space is fixed at `buckets` no matter
    * how many distinct terms 100 TB of text carries, so no dictionary
    * fit, no OOV handling, no shuffle beyond the one count aggregation.
    * Collisions are the accepted trade (two terms sharing a bucket add),
    * exactly as the paper states.
    */
  def hashedFeatures(df: DataFrame, idCol: String, textCol: String,
                     buckets: Int = 64): DataFrame =
    df.select(col(idCol),
      explode(graft.functions.TextFunctions.tokens(col(textCol)))
        .alias("__t"))
      .withColumn("bucket", hashBucket(col("__t"), buckets))
      .groupBy(col(idCol), col("bucket"))
      .agg(count(lit(1)).alias("cnt"))

  /** Text → dense embedding vector, derived (not pre-built): L2-normalized
    * hashed term frequencies — [[hashedFeatures]]' sparse counts densified
    * to a fixed `dim`-wide double vector, v_b = cnt_b / √(Σ cnt²). This is
    * the deterministic, oracle-gatable featurizer that lets the similarity
    * tier (ANN / SemDeDup / k-means) compose from RAW TEXT instead of a
    * pre-built embeddings table: text → vector → assignment end-to-end.
    *
    * Plan shape: ONE corpus scan (explode tokens, map-side bucket hash)
    * into ONE hash aggregate with `dim` conditional sums — all map-side
    * combined, so the shuffle carries dim longs per document, never the
    * token stream. No dictionary fit, no OOV, no second shuffle (the
    * pivot-free densification is why the conditional-sum form beats
    * re-grouping [[hashedFeatures]]' output). Exactness: counts and Σcnt²
    * are exact integers; each component is ONE double divide by a
    * correctly-rounded sqrt, quantized with the 6-dp floor discipline
    * (IEEE-identical cross-engine, the PageRank rule) so downstream
    * cosine argmax decisions cannot drift on a last ulp.
    *
    * Output: (idCol, n_tokens, norm_sq, emb ARRAY<DOUBLE>[dim]). Docs with
    * zero tokens never reach the aggregate (no explode rows) — absent from
    * the output, matching the sparse form's semantics.
    */
  def hashedEmbedding(df: DataFrame, idCol: String, textCol: String,
                      dim: Int = 64): DataFrame = {
    require(dim >= 2 && dim <= 512, s"dim out of range (2..512): $dim")
    def q6(c: Column) =
      floor(c * lit(1.0e6) + lit(0.5)).cast(DoubleType) / lit(1.0e6)
    val counts = (0 until dim).map(b =>
      sum(when(col("__b") === b, 1L).otherwise(0L)).alias(s"__c$b"))
    val aggd = df.select(col(idCol),
        explode(graft.functions.TextFunctions.tokens(col(textCol)))
          .alias("__t"))
      .withColumn("__b", hashBucket(col("__t"), dim))
      .groupBy(col(idCol))
      .agg(counts.head, counts.tail: _*)
    val normSq = (0 until dim).map(b => col(s"__c$b") * col(s"__c$b"))
      .reduce(_ + _)
    val nToks = (0 until dim).map(b => col(s"__c$b")).reduce(_ + _)
    aggd
      .withColumn("norm_sq", normSq)
      .withColumn("n_tokens", nToks)
      .withColumn("emb", array((0 until dim).map(b =>
        when(col("norm_sq") > 0,
          q6(col(s"__c$b").cast(DoubleType) /
            sqrt(col("norm_sq").cast(DoubleType))))
          .otherwise(lit(0.0))): _*))
      .select(col(idCol), col("n_tokens"), col("norm_sq"), col("emb"))
  }

  /** Sparse linear scoring of hashed features against a BROADCAST B-dim
    * integer weight vector (a trained linear model's coefficients): dot
    * product and squared norms accumulate in exact integer arithmetic,
    * cosine is the single final double divide+sqrt — hash-identical on
    * any engine. The weight frame is `buckets` rows (model-sized);
    * the corpus never shuffles beyond [[hashedFeatures]]' aggregation.
    */
  def hashedScore(df: DataFrame, idCol: String, textCol: String,
                  weights: Seq[Long], buckets: Int = 64): DataFrame = {
    require(weights.length == buckets,
      s"need $buckets weights, got ${weights.length}")
    val spark = df.sparkSession
    import spark.implicits._
    val w = weights.zipWithIndex
      .map { case (v, b) => (b.toLong, v) }.toDF("bucket", "w")
    val wNormSq = weights.map(v => v * v).sum
    hashedFeatures(df, idCol, textCol, buckets)
      .join(broadcast(w), "bucket")
      .groupBy(col(idCol))
      .agg(sum(col("cnt")).alias("n_tokens"),
        sum(col("cnt") * col("w")).alias("dot"),
        sum(col("cnt") * col("cnt")).alias("norm_sq"))
      .select(col(idCol), col("n_tokens"), col("dot"), col("norm_sq"),
        when(col("norm_sq") > 0,
          round(col("dot").cast(DoubleType) /
            (sqrt(col("norm_sq").cast(DoubleType)) *
              math.sqrt(wNormSq.toDouble)), 6)).alias("cosine"))
  }
}
