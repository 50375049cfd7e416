package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over an embedding column
  * (builder brief: brute-force cosine top-k baseline + bucketed scale
  * path).
  *
  * Scale design: the query set is broadcast (it is small by construction);
  * the corpus never shuffles — score+rank is computed per corpus partition
  * and only k rows per query survive the final top-k, so the reduce side
  * is tiny. For corpus-vs-corpus similarity use [[Dedup.embeddingNearDup]]
  * (bucketed self-join) instead of a cross product.
  */
object Similarity {

  /** Exact brute-force cosine top-k: for each row of `queries`, the k
    * nearest `corpus` rows by cosine (desc), ties broken by corpus id asc.
    * Output: (query_id, neighbor_id, cosine, rank).
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     idCol: String, vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).alias("query_id"), col(vecCol).alias("__qv"))
    val c = corpus.select(col(idCol).alias("neighbor_id"), col(vecCol).alias("__cv"))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("cosine", VectorFunctions.cosine(col("__qv"), col("__cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("cosine"), 6).alias("cosine"),
        col("rank"))
  }

  /** Exact top-k via the typed [[graft.functions.TopKAggregator]]: same
    * result as [[bruteForceTopK]], but ranked with map-side-combined
    * bounded heaps instead of a window sort — only k rows per query per
    * partition cross the shuffle (the scale path for large corpora).
    */
  def bruteForceTopKAgg(queries: DataFrame, corpus: DataFrame,
                        idCol: String, vecCol: String, k: Int): DataFrame = {
    import graft.functions.{Scored, TopKAggregator}
    val spark = queries.sparkSession
    import spark.implicits._
    val q = queries.select(col(idCol).alias("query_id"), col(vecCol).alias("__qv"))
    val c = corpus.select(col(idCol).alias("neighbor_id"), col(vecCol).alias("__cv"))
    val scored = c.crossJoin(broadcast(q))
      .select(col("query_id"),
        col("neighbor_id"),
        VectorFunctions.cosine(col("__qv"), col("__cv")).alias("cosine"))
      .as[(Long, Long, Double)]
    val agg = new TopKAggregator(k).toColumn
    scored.groupByKey(_._1)
      .mapValues { case (_, id, cos) => Scored(id, cos) }
      .agg(agg)
      .flatMap { case (queryId, top) =>
        top.zipWithIndex.map { case (s, i) => (queryId, s.neighborId, s.score, (i + 1).toLong) }
      }
      .toDF("query_id", "neighbor_id", "cosine", "rank")
      .withColumn("cosine", round(col("cosine"), 6))
  }

  /** IVF (inverted-file) ANN: corpus rows are assigned to their nearest
    * coarse centroid; a query scores only the rows in its `nProbe` closest
    * cells. Centroids here are `nCentroids` deterministic corpus rows
    * (lowest ids) collected to the driver — at real scale substitute a
    * sampled k-means; the probe/assign machinery is unchanged. The
    * centroid table is tiny and travels as literals inside codegen'd
    * expressions; the corpus is scanned once and shuffled only on the
    * cell key.
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame,
              idCol: String, vecCol: String, k: Int,
              nCentroids: Int = 16, nProbe: Int = 4): DataFrame = {
    import org.apache.spark.sql.Column
    val centroids: Seq[Seq[Double]] = corpus
      .orderBy(col(idCol)).limit(nCentroids)
      .select(col(vecCol)).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toSeq).toSeq

    def centroidScores(v: String): Column =
      array(centroids.map(c =>
        VectorFunctions.cosine(col(v), array(c.map(lit): _*))): _*)

    // corpus → its single best cell (1-based index into the centroid list)
    val assigned = corpus.select(col(idCol).alias("neighbor_id"), col(vecCol).alias("__cv"))
      .withColumn("__cell", array_position(centroidScores("__cv"),
        array_max(centroidScores("__cv"))))

    // query → its nProbe best cells, via comparator array_sort on
    // (score, index) structs
    val idxScores = transform(sequence(lit(1), lit(nCentroids)),
      i => struct(element_at(centroidScores("__qv"), i).alias("s"), i.alias("i")))
    val probeCells = slice(
      array_sort(idxScores, (l, r) =>
        when(l.getField("s") > r.getField("s"), -1)
          .when(l.getField("s") < r.getField("s"), 1)
          .otherwise(0)),
      1, nProbe)
    val probed = queries.select(col(idCol).alias("query_id"), col(vecCol).alias("__qv"))
      .withColumn("__cell", explode(transform(probeCells, p => p.getField("i").cast("long"))))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    assigned.join(broadcast(probed), Seq("__cell"))
      .withColumn("cosine", VectorFunctions.cosine(col("__qv"), col("__cv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("cosine"), 6).alias("cosine"),
        col("rank"))
  }

  /** LSH-bucketed ANN: hyperplane sign-sketch buckets restrict scoring to
    * corpus rows sharing ≥1 band with the query — approximate (recall < 1)
    * but turns the n×m cross product into bucket-local joins. Same output
    * shape as [[bruteForceTopK]].
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame,
              idCol: String, vecCol: String, k: Int, dim: Int,
              planes: Int = 6, bands: Int = 6): DataFrame = {
    val hp = Hyperplanes.generate(seed = 7L, nPlanes = planes * bands, dim = dim)
    def banded(df: DataFrame, id: String, v: String) =
      df.select(col(idCol).alias(id), col(vecCol).alias(v))
        .withColumn("__sketch", VectorFunctions.hyperplaneSketch(col(v), hp))
        .select(col(id), col(v),
          posexplode(array((0 until bands).map(b =>
            shiftrightunsigned(col("__sketch"), b * planes)
              .bitwiseAND(lit((1L << planes) - 1))): _*))
            .as(Seq("__band", "__key")))

    val qb = banded(queries, "query_id", "__qv")
    val cb = banded(corpus, "neighbor_id", "__cv")
    // ids-only distinct, then re-attach both vectors (queries broadcast)
    val cand = cb.select(col("neighbor_id"), col("__band"), col("__key"))
      .join(broadcast(qb.select(col("query_id"), col("__band"), col("__key"))),
        Seq("__band", "__key"))
      .select(col("query_id"), col("neighbor_id"))
      .distinct()
      .join(broadcast(queries.select(col(idCol).alias("query_id"), col(vecCol).alias("__qv"))),
        "query_id")
      .join(corpus.select(col(idCol).alias("neighbor_id"), col(vecCol).alias("__cv")),
        "neighbor_id")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    cand.withColumn("cosine", VectorFunctions.cosine(col("__qv"), col("__cv")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), round(col("cosine"), 6).alias("cosine"),
        col("rank"))
  }
}
