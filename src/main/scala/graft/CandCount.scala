package graft

import org.apache.spark.sql.functions.{col, posexplode}

/** Diagnostic main: COUNT q93's band-join candidate pairs at a given SF —
  * the workload-growth denominator for the SCALE.md ratio gates (wall
  * ratios are only meaningful against the counted candidate growth, and
  * the generated fixtures are re-derived each round, so the count is
  * re-taken with them).
  */
object CandCount {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("target/sfgen/sf1")
    val spark = GraftSession.local()
    // `jaccard` mode: count the prefix-join candidate set of
    // x_jaccard_prefix_full (post size-ratio, pre-verify — the frame the
    // verify joins actually consume), the denominator for ITS sf gate.
    if (args.drop(1).headOption.contains("jaccard")) {
      import org.apache.spark.sql.functions.{array_distinct, array_sort, size => asize}
      // Measure the denominator under the PRODUCTION shuffle posture
      // (round-15 ADVICE): the shipped operator runs its prefix chain
      // inside the WideShuffle scope with the token frame persisted —
      // counting at the 32-partition session default would re-create the
      // exact fixed-partition spill class the round-15 fix removed and
      // re-tokenize the corpus per pass.
      graft.ops.DedupMinHash.WideShuffle.enter(spark)
      try {
        val t = graft.sources.Tables.documents(spark, sfDir)
          .select(col("doc_id").alias("__id"),
            array_sort(array_distinct(graft.functions.TextFunctions.tokenHashes(
              graft.functions.TextFunctions.tokens(col("text"))))).alias("__toks"))
          .withColumn("__n", asize(col("__toks")))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val n = graft.ops.Dedup.jaccardPrefixCandidates(t, 0.9).count()
        t.unpersist(false)
        println(s"CANDIDATES=$n mode=jaccard sf=$sfDir")
      } finally graft.ops.DedupMinHash.WideShuffle.exit(spark)
      spark.stop()
      return
    }
    def sig(filter: org.apache.spark.sql.Column) =
      graft.ops.Dedup.minHashSignatures(
        graft.sources.Tables.documents(spark, sfDir).filter(filter),
        "doc_id", "text", shingleK = 1, numHashes = 48)
    def banded(s: org.apache.spark.sql.DataFrame) = s.select(col("__id"),
      posexplode(graft.functions.TextFunctions.bandKeys(col("__sig"), 16, 3))
        .as(Seq("__band", "__key")))
    val corpus = banded(sig(col("doc_id") % 25 =!= 0))
    val batch = banded(sig(col("doc_id") % 25 === 0))
    val n = batch.alias("a").join(corpus.alias("b"),
        col("a.__band") === col("b.__band") && col("a.__key") === col("b.__key") &&
          col("a.__id") =!= col("b.__id"))
      .select(col("a.__id").alias("new_id"), col("b.__id").alias("corpus_id"))
      .distinct().count()
    println(s"CANDIDATES=$n sf=$sfDir")
    spark.stop()
  }
}
