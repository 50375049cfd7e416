package graft

import org.apache.spark.sql.functions._

/** One-off sf1 recall check backing SCALE.md: plant 1000 known near-dup
  * pairs (±5% per-component noise, cosine ≈ 0.999) into the 20k-vector
  * generated corpus and count how many each layout finds at t = 0.9.
  */
object RampCount {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val emb = graft.sources.Tables.embeddings(spark, "target/sfgen/sf1")
      .select(col("vec_id"), col("embedding"))
    val dup = emb.filter(col("vec_id") % 20 === 0)
      .select((col("vec_id") + 10000000L).alias("vec_id"),
        transform(col("embedding"), (x, i) =>
          (x * (lit(1.0) + ((pmod(xxhash64(col("vec_id"), i), lit(1000)) - 500) / 500.0) * 0.05))
            .cast("float")).alias("embedding"))
    val corpus = emb.unionByName(dup).localCheckpoint(true)
    def planted(df: org.apache.spark.sql.DataFrame): Long =
      df.filter(col("id_a") >= 10000000L || col("id_b") >= 10000000L).count()
    val t0 = System.nanoTime()
    val scaled = planted(graft.ops.Dedup.embeddingNearDupScaled(corpus, "vec_id", "embedding", 0.9, 64))
    val t1 = System.nanoTime()
    val legacy = planted(graft.ops.Dedup.embeddingNearDupAuto(corpus, "vec_id", "embedding", 0.9, 64))
    val t2 = System.nanoTime()
    println(f"[rampcount] planted=1000 scaled_found=$scaled (${(t1-t0)/1e9}%.1f s) legacy_found=$legacy (${(t2-t1)/1e9}%.1f s)")
    spark.stop()
  }
}
