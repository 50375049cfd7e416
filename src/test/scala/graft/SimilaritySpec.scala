package graft

import org.apache.spark.sql.functions._

import graft.ops.Similarity
import graft.functions.VectorFunctions

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine HOF matches hand computation") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(3.0f, 2.0f, 1.0f))).toDF("a", "b")
    val got = df.select(VectorFunctions.cosine(col("a"), col("b"))).as[Double].head()
    val exp = (3.0 + 4.0 + 3.0) / (math.sqrt(14.0) * math.sqrt(14.0))
    assert(math.abs(got - exp) < 1e-12)
  }

  test("cosine of zero vector is null") {
    val df = Seq((Seq(0.0f, 0.0f), Seq(1.0f, 2.0f))).toDF("a", "b")
    assert(df.select(VectorFunctions.cosine(col("a"), col("b"))).head().isNullAt(0))
  }

  test("bruteForceTopK ranks an exact copy first") {
    val target = Seq(0.3f, -0.2f, 0.9f, 0.1f)
    val corpus = Seq(
      (10L, target),                                // exact copy → rank 1
      (11L, Seq(0.31f, -0.19f, 0.88f, 0.12f)),      // close → rank 2
      (12L, Seq(-0.9f, 0.8f, -0.7f, 0.6f))          // far
    ).toDF("vec_id", "embedding")
    val queries = Seq((1L, target)).toDF("vec_id", "embedding")
    val out = Similarity.bruteForceTopK(queries, corpus, "vec_id", "embedding", 2)
      .orderBy("rank").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(10L, 11L))
    assert(math.abs(out(0).getDouble(2) - 1.0) < 1e-6)
  }

  test("lshTopK finds exact-copy neighbors (same bucket guaranteed) ") {
    // query == corpus vector ⇒ identical sketch ⇒ collides in every band
    val emb = graft.sources.Tables.embeddings(spark, sf001)
    val queries = emb.filter(col("vec_id") < 3)
    val corpus = emb // include the identical vectors themselves
    val out = Similarity.lshTopK(queries, corpus, "vec_id", "embedding", 1, dim = 64)
      .collect()
    assert(out.length == 3)
    out.foreach { r =>
      assert(r.getLong(0) == r.getLong(1), "top-1 must be the identical vector")
      assert(math.abs(r.getDouble(2) - 1.0) < 1e-6)
    }
  }

  test("lshTopK results are a subset of brute-force candidates with correct cosines") {
    val emb = graft.sources.Tables.embeddings(spark, sf001)
    val q = emb.filter(col("vec_id") < 5)
    val c = emb.filter(col("vec_id") >= 5)
    val brute = Similarity.bruteForceTopK(q, c, "vec_id", "embedding", 50)
      .select("query_id", "neighbor_id", "cosine")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = Similarity.lshTopK(q, c, "vec_id", "embedding", 5, dim = 64).collect()
    lsh.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      brute.get(key).foreach(exp => assert(math.abs(r.getDouble(2) - exp) < 1e-9))
    }
  }
}
