package graft

import org.apache.spark.sql.functions._

import graft.ops.Linkage

class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private def recs(rows: (Long, String, String)*) =
    rows.toDF("id", "name", "grp")

  private val block = Seq(element_at(split(col("name"), " "), -1))

  test("fuzzyPairs finds in-block near matches and respects the threshold") {
    val df = recs(
      (1L, "red widget", "x"),
      (2L, "rad widget", "x"),
      (3L, "blue widget", "x"),
      (4L, "red gadget", "x"))
    val out = Linkage.fuzzyPairs(df, "id", "name", block, maxDist = 1, maxBlock = 100)
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(4))).toSet
    // red~rad dist 1; blue is 3+ away from both; gadget is a different block
    assert(out == Set((1L, 2L, 1L)))
  }

  test("blocking prevents cross-block comparison even for near-identical names") {
    val df = recs(
      (1L, "acme corp", "x"),
      (2L, "acme corps", "x")) // different last token => different block
    val out = Linkage.fuzzyPairs(df, "id", "name", block, maxDist = 2, maxBlock = 100)
    assert(out.count() == 0)
  }

  test("maxBlock drops oversized blocks deterministically") {
    val big = (1L to 50L).map(i => (i, s"name$i common", "x"))
    val small = Seq((100L, "tiny pair", "x"), (101L, "tiny pair", "x"))
    val df = recs((big ++ small): _*)
    val out = Linkage.fuzzyPairs(df, "id", "name", block, maxDist = 3, maxBlock = 10)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(out.toSet == Set((100L, 101L)))
  }

  test("resolveEntities closes matches transitively and keeps singletons") {
    // chain: aaaa-aabb (2), aabb-abbb (1), but aaaa-abbb = 3 > maxDist;
    // transitive closure still merges all three into entity 1
    val df = recs(
      (1L, "aaaa x", "x"),
      (2L, "aabb x", "x"),
      (3L, "abbb x", "x"),
      (9L, "zzzz x", "x"))
    val out = Linkage.resolveEntities(df, "id", "name", block, maxDist = 2, maxBlock = 100)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 9L))
  }

  test("fuzzyPairs equals unblocked brute force when blocks are not capped") {
    val part = graft.sources.Tables.part(spark, sf01).filter(col("p_partkey") < 400)
    val blk = Seq(element_at(split(col("p_name"), " "), -1), col("p_brand"))
    val got = Linkage.fuzzyPairs(part, "p_partkey", "p_name", blk,
        maxDist = 3, maxBlock = 100000)
      .select("k1", "k2", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // brute force: full levenshtein + the same block predicate, no cap
    val a = part.select(col("p_partkey").alias("k1"), col("p_name").alias("n1"),
      col("p_brand").alias("b1"))
    val b = part.select(col("p_partkey").alias("k2"), col("p_name").alias("n2"),
      col("p_brand").alias("b2"))
    val brute = a.join(b, col("k1") < col("k2"))
      .filter(element_at(split(col("n1"), " "), -1) === element_at(split(col("n2"), " "), -1) &&
        col("b1") === col("b2"))
      .withColumn("dist", levenshtein(col("n1"), col("n2")).cast("long"))
      .filter(col("dist") <= 3)
      .select("k1", "k2", "dist")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == brute && got.nonEmpty)
  }
}
