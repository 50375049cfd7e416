package graft

import graft.ops.Features

class FeaturesSpec extends SparkSpec {
  import spark.implicits._

  test("winsorize clips exactly at the rounded group quantiles") {
    // group g: values 1..10 → p10 = 1.9, p90 = 9.1 (linear interpolation)
    val df = (1 to 10).map(i => ("g", i.toDouble)).toDF("grp", "v")
    val out = Features.winsorize(df, Seq("grp"), "v", 0.1, 0.9, "w")
      .select("v", "w").as[(Double, Double)].collect().toMap
    assert(out(1.0) == 1.9 && out(2.0) == 2.0) // below lo clips, inside passes
    assert(out(10.0) == 9.1 && out(9.0) == 9.0)
    assert(out(5.0) == 5.0)
  }

  test("zscore standardizes per group and nulls zero-variance groups") {
    // group a: {1,2,3} → μ=2, σ=sqrt(2/3); group b: constant → null z
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 7.0), ("b", 7.0))
      .toDF("grp", "v")
    val rows = Features.zscore(df, Seq("grp"), "v", "z").collect()
    val a = rows.filter(_.getString(0) == "a")
      .map(r => r.getDouble(1) -> r.getDouble(2)).toMap
    // -1/sqrt(2/3) = -1.22474487... → -1.224745 at 6 dp
    assert(math.abs(a(1.0) - (-1.224745)) < 1e-9)
    assert(a(2.0) == 0.0)
    assert(math.abs(a(1.0) + a(3.0)) < 1e-9) // symmetric around the mean
    assert(rows.filter(_.getString(0) == "b").forall(_.isNullAt(2)))
  }

  test("robustScale resists the outlier that wrecks a z-score") {
    // 1..9 plus a 1000 spike: median 5.5, MAD 2.5 — the spike's own
    // robust z is huge while in-liers keep small scores; a σ-based
    // z-score would compress everything toward zero
    val df = ((1 to 9).map(_.toDouble) :+ 1000.0).map(("g", _)).toDF("grp", "v")
    val out = Features.robustScale(df, Seq("grp"), "v", "rz")
      .select("v", "rz").as[(Double, Double)].collect().toMap
    assert(out(5.0) == -0.2)
    assert(out(1000.0) == 397.8)
    assert(math.abs(out(1.0) - (-1.8)) < 1e-9)
    // constant group → MAD 0 → null; helper columns (__med/__mad) dropped,
    // so the output contract is input columns + rz only
    val const = Seq(("c", 7.0), ("c", 7.0), ("c", 7.0)).toDF("grp", "v")
    val constOut = Features.robustScale(const, Seq("grp"), "v", "rz")
    assert(constOut.columns.toSet == Set("grp", "v", "rz"))
    assert(constOut.collect().forall(_.isNullAt(constOut.columns.indexOf("rz"))))
  }

  test("rocAuc: perfect separation, cross-class tie, single-class null") {
    val df = Seq(
      // group p: perfect separation → AUC 1
      ("p", 1L, false), ("p", 2L, false), ("p", 3L, true), ("p", 4L, true),
      // group t: pos{2,3} neg{1,2} → pairs (3>1,3>2,2>1 win; 2=2 tie=0.5)
      //          → AUC 3.5/4 = 0.875
      ("t", 1L, false), ("t", 2L, true), ("t", 2L, false), ("t", 3L, true),
      // group s: single class → null
      ("s", 5L, true), ("s", 6L, true))
      .toDF("grp", "score", "label")
    val out = Features.rocAuc(df, Seq("grp"), "score", "label").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(out("p").getDouble(3) == 1.0)
    assert(out("t").getDouble(3) == 0.875)
    assert(out("s").isNullAt(3))
    assert(out("t").getLong(1) == 2L && out("t").getLong(2) == 2L)
  }

  test("hashedFeatures/hashedScore: closed-form counts, dot, cosine") {
    import graft.ops.Features
    // md5-bucket assignments are engine-portable; derive them here with
    // the same rule the op uses, then check the closed-form arithmetic
    val df = Seq((1L, "a a b"), (2L, "a"), (3L, "")).toDF("doc_id", "text")
    def bucket(t: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).take(2).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % 64
    }
    val (ba, bb) = (bucket("a"), bucket("b"))
    val feats = Features.hashedFeatures(df, "doc_id", "text", 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(feats((1L, ba)) == 2L && feats((1L, bb)) == 1L)
    assert(feats((2L, ba)) == 1L)
    // "" tokenizes to [""] — one token in the empty-string bucket
    assert(feats.keySet.count(_._1 == 3L) == 1)
    val weights = (0 until 64).map(b => ((b * 37) % 21 - 10).toLong)
    val wns = weights.map(w => w * w).sum
    val out = Features.hashedScore(df, "doc_id", "text", weights, 64)
      .collect().map(r => r.getLong(0) -> r).toMap
    val dot1 = 2 * weights(ba.toInt) + 1 * weights(bb.toInt)
    assert(out(1L).getLong(1) == 3L)            // n_tokens
    assert(out(1L).getLong(2) == dot1)          // dot
    assert(out(1L).getLong(3) == 5L)            // 2^2 + 1^2
    val cos1 = math.floor(dot1 / (math.sqrt(5.0) * math.sqrt(wns.toDouble))
      * 1e6 + 0.5) / 1e6
    assert(math.abs(out(1L).getDouble(4) - cos1) < 2e-6)
  }

  test("hashedEmbedding: closed-form components, unit norm, composition") {
    import graft.ops.{Features, Similarity}
    val df = Seq((1L, "a a b"), (2L, "a"), (3L, "b b b b")).toDF("doc_id", "text")
    def bucket(t: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(t.getBytes("UTF-8")).take(2).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16) % 64
    }
    val (ba, bb) = (bucket("a"), bucket("b"))
    val out = Features.hashedEmbedding(df, "doc_id", "text", 64)
      .collect().map(r => r.getLong(0) -> r).toMap
    def q6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    // doc 1: counts a=2, b=1 → norm² = 5; components 2/√5, 1/√5 (6 dp)
    assert(out(1L).getLong(1) == 3L && out(1L).getLong(2) == 5L)
    val v1 = out(1L).getSeq[Double](3)
    assert(v1.length == 64)
    assert(v1(ba.toInt) == q6(2.0 / math.sqrt(5.0)))
    assert(v1(bb.toInt) == q6(1.0 / math.sqrt(5.0)))
    assert(v1.zipWithIndex.forall { case (x, i) =>
      i == ba.toInt || i == bb.toInt || x == 0.0 })
    // single-token docs are exactly unit vectors
    val v2 = out(2L).getSeq[Double](3)
    assert(v2(ba.toInt) == 1.0 && v2.sum == 1.0)
    // L2 norm ≈ 1 up to quantization for every doc
    out.values.foreach { r =>
      val n = math.sqrt(r.getSeq[Double](3).map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-5, s"norm $n")
    }
    // composition: embeddings feed the shared k-means assignment rule —
    // doc 3 (pure "b") must join the seed whose vector it equals when
    // that seed is itself; with seeds {1,2}, doc 3 sides with doc 1
    // (shares bucket b) over doc 2 (orthogonal)
    val step = Similarity.kmeansStep(
      Features.hashedEmbedding(df, "doc_id", "text", 64),
      "doc_id", "emb", seedIds = Seq(1L, 2L))
    val members = step.select("cluster", "n_members").distinct()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(members(1L) == 2L && members(2L) == 1L)
  }
}
