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
}
