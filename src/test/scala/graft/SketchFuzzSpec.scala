package graft

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.Row

/** Row shape for [[SketchFuzzSpec]] (top-level so Spark can encode it). */
case class SketchFuzzRow(case_id: Int, shard: Int, key: Option[Long],
                         item: Option[String], v: Option[Double])

/** Seeded, deterministic fuzz of the sketch tier's SQL surface
  * (GraftExtensions) at the seams ExtensionsSpec's happy paths skip:
  * empty inputs, all-null columns, single-row groups, shard merges that
  * mix exact-mode and estimation-mode sketches, wrong-k KLL merges, and
  * out-of-range parameters. 220 seeded cases share one table and each
  * family runs ONE consolidated SQL (grouped by case), so the sweep is a
  * handful of jobs, not hundreds; every truth is computed independently
  * in Scala from the same generated rows.
  *
  * Case strata (c mod 11): 0 → empty case (no rows at all — an "empty
  * group" never reaches a grouped aggregate, pinned by absence); 1 →
  * single row; 2 → ALL-null key/item/value; 3 → wide key domain (pushes
  * lgK=4 sketches into estimation mode); else general (random nulls,
  * random sizes).
  */
class SketchFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val Cases = 220

  private def genCase(c: Int): Seq[SketchFuzzRow] = {
    val rng = new scala.util.Random(7000 + c)
    val n = (c % 11) match {
      case 0 => 0
      case 1 => 1
      case 2 => 2 + rng.nextInt(40)
      case _ => 2 + rng.nextInt(150)
    }
    val dom = if (c % 11 == 3) 500 else 1 + rng.nextInt(50)
    val pNull = if (c % 11 == 2) 1.0 else rng.nextDouble() * 0.3
    (0 until n).map { _ =>
      SketchFuzzRow(c, rng.nextInt(3),
        if (rng.nextDouble() < pNull) None else Some(rng.nextInt(dom).toLong),
        if (rng.nextDouble() < pNull) None else Some(s"w${rng.nextInt(dom)}"),
        if (rng.nextDouble() < pNull) None
        else Some(math.round(rng.nextDouble() * 1000).toDouble / 10))
    }
  }

  private lazy val rows: Seq[SketchFuzzRow] = (0 until Cases).flatMap(genCase)
  private lazy val byCase: Map[Int, Seq[SketchFuzzRow]] = rows.groupBy(_.case_id)
  private def distinctKeys(c: Int): Long =
    byCase.getOrElse(c, Nil).flatMap(_.key).distinct.size.toLong

  private def fuzzView(): Unit = {
    GraftFunctions.registerAll(spark)
    rows.toDF().createOrReplaceTempView("fuzz")
  }

  test("theta SQL: exact-mode estimate == exact distinct; shard union == direct; nulls/empties") {
    fuzzView()
    // lgK 12 keeps every case (≤ ~500 distinct) in exact mode, so both
    // the direct estimate and the shard-merged estimate are EQUALITIES
    val out = spark.sql(
      """WITH direct AS (SELECT case_id,
        |       theta_estimate(theta_sketch(key, 12)) AS d_est
        |     FROM fuzz GROUP BY case_id),
        |parts AS (SELECT case_id, shard, theta_sketch(key, 12) AS sk
        |          FROM fuzz GROUP BY case_id, shard),
        |merged AS (SELECT case_id, theta_estimate(theta_union(sk, 12)) AS m_est
        |           FROM parts GROUP BY case_id)
        |SELECT direct.case_id, d_est, m_est
        |FROM direct JOIN merged USING (case_id)""".stripMargin)
      .collect().map(r => r.getInt(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    // empty cases never reach a grouped aggregate — absent by contract
    (0 until Cases).foreach { c =>
      if (byCase.contains(c)) {
        val (d, m) = out(c)
        assert(d == distinctKeys(c).toDouble, s"case $c direct")
        assert(m == d, s"case $c shard-union != direct")
      } else assert(!out.contains(c), s"case $c should be absent")
    }
    // all-null stratum is present with estimate 0
    assert((2 until Cases by 11).forall(c => out(c) == ((0.0, 0.0))))
  }

  test("theta SQL: mixing exact-mode and estimation-mode partials merges sanely") {
    fuzzView()
    // shard 0 sketched at lgK 12 (exact mode), shards 1-2 at lgK 4
    // (estimation mode for the wide-domain stratum) — the heterogeneous
    // merge seam. Theta unions tolerate mixed precisions; the estimate
    // must stay within the coarse side's error envelope of the truth.
    val out = spark.sql(
      """WITH p AS (
        |  SELECT case_id,
        |         theta_sketch(CASE WHEN shard = 0 THEN key END, 12) AS sk_hi,
        |         theta_sketch(CASE WHEN shard <> 0 THEN key END, 4) AS sk_lo
        |  FROM fuzz GROUP BY case_id)
        |SELECT case_id,
        |  theta_estimate(theta_union(sk, 4)) AS est
        |FROM (SELECT case_id, sk_hi AS sk FROM p
        |      UNION ALL SELECT case_id, sk_lo FROM p)
        |GROUP BY case_id""".stripMargin)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    byCase.keys.foreach { c =>
      val exact = distinctKeys(c)
      val est = out(c)
      assert(est >= 0.0 && java.lang.Double.isFinite(est), s"case $c: $est")
      if (exact == 0) assert(est == 0.0, s"case $c")
      // lgK=4 → rsd ≈ 1/√16; 4·rsd = 100% is the generous crash-net
      // bound — the point is garbage/NaN/negatives, not tight accuracy
      else assert(math.abs(est - exact) <= math.max(4.0, 1.5 * exact),
        s"case $c: est $est vs exact $exact")
    }
  }

  test("freq SQL: tiny maxMapSize brackets hold and no heavy item is missed across merges") {
    fuzzView()
    val out = spark.sql(
      """WITH sk AS (SELECT case_id, shard, freq_sketch(item, 8) AS s
        |            FROM fuzz GROUP BY case_id, shard)
        |SELECT case_id, freq_merge(s, 8) AS s
        |FROM sk GROUP BY case_id""".stripMargin).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val c = r.getInt(0)
      val truth = byCase(c).flatMap(_.item)
        .groupBy(identity).map { case (k, g) => k -> g.size.toLong }
      // the envelope must conserve TOTAL stream weight exactly, even
      // when fully-purged partials serialized empty (the defect this
      // fuzzer found: raw library bytes dropped weight AND error there)
      val st = graft.functions.SketchAggs.freqDecode(r.getAs[Array[Byte]](1))
      assert(st.totalWeight == truth.values.sum, s"case $c stream length")
      val reported = st.sk.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
      reported.foreach { row =>
        val t = truth.getOrElse(row.getItem, 0L)
        val (lo, hi) = (math.max(0L, row.getLowerBound - st.lostError),
          row.getUpperBound + st.lostError)
        assert(lo <= t && t <= hi,
          s"case $c/${row.getItem}: [$lo,$hi] vs $t")
      }
      val reportedSet = reported.map(_.getItem).toSet
      truth.foreach { case (item, t) =>
        if (t > st.maxError)
          assert(reportedSet.contains(item),
            s"case $c missed $item ($t > ${st.maxError})")
      }
    }
  }

  test("kll SQL: wrong-k merge (128-built into k=200 merge) keeps n/min/max exact") {
    fuzzView()
    val out = spark.sql(
      """WITH sk AS (SELECT case_id, shard, kll_sketch(v, 128) AS s
        |            FROM fuzz GROUP BY case_id, shard),
        |m AS (SELECT case_id, kll_merge(s, 200) AS s FROM sk GROUP BY case_id)
        |SELECT case_id, kll_summary(s, 0.0, 0.5, 1.0) AS summary
        |FROM m""".stripMargin).collect()
    out.foreach { r =>
      val c = r.getInt(0)
      val vs = byCase(c).flatMap(_.v)
      val s = r.getAs[Row]("summary")
      if (vs.isEmpty) assert(s == null, s"case $c: empty must summarize null")
      else {
        assert(s.getAs[Long]("n") == vs.size.toLong, s"case $c n")
        assert(s.getAs[Double]("min_value") == vs.min, s"case $c min")
        assert(s.getAs[Double]("max_value") == vs.max, s"case $c max")
        val qs = s.getSeq[Double](3)
        assert(qs.length == 3 && qs.forall(q => q >= vs.min && q <= vs.max),
          s"case $c quantiles $qs outside [${vs.min}, ${vs.max}]")
        // rank-0 and rank-1 quantiles are the exact extremes by contract
        assert(qs.head == vs.min && qs.last == vs.max, s"case $c extremes")
      }
    }
  }

  test("kmv SQL: bottom-k is the exact distinct minima, nulls and tiny groups included") {
    fuzzView()
    val out = spark.sql(
      """SELECT case_id, kmv_bottom_k(key, 8) AS mins
        |FROM fuzz GROUP BY case_id""".stripMargin)
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1).toList).toMap
    byCase.keys.foreach { c =>
      val expect = byCase(c).flatMap(_.key).distinct.sorted.take(8).toList
      assert(out(c) == expect, s"case $c: ${out(c)} vs $expect")
    }
  }

  test("empty relation: every sketch aggregate yields its identity, not a crash") {
    fuzzView()
    val r = spark.sql(
      """SELECT theta_estimate(theta_sketch(key, 12)) AS t,
        |  theta_estimate(theta_union(CAST(NULL AS BINARY), 12)) AS tu,
        |  freq_top_items(freq_sketch(item, 8)) AS f,
        |  kll_summary(kll_sketch(v, 200), 0.5) AS k,
        |  kmv_bottom_k(key, 8) AS m
        |FROM fuzz WHERE false""".stripMargin).head()
    assert(r.getDouble(0) == 0.0 && r.getDouble(1) == 0.0)
    assert(r.getSeq[Row](2).isEmpty)
    assert(r.isNullAt(3))
    assert(r.getSeq[Long](4).isEmpty)
  }

  test("out-of-range parameters fail at construction with the require message") {
    fuzzView()
    def messageOf(sql: String): String =
      intercept[Exception](spark.sql(sql).collect()).getMessage
    assert(messageOf("SELECT freq_merge(CAST(NULL AS BINARY), 7) FROM fuzz")
      .contains("power of 2"))
    assert(messageOf("SELECT freq_sketch(item, 6) FROM fuzz")
      .contains("power of 2"))
    assert(messageOf("SELECT kll_merge(CAST(NULL AS BINARY), 4) FROM fuzz")
      .contains("k out of range"))
    assert(messageOf("SELECT kll_sketch(v, 2) FROM fuzz")
      .contains("k out of range"))
    assert(messageOf("SELECT theta_union(CAST(NULL AS BINARY), 30) FROM fuzz")
      .contains("lgK out of range"))
    assert(messageOf("SELECT theta_sketch(key, 2) FROM fuzz")
      .contains("lgK out of range"))
    assert(messageOf("SELECT kmv_bottom_k(key, 1) FROM fuzz")
      .contains("k out of range"))
  }
}
