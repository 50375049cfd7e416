package graft

import org.apache.spark.sql.functions._

import graft.SparkEntry

class AnalyticsSpec extends SparkSpec {

  test("approx_count_distinct lands within the HLL++ default error bound") {
    val exact = SparkEntry.queries("q36_distinct_counts")(spark, sf001).head()
    val approx = SparkEntry.queries("q37_approx_distinct")(spark, sf001).head()
    // default rsd = 0.05; allow 3x margin
    Seq(("n_orders", "approx_orders"), ("n_parts", "approx_parts")).foreach {
      case (e, a) =>
        val ev = exact.getAs[Long](e).toDouble
        val av = approx.getAs[Long](a).toDouble
        assert(math.abs(av - ev) / ev < 0.15, s"$a=$av vs $e=$ev")
    }
  }

  test("as-of join: every click maps to the latest signup at or before it") {
    val out = SparkEntry.queries("q24_asof_join")(spark, sf001)
    val ev = graft.sources.Tables.events(spark, sf001)
      .select("event_id", "ts", "user_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
    val clicks = ev.filter(_._4 == "click")
    val signups = ev.filter(_._4 == "signup")
    val expected = clicks.map { case (cid, cts, u, _) =>
      val prior = signups.filter(s => s._3 == u && !s._2.after(cts))
      cid -> (if (prior.isEmpty) None
              else Some(prior.maxBy(s => (s._2.getTime, s._1))._1))
    }.toMap
    val got = out.collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(got.size == expected.size)
    expected.foreach { case (cid, exp) =>
      assert(got(cid) == exp, s"click $cid: got ${got(cid)} expected $exp")
    }
  }

  test("collapseRuns builds SCD2 intervals: recurring values reopen, ties stay total") {
    import java.sql.Timestamp
    import spark.implicits._
    def t(s: Long) = new Timestamp(s * 1000L)
    // user 1: A A B A  -> runs A(2), B(1), A(1) — A reopens after B
    // user 2: one tied-ts pair with different types -> event_id breaks the tie
    val df = Seq(
      (1L, t(10), 1L, "A"), (2L, t(20), 1L, "A"), (3L, t(30), 1L, "B"),
      (4L, t(40), 1L, "A"),
      (10L, t(100), 2L, "X"), (11L, t(100), 2L, "Y")
    ).toDF("event_id", "ts", "user_id", "event_type")
    val out = graft.ops.TimeSeries.collapseRuns(df, "user_id", "ts", "event_type",
        tieBreak = Seq(col("event_id")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getTimestamp(3), Option(r.getTimestamp(4)), r.getBoolean(5), r.getLong(6)))
    val u1 = out.filter(_._1 == 1L).sortBy(_._3)
    assert(u1.map(x => (x._2, x._3, x._4, x._5, x._7)).toSeq == Seq(
      ("A", 1L, t(10), Some(t(30)), 2L),
      ("B", 2L, t(30), Some(t(40)), 1L),
      ("A", 3L, t(40), None, 1L)))
    assert(u1.last._6) // open interval is current
    val u2 = out.filter(_._1 == 2L).sortBy(_._3)
    // tie resolved by event_id: X (id 10) before Y (id 11), both runs at t=100
    assert(u2.map(x => (x._2, x._3, x._7)).toSeq == Seq(("X", 1L, 1L), ("Y", 2L, 1L)))
    assert(u2.head._5.contains(t(100)) && u2.last._5.isEmpty)
  }

  test("upsert replaces by key without shuffling the target; actions audit correctly") {
    import spark.implicits._
    val target = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "name", "v")
    val batch = Seq((2L, "b2", 99.0), (9L, "new", 0.0)).toDF("k", "name", "v")
    val merged = graft.ops.Joins.upsert(target, batch, Seq("k"))
    val got = merged.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(got == Set((1L, "a", 10.0), (3L, "c", 30.0), (2L, "b2", 99.0), (9L, "new", 0.0)))
    // the target side must stream: no shuffle exchange in the plan
    val plan = merged.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"upsert must not shuffle the target:\n$plan")
    val acts = graft.ops.Joins.upsertWithAction(target, batch, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(acts == Map(1L -> "kept", 3L -> "kept", 2L -> "updated", 9L -> "inserted"))
  }

  test("robustOutliers flags a spike the median/MAD way and keeps the bulk") {
    import spark.implicits._
    val df = (1 to 20).map(i => ("a", i.toLong, 10.0 + (i % 3))) :+ (("a", 21L, 500.0))
    val out = graft.ops.TimeSeries.robustOutliers(
        df.toDF("g", "t", "v"), Seq("g"), "v", k = 3.0)
      .collect().map(r => r.getLong(1) -> r.getBoolean(6)).toMap
    assert(out(21L), "the 500.0 spike must be flagged")
    assert((1 to 20).forall(i => !out(i.toLong)), "bulk points must not be flagged")
  }

  test("holt tracks a perfect linear trend exactly and damps a level shift") {
    import spark.implicits._
    // perfect trend 10,12,14,16: level locks to the last value, trend to
    // the slope, forecasts extrapolate the line exactly (closed form:
    // alpha*v + (1-alpha)*(l+t) = v when l+t = v)
    val lin = Seq(("a", 1L, 10.0), ("a", 2L, 12.0), ("a", 3L, 14.0), ("a", 4L, 16.0))
      .toDF("g", "t", "v")
    val r = graft.ops.TimeSeries.holt(lin, Seq("g"), "t", "v",
      alpha = 0.5, beta = 0.25, horizon = 3).head()
    assert(r.getAs[Long]("n_points") == 4L)
    assert(r.getAs[Double]("level") == 16.0 && r.getAs[Double]("trend") == 2.0)
    assert(r.getAs[scala.collection.Seq[Double]]("forecast") == Seq(18.0, 20.0, 22.0))

    // level shift 10,10,20: hand-computed l=15, t=1.25, f1=16.25
    val shift = Seq(("a", 1L, 10.0), ("a", 2L, 10.0), ("a", 3L, 20.0)).toDF("g", "t", "v")
    val r2 = graft.ops.TimeSeries.holt(shift, Seq("g"), "t", "v",
      alpha = 0.5, beta = 0.25, horizon = 1).head()
    assert(r2.getAs[Double]("level") == 15.0 && r2.getAs[Double]("trend") == 1.25)
    assert(r2.getAs[scala.collection.Seq[Double]]("forecast") == Seq(16.25))

    // a 1-point series has no trend: null level/trend by contract
    val one = Seq(("a", 1L, 10.0)).toDF("g", "t", "v")
    val r3 = graft.ops.TimeSeries.holt(one, Seq("g"), "t", "v",
      alpha = 0.5, beta = 0.25, horizon = 1).head()
    assert(r3.isNullAt(r3.fieldIndex("level")) && r3.isNullAt(r3.fieldIndex("trend")))
  }

  test("holtWinters locks exactly onto constant and pure-seasonal series") {
    import spark.implicits._
    // constant series: level c, zero trend, zero seasonal -> forecasts = c
    val const = (1 to 10).map(i => ("a", i.toLong, 7.0)).toDF("g", "t", "v")
    val r = graft.ops.TimeSeries.holtWinters(const, Seq("g"), "t", "v",
      alpha = 0.5, beta = 0.25, gamma = 0.25, m = 2, horizon = 2).head()
    assert(r.getAs[Long]("n_points") == 10L)
    assert(r.getAs[Double]("level") == 7.0 && r.getAs[Double]("trend") == 0.0)
    assert(r.getAs[Double]("f1") == 7.0 && r.getAs[Double]("f2") == 7.0)

    // pure seasonal (period 2, zero trend): v alternates c-d, c+d starting
    // at odd t -> init l0=c, t0=0, s=[-d,+d]; every update is a fixpoint,
    // so f1 continues the alternation exactly
    val (c, d) = (10.0, 3.0)
    val seas = (1 to 9).map(i =>
      ("a", i.toLong, if (i % 2 == 1) c - d else c + d)).toDF("g", "t", "v")
    val r2 = graft.ops.TimeSeries.holtWinters(seas, Seq("g"), "t", "v",
      alpha = 0.5, beta = 0.25, gamma = 0.25, m = 2, horizon = 2).head()
    assert(r2.getAs[Double]("level") == c && r2.getAs[Double]("trend") == 0.0)
    // 9 points end on an odd (c-d) slot; next is even -> c+d, then c-d
    assert(r2.getAs[Double]("f1") == c + d && r2.getAs[Double]("f2") == c - d)

    // fewer than 2m+1 points: null level/trend/forecasts by contract
    val short = (1 to 4).map(i => ("a", i.toLong, 1.0)).toDF("g", "t", "v")
    val r3 = graft.ops.TimeSeries.holtWinters(short, Seq("g"), "t", "v",
      alpha = 0.5, beta = 0.25, gamma = 0.25, m = 2, horizon = 1).head()
    assert(r3.isNullAt(r3.fieldIndex("level")) && r3.isNullAt(r3.fieldIndex("f1")))
  }

  test("snapshotDiff classifies added/removed/changed and omits unchanged") {
    import spark.implicits._
    val old = Seq((1L, "a", 1.0), (2L, "b", 2.0), (3L, "c", 3.0)).toDF("k", "s", "v")
    val nu = Seq((1L, "a", 1.0), (2L, "b", 9.0), (4L, "d", 4.0)).toDF("k", "s", "v")
    val got = graft.ops.Joins.snapshotDiff(old, nu, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(2L -> "changed", 3L -> "removed", 4L -> "added"))
    // null-safe compare: null -> value and value -> null are both changes
    val o2 = Seq((1L, Option.empty[String]), (2L, Option("x"))).toDF("k", "s")
    val n2 = Seq((1L, Option("y")), (2L, Option.empty[String])).toDF("k", "s")
    val g2 = graft.ops.Joins.snapshotDiff(o2, n2, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(g2 == Map(1L -> "changed", 2L -> "changed"))
  }

  test("zOrderKey matches a reference Morton encoding; layout ranges are disjoint") {
    import spark.implicits._
    def morton(x: Long, y: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L) { (acc, i) =>
        acc + (((x >> i) & 1L) << (2 * i + 1)) + (((y >> i) & 1L) << (2 * i))
      }
    val pts = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (65535L, 65535L),
      (12345L, 54321L), (40000L, 1L))
    val df = pts.toDF("x", "y")
    val got = df.select(col("x"), col("y"),
        graft.ops.Layout.zOrderKey(Seq(col("x"), col("y")), 16).alias("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    pts.foreach { case (x, y) =>
      assert(got((x, y)) == morton(x, y, 16), s"($x,$y)")
    }
    // layout: range partitions must hold disjoint, ordered z-ranges
    val orders = graft.sources.Tables.orders(spark, sf001)
    val z = graft.ops.Layout.zOrderKey(Seq(
      pmod(col("o_custkey"), lit(65536L)),
      pmod(col("o_orderkey"), lit(65536L))), 16)
    val laid = graft.ops.Layout.zOrderLayout(orders.withColumn("zv", z), col("zv"), 8)
    val ranges = laid
      .select(org.apache.spark.sql.functions.spark_partition_id().alias("p"), col("zv"))
      .groupBy("p").agg(min("zv").alias("lo"), max("zv").alias("hi"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, _, hi1), (_, lo2, _)) => assert(hi1 <= lo2, ranges.mkString(","))
      case _ => ()
    }
  }

  test("tombstone cascade leaves no dangling references and matches the audit") {
    import graft.ops.Redaction
    val cust = graft.sources.Tables.customer(spark, sf001)
    val ord = graft.sources.Tables.orders(spark, sf001)
    val li = graft.sources.Tables.lineitem(spark, sf001)
    val tomb = cust.filter(col("c_custkey") % 13 === 5)
      .select(col("c_custkey").alias("key"))
    val custAfter = Redaction.dropTombstoned(cust, col("c_custkey"), tomb)
    val ordAfter = Redaction.dropTombstoned(ord, col("o_custkey"), tomb)
    val delOrders = ord.join(broadcast(tomb), col("o_custkey") === col("key"), "left_semi")
      .select("o_orderkey")
    val liAfter = Redaction.dropTombstoned(li, col("l_orderkey"), delOrders,
      broadcastTombstones = false)
    // no scrubbed order references a deleted customer; no scrubbed lineitem
    // references a deleted order
    assert(ordAfter.join(broadcast(tomb), col("o_custkey") === col("key"), "left_semi")
      .count() == 0)
    assert(liAfter.join(ordAfter, col("l_orderkey") === ordAfter("o_orderkey"),
      "left_anti").count() == 0)
    // audit counts agree with the scrubbed frames
    val audit = Redaction.tombstoneAudit(Seq(
      ("customer", cust, col("c_custkey"), tomb, true),
      ("orders", ord, col("o_custkey"), tomb, true),
      ("lineitem", li, col("l_orderkey"), delOrders, false)))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(audit("customer")._2 == custAfter.count())
    assert(audit("orders")._2 == ordAfter.count())
    assert(audit("lineitem")._2 == liAfter.count())
    assert(audit.values.forall { case (b, a, dltd) => b == a + dltd })
  }

  test("intervalOverlapJoin emits each overlapping pair exactly once (claim-bin rule)") {
    import java.sql.Timestamp
    import spark.implicits._
    def t(m: Long) = new Timestamp(m * 60000L)
    // long intervals spanning many shared bins — the dedup trap
    val a = Seq((1L, t(0), t(500)), (2L, t(100), t(120)), (3L, t(600), t(610)))
      .toDF("a_id", "a_start", "a_end")
    val b = Seq((10L, t(50), t(450)), (11L, t(115), t(117)), (12L, t(599), t(601)))
      .toDF("b_id", "b_start", "b_end")
    val got = graft.ops.Joins.intervalOverlapJoin(a, b,
        "a_start", "a_end", "b_start", "b_end", binSeconds = 600)
      .select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = a.crossJoin(b)
      .filter(col("a_start") < col("b_end") && col("b_start") < col("a_end"))
      .select("a_id", "b_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.sorted.toSeq == brute.sorted.toSeq, "pair multiset must match brute force")
    assert(got.length == got.distinct.length, "no pair may be emitted twice")
    assert(got.toSet == Set((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L), (3L, 12L)))
  }

  test("rollup emits leaf, subtotal, and grand-total rows") {
    val out = SparkEntry.queries("q29_rollup")(spark, sf001)
    val rows = out.collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length == 1)
    assert(grand.head.getAs[Long]("customers") == 150L)
    val perNation = rows.filter(r => !r.isNullAt(0) && r.isNullAt(1))
    assert(perNation.map(_.getAs[Long]("customers")).sum == 150L)
  }

  test("kaplanMeier matches the textbook product-limit example") {
    import spark.implicits._
    // durations/observed: 1+, 2c, 3+, 3+, 4c  (+ = event, c = censored)
    // t=1: n=5, d=1 → f=0.8; t=3: n=3, d=2 → f=1/3
    // S(1)=0.8; S(3)=0.8·(1/3)=0.266666667; censor times emit no row
    val subjects = Seq(
      (0L, 1L, true), (0L, 2L, false), (0L, 3L, true), (0L, 3L, true),
      (0L, 4L, false)).toDF("cohort", "dur", "obs")
    val km = graft.ops.TimeSeries.kaplanMeier(subjects, Seq("cohort"), "dur", "obs")
      .orderBy("dur").as[(Long, Long, Long, Long, Double)].collect()
    assert(km.toSeq == Seq(
      (0L, 1L, 5L, 1L, 0.8),
      (0L, 3L, 3L, 2L, 0.266666667)))
  }

  test("kaplanMeier: censoring thins the risk set without a factor") {
    import spark.implicits._
    // two cohorts; cohort 1 has an early censor that must shrink n at t=5
    val subjects = Seq(
      (1L, 2L, false), (1L, 5L, true), (1L, 5L, true), (1L, 7L, false),
      (2L, 1L, true)).toDF("cohort", "dur", "obs")
    val km = graft.ops.TimeSeries.kaplanMeier(subjects, Seq("cohort"), "dur", "obs")
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    // cohort 1, t=5: risk set {5,5,7} = 3 (the t=2 censor already left)
    // S = (3-2)/3 = 1/3 → 0.333333333
    assert(km == Set(
      (1L, 5L, 3L, 2L, 0.333333333),
      (2L, 1L, 1L, 1L, 0.0)))
  }
}
