package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.sources.Tables
import graft.ops.Aggregations.countIf

/** Statistics / model-evaluation tier (q202-q205): every statistic here
  * is computed EXACTLY — integer counts, tie-aware integer midranks, and
  * cross-multiplied fractions that defer the single double division to
  * the last step — so the oracles gate the algorithms, not a tolerance.
  */
object StatsQueries {

  private val evCte =
    """ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props
      |       FROM events)""".stripMargin

  val all: Seq[QueryDef] = Seq(

    // First-order Markov next-event model EVALUATED in-corpus (the
    // composition q168's transition matrix feeds): predicted next event
    // = argmax transition count per previous type (ties → lexicographic
    // smallest — a total rule), top-1 accuracy per previous type. The
    // model frame is event-type-sized and broadcasts; integer counts
    // until one division.
    QueryDef("q202_markov_accuracy",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val t = Tables.events(s, d)
          .withColumn("prev", lag(col("event_type"), 1).over(w))
          .filter(col("prev").isNotNull)
          .select(col("prev"), col("event_type"))
        val counts = t.groupBy(col("prev"), col("event_type"))
          .agg(count(lit(1)).alias("n"))
        val model = counts
          .withColumn("__rn", row_number().over(
            Window.partitionBy(col("prev"))
              .orderBy(col("n").desc, col("event_type"))))
          .filter(col("__rn") === 1)
          .select(col("prev"), col("event_type").alias("pred"))
        t.join(broadcast(model), Seq("prev"))
          .groupBy(col("prev"))
          .agg(count(lit(1)).alias("n_transitions"),
            countIf(col("event_type") === col("pred")).alias("n_correct"))
          .select(col("prev"), col("n_transitions"), col("n_correct"),
            round(col("n_correct").cast(DoubleType) / col("n_transitions"), 6)
              .alias("accuracy"))
      },
      Some(s"""WITH $evCte,
              |t AS (
              |  SELECT user_id, event_type,
              |    lag(event_type) OVER (PARTITION BY user_id
              |      ORDER BY ts, event_id) AS prev
              |  FROM ev),
              |tt AS (SELECT prev, event_type FROM t WHERE prev IS NOT NULL),
              |c AS (SELECT prev, event_type, COUNT(*) AS n FROM tt GROUP BY 1, 2),
              |m AS (
              |  SELECT prev, event_type AS pred FROM (
              |    SELECT prev, event_type,
              |      row_number() OVER (PARTITION BY prev
              |        ORDER BY n DESC, event_type) AS rn
              |    FROM c) WHERE rn = 1)
              |SELECT tt.prev, COUNT(*) AS n_transitions,
              |  CAST(SUM(CASE WHEN tt.event_type = m.pred THEN 1 ELSE 0 END)
              |       AS BIGINT) AS n_correct,
              |  round(CAST(SUM(CASE WHEN tt.event_type = m.pred THEN 1 ELSE 0 END)
              |        AS DOUBLE) / COUNT(*), 6) AS accuracy
              |FROM tt JOIN m USING (prev)
              |GROUP BY tt.prev""".stripMargin)),

    // Decile lift / gains table — the campaign-targeting evaluation:
    // customers ranked by balance into exact equal-frequency deciles
    // (q161's mergeable-percentile discipline — never a global ntile
    // sort), response = has an open order; per-decile response rate and
    // lift vs the overall rate. Margins are window sums over the 10-row
    // decile frame, not the data.
    QueryDef("q203_decile_lift",
      (s, d) => {
        val resp = Tables.orders(s, d).filter(col("o_orderstatus") === "O")
          .select(col("o_custkey")).distinct()
          .withColumn("__resp", lit(1L))
        val scored = Tables.customer(s, d)
          .select(col("c_custkey"), col("c_acctbal"))
          .join(resp, col("c_custkey") === col("o_custkey"), "left")
          .select(col("c_custkey"), col("c_acctbal"),
            coalesce(col("__resp"), lit(0L)).alias("resp"))
        val deciles = graft.ops.Profiling.binEqualFreq(scored, "c_acctbal", 10)
        val cells = deciles.groupBy(col("bin"))
          .agg(count(lit(1)).alias("n"), sum(col("resp")).alias("responders"))
        val tn = sum(col("n")).over(Window.partitionBy())
        val tr = sum(col("responders")).over(Window.partitionBy())
        cells.select(col("bin"), col("n"), col("responders"),
            round(col("responders").cast(DoubleType) / col("n"), 6).alias("rate"),
            round(col("responders").cast(DoubleType) * tn / (col("n") * tr), 6)
              .alias("lift"))
      },
      Some("""WITH resp AS (
             |  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'),
             |scored AS (
             |  SELECT c_custkey, c_acctbal,
             |    CASE WHEN o_custkey IS NULL THEN 0 ELSE 1 END AS resp
             |  FROM customer LEFT JOIN resp ON c_custkey = o_custkey),
             |b AS (
             |  SELECT list_transform(
             |    quantile_cont(CAST(c_acctbal AS DOUBLE),
             |      [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]),
             |    q -> round(q, 6)) AS bounds
             |  FROM scored),
             |cells AS (
             |  SELECT CAST(1 + len(list_filter(b.bounds,
             |      x -> CAST(c_acctbal AS DOUBLE) > x)) AS BIGINT) AS bin,
             |    COUNT(*) AS n, CAST(SUM(resp) AS BIGINT) AS responders
             |  FROM scored, b GROUP BY 1),
             |w AS (
             |  SELECT bin, n, responders,
             |    CAST(SUM(n) OVER () AS BIGINT) AS tn,
             |    CAST(SUM(responders) OVER () AS BIGINT) AS tr
             |  FROM cells)
             |SELECT bin, n, responders,
             |  round(CAST(responders AS DOUBLE) / n, 6) AS rate,
             |  round(CAST(responders AS DOUBLE) * tn / (n * tr), 6) AS lift
             |FROM w""".stripMargin)),

    // Two-sample Kolmogorov–Smirnov statistic, EXACT: D = max |F₁−F₂|
    // evaluated as the integer max of |c₁·n₂ − c₂·n₁| over the merged
    // distinct-value frame (cross-multiplication keeps the sup in
    // integer arithmetic; the single division happens once, at the end).
    // CDF running sums are windows over the distinct-VALUE frame, never
    // the data.
    QueryDef("q204_ks_test",
      (s, d) => {
        val c = Tables.customer(s, d)
          .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        val cells = c.groupBy(col("c_acctbal").alias("v"))
          .agg(countIf(col("c_mktsegment") === "BUILDING").alias("a"),
            countIf(col("c_mktsegment") === "MACHINERY").alias("b"))
        val wv = Window.orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wall = Window.partitionBy()
        val cum = cells
          .withColumn("ca", sum(col("a")).over(wv))
          .withColumn("cb", sum(col("b")).over(wv))
          .withColumn("na", sum(col("a")).over(wall))
          .withColumn("nb", sum(col("b")).over(wall))
        cum.select(col("ca") * col("nb") - col("cb") * col("na"), col("na"),
            col("nb"))
          .toDF("__diff", "na", "nb")
          .groupBy(col("na").alias("n_building"), col("nb").alias("n_machinery"))
          .agg(max(abs(col("__diff"))).alias("d_scaled"))
          .select(col("n_building"), col("n_machinery"), col("d_scaled"),
            round(col("d_scaled").cast(DoubleType) /
              (col("n_building") * col("n_machinery")), 6).alias("ks_stat"))
      },
      Some("""WITH c AS (
             |  SELECT c_acctbal AS v, c_mktsegment FROM customer
             |  WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
             |cells AS (
             |  SELECT v,
             |    CAST(SUM(CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END)
             |         AS BIGINT) AS a,
             |    CAST(SUM(CASE WHEN c_mktsegment = 'MACHINERY' THEN 1 ELSE 0 END)
             |         AS BIGINT) AS b
             |  FROM c GROUP BY v),
             |cum AS (
             |  SELECT
             |    CAST(SUM(a) OVER (ORDER BY v
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ca,
             |    CAST(SUM(b) OVER (ORDER BY v
             |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cb,
             |    CAST(SUM(a) OVER () AS BIGINT) AS na,
             |    CAST(SUM(b) OVER () AS BIGINT) AS nb
             |  FROM cells)
             |SELECT na AS n_building, nb AS n_machinery,
             |  CAST(MAX(abs(ca * nb - cb * na)) AS BIGINT) AS d_scaled,
             |  round(CAST(MAX(abs(ca * nb - cb * na)) AS DOUBLE) / (na * nb), 6)
             |    AS ks_stat
             |FROM cum GROUP BY na, nb""".stripMargin)),

    // Spearman rank correlation per return flag: tie-aware integer
    // midranks (the q200 2·midrank trick — 2r = 2·rank + ties − 1 stays
    // integral; the factor 2 cancels in the correlation), then Pearson
    // on the doubled ranks from exact decimal moments (q152's chain).
    // The rank windows are per-group — the exact-ranking caveat of q200
    // applies (a hot group sorts in one task; the grouped form bounds it).
    QueryDef("q205_spearman_rho",
      (s, d) => {
        def midrank2(v: String, out: String) = (df: org.apache.spark.sql.DataFrame) =>
          df.withColumn(out,
            lit(2L) * rank().over(Window.partitionBy(col("l_returnflag"))
              .orderBy(col(v))).cast(LongType) +
              count(lit(1)).over(Window.partitionBy(col("l_returnflag"), col(v)))
              - 1L)
        val base = Tables.lineitem(s, d)
          .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
        val ranked = midrank2("l_extendedprice", "ry")(
          midrank2("l_quantity", "rx")(base))
        import org.apache.spark.sql.types.DecimalType
        val Acc = DecimalType(30, 8)
        val x = col("rx"); val y = col("ry")
        val m = ranked.groupBy(col("l_returnflag"))
          .agg(count(lit(1)).alias("n"),
            sum(x.cast(Acc)).alias("__sx"), sum((x * x).cast(Acc)).alias("__sx2"),
            sum(y.cast(Acc)).alias("__sy"), sum((y * y).cast(Acc)).alias("__sy2"),
            sum((x * y).cast(Acc)).alias("__sxy"))
        val n = col("n").cast(DoubleType)
        def D(c: String) = col(c).cast(DoubleType)
        val vx = D("__sx2") / n - (D("__sx") / n) * (D("__sx") / n)
        val vy = D("__sy2") / n - (D("__sy") / n) * (D("__sy") / n)
        val cov = D("__sxy") / n - (D("__sx") / n) * (D("__sy") / n)
        m.select(col("l_returnflag"), col("n"),
          round(when(vx > 0 && vy > 0, cov / sqrt(vx * vy)), 6).alias("rho"))
      },
      Some("""WITH r AS (
             |  SELECT l_returnflag,
             |    2 * CAST(rank() OVER (PARTITION BY l_returnflag
             |          ORDER BY l_quantity) AS BIGINT)
             |      + CAST(COUNT(*) OVER (PARTITION BY l_returnflag, l_quantity)
             |          AS BIGINT) - 1 AS rx,
             |    2 * CAST(rank() OVER (PARTITION BY l_returnflag
             |          ORDER BY l_extendedprice) AS BIGINT)
             |      + CAST(COUNT(*) OVER (PARTITION BY l_returnflag, l_extendedprice)
             |          AS BIGINT) - 1 AS ry
             |  FROM lineitem),
             |m AS (
             |  SELECT l_returnflag, COUNT(*) AS n,
             |    CAST(CAST(SUM(CAST(rx AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS sx,
             |    CAST(CAST(SUM(CAST(rx * rx AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS sx2,
             |    CAST(CAST(SUM(CAST(ry AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS sy,
             |    CAST(CAST(SUM(CAST(ry * ry AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS sy2,
             |    CAST(CAST(SUM(CAST(rx * ry AS DECIMAL(30,8))) AS VARCHAR) AS DOUBLE) AS sxy
             |  FROM r GROUP BY 1),
             |dd AS (
             |  SELECT l_returnflag, n,
             |    sx2 / CAST(n AS DOUBLE) - (sx / CAST(n AS DOUBLE)) * (sx / CAST(n AS DOUBLE)) AS vx,
             |    sy2 / CAST(n AS DOUBLE) - (sy / CAST(n AS DOUBLE)) * (sy / CAST(n AS DOUBLE)) AS vy,
             |    sxy / CAST(n AS DOUBLE) - (sx / CAST(n AS DOUBLE)) * (sy / CAST(n AS DOUBLE)) AS cov
             |  FROM m)
             |SELECT l_returnflag, n,
             |  round(CASE WHEN vx > 0 AND vy > 0 THEN cov / sqrt(vx * vy) END, 6)
             |    AS rho
             |FROM dd""".stripMargin)),

    // CUPED variance reduction (the experimentation-platform adjustment):
    // per-customer PRE-period spend is the covariate, θ = cov(pre, post)
    // / var(pre) fitted GLOBALLY (1-row decimal-moment frame, broadcast),
    // adjusted metric = post − θ·(pre − μ_pre). Per-segment means and
    // variances of raw vs adjusted spend; var_ratio < 1 is the read-
    // faster payoff when the covariate correlates (the synthetic fixture
    // draws pre and post independently, so its ratio sits at ~1 — the
    // MECHANISM is what the hash gates). θ/μ ride the q152 moment chain;
    // the adjusted column is the identical double expression both
    // engines.
    QueryDef("q207_cuped_adjustment",
      (s, d) => {
        import graft.ops.Aggregations.exactSum
        import org.apache.spark.sql.types.DecimalType
        val Acc = DecimalType(30, 8)
        val cut = to_timestamp(lit("1997-01-01 00:00:00"))
        val o = Tables.orders(s, d)
        val per = o.groupBy(col("o_custkey"))
          .agg(
            coalesce(exactSum(when(col("o_orderdate") < cut,
              col("o_totalprice"))), lit(0.0)).alias("pre"),
            coalesce(exactSum(when(col("o_orderdate") >= cut,
              col("o_totalprice"))), lit(0.0)).alias("post"))
        val m = per.agg(count(lit(1)).alias("__n"),
          sum(col("pre").cast(Acc)).alias("__sp"),
          sum((col("pre") * col("pre")).cast(Acc)).alias("__sp2"),
          sum(col("post").cast(Acc)).alias("__sq"),
          sum((col("pre") * col("post")).cast(Acc)).alias("__spq"))
        val n = col("__n").cast(DoubleType)
        val muPre = col("__sp").cast(DoubleType) / n
        val varPre = col("__sp2").cast(DoubleType) / n - muPre * muPre
        val covPQ = col("__spq").cast(DoubleType) / n -
          muPre * (col("__sq").cast(DoubleType) / n)
        val theta = covPQ / varPre
        val adj = per.crossJoin(broadcast(m))
          .withColumn("adj", col("post") - theta * (col("pre") - muPre))
          .select(col("o_custkey"), col("pre"), col("post"), col("adj"))
        val seg = adj.join(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        val g = seg.groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).alias("n"),
            sum(col("post").cast(Acc)).cast(DoubleType).alias("__sq"),
            sum((col("post") * col("post")).cast(Acc)).cast(DoubleType)
              .alias("__sq2"),
            sum(col("adj").cast(Acc)).cast(DoubleType).alias("__sa"),
            sum((col("adj") * col("adj")).cast(Acc)).cast(DoubleType)
              .alias("__sa2"))
        val gn = col("n").cast(DoubleType)
        val varPost = col("__sq2") / gn - (col("__sq") / gn) * (col("__sq") / gn)
        val varAdj = col("__sa2") / gn - (col("__sa") / gn) * (col("__sa") / gn)
        g.select(col("c_mktsegment"), col("n"),
          round(col("__sq") / gn, 6).alias("mean_post"),
          round(col("__sa") / gn, 6).alias("mean_adj"),
          round(varPost, 6).alias("var_post"),
          round(varAdj, 6).alias("var_adj"),
          round(when(varPost > 0, varAdj / varPost), 6).alias("var_ratio"))
      },
      Some {
        // the inner CAST goes through VARCHAR: Spark decimal-izes a
        // double from its SHORTEST decimal repr, DuckDB's native cast
        // from the exact binary expansion — for magnitudes ≳1e10 the
        // shortest repr runs out before scale 8 and the two casts differ
        // in the last decimal ulp (measured on adj² ≈ 4e12); the
        // varchar hop reproduces Spark's path exactly
        def dec(x: String) =
          s"CAST(CAST(SUM(CAST(CAST(($x) AS VARCHAR) AS DECIMAL(30,8)))" +
            " AS VARCHAR) AS DOUBLE)"
        s"""WITH per AS (
           |  SELECT o_custkey,
           |    coalesce(CAST(CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
           |      THEN CAST(o_totalprice AS DECIMAL(30,8)) END) AS VARCHAR) AS DOUBLE), 0.0) AS pre,
           |    coalesce(CAST(CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
           |      THEN CAST(o_totalprice AS DECIMAL(30,8)) END) AS VARCHAR) AS DOUBLE), 0.0) AS post
           |  FROM orders GROUP BY o_custkey),
           |m AS (
           |  SELECT COUNT(*) AS n, ${dec("pre")} AS sp, ${dec("pre * pre")} AS sp2,
           |    ${dec("post")} AS sq, ${dec("pre * post")} AS spq
           |  FROM per),
           |adj AS (
           |  SELECT o_custkey, pre, post,
           |    post - ((spq / CAST(n AS DOUBLE) - (sp / CAST(n AS DOUBLE)) * (sq / CAST(n AS DOUBLE)))
           |            / (sp2 / CAST(n AS DOUBLE) - (sp / CAST(n AS DOUBLE)) * (sp / CAST(n AS DOUBLE))))
           |           * (pre - sp / CAST(n AS DOUBLE)) AS adj
           |  FROM per, m),
           |seg AS (
           |  SELECT c_mktsegment, pre, post, adj
           |  FROM adj JOIN customer ON o_custkey = c_custkey),
           |g AS (
           |  SELECT c_mktsegment, COUNT(*) AS n,
           |    ${dec("post")} AS sq, ${dec("post * post")} AS sq2,
           |    ${dec("adj")} AS sa, ${dec("adj * adj")} AS sa2
           |  FROM seg GROUP BY 1)
           |SELECT c_mktsegment, n,
           |  round(sq / CAST(n AS DOUBLE), 6) AS mean_post,
           |  round(sa / CAST(n AS DOUBLE), 6) AS mean_adj,
           |  round(sq2 / CAST(n AS DOUBLE) - (sq / CAST(n AS DOUBLE)) * (sq / CAST(n AS DOUBLE)), 6)
           |    AS var_post,
           |  round(sa2 / CAST(n AS DOUBLE) - (sa / CAST(n AS DOUBLE)) * (sa / CAST(n AS DOUBLE)), 6)
           |    AS var_adj,
           |  round(CASE WHEN sq2 / CAST(n AS DOUBLE) - (sq / CAST(n AS DOUBLE)) * (sq / CAST(n AS DOUBLE)) > 0
           |        THEN (sa2 / CAST(n AS DOUBLE) - (sa / CAST(n AS DOUBLE)) * (sa / CAST(n AS DOUBLE)))
           |           / (sq2 / CAST(n AS DOUBLE) - (sq / CAST(n AS DOUBLE)) * (sq / CAST(n AS DOUBLE)))
           |        END, 6) AS var_ratio
           |FROM g""".stripMargin
      }),

    // Quantile-drift report (the log-free drift check PSI approximates):
    // decile boundaries fitted on the PRE-1997 price distribution, the
    // POST period binned against them — a stable distribution puts ~10%
    // in every bin, and per-bin share−0.1 localizes the shift. Bounds
    // are one mergeable percentile aggregate broadcast map-side (q161);
    // margins are window sums over the 10-row bin frame.
    QueryDef("q212_quantile_drift",
      (s, d) => {
        val cut = to_timestamp(lit("1997-01-01 00:00:00"))
        val o = Tables.orders(s, d)
        val bounds = o.filter(col("o_orderdate") < cut).agg(expr(
          "transform(percentile(CAST(o_totalprice AS DOUBLE), " +
            "array(0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)), " +
            "q -> round(q, 6))").alias("__b"))
        val binned = o.filter(col("o_orderdate") >= cut)
          .crossJoin(broadcast(bounds))
          .select((lit(1) + size(filter(col("__b"),
            b => col("o_totalprice").cast("double") > b))).cast(LongType)
            .alias("bin"))
        val cells = binned.groupBy(col("bin")).agg(count(lit(1)).alias("n"))
        val tot = sum(col("n")).over(Window.partitionBy())
        cells.select(col("bin"), col("n"),
          round(col("n").cast(DoubleType) / tot, 6).alias("share"),
          round(col("n").cast(DoubleType) / tot - 0.1, 6).alias("drift"))
      },
      Some("""WITH pre AS (
             |  SELECT CAST(o_totalprice AS DOUBLE) AS v FROM orders
             |  WHERE o_orderdate < TIMESTAMP '1997-01-01 00:00:00'),
             |b AS (
             |  SELECT list_transform(quantile_cont(v,
             |    [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]),
             |    q -> round(q, 6)) AS bounds
             |  FROM pre),
             |post AS (
             |  SELECT CAST(o_totalprice AS DOUBLE) AS v FROM orders
             |  WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'),
             |cells AS (
             |  SELECT CAST(1 + len(list_filter(b.bounds, x -> v > x)) AS BIGINT)
             |    AS bin, COUNT(*) AS n
             |  FROM post, b GROUP BY 1),
             |w AS (SELECT bin, n, CAST(SUM(n) OVER () AS BIGINT) AS tot FROM cells)
             |SELECT bin, n,
             |  round(CAST(n AS DOUBLE) / tot, 6) AS share,
             |  round(CAST(n AS DOUBLE) / tot - 0.1, 6) AS drift
             |FROM w""".stripMargin)),

    // Cohort LTV curve: customers grouped by first-order month, revenue
    // accumulated by cohort AGE in months — the "how much is a January
    // customer worth by month 6" frame. Month arithmetic is exact
    // integers (year·12 + month); cumulative revenue is a decimal window
    // over the (cohort, age) frame, never the fact table.
    QueryDef("q208_cohort_ltv",
      (s, d) => {
        import graft.ops.Aggregations.exactSum
        import org.apache.spark.sql.types.DecimalType
        val o = Tables.orders(s, d)
          .select(col("o_custkey"), col("o_totalprice"),
            (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
              .cast(LongType).alias("__m"))
        val first = o.groupBy(col("o_custkey")).agg(min(col("__m")).alias("__c0"))
        val aged = o.join(first, "o_custkey")
          .groupBy(col("__c0").alias("cohort_month"),
            (col("__m") - col("__c0")).alias("age_months"))
          .agg(countDistinct(col("o_custkey")).alias("active_customers"),
            round(exactSum(col("o_totalprice")), 2).alias("revenue"))
        val w = Window.partitionBy(col("cohort_month")).orderBy(col("age_months"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        aged.withColumn("cum_revenue",
          round(sum(col("revenue").cast(DecimalType(30, 8))).over(w)
            .cast(DoubleType), 2))
      },
      Some("""WITH o AS (
             |  SELECT o_custkey, o_totalprice,
             |    CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS m
             |  FROM orders),
             |f AS (SELECT o_custkey, MIN(m) AS c0 FROM o GROUP BY 1),
             |aged AS (
             |  SELECT f.c0 AS cohort_month, o.m - f.c0 AS age_months,
             |    CAST(COUNT(DISTINCT o.o_custkey) AS BIGINT) AS active_customers,
             |    round(CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,8)))
             |          AS VARCHAR) AS DOUBLE), 2) AS revenue
             |  FROM o JOIN f USING (o_custkey)
             |  GROUP BY 1, 2)
             |SELECT cohort_month, age_months, active_customers, revenue,
             |  round(CAST(CAST(SUM(CAST(revenue AS DECIMAL(30,8))) OVER (
             |    PARTITION BY cohort_month ORDER BY age_months
             |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |    AS VARCHAR) AS DOUBLE), 2) AS cum_revenue
             |FROM aged""".stripMargin))
  )
}
