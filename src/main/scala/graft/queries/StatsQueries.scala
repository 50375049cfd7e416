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
             |FROM dd""".stripMargin))
  )
}
