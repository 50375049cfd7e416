package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch time-series operators over event tables (SURVEY §2.9 extension —
  * the reference models time only as relative-day ints; the `events`
  * fixture adds real timestamps).
  */
object TimeSeries {

  /** Tumbling-window aggregation: truncate `tsCol` to the bucket start and
    * hash-aggregate. Uses `date_trunc` (codegen'd) rather than the struct-
    * producing `window()` so the output is flat and oracle-comparable;
    * semantically identical for tumbling windows aligned to unit boundaries.
    */
  def tumblingAgg(df: DataFrame, tsCol: String, unit: String,
                  groupCols: Seq[String], aggs: Seq[Column]): DataFrame =
    df.withColumn("window_start", date_trunc(unit, col(tsCol)))
      .groupBy((col("window_start") +: groupCols.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)

  /** Gap-fill a tumbling aggregate: emit a row for EVERY bucket of the
    * dense time spine between the corpus min and max bucket (per group),
    * with `fillZero` columns coalesced to 0 on the synthesized rows. The
    * dense-spine join is the standard dashboard/feature-store shape a
    * bare groupBy cannot produce (absent buckets simply don't exist).
    *
    * Scale: the spine is built from ONE 2-value global aggregate
    * (min/max bucket — a broadcastable 1-row frame), sequenced per
    * GROUP with a literal-interval `sequence` + explode: |groups| ×
    * |buckets| narrow rows, no corpus re-scan; the fill join hashes on
    * (bucket, group) against the already-aggregated frame (small), never
    * against raw events.
    */
  def gapFillTumbling(df: DataFrame, tsCol: String, unit: String,
                      groupCols: Seq[String], aggs: Seq[Column],
                      fillZero: Seq[String]): DataFrame = {
    val agged = tumblingAgg(df, tsCol, unit, groupCols, aggs)
    val bounds = agged.agg(
      min(col("window_start")).alias("__lo"), max(col("window_start")).alias("__hi"))
    val groups = agged.select(groupCols.map(col): _*).distinct()
    val spine = groups.crossJoin(broadcast(bounds))
      .select((explode(sequence(col("__lo"), col("__hi"),
          expr(s"INTERVAL 1 $unit"))).alias("window_start") +: groupCols.map(col)): _*)
    val filled = spine.join(agged, "window_start" +: groupCols, "left")
    fillZero.foldLeft(filled) { (acc, c) =>
      acc.withColumn(c, coalesce(col(c), lit(0L)))
    }
  }

  /** Last-observation-carried-forward over a (possibly gap-filled)
    * ordered series: null values of `valCol` take the most recent
    * non-null value of the same group (nulls before the first
    * observation stay null). One per-group window — `last(ignoreNulls)`
    * over the running frame; no self-join, no corpus re-scan.
    */
  def locf(df: DataFrame, groupCols: Seq[String], orderCol: String,
           valCol: String, outCol: String): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(outCol, last(col(valCol), ignoreNulls = true).over(w))
  }

  /** Linear interpolation of nulls between observations (the numeric
    * sibling of [[locf]]): a null `valCol` between two non-null
    * neighbors takes prev + (next − prev) · frac with frac the
    * epoch-microsecond position between their timestamps (exact integer
    * deltas; the one double divide/multiply/add chain is stated
    * identically in the oracle, so results are bit-reproducible).
    * Leading nulls (no previous observation) stay null; trailing nulls
    * (no next observation) carry the last value forward — the LOCF tail.
    * Two per-group windows (backward last + forward first over the same
    * sort), no self-join, no corpus re-scan.
    */
  def interpolateLinear(df: DataFrame, groupCols: Seq[String], tsCol: String,
                        valCol: String, outCol: String): DataFrame = {
    val wb = Window.partitionBy(groupCols.map(col): _*).orderBy(col(tsCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(groupCols.map(col): _*).orderBy(col(tsCol))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val obs = when(col(valCol).isNotNull,
      struct(col(tsCol).alias("t"), col(valCol).alias("v")))
    val prev = last(obs, ignoreNulls = true).over(wb)
    val next = first(obs, ignoreNulls = true).over(wf)
    val frac = (unix_micros(col(tsCol)) - unix_micros(prev("t"))).cast("double") /
      (unix_micros(next("t")) - unix_micros(prev("t")))
    df.withColumn(outCol,
      when(col(valCol).isNotNull, col(valCol))
        .when(prev.isNull, lit(null))
        .when(next.isNull, prev("v"))
        .otherwise(prev("v") + (next("v") - prev("v")) * frac))
  }

  /** Exponentially weighted moving average per group: s_0 = x_0,
    * s_t = alpha·x_t + (1−alpha)·s_{t−1} over the series ordered by
    * `orderCol`. The recurrence is inherently sequential, and the usual
    * window formulation (sum of pow(1−alpha, k)·x terms) leans on libm
    * `pow`, whose last-ulp drift breaks cross-engine exactness — so each
    * emitted value is a LEFT FOLD over its ordered prefix (collect →
    * array_sort on the (order, value) struct → per-element prefix
    * `aggregate`): the identical IEEE multiply/add chain in any engine
    * (DuckDB mirrors it with list_reduce over list_slice). Null values
    * carry the previous state forward.
    *
    * Cost is quadratic in GROUP LENGTH (prefix fold per element) — the
    * op contracts to BOUNDED per-entity series (hundreds-to-thousands of
    * points), the Packing per-bucket-fold posture, NOT a billion-row
    * group; groups parallelize across the cluster.
    */
  def ewma(df: DataFrame, groupCols: Seq[String], orderCol: String,
           valCol: String, alpha: Double, outCol: String): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha in (0,1]: $alpha")
    val pairs = df.groupBy(groupCols.map(col): _*)
      .agg(array_sort(collect_list(struct(col(orderCol).alias("o"),
        col(valCol).alias("v")))).alias("__series"))
    val folded = pairs.withColumn("__out",
      expr(s"""
        transform(__series, (e, i) ->
          struct(e.o AS o,
            aggregate(slice(__series, 1, i + 1), CAST(NULL AS DOUBLE),
              (acc, x) -> CASE WHEN x.v IS NULL THEN acc
                               WHEN acc IS NULL THEN CAST(x.v AS DOUBLE)
                               ELSE $alpha * x.v + ${1 - alpha} * acc END) AS s))
      """))
    folded.select((groupCols.map(col) :+
        explode(col("__out")).alias("__e")): _*)
      .select((groupCols.map(col) :+ col("__e.o").alias(orderCol) :+
        col("__e.s").alias(outCol)): _*)
  }

  /** Holt linear-trend (double exponential) smoothing per group — the
    * trend-aware step past [[ewma]]'s flat forecaster: level and trend
    * are co-updated along the ordered series
    * (`l_i = α·v_i + (1−α)(l+t); t_i = β(l_i−l) + (1−β)t`, initialized
    * `l = v_2, t = v_2 − v_1`), and the h-step-ahead forecast is
    * `l + h·t`. One fold per group (not per element — unlike ewma's
    * prefix emission this keeps only the final state), expressed as an
    * `aggregate` HOF whose accumulator is the `[level, trend]` array; the
    * oracle mirrors the identical IEEE chain with `list_reduce` carrying
    * the same 2-element list (the BPE single-element-list discipline).
    * α/β must be dyadic rationals (0.5, 0.25, …) so the interpolated
    * literals are exact in both engines. Groups with fewer than 2 points
    * yield null level/trend/forecast (a trend needs two observations).
    * Same bounded-series contract as [[ewma]]; here the fold is LINEAR in
    * group length.
    */
  def holt(df: DataFrame, groupCols: Seq[String], orderCol: String,
           valCol: String, alpha: Double, beta: Double,
           horizon: Int): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha in (0,1]: $alpha")
    require(beta > 0.0 && beta <= 1.0, s"beta in (0,1]: $beta")
    require(horizon >= 1, s"horizon >= 1: $horizon")
    val (a, b) = (alpha, beta)
    val pairs = df.filter(col(valCol).isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(array_sort(collect_list(struct(col(orderCol).alias("o"),
        col(valCol).alias("v")))).alias("__series"))
    pairs
      .withColumn("__vs", expr("transform(__series, e -> CAST(e.v AS DOUBLE))"))
      .withColumn("__acc", expr(s"""
        CASE WHEN size(__vs) >= 2 THEN
          aggregate(slice(__vs, 2, size(__vs) - 1),
            array(element_at(__vs, 1)),
            (acc, x) -> CASE WHEN size(acc) = 1
              THEN array(x, x - element_at(acc, 1))
              ELSE array(
                $a * x + ${1 - a} * (element_at(acc, 1) + element_at(acc, 2)),
                $b * (($a * x + ${1 - a} * (element_at(acc, 1) + element_at(acc, 2)))
                      - element_at(acc, 1)) + ${1 - b} * element_at(acc, 2))
              END)
        END"""))
      .select(groupCols.map(col) ++ Seq(
        size(col("__vs")).cast("long").alias("n_points"),
        round(element_at(col("__acc"), 1), 6).alias("level"),
        round(element_at(col("__acc"), 2), 6).alias("trend"),
        expr(s"""transform(sequence(1, $horizon), h ->
          round(element_at(__acc, 1) + h * element_at(__acc, 2), 6))""")
          .alias("forecast")): _*)
  }

  /** Holt-Winters ADDITIVE-SEASONAL smoothing per group — [[holt]] plus a
    * season-length-`m` additive index (the hourly-series forecaster that
    * q210's static seasonality profile approximates). Textbook init over
    * the first two seasons (`l = mean(season 1)`,
    * `t = (mean(season 2) − mean(season 1))/m`, `s_i = v_i − l`), then one
    * LINEAR fold from element m+1 carrying `[i, l, t, s_1..s_m]` as the
    * accumulator array:
    * `l' = α(v−s_old) + (1−α)(l+t); t' = β(l'−l) + (1−β)t;
    *  s' = γ(v−l') + (1−γ)s_old`. Forecast h steps out:
    * `l + h·t + s_{((n+h−1) mod m)+1}`.
    *
    * The oracle replays the identical IEEE chain with `list_reduce`
    * seeded by prepending the init accumulator (the BPE discipline);
    * α/β/γ must be dyadic so interpolated literals are exact in both
    * engines. Groups with fewer than 2m+1 points yield null level/trend/
    * forecasts (two full seasons initialize, at least one step must
    * fold). Init terms are bound to columns, never inlined (the k^N
    * HOF-duplication lesson). Bounded-series contract as [[ewma]].
    */
  def holtWinters(df: DataFrame, groupCols: Seq[String], orderCol: String,
                  valCol: String, alpha: Double, beta: Double, gamma: Double,
                  m: Int, horizon: Int): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha in (0,1]: $alpha")
    require(beta > 0.0 && beta <= 1.0, s"beta in (0,1]: $beta")
    require(gamma > 0.0 && gamma <= 1.0, s"gamma in (0,1]: $gamma")
    require(m >= 2, s"season length >= 2: $m")
    require(horizon >= 1 && horizon <= m, s"horizon in [1,$m]: $horizon")
    val (a, b, g) = (alpha, beta, gamma)
    // the slot of the NEXT element given last-processed index i (acc[1])
    val slot = s"CAST(4 + pmod(element_at(acc, 1), $m) AS INT)"
    val newL = s"($a * (x - element_at(acc, $slot)) + ${1 - a} * (element_at(acc, 2) + element_at(acc, 3)))"
    val pairs = df.filter(col(valCol).isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(array_sort(collect_list(struct(col(orderCol).alias("o"),
        col(valCol).alias("v")))).alias("__series"))
    val folded = pairs
      .withColumn("__vs", expr("transform(__series, e -> CAST(e.v AS DOUBLE))"))
      .withColumn("__n", size(col("__vs")).cast("long"))
      .withColumn("__l0", expr(
        s"aggregate(slice(__vs, 1, $m), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x) / ${m}.0"))
      .withColumn("__l1", expr(
        s"aggregate(slice(__vs, ${m + 1}, $m), CAST(0.0 AS DOUBLE), (acc, x) -> acc + x) / ${m}.0"))
      .withColumn("__t0", expr(s"(__l1 - __l0) / ${m}.0"))
      .withColumn("__acc0", expr(
        s"concat(array(CAST($m AS DOUBLE), __l0, __t0), transform(slice(__vs, 1, $m), x -> x - __l0))"))
      .withColumn("__acc", expr(s"""
        CASE WHEN size(__vs) >= ${2 * m + 1} THEN
          aggregate(slice(__vs, ${m + 1}, size(__vs) - $m), __acc0,
            (acc, x) -> concat(
              array(
                element_at(acc, 1) + CAST(1.0 AS DOUBLE),
                $newL,
                $b * ($newL - element_at(acc, 2)) + ${1 - b} * element_at(acc, 3)),
              transform(slice(acc, 4, $m), (s, j) ->
                CASE WHEN j = CAST(pmod(element_at(acc, 1), $m) AS INT)
                  THEN $g * (x - $newL) + ${1 - g} * element_at(acc, $slot)
                  ELSE s END)))
        END"""))
    val fcols = (1 to horizon).map { h =>
      expr(s"""round(element_at(__acc, 2) + $h * element_at(__acc, 3)
        + element_at(__acc, CAST(4 + pmod(__n + $h - 1, $m) AS INT)), 6)""")
        .alias(s"f$h")
    }
    folded.select(groupCols.map(col) ++ Seq(
      col("__n").alias("n_points"),
      round(expr("element_at(__acc, 2)"), 6).alias("level"),
      round(expr("element_at(__acc, 3)"), 6).alias("trend")) ++ fcols: _*)
  }

  /** One-sided CUSUM control chart per group: s_0 = 0,
    * s_t = max(0, s_{t−1} + (x_t − target − slack)) — the drift detector
    * that flags sustained upward excursions a point threshold misses
    * (each point adds its overshoot; the max(0) resets on return to
    * normal). Like [[ewma]] the recurrence is inherently sequential and
    * is evaluated as a per-element prefix fold over the ordered group
    * array — identical IEEE add/subtract/max chain in any engine; null
    * values carry the state. Same bounded-group contract as ewma
    * (quadratic in group LENGTH; groups parallelize).
    */
  def cusum(df: DataFrame, groupCols: Seq[String], orderCol: String,
            valCol: String, target: Double, slack: Double,
            outCol: String): DataFrame = {
    val th = target + slack
    val pairs = df.groupBy(groupCols.map(col): _*)
      .agg(array_sort(collect_list(struct(col(orderCol).alias("o"),
        col(valCol).alias("v")))).alias("__series"))
    val folded = pairs.withColumn("__out",
      expr(s"""
        transform(__series, (e, i) ->
          struct(e.o AS o,
            aggregate(slice(__series, 1, i + 1), CAST(0.0 AS DOUBLE),
              (acc, x) -> CASE WHEN x.v IS NULL THEN acc
                               ELSE greatest(CAST(0.0 AS DOUBLE),
                                             acc + (x.v - $th)) END) AS s))
      """))
    folded.select((groupCols.map(col) :+
        explode(col("__out")).alias("__e")): _*)
      .select((groupCols.map(col) :+ col("__e.o").alias(orderCol) :+
        col("__e.s").alias(outCol)): _*)
  }

  /** Per-group discrete differences along the ordered series: previous
    * value, absolute delta, and percent change (null at the first row of
    * each group and where the previous value is 0 — SQL-null, never a
    * division blow-up). One lag window; arithmetic is the same
    * subtract/divide in both engines.
    */
  def deltas(df: DataFrame, groupCols: Seq[String], orderCol: String,
             valCol: String): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(col(orderCol))
    val prev = lag(col(valCol), 1).over(w)
    df.withColumn("prev_value", prev)
      .withColumn("delta", col(valCol) - prev)
      .withColumn("pct_change",
        when(prev.isNotNull && prev =!= 0.0, (col(valCol) - prev) / prev))
  }

  /** Sessionization by inactivity gap: a new session starts when the gap to
    * the previous event of the same `userCol` exceeds `gapSeconds`.
    * session_id is 1-based per user. Gap arithmetic is done on integral
    * epoch-microseconds — exact, so engine-independent.
    *
    * Scale: one shuffle on `userCol` + per-user sort; the running sum reuses
    * the same window ordering (single exchange, single sort).
    */
  def sessionize(df: DataFrame, userCol: String, tsCol: String, gapSeconds: Long,
                 tieBreak: Seq[Column] = Nil): DataFrame = {
    val order = col(tsCol) +: tieBreak
    val w = Window.partitionBy(col(userCol)).orderBy(order: _*)
    val us = unix_micros(col(tsCol))
    val prevUs = lag(us, 1).over(w)
    val isNew = when(prevUs.isNull || (us - prevUs) > gapSeconds * 1000000L, 1L).otherwise(0L)
    df.withColumn("session_id",
      sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Sessionization via Spark's native `session_window` (the Structured
    * Streaming idiom, equally valid in batch): events merge into one
    * session while each starts strictly within `gapSeconds` of the
    * previous window's end. Boundary semantics differ from [[sessionize]]
    * by one instant — a gap of EXACTLY `gapSeconds` starts a new session
    * here (`next < end` merges) but continues one there (`gap > g`
    * splits); real timestamps virtually never land on the boundary, so
    * the two agree in practice and tests cross-check them.
    *
    * Output: one row per session — (userCol, session_start, session_end,
    * n_events), where session_end = last event + gap (the window's close).
    *
    * Scale: same single shuffle on the user key as the lag-gap form; the
    * session merge happens inside Spark's session-window aggregation,
    * which also works under `readStream` with watermarks — this is the
    * operator you lift into streaming unchanged.
    */
  def sessionWindowAgg(df: DataFrame, userCol: String, tsCol: String,
                       gapSeconds: Long): DataFrame =
    df.groupBy(col(userCol), session_window(col(tsCol), s"$gapSeconds seconds"))
      .agg(count(lit(1)).alias("n_events"))
      .select(col(userCol),
        col("session_window.start").alias("session_start"),
        col("session_window.end").alias("session_end"),
        col("n_events"))

  /** Rolling distinct entities per bucket (the DAU/WAU metric): for each
    * day present in the data, the count of DISTINCT `entityCol` values
    * seen in the trailing `windowDays`-day window. Distinct-over-frame is
    * not a window function; the scalable shape is CONTRIBUTION EXPLODE —
    * each event contributes its entity to the `windowDays` day buckets it
    * is visible in (bounded replication), then one hash
    * aggregate per bucket counts distinct. No BNLJ range join, no
    * per-day corpus rescan; a semi join restricts output to days that
    * actually occur.
    */
  def rollingDistinct(df: DataFrame, tsCol: String, entityCol: String,
                      windowDays: Int, outCol: String): DataFrame = {
    require(windowDays >= 1, s"windowDays >= 1: $windowDays")
    val day0 = date_trunc("day", col(tsCol))
    val contrib = df.select(col(entityCol),
      explode(sequence(day0, day0 + expr(s"INTERVAL ${windowDays - 1} DAYS"),
        expr("INTERVAL 1 DAY"))).alias("day"))
    val days = df.select(day0.alias("day")).distinct()
    contrib.join(days, Seq("day"), "left_semi")
      .groupBy(col("day"))
      .agg(countDistinct(col(entityCol)).alias(outCol))
  }

  /** Robust outlier detection on a per-group series: flag points whose
    * absolute deviation from the group MEDIAN exceeds `k` × the median
    * absolute deviation (MAD). Median/MAD resist the masking that breaks
    * mean/stddev z-scores — one genuine spike inflates a stddev enough to
    * hide itself, but barely moves the median.
    *
    * Exactness: median and MAD are exact sort-based percentiles rounded
    * to 6 dp BEFORE the deviation/threshold arithmetic, so both engines
    * run the identical IEEE compare on identical inputs (the q38
    * percentile-parity discipline). Shape: two percentile aggregates over
    * the (already aggregated, group-bounded) series + two broadcast joins
    * of 1-row-per-group frames — nothing rescans or reshuffles the
    * underlying events.
    */
  def robustOutliers(df: DataFrame, groupCols: Seq[String], valCol: String,
                     k: Double): DataFrame = {
    require(k > 0, s"k must be > 0: $k")
    val g = groupCols.map(col)
    val med = df.groupBy(g: _*)
      .agg(round(expr(s"percentile(CAST($valCol AS DOUBLE), 0.5)"), 6).alias("med"))
    val dev = df.join(broadcast(med), groupCols)
      .withColumn("__abs_dev", abs(col(valCol).cast("double") - col("med")))
    val mad = dev.groupBy(g: _*)
      .agg(round(expr("percentile(__abs_dev, 0.5)"), 6).alias("mad"))
    dev.join(broadcast(mad), groupCols)
      .withColumn("abs_dev", round(col("__abs_dev"), 6))
      .withColumn("is_outlier", col("abs_dev") > lit(k) * col("mad"))
      .drop("__abs_dev")
  }

  /** Gaps-and-islands run collapse — the SCD Type-2 history builder:
    * consecutive events of the same `valCol` per `groupCol` collapse into
    * one validity interval (run), with `valid_from` = first occurrence,
    * `valid_to` = the NEXT run's start (null on the open current run),
    * `run_id` 1-based in time order, and the run's event count. A value
    * that recurs after an interruption opens a NEW interval — exactly the
    * type-2 "track history, don't overwrite" contract, and the reason a
    * plain groupBy(user, value) cannot express this.
    *
    * Shape: run boundaries come from ONE window pass over the events
    * (lag + running sum share a single (group, order) sort — one
    * exchange), the run rollup is one hash aggregate, and the run-level
    * lead/row_number windows act on the collapsed frame (runs ≪ events).
    * Order must be total — pass a unique tiebreak column.
    */
  def collapseRuns(df: DataFrame, groupCol: String, tsCol: String,
                   valCol: String, tieBreak: Seq[Column] = Nil): DataFrame = {
    val order = col(tsCol) +: tieBreak
    val w = Window.partitionBy(col(groupCol)).orderBy(order: _*)
    val brk = when(lag(col(valCol), 1).over(w).isNull ||
      lag(col(valCol), 1).over(w) =!= col(valCol), 1L).otherwise(0L)
    val runs = df
      .withColumn("__run0",
        sum(brk).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(groupCol), col(valCol), col("__run0"))
      .agg(min(col(tsCol)).alias("valid_from"),
        count(lit(1)).alias("n_events"))
    // order runs by the break counter, not valid_from: tied timestamps can
    // give two runs the same valid_from, and __run0 is strictly increasing
    // in time order per group (a total order by construction)
    val wr = Window.partitionBy(col(groupCol)).orderBy(col("__run0"))
    runs
      .withColumn("run_id", row_number().over(wr).cast("long"))
      .withColumn("valid_to", lead(col("valid_from"), 1).over(wr))
      .select(col(groupCol), col(valCol), col("run_id"),
        col("valid_from"), col("valid_to"),
        col("valid_to").isNull.alias("is_current"), col("n_events"))
  }

  /** Time-weighted average (TWAP) per group: each observation holds its
    * value until the NEXT observation, so the mean weights each value by
    * its holding interval — the financial/metering average a plain AVG
    * misstates whenever sampling is irregular. Weights are exact integer
    * microseconds (lead-diff), the weighted sum accumulates value·Δt in
    * exact decimal, and the single division happens once at the end —
    * hash-stable at any partition count. The final (open-ended)
    * observation carries no interval and is excluded from the weighted
    * mean (the standard convention) but NOT from `plain_avg`, which is
    * the plain AVG over every observation — so the twap-vs-plain
    * contrast is honest, and single-observation groups still appear
    * (null twap, n_intervals = 0). Order must be total — pass a unique
    * tiebreak.
    */
  def twap(df: DataFrame, groupCols: Seq[String], tsCol: String,
           valCol: String, tieBreak: Seq[Column] = Nil): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(tsCol) +: tieBreak: _*)
    val dt = unix_micros(lead(col(tsCol), 1).over(w)) - unix_micros(col(tsCol))
    df.withColumn("__dt", dt)
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(col("__dt")).alias("n_intervals"),
        sum(col("__dt")).alias("total_us"),
        round(Aggregations.exactSum(
          when(col("__dt").isNotNull, col(valCol) * col("__dt"))) /
          sum(col("__dt")).cast("double"), 6).alias("twap"),
        round(Aggregations.exactAvg(col(valCol)), 6).alias("plain_avg"))
  }

  /** Kaplan–Meier survival curve per group over right-censored duration
    * data: rows are subjects with an integer `durationCol` and a boolean
    * `eventCol` (true = the terminal event was OBSERVED at that duration,
    * false = censored there). For each distinct observed-event time t,
    *
    *   S(t) = Π_{u ≤ t, d_u > 0} (n_u − d_u) / n_u
    *
    * with n_u = subjects still at risk at u (duration ≥ u) and d_u =
    * observed events at u — the standard product-limit estimator;
    * censored subjects leave the risk set without contributing a factor.
    *
    * Shape: one hash aggregate to the (group, duration) frame; the risk
    * set is a suffix SUM over that frame (never the data); the running
    * product is a per-element prefix fold over the ordered per-group
    * factor array ([[ewma]]'s discipline — identical IEEE multiply chain
    * in any engine; a pow/exp-of-Σlog formulation would drift across
    * libm builds). Bounded-group contract: distinct event times per
    * group must fit one row (time grains bound it; groups parallelize).
    */
  def kaplanMeier(df: DataFrame, groupCols: Seq[String], durationCol: String,
                  eventCol: String): DataFrame = {
    val byT = df
      .groupBy((groupCols.map(col) :+ col(durationCol).cast("long").alias("t")): _*)
      .agg(Aggregations.countIf(col(eventCol)).alias("d"),
        count(lit(1)).alias("m"))
    val wDesc = Window.partitionBy(groupCols.map(col): _*).orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val factors = byT
      .withColumn("n", sum(col("m")).over(wDesc))
      .filter(col("d") > 0L)
      .select((groupCols.map(col) :+ col("t") :+ col("n") :+ col("d") :+
        ((col("n") - col("d")).cast("double") / col("n")).alias("f")): _*)
    val series = factors
      .groupBy(groupCols.map(col): _*)
      .agg(array_sort(collect_list(struct(col("t"), col("n"), col("d"),
        col("f")))).alias("__series"))
    val folded = series.withColumn("__out",
      expr("""
        transform(__series, (e, i) ->
          struct(e.t AS t, e.n AS n, e.d AS d,
            aggregate(slice(__series, 1, i + 1), CAST(1.0 AS DOUBLE),
              (acc, x) -> acc * x.f) AS s))
      """))
    folded
      .select((groupCols.map(col) :+ explode(col("__out")).alias("__e")): _*)
      .select((groupCols.map(col) :+ col("__e.t").alias(durationCol) :+
        col("__e.n").alias("n_at_risk") :+ col("__e.d").alias("d_events") :+
        round(col("__e.s"), 9).alias("survival")): _*)
  }

  /** Per-session rollup on top of [[sessionize]]. Duration stays in exact
    * integral microseconds (a fractional-seconds double would round
    * differently across engines).
    */
  def sessionStats(df: DataFrame, userCol: String, tsCol: String, gapSeconds: Long,
                   tieBreak: Seq[Column] = Nil): DataFrame = {
    val s = sessionize(df, userCol, tsCol, gapSeconds, tieBreak)
    s.groupBy(col(userCol), col("session_id"))
      .agg(
        count(lit(1)).alias("n_events"),
        min(col(tsCol)).alias("session_start"),
        (unix_micros(max(col(tsCol))) - unix_micros(min(col(tsCol)))).alias("duration_us"))
  }
}
