package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.sources.Tables
import graft.ops.{TimeSeries, Windows, Aggregations}
import graft.ops.Aggregations.exactSumSql

/** Time-series queries over the `events` fixture (SURVEY §2.5 W1-W2 and the
  * §2.9 batch time-window extension).
  *
  * DuckDB sees `events.ts` at nanosecond precision while Spark reads it
  * truncated to microseconds; every oracle therefore works on a CTE that
  * casts `ts` to microsecond TIMESTAMP first, so both engines see identical
  * values (both casts truncate).
  */
object EventQueries {

  private val evCte =
    """ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props
      |       FROM events)""".stripMargin

  val all: Seq[QueryDef] = Seq(

    // W1: latest event per user (row_number desc, unique tiebreak).
    QueryDef("q20_latest_event_per_user",
      (s, d) => Windows.topOnePerGroup(Tables.events(s, d), Seq("user_id"),
          Seq(col("ts").desc, col("event_id").desc))
        .select(col("user_id"), col("event_id"), col("event_type"), col("value"), col("ts")),
      Some(s"""WITH $evCte
              |SELECT user_id, event_id, event_type, value, ts FROM ev
              |QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id
              |                           ORDER BY ts DESC, event_id DESC) = 1""".stripMargin)),

    // W2: sequence numbering along each user's timeline (nulls-last order).
    QueryDef("q21_event_sequence",
      (s, d) => Windows.sequenceNumber(Tables.events(s, d), Seq("user_id"),
          Seq(col("ts").asc_nulls_last, col("event_id").asc), "seq")
        .select(col("event_id"), col("user_id"), col("ts"), col("seq").cast(LongType)),
      Some(s"""WITH $evCte
              |SELECT event_id, user_id, ts,
              |  CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS seq
              |FROM ev""".stripMargin)),

    // Tumbling-window aggregation (hourly) — batch counterpart of a
    // Structured Streaming windowed agg.
    QueryDef("q22_tumbling_hourly",
      (s, d) => TimeSeries.tumblingAgg(Tables.events(s, d), "ts", "hour",
        Seq("event_type"),
        Seq(count(lit(1)).alias("n_events"),
            Aggregations.exactSum(col("value")).alias("total_value"))),
      Some(s"""WITH $evCte
              |SELECT date_trunc('hour', ts) AS window_start, event_type,
              |  COUNT(*) AS n_events, ${exactSumSql("value")} AS total_value
              |FROM ev GROUP BY 1, 2""".stripMargin)),

    // Sessionization by 30-minute inactivity gap + per-session rollup.
    QueryDef("q23_sessionize",
      (s, d) => TimeSeries.sessionStats(Tables.events(s, d), "user_id", "ts",
        gapSeconds = 1800, tieBreak = Seq(col("event_id"))),
      Some(s"""WITH $evCte,
              |m AS (
              |  SELECT user_id, event_id, ts, epoch_us(ts) AS us,
              |         LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
              |  FROM ev),
              |f AS (
              |  SELECT user_id, event_id, ts,
              |         CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END AS is_new
              |  FROM m),
              |sess AS (
              |  SELECT user_id, ts,
              |         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
              |                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
              |  FROM f)
              |SELECT user_id, session_id, COUNT(*) AS n_events, MIN(ts) AS session_start,
              |       epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us
              |FROM sess GROUP BY user_id, session_id""".stripMargin)),

    // Native session_window (the streaming idiom, run in batch) with a
    // lag-gap SQL mirror: a gap of exactly the threshold starts a new
    // session (>=), the one boundary where session_window and the q23
    // lag-gap form differ.
    QueryDef("q57_session_window",
      (s, d) => TimeSeries.sessionWindowAgg(Tables.events(s, d), "user_id", "ts",
        gapSeconds = 1800),
      Some(s"""WITH $evCte,
              |m AS (
              |  SELECT user_id, event_id, ts, epoch_us(ts) AS us,
              |         LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
              |  FROM ev),
              |f AS (
              |  SELECT user_id, event_id, ts,
              |         CASE WHEN prev_us IS NULL OR us - prev_us >= 1800000000 THEN 1 ELSE 0 END AS is_new
              |  FROM m),
              |sess AS (
              |  SELECT user_id, ts,
              |         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
              |                           ROWS UNBOUNDED PRECEDING) AS sid
              |  FROM f)
              |SELECT user_id, MIN(ts) AS session_start,
              |       MAX(ts) + INTERVAL 1800 SECOND AS session_end,
              |       COUNT(*) AS n_events
              |FROM sess GROUP BY user_id, sid""".stripMargin)),

    // Range join: every event inside a 30-minute incident window (windows
    // anchored at sparse error events). The binned rewrite turns the
    // no-equi-key inequality join — a nested-loop at scale — into a
    // shuffled equi-join on a time-bin key (see Joins.rangeJoinBinned);
    // the oracle states the same join as a plain inequality.
    QueryDef("q58_range_join",
      (s, d) => {
        val ev = Tables.events(s, d)
        val incidents = ev
          .filter(col("event_type") === "error" && col("event_id") % 101 === 0)
          .select(col("event_id").alias("incident_id"),
            col("ts").alias("w_start"),
            (col("ts") + expr("INTERVAL 30 MINUTES")).alias("w_end"))
        graft.ops.Joins.rangeJoinBinned(incidents, ev,
            "w_start", "w_end", "ts", binSeconds = 1800)
          .select(col("incident_id"), col("event_id"), col("user_id"), col("event_type"))
      },
      Some(s"""WITH $evCte,
              |inc AS (
              |  SELECT event_id AS incident_id, ts AS w_start,
              |         ts + INTERVAL 30 MINUTE AS w_end
              |  FROM ev WHERE event_type = 'error' AND event_id % 101 = 0)
              |SELECT i.incident_id, e.event_id, e.user_id, e.event_type
              |FROM inc i JOIN ev e ON e.ts >= i.w_start AND e.ts < i.w_end""".stripMargin))
  )
}
