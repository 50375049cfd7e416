package graft

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard configuration.
  *
  * Design notes (100 TB posture):
  *  - AQE on: runtime coalescing of shuffle partitions, skew-join splitting,
  *    and dynamic broadcast conversion replace hand-tuned partition counts.
  *  - `spark.sql.shuffle.partitions` defaults to the local core count here;
  *    on a real cluster this is overridden to ~2-3x total executor cores and
  *    AQE coalesces down from there.
  *  - The `events` fixture stores `ts` as parquet TIMESTAMP(MICROS,
  *    isAdjustedToUTC=false) (NTZ). With `inferTimestampNTZ` disabled and a
  *    UTC session timezone it reads as microsecond TimestampType with the
  *    identical instant; [[graft.sources.Tables.events]] also keeps a
  *    dynamic branch for legacy nanos-long fixtures (`nanosAsLong`).
  *  - UTC session timezone so timestamp semantics match the DuckDB oracle.
  */
object GraftSession {

  def builder(cores: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // GROWTH path, not just shrink: every AQE-planned shuffle STARTS at
      // 8× the core count and is coalesced back down from runtime map
      // statistics (parallelismFirst keeps at least the core count, the
      // advisory size bounds partition bytes above it). This is what lets
      // a shuffle whose working set grows with the corpus (q93's band-join
      // candidate distinct: 456M rows at sf10) spread across enough
      // partitions to stay in memory WITHOUT a per-scale-factor knob —
      // the sf10 ramp measured the old fixed-32 layout spilling at 14M
      // rows/partition where the same exchange at 256 partitions runs
      // at/below linear. The ceiling is deliberately CORES-PROPORTIONAL,
      // not a large constant: a round-13 A/B at sf10 measured a 1024
      // ceiling 1.2-1.35× SLOWER than 256 on local[32] (1024 reducers ×
      // 1024 map segments = 1M shuffle fetches and 32 waves of sub-second
      // tasks — pure overhead once partitions already fit in memory). On
      // a real cluster cores grow with data, so the ceiling grows with
      // exactly the resource that absorbs it; 8× leaves AQE three
      // doublings of skew/size headroom per core.
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        math.max(8 * cores, 256).toString)
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // fixtures annotate timestamps isAdjustedToUTC=false (parquet NTZ);
      // read them as session-TZ TimestampType — with the UTC session TZ the
      // instant is identical, and the whole engine (unix_micros arithmetic,
      // window binning, the DuckDB oracle dump) stays on one timestamp type
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      // dynamic: overwriting one ingest_date/year-month-day partition
      // replaces ONLY that partition — static overwrite (the default)
      // would truncate the whole table on an incremental re-run
      .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
      .config("spark.ui.enabled", "false")

  /** Local session; core count from SPARK_GRAFT_CPUS (driver contract).
    * SPARK_GRAFT_SHUFFLE_PARTITIONS still overrides the non-AQE shuffle
    * default AND the AQE initial partition count for deployments that
    * want an explicit ceiling, but since round 13 it is a tuning
    * override, not a correctness-of-scale requirement: the AQE
    * initialPartitionNum growth path (see [[builder]]) sizes every
    * adaptive shuffle from runtime statistics.
    */
  def local(): SparkSession = {
    val cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val b = builder(cores)
    sys.env.get("SPARK_GRAFT_SHUFFLE_PARTITIONS")
      .foreach { p =>
        b.config("spark.sql.shuffle.partitions", p)
        b.config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", p)
      }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
