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
      // Shuffle-partition GROWTH is deliberately NOT a blanket session
      // ceiling. Round-13 measurements (DECISIONS.md): a session-wide
      // initialPartitionNum of 8×cores fixes q93's sf10 candidate-spill
      // (38.9 s vs 97.8 s heap-only) but taxes EVERY toy-scale exchange
      // ~60% on the reference-shape bench (wide-ceiling map segments +
      // AQE stage materialization per tiny shuffle), and 32×cores is
      // 1.2-1.35× worse again (1M fetch segments). So the ceiling is
      // scoped WHERE the fast-growing exchanges live: the banded dedup
      // operators raise it around their own eager materialization
      // (DedupMinHash.withWideShuffle — max(8×parallelism, 256), AQE
      // coalescing down from runtime statistics), and cluster
      // deployments size the session ceiling with their core count via
      // SPARK_GRAFT_SHUFFLE_PARTITIONS (cores grow with data at 100 TB;
      // this sandbox holds cores fixed across four decades of SF, which
      // no single static number serves).
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // Shuffle/spill/broadcast IO codec. zstd over the lz4 default:
      // the banded-dedup exchanges are the engine's dominant disk
      // writers (q93's sf100 rep peaked ~65 GB of concurrent shuffle
      // files on lz4 and overran this sandbox's 62 GB free disk —
      // round-14 DECISIONS), and zstd's ratio on shuffle data is
      // typically ~1.5-2× lz4's at a CPU cost an IO-bound stage
      // absorbs. At 100 TB the shuffle fabric, not the CPU, is the
      // scarce resource — trading idle cores for smaller shuffle
      // bytes is the standard posture. SPARK_GRAFT_IO_CODEC overrides
      // for measurement (per-query walls at sf0.1 are compared in
      // BENCH records across the change; jobs/scan-bytes are
      // codec-invariant).
      .config("spark.io.compression.codec",
        sys.env.getOrElse("SPARK_GRAFT_IO_CODEC", "zstd"))
      // Tungsten page size, pinned below the G1 humongous threshold.
      // On a large local heap (64 g → 32 MB G1 regions) Spark's derived
      // page size lands at ~16 MB = half a region, so every
      // sorter/aggregation page is a humongous allocation; a
      // sort/agg-heavy stage filling the 0.6×heap execution pool then
      // holds ~38 GB of humongous long[] churn that G1 cannot compact
      // while the driver (same JVM in local mode) stalls heartbeats to
      // death (round-14 DECISIONS: the jaccard-prefix sf10 collapse).
      // 4 MB pages are ordinary G1 objects at any heap ≥ 16 g and the
      // per-page overhead is noise; real clusters with 4-8 g executors
      // derive small pages anyway — local[32] on a big heap is the odd
      // deployment this default repairs.
      .config("spark.buffer.pageSize", "4m")
      // Local-mode liveness posture: driver and executor share one JVM
      // and one fate — heartbeat-based executor expiry detects nothing
      // here that an external monitor would miss, but it DOES convert
      // slowness into suicide. The round-15 autopsy (DECISIONS.md)
      // measured guest-wide stall windows of 608 s (r14) and 742 s
      // (r15) — time-to-safepoint pile-ups under the heavy dedup
      // stages' allocation/writeback storms, during which NO parked
      // timer can fire, so every in-process heartbeat goes silent at
      // once and a 600 s timeout sits INSIDE the measured stall range.
      // 1800 s covers the observed windows 2.4x; a genuinely wedged
      // local run still fails, just in 30 min instead of killing
      // healthy corpus-scale stages. Builder config OUTRANKS
      // spark-defaults, so these are env-escaped like the codec (a
      // cluster deployment that needs different values sets the env
      // vars; measurement harnesses use them to shorten repro loops).
      .config("spark.executor.heartbeatInterval",
        sys.env.getOrElse("SPARK_GRAFT_HEARTBEAT_INTERVAL", "60s"))
      .config("spark.network.timeout",
        sys.env.getOrElse("SPARK_GRAFT_NETWORK_TIMEOUT", "1800s"))
      // InferFiltersFromGenerate excluded (round 17). The rule inserts
      // `size(g) > 0 AND isnotnull(g)` under every non-outer Generate;
      // when the generator input is a DERIVED array (tokenize → hash →
      // shingle chains — this engine's dominant explode pattern),
      // predicate pushdown then substitutes the alias through the
      // projections and the scan-level Filter re-materializes the WHOLE
      // chain — the postings side of q137/q139/q140 evaluated its
      // tokenize+shingle chain 2-3× per row (plans/r17/*_before.txt:
      // the Filter condition carries two full copies of the chain that
      // the Project recomputes again; whole-stage codegen does NOT
      // eliminate the duplicates across operator boundaries — the r16
      // 1.35× column-binding measurement already proved that). The
      // filter buys nothing here: a non-outer Generate drops empty/null
      // arrays itself at ~zero cost, there is no exchange between the
      // inferred filter and the Generate to shrink, and derived-array
      // predicates never reach parquet as PushedFilters. Excluding the
      // rule deletes redundant per-row compute in EVERY explode-of-
      // derived-array operator (postings, line dedup, BPE vocab, TF-IDF
      // grams) and is scale-independent — per-row CPU, not a local[32]
      // partition-count artifact. Results are unchanged by construction
      // (the filter only pre-drops rows the Generate drops anyway);
      // oracle re-verified hash-exact over the full surface at sf0.01.
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
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
