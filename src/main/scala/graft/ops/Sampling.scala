package graft.ops

import org.apache.spark.sql.{DataFrame, Row}

/** Sampling / preview / export actions (SURVEY §2.6 O1-O2, §2.1 S10-S11 —
  * reference: spark/common/export_to_excel.py:51-86, preview_data.py:14-22).
  *
  * Samples are seed-stable within Spark but engine-specific, so they are
  * covered by count-bound/determinism tests rather than the SQL oracle.
  */
object Sampling {

  /** O1: head sample for export. */
  def limitSample(df: DataFrame, n: Int): DataFrame = df.limit(n)

  /** O2: Bernoulli sample, seed-stable (reference uses seed=42). */
  def bernoulliSample(df: DataFrame, fraction: Double, seed: Long = 42L): DataFrame =
    df.sample(withReplacement = false, fraction, seed)

  /** O2+O1: the reference's big-table export shape — sample then cap. */
  def sampleThenLimit(df: DataFrame, fraction: Double, n: Int, seed: Long = 42L): DataFrame =
    bernoulliSample(df, fraction, seed).limit(n)

  /** Deterministic train/val/test split for training-data pipelines: the
    * bucket is a pure function of the id (seeded xxhash64 mod 10k), so
    * the same row lands in the same split on every run, on any cluster
    * size, and across reshuffles — unlike `randomSplit`, which depends on
    * partition layout. Fractions must sum to ≤ 1; rows beyond the listed
    * fractions (if they sum below 1) get split = null.
    *
    * Zero-shuffle: the split column is a projection; downstream writers
    * can `partitionBy("split")`.
    */
  def hashSplit(df: DataFrame, idCol: String,
                fractions: Seq[(String, Double)], seed: Long = 42L): DataFrame = {
    import org.apache.spark.sql.functions._
    require(fractions.nonEmpty && fractions.map(_._2).sum <= 1.0 + 1e-9,
      "split fractions must sum to <= 1")
    val bucket = pmod(xxhash64(col(idCol), lit(seed)), lit(10000L))
    val bounds = fractions.scanLeft(0L) { case (acc, (_, f)) =>
      acc + math.round(f * 10000)
    }.tail
    val expr = fractions.zip(bounds).foldRight(lit(null).cast("string")) {
      case (((name, _), hi), elseExpr) =>
        when(bucket < hi, lit(name)).otherwise(elseExpr)
    }
    df.withColumn("split", expr)
  }

  /** Exact-fraction stratified sample: per-stratum Bernoulli with a
    * seeded hash threshold — deterministic, single pass, no
    * count-per-stratum pre-job (`df.stat.sampleBy` has the same contract
    * but draws from partition-order-dependent RNG; this is stable across
    * cluster sizes).
    */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
                       fractions: Map[String, Double], seed: Long = 42L): DataFrame = {
    import org.apache.spark.sql.functions._
    val bucket = pmod(xxhash64(col(idCol), lit(seed)), lit(10000L))
    val keep = fractions.foldLeft(lit(false)) { case (acc, (stratum, f)) =>
      acc || (col(strataCol) === stratum && bucket < math.round(f * 10000))
    }
    df.filter(keep)
  }

  /** S11: preview action — row count, schema DDL, first rows. */
  final case class Preview(rowCount: Long, schemaDdl: String, rows: Seq[Row])

  def preview(df: DataFrame, n: Int = 5): Preview =
    Preview(df.count(), df.schema.toDDL, df.limit(n).collect().toSeq)

  /** S10: driver-side export — bounded collect as (header, rows). The
    * reference converts to xlsx; the engine's responsibility ends at the
    * bounded iterator (toLocalIterator keeps the driver memory flat for
    * larger exports).
    */
  def exportRows(df: DataFrame, maxRows: Int): (Seq[String], Iterator[Row]) = {
    import scala.jdk.CollectionConverters.IteratorHasAsScala
    (df.columns.toSeq, df.limit(maxRows).toLocalIterator().asScala)
  }
}
