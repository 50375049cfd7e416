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
