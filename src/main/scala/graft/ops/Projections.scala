package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataType

/** Projection / scalar-expression operators (SURVEY §2.2 P1-P7, P10-P15).
  *
  * All pure `Column` algebra — fully codegen'd, pushdown-friendly. No UDFs.
  */
object Projections {

  /** P1: append literal lineage columns (reference: feeder_csv.py:108-111). */
  def withLineage(df: DataFrame, ingestDate: String, sourceSystem: String): DataFrame =
    df.withColumn("ingest_date", lit(ingestDate))
      .withColumn("source_system", lit(sourceSystem))

  /** P2: narrow-and-rename projection (reference: gold/processor.py:139-157).
    * Column pruning reaches the parquet scan (`ReadSchema` shrinks).
    */
  def renameProject(df: DataFrame, mapping: Seq[(String, String)]): DataFrame =
    df.select(mapping.map { case (from, to) => col(from).alias(to) }: _*)

  /** P3: alias every column to lowercase (reference: datamart_extended.py:78-103). */
  def lowercaseAll(df: DataFrame): DataFrame =
    df.select(df.columns.map(c => col(c).alias(c.toLowerCase)).toIndexedSeq: _*)

  /** P4: sanitize a column name the way the reference sanitizes pivot headers
    * (lower, spaces/dashes → underscore; silver/processor.py:636-642).
    */
  def sanitizeName(name: String): String =
    name.toLowerCase.replace(" ", "_").replace("-", "_")

  /** P5: drop columns if present (drift-tolerant). */
  def dropCols(df: DataFrame, cols: String*): DataFrame = df.drop(cols: _*)

  /** P6: safe cast — only applied when the column exists (the reference's
    * `if col in df.columns` drift tolerance, silver/processor.py:103-113).
    * Invalid values → null (non-ANSI cast semantics).
    */
  def safeCast(df: DataFrame, casts: Map[String, DataType]): DataFrame =
    casts.foldLeft(df) { case (acc, (name, dt)) =>
      if (acc.columns.contains(name)) acc.withColumn(name, col(name).try_cast(dt))
      else acc
    }

  /** P7: conditional value mapping (reference: CODE_GENDER XNA → Unknown,
    * silver/processor.py:116-122).
    */
  def mapValue(df: DataFrame, column: String, from: String, to: String): DataFrame =
    df.withColumn(column, when(col(column) === lit(from), lit(to)).otherwise(col(column)))

  /** P10: null → 0 default (reference: coalesce on join outputs,
    * gold/processor.py:166-169).
    */
  def zeroFill(c: Column): Column = coalesce(c, lit(0))

  /** P12: guarded division — denominator <= 0 (or null) → `default`
    * (reference: silver/processor.py:481-487, gold/processor.py:171-176).
    */
  def guardedDiv(num: Column, den: Column, default: Column = lit(null)): Column =
    when(den > 0, num / den).otherwise(default)

  /** P14: threshold-bucket case expression (reference risk segmentation,
    * gold/processor.py:184-200). `thresholds` are (label, predicate) pairs
    * evaluated in order; `default` labels the rest.
    */
  def bucketize(thresholds: Seq[(String, Column)], default: String): Column =
    thresholds.foldRight(lit(default): Column) { case ((label, cond), rest) =>
      when(cond, lit(label)).otherwise(rest)
    }
}
