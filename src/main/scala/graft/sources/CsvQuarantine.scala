package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import graft.ops.Checkpoints._

/** Error-tolerant CSV ingestion (the reference's own bronze ingest path
  * is CSV files — spark/bronze/feeder_csv.py:95-100 — and every real
  * corpus has malformed lines): PERMISSIVE read with an in-band corrupt
  * capture column, plus the quarantine split a medallion bronze layer
  * runs (good rows → table, bad rows → quarantine sink).
  *
  * Pinned PERMISSIVE semantics (CsvIngestSpec): a row with missing
  * trailing fields keeps its parsed prefix (missing → null); a field
  * that fails its type cast goes null while SIBLING fields stay parsed;
  * a row with extra fields keeps the schema prefix — in every case the
  * raw line lands in the corrupt column, so nothing is silently
  * dropped and nothing fails the job. At 100 TB this is the only
  * viable contract: fail-fast aborts the ingest on one bad line in a
  * billion, DROPMALFORMED destroys evidence.
  */
object CsvQuarantine {

  val CorruptCol = "_corrupt_record"

  /** PERMISSIVE read of `path` under `ddl` (the data schema — the
    * corrupt column is appended here). One parse per line, no shuffle.
    */
  def read(spark: SparkSession, path: String, ddl: String): DataFrame =
    spark.read
      .schema(StructType.fromDDL(ddl).add(CorruptCol, "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .csv(path)

  /** Quarantine split: (good rows without the capture column, bad rows
    * with it). The parse is persisted first — Spark disallows plans
    * whose required schema collapses to only the internal corrupt
    * column, and the two branches would otherwise also re-parse the
    * corpus once each.
    */
  def split(parsed: DataFrame): (DataFrame, DataFrame) = {
    val p = parsed.eagerCut()
    (p.filter(col(CorruptCol).isNull).drop(CorruptCol),
      p.filter(col(CorruptCol).isNotNull))
  }
}
