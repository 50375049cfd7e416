package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** PII scrubbing for training-corpus curation: emails, URLs, IPv4
  * addresses and phone-shaped numbers are counted and replaced with
  * category tokens. Pure per-row `regexp_replace`/`regexp_count`
  * expression chains — codegen'd, zero shuffle, linear in corpus size;
  * at 100 TB this is a map-only stage that fuses into whatever scan
  * feeds it.
  *
  * Pattern dialect is the Java-regex ∩ RE2 common subset (character
  * classes, bounded repetition, alternation, `\b`; no lookaround), so
  * the exact same pattern text runs in Spark and in the DuckDB oracle.
  * Redaction order is fixed (URL → email → IPv4 → phone): a URL is
  * consumed whole before the email/digit patterns could match inside
  * it, and IPv4 octets are gone before the looser phone shape runs.
  */
object Redaction {

  /** (name, pattern, replacement) in application order. */
  val rules: Seq[(String, String, String)] = Seq(
    ("url", "https?://[^ ]+", "<URL>"),
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b", "<IP>"),
    ("phone", "\\b[0-9]{3}-[0-9]{4}\\b", "<PHONE>"))

  /** Redacted text column: rules applied in order. */
  def redacted(text: Column): Column =
    rules.foldLeft(text) { case (c, (_, re, repl)) => regexp_replace(c, re, repl) }

  /** Per-category match counts on the ORIGINAL text (what a curation
    * report needs next to the scrubbed corpus). Counted in rule order on
    * the progressively-redacted text, so a URL's digits are not
    * double-counted as an IP.
    */
  def counts(text: Column): Seq[(String, Column)] = {
    var cur = text
    rules.map { case (name, re, repl) =>
      val n = regexp_count(cur, lit(re)).cast(LongType)
      cur = regexp_replace(cur, re, repl)
      (s"n_$name", n)
    }
  }

  /** Scrub `textCol`: returns id, per-category counts, and the redacted
    * text.
    */
  def scrub(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(
      Seq(col(idCol)) ++
        counts(t).map { case (n, c) => c.alias(n) } ++
        Seq(redacted(t).alias("redacted")): _*)
  }

  // ---- subject-deletion (right-to-be-forgotten) propagation -------------

  /** Drop every row of `df` whose `fk` matches a tombstoned key.
    * `broadcastTombstones` holds for first-level deletion lists (bounded
    * requests); a CASCADED key set (e.g. all order ids of deleted
    * customers) can be a constant fraction of a fact table — leave it
    * false there and let the anti join shuffle honestly.
    */
  def dropTombstoned(df: DataFrame, fk: Column, tombstones: DataFrame,
                     broadcastTombstones: Boolean = true): DataFrame = {
    val t0 = tombstones.select(col(tombstones.columns.head).alias("__tomb_key"))
    val t = if (broadcastTombstones) broadcast(t0) else t0
    df.join(t, fk === col("__tomb_key"), "left_anti")
  }

  /** Deletion-audit summary over a cascade: for each (table name, frame,
    * FK, tombstone set, broadcast flag), one row with before/after/deleted
    * counts — the compliance evidence a deletion job must emit. One pass
    * per table (left join + conditional count), no second scan.
    */
  def tombstoneAudit(tables: Seq[(String, DataFrame, Column, DataFrame, Boolean)]): DataFrame =
    tables.map { case (name, df, fk, tomb, bcast) =>
      val t0 = tomb.select(col(tomb.columns.head).alias("__tomb_key"))
        .distinct().withColumn("__t", lit(1))
      val t = if (bcast) broadcast(t0) else t0
      df.join(t, fk === col("__tomb_key"), "left")
        .agg(count(lit(1)).alias("rows_before"),
          sum(when(col("__t").isNotNull, 1L).otherwise(0L)).alias("rows_deleted"))
        .select(lit(name).alias("table_name"), col("rows_before"),
          (col("rows_before") - col("rows_deleted")).alias("rows_after"),
          col("rows_deleted"))
    }.reduce(_ unionByName _)
}
