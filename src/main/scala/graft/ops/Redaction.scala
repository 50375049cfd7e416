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
}
