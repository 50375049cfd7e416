package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rule-based row validation (SURVEY §2.2 P8-P9; reference:
  * spark/silver/processor.py:127-168).
  *
  * A row PASSES a rule iff the rule's predicate evaluates to true; a null
  * predicate (from null inputs) counts as a FAILURE — matching the
  * reference's keep-filter, where `df.filter(conj)` drops null-predicate
  * rows.
  *
  * Scale note: the reference runs one full `count()` job per negated rule
  * (7 re-scans of Bronze). [[failureCounts]] computes all rule metrics in a
  * SINGLE pass with conditional sums — same numbers, one scan; at 100 TB
  * this is the difference between 1 and 8 table reads.
  */
object Validation {

  final case class Rule(name: String, predicate: Column)

  private def passes(r: Rule): Column = coalesce(r.predicate, lit(false))

  /** Conjunction of all rules, null-safe (null predicate = fail). */
  def conjunction(rules: Seq[Rule]): Column =
    rules.map(passes).reduce(_ && _)

  /** Keep rows passing every rule (the reference's Silver keep-filter). */
  def validate(df: DataFrame, rules: Seq[Rule]): DataFrame =
    df.filter(conjunction(rules))

  /** Rows failing at least one rule (the reference's rejected set). */
  def rejects(df: DataFrame, rules: Seq[Rule]): DataFrame =
    df.filter(!conjunction(rules))

  /** One-row metrics frame: per-rule failure counts + total/passed rows.
    * Single scan (vs the reference's one job per rule).
    */
  def failureCounts(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    val perRule = rules.map(r => sum(when(!passes(r), 1L).otherwise(0L)).alias(s"fail_${r.name}"))
    val totals = Seq(
      count(lit(1)).alias("total_rows"),
      sum(when(conjunction(rules), 1L).otherwise(0L)).alias("passed_rows"))
    df.agg((perRule ++ totals).head, (perRule ++ totals).tail: _*)
  }

  /** Zero-extra-scan variant: attach the same metrics as `observe`
    * telemetry on the validated frame — they materialize as a side effect
    * of whatever job consumes the result (the Spark-native form of the
    * reference's per-stage logged counts). Returns (validated frame,
    * observation); read `observation.get` AFTER an action on the frame.
    */
  def validateObserved(df: DataFrame, rules: Seq[Rule],
                       name: String = "validation"): (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = new org.apache.spark.sql.Observation(name)
    val perRule = rules.map(r => sum(when(!passes(r), 1L).otherwise(0L)).alias(s"fail_${r.name}"))
    val totals = Seq(
      count(lit(1)).alias("total_rows"),
      sum(when(conjunction(rules), 1L).otherwise(0L)).alias("passed_rows"))
    val observed = df.observe(obs, (perRule ++ totals).head, (perRule ++ totals).tail: _*)
    (observed.filter(conjunction(rules)), obs)
  }

  /** Cross-table aggregate reconciliation — the invariant audit between a
    * fact header and its detail lines (does `sum(detail)` equal the
    * header's stored total?): full-outer on the key, per-key status
    * `match` (|Δ| ≤ tol), `mismatch`, `missing_detail` (header with no
    * lines), `missing_fact` (orphaned lines). The detail side aggregates
    * through exact decimal ([[Aggregations.exactSum]]-style caller-
    * provided agg) so Δ is partition-count-independent.
    *
    * Scale: one shuffle each side on the shared key — structural for two
    * fact-sized tables; bucket both by the key at write time and the join
    * co-locates ([[Bucketing]]). The detail aggregate is map-side
    * combined before its shuffle, so the join sees one row per key.
    */
  def reconcileAggregate(fact: DataFrame, factKey: String, factVal: Column,
                         detail: DataFrame, detailKey: String, detailAgg: Column,
                         tol: Double): DataFrame = {
    // presence markers, not value-nullness: a present header with a NULL
    // total must read as 'mismatch', never as a missing row
    val f = fact.select(col(factKey).alias("key"), factVal.alias("fact_value"))
      .withColumn("__fp", lit(1))
    val dt = detail.groupBy(col(detailKey).alias("key"))
      .agg(detailAgg.alias("detail_value"))
      .withColumn("__dp", lit(1))
    f.join(dt, Seq("key"), "full_outer")
      .withColumn("delta", round(col("fact_value") - col("detail_value"), 6))
      .withColumn("status",
        when(col("__fp").isNull, lit("missing_fact"))
          .when(col("__dp").isNull, lit("missing_detail"))
          .when(abs(col("delta")) <= tol, lit("match"))
          .otherwise(lit("mismatch")))
      .withColumn("detail_value", round(col("detail_value"), 6))
      .drop("__fp", "__dp")
  }
}
