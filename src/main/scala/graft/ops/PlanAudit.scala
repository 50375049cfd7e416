package graft.ops

import org.apache.spark.sql.DataFrame

/** Scale audit over a query's PHYSICAL plan — the library-level form of
  * the checks PlanSpec applies to the registered queries, exposed so a
  * pipeline can gate its own composed queries before running them at
  * cluster scale ("would this plan survive 100×?").
  *
  * Heuristics over the executed-plan text, deliberately conservative:
  * ERRORs are shapes that are quadratic or unbounded at scale (product
  * joins); WARNs are shapes that usually indicate a lost optimization
  * (a filter evaluated above a scan that pushed nothing down, an
  * unusually deep shuffle chain). A clean report does not prove a plan
  * scales — it proves the known red flags are absent.
  */
object PlanAudit {

  final case class Finding(severity: String, message: String) {
    override def toString: String = s"[$severity] $message"
  }

  /** Audit the physical plan; returns findings, worst first. */
  def audit(df: DataFrame, maxExchanges: Int = 6): Seq[Finding] = {
    val plan = df.queryExecution.executedPlan.toString
    val lines = plan.linesIterator.toSeq
    val errors = Seq.newBuilder[Finding]
    val warns = Seq.newBuilder[Finding]

    if (plan.contains("CartesianProduct"))
      errors += Finding("ERROR",
        "CartesianProduct: O(n*m) pairs cross the cluster; add an equi-key " +
          "or broadcast the bounded side explicitly")
    if (plan.contains("BroadcastNestedLoopJoin"))
      errors += Finding("ERROR",
        "BroadcastNestedLoopJoin: every probe row scans the whole broadcast " +
          "side; manufacture an equi-join key (binning/banding) instead")

    // a Filter planned directly above a FileScan that pushed no filters:
    // the predicate was pushable in principle but nothing reached the scan
    lines.sliding(2).foreach {
      case Seq(f, s)
        if f.contains("Filter ") && s.contains("FileScan") &&
          s.contains("PushedFilters: []") =>
        warns += Finding("WARN",
          "Filter above a scan with PushedFilters: [] — predicate not " +
            "pushed; check for casts/UDFs wrapping the filtered column")
      case _ => ()
    }

    // count only SHUFFLE exchanges: BroadcastExchange moves a bounded
    // frame and ReusedExchange is free — a broadcast-heavy star join must
    // not trip the deep-shuffle warning. RoundRobinPartitioning
    // (df.repartition(n) / REPARTITION hints) is a real shuffle too.
    val exchanges =
      "Exchange (hashpartitioning|rangepartitioning|RoundRobinPartitioning|SinglePartition)".r
        .findAllIn(plan).length
    if (exchanges > maxExchanges)
      warns += Finding("WARN",
        s"$exchanges Exchange nodes (> $maxExchanges): deep shuffle chain — " +
          "look for a reusable partitioning or a pre-aggregation")

    // Codegen spans only materialize in AQE's FINAL plan (per query
    // stage, at execution); on an unexecuted adaptive plan the check
    // would warn on everything. Assess it only when the plan is final
    // (non-adaptive, or adaptive after an action).
    val codegenAssessable =
      !plan.contains("AdaptiveSparkPlan") || plan.contains("isFinalPlan=true")
    // the compact toString renders a codegen stage as a "*(n) " operator
    // prefix; the literal node name only appears in other explain formats
    val hasCodegen = plan.contains("WholeStageCodegen") || plan.contains("*(")
    // a bare scan (no compute operator) has nothing to fuse — not a miss
    val hasCompute = lines.exists(l =>
      l.contains("Filter ") || l.contains("Project ") || l.contains("Aggregate") ||
        l.contains("Join") || l.contains("Window"))
    if (codegenAssessable && !hasCodegen && hasCompute && plan.contains("FileScan"))
      warns += Finding("WARN",
        "no WholeStageCodegen span: the hot path is interpreted — check for " +
          "non-codegen expressions or object-typed operators")

    errors.result() ++ warns.result()
  }

  /** Throw if the plan carries any ERROR finding (product joins). */
  def assertScalable(df: DataFrame, maxExchanges: Int = 6): Unit = {
    val findings = audit(df, maxExchanges)
    val errors = findings.filter(_.severity == "ERROR")
    if (errors.nonEmpty)
      throw new IllegalStateException(
        s"plan fails the scale audit:\n${errors.mkString("\n")}")
  }
}
