package graft

/** Diagnostic main (test scope): print every PlanAudit finding — WARNs
  * included — for each registered query at sf0.001. The PlanSpec sweep
  * gates ERRORs; this reports the advisory tier for manual review:
  * `sbt "Test/runMain graft.AuditReport [substring]"`.
  */
object AuditReport {
  def main(args: Array[String]): Unit = {
    val spark = SparkSpec.session
    val sel = args.headOption.getOrElse("")
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter(_._1.contains(sel))
      .foreach { case (name, fn) =>
        val findings =
          try graft.ops.PlanAudit.audit(fn(spark, "/root/testdata/sf0.001"))
          catch { case e: Exception => Seq(graft.ops.PlanAudit.Finding("ERROR", s"build failed: $e")) }
        findings.foreach(f => println(s"[audit] $name $f"))
      }
    println("[audit] done")
    spark.stop()
  }
}
