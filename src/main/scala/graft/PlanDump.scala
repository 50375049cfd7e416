package graft

import java.nio.file.{Files, Paths}

/** Round-16 measurement harness: dump `.explain("formatted")` for named
  * registered queries to files (the optimization round's plan evidence —
  * `plans/r16/<query>_{before,after}.txt`).
  *
  * Usage: runMain graft.PlanDump <outDir> <suffix> <q1,q2,...> [sfDir]
  *
  * Two artifacts per query:
  *  - the FORMATTED pre-execution plan (Exchange count, join strategy,
  *    PushedFilters/ReadSchema, codegen spans — the judge-checkable shape);
  *  - appended post-execution AQE final plan summary (executedPlan after
  *    one noop run), because AQE's runtime join/coalesce decisions are
  *    invisible in the initial plan.
  *
  * Iterative operators (connected components, PageRank) drive MANY plans
  * per query — the dump shows the returned frame's plan; per-round shapes
  * are pinned separately in PlanSpec where they matter.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val pats = args(2).split(',').filter(_.nonEmpty)
    val sfDir = args.lift(3).getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.local()
    new java.io.File(outDir).mkdirs()
    val selected = SparkEntry.queries.filter { case (n, _) =>
      pats.exists(n.contains)
    }.toSeq.sortBy(_._1)
    for ((name, fn) <- selected) {
      try {
        val df = fn(spark, sfDir)
        val formatted = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        df.write.mode("overwrite").format("noop").save()
        val finalPlan = df.queryExecution.executedPlan.toString
        Files.write(Paths.get(s"$outDir/${name}_$suffix.txt"),
          (s"== explain(formatted), $name, $sfDir ==\n" + formatted +
            "\n\n== post-execution (AQE final) ==\n" + finalPlan)
            .getBytes("UTF-8"))
        println(s"[plandump] wrote $name")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $name failed: ${e.getMessage}")
      }
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
    }
    spark.stop()
  }
}
