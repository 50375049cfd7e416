package graft

/** Dev utility: print a registered query's executed plan (post-AQE —
  * the query is RUN first so runtime decisions like stage reuse and skew
  * splits are visible; the initial adaptive plan hides them).
  */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local()
    val df = SparkEntry.queries(args(0))(spark, args.lift(1).getOrElse("/root/testdata/sf0.001"))
    df.collect()
    println("=====PLAN=====")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
