package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Each query is materialized through the `noop` sink — unlike `count()`,
  * this computes every output column (count() lets Catalyst prune the
  * project away and would flatter narrow queries). Queries run in sorted
  * name order; a small warmup query first absorbs one-time session costs
  * (codegen compiler warmup, FileSourceStrategy init) so per-query numbers
  * measure the plan, not the JVM.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local()

    // Returns elapsed seconds, NEGATED on failure — a crashed query must
    // not contribute an innocent-looking small timing to the total.
    def runOne(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); true }
        catch { case e: Throwable => System.err.println(s"[bench] ${e.getMessage}"); false }
      val sec = (System.nanoTime() - t0) / 1e9
      if (ok) sec else -sec
    }

    // warmup: touch every fixture table once (scan + codegen warm)
    try graft.sources.Tables.registerAll(spark, sfDir) catch { case _: Throwable => }
    try spark.sql("select count(*) from lineitem").collect() catch { case _: Throwable => }

    // optional substring filter (local iteration): `runMain graft.Bench q44`
    val selected = args.headOption match {
      case Some(sub) => SparkEntry.queries.filter(_._1.contains(sub))
      case None => SparkEntry.queries
    }
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> runOne(fn)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val failures = results.collect { case (k, v) if v < 0 => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failures":$failures,"sf":"$sfDir"}""")
    spark.stop()
  }
}
