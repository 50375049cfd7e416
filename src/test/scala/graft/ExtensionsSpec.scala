package graft

import org.scalatest.funsuite.AnyFunSuite

/** `spark.sql.extensions`-style installation: a session built with
  * [[GraftExtensions]] exposes the native expressions to pure-SQL users.
  * Runs in its own JVM (build.sbt testGrouping) because extensions apply
  * only at session creation and the shared test session predates them.
  */
class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions makes simhash64 / hyperplane_sketch / top_k_pairs SQL-callable") {
    val spark = GraftSession.builder(4)
      .appName("graft-ext")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      spark.sparkContext.setLogLevel("ERROR")

      val sim = spark.sql("SELECT simhash64(array('a', 'b')) AS h").head().getLong(0)
      assert(sim != 0L)

      // SQL and Scala callers must agree bit-for-bit (same seeded planes)
      val sketchSql = spark.sql(
        """SELECT hyperplane_sketch(array(CAST(0.5 AS DOUBLE), -1.5, 2.0), 42, 128, 3) AS s"""
      ).head().getSeq[Long](0)
      import org.apache.spark.sql.functions._
      import spark.implicits._
      val sketchScala = Seq(Seq(0.5, -1.5, 2.0)).toDF("v")
        .select(graft.functions.VectorFunctions.hyperplaneSketchWide(
          col("v"), graft.ops.Hyperplanes.generate(42L, 128, 3)).alias("s"))
        .head().getSeq[Long](0)
      assert(sketchSql == sketchScala)
      assert(sketchSql.length == 2)

      val top = spark.sql(
        """SELECT g, top_k_pairs(id, s, 2) AS top FROM VALUES
          |  (1, 10L, 0.3), (1, 11L, 0.9), (1, 12L, 0.9), (1, 13L, 0.1)
          |  AS t(g, id, s)
          |GROUP BY g""".stripMargin)
        .selectExpr("explode(top) AS e").selectExpr("e.neighbor_id", "e.cosine")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(top == Seq((11L, 0.9), (12L, 0.9)))
    } finally {
      spark.stop()
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
    }
  }
}
