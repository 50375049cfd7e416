package graft

import org.apache.spark.sql.functions._

import graft.ops.Projections
import graft.sources.{Sinks, Tables}

/** Live JDBC round-trip for S2/S8 against embedded Derby (ships with
  * Spark's Hive support — no external database needed). Covers the
  * reference's datamart write semantics: overwrite = drop + recreate
  * (gold/processor.py:284-313) and lowercase column folding before the
  * write (gold/datamart_extended.py:78-103).
  */
class JdbcSpec extends SparkSpec {
  import spark.implicits._

  private val dbDir = java.nio.file.Files.createTempDirectory("graft_derby").toString
  private val url = s"jdbc:derby:$dbDir/db;create=true"
  private val props = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")

  test("S8/S2: jdbcOverwrite then Tables.jdbc round-trips rows and schema") {
    val df = Seq((1L, "alice", 10.5), (2L, "bob", 20.25), (3L, "carol", 30.0))
      .toDF("ID", "NAME", "BALANCE")
    val folded = Projections.lowercaseAll(df) // datamart lowercase-fold
    Sinks.jdbcOverwrite(folded, url, "datamart_clients", "app", "pw",
      numPartitions = 2, props = props)

    val back = Tables.jdbc(spark, url, "datamart_clients",
      props + ("user" -> "app", "password" -> "pw"))
    assert(back.columns.map(_.toLowerCase).sorted.toSeq == Seq("balance", "id", "name"))
    val rows = back.collect().map(r =>
      (r.getLong(back.columns.indexWhere(_.equalsIgnoreCase("id"))),
       r.getString(back.columns.indexWhere(_.equalsIgnoreCase("name"))),
       r.getDouble(back.columns.indexWhere(_.equalsIgnoreCase("balance"))))).toSet
    assert(rows == Set((1L, "alice", 10.5), (2L, "bob", 20.25), (3L, "carol", 30.0)))
  }

  test("S8: overwrite drops and recreates — schema change survives") {
    val v1 = Seq((1L, "x")).toDF("id", "a")
    Sinks.jdbcOverwrite(v1, url, "datamart_evolving", "app", "pw", props = props)
    // second write has a DIFFERENT schema: truncate-based overwrite would fail
    val v2 = Seq((7L, 1.5, "y"), (8L, 2.5, "z")).toDF("id", "score", "b")
    Sinks.jdbcOverwrite(v2, url, "datamart_evolving", "app", "pw", props = props)
    val back = Tables.jdbc(spark, url, "datamart_evolving", props)
    assert(back.columns.map(_.toLowerCase).sorted.toSeq == Seq("b", "id", "score"))
    assert(back.count() == 2)
  }

  test("S2: predicate pushdown reaches the JDBC source") {
    val df = (1L to 100L).map(i => (i, s"n$i")).toDF("id", "name")
    Sinks.jdbcOverwrite(df, url, "datamart_push", "app", "pw", props = props)
    val filtered = Tables.jdbc(spark, url, "datamart_push", props).filter(col("id") > 90)
    assert(filtered.count() == 10)
    // the JDBC relation reports its pushed filters in the scan node
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("id"),
      s"expected pushed filter in JDBC scan:\n$plan")
  }

  test("streaming jdbcUpsertSink merges micro-batches exactly-once by key") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._

    val in = MemoryStream[(Long, String, Double)]
    val writer = graft.streaming.StreamingOps.jdbcUpsertSink(
      in.toDF().toDF("id", "segment", "exposure"),
      url, "datamart_stream", keyCols = Seq("id"), props = props)
    val q = writer.start()
    try {
      in.addData((1L, "HIGH", 10.0), (2L, "LOW", 5.0))
      q.processAllAvailable()
      // batch 2 updates id=1 and inserts id=3 — no duplicate id=1 row
      in.addData((1L, "MEDIUM", 12.0), (3L, "LOW", 7.0))
      q.processAllAvailable()
    } finally q.stop()

    val rows = Tables.jdbc(spark, url, "datamart_stream", props)
      .collect().map(r => (
        r.getLong(r.fieldIndex("id")),
        r.getString(r.fieldIndex("segment")),
        r.getDouble(r.fieldIndex("exposure")))).toSet
    assert(rows == Set((1L, "MEDIUM", 12.0), (2L, "LOW", 5.0), (3L, "LOW", 7.0)))
  }

  test("S8: gold portfolio lands in the datamart like the reference write") {
    // end-to-end: medallion gold output -> JDBC datamart -> read back by name
    val q61 = SparkEntry.queries("q61_medallion_portfolio")(spark, sf001)
    Sinks.jdbcOverwrite(Projections.lowercaseAll(q61), url, "datamart_portfolio_summary",
      "app", "pw", props = props)
    val back = Tables.jdbc(spark, url, "datamart_portfolio_summary", props)
    assert(back.count() == q61.count())
    assert(back.columns.contains("risk_segment".toUpperCase) ||
      back.columns.contains("risk_segment"))
  }
}
