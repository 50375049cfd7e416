package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.Medallion

/** Durable catalog: external-table registrations survive a FULL session
  * restart when the session catalog is backed by a Hive metastore
  * (embedded Derby — the jars ship with Spark, no external service).
  * Mirrors the reference's register-in-metastore contract
  * (spark/common/register_hive_tables.py:61-91), where registered Bronze/
  * Silver/Gold tables outlive the registering job.
  *
  * Runs in its OWN JVM (build.sbt Test/testGrouping): the catalog
  * implementation is fixed at SharedState creation, so a Hive-enabled
  * context cannot share a JVM session with the in-memory-catalog suites.
  */
class HiveCatalogSpec extends AnyFunSuite {

  private val warehouse = Files.createTempDirectory("graft_wh").toString
  private val metastore = Files.createTempDirectory("graft_ms").toString + "/metastore_db"

  /** Hive-enabled session over a file-backed Derby metastore. */
  private def hiveSession(): SparkSession =
    GraftSession.builder(4)
      .appName("graft-hive")
      .config("spark.sql.warehouse.dir", warehouse)
      .config("javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=$metastore;create=true")
      .enableHiveSupport()
      .getOrCreate()

  test("S9 durable: registered external table survives a session restart") {
    val s1 = hiveSession()
    try {
      s1.sparkContext.setLogLevel("ERROR")
      Medallion.registerTable(s1, "graft_db", "customer_ext",
        "/root/testdata/sf0.001/customer.parquet")
      val n1 = s1.sql("SELECT count(*) FROM graft_db.customer_ext").head().getLong(0)
      assert(n1 > 0)
    } finally {
      s1.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }

    // a brand-new context against the same metastore sees the table
    val s2 = hiveSession()
    try {
      s2.sparkContext.setLogLevel("ERROR")
      assert(s2.catalog.tableExists("graft_db.customer_ext"))
      val n2 = s2.sql("SELECT count(*) FROM graft_db.customer_ext").head().getLong(0)
      assert(n2 > 0)
      // and re-registration (drop + recreate) still works on the durable catalog
      Medallion.registerTable(s2, "graft_db", "customer_ext",
        "/root/testdata/sf0.001/customer.parquet")
      assert(s2.sql("SELECT count(*) FROM graft_db.customer_ext").head().getLong(0) == n2)
    } finally {
      s2.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
