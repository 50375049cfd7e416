package graft

import org.apache.spark.sql.functions._

import graft.ops.Validation
import graft.pipeline.Bronze

class BronzeSpec extends SparkSpec {
  import spark.implicits._

  test("CSV ingest: lineage columns, ingest_date partition, pruned re-read, observed count") {
    val tmp = java.nio.file.Files.createTempDirectory("bronze").toString
    // stage a Home-Credit-shaped CSV
    val csvDir = s"$tmp/csv"
    Seq((100001L, 202500.0, 406597.5, "M"), (100002L, 270000.0, 1293502.5, "F"))
      .toDF("SK_ID_CURR", "AMT_INCOME_TOTAL", "AMT_CREDIT", "CODE_GENDER")
      .coalesce(1).write.option("header", "true").csv(csvDir)

    val r1 = Bronze.ingestCsv(spark, csvDir, s"$tmp/bronze", "application_train", "2026-08-11")
    val r2 = Bronze.ingestCsv(spark, csvDir, s"$tmp/bronze", "application_train", "2026-08-12")
    assert(r1.rowsWritten == 2 && r2.rowsWritten == 2)

    val day2 = Bronze.readIngestDate(spark, s"$tmp/bronze", "application_train", "2026-08-12")
    assert(day2.count() == 2)
    assert(day2.columns.contains("source_system"))
    // schema inference restored numeric types through the CSV round-trip
    assert(day2.schema("AMT_CREDIT").dataType.typeName == "double")
    // partition pruning reaches the scan
    day2.collect()
    val plan = day2.queryExecution.executedPlan.toString
    assert(plan.contains("2026-08-12") || plan.contains("PartitionFilters"))
  }

  test("incremental re-ingest of one date leaves other partitions intact (dynamic overwrite)") {
    val tmp = java.nio.file.Files.createTempDirectory("bronze_incr").toString
    val csvDir = s"$tmp/csv"
    Seq((1L, "x"), (2L, "y")).toDF("id", "v")
      .coalesce(1).write.option("header", "true").csv(csvDir)
    Bronze.ingestCsv(spark, csvDir, s"$tmp/bronze", "t", "2026-08-11")
    Bronze.ingestCsv(spark, csvDir, s"$tmp/bronze", "t", "2026-08-12")
    // re-ingest ONLY day 2 with different data
    val csv2 = s"$tmp/csv2"
    Seq((9L, "z")).toDF("id", "v").coalesce(1).write.option("header", "true").csv(csv2)
    Bronze.ingestCsv(spark, csv2, s"$tmp/bronze", "t", "2026-08-12")
    // day 1 must survive; day 2 must be replaced, not appended
    assert(Bronze.readIngestDate(spark, s"$tmp/bronze", "t", "2026-08-11").count() == 2)
    val day2 = Bronze.readIngestDate(spark, s"$tmp/bronze", "t", "2026-08-12")
    assert(day2.count() == 1 && day2.select(col("id").cast("long")).head().getLong(0) == 9L)
  }

  test("validateObserved yields metrics as a side effect of the consuming action") {
    val df = Seq((1L, 10.0), (2L, -5.0), (3L, 7.0)).toDF("id", "amount")
    val rules = Seq(Validation.Rule("amount_positive", col("amount") > 0))
    val (validated, obs) = Validation.validateObserved(df, rules)
    val kept = validated.count() // the action that materializes the metrics
    assert(kept == 2)
    assert(obs.get("fail_amount_positive") == 1L)
    assert(obs.get("total_rows") == 3L)
    assert(obs.get("passed_rows") == 2L)
  }
}
