package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

import graft.sources.Tables
import graft.ops._
import graft.ops.Aggregations.{countIf, exactAvg, exactSum, exactAvgSql, exactSumSql}

/** Reference-parity relational queries over the TPC-H-ish fixtures
  * (SURVEY §2 operator ids cited per query). Each mirrors a capability of
  * the reference pipeline, re-expressed on the driver's tables.
  */
object RelationalQueries {

  // Shared shape: per-customer order rollup (A1 conditional aggregation).
  private def ordersAgg(spark: SparkSession, sfDir: String): DataFrame =
    Tables.orders(spark, sfDir)
      .groupBy(col("o_custkey").alias("c_custkey"))
      .agg(
        count(lit(1)).alias("order_count"),
        countIf(col("o_orderstatus") === "O").alias("open_orders"),
        exactSum(col("o_totalprice")).alias("total_spent"))

  private val ordersAggSql =
    s"""SELECT o_custkey AS c_custkey, COUNT(*) AS order_count,
       |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS open_orders,
       |  ${exactSumSql("o_totalprice")} AS total_spent
       |FROM orders GROUP BY o_custkey""".stripMargin

  lazy val all: Seq[QueryDef] = Seq(

    // P2: narrow-and-rename projection; column pruning reaches the scan.
    QueryDef("q01_project_rename",
      (s, d) => Projections.renameProject(Tables.customer(s, d), Seq(
        "c_custkey" -> "customer_id", "c_name" -> "customer_name",
        "c_acctbal" -> "account_balance", "c_mktsegment" -> "segment")),
      Some("""SELECT c_custkey AS customer_id, c_name AS customer_name,
             |c_acctbal AS account_balance, c_mktsegment AS segment FROM customer""".stripMargin)),

    // P8/P9: conjunctive rule validation (keep-filter).
    QueryDef("q02_validate_filter",
      (s, d) => Validation.validate(Tables.customer(s, d), customerRules),
      Some(s"""SELECT * FROM customer WHERE $customerRulesSql""")),

    // Single-pass validation metrics (vs the reference's 7 count jobs).
    QueryDef("q03_validation_metrics",
      (s, d) => Validation.failureCounts(Tables.customer(s, d), customerRules),
      Some(s"""SELECT
              |  ${customerRulesSqlList.map { case (n, p) =>
                   s"CAST(SUM(CASE WHEN NOT COALESCE($p, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS fail_$n"
                 }.mkString(",\n  ")},
              |  COUNT(*) AS total_rows,
              |  CAST(SUM(CASE WHEN $customerRulesSql THEN 1 ELSE 0 END) AS BIGINT) AS passed_rows
              |FROM customer""".stripMargin)),

    // The observe-telemetry variant of q03: the same per-rule metrics
    // ride as an Observation on the validated frame's OWN action — zero
    // extra scans, the engine's answer to the reference's one count()
    // job per rule (silver/processor.py:147-153) — and are surfaced
    // here as a one-row frame so the driver hash-checks them.
    QueryDef("q106_observed_metrics",
      (s, d) => {
        val (validated, obs) =
          Validation.validateObserved(Tables.customer(s, d), customerRules)
        validated.write.mode("overwrite").format("noop").save()
        val m = obs.get
        val names = customerRules.map(r => s"fail_${r.name}") ++
          Seq("total_rows", "passed_rows")
        s.createDataFrame(
          java.util.Collections.singletonList(
            org.apache.spark.sql.Row.fromSeq(names.map(n => m(n).asInstanceOf[Long]))),
          org.apache.spark.sql.types.StructType(names.map(n =>
            org.apache.spark.sql.types.StructField(n, LongType, nullable = false))))
      },
      Some(s"""SELECT
              |  ${customerRulesSqlList.map { case (n, p) =>
                   s"CAST(SUM(CASE WHEN NOT COALESCE($p, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS fail_$n"
                 }.mkString(",\n  ")},
              |  COUNT(*) AS total_rows,
              |  CAST(SUM(CASE WHEN $customerRulesSql THEN 1 ELSE 0 END) AS BIGINT) AS passed_rows
              |FROM customer""".stripMargin)),

    // P6/P7: conditional value map + safe cast + timestamp extraction.
    QueryDef("q04_conditional_map_cast",
      (s, d) => Projections.mapValue(Tables.orders(s, d), "o_orderstatus", "P", "PENDING")
        .select(
          col("o_orderkey"),
          col("o_orderstatus").alias("status"),
          col("o_totalprice").cast("decimal(18,2)").cast(DoubleType).alias("total_price_2dp"),
          year(col("o_orderdate")).cast(LongType).alias("order_year")),
      Some("""SELECT o_orderkey,
             |  CASE WHEN o_orderstatus = 'P' THEN 'PENDING' ELSE o_orderstatus END AS status,
             |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total_price_2dp,
             |  CAST(year(o_orderdate) AS BIGINT) AS order_year
             |FROM orders""".stripMargin)),

    // U1: union by name with missing columns (test side lacks a column).
    QueryDef("q05_union_by_name",
      (s, d) => {
        val o = Tables.orders(s, d)
        SetOps.unionByNameTolerant(
          o.filter(col("o_orderkey") % 2 === 0)
            .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"), col("o_totalprice")),
          o.filter(col("o_orderkey") % 2 === 1)
            .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus")))
      },
      Some("""SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
             |FROM orders WHERE o_orderkey % 2 = 0
             |UNION ALL BY NAME
             |SELECT o_orderkey, o_custkey, o_orderstatus
             |FROM orders WHERE o_orderkey % 2 = 1""".stripMargin)),

    // Semi join: EXISTS shape (customers with at least one open order).
    QueryDef("q06_semi_join",
      (s, d) => Joins.semi(
        Tables.customer(s, d),
        Tables.orders(s, d).filter(col("o_orderstatus") === "O")
          .select(col("o_custkey").alias("c_custkey")),
        Seq("c_custkey")),
      Some("""SELECT * FROM customer c
             |WHERE EXISTS (SELECT 1 FROM orders o
             |              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O')""".stripMargin)),

    // Anti join: NOT EXISTS shape (customers with no PENDING orders —
    // status filter keeps the result set non-vacuous on this fixture).
    QueryDef("q07_anti_join",
      (s, d) => Joins.anti(
        Tables.customer(s, d),
        Tables.orders(s, d).filter(col("o_orderstatus") === "P")
          .select(col("o_custkey").alias("c_custkey")),
        Seq("c_custkey")),
      Some("""SELECT * FROM customer c
             |WHERE NOT EXISTS (SELECT 1 FROM orders o
             |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')""".stripMargin)),

    // A1: grouped conditional aggregation.
    QueryDef("q08_agg_conditional",
      (s, d) => Tables.orders(s, d).groupBy(col("o_custkey").alias("customer_id"))
        .agg(
          count(lit(1)).alias("order_count"),
          countIf(col("o_orderstatus") === "O").alias("open_orders"),
          exactSum(col("o_totalprice")).alias("total_spent"),
          max(col("o_totalprice")).alias("max_order_price"),
          min(col("o_orderdate")).alias("first_order_at")),
      Some(s"""SELECT o_custkey AS customer_id, COUNT(*) AS order_count,
              |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS open_orders,
              |  ${exactSumSql("o_totalprice")} AS total_spent,
              |  MAX(o_totalprice) AS max_order_price,
              |  CAST(MIN(o_orderdate) AS TIMESTAMP) AS first_order_at
              |FROM orders GROUP BY o_custkey""".stripMargin)),

    // A2-like: averages, conditional counts, guarded ratio (P11/P12).
    QueryDef("q09_agg_ratio",
      (s, d) => Tables.lineitem(s, d).groupBy(col("l_orderkey").alias("order_id"))
        .agg(
          count(lit(1)).alias("line_count"),
          exactAvg(col("l_quantity")).alias("avg_qty"),
          countIf(col("l_quantity") > 25).alias("big_lines"),
          exactSum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).alias("revenue"),
          exactSum(col("l_extendedprice") * col("l_tax")).alias("tax_amount"))
        .withColumn("tax_ratio",
          Projections.guardedDiv(col("tax_amount"), col("revenue"))),
      Some(s"""SELECT l_orderkey AS order_id, COUNT(*) AS line_count,
              |  ${exactAvgSql("l_quantity")} AS avg_qty,
              |  CAST(SUM(CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END) AS BIGINT) AS big_lines,
              |  ${exactSumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
              |  ${exactSumSql("l_extendedprice * l_tax")} AS tax_amount,
              |  CASE WHEN ${exactSumSql("l_extendedprice * (1.0 - l_discount)")} > 0
              |       THEN ${exactSumSql("l_extendedprice * l_tax")} / ${exactSumSql("l_extendedprice * (1.0 - l_discount)")}
              |       ELSE NULL END AS tax_ratio
              |FROM lineitem GROUP BY l_orderkey""".stripMargin)),

    // A5: pre-aggregate-then-pivot with explicit values (stable schema,
    // skips the distinct-values job).
    QueryDef("q10_pivot_status",
      (s, d) => Pivots.pivotCount(Tables.orders(s, d), "o_custkey", "o_orderstatus",
          Seq("F", "O", "P"), prefix = "status_")
        .withColumnRenamed("o_custkey", "customer_id"),
      Some("""SELECT o_custkey AS customer_id,
             |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS status_f_count,
             |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS status_o_count,
             |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS status_p_count
             |FROM orders GROUP BY o_custkey""".stripMargin)),

    // UNPIVOT (melt) — the inverse of q10's pivot: the wide per-status
    // counts fold back to (customer_id, status, n) long form via the
    // native Dataset.unpivot (no explode/stack UDF). Oracle states the
    // same melt as a UNION ALL, the engine-portable form.
    QueryDef("q121_unpivot_status",
      (s, d) => Pivots.pivotCount(Tables.orders(s, d), "o_custkey", "o_orderstatus",
          Seq("F", "O", "P"), prefix = "status_")
        .withColumnRenamed("o_custkey", "customer_id")
        .unpivot(Array(col("customer_id")),
          Array(col("status_f_count"), col("status_o_count"), col("status_p_count")),
          "status", "n")
        .filter(col("n") > 0),
      Some("""WITH p AS (SELECT o_custkey AS customer_id,
             |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS f,
             |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS o,
             |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS p
             |FROM orders GROUP BY o_custkey)
             |SELECT customer_id, status, n FROM (
             |  SELECT customer_id, 'status_f_count' AS status, f AS n FROM p
             |  UNION ALL
             |  SELECT customer_id, 'status_o_count' AS status, o AS n FROM p
             |  UNION ALL
             |  SELECT customer_id, 'status_p_count' AS status, p AS n FROM p)
             |WHERE n > 0""".stripMargin)),

    // A7: distinct.
    QueryDef("q11_distinct",
      (s, d) => Tables.orders(s, d).select(col("o_custkey").alias("customer_id")).distinct(),
      Some("SELECT DISTINCT o_custkey AS customer_id FROM orders")),

    // J3 + P10-P14: star enrichment with broadcast dims, zero-fills,
    // guarded ratio, threshold segmentation, rounding.
    QueryDef("q12_star_enrich", starEnrich,
      Some(s"""WITH oa AS ($ordersAggSql)
              |SELECT c.c_custkey AS customer_id, c.c_name AS customer_name,
              |  n.n_name AS nation, r.r_name AS region,
              |  COALESCE(oa.order_count, 0) AS order_count,
              |  COALESCE(oa.open_orders, 0) AS open_orders,
              |  COALESCE(oa.total_spent, 0.0) AS total_spent,
              |  CASE WHEN c.c_acctbal > 0 THEN COALESCE(oa.total_spent, 0.0) / c.c_acctbal
              |       ELSE NULL END AS spend_ratio,
              |  CASE WHEN COALESCE(oa.total_spent, 0.0) > 400000 THEN 'HIGH'
              |       WHEN COALESCE(oa.total_spent, 0.0) > 200000 THEN 'MEDIUM'
              |       ELSE 'LOW' END AS value_segment
              |FROM customer c
              |LEFT JOIN oa ON c.c_custkey = oa.c_custkey
              |LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
              |LEFT JOIN region r ON n.n_regionkey = r.r_regionkey""".stripMargin)),

    // A6: portfolio-style rollup incl. null-skipping average over a
    // left-join-missing column.
    QueryDef("q13_segment_rollup",
      (s, d) => {
        val j = Tables.customer(s, d).join(ordersAgg(s, d), Seq("c_custkey"), "left")
          .withColumn("value_segment", Projections.bucketize(Seq(
            "HIGH" -> (coalesce(col("total_spent"), lit(0.0)) > 400000),
            "MEDIUM" -> (coalesce(col("total_spent"), lit(0.0)) > 200000)), "LOW"))
        j.groupBy(col("value_segment"))
          .agg(
            count(lit(1)).alias("client_count"),
            exactSum(coalesce(col("total_spent"), lit(0.0))).alias("total_exposure"),
            exactAvg(col("total_spent")).alias("avg_spent"), // null-skipping
            exactAvg(col("c_acctbal")).alias("avg_balance"))
      },
      Some(s"""WITH oa AS ($ordersAggSql),
              |j AS (
              |  SELECT c.c_custkey, c.c_acctbal, oa.total_spent,
              |    CASE WHEN COALESCE(oa.total_spent, 0.0) > 400000 THEN 'HIGH'
              |         WHEN COALESCE(oa.total_spent, 0.0) > 200000 THEN 'MEDIUM'
              |         ELSE 'LOW' END AS value_segment
              |  FROM customer c LEFT JOIN oa ON c.c_custkey = oa.c_custkey)
              |SELECT value_segment, COUNT(*) AS client_count,
              |  ${exactSumSql("COALESCE(total_spent, 0.0)")} AS total_exposure,
              |  ${exactAvgSql("total_spent")} AS avg_spent,
              |  ${exactAvgSql("c_acctbal")} AS avg_balance
              |FROM j GROUP BY value_segment""".stripMargin)),

    // J1 + W1: left join against latest-per-group (window form).
    QueryDef("q14_latest_lineitem_window",
      (s, d) => {
        // order key must be TOTAL: (l_orderkey, l_linenumber) is not unique
        // in this data, so ties are broken down to the unique quad.
        val latest = Windows.topOnePerGroup(Tables.lineitem(s, d), Seq("l_orderkey"),
            Seq(col("l_shipdate").desc, col("l_linenumber").desc,
                col("l_partkey").desc, col("l_suppkey").desc))
          .select(col("l_orderkey").alias("o_orderkey"),
            col("l_shipdate").alias("last_ship_at"),
            col("l_quantity").alias("last_qty"),
            col("l_linenumber").cast(LongType).alias("last_line"))
        Tables.orders(s, d).select(col("o_orderkey"), col("o_orderstatus"))
          .join(latest, Seq("o_orderkey"), "left")
      },
      Some(latestLineitemSql)),

    // W1 at scale: identical semantics via max_by hash-agg (no sort) —
    // same oracle as the window form.
    QueryDef("q15_latest_lineitem_maxby",
      (s, d) => {
        val li = Tables.lineitem(s, d)
        val latest = Windows.latestPerGroupAgg(li, Seq("l_orderkey"),
            struct(col("l_shipdate"), col("l_linenumber"), col("l_partkey"), col("l_suppkey")))
          .select(col("l_orderkey").alias("o_orderkey"),
            col("l_shipdate").alias("last_ship_at"),
            col("l_quantity").alias("last_qty"),
            col("l_linenumber").cast(LongType).alias("last_line"))
        Tables.orders(s, d).select(col("o_orderkey"), col("o_orderstatus"))
          .join(latest, Seq("o_orderkey"), "left")
      },
      Some(latestLineitemSql)),

    // O3: ordered offset/limit pagination (total order via unique key).
    QueryDef("q16_pagination",
      (s, d) => Serving.paginate(Tables.customer(s, d), Seq(col("c_custkey")), 100, 20),
      Some("SELECT * FROM customer ORDER BY c_custkey LIMIT 20 OFFSET 100")),

    // Point lookup by key.
    QueryDef("q17_point_lookup",
      (s, d) => Serving.pointLookup(Tables.customer(s, d), "c_custkey", 42L),
      Some("SELECT * FROM customer WHERE c_custkey = 42")),

    // Null-tolerant conjunctive range filter (API layer semantics).
    QueryDef("q18_range_filter",
      (s, d) => Serving.rangeFilterNullTolerant(Tables.customer(s, d),
        Seq(("c_acctbal", Some(0.0), Some(5000.0)))),
      Some("""SELECT * FROM customer
             |WHERE (c_acctbal IS NULL OR c_acctbal >= 0.0)
             |  AND (c_acctbal IS NULL OR c_acctbal <= 5000.0)""".stripMargin)),

    // O4: per-client ordered detail fetch (api/app/database.py:140,154).
    QueryDef("q19_detail_fetch",
      (s, d) => Serving.pointLookup(Tables.orders(s, d), "o_custkey", 7L)
        .orderBy(col("o_orderkey")),
      Some("SELECT * FROM orders WHERE o_custkey = 7 ORDER BY o_orderkey")),

    // The FULL per-request dashboard cycle the reference's REST layer
    // runs (api/app/database.py:94-160) composed as ONE gated query
    // (round-9 verdict stretch #8 — pins the serving ops' interfaces the
    // way q138 pinned the assembly tier's): null-tolerant range filter →
    // COUNT(*) of the match set → ordered offset/limit page → per-page-row
    // detail aggregate (the point-lookup loop, done set-at-a-time). The
    // 10-row page broadcasts INTO orders — the detail fan-out never
    // shuffles the fact table; the 1-row total broadcasts onto the page.
    QueryDef("q218_dashboard_cycle",
      (s, d) => {
        import graft.ops.Aggregations
        val filtered = Serving.rangeFilterNullTolerant(Tables.customer(s, d),
          Seq(("c_acctbal", Some(1000.0), Some(8000.0))))
        val page = Serving.paginate(filtered, Seq(col("c_custkey")), 20, 10)
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        val total = filtered.agg(count(lit(1)).alias("total_matching"))
        val detail = Tables.orders(s, d)
          .join(broadcast(page.select(col("c_custkey"))),
            col("o_custkey") === col("c_custkey"))
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).alias("n_orders"),
            round(Aggregations.exactSum(col("o_totalprice")), 6).alias("spend"),
            max(col("o_orderkey")).alias("last_orderkey"))
        page.crossJoin(broadcast(total))
          .join(detail, col("c_custkey") === col("o_custkey"), "left")
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
            col("total_matching"),
            coalesce(col("n_orders"), lit(0L)).alias("n_orders"),
            col("spend"), col("last_orderkey"))
      },
      Some(s"""WITH f AS (
              |  SELECT * FROM customer
              |  WHERE (c_acctbal IS NULL OR c_acctbal >= 1000.0)
              |    AND (c_acctbal IS NULL OR c_acctbal <= 8000.0)),
              |p AS (SELECT c_custkey, c_name, c_acctbal FROM f
              |      ORDER BY c_custkey LIMIT 10 OFFSET 20),
              |t AS (SELECT COUNT(*) AS total_matching FROM f),
              |dt AS (
              |  SELECT o_custkey, COUNT(*) AS n_orders,
              |    round(${graft.ops.Aggregations.exactSumSql("o_totalprice")}, 6)
              |      AS spend,
              |    max(o_orderkey) AS last_orderkey
              |  FROM orders JOIN p ON o_custkey = p.c_custkey
              |  GROUP BY o_custkey)
              |SELECT p.c_custkey, p.c_name, p.c_acctbal, t.total_matching,
              |  COALESCE(dt.n_orders, 0) AS n_orders, dt.spend,
              |  dt.last_orderkey
              |FROM p CROSS JOIN t LEFT JOIN dt ON p.c_custkey = dt.o_custkey""".stripMargin)),

    // The spark.sql surface over catalog-registered views (S9 companion):
    // same text runs on both engines (exact-decimal revenue).
    QueryDef("q25_sql_surface",
      (s, d) => {
        Tables.registerAll(s, d)
        s.sql(revenuePerNationSql)
      },
      Some(revenuePerNationSql))
  )

  /** Runs verbatim on Spark SQL and DuckDB (ANSI subset + decimal trick). */
  private lazy val revenuePerNationSql =
    """SELECT n.n_name AS nation, COUNT(*) AS order_count,
      |  CAST(CAST(SUM(CAST(o.o_totalprice AS DECIMAL(30,8))) AS STRING) AS DOUBLE) AS revenue
      |FROM orders o
      |JOIN customer c ON o.o_custkey = c.c_custkey
      |JOIN nation n ON c.c_nationkey = n.n_nationkey
      |GROUP BY n.n_name""".stripMargin

  // ---- shared bits -------------------------------------------------------

  private val segments = Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")

  private def customerRules: Seq[Validation.Rule] = Seq(
    Validation.Rule("key_not_null", col("c_custkey").isNotNull),
    Validation.Rule("name_nonempty", col("c_name").isNotNull && length(col("c_name")) > 0),
    Validation.Rule("balance_floor", col("c_acctbal") >= -1000),
    Validation.Rule("segment_known", col("c_mktsegment").isin(segments: _*)),
    Validation.Rule("nation_range", col("c_nationkey").between(0, 24)))

  private val customerRulesSqlList: Seq[(String, String)] = Seq(
    "key_not_null" -> "c_custkey IS NOT NULL",
    "name_nonempty" -> "(c_name IS NOT NULL AND length(c_name) > 0)",
    "balance_floor" -> "c_acctbal >= -1000",
    "segment_known" -> s"c_mktsegment IN (${segments.map(s => s"'$s'").mkString(",")})",
    "nation_range" -> "c_nationkey BETWEEN 0 AND 24")

  private val customerRulesSql: String =
    customerRulesSqlList.map { case (_, p) => s"COALESCE($p, FALSE)" }.mkString(" AND ")

  private def starEnrich(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val oa = ordersAgg(s, d)
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d)
    c.join(oa, Seq("c_custkey"), "left")
      // dimension sides are tiny → explicit broadcast (no shuffle of the fact side)
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"), "left")
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"), "left")
      .select(
        col("c_custkey").alias("customer_id"),
        col("c_name").alias("customer_name"),
        col("n_name").alias("nation"),
        col("r_name").alias("region"),
        coalesce(col("order_count"), lit(0L)).alias("order_count"),
        coalesce(col("open_orders"), lit(0L)).alias("open_orders"),
        coalesce(col("total_spent"), lit(0.0)).alias("total_spent"),
        Projections.guardedDiv(coalesce(col("total_spent"), lit(0.0)), col("c_acctbal"))
          .alias("spend_ratio"),
        Projections.bucketize(Seq(
          "HIGH" -> (coalesce(col("total_spent"), lit(0.0)) > 400000),
          "MEDIUM" -> (coalesce(col("total_spent"), lit(0.0)) > 200000)), "LOW")
          .alias("value_segment"))
  }

  private lazy val latestLineitemSql =
    """WITH latest AS (
      |  SELECT l_orderkey AS o_orderkey, CAST(l_shipdate AS TIMESTAMP) AS last_ship_at,
      |         l_quantity AS last_qty, CAST(l_linenumber AS BIGINT) AS last_line
      |  FROM lineitem
      |  QUALIFY ROW_NUMBER() OVER (PARTITION BY l_orderkey
      |                             ORDER BY l_shipdate DESC, l_linenumber DESC,
      |                                      l_partkey DESC, l_suppkey DESC) = 1)
      |SELECT o.o_orderkey, o.o_orderstatus, latest.last_ship_at, latest.last_qty, latest.last_line
      |FROM orders o LEFT JOIN latest ON o.o_orderkey = latest.o_orderkey""".stripMargin
}
