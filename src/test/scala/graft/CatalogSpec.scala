package graft

import graft.tables.GraftTable
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Catalog registration, SQL-surface parity, and caching — the
  * reference's CREATE TABLE/USE/SHOW flow (01-Fraud-Delta.py:116-134,
  * 02- Databricks_SQL_Scripts.sql:2-10) and Delta-cache mention
  * (01-Fraud-Delta.py:290).
  */
class CatalogSpec extends SparkSpec {
  import spark.implicits._

  test("snapshot registers in the catalog and serves SQL (CREATE/SHOW/SELECT)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cat_").resolve("t").toString
    val t = GraftTable.create(spark, dir, Tables.load(spark, sf, "orders"))
    spark.sql("CREATE DATABASE IF NOT EXISTS lakehouse")
    t.snapshot().createOrReplaceTempView("silver_orders")
    val shown = spark.sql("SHOW TABLES").select("tableName")
      .as[String].collect()
    assert(shown.contains("silver_orders"))
    val viaSql = spark.sql(
      """SELECT o_orderpriority, COUNT(*) AS n FROM silver_orders
        |GROUP BY o_orderpriority""".stripMargin)
    assert(viaSql.count() === 5)
    assert(spark.sql("SHOW DATABASES").as[String].collect().contains("lakehouse"))
  }

  test("SQL surface matches the DataFrame API on dashboard queries") {
    Tables.load(spark, sf, "orders").createOrReplaceTempView("orders_v")
    Tables.load(spark, sf, "customer").createOrReplaceTempView("customer_v")
    Tables.load(spark, sf, "nation").createOrReplaceTempView("nation_v")
    val sql = spark.sql(
      """SELECT n_name, c_mktsegment, COUNT(*) AS n_customers
        |FROM customer_v JOIN nation_v ON c_nationkey = n_nationkey
        |GROUP BY n_name, c_mktsegment""".stripMargin)
    val api = graft.operators.Analytics.countByState(spark, sf)
    assert(sql.except(api).count() === 0)
    assert(api.except(sql).count() === 0)
  }

  test("cache() serves repeated scans from memory (Delta-cache analog)") {
    val df = Tables.load(spark, sf, "lineitem")
      .groupBy($"l_returnflag").agg(count(lit(1)).as("n"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val first = df.count()
      assert(df.count() === first)
      assert(df.storageLevel.useMemory)
    } finally df.unpersist()
  }

  test("q5 star join: filters pushed, columns pruned, all dims broadcast") {
    val plan = graft.operators.Analytics.regionRevenue(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull"), "filter pushdown missing")
    assert(plan.linesIterator.count(_.contains("BroadcastHashJoin")) === 5,
      "expected all 5 dimension joins broadcast")
    // the lineitem scan must read only the 4 needed columns
    val liScan = plan.linesIterator
      .find(l => l.contains("FileScan parquet") && l.contains("lineitem")).get
    assert(liScan.contains("l_orderkey") && !liScan.contains("l_comment") &&
      !liScan.contains("l_returnflag"), liScan.take(200))
  }

  test("as-of join plans exactly one shuffle (the key partition)") {
    val plan = graft.operators.TemporalJoins.asofEventsOrders(spark, sf)
      .queryExecution.executedPlan.toString
    val exchanges = plan.linesIterator.count(_.trim.startsWith("Exchange"))
    assert(exchanges <= 2, s"expected ≤2 Exchange (union sides feed one window), got $exchanges\n$plan")
    assert(!plan.contains("CartesianProduct"))
  }
}
