package graft.operators

import graft.Tables
import graft.Tables.{asDouble, dec}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch SQL analytics (SURVEY.md §2.D): the reference's dashboard
  * queries (Instructor/02- Databricks_SQL_Scripts.sql:14-41) plus
  * TPC-H-grade scan/join/agg/window workloads over the same star
  * schema.
  *
  * Scale posture: only FIXED-cardinality dimensions (region=5,
  * nation=25 rows) carry explicit `broadcast` hints; sf-proportional
  * sides (customer/supplier/part, pre-aggregates) are left to the
  * planner + AQE, which broadcasts them while they fit the threshold
  * and degrades to a shuffle join — not a driver OOM — at 100 TB.
  * All money aggregates are decimal-exact (deterministic under any
  * partitioning); windows partition by a key before sorting so the
  * sort is distributed.
  */
object Analytics {

  /** 02-SQL "Total Loan Amount": SUM over the fact table. */
  def totalAmount(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "orders")
      .agg(asDouble(sum(dec(col("o_totalprice")))).as("total_amount"))

  /** 02-SQL "Purpose of loan": single-key GROUP BY sum. */
  def amountByPriority(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "orders")
      .groupBy(col("o_orderpriority"))
      .agg(asDouble(sum(dec(col("o_totalprice")))).as("total_amount"))

  /** 02-SQL third query: multi-key GROUP BY count (addr_state ×
    * verification_status analog = nation × market segment).
    */
  def countByState(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.load(spark, sfDir, "customer")
    val n = Tables.load(spark, sfDir, "nation")
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
  }

  /** TPC-H Q1-grade pricing summary: multi-measure agg with
    * decimal-exact money math. Filter is pushed to the parquet scan.
    */
  def pricingSummary(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-02 00:00:00")))
    // (12,4)·(6,4)·(6,4) → decimal(26,12): inside Spark's 38-digit cap,
    // so the triple product is EXACT. Wider intermediate types would
    // silently round when the product precision tops 38.
    val discPrice = dec(col("l_extendedprice")) *
      (lit(1).cast("decimal(5,4)") - col("l_discount").cast("decimal(5,4)"))
    val charge = discPrice * (lit(1).cast("decimal(5,4)") + col("l_tax").cast("decimal(5,4)"))
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        asDouble(sum(dec(col("l_quantity")))).as("sum_qty"),
        asDouble(sum(dec(col("l_extendedprice")))).as("sum_base_price"),
        asDouble(sum(discPrice)).as("sum_disc_price"),
        asDouble(sum(charge)).as("sum_charge"),
        (asDouble(sum(dec(col("l_quantity")))) / count(lit(1))).as("avg_qty"),
        (asDouble(sum(dec(col("l_extendedprice")))) / count(lit(1))).as("avg_price"),
        (asDouble(sum(dec(col("l_discount")))) / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
  }

  /** TPC-H Q3-grade: selective dim filter, 3-way join, agg, top-k.
    * The filtered customer keys stay planner-sized (AQE broadcasts
    * while they fit); orders⋈lineitem shuffles once on the order
    * key. Deterministic top-k: tie-broken by key.
    */
  def shippingPriority(spark: SparkSession, sfDir: String): DataFrame = {
    val cut = lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00"))
    val c = Tables.load(spark, sfDir, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val o = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderdate") < cut)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val li = Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") > cut)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val discPrice = dec(col("l_extendedprice")) * (lit(1).cast("decimal(12,4)") - dec(col("l_discount")))
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(asDouble(sum(discPrice)).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-grade: 6-way star join; fixed dims (nation/region)
    * broadcast by hint, supplier/customer sized by the planner, the
    * lineitem⋈orders fact join is the only guaranteed shuffle.
    */
  def regionRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val r = Tables.load(spark, sfDir, "region")
    val n = Tables.load(spark, sfDir, "nation")
    val c = Tables.load(spark, sfDir, "customer")
    val s = Tables.load(spark, sfDir, "supplier")
    val o = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")) &&
        col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")))
    val li = Tables.load(spark, sfDir, "lineitem")
    val discPrice = dec(col("l_extendedprice")) * (lit(1).cast("decimal(12,4)") - dec(col("l_discount")))
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(s, li("l_suppkey") === s("s_suppkey"))
      .join(c, o("o_custkey") === c("c_custkey") &&
        c("c_nationkey") === s("s_nationkey"))
      .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(asDouble(sum(discPrice)).as("revenue"))
  }

  /** TPC-H Q7 shape: bilateral shipping volume between two nations by
    * ship year — 4-way fact joins with the 25-row nation dim
    * broadcast twice (supplier side and customer side), symmetric
    * pair filter; supplier/customer joins are planner-sized.
    */
  def nationVolume(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    val o = Tables.load(spark, sfDir, "orders")
    val c = Tables.load(spark, sfDir, "customer")
    val s = Tables.load(spark, sfDir, "supplier")
    val n = Tables.load(spark, sfDir, "nation")
    val n1 = n.select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = n.select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    val discPrice = dec(col("l_extendedprice")) *
      (lit(1).cast("decimal(5,4)") - col("l_discount").cast("decimal(5,4)"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .filter((col("supp_nation") === "NATION_20" && col("cust_nation") === "NATION_11") ||
        (col("supp_nation") === "NATION_11" && col("cust_nation") === "NATION_20"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(asDouble(sum(discPrice)).as("revenue"))
  }

  /** TPC-H Q8 shape: a nation's market share inside one region's
    * customer volume for one part type, by year — conditional share
    * over decimal-exact sums; only the fixed nation/region chain
    * carries broadcast hints.
    */
  def marketShare(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    val o = Tables.load(spark, sfDir, "orders")
    val c = Tables.load(spark, sfDir, "customer")
    val s = Tables.load(spark, sfDir, "supplier")
    val n = Tables.load(spark, sfDir, "nation")
    val r = Tables.load(spark, sfDir, "region")
    val p = Tables.load(spark, sfDir, "part").select(col("p_partkey"), col("p_type"))
    val nCust = n.select(col("n_nationkey").as("c_nk"), col("n_regionkey").as("c_rk"))
    val nSupp = n.select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val discPrice = dec(col("l_extendedprice")) *
      (lit(1).cast("decimal(5,4)") - col("l_discount").cast("decimal(5,4)"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(p, col("l_partkey") === col("p_partkey"))
      .filter(col("p_type") === "ECONOMY")
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nCust), col("c_nationkey") === col("c_nk"))
      .join(broadcast(r), col("c_rk") === col("r_regionkey"))
      .filter(col("r_name") === "EUROPE")
      .join(broadcast(nSupp), col("s_nationkey") === col("s_nk"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg((asDouble(sum(when(col("supp_nation") === "NATION_3", discPrice)
          .otherwise(lit(0).cast("decimal(12,4)")))) /
        asDouble(sum(discPrice))).as("mkt_share"))
  }

  /** TPC-H Q9 shape: profit (volume proxy) by supplier nation × ship
    * year over parts matching a name substring — the LIKE filter on
    * part reaches the fact join; the planner sizes the dim joins.
    */
  def profitByNation(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    val s = Tables.load(spark, sfDir, "supplier")
    val n = Tables.load(spark, sfDir, "nation")
    val p = Tables.load(spark, sfDir, "part")
      .filter(col("p_name").contains("widget"))
      .select(col("p_partkey"))
    val discPrice = dec(col("l_extendedprice")) *
      (lit(1).cast("decimal(5,4)") - col("l_discount").cast("decimal(5,4)"))
    li.join(p, col("l_partkey") === col("p_partkey"))
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), year(col("l_shipdate")).as("o_year"))
      .agg(asDouble(sum(discPrice)).as("profit"))
  }

  /** Ordered funnel analytics over the event stream: users reaching
    * view → click → purchase IN ORDER (each stage's first event must
    * follow the previous stage's). Three conditional min-aggs, each
    * shuffling only (user, ts) on the user key — no per-user
    * sequence materialization, the shape that holds on billions of
    * events.
    */
  def eventFunnel(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), col("ts"))
    val s1 = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val s2 = ev.filter(col("event_type") === "click")
      .join(s1, Seq("user_id"))
      .filter(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val s3 = ev.filter(col("event_type") === "purchase")
      .join(s2, Seq("user_id"))
      .filter(col("ts") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    s1.agg(count(lit(1)).as("n_users")).withColumn("stage", lit("1_view"))
      .unionByName(s2.agg(count(lit(1)).as("n_users")).withColumn("stage", lit("2_view_click")))
      .unionByName(s3.agg(count(lit(1)).as("n_users")).withColumn("stage", lit("3_full_funnel")))
      .select(col("stage"), col("n_users"))
  }

  /** Hash-trick feature bucketing (HashingTF shape) with a PORTABLE
    * hash: each categorical feature string lands in an md5-residue
    * bucket; the per-bucket counts are the hashed design-matrix
    * column sums. Map-side explode + one count shuffle at any scale;
    * the md5 spelling replays exactly in the oracle.
    */
  def featureHash(spark: SparkSession, sfDir: String,
      numBuckets: Int = 64): DataFrame = {
    val o = Tables.load(spark, sfDir, "orders")
    val c = Tables.load(spark, sfDir, "customer")
    val feats = o.join(c, col("o_custkey") === col("c_custkey"))
      .select(explode(array(
        concat(lit("priority="), col("o_orderpriority")),
        concat(lit("segment="), col("c_mktsegment")),
        concat(lit("status="), col("o_orderstatus")))).as("feat"))
    feats
      .withColumn("bucket",
        (Tables.md5Residue(col("feat")) % numBuckets).cast("int"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"))
  }

  /** Top-k per group via row_number window (deterministic ordering). */
  def topCustomersWindow(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.load(spark, sfDir, "orders")
    val c = Tables.load(spark, sfDir, "customer")
    val perCust = o.groupBy(col("o_custkey"))
      .agg(asDouble(sum(dec(col("o_totalprice")))).as("revenue"))
      .join(c, col("o_custkey") === c("c_custkey"))
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("revenue").desc, col("o_custkey"))
    perCust.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("c_mktsegment"), col("rank"), col("o_custkey"), col("revenue"))
  }

  /** Running per-customer balance: sum over an ordered window frame. */
  def runningTotalWindow(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.load(spark, sfDir, "orders")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    o.select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
      asDouble(sum(dec(col("o_totalprice"))).over(w)).as("running_total"))
  }

  /** 03-ML cell 66: numeric bucketing `cast(x/1000 as int)*1000`.
    * floor() (not cast) on both sides — Spark casts double→int by
    * truncation while DuckDB rounds, so an explicit floor is the only
    * portable spelling.
    */
  def bucketedAmounts(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "orders")
      .withColumn("amount_bucket",
        (floor(col("o_totalprice") / 1000).cast("long") * 1000))
      .groupBy(col("amount_bucket"))
      .agg(count(lit(1)).as("n_orders"),
        asDouble(sum(dec(col("o_totalprice")))).as("total_amount"))

  /** Exact distinct counting per group (plus approx variant in spec). */
  def distinctParts(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"))

  /** Pivot: order-month × status count matrix. Explicit pivot values
    * keep the plan single-pass (no values-discovery job); coalesce to
    * 0 matches SQL FILTER-agg semantics.
    */
  def pivotStatusMonth(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "orders")
      .withColumn("order_month", month(col("o_orderdate")))
      .groupBy(col("order_month"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(col("order_month"),
        coalesce(col("F"), lit(0L)).as("n_f"),
        coalesce(col("O"), lit(0L)).as("n_o"),
        coalesce(col("P"), lit(0L)).as("n_p"))

  /** ROLLUP hierarchy totals (status → priority → grand total). */
  def rollupPriority(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "orders")
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        asDouble(sum(dec(col("o_totalprice")))).as("total_amount"))

  /** TPC-H Q4 shape — EXISTS as a left-semi join (no row
    * duplication, the probe side short-circuits per key).
    */
  def priorityExists(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.load(spark, sfDir, "orders")
    val li = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_shipdate"))
    o.join(li, o("o_orderkey") === li("l_orderkey") &&
        li("l_shipdate") > o("o_orderdate"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
  }

  /** NOT EXISTS as a left-anti join: customers with no orders AT ALL
    * (`cutoff` None — the original API semantics), or none on/after
    * the cutoff date when one is supplied. The signature makes the
    * dated variant an explicit caller choice instead of a silent
    * default change; the scenario entry point is [[lapsedCustomers]].
    */
  def customersNoOrders(spark: SparkSession, sfDir: String,
      cutoff: Option[String] = None): DataFrame = {
    val c = Tables.load(spark, sfDir, "customer")
    val o = cutoff.foldLeft(Tables.load(spark, sfDir, "orders")) {
        (d, cut) => d.where(col("o_orderdate") >= lit(cut).cast("date"))
      }
      .select(col("o_custkey"))
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
  }

  /** LAPSED customers — no orders on or after the cutoff (the dated
    * predicate keeps the driver row non-vacuous at every test SF,
    * where the synthetic data gives every customer SOME order; the
    * date filter pushes into the orders scan before the anti-join's
    * shuffle).
    */
  def lapsedCustomers(spark: SparkSession, sfDir: String,
      cutoff: String = "2000-01-01"): DataFrame =
    customersNoOrders(spark, sfDir, Some(cutoff))

  /** TPC-H Q17 shape — correlated scalar subquery (per-part avg
    * quantity) decorrelated into a pre-aggregated join: ONE pass
    * over lineitem for the averages, one for the probe. The
    * per-partkey aggregate is sf-proportional, so no broadcast
    * hint — at 100 TB it must shuffle, not flood the driver.
    */
  def smallQtyRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    val avgQty = li.groupBy(col("l_partkey").as("ap"))
      .agg((asDouble(sum(dec(col("l_quantity")))) / count(lit(1))).as("avg_qty"))
    li.join(avgQty, col("l_partkey") === col("ap"))
      .filter(col("l_quantity") < col("avg_qty") * 0.5)
      .agg((asDouble(sum(dec(col("l_extendedprice")))) / lit(7.0)).as("avg_yearly"))
  }

  /** TPC-H Q14 shape — conditional aggregation share (promo revenue
    * percentage); the part join is planner-sized.
    */
  def promoShare(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    val p = Tables.load(spark, sfDir, "part").select(col("p_partkey"), col("p_type"))
    val discPrice = dec(col("l_extendedprice")) *
      (lit(1).cast("decimal(5,4)") - col("l_discount").cast("decimal(5,4)"))
    li.join(p, col("l_partkey") === col("p_partkey"))
      .agg((lit(100.0) *
        asDouble(sum(when(col("p_type") === "PROMO", discPrice)
          .otherwise(lit(0).cast("decimal(12,4)")))) /
        asDouble(sum(discPrice))).as("promo_share"))
  }

  /** Set operations: customers ordering in both 1996 and 1997
    * (INTERSECT) vs only-1996 (EXCEPT) — distinct-set semantics.
    */
  def setOpsCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.load(spark, sfDir, "orders")
    def custsIn(y: Int) = o.filter(year(col("o_orderdate")) === y)
      .select(col("o_custkey")).distinct()
    val both = custsIn(1996).intersect(custsIn(1997))
    val only96 = custsIn(1996).except(custsIn(1997))
    both.agg(count(lit(1)).as("n")).withColumn("grp", lit("both"))
      .unionByName(only96.agg(count(lit(1)).as("n")).withColumn("grp", lit("only_1996")))
      .select(col("grp"), col("n"))
  }

  /** Percentiles per group WITHOUT interpolation FP drift: exact
    * median as the decimal-mean of the middle element(s), p90 by
    * nearest-rank selection — both pure row selection + exact
    * arithmetic, so any engine agrees bit-for-bit.
    */
  def percentileBands(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.load(spark, sfDir, "orders")
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val ranked = o.select(col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("o_orderpriority"))))
    // integral div for the middle ranks (Column./ is double division)
    val isMid = col("rn") === expr("(n + 1) div 2") ||
      col("rn") === expr("n div 2 + 1")
    ranked.groupBy(col("o_orderpriority"))
      .agg(
        (asDouble(sum(when(isMid, dec(col("o_totalprice"))))) /
          sum(when(isMid, 1))).as("median_price"),
        asDouble(sum(when(col("rn") === ceil(col("n") * 0.9), dec(col("o_totalprice")))))
          .as("p90_price"))
  }

  /** String predicate pushdown: LIKE prefix/contains filters. */
  def stringFilters(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "part")
      .filter(col("p_name").like("small%") || col("p_name").like("%bolt"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_parts"),
        asDouble(sum(dec(col("p_retailprice")))).as("total_retail"))

  /** TPC-H Q6 shape: pure fact-scan forecast — every predicate
    * (shipdate range, discount band, quantity cap) pushes to the
    * parquet scan; the agg is one map-side-partial sum. The cheapest
    * possible plan at any scale: no join, no wide shuffle.
    */
  def forecastRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")) &&
        col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")) &&
        col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
    li.agg(asDouble(sum(dec(col("l_extendedprice")) *
      col("l_discount").cast("decimal(5,4)"))).as("revenue"))
  }

  /** TPC-H Q10 shape: returned-item revenue per customer — selective
    * date window on orders, returnflag filter on lineitem, one fact
    * shuffle on the order key, 25-row nation broadcast, top 20.
    */
  def returnedRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")) &&
        col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1997-04-01 00:00:00")))
      .select("o_orderkey", "o_custkey")
    val li = Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val c = Tables.load(spark, sfDir, "customer")
    val n = Tables.load(spark, sfDir, "nation")
    val discPrice = dec(col("l_extendedprice")) *
      (lit(1).cast("decimal(12,4)") - dec(col("l_discount")))
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(asDouble(sum(discPrice)).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q13 shape: order-count distribution over customers —
    * LEFT join so order-less customers land in bucket 0, then a
    * count-of-counts. Two shuffles (custkey, then count), both on
    * shrinking data.
    */
  def orderDistribution(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.load(spark, sfDir, "customer").select("c_custkey")
    val o = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select("o_orderkey", "o_custkey")
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** TPC-H Q15 shape: top supplier(s) by quarterly revenue — the
    * per-supplier agg is computed once and self-compared against its
    * own 1-row max (a broadcast-able scalar, not an sf-proportional
    * side).
    */
  def topSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") >= lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")) &&
        col("l_shipdate") < lit(java.sql.Timestamp.valueOf("1997-04-01 00:00:00")))
    val discPrice = dec(col("l_extendedprice")) *
      (lit(1).cast("decimal(12,4)") - dec(col("l_discount")))
    val rev = li.groupBy(col("l_suppkey"))
      .agg(asDouble(sum(discPrice)).as("total_revenue"))
    val top = rev.agg(max(col("total_revenue")).as("max_revenue"))
    val s = Tables.load(spark, sfDir, "supplier")
    rev.join(top, rev("total_revenue") === top("max_revenue"))
      .join(s, rev("l_suppkey") === s("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
  }

  /** TPC-H Q18 shape: large-volume orders — the HAVING pre-aggregate
    * keeps only heavy orders BEFORE joining back to orders/customer,
    * so the expensive joins see a tiny filtered key set.
    */
  def largeOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    val heavy = li.groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > 180)
    val o = Tables.load(spark, sfDir, "orders")
    val c = Tables.load(spark, sfDir, "customer")
    heavy.join(o, heavy("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** TPC-H Q19 shape: OR-of-ANDs brand/size/quantity bands — the
    * disjunction references both sides, so it rides the join
    * CONDITION (pairs drop inside the join, nothing post-filters);
    * part is planner-sized, not hint-broadcast.
    */
  def brandRevenue(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    val p = Tables.load(spark, sfDir, "part")
    val band = (p("p_brand") === "Brand#15" && p("p_size").between(1, 5) &&
        li("l_quantity").between(1, 11)) ||
      (p("p_brand") === "Brand#19" && p("p_size").between(1, 10) &&
        li("l_quantity").between(10, 20)) ||
      (p("p_brand") === "Brand#23" && p("p_size").between(1, 15) &&
        li("l_quantity").between(20, 30))
    val discPrice = dec(col("l_extendedprice")) *
      (lit(1).cast("decimal(12,4)") - dec(col("l_discount")))
    li.join(p, li("l_partkey") === p("p_partkey") && band)
      .agg(asDouble(sum(discPrice)).as("revenue"))
  }

  /** TPC-H Q22 shape: well-funded customers who never ordered —
    * the positive-balance average is a 1-row scalar (cross-joined,
    * planner broadcasts it for free), the "no orders" test is a
    * LEFT ANTI join on the order's customer key.
    */
  def idleCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    val c = Tables.load(spark, sfDir, "customer")
    // NOT avg(double): summation order varies per engine/partitioning
    // in the last ULP, and a boundary customer would flip. Exact
    // decimal sum finalized to double, then one IEEE division — the
    // same two numbers in every engine.
    val avgBal = c.filter(col("c_acctbal") > 0)
      .agg((asDouble(sum(dec(col("c_acctbal")))) /
        count(lit(1))).as("avg_bal"))
    // "no RECENT orders" — the synthetic generator gives nearly every
    // customer SOME order, so the unwindowed test is degenerate
    val o = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1999-01-01 00:00:00")))
      .select("o_custkey")
    val n = Tables.load(spark, sfDir, "nation")
    c.crossJoin(avgBal)
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .join(broadcast(n), col("c_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("numcust"),
        asDouble(sum(dec(col("c_acctbal")))).as("totacctbal"))
  }

  /** TPC-H Q2 shape: cheapest supplier per part within a region —
    * the correlated MIN subquery, decorrelated to a per-part min
    * pre-aggregate joined back on (part, cost). The derived supply
    * relation (min line price per part×supplier — the schema has no
    * partsupp) is built ONCE and reused for both the candidate rows
    * and the minimum, so the fact table is scanned once per side
    * with the region semi-filter applied before any per-part work.
    * Cost stays DECIMAL end-to-end; only the output converts.
    */
  def minCostSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    val s = Tables.load(spark, sfDir, "supplier")
    val n = Tables.load(spark, sfDir, "nation")
    val r = Tables.load(spark, sfDir, "region")
    // the part filter joins BEFORE the per-pair aggregate: the min is
    // per part, so discarding other parts early cannot change it,
    // and the fact table shrinks to the qualifying parts' lines
    // before any shuffle
    val p = Tables.load(spark, sfDir, "part")
      .filter(col("p_size") <= 15 && col("p_type") === "STANDARD")
    val supply = li.join(p, li("l_partkey") === p("p_partkey"))
      .groupBy(col("l_partkey"), col("l_suppkey"),
        col("p_partkey"), col("p_brand"))
      .agg(min(dec(col("l_extendedprice"))).as("cost"))
    val europe = supply
      .join(s, col("l_suppkey") === s("s_suppkey"))
      .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r.filter(col("r_name") === "EUROPE")),
        n("n_regionkey") === r("r_regionkey"))
    // correlated MIN as a window over the single europe instance —
    // lineitem is scanned and aggregated ONCE (the two-branch
    // decorrelation scans it twice; ReuseExchange does not fire
    // across the differing aggregate shapes)
    val w = Window.partitionBy(col("l_partkey"))
    europe
      .withColumn("min_cost", min(col("cost")).over(w))
      .filter(col("cost") === col("min_cost"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_brand"), asDouble(col("cost")).as("cost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
        col("p_partkey"))
      .limit(10)
  }

  /** TPC-H Q11 shape: parts carrying an outsized share of one
    * region's supplied value — GROUP BY HAVING > fraction-of-global
    * scalar. The global total is a 1-row decimal frame cross-joined
    * (planner broadcasts it); the share threshold compares DECIMAL
    * to DECIMAL, so the boundary part cannot flip between engines.
    * (Region, not single nation: the smallest test SF has nations
    * with zero suppliers, which would make the query degenerate.)
    */
  def importantParts(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    val s = Tables.load(spark, sfDir, "supplier")
    val n = Tables.load(spark, sfDir, "nation")
    val r = Tables.load(spark, sfDir, "region")
    val national = li
      .join(s, col("l_suppkey") === s("s_suppkey"))
      .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r.filter(col("r_name") === "ASIA")),
        n("n_regionkey") === r("r_regionkey"))
    val perPart = national.groupBy(col("l_partkey"))
      .agg(sum(dec(col("l_extendedprice"))).as("part_value"))
    val total = perPart.agg(sum(col("part_value")).as("total_value"),
      count(lit(1)).as("n_parts"))
    // "share > 2× the average share", spelled value·n > total·2 —
    // multiplications only, so the boundary part is exact in every
    // engine AND the threshold tracks the scale factor (a fixed
    // fraction empties as the part count grows)
    perPart.crossJoin(total)
      .filter(col("part_value") * col("n_parts") >
        col("total_value") * lit(2))
      .select(col("l_partkey"),
        asDouble(col("part_value")).as("part_value"))
  }

  /** TPC-H Q12 shape: order-priority mix per line class after a
    * fact-fact join — the two CASE counts ride one aggregation, the
    * ship-date year filter is pushed to the lineitem scan.
    */
  def priorityShipping(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_shipdate") >=
          lit(java.sql.Timestamp.valueOf("1997-01-01 00:00:00")) &&
        col("l_shipdate") <
          lit(java.sql.Timestamp.valueOf("1998-01-01 00:00:00")))
    val o = Tables.load(spark, sfDir, "orders")
    val isHigh = col("o_orderpriority") === "1-URGENT" ||
      col("o_orderpriority") === "2-HIGH"
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(count(when(isHigh, 1)).as("high_line_count"),
        count(when(!isHigh, 1)).as("low_line_count"))
  }

  /** TPC-H Q16 shape: how many distinct suppliers can provide each
    * part profile, excluding a supplier blacklist — the NOT IN
    * subquery becomes a LEFT ANTI join, and the distinct count runs
    * AFTER the anti join so excluded suppliers never inflate it.
    * (No partsupp in this schema: who-supplies-what derives from
    * shipped lines; the blacklist is negative-balance suppliers.)
    */
  def supplierCount(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    val p = Tables.load(spark, sfDir, "part")
      .filter(col("p_brand") =!= "Brand#15" && col("p_type") =!= "PROMO")
    val bad = Tables.load(spark, sfDir, "supplier")
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    li.select(col("l_partkey"), col("l_suppkey")).distinct()
      .join(bad, col("l_suppkey") === bad("s_suppkey"), "left_anti")
      .join(p, col("l_partkey") === p("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  /** TPC-H Q20 shape: suppliers who DOMINATE the supply of a
    * qualifying part — the nested semi-join chain: an inner per-part
    * aggregate sets the threshold, the per-supplier aggregate beats
    * it, and the surviving (part, supplier) pairs semi-filter the
    * supplier list. Quantities sum as DECIMAL so the 0.5× boundary
    * is engine-exact.
    */
  def excessSuppliers(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
    val p = Tables.load(spark, sfDir, "part")
      .filter(col("p_name").startsWith("small")).select(col("p_partkey"))
    val shipped = li.join(p, col("l_partkey") === p("p_partkey"))
    val perPair = shipped.groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(dec(col("l_quantity"))).as("pair_qty"))
    val perPart = shipped.groupBy(col("l_partkey").as("pp_partkey"))
      .agg(sum(dec(col("l_quantity"))).as("part_qty"),
        countDistinct(col("l_suppkey")).as("n_supp"))
    // dominance = shipped >2× the average supplier's share of the
    // part, spelled qty·n_supp > total·2: multiplication-only decimal
    // math (engine-exact boundary) that stays meaningful as supplier
    // counts grow with scale — a fixed fraction would empty out
    val dominant = perPair
      .join(perPart, col("l_partkey") === col("pp_partkey"))
      .filter(col("pair_qty") * col("n_supp") >
        col("part_qty") * lit(2))
      .select(col("l_suppkey")).distinct()
    Tables.load(spark, sfDir, "supplier")
      .join(dominant, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_name"), col("s_acctbal"))
  }

  /** TPC-H Q21 shape: suppliers who held up multi-supplier orders —
    * the EXISTS (another supplier on the order) / NOT EXISTS (another
    * supplier equally late) pair, expressed as per-order aggregates
    * joined back: the waiting supplier is the UNIQUE latest-shipping
    * supplier on a failed order with ≥2 suppliers. Everything
    * aggregates per order key first, so the fact table shuffles once
    * on l_orderkey and the joins see order-count-sized inputs.
    */
  def waitingSuppliers(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderstatus") === "F").select(col("o_orderkey"))
    val li = Tables.load(spark, sfDir, "lineitem")
      .join(o, col("l_orderkey") === o("o_orderkey"), "left_semi")
    val perOrder = li.groupBy(col("l_orderkey").as("g_orderkey"))
      .agg(max(col("l_shipdate")).as("max_shipdate"),
        countDistinct(col("l_suppkey")).as("n_suppliers"))
      .filter(col("n_suppliers") >= 2)
    val latest = li.join(perOrder,
      col("l_orderkey") === col("g_orderkey") &&
        col("l_shipdate") === col("max_shipdate"))
    val uniqueLate = latest.groupBy(col("l_orderkey"))
      .agg(countDistinct(col("l_suppkey")).as("n_late"))
      .filter(col("n_late") === 1).select(col("l_orderkey").as("u_orderkey"))
    val s = Tables.load(spark, sfDir, "supplier")
    latest.join(uniqueLate, col("l_orderkey") === col("u_orderkey"), "left_semi")
      .select(col("l_orderkey"), col("l_suppkey")).distinct()
      .join(s, col("l_suppkey") === s("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(10)
  }

  /** Time-intelligence: monthly revenue with month-over-month growth
    * via lag window. Growth is double division of two exact decimal-
    * derived doubles — engine-portable.
    */
  def momGrowth(spark: SparkSession, sfDir: String): DataFrame = {
    val monthly = Tables.load(spark, sfDir, "orders")
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(asDouble(sum(dec(col("o_totalprice")))).as("revenue"))
    val w = Window.orderBy(col("month"))
    monthly
      .withColumn("prev_revenue", lag(col("revenue"), 1).over(w))
      .withColumn("mom_growth",
        (col("revenue") - col("prev_revenue")) / col("prev_revenue"))
  }

  /** CASE-driven measures per order year. */
  def caseAggByYear(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "orders")
      .groupBy(year(col("o_orderdate")).as("order_year"))
      .agg(
        asDouble(sum(when(col("o_orderstatus") === "F", dec(col("o_totalprice")))
          .otherwise(lit(0).cast("decimal(12,4)")))).as("fulfilled_amount"),
        asDouble(sum(when(col("o_orderstatus") =!= "F", dec(col("o_totalprice")))
          .otherwise(lit(0).cast("decimal(12,4)")))).as("open_amount"),
        count(when(col("o_orderpriority") === "1-URGENT", 1)).as("n_urgent"))
}
