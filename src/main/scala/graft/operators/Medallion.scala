package graft.operators

import graft.Tables
import graft.Tables.{asDouble, dec}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Medallion (bronze→silver→gold) cleaning, re-expressing the
  * reference loan-cleaning pipeline (Instructor/01-Fraud-Delta.py:
  * 59-80 silver, 252-258 gold) on the star schema.
  *
  * Every transform is a Catalyst-native column expression (regexp,
  * substring, trim, cast, arithmetic): fully codegen'd, pushdown-
  * friendly, zero UDFs.
  */
object Medallion {

  /** Bronze: raw → typed with schema enforcement and audit columns.
    * (01-Fraud-Delta.py:37-51 ingests CSV with inferSchema; here the
    * enforcement is explicit casts + a load marker.)
    */
  def ingestBronze(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "orders")
      .select(
        col("o_orderkey").cast("long").as("o_orderkey"),
        col("o_custkey").cast("long").as("o_custkey"),
        col("o_orderstatus").cast("string").as("o_orderstatus"),
        col("o_totalprice").cast("double").as("o_totalprice"),
        col("o_orderdate").cast("timestamp").as("o_orderdate"),
        col("o_orderpriority").cast("string").as("o_orderpriority"),
        lit("orders_raw").as("src_table"))

  /** Silver: the 01-notebook cleaning, column for column:
    *  - `isin` status filter            (01-Fraud-Delta.py:63)
    *  - binary label derivation         (:64  bad_loan)
    *  - regexp strip + numeric cast     (:69-70  int_rate '%'→float)
    *  - substring-based component pull  (:71-72  issue_year)
    *  - derived duration                (:73  credit_length_in_years)
    *  - trim + regexp normalize + cast  (:78-80  emp_length)
    */
  def silverClean(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderstatus").isin("F", "O", "P"))
      .withColumn("bad_flag", (col("o_orderstatus") =!= "F").cast("string"))
      .withColumn("priority_num",
        regexp_replace(col("o_orderpriority"), "[^0-9]", "").cast("double"))
      .withColumn("priority_label",
        trim(regexp_replace(col("o_orderpriority"), "^[0-9]+-", "")))
      .withColumn("order_year", year(col("o_orderdate")))
      .withColumn("years_since_1995", (year(col("o_orderdate")) - lit(1995)))

  /** Gold: value collapsing + exact money enrichment
    * (01-Fraud-Delta.py:254 verification_status collapse, :258
    * `net = round(total_pymnt - loan_amnt, 2)`).
    * net := round(Σ line charges − header price, 2), decimal-exact.
    */
  def goldEnrich(spark: SparkSession, sfDir: String): DataFrame = {
    val o = silverClean(spark, sfDir)
      .withColumn("priority_group",
        trim(regexp_replace(col("o_orderpriority"), "1-URGENT|2-HIGH", "EXPEDITED")))
    val li = Tables.load(spark, sfDir, "lineitem")
    val discPrice = dec(col("l_extendedprice")) * (lit(1).cast("decimal(12,4)") - dec(col("l_discount")))
    val charges = li.groupBy(col("l_orderkey"))
      .agg(sum(discPrice).as("line_charges"))
    o.join(charges, o("o_orderkey") === charges("l_orderkey"), "left")
      .withColumn("net", asDouble(round(
        coalesce(col("line_charges"), lit(0).cast("decimal(12,4)")) - dec(col("o_totalprice")), 2)))
      .drop("l_orderkey", "line_charges")
  }
}
