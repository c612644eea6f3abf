package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal/interval join operators Spark lacks natively
  * (SURVEY.md §2.D), composed from built-ins so Catalyst/AQE keep
  * full control of the physical plan.
  */
object TemporalJoins {

  /** As-of join: for each event, the most recent order of the same
    * customer with o_orderdate <= ts (left semantics: unmatched
    * events keep a null match).
    *
    * Implementation is the union+window composition: tag both sides,
    * union, and take `last(order_time) ignoreNulls` over a window
    * ordered by (time, side) per key. ONE shuffle on the key, no
    * range cross-join, no per-row driver work — the classic
    * scalable as-of shape (also how Flink/kdb-style asof is
    * expressed relationally). Order rows sort before events at equal
    * timestamps so the boundary (ts == o_orderdate) matches.
    */
  def asofEventsOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id").as("k"), col("ts").as("t"),
        col("event_id"), col("event_type"))
      .withColumn("is_order", lit(0))
      .withColumn("ord_date", lit(null).cast("timestamp"))
    val ord = Tables.load(spark, sfDir, "orders")
      .select(col("o_custkey").as("k"), col("o_orderdate").as("t"))
      .withColumn("event_id", lit(null).cast("long"))
      .withColumn("event_type", lit(null).cast("string"))
      .withColumn("is_order", lit(1))
      .withColumn("ord_date", col("t"))
    val w = Window.partitionBy(col("k"))
      .orderBy(col("t"), col("is_order").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.unionByName(ord)
      .withColumn("matched_orderdate", last(col("ord_date"), ignoreNulls = true).over(w))
      .filter(col("is_order") === 0)
      .select(col("event_id"), col("k").as("user_id"), col("t").as("ts"),
        col("event_type"), col("matched_orderdate"))
  }

  /** Band (interval) join: count lineitems whose extendedprice falls
    * in each part's price band [5·p_retailprice, 5·p_retailprice+500).
    *
    * Scalable shape: both sides are bucketed by price/width and
    * equi-joined on bucket id; a band of width ≤ bucketWidth spans at
    * most 2 buckets, so the band side explodes into exactly those
    * buckets. Turns an O(n·m) theta-join into a keyed hash join with
    * bounded duplication — the standard interval-bucketing trick.
    */
  def rangeJoinPriceBand(spark: SparkSession, sfDir: String): DataFrame = {
    val width = 500.0
    val p = Tables.load(spark, sfDir, "part")
      .select(col("p_partkey"), (col("p_retailprice") * 5).as("lo"))
      .withColumn("hi", col("lo") + width)
    val pBuckets = p.withColumn("bucket",
      explode(sequence(floor(col("lo") / width).cast("long"),
        floor(col("hi") / width).cast("long"))))
    val li = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_extendedprice"))
      .withColumn("bucket", floor(col("l_extendedprice") / width).cast("long"))
    val matched = pBuckets.join(li, Seq("bucket"))
      .filter(col("l_extendedprice") >= col("lo") &&
        col("l_extendedprice") < col("hi"))
      .groupBy(col("p_partkey")).agg(count(lit(1)).as("n_lines"))
    p.select(col("p_partkey")).join(matched, Seq("p_partkey"), "left")
      .select(col("p_partkey"), coalesce(col("n_lines"), lit(0L)).as("n_lines"))
  }
}
