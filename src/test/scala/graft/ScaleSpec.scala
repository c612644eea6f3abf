package graft

import java.nio.file.Files

import graft.operators.Skew
import graft.tables.GraftTable
import org.apache.spark.sql.functions._

/** Specs for the at-scale machinery: skew mitigation, bucketed
  * co-located joins, partition pruning, multi-dim Z-order.
  */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns exactly the plain join's rows") {
    val o = Tables.load(spark, sf, "orders")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    val c = Tables.load(spark, sf, "customer")
      .select($"c_custkey".as("o_custkey"), $"c_mktsegment")
    val plain = o.join(c, Seq("o_custkey"))
    val salted = Skew.saltedJoin(o, c, "o_custkey", nSalts = 8)
    assert(salted.count() === plain.count())
    assert(salted.select(o.columns.head, o.columns.tail: _*)
      .except(plain.select(o.columns.head, o.columns.tail: _*)).count() === 0)
  }

  test("salted two-phase sum equals direct sum") {
    val o = Tables.load(spark, sf, "orders")
    val direct = o.groupBy($"o_custkey")
      .agg(sum(Tables.dec($"o_totalprice")).as("total"))
    val salted = Skew.saltedSum(o, "o_custkey", Tables.dec($"o_totalprice"))
    assert(salted.join(direct.withColumnRenamed("total", "t2"), Seq("o_custkey"))
      .where($"total" =!= $"t2").count() === 0)
    assert(salted.count() === direct.count())
  }

  test("bucketed tables join without a shuffle exchange") {
    // external tables via option("path") — warehouse dir is static conf
    val wh = Files.createTempDirectory("graft_wh_").toString
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val o = Tables.load(spark, sf, "orders")
      val c = Tables.load(spark, sf, "customer")
      o.write.bucketBy(8, "o_custkey").sortBy("o_custkey")
        .option("path", s"$wh/ob").mode("overwrite").saveAsTable("orders_b")
      c.write.bucketBy(8, "c_custkey").sortBy("c_custkey")
        .option("path", s"$wh/cb").mode("overwrite").saveAsTable("customer_b")
      val j = spark.table("orders_b").join(spark.table("customer_b"),
        $"o_custkey" === $"c_custkey")
      val plan = j.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), plan)
      assert(j.count() === o.join(c, o("o_custkey") === c("c_custkey")).count())
    } finally {
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }

  test("hive-style partitioned write prunes partitions at the scan") {
    val dir = Files.createTempDirectory("graft_part_").resolve("o").toString
    Tables.load(spark, sf, "orders")
      .withColumn("order_year", year($"o_orderdate"))
      .write.partitionBy("order_year").parquet(dir)
    val q = spark.read.parquet(dir).where($"order_year" === 1997)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(order_year"), plan.take(600))
    val expect = Tables.load(spark, sf, "orders")
      .where(year($"o_orderdate") === 1997).count()
    assert(q.count() === expect)
  }

  test("z-order clustering narrows per-file ranges on BOTH keys") {
    val dir = Files.createTempDirectory("graft_z_").resolve("t").toString
    val t = GraftTable.create(spark, dir, Tables.load(spark, sf, "orders"))
    t.clusterByZOrder(8, "o_custkey", "o_orderkey")
    val snap = t.snapshot()
    assert(snap.count() === Tables.load(spark, sf, "orders").count())
    val stats = snap.groupBy(input_file_name().as("f"))
      .agg((max($"o_custkey") - min($"o_custkey")).as("spanA"),
        (max($"o_orderkey") - min($"o_orderkey")).as("spanB"),
        count(lit(1)).as("n"))
      .as[(String, Long, Long, Long)].collect()
    val globalA = 1499.0; val globalB = 1500.0
    // every file must be narrow on at least one dim, and the average
    // span must be well below the global range on BOTH dims
    val avgA = stats.map(_._2).sum.toDouble / stats.length
    val avgB = stats.map(_._3).sum.toDouble / stats.length
    assert(avgA < globalA * 0.8, s"avg custkey span $avgA")
    assert(avgB < globalB * 0.8, s"avg orderkey span $avgB")
  }

  test("stats-based data skipping reads only overlapping files") {
    val dir = Files.createTempDirectory("graft_skip_").resolve("t").toString
    val t = GraftTable.create(spark, dir, Tables.load(spark, sf, "orders"))
    t.clusterBy(8, "o_custkey")
    val all = t.snapshot().select(input_file_name()).distinct().count()
    val pruned = t.snapshotPruned("o_custkey", 0, 100)
    val readFiles = pruned.select(input_file_name()).distinct().count()
    assert(readFiles < all, s"read $readFiles of $all files")
    // pruned read + row filter ≡ full read + row filter
    val expect = t.snapshot().where($"o_custkey".between(0, 100)).count()
    assert(pruned.where($"o_custkey".between(0, 100)).count() === expect)
    assert(expect > 0)
  }

  test("changesSince surfaces only newly appended rows") {
    val dir = Files.createTempDirectory("graft_cdc_").resolve("t").toString
    val t = GraftTable.create(spark, dir, Seq((1L, "a")).toDF("id", "v"))
    t.append(Seq((2L, "b"), (3L, "c")).toDF("id", "v"))
    val delta = t.changesSince(0).orderBy("id").as[(Long, String)].collect()
    assert(delta === Array((2L, "b"), (3L, "c")))
    assert(t.changesSince(t.latestVersion).count() === 0)
  }

  test("3-key z-order narrows per-file ranges on EVERY key") {
    val dir = Files.createTempDirectory("graft_z3_").resolve("t").toString
    val t = GraftTable.create(spark, dir,
      Tables.load(spark, sf, "orders")
        .withColumn("price_band",
          floor($"o_totalprice" / 1000).cast("long")))
    t.clusterByZOrder(8, "o_custkey", "o_orderkey", "price_band")
    val snap = t.snapshot()
    val stats = snap.groupBy(input_file_name().as("f"))
      .agg((max($"o_custkey") - min($"o_custkey")).as("sA"),
        (max($"o_orderkey") - min($"o_orderkey")).as("sB"),
        (max($"price_band") - min($"price_band")).as("sC"))
      .as[(String, Long, Long, Long)].collect()
    val Seq(gA, gB, gC) = Seq("o_custkey", "o_orderkey", "price_band").map { k =>
      val r = snap.agg((max(col(k)) - min(col(k))).cast("double")).head.getDouble(0)
      r
    }
    def avg(f: ((String, Long, Long, Long)) => Long) =
      stats.map(f).sum.toDouble / stats.length
    assert(avg(_._2) < gA * 0.8, s"custkey span ${avg(_._2)} of $gA")
    assert(avg(_._3) < gB * 0.8, s"orderkey span ${avg(_._3)} of $gB")
    assert(avg(_._4) < gC * 0.8, s"price_band span ${avg(_._4)} of $gC")
    // 8 files, data intact
    assert(snap.count() === Tables.load(spark, sf, "orders").count())
  }

  test("sf-proportional join sides degrade to shuffle joins, not driver OOM") {
    // customer/supplier/part carry no broadcast hint: under the default
    // threshold the planner broadcasts them at test scale, but when the
    // build side outgrows the threshold (the 100 TB case, simulated by
    // shrinking the threshold) the SAME query plans a shuffle join.
    import graft.operators.Analytics
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "10485760")
      val small = Analytics.shippingPriority(spark, sf)
        .queryExecution.sparkPlan.toString
      assert(small.contains("BroadcastHashJoin"), small)
      spark.conf.set(key, "64")
      val big = Analytics.shippingPriority(spark, sf)
        .queryExecution.sparkPlan.toString
      assert(!big.contains("BroadcastHashJoin"), big)
      assert(big.contains("SortMergeJoin") || big.contains("ShuffledHashJoin"), big)
    } finally spark.conf.set(key, prev)
  }
}
