package graft

import java.nio.file.Files

import graft.tables.{GraftTable, GraftTableFileIndex}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Batch read path for GraftTable: format("graft-table") relation,
  * catalog-registered SQL, scan-time data skipping from commit-log
  * stats, and versionAsOf time travel.
  */
class Dsv2Spec extends SparkSpec {
  import spark.implicits._

  private def freshTable(parts: Int = 8): (GraftTable, String) = {
    val dir = Files.createTempDirectory("graft_dsv2_").resolve("t").toString
    val t = GraftTable.create(spark, dir,
      Tables.load(spark, sf, "orders").repartition(parts, $"o_orderkey"))
    (t, dir)
  }

  test("format graft-table read equals snapshot") {
    val (t, dir) = freshTable()
    val viaFormat = spark.read.format("graft-table").load(dir)
    assert(viaFormat.schema === t.snapshot().schema)
    assert(viaFormat.count() === t.snapshot().count())
    assert(viaFormat.exceptAll(t.snapshot()).count() === 0)
  }

  test("selective predicate prunes files inside scan planning") {
    val (t, dir) = freshTable()
    t.clusterBy(8, "o_custkey")
    val total = t.snapshotInfo(t.latestVersion).files.size
    val df = spark.read.format("graft-table").load(dir)
      .where($"o_custkey" === 7L)
    val scan = df.queryExecution.executedPlan.collectFirst {
      case s: FileSourceScanExec => s
    }.get
    df.collect()
    val scanned = scan.metrics("numFiles").value
    assert(total === 8, s"expected 8 clustered files, got $total")
    assert(scanned < total,
      s"scan read $scanned of $total files — no data skipping")
    // and the pruned read still agrees with the unpruned one
    assert(df.count() ===
      t.snapshot().where($"o_custkey" === 7L).count())
  }

  test("timestamp predicates prune through commit-log stats") {
    // the 100 TB bread-and-butter: date-range scans. Parquet stores
    // timestamps as INT64 micros, so footer stats and the pushed
    // literal live in the same domain.
    val (t, dir) = freshTable()
    t.clusterBy(8, "o_orderdate")
    val df = spark.read.format("graft-table").load(dir)
      .where($"o_orderdate" >=
        java.sql.Timestamp.valueOf("1997-06-01 00:00:00"))
    val scan = df.queryExecution.executedPlan.collectFirst {
      case s: FileSourceScanExec => s
    }.get
    df.collect()
    val scanned = scan.metrics("numFiles").value
    assert(scanned < 8, s"scanned $scanned of 8 files — no timestamp skipping")
    assert(df.count() === t.snapshot()
      .where($"o_orderdate" >= java.sql.Timestamp.valueOf("1997-06-01 00:00:00"))
      .count())
  }

  test("LIKE-prefix predicates prune through string stats") {
    val (t, dir) = freshTable()
    t.clusterBy(8, "o_orderpriority")
    val df = spark.read.format("graft-table").load(dir)
      .where($"o_orderpriority".startsWith("5-"))
    val scan = df.queryExecution.executedPlan.collectFirst {
      case s: FileSourceScanExec => s
    }.get
    df.collect()
    assert(scan.metrics("numFiles").value < 8,
      s"scanned ${scan.metrics("numFiles").value} of 8 files")
    assert(df.count() ===
      t.snapshot().where($"o_orderpriority".startsWith("5-")).count())
  }

  test("string equality predicates prune through ASCII min/max stats") {
    val (t, dir) = freshTable()
    t.clusterBy(8, "o_orderpriority")
    val df = spark.read.format("graft-table").load(dir)
      .where($"o_orderpriority" === "5-LOW")
    val scan = df.queryExecution.executedPlan.collectFirst {
      case s: FileSourceScanExec => s
    }.get
    df.collect()
    assert(scan.metrics("numFiles").value < 8,
      s"scanned ${scan.metrics("numFiles").value} of 8 files")
    assert(df.count() ===
      t.snapshot().where($"o_orderpriority" === "5-LOW").count())
  }

  test("CREATE TABLE USING graft-table: catalog SQL reads and prunes") {
    val (t, dir) = freshTable()
    t.clusterBy(8, "o_custkey")
    spark.sql("DROP TABLE IF EXISTS gt_orders")
    spark.sql(
      s"CREATE TABLE gt_orders USING `graft-table` OPTIONS (path '$dir')")
    try {
      val df = spark.sql(
        "SELECT o_orderkey, o_totalprice FROM gt_orders WHERE o_custkey = 7")
      val scan = df.queryExecution.executedPlan.collectFirst {
        case s: FileSourceScanExec => s
      }.get
      df.collect()
      assert(scan.metrics("numFiles").value < 8)
      assert(df.count() === t.snapshot().where($"o_custkey" === 7L).count())
      // column pruning reaches the parquet scan
      assert(scan.requiredSchema.fieldNames.toSet ===
        Set("o_orderkey", "o_totalprice", "o_custkey"))
    } finally spark.sql("DROP TABLE IF EXISTS gt_orders")
  }

  test("CREATE TABLE ... USING graft-table AS SELECT (CTAS)") {
    spark.sql("DROP TABLE IF EXISTS gt_ctas")
    val wh = Files.createTempDirectory("graft_ctas_").toString
    spark.sql(
      s"""CREATE TABLE gt_ctas USING `graft-table` OPTIONS (path '$wh/t') AS
         |SELECT o_orderkey, o_totalprice
         |FROM parquet.`$sf/orders.parquet` WHERE o_custkey <= 50""".stripMargin)
    try {
      val viaSql = spark.table("gt_ctas")
      val expect = spark.read.parquet(s"$sf/orders.parquet")
        .where($"o_custkey" <= 50).count()
      assert(viaSql.count() === expect && expect > 0)
      // it's a real graft table underneath: history + DML work
      val t = GraftTable.load(spark, s"$wh/t")
      assert(t.history().count() === 1)
    } finally spark.sql("DROP TABLE IF EXISTS gt_ctas")
  }

  test("versionAsOf option time-travels the relation") {
    val (t, dir) = freshTable()
    val before = t.snapshot().count()
    t.delete($"o_orderstatus" === "P")
    val v0 = spark.read.format("graft-table")
      .option("versionAsOf", "0").load(dir)
    assert(v0.count() === before)
    assert(spark.read.format("graft-table").load(dir).count() ===
      t.snapshot().count())
  }

  test("file index keeps files without stats and non-prunable filters") {
    val (t, dir) = freshTable()
    val idx = new GraftTableFileIndex(spark, t, t.latestVersion)
    // a filter shape the interval check can't bound → full keep
    val df = spark.read.format("graft-table").load(dir)
      .where($"o_orderstatus" === "P")
    assert(df.count() === t.snapshot().where($"o_orderstatus" === "P").count())
    assert(idx.inputFiles.length === t.snapshotInfo(t.latestVersion).files.size)
  }

  test("df.write.format(graft-table) maps SaveModes onto commits") {
    val dir = Files.createTempDirectory("graft_dsv2w_").resolve("t").toString
    val d1 = spark.range(1, 4).select($"id", ($"id" * 2).as("v"))
    d1.write.format("graft-table").save(dir)
    val t = GraftTable.load(spark, dir)
    assert(t.snapshot().count() === 3)
    spark.range(4, 6).select($"id", ($"id" * 2).as("v"))
      .write.format("graft-table").mode("append").save(dir)
    assert(t.snapshot().count() === 5)
    assert(t.history().select("operation").as[String].collect().toSeq ===
      Seq("APPEND", "CREATE")) // newest first
    spark.range(10, 12).select($"id", ($"id" * 2).as("v"))
      .write.format("graft-table").mode("overwrite").save(dir)
    assert(t.snapshot().as[(Long, Long)].collect().toSet ===
      Set((10L, 20L), (11L, 22L)))
    intercept[IllegalArgumentException] {
      d1.write.format("graft-table").mode("errorifexists").save(dir)
    }
  }

  test("overwrite with a different schema needs overwriteSchema=true") {
    val dir = Files.createTempDirectory("graft_dsv2o_").resolve("t").toString
    spark.range(1, 3).select($"id", ($"id" * 2).as("v"))
      .write.format("graft-table").save(dir)
    intercept[IllegalArgumentException] {
      spark.range(1, 3).select($"id", lit("s").as("tag"))
        .write.format("graft-table").mode("overwrite").save(dir)
    }
    spark.range(1, 3).select($"id", lit("s").as("tag"))
      .write.format("graft-table").mode("overwrite")
      .option("overwriteSchema", "true").save(dir)
    assert(GraftTable.load(spark, dir).snapshot().columns.toSeq
      === Seq("id", "tag"))
  }

  test("overwrite guard ignores identity/generated columns and case") {
    val dir = Files.createTempDirectory("graft_dsv2oi_").resolve("t").toString
    GraftTable.create(spark, dir,
      Seq((1.0, "a")).toDF("x", "v"),
      generated = Map("x2" -> "x * 2"), identity = Some("row_id"))
    // a legal overwrite frame omits the identity column and may omit
    // generated ones; column order/case must not matter either
    spark.createDataFrame(Seq(("b", 9.0))).toDF("V", "x")
      .write.format("graft-table").mode("overwrite").save(dir)
    val t = GraftTable.load(spark, dir)
    assert(t.snapshot().count() === 1)
    assert(t.snapshot().select("x2").as[Double].head() === 18.0)
    assert(t.snapshot().select("row_id").as[Long].head() === 1L)
  }

  test("overwrite with mergeSchema unions old and new columns") {
    val dir = Files.createTempDirectory("graft_dsv2om_").resolve("t").toString
    spark.range(1, 3).select($"id", ($"id" * 2).as("v"))
      .write.format("graft-table").save(dir)
    spark.range(9, 10).select($"id", lit("s").as("tag"))
      .write.format("graft-table").mode("overwrite")
      .option("mergeSchema", "true").save(dir)
    val t = GraftTable.load(spark, dir)
    assert(t.snapshot().columns.toSet === Set("id", "tag", "v"))
    val row = t.snapshot().select("id", "tag", "v")
      .as[(Long, String, Option[Long])].head()
    assert(row === ((9L, "s", None)))
  }

  test("mergeSchema option evolves the schema on append") {
    val dir = Files.createTempDirectory("graft_dsv2m_").resolve("t").toString
    spark.range(1, 3).select($"id").write.format("graft-table").save(dir)
    // new column without the option: schema enforcement rejects
    intercept[IllegalArgumentException] {
      spark.range(3, 5).select($"id", lit("x").as("tag"))
        .write.format("graft-table").mode("append").save(dir)
    }
    spark.range(3, 5).select($"id", lit("x").as("tag"))
      .write.format("graft-table").mode("append")
      .option("mergeSchema", "true").save(dir)
    val t = GraftTable.load(spark, dir)
    assert(t.snapshot().columns.toSeq === Seq("id", "tag"))
    assert(t.snapshot().where($"tag".isNull).count() === 2)
    assert(t.snapshot().where($"tag" === "x").count() === 2)
  }

  test("writeStream.format(graft-table) sinks exactly once per batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[Long]
    val dir = Files.createTempDirectory("graft_dsv2s_").resolve("t").toString
    val ckpt = Files.createTempDirectory("graft_dsv2s_ckpt_").toString
    val q = mem.toDF().writeStream.format("graft-table")
      .option("path", dir).option("checkpointLocation", ckpt).start()
    mem.addData(1L, 2L, 3L)
    q.processAllAvailable()
    mem.addData(4L, 5L)
    q.processAllAvailable()
    q.stop()
    val t = GraftTable.load(spark, dir)
    assert(t.snapshot().as[Long].collect().toSet === Set(1L, 2L, 3L, 4L, 5L))
    // replayed epoch with the sink's appId is a no-op
    val before = t.latestVersion
    t.appendIfNew(Seq(9L).toDF("value"), batchId = 0, appId = ckpt)
    assert(t.latestVersion === before)
    // and the round-trip: the sunk table streams back out
    assert(spark.read.format("graft-table").load(dir).count() === 5)
  }

  test("readChangeFeed option reads the batch CDF between versions") {
    val (t, dir) = freshTable(parts = 2)
    t.delete($"o_orderstatus" === "P")                    // v1
    t.update($"o_orderpriority" === "1-URGENT",
      Map("o_totalprice" -> ($"o_totalprice" + 1.0)))     // v2
    val feed = spark.read.format("graft-table")
      .option("readChangeFeed", "true")
      .option("startingVersion", "1").load(dir)
    assert(feed.columns.contains("_change_type"))
    val byType = feed.groupBy($"_change_type").count()
      .as[(String, Long)].collect().toMap
    assert(byType.keySet === Set("delete", "update_preimage", "update_postimage"))
    assert(byType("update_preimage") === byType("update_postimage"))
    // bounded window: only v1
    val v1only = spark.read.format("graft-table")
      .option("readChangeFeed", "true")
      .option("startingVersion", "1").option("endingVersion", "1").load(dir)
    assert(v1only.select($"_change_type").distinct()
      .as[String].collect().toSeq === Seq("delete"))
  }

  test("batch CDF timestamp bounds match their version spellings") {
    val (t, dir) = freshTable(parts = 2)
    Thread.sleep(30)
    t.delete($"o_orderstatus" === "P")                    // v1
    Thread.sleep(30)
    val betweenMs = System.currentTimeMillis()
    Thread.sleep(30)
    t.update($"o_orderpriority" === "1-URGENT",
      Map("o_totalprice" -> ($"o_totalprice" + 1.0)))     // v2
    val between = new java.sql.Timestamp(betweenMs).toString
    def feed(opts: (String, String)*) = {
      val r = opts.foldLeft(spark.read.format("graft-table")
        .option("readChangeFeed", "true")) { case (b, (k, v)) => b.option(k, v) }
        .load(dir)
      r.groupBy($"_change_type").count().as[(String, Long)].collect().toMap
    }
    // starting = changes AT or AFTER the instant → v2 only, exactly
    // like startingVersion 2
    assert(feed("startingTimestamp" -> between) ===
      feed("startingVersion" -> "2"))
    // ending = last commit at or before the instant → v1 only
    assert(feed("startingVersion" -> "1", "endingTimestamp" -> between) ===
      feed("startingVersion" -> "1", "endingVersion" -> "1"))
    // ambiguous spellings are refused
    intercept[IllegalArgumentException] {
      feed("startingVersion" -> "1", "startingTimestamp" -> between)
    }
    intercept[IllegalArgumentException] {
      feed("endingVersion" -> "1", "endingTimestamp" -> between)
    }
  }

  test("accurate sizeInBytes lets the planner broadcast small graft tables") {
    val dir = Files.createTempDirectory("graft_bc_").resolve("t").toString
    GraftTable.create(spark, dir,
      Tables.load(spark, sf, "nation"))
    val small = spark.read.format("graft-table").load(dir)
    val big = Tables.load(spark, sf, "customer")
    val plan = big.join(small, big("c_nationkey") === small("n_nationkey"))
      .queryExecution.sparkPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("decimal predicates never mis-prune (unscaled footer stats descaled)") {
    // parquet stores DecimalType(10,2) as unscaled INT64 — stats must
    // be descaled or a scaled literal falls outside every interval
    // and the scan silently returns nothing
    val dir = Files.createTempDirectory("graft_decimal_").resolve("t").toString
    val df = spark.range(1, 101)
      .select($"id", ($"id".cast("decimal(10,2)") / 4).as("price"))
    GraftTable.create(spark, dir, df)
    val read = spark.read.format("graft-table").load(dir)
      .where($"price" === java.math.BigDecimal.valueOf(2.50))
    assert(read.count() === df.where($"price" === 2.50).count())
    assert(read.count() === 1)
    // range predicate too
    assert(spark.read.format("graft-table").load(dir)
      .where($"price" > java.math.BigDecimal.valueOf(20.0)).count() ===
      df.where($"price" > 20.0).count())
  }

  test("read after additive schema evolution pads old files with nulls") {
    val (t, dir) = freshTable(parts = 2)
    val extra = t.snapshot().limit(10)
      .withColumn("o_channel", lit("web"))
    t.append(extra, evolve = true)
    val df = spark.read.format("graft-table").load(dir)
    assert(df.schema.fieldNames.contains("o_channel"))
    assert(df.where($"o_channel".isNull).count() === t.snapshot().count() - 10)
  }
}
