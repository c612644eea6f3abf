package graft

import java.nio.file.Files

import graft.tables.GraftTable
import org.apache.spark.sql.functions._

/** Bucketed graft tables: every write re-buckets through the same
  * murmur3-pmod Spark's bucketing uses, file names carry the bucket
  * id, and the registered scan surfaces the spec — so same-bucketed
  * tables join with zero exchange.
  */
class BucketedTableSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_bk_").resolve("t").toString

  test("bucketed create round-trips and names files by bucket") {
    val df = spark.range(0, 1000).select($"id", ($"id" % 7).as("v"))
    val path = tmp()
    val t = GraftTable.create(spark, path, df,
      bucketBy = Seq("id"), numBuckets = 4)
    assert(t.bucketSpec === Some((Seq("id"), 4)))
    assert(t.snapshot().count() === 1000)
    // every data file carries a parsable bucket id
    import org.apache.spark.sql.execution.datasources.BucketingUtils
    val files = Files.list(java.nio.file.Paths.get(path).resolve("files"))
      .iterator()
    while (files.hasNext) {
      val f = files.next().getFileName.toString
      assert(BucketingUtils.getBucketId(f).exists(b => b >= 0 && b < 4), f)
    }
  }

  test("append and DML preserve bucket alignment") {
    val t = GraftTable.create(spark, tmp(),
      spark.range(0, 100).select($"id", lit(1.0).as("x")),
      bucketBy = Seq("id"), numBuckets = 4)
    t.append(spark.range(100, 200).select($"id", lit(2.0).as("x")))
    t.delete($"id" < 10)
    t.update($"id" === 50, Map("x" -> lit(9.0)))
    assert(t.snapshot().count() === 190)
    assert(t.snapshot().where($"x" === 9.0).count() === 1)
    // rows of one id live in exactly one bucket file-set: group rows
    // by file and check each id appears in files of ONE bucket id
    import org.apache.spark.sql.execution.datasources.BucketingUtils
    val rows = t.snapshot()
      .select($"id", col("_metadata.file_path").as("f"))
      .as[(Long, String)].collect()
    val perId = rows.groupBy(_._1).values
    perId.foreach { rs =>
      val buckets = rs.map(r => BucketingUtils
        .getBucketId(r._2.split('/').last).get).toSet
      assert(buckets.size === 1, s"id ${rs.head._1} spans buckets $buckets")
    }
  }

  test("same-bucketed graft tables join with zero exchange") {
    val pa = tmp(); val pb = tmp()
    GraftTable.create(spark,
      pa, spark.range(0, 5000).select($"id", ($"id" * 2).as("a")),
      bucketBy = Seq("id"), numBuckets = 8)
    GraftTable.create(spark,
      pb, spark.range(0, 5000).select($"id", ($"id" * 3).as("b")),
      bucketBy = Seq("id"), numBuckets = 8)
    val a = spark.read.format("graft-table").load(pa)
    val b = spark.read.format("graft-table").load(pb)
    withSQLConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.sources.bucketing.autoBucketedScan.enabled" -> "false") {
      val j = a.join(b, "id")
      assert(j.count() === 5000)
      val exchanges = j.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }
      assert(exchanges.isEmpty,
        s"expected bucketed co-located join, found ${exchanges.size} exchange(s)")
    }
  }

  private def withSQLConf[T](pairs: (String, String)*)(f: => T): T = {
    val conf = spark.conf
    val olds = pairs.map { case (k, _) => k -> conf.getOption(k) }
    pairs.foreach { case (k, v) => conf.set(k, v) }
    try f finally olds.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("layout CTAS: CREATE TABLE ... PARTITIONED BY / CLUSTERED BY") {
    import graft.tables.{GraftSql, GraftTable}
    val p1 = tmp(); val p2 = tmp()
    spark.sql("DROP TABLE IF EXISTS gs_pctas")
    spark.sql("DROP TABLE IF EXISTS gs_bctas")
    try {
      GraftSql.sql(spark,
        s"CREATE TABLE gs_pctas USING `graft-table` PARTITIONED BY (v) " +
          s"LOCATION '$p1' AS SELECT id, CAST(id % 3 AS STRING) AS v " +
          "FROM range(90)")
      assert(GraftTable.load(spark, p1).partitionColumns === Seq("v"))
      assert(spark.table("gs_pctas").count() === 90)
      GraftSql.sql(spark,
        s"CREATE TABLE gs_bctas USING `graft-table` CLUSTERED BY (id) " +
          s"INTO 4 BUCKETS LOCATION '$p2' AS SELECT id FROM range(100)")
      assert(GraftTable.load(spark, p2).bucketSpec === Some((Seq("id"), 4)))
      assert(spark.table("gs_bctas").count() === 100)
    } finally {
      spark.sql("DROP TABLE IF EXISTS gs_pctas")
      spark.sql("DROP TABLE IF EXISTS gs_bctas")
    }
  }

  test("bucket columns are rename/drop-immutable; partitionBy conflicts") {
    val t = GraftTable.create(spark, tmp(),
      Seq((1L, "a")).toDF("id", "v"), bucketBy = Seq("id"), numBuckets = 2)
    intercept[IllegalArgumentException] { t.renameColumn("id", "id2") }
    intercept[IllegalArgumentException] { t.dropColumn("id") }
    intercept[IllegalArgumentException] {
      GraftTable.create(spark, tmp(), Seq((1L, "a")).toDF("id", "v"),
        partitionBy = Seq("v"), bucketBy = Seq("id"), numBuckets = 2)
    }
  }
}
