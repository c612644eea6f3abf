package graft

import java.nio.file.Files

import graft.tables.GraftTable
import org.apache.spark.sql.functions._

/** CONVERT over a Hive-partitioned (`k=v` layout) parquet directory —
  * the most common asset a migrating user owns (their existing
  * `df.write.partitionBy(...)` output; reference analog: registering
  * existing tables, Instructor/01-Fraud-Delta.py:116-134). Adoption is
  * zero-copy: `k=v` segments parse into commit-log partition tuples,
  * pruning and partition-aware DML are live from the first commit,
  * and reads reinject the path-encoded partition values (the physical
  * files do not contain the partition columns).
  */
class HiveConvertSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_hive_").resolve("t").toString

  /** A two-level hive layout written by Spark itself. */
  private def writeHiveDir(): String = {
    val dir = tmp()
    Tables.load(spark, sf, "orders")
      .withColumn("o_year", year($"o_orderdate"))
      .write.partitionBy("o_year", "o_orderpriority").parquet(dir)
    dir
  }

  test("convert adopts a two-level hive dir with partitioning live") {
    val dir = writeHiveDir()
    val expected = spark.read.parquet(dir)
    val t = GraftTable.convert(spark, dir)
    assert(t.partitionColumns === Seq("o_year", "o_orderpriority"))
    val snap = t.snapshot()
    // partition columns surface with discovery-inferred types
    assert(snap.schema("o_year").dataType ===
      org.apache.spark.sql.types.IntegerType)
    assert(snap.count() === expected.count())
    // full row fidelity including injected partition values
    val key = concat_ws("|", $"o_orderkey", $"o_year", $"o_orderpriority",
      $"o_totalprice")
    assert(snap.select(key).as[String].collect().sorted
      === expected.select(key).as[String].collect().sorted)
  }

  test("partition pruning hits the commit-log tuples, not the data") {
    val dir = writeHiveDir()
    val t = GraftTable.convert(spark, dir)
    val all = t.snapshot().select("o_year").distinct().as[Int].collect()
    assert(all.length > 1, "need multiple partitions for a pruning test")
    val y = all.min
    val cand = t.candidateFiles($"o_year" === y && $"o_orderpriority" === "1-URGENT")
    assert(cand.nonEmpty)
    // every surviving candidate is from exactly the asked-for partition
    assert(cand.forall(f =>
      f.contains(s"o_year=$y") && f.contains("o_orderpriority=1-URGENT")))
    val total = t.snapshot().inputFiles.length
    assert(cand.length < total,
      s"pruning kept all $total files — partition tuples not consulted")
  }

  test("registered scan injects partition values and prunes files") {
    val dir = writeHiveDir()
    GraftTable.convert(spark, dir)
    val df = spark.read.format("graft-table").load(dir)
    val expected = spark.read.parquet(dir)
    assert(df.count() === expected.count())
    val y = expected.select(min("o_year")).as[Int].head()
    val filtered = df.where($"o_year" === y && $"o_orderpriority" === "1-URGENT")
    val scan = filtered.queryExecution.executedPlan.collectFirst {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }.get
    assert(filtered.collect().length.toLong ===
      expected.where($"o_year" === y && $"o_orderpriority" === "1-URGENT").count())
    // scan metrics: the planned scan opened only the pruned
    // partition's files (partition tuples evaluated in the FileIndex)
    val total = expected.inputFiles.length
    val scanned = scan.metrics("numFiles").value
    assert(scanned > 0 && scanned < total,
      s"scan read $scanned of $total files — partition pruning inert")
  }

  test("DML is live immediately: partition delete, update, append") {
    val dir = writeHiveDir()
    val t = GraftTable.convert(spark, dir)
    val before = spark.read.parquet(dir)
    val total = before.count()
    val urgent = before.where($"o_orderpriority" === "1-URGENT").count()

    // partition-scoped DELETE: blast radius is the partition's files
    t.delete($"o_orderpriority" === "1-URGENT")
    assert(t.snapshot().count() === total - urgent)
    assert(t.snapshot().where($"o_orderpriority" === "1-URGENT").count() === 0)

    // UPDATE rewrites into self-describing graft files; mixed
    // (adopted + rewritten) snapshots stay consistent
    t.update($"o_orderstatus" === "F", Map("o_totalprice" -> lit(0.0)))
    val f = t.snapshot().where($"o_orderstatus" === "F")
    assert(f.count() > 0)
    assert(f.where($"o_totalprice" =!= 0.0).count() === 0)

    // append lands partition-aligned with recorded tuples
    val extra = t.snapshot().limit(7)
      .withColumn("o_year", lit(1901))
    t.append(extra)
    assert(t.snapshot().where($"o_year" === 1901).count() === 7)
    val cand99 = t.candidateFiles($"o_year" === 1901)
    assert(cand99.nonEmpty && cand99.forall(_.startsWith("files/")))

    // time travel: v0 is the pristine adopted state
    assert(t.snapshotAt(0).count() === total)
  }

  test("null and escaped partition values round-trip") {
    val dir = tmp()
    Seq((1L, "plain", "a"), (2L, null, "b"), (3L, "has space", "c"),
      (4L, "x=y", "d"))
      .toDF("id", "pk", "v")
      .write.partitionBy("pk").parquet(dir)
    val t = GraftTable.convert(spark, dir)
    val snap = t.snapshot()
    assert(snap.where($"pk".isNull).select("id").as[Long].collect().toSeq === Seq(2L))
    assert(snap.where($"pk" === "has space").count() === 1)
    assert(snap.where($"pk" === "x=y").select("id").as[Long].head() === 4L)
    // exact pruning on an escaped value
    val cand = t.candidateFiles($"pk" === "x=y")
    assert(cand.length === 1)
  }

  test("flat convert still works and refuses ambiguous layouts") {
    val dir = tmp()
    Tables.load(spark, sf, "nation").write.parquet(dir)
    val t = GraftTable.convert(spark, dir)
    assert(t.partitionColumns.isEmpty)
    assert(t.snapshot().count() === 25)

    // nested non-hive dirs: loud refusal, not a half-adopt
    val bad = tmp()
    Tables.load(spark, sf, "nation").write.parquet(bad + "/sub")
    Tables.load(spark, sf, "region").write.parquet(bad + "/other")
    intercept[IllegalArgumentException] {
      GraftTable.convert(spark, bad)
    }
  }

  test("shallow clone of a hive-adopted table keeps partition values") {
    val dir = writeHiveDir()
    val t = GraftTable.convert(spark, dir)
    val cloneDir = tmp()
    // the clone references the adopted files by ABSOLUTE path; the
    // k=v run sits under the SOURCE root, so partition-value
    // reinjection must survive the indirection
    GraftTable.shallowClone(spark, dir, cloneDir)
    val c = GraftTable.load(spark, cloneDir)
    val expected = spark.read.parquet(dir)
    assert(c.partitionColumns === Seq("o_year", "o_orderpriority"))
    assert(c.snapshot().count() === expected.count())
    assert(c.snapshot().where($"o_orderpriority".isNull).count() === 0,
      "cloned hive files read partition columns as null")
    val y = expected.select(min("o_year")).as[Int].head()
    assert(c.snapshot().where($"o_year" === y).count() ===
      expected.where($"o_year" === y).count())
    // registered scan over the clone injects values too
    val reg = spark.read.format("graft-table").load(cloneDir)
    assert(reg.where($"o_year" === y).count() ===
      expected.where($"o_year" === y).count())
    // DML on the clone un-shares files without touching the source
    c.delete($"o_year" === y)
    assert(c.snapshot().where($"o_year" === y).count() === 0)
    assert(GraftTable.load(spark, dir).snapshot().count() === expected.count())
  }

  test("OPTIMIZE WHERE compacts only the predicate's files") {
    import graft.tables.{GraftSql, GraftTable}
    val dir = tmp()
    val orders = Tables.load(spark, sf, "orders").repartition(4)
    val t = GraftTable.create(spark, dir, orders,
      partitionBy = Seq("o_orderpriority"))
    // every partition has several files (4 writer tasks × partitions)
    val before = t.snapshot().count()
    val urgentBefore = t.candidateFiles($"o_orderpriority" === "1-URGENT")
    val otherBefore = t.candidateFiles($"o_orderpriority" === "5-LOW").toSet
    assert(urgentBefore.size > 1, s"need >1 file: ${urgentBefore.size}")

    t.compactWhere($"o_orderpriority" === "1-URGENT")
    val urgentAfter = t.candidateFiles($"o_orderpriority" === "1-URGENT")
    val otherAfter = t.candidateFiles($"o_orderpriority" === "5-LOW").toSet
    assert(urgentAfter.size < urgentBefore.size,
      s"expected fewer files: ${urgentBefore.size} -> ${urgentAfter.size}")
    // untouched partitions keep their exact files
    assert(otherAfter === otherBefore)
    assert(t.snapshot().count() === before)

    // DV interplay: tombstones on compacted files are applied by the
    // rewrite; stale entries naming retired paths stay inert
    t.deleteMor($"o_orderpriority" === "2-HIGH" && $"o_orderkey" % 2 === 0)
    val afterDv = t.snapshot().count()
    t.compactWhere($"o_orderpriority" === "2-HIGH")
    assert(t.snapshot().count() === afterDv)

    // SQL surface, registered table
    val name = "graft_optw"
    spark.sql(s"CREATE TABLE $name USING `graft-table` OPTIONS (path '$dir')")
    try {
      val filesBefore = t.snapshotInfo(t.latestVersion).files.size
      GraftSql.sql(spark, s"OPTIMIZE $name WHERE o_orderpriority = '3-MEDIUM'")
      val t2 = GraftTable.load(spark, dir)
      assert(t2.snapshot().count() === afterDv)
      assert(t2.snapshotInfo(t2.latestVersion).files.size < filesBefore)
    } finally spark.sql(s"DROP TABLE IF EXISTS $name")
  }

  test("OPTIMIZE WHERE ... ZORDER BY re-clusters only the slice") {
    import graft.tables.{GraftSql, GraftTable}
    val dir = tmp()
    val t = GraftTable.create(spark, dir,
      Tables.load(spark, sf, "orders").repartition(6),
      partitionBy = Seq("o_orderpriority"))
    val before = t.snapshot().count()
    val urgentBefore = t.candidateFiles($"o_orderpriority" === "1-URGENT")
    val otherBefore = t.candidateFiles($"o_orderpriority" === "5-LOW").toSet
    assert(urgentBefore.size > 1)
    t.clusterByZOrderWhere($"o_orderpriority" === "1-URGENT", 4,
      "o_orderkey", "o_custkey")
    // untouched partitions keep their exact files; data intact
    assert(t.candidateFiles($"o_orderpriority" === "5-LOW").toSet ===
      otherBefore)
    assert(t.snapshot().count() === before)
    // the re-clustered slice now prunes on the z-order keys: a
    // selective o_orderkey predicate inside the slice keeps fewer
    // files than the slice holds
    val slice = t.candidateFiles($"o_orderpriority" === "1-URGENT")
    val lo = t.snapshot().where($"o_orderpriority" === "1-URGENT")
      .agg(min($"o_orderkey")).head.getLong(0)
    val narrow = t.candidateFiles($"o_orderpriority" === "1-URGENT" &&
      $"o_orderkey" === lo)
    assert(narrow.size < slice.size,
      s"no pruning inside the slice: ${narrow.size} of ${slice.size}")
    // SQL spelling
    val name = "graft_zow"
    spark.sql(s"CREATE TABLE $name USING `graft-table` OPTIONS (path '$dir')")
    try {
      GraftSql.sql(spark,
        s"OPTIMIZE $name WHERE o_orderpriority = '3-MEDIUM' " +
          "ZORDER BY (o_orderkey)")
      val t2 = GraftTable.load(spark, dir)
      assert(t2.history(1).select("operation").as[String].head() === "ZORDER")
      assert(t2.snapshot().count() === before)
    } finally spark.sql(s"DROP TABLE IF EXISTS $name")
  }

  test("additive evolution keeps partition columns last (positional parity)") {
    val dir = writeHiveDir()
    val t = GraftTable.convert(spark, dir)
    // evolve: a new column lands BEFORE the trailing partition block,
    // so the injected registered scan's positional layout (data ++
    // partition columns) stays identical to the logical schema
    val batch = t.snapshot().limit(5)
      .withColumn("flag", lit(1L))
    t.append(batch, evolve = true)
    val cols = t.snapshot().columns.toSeq
    assert(cols.takeRight(2) === Seq("o_year", "o_orderpriority"),
      s"partition columns no longer last: $cols")
    assert(cols.contains("flag"))
    val reg = spark.read.format("graft-table").load(dir)
    assert(reg.columns.toSeq === cols,
      "registered scan column order diverged from snapshot()")
    // positional agreement, not just names: same rows in both surfaces
    val key = col("o_orderkey")
    assert(reg.orderBy(key).limit(3).collect().toSeq ===
      t.snapshot().select(reg.columns.map(col): _*)
        .orderBy(key).limit(3).collect().toSeq)
  }

  test("inconsistent hive nesting is refused") {
    val dir = tmp()
    Seq((1L, "a")).toDF("id", "v").write.parquet(dir + "/k=1")
    Seq((2L, "b")).toDF("id", "v").write.parquet(dir + "/j=2")
    intercept[IllegalArgumentException] {
      GraftTable.convert(spark, dir)
    }
  }
}
