package graft.operators

import java.nio.file.Files

import graft.Tables
import graft.Tables.dec
import graft.tables.{GraftSql, GraftTable}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-checkable scenarios over the GraftTable transactional
  * layer (SURVEY.md §2.C). Each builds a scratch table from the
  * canonical `orders` parquet, applies the DML, and returns the
  * resulting snapshot so the DuckDB oracle can assert the final
  * state relationally.
  */
object TableOps {

  // One Spark-written template table per (sfDir, parts); each scenario
  // clones it with a filesystem copy — O(bytes) file copy instead of a
  // full Spark write + stats pass per query.
  private val templates =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), java.nio.file.Path]()

  private def scratch(spark: SparkSession, sfDir: String,
      parts: Int = 8): GraftTable = {
    val template = templates.computeIfAbsent((sfDir, parts), { _ =>
      val dir = Files.createTempDirectory("graft_tbl_template_").resolve("t")
      GraftTable.create(spark, dir.toString,
        Tables.load(spark, sfDir, "orders").repartition(parts, col("o_orderkey")))
      dir
    })
    val clone = Files.createTempDirectory("graft_tbl_").resolve("t")
    copyTree(template, clone)
    GraftTable.load(spark, clone.toString)
  }

  private[graft] def copyTree(src: java.nio.file.Path,
      dst: java.nio.file.Path): Unit = {
    Files.createDirectories(dst)
    Files.walk(src).forEach { p =>
      val rel = src.relativize(p)
      val target = dst.resolve(rel)
      if (Files.isDirectory(p)) Files.createDirectories(target)
      else Files.copy(p, target,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
  }

  /** MERGE INTO (01-Fraud-Delta.py:234-241): matched rows take the
    * source version, unmatched source rows are inserted.
    */
  def mergeUpsert(spark: SparkSession, sfDir: String): DataFrame = {
    val t = scratch(spark, sfDir)
    val orders = Tables.load(spark, sfDir, "orders")
    val updates = orders.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_orderstatus", lit("U"))
      .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
    val inserts = orders.filter(col("o_orderkey") % 100 === 0)
      .withColumn("o_orderkey", col("o_orderkey") + 10000000L)
      .withColumn("o_orderstatus", lit("N"))
    t.merge(updates.unionByName(inserts), "o_orderkey")
    t.snapshot()
  }

  /** MERGE-ON-READ MERGE via deletion vectors (the DV form of the
    * reference's upsert, 01-Fraud-Delta.py:218-241): matched 'F' rows
    * are tombstone-DELETEd, other matched rows tombstone + re-append
    * with the source's bumped price, fresh keys insert — zero
    * existing files rewritten (the 100 TB upsert shape: a daily merge
    * touching one row per file writes the delta, not the fleet).
    */
  def mergeMorScenario(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.tables.GraftTable.{MatchedDelete, MatchedUpdate, NotMatchedInsert}
    val t = scratch(spark, sfDir)
    val orders = Tables.load(spark, sfDir, "orders")
    val src = orders.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
      .unionByName(orders.filter(col("o_orderkey") % 100 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + 10000000L)
        .withColumn("o_orderstatus", lit("N")))
    t.mergeMor(src, Seq("o_orderkey"),
      Seq(MatchedDelete(Some(col("o_orderstatus") === "F")),
        MatchedUpdate()),
      Some(NotMatchedInsert()))
    t.snapshot()
  }

  /** MERGE WITH SCHEMA EVOLUTION (Delta's autoMerge; the schema-drift
    * form of the reference's upsert at 01-Fraud-Delta.py:218-241):
    * the source carries a column the table lacks (`o_channel`) — the
    * merge ADDS it to the target schema in the same commit, matched
    * and inserted rows take the source value, and every pre-merge row
    * surfaces null for it.
    */
  def mergeEvolve(spark: SparkSession, sfDir: String): DataFrame = {
    val t = scratch(spark, sfDir)
    val orders = Tables.load(spark, sfDir, "orders")
    val src = orders.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_orderstatus", lit("U"))
      .withColumn("o_channel", lit("online"))
      .unionByName(orders.filter(col("o_orderkey") % 100 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + 10000000L)
        .withColumn("o_orderstatus", lit("N"))
        .withColumn("o_channel", lit("batch")))
    t.merge(src, Seq("o_orderkey"),
      Seq(GraftTable.MatchedUpdate()), Some(GraftTable.NotMatchedInsert()),
      Nil, evolveSchema = true)
    t.snapshot()
  }

  /** MERGE sync (Delta's `WHEN NOT MATCHED BY SOURCE`, the form the
    * reference's upsert at 01-Fraud-Delta.py:218-241 graduates into
    * for SCD/sync pipelines): ONE statement upserts the source AND
    * handles target rows gone from it — here 'O'-status strays get a
    * priority downgrade, 'P'-status strays are deleted, 'F' strays
    * stay (first-match-wins clause order). Blast radius stays
    * file-granular; the conflict read set is whole-table (every row
    * was consulted for unmatchedness).
    */
  def mergeSync(spark: SparkSession, sfDir: String): DataFrame = {
    val t = scratch(spark, sfDir)
    val orders = Tables.load(spark, sfDir, "orders")
    val src = orders.filter(col("o_orderkey") % 3 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + 500.0)
      .unionByName(orders.filter(col("o_orderkey") % 1000 === 0)
        .withColumn("o_orderkey", col("o_orderkey") + 20000000L)
        .withColumn("o_orderstatus", lit("N")))
    t.merge(src, Seq("o_orderkey"),
      Seq(GraftTable.MatchedUpdate()),
      Some(GraftTable.NotMatchedInsert()),
      Seq(
        GraftTable.BySourceUpdate(Some(col("o_orderstatus") === "O"),
          Map("o_orderpriority" -> lit("5-LOW"))),
        GraftTable.BySourceDelete(Some(col("o_orderstatus") === "P"))))
    t.snapshot()
  }

  /** DEEP CLONE scenario: clone the scratch table (byte-copy, fresh
    * history), then DELETE on the SOURCE — the clone must still read
    * the full original state (self-contained; survives source DML
    * and vacuum). Oracle: the untouched orders table.
    */
  def deepCloneScenario(spark: SparkSession, sfDir: String): DataFrame = {
    val t = scratch(spark, sfDir)
    val loc = Files.createTempDirectory("graft_deepq_").resolve("c").toString
    GraftTable.deepClone(spark, t.root.toString, loc)
    t.delete(col("o_orderstatus") === "O")
    t.compact(1)
    t.vacuum(1)
    GraftTable.load(spark, loc).snapshot()
  }

  /** RUN-LEDGER scenario: two training runs log (one retried) — the
    * ledger holds exactly one row per run id with its params/metrics.
    * Oracle: the two literal rows (logged_at is wall-clock and stays
    * out of the result).
    */
  def runLedgerScenario(spark: SparkSession, sfDir: String): DataFrame = {
    val loc = Files.createTempDirectory("graft_ledq_").resolve("runs").toString
    graft.ml.RiskPipeline.logRun(spark, loc, "run-001",
      Map("estimator" -> "lr", "maxIter" -> "10"),
      Map("auc" -> 0.61), "/models/run-001")
    graft.ml.RiskPipeline.logRun(spark, loc, "run-002",
      Map("estimator" -> "gbt"), Map("auc" -> 0.58), "/models/run-002")
    // a replayed job re-logs run-001: exactly-once, no duplicate row
    graft.ml.RiskPipeline.logRun(spark, loc, "run-001",
      Map("estimator" -> "lr", "maxIter" -> "10"),
      Map("auc" -> 0.61), "/models/run-001")
    GraftTable.load(spark, loc).snapshot()
      .select(col("run_id"), col("params"), col("metrics"), col("model_path"))
  }

  /** MODEL REGISTRY over the run ledger (03-Fraud-ML.py:22-24 serves
    * the registered model; :186-213 logs runs): five runs across two
    * estimators, one replayed (exactly-once absorbs it), then the two
    * registry views — `best` (highest auc per estimator) and `latest`
    * (newest per estimator) — in one frame. run-004 beats the earlier
    * lr runs and run-005 is newer-but-worse, so best and latest
    * legitimately disagree on lr. logged_at is wall-clock, so the
    * result projects only the deterministic registry columns.
    */
  def modelRegistryScenario(spark: SparkSession, sfDir: String): DataFrame = {
    import graft.ml.RiskPipeline.{bestRuns, latestRuns, logRun}
    val loc = Files.createTempDirectory("graft_regq_").resolve("runs").toString
    logRun(spark, loc, "run-001",
      Map("estimator" -> "lr", "maxIter" -> "10"), Map("auc" -> 0.61))
    logRun(spark, loc, "run-002",
      Map("estimator" -> "gbt"), Map("auc" -> 0.58))
    logRun(spark, loc, "run-003",
      Map("estimator" -> "lr"), Map("auc" -> 0.57))
    logRun(spark, loc, "run-004",
      Map("estimator" -> "lr"), Map("auc" -> 0.71))
    logRun(spark, loc, "run-005",
      Map("estimator" -> "lr"), Map("auc" -> 0.60))
    // a replayed training job must not shift either view
    logRun(spark, loc, "run-004",
      Map("estimator" -> "lr"), Map("auc" -> 0.71))
    def shaped(df: DataFrame, view: String): DataFrame =
      df.select(lit(view).as("view"), col("estimator"), col("run_id"),
        col("metric_value").as("auc"))
    shaped(bestRuns(spark, loc), "best")
      .unionByName(shaped(latestRuns(spark, loc), "latest"))
  }

  /** DML DELETE WHERE — the GDPR scenario (01-Fraud-Delta.py:159). */
  def deleteWhere(spark: SparkSession, sfDir: String): DataFrame = {
    val t = scratch(spark, sfDir)
    t.delete(col("o_orderstatus") === "P" && col("o_custkey") % 7 === 0)
    t.snapshot()
  }

  /** BLOOM-FILTER INDEX point lookup (`graft.bloom.columns`, Delta's
    * bloom index analog): the scratch table's files all span the full
    * o_orderkey range (hash-partitioned ingest), so min/max stats
    * cannot prune a point key — the per-file bloom sidecars can, and
    * the point DELETE's blast radius shrinks to the file(s) actually
    * holding the key. The oracle checks the surviving rows;
    * `BloomIndexSpec` asserts the candidate-file counts themselves.
    */
  def bloomPointDelete(spark: SparkSession, sfDir: String): DataFrame = {
    val t = scratch(spark, sfDir)
    t.setProperties(Map("graft.bloom.columns" -> "o_orderkey"))
    t.rebuildBloomIndex()
    val minKey = t.snapshot().agg(min(col("o_orderkey"))).head.getLong(0)
    t.delete(col("o_orderkey") === minKey)
    t.snapshot()
  }

  /** MERGE-ON-READ delete via DELETION VECTORS (Delta DV analog):
    * two accumulating `deleteMor` calls write (file, position)
    * tombstones — zero data files rewritten — and the snapshot
    * masks them on read.
    */
  def deleteMorScenario(spark: SparkSession, sfDir: String): DataFrame = {
    val t = scratch(spark, sfDir)
    t.deleteMor(col("o_orderstatus") === "P" && col("o_custkey") % 7 === 0)
    t.deleteMor(col("o_totalprice") < lit(5000.0))
    t.snapshot()
  }

  /** MERGE-ON-READ update via DELETION VECTORS: two sequential
    * `updateMor` calls tombstone the touched rows and append the
    * post-update rows — zero existing data files rewritten; the
    * second call's scan masks the first's tombstones, so updates
    * compose sequentially (its predicate can re-hit the first call's
    * appended rows).
    */
  def updateMorScenario(spark: SparkSession, sfDir: String): DataFrame = {
    val t = scratch(spark, sfDir)
    t.updateMor(col("o_orderpriority") === "1-URGENT",
      Map("o_totalprice" ->
        round(dec(col("o_totalprice")) * lit(1.1).cast("decimal(2,1)"), 2)
          .cast("double")))
    t.updateMor(col("o_orderstatus") === "P" && col("o_custkey") % 7 === 0,
      Map("o_orderpriority" -> lit("5-LOW")))
    t.snapshot()
  }

  /** REORG ... APPLY (PURGE) analog: after merge-on-read deletes,
    * purge rewrites ONLY the tombstoned files and drops the DVs —
    * same logical state, now readable through the file-granular
    * `graft-table` scan again (the reader-feature gate lifts).
    */
  def deleteMorPurge(spark: SparkSession, sfDir: String): DataFrame = {
    val t = scratch(spark, sfDir)
    t.deleteMor(col("o_orderstatus") === "P" && col("o_custkey") % 7 === 0)
    t.deleteMor(col("o_totalprice") < lit(5000.0))
    t.purgeDvs()
    spark.read.format("graft-table").load(t.root.toString)
  }

  /** DYNAMIC PARTITION OVERWRITE (Delta `partitionOverwriteMode=
    * dynamic`): the table is PARTITIONED by o_orderstatus; a re-load
    * of the 'P' partition (prices zeroed) atomically replaces exactly
    * that partition — the other partitions' files are not rewritten.
    * The replaced-file set comes from commit-log partition tuples
    * (O(files) metadata, no scan), which is what keeps a daily
    * re-load of one partition into a 100 TB table a small commit.
    */
  // partitioned scratch template, cloned per scenario like scratch()
  private val partTemplates =
    new java.util.concurrent.ConcurrentHashMap[String, java.nio.file.Path]()

  def partitionOverwrite(spark: SparkSession, sfDir: String): DataFrame = {
    val template = partTemplates.computeIfAbsent(sfDir, { _ =>
      val dir = Files.createTempDirectory("graft_tblpo_tpl_").resolve("t")
      GraftTable.create(spark, dir.toString,
        Tables.load(spark, sfDir, "orders").repartition(4, col("o_orderkey")),
        partitionBy = Seq("o_orderstatus"))
      dir
    })
    val clone = Files.createTempDirectory("graft_tblpo_").resolve("t")
    copyTree(template, clone)
    val t = GraftTable.load(spark, clone.toString)
    t.overwritePartitions(
      Tables.load(spark, sfDir, "orders")
        .where(col("o_orderstatus") === "P")
        .withColumn("o_totalprice", lit(0.0)))
    t.snapshot()
  }

  /** `replaceWhere` (Delta's guarded selective overwrite): the 'F'
    * slice is atomically replaced by only its even-keyed rows —
    * validation rejects any incoming row outside the predicate, and
    * the rewrite touches only cond-matching files.
    */
  def replaceWhereScenario(spark: SparkSession, sfDir: String): DataFrame = {
    val t = scratch(spark, sfDir)
    val orders = Tables.load(spark, sfDir, "orders")
    t.replaceWhere(col("o_orderstatus") === "F",
      orders.where(col("o_orderstatus") === "F" && col("o_orderkey") % 2 === 0))
    t.snapshot()
  }

  /** DML UPDATE SET (decimal-exact price bump on a slice). */
  def updateWhere(spark: SparkSession, sfDir: String): DataFrame = {
    val t = scratch(spark, sfDir)
    t.update(col("o_orderpriority") === "1-URGENT",
      Map("o_totalprice" ->
        round(dec(col("o_totalprice")) * lit(1.1).cast("decimal(2,1)"), 2)
          .cast("double")))
    t.snapshot()
  }

  /** Time travel (01-Fraud-Delta.py:210-214): after a delete, version
    * 0 still reads the full original data.
    */
  def timeTravel(spark: SparkSession, sfDir: String): DataFrame = {
    val t = scratch(spark, sfDir)
    t.delete(col("o_orderstatus") === "P")
    t.snapshotAt(0)
  }

  /** OPTIMIZE/compaction (01-Fraud-Delta.py:288): many small files →
    * few, same data.
    */
  def compactFiles(spark: SparkSession, sfDir: String): DataFrame = {
    val t = scratch(spark, sfDir, parts = 16)
    t.compact(numFiles = 2)
    t.snapshot()
  }

  /** Z-ORDER analog (01-Fraud-Delta.py:289): range-cluster by key;
    * data unchanged, file min/max now prunable.
    */
  def clusterByKey(spark: SparkSession, sfDir: String): DataFrame = {
    val t = scratch(spark, sfDir)
    t.clusterBy(4, "o_custkey")
    t.snapshot()
  }

  /** Row-level CDC change feed (Delta CHANGE DATA FEED analog): an
    * UPDATE then a DELETE, then read the full feed from version 0 —
    * preimages, postimages and deletes with their commit versions.
    */
  def changeFeedScenario(spark: SparkSession, sfDir: String): DataFrame = {
    val t = scratch(spark, sfDir)
    t.update(col("o_orderpriority") === "1-URGENT",
      Map("o_totalprice" ->
        round(dec(col("o_totalprice")) * lit(1.1).cast("decimal(2,1)"), 2)
          .cast("double")))
    t.delete(col("o_orderstatus") === "P" && col("o_custkey") % 7 === 0)
    t.changeFeed(0)
  }

  /** Register a fresh scratch table in the session catalog so SQL
    * text can address it by name.
    */
  private def registerScratch(spark: SparkSession, sfDir: String,
      name: String): GraftTable = {
    val t = scratch(spark, sfDir)
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"CREATE TABLE $name USING `graft-table` OPTIONS (path '${t.root}')")
    t
  }

  /** The GDPR delete driven by SQL TEXT (the reference's literal
    * surface, 01-Fraud-Delta.py:159) — same oracle as the Scala API.
    */
  def sqlDelete(spark: SparkSession, sfDir: String): DataFrame = {
    val t = registerScratch(spark, sfDir, "graft_sql_del")
    GraftSql.sql(spark,
      "DELETE FROM graft_sql_del WHERE o_orderstatus = 'P' AND o_custkey % 7 = 0")
    t.snapshot()
  }

  /** SQL-text UPDATE with an expression SET clause. */
  def sqlUpdate(spark: SparkSession, sfDir: String): DataFrame = {
    val t = registerScratch(spark, sfDir, "graft_sql_upd")
    GraftSql.sql(spark,
      """UPDATE graft_sql_upd
        |SET o_totalprice = CAST(round(CAST(o_totalprice AS DECIMAL(12,4))
        |  * CAST(1.1 AS DECIMAL(2,1)), 2) AS DOUBLE)
        |WHERE o_orderpriority = '1-URGENT'""".stripMargin)
    t.snapshot()
  }

  /** SQL-text MERGE INTO (01-Fraud-Delta.py:218-241): UPDATE SET * /
    * INSERT * — same scenario and oracle as tbl_merge_upsert.
    */
  def sqlMerge(spark: SparkSession, sfDir: String): DataFrame = {
    val t = registerScratch(spark, sfDir, "graft_sql_mrg")
    val orders = Tables.load(spark, sfDir, "orders")
    val updates = orders.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_orderstatus", lit("U"))
      .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
    val inserts = orders.filter(col("o_orderkey") % 100 === 0)
      .withColumn("o_orderkey", col("o_orderkey") + 10000000L)
      .withColumn("o_orderstatus", lit("N"))
    updates.unionByName(inserts).createOrReplaceTempView("graft_sql_mrg_src")
    GraftSql.sql(spark,
      """MERGE INTO graft_sql_mrg t USING graft_sql_mrg_src s
        |ON t.o_orderkey = s.o_orderkey
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    t.snapshot()
  }

  /** Plain SQL `INSERT INTO ... VALUES` + `INSERT INTO ... SELECT` on
    * a registered graft table (the reference's literal write surface:
    * 01-Fraud-Delta.py:188-189 drives a streaming demo with INSERT
    * INTO ... VALUES in a loop) — both land as transactional appends.
    */
  def sqlInsert(spark: SparkSession, sfDir: String): DataFrame = {
    val t = registerScratch(spark, sfDir, "graft_sql_ins")
    GraftSql.sql(spark,
      "INSERT INTO graft_sql_ins VALUES " +
        "(20000001, 1, 'O', 123.45, '1997-01-01 00:00:00', '1-URGENT')")
    Tables.load(spark, sfDir, "orders")
      .createOrReplaceTempView("graft_sql_ins_src")
    GraftSql.sql(spark,
      """INSERT INTO graft_sql_ins
        |SELECT o_orderkey + 30000000, o_custkey, 'N', o_totalprice,
        |  o_orderdate, o_orderpriority
        |FROM graft_sql_ins_src WHERE o_orderkey % 100 = 0""".stripMargin)
    t.snapshot()
  }

  /** CONVERT over a HIVE-PARTITIONED parquet layout — the asset a
    * migrating user actually owns (their existing
    * `df.write.partitionBy(...)` output; reference analog: registering
    * existing tables, 01-Fraud-Delta.py:116-134). Adoption is
    * zero-copy: the `k=v` segments become commit-log partition
    * tuples, reads reinject the path-encoded partition values, and a
    * partition-scoped DELETE proves DML is live on the first commit.
    */
  def convertHive(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = Files.createTempDirectory("graft_hivecvt_").resolve("t")
    Tables.load(spark, sfDir, "orders")
      .write.partitionBy("o_orderpriority").parquet(dir.toString)
    val t = GraftTable.convert(spark, dir.toString)
    t.delete(col("o_orderpriority") === "1-URGENT")
    t.snapshot()
  }

  /** COPY INTO driver scenario: seed a table with a third of orders,
    * land the remaining two thirds as two parquet drops, COPY INTO
    * twice per drop (the re-runs must be file-idempotent no-ops) —
    * final state is exactly the full orders table.
    */
  def copyIntoScenario(spark: SparkSession, sfDir: String): DataFrame = {
    val orders = Tables.load(spark, sfDir, "orders")
    val dir = Files.createTempDirectory("graft_copyinto_").resolve("t")
    val t = GraftTable.create(spark, dir.toString,
      orders.filter(col("o_orderkey") % 3 === 0))
    val src = Files.createTempDirectory("graft_copyinto_src_").toString
    orders.filter(col("o_orderkey") % 3 === 1)
      .write.mode("append").parquet(src)
    t.copyInto(src)
    t.copyInto(src) // idempotent: nothing re-loads
    orders.filter(col("o_orderkey") % 3 === 2)
      .write.mode("append").parquet(src)
    t.copyInto(src) // only the new drop loads
    t.copyInto(src)
    t.snapshot()
  }

  /** Conditional MERGE clauses (Delta's full WHEN surface): matched
    * 'P' rows are DELETEd, other matched rows get a decimal-exact
    * price bump from the source, and only even-custkey source rows
    * are INSERTed.
    */
  def mergeConditional(spark: SparkSession, sfDir: String): DataFrame = {
    import GraftTable.{MatchedDelete, MatchedUpdate, NotMatchedInsert}
    val t = scratch(spark, sfDir)
    val orders = Tables.load(spark, sfDir, "orders")
    val updates = orders.filter(col("o_orderkey") % 10 === 0)
    val inserts = orders.filter(col("o_orderkey") % 100 === 0)
      .withColumn("o_orderkey", col("o_orderkey") + 10000000L)
      .withColumn("o_orderstatus", lit("N"))
    t.merge(updates.unionByName(inserts), "o_orderkey",
      Seq(
        MatchedDelete(Some(col("o_orderstatus") === "P")),
        MatchedUpdate(None, Some(Map("o_totalprice" ->
          round(dec(col("src.o_totalprice")) * lit(1.05).cast("decimal(3,2)"), 2)
            .cast("double"))))),
      Some(NotMatchedInsert(Some(col("o_custkey") % 2 === 0), None)))
    t.snapshot()
  }

  /** MERGE on a table with a GENERATED ALWAYS AS IDENTITY column:
    * matched rows keep their engine-assigned id through SET *,
    * NOT MATCHED inserts take fresh dense ids from the high water.
    * The business state replays relationally in the oracle; the id
    * properties (uniqueness + density) ride as boolean columns the
    * oracle expects to be literally TRUE — deterministic even though
    * the id VALUES depend on partition order.
    */
  def mergeIdentity(spark: SparkSession, sfDir: String): DataFrame = {
    val dir = Files.createTempDirectory("graft_tbl_id_").resolve("t")
    val orders = Tables.load(spark, sfDir, "orders")
    val t = GraftTable.create(spark, dir.toString,
      orders.repartition(8, col("o_orderkey")), identity = Some("rid"))
    val updates = orders.filter(col("o_orderkey") % 10 === 0)
      .withColumn("o_orderstatus", lit("U"))
      .withColumn("o_totalprice", col("o_totalprice") + 1000.0)
    val inserts = orders.filter(col("o_orderkey") % 100 === 0)
      .withColumn("o_orderkey", col("o_orderkey") + 10000000L)
      .withColumn("o_orderstatus", lit("N"))
    t.merge(updates.unionByName(inserts), "o_orderkey")
    val s = t.snapshot()
    val chk = s.agg(countDistinct(col("rid")).as("du"),
      count(lit(1)).as("cnt"), max(col("rid")).as("mx"),
      min(col("rid")).as("mn"))
    s.drop("rid").crossJoin(broadcast(chk))
      .withColumn("ids_unique", col("du") === col("cnt"))
      .withColumn("ids_dense", col("mn") === 0 && col("mx") === col("cnt") - 1)
      .drop("du", "cnt", "mx", "mn")
  }

  /** Batch read through the registered `graft-table` data source
    * (reference: registered Delta tables, 01-Fraud-Delta.py:116-134):
    * the scan plans through GraftTableFileIndex, so the selective
    * predicate data-skips whole files from commit-log min/max stats
    * before any I/O — catalog SQL and DataFrame reads prune alike.
    */
  def dsv2Read(spark: SparkSession, sfDir: String): DataFrame = {
    val t = scratch(spark, sfDir)
    t.clusterBy(8, "o_custkey")
    spark.read.format("graft-table").load(t.root.toString)
      .where(col("o_custkey") <= 100L)
      .select("o_orderkey", "o_custkey", "o_totalprice")
  }

  /** INCREMENTAL MATERIALIZED VIEW maintenance: a per-status rollup
    * is materialized once, then the source takes an UPDATE, a
    * copy-on-write DELETE, an APPEND and a merge-on-read DV delete —
    * and one `refresh()` folds only the change feed in. The oracle
    * recomputes the final state relationally, so it asserts the
    * maintained view ≡ recompute (the IVM correctness property).
    */
  def mvIncremental(spark: SparkSession, sfDir: String): DataFrame = {
    val t = scratch(spark, sfDir)
    val mvPath = Files.createTempDirectory("graft_mv_").resolve("mv").toString
    val mv = graft.tables.IncrementalMatView.create(spark, t, mvPath,
      Seq("o_orderstatus"), "o_totalprice")
    t.update(col("o_orderpriority") === "1-URGENT",
      Map("o_totalprice" ->
        round(dec(col("o_totalprice")) * lit(1.1).cast("decimal(2,1)"), 2)
          .cast("double")))
    t.delete(col("o_orderstatus") === "P" && col("o_custkey") % 7 === 0)
    val orders = Tables.load(spark, sfDir, "orders")
    t.append(orders.filter(col("o_orderkey") % 100 === 0)
      .withColumn("o_orderkey", col("o_orderkey") + 10000000L)
      .withColumn("o_orderstatus", lit("N")))
    t.deleteMor(col("o_totalprice") < lit(1000.0))
    mv.refresh()
    mv.view()
  }

  /** [[mvIncremental]] with a maintained APPROX_COUNT_DISTINCT
    * measure (r14): the per-group HLL sketch folds union-wise on the
    * append and routes the delete/update-touched groups through the
    * affected-group recompute. The measure domain is tiny
    * (o_orderpriority, ≤5 per group), where the DataSketches HLL is
    * still in its EXACT small-cardinality mode — so the DuckDB
    * oracle checks it as plain COUNT(DISTINCT), an exact equality,
    * not a tolerance band.
    */
  def mvIncrementalApprox(spark: SparkSession, sfDir: String): DataFrame = {
    val t = scratch(spark, sfDir)
    val mvPath = Files.createTempDirectory("graft_mvh_").resolve("mv").toString
    val mv = graft.tables.IncrementalMatView.create(spark, t, mvPath,
      Seq("o_orderstatus"), Seq("o_totalprice"), extremes = false,
      derived = Nil, dims = Nil, avgCols = Nil, outputs = Nil,
      approxCols = Seq("o_orderpriority"))
    t.update(col("o_orderpriority") === "1-URGENT",
      Map("o_totalprice" ->
        round(dec(col("o_totalprice")) * lit(1.1).cast("decimal(2,1)"), 2)
          .cast("double")))
    t.delete(col("o_orderstatus") === "P" && col("o_custkey") % 7 === 0)
    val orders = Tables.load(spark, sfDir, "orders")
    t.append(orders.filter(col("o_orderkey") % 100 === 0)
      .withColumn("o_orderkey", col("o_orderkey") + 10000000L)
      .withColumn("o_orderstatus", lit("N")))
    t.deleteMor(col("o_totalprice") < lit(1000.0))
    mv.refresh()
    mv.view()
  }

  /** [[mvIncremental]] with a maintained AVG measure: AVG is the
    * SUM/non-null-COUNT pair, both abelian, so it folds through the
    * same DML storm with no recompute path — the oracle recomputes
    * the quotient relationally (rounded-sum double over COUNT(col),
    * the engine-parity recipe every dashboard avg here uses).
    */
  def mvIncrementalAvg(spark: SparkSession, sfDir: String): DataFrame = {
    val t = scratch(spark, sfDir)
    val mvPath = Files.createTempDirectory("graft_mva_").resolve("mv").toString
    val mv = graft.tables.IncrementalMatView.create(spark, t, mvPath,
      Seq("o_orderstatus"), Seq("o_totalprice"), extremes = false,
      derived = Nil, dims = Nil, avgCols = Seq("o_totalprice"),
      outputs = Nil)
    t.update(col("o_orderpriority") === "1-URGENT",
      Map("o_totalprice" ->
        round(dec(col("o_totalprice")) * lit(1.1).cast("decimal(2,1)"), 2)
          .cast("double")))
    t.delete(col("o_orderstatus") === "P" && col("o_custkey") % 7 === 0)
    val orders = Tables.load(spark, sfDir, "orders")
    t.append(orders.filter(col("o_orderkey") % 100 === 0)
      .withColumn("o_orderkey", col("o_orderkey") + 10000000L)
      .withColumn("o_orderstatus", lit("N")))
    t.deleteMor(col("o_totalprice") < lit(1000.0))
    mv.refresh()
    mv.view()
  }

  /** [[mvIncremental]] with maintained MIN/MAX measures: the same
    * DML storm, but the copy-on-write DELETE and the DV delete retire
    * group extremes, so the refresh exercises the affected-group
    * recompute path — the oracle recomputes min/max relationally and
    * asserts maintained ≡ recompute for NON-abelian measures too.
    */
  def mvIncrementalMinMax(spark: SparkSession, sfDir: String): DataFrame = {
    val t = scratch(spark, sfDir)
    val mvPath = Files.createTempDirectory("graft_mvx_").resolve("mv").toString
    val mv = graft.tables.IncrementalMatView.create(spark, t, mvPath,
      Seq("o_orderstatus"), "o_totalprice", extremes = true)
    t.update(col("o_orderpriority") === "1-URGENT",
      Map("o_totalprice" ->
        round(dec(col("o_totalprice")) * lit(1.1).cast("decimal(2,1)"), 2)
          .cast("double")))
    t.delete(col("o_orderstatus") === "P" && col("o_custkey") % 7 === 0)
    val orders = Tables.load(spark, sfDir, "orders")
    t.append(orders.filter(col("o_orderkey") % 100 === 0)
      .withColumn("o_orderkey", col("o_orderkey") + 10000000L)
      .withColumn("o_orderstatus", lit("N")))
    t.deleteMor(col("o_totalprice") < lit(1000.0))
    mv.refresh()
    mv.view()
  }

  /** MULTI-MEASURE maintained view: SUM/COUNT/MIN/MAX over TWO
    * measure columns in ONE maintained view — one delta aggregation
    * and one fold maintain every measure (not a pipeline per
    * measure), and the affected-group recompute refreshes both
    * measures' extremes from the same semi-joined scan. Same DML
    * storm as [[mvIncrementalMinMax]]; the oracle recomputes all
    * seven aggregate columns relationally.
    */
  def mvIncrementalMulti(spark: SparkSession, sfDir: String): DataFrame = {
    val t = scratch(spark, sfDir)
    val mvPath = Files.createTempDirectory("graft_mvm_").resolve("mv").toString
    val mv = graft.tables.IncrementalMatView.create(spark, t, mvPath,
      Seq("o_orderstatus"), Seq("o_totalprice", "o_custkey"),
      extremes = true)
    t.update(col("o_orderpriority") === "1-URGENT",
      Map("o_totalprice" ->
        round(dec(col("o_totalprice")) * lit(1.1).cast("decimal(2,1)"), 2)
          .cast("double")))
    t.delete(col("o_orderstatus") === "P" && col("o_custkey") % 7 === 0)
    val orders = Tables.load(spark, sfDir, "orders")
    t.append(orders.filter(col("o_orderkey") % 100 === 0)
      .withColumn("o_orderkey", col("o_orderkey") + 10000000L)
      .withColumn("o_orderstatus", lit("N")))
    t.deleteMor(col("o_totalprice") < lit(1000.0))
    mv.refresh()
    mv.view()
  }

  /** TWO-key, TWO-measure maintained view over a lineitem slice:
    * grouped by (l_returnflag, l_linestatus) — the multi-COLUMN
    * affected-group recompute path (per-column IN-set file pruning)
    * under the same kind of DML storm, with both measures' extremes
    * retired by deletes. Oracle recomputes all nine output columns
    * relationally.
    */
  def mvIncrementalLineitem(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_orderkey") % 10 === 0)
    val dir = Files.createTempDirectory("graft_mvli_")
    val t = GraftTable.create(spark, dir.resolve("t").toString,
      li.repartition(4))
    val mv = graft.tables.IncrementalMatView.create(spark, t,
      dir.resolve("mv").toString, Seq("l_returnflag", "l_linestatus"),
      Seq("l_quantity", "l_extendedprice"), extremes = true)
    t.update(col("l_discount") > 0.05,
      Map("l_quantity" -> (col("l_quantity") + lit(1.0))))
    t.delete(col("l_returnflag") === "A" && col("l_orderkey") % 30 === 0)
    t.append(Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_orderkey") % 10 === 1)
      .withColumn("l_orderkey", col("l_orderkey") + 100000000L))
    t.deleteMor(col("l_quantity") <= 2.0)
    mv.refresh()
    mv.view()
  }

  /** DERIVED keys and measures in a maintained view — the dashboard
    * shapes the bare-column grammar can't say: a `date_trunc` month
    * bucket as a group key and the TPC-H revenue expression
    * (price × (1−discount), decimal-exact spelling) as the measure,
    * both projected per-row onto snapshots AND the change feed by the
    * maintenance. The storm updates l_discount (so pre/postimage rows
    * DISAGREE on the derived measure), retires extremes by delete,
    * and appends — oracle recomputes everything relationally.
    */
  def mvIncrementalDerived(spark: SparkSession, sfDir: String): DataFrame = {
    val revenueExpr = "CAST(round(CAST(l_extendedprice AS DECIMAL(12,4)) " +
      "* CAST(1.0 - l_discount AS DECIMAL(5,4)), 4) AS DOUBLE)"
    val li = Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_orderkey") % 10 === 0)
    val dir = Files.createTempDirectory("graft_mvdrv_")
    val t = GraftTable.create(spark, dir.resolve("t").toString,
      li.repartition(4))
    val mv = graft.tables.IncrementalMatView.create(spark, t,
      dir.resolve("mv").toString, Seq("l_returnflag", "lmonth"),
      Seq("revenue"), extremes = true,
      derived = Seq(
        "lmonth" -> "date_trunc('month', l_shipdate)",
        "revenue" -> revenueExpr))
    t.update(col("l_quantity") > 45.0, Map("l_discount" -> lit(0.0)))
    t.delete(col("l_returnflag") === "R" && col("l_orderkey") % 20 === 0)
    t.append(Tables.load(spark, sfDir, "lineitem")
      .filter(col("l_orderkey") % 10 === 3)
      .withColumn("l_orderkey", col("l_orderkey") + 100000000L))
    t.deleteMor(col("l_extendedprice") < 2000.0)
    mv.refresh()
    mv.view()
  }

  /** DIMENSION-JOIN maintained view: revenue by customer market
    * segment = orders ⋈ customer, grouped by a DIM column. Fact
    * deltas fold through a broadcast left join to the dim; a dim
    * change triggers a full recompute at the next refresh (per-dim
    * version watermarks — spec'd in DeletionVectorSpec; the dim is
    * static in this oracle scenario so DuckDB replays the join
    * relationally).
    */
  def mvIncrementalDim(spark: SparkSession, sfDir: String): DataFrame = {
    val t = scratch(spark, sfDir)
    val dir = Files.createTempDirectory("graft_mvdim_")
    val dim = GraftTable.create(spark, dir.resolve("cust").toString,
      Tables.load(spark, sfDir, "customer")
        .select(col("c_custkey"), col("c_mktsegment")))
    val mv = graft.tables.IncrementalMatView.create(spark, t,
      dir.resolve("mv").toString, Seq("c_mktsegment"),
      Seq("o_totalprice"), extremes = true, derived = Nil,
      dims = Seq((dim.root.toString, "o_custkey", "c_custkey", "left")))
    t.update(col("o_orderpriority") === "1-URGENT",
      Map("o_totalprice" ->
        round(dec(col("o_totalprice")) * lit(1.1).cast("decimal(2,1)"), 2)
          .cast("double")))
    t.delete(col("o_orderstatus") === "P" && col("o_custkey") % 7 === 0)
    t.deleteMor(col("o_totalprice") < lit(1000.0))
    mv.refresh()
    mv.view()
  }

  /** DESCRIBE HISTORY analog (01-Fraud-Delta.py:214): deterministic
    * columns only (version/operation).
    */
  def historyLog(spark: SparkSession, sfDir: String): DataFrame = {
    val t = scratch(spark, sfDir)
    t.delete(col("o_orderstatus") === "P")
    t.compact(2)
    t.history().select(col("version"), col("operation"))
  }
}
