package graft

import java.nio.file.{Files, Path, Paths}

import graft.tables.GraftTable
import org.apache.spark.sql.functions._
import scala.jdk.CollectionConverters._

/** Merge-on-read DELETE via deletion vectors (Delta DV analog):
  * tombstones instead of file rewrites, read-side masking, purge,
  * and the reader-feature gate on surfaces that cannot apply DVs.
  */
class DeletionVectorSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_dv_").resolve("t").toString

  private def dataFiles(root: String): Set[String] =
    Files.list(Paths.get(root).resolve("files")).iterator().asScala
      .map(_.getFileName.toString).toSet

  test("deleteMor masks rows without rewriting any data file") {
    val dir = tmp()
    val df = spark.range(0, 100).select($"id", ($"id" % 10).as("grp"))
    val t = GraftTable.create(spark, dir, df.repartition(4))
    val before = dataFiles(dir)
    t.deleteMor($"grp" === 3)
    assert(dataFiles(dir) === before, "merge-on-read must not rewrite data files")
    assert(t.snapshot().count() === 90)
    assert(t.snapshot().where($"grp" === 3).count() === 0)
    // second DV delete ACCUMULATES (ids 0,1,2,4..9; 3 is already gone)
    t.deleteMor($"id" < 10)
    assert(dataFiles(dir) === before)
    assert(t.snapshot().count() === 81)
    assert(t.snapshotAt(1).count() === 90, "time travel sees only v1's DVs")
    assert(t.snapshotAt(0).count() === 100)
  }

  test("updateMor rewrites zero data files; assignments see " +
      "pre-update values; CDC exact") {
    val dir = tmp()
    val df = spark.range(0, 100).select($"id", ($"id" % 10).as("grp"),
      ($"id" * 2).cast("long").as("x"))
    val t = GraftTable.create(spark, dir, df.repartition(4))
    val before = dataFiles(dir)
    // swap-shaped assignment: x = x + grp, grp = x — both must see the
    // PRE-update row (the update() projection contract)
    t.updateMor($"grp" === 3, Map("x" -> ($"x" + $"grp"), "grp" -> $"x")): Unit
    assert(dataFiles(dir).intersect(before) === before,
      "merge-on-read update must not rewrite existing data files")
    val got = t.snapshot().where($"id" % 10 === 3)
      .orderBy($"id").select($"id", $"grp", $"x")
      .as[(Long, Long, Long)].collect()
    got.foreach { case (id, grp, x) =>
      assert(x === id * 2 + 3, s"id=$id x=$x")
      assert(grp === id * 2, s"id=$id grp=$grp")
    }
    assert(t.snapshot().count() === 100, "row count is update-invariant")
    // exact CDC: 10 pre + 10 post images at the update version
    val feed = t.changeFeed(t.latestVersion - 1, t.latestVersion)
    assert(feed.where($"_change_type" === "update_preimage").count() === 10)
    assert(feed.where($"_change_type" === "update_postimage").count() === 10)
    // masked rows stay dead through a later DV delete + purge
    t.deleteMor($"id" === 3): Unit
    assert(t.snapshot().count() === 99)
    t.purgeDvs(): Unit
    assert(t.snapshot().count() === 99)
    assert(t.snapshot().where($"id" === 13).select($"x").as[Long].head()
      === 29)
  }

  test("updateMor with no matches is a no-op; conflicts with a racer " +
      "rewriting a tombstoned file") {
    val dir = tmp()
    val t = GraftTable.create(spark, dir,
      spark.range(0, 40).select($"id", ($"id" % 4).as("grp")).repartition(2))
    val v = t.latestVersion
    t.updateMor($"id" === 9999L, Map("grp" -> lit(0L))): Unit
    assert(t.latestVersion === v + 1)
    assert(t.snapshot().count() === 40)
    // a COW update staged against the pre-updateMor base must
    // conflict (its file rewrite would resurrect the pre-update rows
    // our tombstones retired) — the DV-set check catches it
    val base = t.latestVersion
    t.updateMor($"id" === 7, Map("grp" -> lit(99L))): Unit
    val e = intercept[graft.tables.CommitConflictException] {
      t.checkDmlConflicts("UPDATE", base, t.latestVersion,
        t.candidateFiles($"id" === 7).toSet, Some($"id" === 7),
        readsTable = false)
    }
    assert(e.getMessage.contains("deletion-vector"))
    assert(t.snapshot().where($"id" === 7).select($"grp").as[Long].head()
      === 99L)
  }

  test("mergeMor appends only the delta, tombstones accepted rows, " +
      "and lands the copy-on-write merge's exact state") {
    import graft.tables.GraftTable.{MatchedDelete, MatchedUpdate, NotMatchedInsert}
    def seed(dir: String) = GraftTable.create(spark, dir,
      spark.range(0, 100).select($"id", ($"id" % 10).as("grp"),
        ($"id" * 2).as("x")).repartition(4))
    val (morDir, cowDir) = (tmp(), tmp())
    val (morT, cowT) = (seed(morDir), seed(cowDir))
    // matched grp<5 → update from source; matched grp>=8 → delete;
    // matched 5..7 → no clause accepts, row survives untouched;
    // ids 100..109 → inserts
    val src = spark.range(90, 110).select($"id",
      ($"id" % 10).as("grp"), lit(-1L).as("x"))
    val clauses = Seq(
      MatchedUpdate(Some($"grp" < 5), Some(Map("x" -> $"src.x"))),
      MatchedDelete(Some($"grp" >= 8)))
    val before = dataFiles(morDir)
    morT.mergeMor(src, Seq("id"), clauses, Some(NotMatchedInsert())): Unit
    cowT.merge(src, Seq("id"), clauses, Some(NotMatchedInsert())): Unit
    assert(dataFiles(morDir).intersect(before) === before,
      "merge-on-read MERGE must only append files, never rewrite")
    val key = (d: org.apache.spark.sql.DataFrame) =>
      d.orderBy($"id").as[(Long, Long, Long)].collect().toSeq
    assert(key(morT.snapshot()) === key(cowT.snapshot()),
      "MoR and CoW merges must land the same logical state")
    assert(morT.history().select($"operation").as[String].collect()
      .contains("MERGE_DV"))
    // CDC exact: 5 updates (90-94), 2 deletes (98,99), 10 inserts
    val feed = morT.changeFeed(morT.latestVersion - 1, morT.latestVersion)
    assert(feed.where($"_change_type" === "update_preimage").count() === 5)
    assert(feed.where($"_change_type" === "update_postimage").count() === 5)
    assert(feed.where($"_change_type" === "delete").count() === 2)
    assert(feed.where($"_change_type" === "insert").count() === 10)
    // unaccepted matched rows (95-97) survive untouched in place
    assert(morT.snapshot().where($"id" === 96).select($"x").as[Long]
      .head() === 192)
    // purge materializes to the identical state
    morT.purgeDvs(): Unit
    assert(key(morT.snapshot()) === key(cowT.snapshot()))
  }

  test("mergeMor stacks on earlier DVs and conflicts with a racer " +
      "rewriting a tombstoned file") {
    val dir = tmp()
    val t = GraftTable.create(spark, dir,
      spark.range(0, 40).select($"id", ($"id" % 4).as("grp")).repartition(2))
    t.deleteMor($"id" < 5): Unit
    // upsert over already-masked ids: 0..4 are DEAD (tombstoned), so
    // they are NOT MATCHED and re-insert; 5..9 update in place
    val base = t.latestVersion
    val src = spark.range(0, 10).select($"id", lit(77L).as("grp"))
    t.mergeMor(src, Seq("id")): Unit
    assert(t.snapshot().count() === 40, "5 re-inserts + 5 updates")
    assert(t.snapshot().where($"grp" === 77).count() === 10)
    // a COW rewrite staged against the pre-merge base of a tombstoned
    // file must conflict (it would resurrect the pre-update rows)
    val e = intercept[graft.tables.CommitConflictException] {
      t.checkDmlConflicts("UPDATE", base, t.latestVersion,
        t.candidateFiles($"id" === 7).toSet, Some($"id" === 7),
        readsTable = false)
    }
    assert(e.getMessage.contains("deletion-vector"))
  }

  test("deleteMor with no live matches is a no-op commit") {
    val dir = tmp()
    val t = GraftTable.create(spark, dir,
      spark.range(0, 10).select($"id", ($"id" % 2).as("grp")))
    t.deleteMor($"grp" === 1)
    val v = t.deleteMor($"grp" === 1) // every match already masked
    assert(t.snapshot().count() === 5)
    assert(v === 2)
    // the no-op commit added no DV files, so streams may cross it
    // (only the first DV commit refuses)
    val batch = t.filesAddedIn(1, v)
    assert(batch.files.isEmpty)
  }

  test("copy-on-write DML after deleteMor never resurrects masked rows") {
    val dir = tmp()
    val df = spark.range(0, 100).select($"id", ($"id" % 10).as("grp"))
    val t = GraftTable.create(spark, dir, df.repartition(4))
    t.deleteMor($"grp" === 3)
    // the COW rewrite reads files that also hold masked grp-3 rows
    t.update($"grp" === 5, Map("grp" -> lit(50L)))
    assert(t.snapshot().count() === 90)
    assert(t.snapshot().where($"grp" === 3).count() === 0)
    assert(t.snapshot().where($"grp" === 50).count() === 10)
    // MERGE sees the LIVE state: a masked key is NOT MATCHED → insert
    t.deleteMor($"id" === 7)
    assert(t.snapshot().count() === 89)
    t.merge(Seq((7L, 700L)).toDF("id", "grp"), "id")
    val row7 = t.snapshot().where($"id" === 7).collect()
    assert(row7.length === 1 && row7(0).getLong(1) === 700L)
  }

  test("COW DML that retires every masked file drops its DVs") {
    val dir = tmp()
    val df = spark.range(0, 100).select($"id", ($"id" % 10).as("grp"))
    val t = GraftTable.create(spark, dir, df.repartition(4))
    t.deleteMor($"grp" === 3)
    assert(t.hasDvs(t.latestVersion))
    // a COW delete whose blast radius covers every file the DV names
    // absorbs the tombstones into the rewrite — the now-inert DV
    // files must drop from the commit so gated readers re-open
    t.delete($"grp" === 4)
    assert(t.snapshot().count() === 80)
    assert(!t.hasDvs(t.latestVersion),
      "stale DV entries kept the reader gate closed after full rewrite")
    // gate actually open: the registered batch scan plans fine
    assert(spark.read.format("graft-table").load(dir).count() === 80)
  }

  test("DV liveness keeps any vector whose references cannot be resolved") {
    val dir = tmp()
    val t = GraftTable.create(spark, dir,
      spark.range(0, 100).select($"id", ($"id" % 4).as("grp"))
        .repartition(4))
    t.deleteMor($"id" < 10)
    val dv = t.history().count() // force state; read the dv list via detail
    assert(dv >= 2)
    val dvFiles = Files.list(Paths.get(dir).resolve("dv")).iterator()
      .asScala.map(p => s"dv/${p.getFileName}").toSeq
    assert(dvFiles.nonEmpty)
    val all = dataFiles(dir).map(f => s"files/$f").toSeq
    // every ref matches a survivor → live, kept
    assert(t.liveDvs(dvFiles, all, all) === dvFiles)
    // every ref PROVABLY resolves to a retired known file → dropped
    assert(t.liveDvs(dvFiles, Nil, all) === Nil)
    // refs match nothing we know (spelling drift / unknown files) —
    // the failure direction must be KEEP: wrongly dropping a DV
    // resurrects deleted rows
    assert(t.liveDvs(dvFiles, Nil, Nil) === dvFiles)
  }

  test("purgeDvs rewrites only tombstoned files and lifts the scan gate") {
    val dir = tmp()
    val df = spark.range(0, 100).toDF("id")
    val t = GraftTable.create(spark, dir,
      df.repartitionByRange(4, $"id").sortWithinPartitions($"id"))
    t.deleteMor($"id" === 5) // lands in exactly one range file
    // file-granular batch scan REFUSES while DVs are active
    val gate = intercept[UnsupportedOperationException] {
      spark.read.format("graft-table").load(dir).count()
    }
    assert(gate.getMessage.contains("deletion vectors"))
    val before = dataFiles(dir)
    t.purgeDvs()
    val after = dataFiles(dir)
    // purge adds rewritten file(s) for the ONE tombstoned file only
    assert(t.snapshot().count() === 99)
    assert((after -- before).nonEmpty)
    assert((before -- dataFiles(dir)).isEmpty, "old files are retired by vacuum, not purge")
    val listed = t.history().where($"operation" === "PURGE").count()
    assert(listed === 1)
    // gate lifted: the registered scan reads the purged state
    assert(spark.read.format("graft-table").load(dir).count() === 99)
    assert(spark.read.format("graft-table").load(dir)
      .where($"id" === 5).count() === 0)
    // purging a DV-less table is a no-op (no new commit)
    val v = t.latestVersion
    assert(t.purgeDvs() === v)
  }

  test("streaming replay refuses to cross a DV commit; CDC feed is exact") {
    val dir = tmp()
    val t = GraftTable.create(spark, dir,
      spark.range(0, 20).select($"id", ($"id" % 4).as("grp")))
    t.deleteMor($"grp" === 2) // v1: 5 rows masked
    val err = intercept[UnsupportedOperationException] {
      t.filesAddedIn(-1, t.latestVersion)
    }
    assert(err.getMessage.contains("deletion vectors"))
    // the write-time CDC set makes the change feed exact
    val feed = t.changeFeed(0).where($"_commit_version" === 1)
    assert(feed.count() === 5)
    assert(feed.select("_change_type").distinct().as[String].collect()
      .toSeq === Seq("delete"))
    // purge is physical reorganization only — nothing in the feed
    t.purgeDvs()
    assert(t.changeFeed(1).count() === 0)
  }

  test("restore and shallow clone carry deletion vectors with the state") {
    val dir = tmp()
    val t = GraftTable.create(spark, dir, spark.range(0, 50).toDF("id"))
    t.deleteMor($"id" >= 40) // v1: 40 live
    t.restore(0) // v2: full state back, DVs dropped with it
    assert(t.snapshot().count() === 50)
    t.restore(1) // v3: the masked state again
    assert(t.snapshot().count() === 40)
    val cloneDir = tmp()
    val c = GraftTable.shallowClone(spark, dir, cloneDir)
    assert(c.snapshot().count() === 40, "clone must inherit the source's DV mask")
    assert(c.snapshot().where($"id" >= 40).count() === 0)
  }

  test("change feed: restore across a DV delete emits the resurrections") {
    val t = GraftTable.create(spark, tmp(),
      spark.range(0, 10).select($"id"))                 // v0
    t.deleteMor($"id" < 3)                              // v1: CDC deletes 0,1,2
    t.restore(0)                                        // v2: same files, DVs cleared
    val feedV2 = t.changeFeed(1, 2).select("id", "_change_type")
      .as[(Long, String)].collect().toSet
    assert(feedV2 === Set((0L, "insert"), (1L, "insert"), (2L, "insert")),
      s"restore must emit the logically resurrected rows, got $feedV2")
    // the full feed still folds to the final state
    val folded = t.changeFeed(-1)
      .groupBy("id").agg(
        sum(when(col("_change_type") === "insert", 1).otherwise(-1)).as("n"))
      .where(col("n") > 0).count()
    assert(folded === 10)
  }

  test("change feed: overwrite after a DV delete emits no phantom deletes") {
    val t = GraftTable.create(spark, tmp(),
      spark.range(0, 10).select($"id"))                 // v0
    t.deleteMor($"id" < 3)                              // v1: deletes 0,1,2
    t.overwrite(Seq(100L).toDF("id"))                   // v2: full replace
    val feedV2 = t.changeFeed(1, 2).select("id", "_change_type")
      .as[(Long, String)].collect().toSet
    // live content at v1 was 3..9 — the already-dead 0,1,2 must NOT
    // re-emit as deletes
    assert(feedV2 === ((3L to 9L).map((_, "delete")).toSet + ((100L, "insert"))),
      s"got $feedV2")
  }

  test("incremental materialized view equals recompute across all DML kinds") {
    import graft.tables.IncrementalMatView
    val dir = tmp()
    val df = spark.range(0, 200)
      .select($"id", ($"id" % 5).cast("string").as("grp"),
        ($"id" * 7 % 100).cast("double").as("v"))
    val t = GraftTable.create(spark, dir, df.repartition(4))
    val mv = IncrementalMatView.create(spark, t, tmp(), Seq("grp"), "v")
    t.update($"grp" === "1", Map("v" -> ($"v" + lit(10.0))))
    t.delete($"grp" === "2" && $"id" < 100)
    t.append(spark.range(200, 230)
      .select($"id", lit("9").as("grp"), lit(3.5).as("v")))
    t.deleteMor($"v" < 20.0)
    t.merge(Seq((42L, "7", 12.25), (500L, "7", 99.5)).toDF("id", "grp", "v"), "id")
    // merge-on-read MERGE: its write-time CDC must fold identically
    t.mergeMor(Seq((43L, "8", 1.75), (501L, "8", 2.5)).toDF("id", "grp", "v"),
      Seq("id"))
    assert(mv.refresh() === t.latestVersion)
    val maintained = mv.view().orderBy($"grp")
      .as[(String, Double, Long)].collect().toSeq
    val recomputed = t.snapshot().groupBy($"grp")
      .agg(round(sum($"v".cast("decimal(12,4)")), 4).cast("double").as("s"),
        count(lit(1)).as("c"))
      .orderBy($"grp").as[(String, Double, Long)].collect().toSeq
    assert(maintained === recomputed)
    // refresh with no new commits is a watermark no-op
    val v = mv.mv.latestVersion
    assert(mv.refresh() === t.latestVersion)
    assert(mv.mv.latestVersion === v)
    // vanished groups drop out entirely
    t.delete($"grp" === "9")
    mv.refresh()
    assert(mv.view().where($"grp" === "9").count() === 0)
  }

  test("maintained AVG folds to NULL, not NaN, when every non-null " +
      "value of a surviving group retires") {
    import graft.tables.IncrementalMatView
    val dir = tmp()
    // group g: one non-null and one null measure row — deleting the
    // non-null one leaves the group ALIVE (m_cnt 1) with a signed sum
    // that cancels to decimal ZERO, not NULL; the view must emit NULL
    // (what AVG over the all-null remainder recomputes to), not 0/0
    val t = GraftTable.create(spark, dir,
      Seq((1L, "g", Some(5.0)), (2L, "g", None), (3L, "h", Some(7.0)))
        .toDF("id", "grp", "v"))
    val mv = IncrementalMatView.create(spark, t, tmp(), Seq("grp"),
      Seq("v"), extremes = false, derived = Nil, dims = Nil,
      avgCols = Seq("v"), outputs = Nil)
    t.delete($"id" === 1L)
    mv.refresh()
    val got = mv.view()
      .select($"grp", $"sum_v", $"n_rows", $"avg_v")
      .as[(String, Option[Double], Long, Option[Double])]
      .collect().sortBy(_._1).toSeq
    assert(got === Seq(("g", None, 1L, None), ("h", Some(7.0), 1L, Some(7.0))),
      s"got $got")
    assert(!got.exists(_._4.exists(_.isNaN)), "AVG emitted NaN")
    // a PLAIN (no-AVG) view maintains the non-null count too now:
    // the same edge surfaces SUM as NULL, not the fold's 0.0
    val t2 = GraftTable.create(spark, tmp(),
      Seq((1L, "g", Some(5.0)), (2L, "g", None), (3L, "h", Some(7.0)))
        .toDF("id", "grp", "v"))
    val mv2 = IncrementalMatView.create(spark, t2, tmp(), Seq("grp"),
      Seq("v"), extremes = false)
    t2.delete($"id" === 1L)
    mv2.refresh()
    assert(mv2.view().where($"grp" === "g").select($"sum_v")
      .as[Option[Double]].head() === None,
      "plain view's cancelled sum must surface as NULL")
  }

  test("mat view retention property bounds the view's own storage") {
    import graft.tables.IncrementalMatView
    val dir = tmp()
    val df = spark.range(0, 200)
      .select($"id", ($"id" % 5).cast("string").as("grp"),
        ($"id" * 7 % 100).cast("double").as("v"))
    val t = GraftTable.create(spark, dir, df.repartition(4))
    val mvDir = tmp()
    val mv = IncrementalMatView.create(spark, t, mvDir, Seq("grp"), "v")
    // declare the retention window: each refresh then vacuums the
    // previous overwrite's stranded files after it commits
    mv.mv.setProperties(Map("graft.mv.retain.hours" -> "0"))
    def onDisk(): Long = java.nio.file.Files
      .walk(java.nio.file.Paths.get(mvDir))
      .filter(_.toString.endsWith(".parquet")).count()
    (1 to 4).foreach { i =>
      t.append(spark.range(1000L * i, 1000L * i + 10)
        .select($"id", lit("3").as("grp"), lit(i * 1.5).as("v")))
      mv.refresh()
    }
    // storage stays live-files-sized however many refreshes ran
    assert(onDisk() === mv.mv.snapshot().inputFiles.length.toLong,
      s"retention left stranded view files (${onDisk()} on disk)")
    // the view itself is untouched by its own vacuuming
    val maintained = mv.view().orderBy($"grp")
      .as[(String, Double, Long)].collect().toSeq
    val recomputed = t.snapshot().groupBy($"grp")
      .agg(round(sum($"v".cast("decimal(12,4)")), 4).cast("double"),
        count(lit(1)))
      .orderBy($"grp").as[(String, Double, Long)].collect().toSeq
    assert(maintained === recomputed)
  }

  test("extremes mat view survives a DELETE that retires a group's max") {
    import graft.tables.IncrementalMatView
    val dir = tmp()
    val df = spark.range(0, 200)
      .select($"id", ($"id" % 5).cast("string").as("grp"),
        ($"id" * 7 % 100).cast("double").as("v"))
    val t = GraftTable.create(spark, dir, df.repartition(4))
    val mv = IncrementalMatView.create(spark, t, tmp(), Seq("grp"), "v",
      extremes = true)
    def recompute() = t.snapshot().groupBy($"grp")
      .agg(round(sum($"v".cast("decimal(12,4)")), 4).cast("double").as("s"),
        count(lit(1)).as("c"),
        round(min($"v".cast("decimal(12,4)")), 4).cast("double").as("mn"),
        round(max($"v".cast("decimal(12,4)")), 4).cast("double").as("mx"))
      .orderBy($"grp").as[(String, Double, Long, Double, Double)]
      .collect().toSeq
    def maintained() = mv.view().orderBy($"grp")
      .as[(String, Double, Long, Double, Double)].collect().toSeq
    // append-only refresh: the monotone fold path, no deletions
    t.append(spark.range(200, 220)
      .select($"id", ($"id" % 5).cast("string").as("grp"),
        lit(120.5).as("v"))) // a new global max for every group
    mv.refresh()
    assert(maintained() === recompute(), "insert-only fold diverged")
    // the DELETE retires exactly the 120.5 extremes — a pure fold
    // would be stuck at 120.5 forever; affected-group recompute
    // must resurrect the runner-up max
    t.delete($"v" === 120.5)
    mv.refresh()
    assert(maintained() === recompute(),
      "maintained min/max diverged after deleting the group max")
    assert(!maintained().exists(_._5 === 120.5),
      "a retired max survived in the maintained view")
    // an UPDATE that moves the minimum between groups exercises the
    // preimage(recompute)/postimage(fold) split in one batch
    val minId = t.snapshot().where($"grp" === "0")
      .orderBy($"v", $"id").select($"id").as[Long].head()
    t.update($"id" === minId, Map("grp" -> lit("3")))
    mv.refresh()
    assert(maintained() === recompute(), "cross-group move diverged")
    // merge (insert+update mix) then a DV delete on top
    t.merge(Seq((17L, "4", 999.0), (1000L, "4", -5.0))
      .toDF("id", "grp", "v"), "id")
    t.deleteMor($"v" === 999.0)
    mv.refresh()
    assert(maintained() === recompute(), "merge+DV-delete diverged")
  }

  test("extremes recompute fetch is file-pruned on a group-clustered source") {
    import graft.tables.IncrementalMatView
    val dir = tmp()
    val df = spark.range(0, 4000)
      .select($"id", ($"id" % 8).cast("string").as("grp"),
        ($"id" * 7 % 100).cast("double").as("v"))
    val t = GraftTable.create(spark, dir, df.repartition(4))
    t.clusterBy(8, "grp") // one tight grp range per file
    val mv = IncrementalMatView.create(spark, t, tmp(), Seq("grp"), "v",
      extremes = true)
    // the new candidate read itself prunes: one group's key set keeps
    // a strict subset of the table's files
    val total = t.snapshot().inputFiles.length
    val prunedFiles = t.snapshotCandidates($"grp".isin("3")).inputFiles.length
    assert(prunedFiles < total,
      s"candidate read kept all $total files for one group")
    // a delete that retires group 3's maxima forces the recompute
    // path; the maintained view must still equal a full recompute
    t.delete($"grp" === "3" && $"v" > 90.0)
    mv.refresh()
    val maintained = mv.view().orderBy($"grp")
      .as[(String, Double, Long, Double, Double)].collect().toSeq
    val recomputed = t.snapshot().groupBy($"grp")
      .agg(round(sum($"v".cast("decimal(12,4)")), 4).cast("double").as("s"),
        count(lit(1)).as("c"),
        round(min($"v".cast("decimal(12,4)")), 4).cast("double").as("mn"),
        round(max($"v".cast("decimal(12,4)")), 4).cast("double").as("mx"))
      .orderBy($"grp").as[(String, Double, Long, Double, Double)]
      .collect().toSeq
    assert(maintained === recomputed,
      "pruned recompute diverged from the full recompute")
  }

  test("extremes recompute reaches null-keyed groups (null-safe routing)") {
    import graft.tables.IncrementalMatView
    // a null group key is routine: nullable source columns, or a
    // dim-joined view's unmatched fact rows. A null-UNSAFE affected
    // join folds the deletion instead of recomputing the group, and
    // the retired max survives forever (regression: failed pre-fix)
    val t = GraftTable.create(spark, tmp(),
      Seq((1L, Option.empty[String], 5.0), (2L, None, 99.0),
        (3L, Some("a"), 7.0), (4L, Some("a"), 11.0))
        .toDF("id", "grp", "v"))
    val mv = IncrementalMatView.create(spark, t, tmp(), Seq("grp"), "v",
      extremes = true)
    t.delete($"v" === 99.0) // retires the NULL group's max
    mv.refresh()
    val nullRow = mv.view().where($"grp".isNull)
      .select($"sum_v", $"n_rows", $"min_v", $"max_v")
      .as[(Double, Long, Double, Double)].collect().toSeq
    assert(nullRow === Seq((5.0, 1L, 5.0, 5.0)),
      s"null-keyed group not recomputed: $nullRow")
    // and deleting the whole null group retires the row entirely
    t.delete($"grp".isNull)
    mv.refresh()
    assert(mv.view().where($"grp".isNull).count() === 0)
    assert(mv.view().where($"grp" === "a").select($"max_v")
      .as[Double].head() === 11.0)
  }

  test("dim-join mat view folds fact deltas and recomputes on dim change") {
    import graft.tables.IncrementalMatView
    val fact = GraftTable.create(spark, tmp(),
      spark.range(0, 200)
        .select($"id", ($"id" % 10).as("k"),
          ($"id" * 3 % 40).cast("double").as("v")).repartition(4))
    val dim = GraftTable.create(spark, tmp(),
      spark.range(0, 10)
        .select($"id".as("dk"), ($"id" % 3).cast("string").as("seg")))
    val mv = IncrementalMatView.create(spark, fact, tmp(),
      Seq("seg"), Seq("v"), extremes = true, derived = Nil,
      dims = Seq((dim.root.toString, "k", "dk", "left")))
    def recompute() = fact.snapshot()
      .join(dim.snapshot(), $"k" === $"dk", "left")
      .groupBy($"seg")
      .agg(round(sum($"v".cast("decimal(12,4)")), 4).cast("double"),
        count(lit(1)),
        round(min($"v".cast("decimal(12,4)")), 4).cast("double"),
        round(max($"v".cast("decimal(12,4)")), 4).cast("double"))
      .orderBy($"seg")
      .as[(String, Double, Long, Double, Double)].collect().toSeq
    def maintained() = mv.view().orderBy($"seg")
      .as[(String, Double, Long, Double, Double)].collect().toSeq
    assert(maintained() === recompute())
    // fact delta folds through the dim join (dim untouched)
    fact.append(spark.range(200, 240)
      .select($"id", ($"id" % 10).as("k"), lit(99.5).as("v")))
    val viewVersions = mv.mv.latestVersion
    mv.refresh()
    assert(maintained() === recompute(), "fact fold through dim diverged")
    // dim change with the FACT UNCHANGED: the per-dim watermark must
    // force a full recompute — rows folded under the old segment
    // assignment move wholesale
    dim.update($"dk" === 1L, Map("seg" -> lit("9")))
    mv.refresh()
    assert(maintained() === recompute(),
      "dim change did not recompute the view")
    assert(maintained().exists(_._1 == "9"), "moved segment missing")
    // and the next fact delta folds again (watermark advanced)
    fact.delete($"v" === 99.5)
    mv.refresh()
    assert(maintained() === recompute(), "post-dim-change fold diverged")
  }

  test("inner dim join drops unmatched fact rows from the maintained view") {
    import graft.tables.IncrementalMatView
    // fact keys 0..9 but the dim only covers 0..4: a LEFT view keeps
    // the orphans under a null key, an INNER view must exclude them —
    // from create AND from every fold
    val fact = GraftTable.create(spark, tmp(),
      spark.range(0, 100)
        .select($"id", ($"id" % 10).as("k"),
          ($"id" % 7).cast("double").as("v")))
    val dim = GraftTable.create(spark, tmp(),
      spark.range(0, 5)
        .select($"id".as("dk"), concat(lit("s"), $"id" % 2).as("seg")))
    val inner = IncrementalMatView.create(spark, fact, tmp(),
      Seq("seg"), Seq("v"), extremes = false, derived = Nil,
      dims = Seq((dim.root.toString, "k", "dk", "inner")))
    val left = IncrementalMatView.create(spark, fact, tmp(),
      Seq("seg"), Seq("v"), extremes = false, derived = Nil,
      dims = Seq((dim.root.toString, "k", "dk", "left")))
    def recompute(jt: String) = fact.snapshot()
      .join(dim.snapshot(), $"k" === $"dk", jt)
      .groupBy($"seg")
      .agg(round(sum($"v".cast("decimal(12,4)")), 4).cast("double"),
        count(lit(1)))
      .orderBy($"seg")
      .as[(String, Double, Long)].collect().toSeq
    def view(mv: IncrementalMatView) = mv.view().orderBy($"seg")
      .as[(String, Double, Long)].collect().toSeq
    assert(view(inner) === recompute("inner"))
    assert(view(left) === recompute("left"))
    assert(!view(inner).exists(_._1 == null), "inner view kept orphans")
    assert(view(left).exists(_._1 == null), "left view lost its orphans")
    // a fold touching both matched and orphan rows keeps the split
    fact.append(spark.range(100, 140)
      .select($"id", ($"id" % 10).as("k"), lit(3.5).as("v")))
    inner.refresh(); left.refresh()
    assert(view(inner) === recompute("inner"), "inner fold diverged")
    assert(view(left) === recompute("left"), "left fold diverged")
  }

  test("multi-measure mat view maintains every measure from one pass") {
    import graft.tables.IncrementalMatView
    val dir = tmp()
    val df = spark.range(0, 200)
      .select($"id", ($"id" % 5).cast("string").as("grp"),
        ($"id" * 7 % 100).cast("double").as("v"),
        ($"id" * 3 % 40).cast("double").as("w"))
    val t = GraftTable.create(spark, dir, df.repartition(4))
    val mv = IncrementalMatView.create(spark, t, tmp(), Seq("grp"),
      Seq("v", "w"), extremes = true)
    def recompute() = t.snapshot().groupBy($"grp")
      .agg(round(sum($"v".cast("decimal(12,4)")), 4).cast("double").as("sv"),
        round(sum($"w".cast("decimal(12,4)")), 4).cast("double").as("sw"),
        count(lit(1)).as("c"),
        round(min($"v".cast("decimal(12,4)")), 4).cast("double").as("mnv"),
        round(max($"v".cast("decimal(12,4)")), 4).cast("double").as("mxv"),
        round(min($"w".cast("decimal(12,4)")), 4).cast("double").as("mnw"),
        round(max($"w".cast("decimal(12,4)")), 4).cast("double").as("mxw"))
      .orderBy($"grp")
      .as[(String, Double, Double, Long, Double, Double, Double, Double)]
      .collect().toSeq
    def maintained() = mv.view()
      .select($"grp", $"sum_v", $"sum_w", $"n_rows",
        $"min_v", $"max_v", $"min_w", $"max_w")
      .orderBy($"grp")
      .as[(String, Double, Double, Long, Double, Double, Double, Double)]
      .collect().toSeq
    assert(maintained() === recompute(), "initial materialization diverged")
    // insert-only: both measures fold monotonically in one pass
    t.append(spark.range(200, 220)
      .select($"id", ($"id" % 5).cast("string").as("grp"),
        lit(120.5).as("v"), lit(-7.25).as("w")))
    mv.refresh()
    assert(maintained() === recompute(), "insert-only fold diverged")
    // one DELETE retires v's max AND w's min in the same groups —
    // the shared affected-group recompute must fix both measures
    t.delete($"v" === 120.5)
    mv.refresh()
    assert(maintained() === recompute(),
      "multi-measure extremes diverged after the retiring delete")
    assert(!maintained().exists(_._6 === 120.5),
      "a retired v-max survived")
    assert(!maintained().exists(_._7 === -7.25),
      "a retired w-min survived")
    // update that moves rows across groups, then a DV delete
    t.update($"id" < 10, Map("grp" -> lit("4")))
    t.deleteMor($"w" > 35.0)
    mv.refresh()
    assert(maintained() === recompute(), "update+DV-delete diverged")
  }
}
