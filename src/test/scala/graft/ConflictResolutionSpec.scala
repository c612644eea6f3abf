package graft

import java.nio.file.Files

import graft.tables.{CommitConflictException, GraftTable}
import org.apache.spark.sql.functions._

/** File-granular concurrent-DML conflict detection (the Delta
  * ConflictChecker analog): disjoint DML + appends + maintenance all
  * land via commit-time re-resolution; genuinely overlapping writes
  * and metadata races still fail with [[CommitConflictException]].
  */
class ConflictResolutionSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_confl_").resolve("t").toString

  private def seedTable(path: String): GraftTable = {
    val parts = ('A' to 'H').map(_.toString)
    val seed = parts.flatMap(p => (1L to 20L).map(i => (p, i, s"$p$i")))
      .toDF("p", "id", "v").repartition(8)
    GraftTable.create(spark, path, seed, partitionBy = Seq("p"))
  }

  test("8-way race: partition-disjoint DELETEs and appends all land") {
    val path = tmp()
    seedTable(path)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val parts = ('A' to 'H').map(_.toString)
    // 4 DELETEs, each on its own partition; 4 appends to 4 others —
    // every pair of racers is file-disjoint, so ALL must land
    val ops: Seq[() => Unit] =
      parts.take(4).map(p => () => {
        GraftTable.load(spark, path).delete($"p" === p && $"id" <= 10); ()
      }) ++
      parts.drop(4).map(p => () => {
        GraftTable.load(spark, path)
          .append(Seq((p, 100L, s"$p-new")).toDF("p", "id", "v")); ()
      })
    val results = Await.result(Future.sequence(ops.map(op => Future {
      try { op(); 1 }
      catch { case _: CommitConflictException => 0 }
    })), 300.seconds)
    assert(results.sum === 8, "every file-disjoint racer must land")
    val t = GraftTable.load(spark, path)
    assert(t.latestVersion === 8L, "one commit per racer, none clobbered")
    assert(t.snapshot().count() === 8 * 20 - 4 * 10 + 4)
    parts.take(4).foreach { p =>
      assert(t.snapshot().where($"p" === p && $"id" <= 10).count() === 0,
        s"DELETE on partition $p lost")
      assert(t.snapshot().where($"p" === p).count() === 10)
    }
    parts.drop(4).foreach { p =>
      assert(t.snapshot().where($"p" === p && $"id" === 100).count() === 1,
        s"append to partition $p lost")
    }
  }

  test("admission racing a GDPR forget on one dedup index " +
      "serializes: both land or the loser retries cleanly, and the " +
      "final state matches the (unique) serial outcome") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    import graft.operators.Dedup
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    // a few iterations to hit different interleavings; every
    // iteration must satisfy the same invariants
    (0 until 3).foreach { iter =>
      val stage = Files.createTempDirectory(s"graft_race_af$iter")
      val idx = stage.resolve("idx").toString
      val cl = stage.resolve("cl").toString
      // doc 1 admitted, doc 2 drops as its near-dup: clusters {1,2}→1
      Dedup.admitBatch(spark, idx, cl,
        Seq((1L, base)).toDF("doc_id", "text"), batchId = 0L)
      Dedup.admitBatch(spark, idx, cl,
        Seq((2L, base + " omega")).toDF("doc_id", "text"), batchId = 1L)
      // RACE: admit doc 30 (near-dup of the component) vs forget of
      // the canonical 1. Any failure must be the clean retryable
      // conflict; the retried loser then lands against fresh state.
      val ops: Seq[() => Unit] = Seq(
        () => { Dedup.admitBatch(spark, idx, cl,
          Seq((30L, base + " psi")).toDF("doc_id", "text"),
          batchId = 2L).unpersist(); () },
        () => { Dedup.forgetDocs(spark, idx, Seq(1L).toDF("doc_id"),
          Some(cl)).unpersist(); () })
      val outcomes = Await.result(Future.sequence(ops.map(op => Future {
        try { op(); None }
        catch { case e: CommitConflictException => Some(op) }
      })), 300.seconds)
      // loser (if any) retries once, sequentially — every step is
      // idempotent/watermarked, so the replay converges
      outcomes.flatten.foreach(op => op())
      // BOTH serial orders end in the same state — assert exactly it:
      // no surface names doc 1; the component is {2, 30} rooted at 2;
      // doc 30's admission was not lost
      def sub(s: String) = GraftTable.load(spark,
        java.nio.file.Paths.get(idx, s).toString).snapshot()
      assert(sub("sigs").where($"doc_id" === 1L).count() === 0,
        s"iter $iter: forgotten doc's signatures survived the race")
      assert(sub("shingles").where($"doc_id" === 1L).count() === 0)
      assert(sub("sigs").where($"doc_id" === 30L).count() > 0,
        s"iter $iter: the racing admission's signatures were lost")
      assert(Dedup.clustersView(spark, cl)
        .as[(Long, Long, Int)].collect().toSet
        === Set((2L, 2L, 1), (30L, 2L, 0)),
        s"iter $iter: clusters diverged from the serial outcome " +
          "(a retired doc may be named as root)")
    }
  }

  test("two curation pipelines sharing one index: every admission " +
      "lands exactly once (per-pipeline watermark scope), and each " +
      "screens against the other's index entries") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    import graft.streaming.Streams
    def doc(id: Long, text: String) =
      (id, text, "en", "web", text.length.toLong)
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val other = "one two three four five six seven eight nine ten"
    val stage = Files.createTempDirectory("graft_race_2p_")
    val curated = GraftTable.create(spark,
      stage.resolve("curated").toString,
      Seq.empty[(Long, String, String, String, Long)]
        .toDF("doc_id", "text", "lang", "source", "n_chars"))
    val idx = stage.resolve("idx").toString
    val cl = stage.resolve("cl").toString
    def pipeline(name: String, rows: Seq[(Long, String, String, String, Long)])
        : () => Unit = {
      val raw = stage.resolve(s"raw_$name")
      java.nio.file.Files.createDirectories(raw)
      graft.sources.Ingest.stageBatch(
        rows.toDF("doc_id", "text", "lang", "source", "n_chars"),
        raw.toString, "b1")
      () => { Streams.curationStream(spark, raw.toString,
        stage.resolve(s"cp_$name").toString, idx, cl, curated); () }
    }
    val runA = pipeline("a", Seq(doc(1, base),
      doc(7, s"unique seven $base reversed".split(" ").reverse.mkString(" "))))
    val runB = pipeline("b", Seq(doc(11, other), doc(17,
      "completely different words entirely novel content here " +
        "nothing shared with anything prior at all")))
    // CONCURRENT epoch 0 on both pipelines — same index, same
    // clusters, same curated table, distinct checkpoints. A cluster
    // merge race may conflict; the retried stream replays through
    // its exactly-once layers and converges.
    val outcomes = Await.result(Future.sequence(Seq(runA, runB).map(r =>
      Future {
        try { r(); None }
        catch { case e: Throwable
            if Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
              .take(8).exists(_.isInstanceOf[CommitConflictException]) =>
          Some(r)
        }
      })), 300.seconds)
    outcomes.flatten.foreach(r => r())
    // no lost admission: all four distinct docs curated exactly once
    val ids = curated.snapshot().groupBy($"doc_id").count()
      .as[(Long, Long)].collect().toMap
    assert(ids.keySet === Set(1L, 7L, 11L, 17L),
      s"lost/spurious admissions: ${ids.keySet}")
    assert(ids.values.forall(_ === 1L), s"duplicated admission: $ids")
    // no lost INDEX append (the shared-watermark bug): every doc's
    // signatures are present, so pipeline A's cycle-2 near-dup of a
    // PIPELINE-B doc is screened out
    val sigs = GraftTable.load(spark,
      java.nio.file.Paths.get(idx, "sigs").toString).snapshot()
    Seq(1L, 7L, 11L, 17L).foreach(d =>
      assert(sigs.where($"doc_id" === d).count() > 0,
        s"doc $d's index append was lost (watermark collision)"))
    val rawA2 = stage.resolve("raw_a")
    graft.sources.Ingest.stageBatch(
      Seq(doc(21, other + " eleven")).toDF(
        "doc_id", "text", "lang", "source", "n_chars"),
      rawA2.toString, "b2")
    graft.streaming.Streams.curationStream(spark, rawA2.toString,
      stage.resolve("cp_a").toString, idx, cl, curated)
    assert(curated.snapshot().where($"doc_id" === 21L).count() === 0,
      "pipeline A failed to screen against pipeline B's index entries")
  }

  test("write-write overlap on the same files is detected") {
    val t = seedTable(tmp())
    val aFiles = t.candidateFiles($"p" === "A").toSet
    // a racer rewrote partition A (delete half of it)...
    t.delete($"p" === "A" && $"id" <= 5)
    // ...while our staged DML also rewrites partition A's base files
    val e = intercept[CommitConflictException] {
      t.checkDmlConflicts("DELETE", 0, t.latestVersion, aFiles,
        Some($"p" === "A"), readsTable = false)
    }
    assert(e.getMessage.contains("also rewrites"))
  }

  test("a rewrite whose output may match the staged predicate conflicts") {
    val t = seedTable(tmp())
    // concurrent UPDATE moved rows INTO partition-B value space?
    // No — partitions are immutable here; instead: its rewritten
    // B-files must conflict with a staged DML *reading* B even
    // though the staged op rewrote no B file
    t.update($"p" === "B" && $"id" <= 5, Map("v" -> lit("changed")))
    val e = intercept[CommitConflictException] {
      t.checkDmlConflicts("DELETE", 0, t.latestVersion, Set.empty,
        Some($"p" === "B" && $"v" === "changed"), readsTable = false)
    }
    assert(e.getMessage.contains("matching this operation's predicate"))
    // ...but a staged DML on a DIFFERENT partition commutes with it
    t.checkDmlConflicts("DELETE", 0, t.latestVersion,
      t.candidateFiles($"p" === "C").toSet, Some($"p" === "C"),
      readsTable = false)
  }

  test("blind appends are exempt under WriteSerializable, conflict under Serializable") {
    val t = seedTable(tmp())
    val base = t.latestVersion
    t.append(Seq(("A", 200L, "late")).toDF("p", "id", "v"))
    // WriteSerializable (default): the staged DELETE on partition A is
    // logically ordered BEFORE the append — no conflict even though
    // the appended rows match the predicate
    t.checkDmlConflicts("DELETE", base, t.latestVersion,
      t.candidateFiles($"p" === "A").toSet, Some($"p" === "A"),
      readsTable = false)
    // Serializable: the matching append conflicts
    t.setProperties(Map("graft.isolationLevel" -> "Serializable"))
    val base2 = t.latestVersion
    t.append(Seq(("A", 201L, "late2")).toDF("p", "id", "v"))
    val e = intercept[CommitConflictException] {
      t.checkDmlConflicts("DELETE", base2, t.latestVersion,
        t.candidateFiles($"p" === "A").toSet, Some($"p" === "A"),
        readsTable = false)
    }
    assert(e.getMessage.contains("predicate"))
    // ...while a provably-disjoint append still commutes even there
    val base3 = t.latestVersion
    t.append(Seq(("H", 202L, "late3")).toDF("p", "id", "v"))
    t.checkDmlConflicts("DELETE", base3, t.latestVersion,
      t.candidateFiles($"p" === "A").toSet, Some($"p" === "A"),
      readsTable = false)
  }

  test("whole-table readers (MERGE): rewrites conflict; blind appends follow isolation") {
    val t = seedTable(tmp())
    // Delta's conflict matrix: INSERT vs MERGE cannot conflict under
    // WriteSerializable — the merge orders before the blind append
    val base = t.latestVersion
    t.append(Seq(("H", 300L, "x")).toDF("p", "id", "v"))
    t.checkDmlConflicts("MERGE", base, t.latestVersion, Set.empty,
      None, readsTable = true)
    // a non-blind rewrite (UPDATE) DOES conflict with a whole-table
    // reader — its output could hold rows the merge should have read
    val base2 = t.latestVersion
    t.update($"p" === "G" && $"id" <= 3, Map("v" -> lit("w")))
    val e = intercept[CommitConflictException] {
      t.checkDmlConflicts("MERGE", base2, t.latestVersion, Set.empty,
        None, readsTable = true)
    }
    assert(e.getMessage.contains("reads the whole table"))
    // under Serializable even the blind append conflicts
    t.setProperties(Map("graft.isolationLevel" -> "Serializable"))
    val base3 = t.latestVersion
    t.append(Seq(("H", 301L, "y")).toDF("p", "id", "v"))
    intercept[CommitConflictException] {
      t.checkDmlConflicts("MERGE", base3, t.latestVersion, Set.empty,
        None, readsTable = true)
    }
  }

  test("metadata and deletion-vector races are detected") {
    val t = seedTable(tmp())
    val base = t.latestVersion
    t.addConstraint("id_pos", "id > 0")
    intercept[CommitConflictException] {
      t.checkDmlConflicts("DELETE", base, t.latestVersion, Set.empty,
        Some($"p" === "A"), readsTable = false)
    }
    val base2 = t.latestVersion
    t.deleteMor($"p" === "D" && $"id" === 1)
    intercept[CommitConflictException] {
      t.checkDmlConflicts("DELETE", base2, t.latestVersion, Set.empty,
        Some($"p" === "A"), readsTable = false)
    }
  }

  test("OPTIMIZE races a concurrent append: both land") {
    val path = tmp()
    seedTable(path)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val results = Await.result(Future.sequence(Seq(
      Future {
        try { GraftTable.load(spark, path).compact(2); 1 }
        catch { case _: CommitConflictException => 0 }
      },
      Future {
        try {
          GraftTable.load(spark, path)
            .append(Seq(("Z", 1L, "new")).toDF("p", "id", "v")); 1
        } catch { case _: CommitConflictException => 0 }
      })), 300.seconds)
    assert(results.sum === 2, "compaction and append must both land")
    val t = GraftTable.load(spark, path)
    assert(t.snapshot().count() === 8 * 20 + 1)
    assert(t.snapshot().where($"p" === "Z").count() === 1)
  }

  test("partition overwrite and replaceWhere race disjoint appends: all land") {
    val path = tmp()
    seedTable(path)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val results = Await.result(Future.sequence(Seq(
      // rebuild partition A wholesale
      Future {
        try {
          GraftTable.load(spark, path).overwritePartitions(
            (1L to 5L).map(i => ("A", i, s"A-new$i")).toDF("p", "id", "v")); 1
        } catch { case _: CommitConflictException => 0 }
      },
      // rebuild the B slice via replaceWhere
      Future {
        try {
          GraftTable.load(spark, path).replaceWhere(col("p") === "B",
            (1L to 3L).map(i => ("B", i, s"B-new$i")).toDF("p", "id", "v")); 1
        } catch { case _: CommitConflictException => 0 }
      },
      // append into an unrelated partition
      Future {
        try {
          GraftTable.load(spark, path)
            .append(Seq(("H", 500L, "h-new")).toDF("p", "id", "v")); 1
        } catch { case _: CommitConflictException => 0 }
      })), 300.seconds)
    assert(results.sum === 3, "all partition-disjoint writers must land")
    val t = GraftTable.load(spark, path)
    assert(t.snapshot().where($"p" === "A").count() === 5)
    assert(t.snapshot().where($"p" === "B").count() === 3)
    assert(t.snapshot().where($"p" === "H").count() === 21)
    assert(t.snapshot().where($"p" === "C").count() === 20)
  }

  test("metadata commits retry through any race; constraint adds re-validate") {
    val path = tmp()
    seedTable(path)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // 4 property writers + 2 appenders race: all 6 land (metadata
    // commits re-run their whole body against the advanced base)
    val results = Await.result(Future.sequence(
      (1 to 4).map(i => Future {
        try { GraftTable.load(spark, path)
          .setProperties(Map(s"k$i" -> i.toString)); 1 }
        catch { case _: CommitConflictException => 0 }
      }) ++ Seq.tabulate(2)(i => Future {
        try { GraftTable.load(spark, path)
          .append(Seq(("H", 900L + i, "x")).toDF("p", "id", "v")); 1 }
        catch { case _: CommitConflictException => 0 }
      })), 300.seconds)
    assert(results.sum === 6, "all metadata writers and appenders must land")
    val t = GraftTable.load(spark, path)
    (1 to 4).foreach(i => assert(t.properties(s"k$i") === i.toString))
    assert(t.snapshot().where($"id" >= 900L).count() === 2)
    // a constraint add re-validates on retry: it must see rows a
    // racing append landed, so a violating row blocks it either way
    t.append(Seq(("H", -1L, "neg")).toDF("p", "id", "v"))
    intercept[graft.tables.ConstraintViolationException] {
      t.addConstraint("id_nonneg", "id >= 0")
    }
  }

  test("MERGE key envelope: disjoint-key rewrites commute, in-envelope ones conflict") {
    val t = seedTable(tmp())
    val base = t.latestVersion
    // a racer rewrote partition H (non-blind: removes + adds)...
    t.update($"p" === "H" && $"id" <= 3, Map("v" -> lit("w")))
    // ...while a staged MERGE's source keys all sit inside
    // [A,A]×[1,5]: the rewritten H files are stats-provably outside
    // the envelope, so the merge commutes — before the envelope this
    // was a blanket "reads the whole table" conflict
    t.checkDmlConflicts("MERGE", base, t.latestVersion, Set.empty,
      Some($"p" >= "A" && $"p" <= "A" && $"id" >= 1L && $"id" <= 5L),
      readsTable = false)
    // an envelope that spans the rewritten partition still conflicts:
    // a serial execution with the merge last would have read those rows
    val e = intercept[CommitConflictException] {
      t.checkDmlConflicts("MERGE", base, t.latestVersion, Set.empty,
        Some($"p" >= "A" && $"p" <= "H" && $"id" >= 1L && $"id" <= 5L),
        readsTable = false)
    }
    assert(e.getMessage.contains("may hold rows matching"))
  }

  test("In-list read sets see through interior-gap adds; ranges cannot") {
    val t = seedTable(tmp())
    // a racer appended id=100 under Serializable (where even blind
    // appends are checked against the read set)
    t.setProperties(Map("graft.isolationLevel" -> "Serializable"))
    val base2 = t.latestVersion
    t.append(Seq(("A", 100L, "mid")).toDF("p", "id", "v"))
    // a merge touching only keys {1, 180}: the [1,180] RANGE spans the
    // add and must conflict...
    intercept[CommitConflictException] {
      t.checkDmlConflicts("MERGE", base2, t.latestVersion, Set.empty,
        Some($"id" >= 1L && $"id" <= 180L), readsTable = false)
    }
    // ...while the exact In-list proves the add untouched and commutes
    t.checkDmlConflicts("MERGE", base2, t.latestVersion, Set.empty,
      Some($"id".isin(1L, 180L)), readsTable = false)
  }

  test("small-source MERGE races an interior append under Serializable: both land") {
    val path = tmp()
    seedTable(path).setProperties(
      Map("graft.isolationLevel" -> "Serializable"))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // the merge's 2 matchable key tuples take the In-list spelling, so
    // the append at (A,100) — INSIDE the merge's (p,id) min/max box
    // but not in its key set — must never draw a false conflict
    val results = Await.result(Future.sequence(Seq(
      Future {
        try {
          val src = Seq(("A", 1L, "m1"), ("A", 19L, "m19"))
            .toDF("p", "id", "v")
          GraftTable.load(spark, path).merge(src, Seq("p", "id")); 1
        } catch { case _: CommitConflictException => 0 }
      },
      Future {
        try { GraftTable.load(spark, path)
          .append(Seq(("A", 100L, "mid")).toDF("p", "id", "v")); 1 }
        catch { case _: CommitConflictException => 0 }
      })), 300.seconds)
    assert(results.sum === 2, "In-list-disjoint merge and append must both land")
    val t = GraftTable.load(spark, path)
    assert(t.snapshot().where($"p" === "A" && $"id" === 1L &&
      $"v" === "m1").count() === 1L)
    assert(t.snapshot().where($"p" === "A" && $"id" === 100L).count() === 1L)
  }

  test("MERGE probes only envelope-candidate files") {
    val path = tmp()
    val t = GraftTable.create(spark, path,
      spark.range(0, 800).select($"id", ($"id" * 1.0).as("x")))
    t.clusterBy(8, "id") // 8 files with disjoint id ranges + stats
    val total = t.snapshot().count()
    // both keys live in the first file's range — the probe (and the
    // rewrite) must touch 1 of 8 files, not scan the table
    t.merge(Seq((5L, -1.0), (10L, -2.0)).toDF("id", "x"), Seq("id"))
    val last = java.nio.file.Paths.get(path, "_graft_log",
      f"v${t.latestVersion}%08d.json")
    val json = Files.readString(last)
    val probed = "\"numProbedFiles\":(\\d+)".r
      .findFirstMatchIn(json).map(_.group(1).toInt)
    assert(probed.exists(p => p >= 1 && p < 8),
      s"expected an envelope-pruned probe, got numProbedFiles=$probed")
    assert(json.contains("\"numRewrittenFiles\":1"),
      "keys in one file's range must rewrite exactly that file")
    assert(t.snapshot().count() === total)
    assert(t.snapshot().where($"id" === 5L).select("x").as[Double]
      .head() === -1.0)
    // an empty-source merge probes nothing and rewrites nothing
    t.merge(Seq.empty[(Long, Double)].toDF("id", "x"), Seq("id"))
    val empt = Files.readString(java.nio.file.Paths.get(path,
      "_graft_log", f"v${t.latestVersion}%08d.json"))
    assert(empt.contains("\"numProbedFiles\":0"))
    assert(t.snapshot().count() === total)
  }

  test("MERGE races a disjoint-key UPDATE end-to-end: both land") {
    val path = tmp()
    seedTable(path)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // merge touches only (p=A, id∈[1,5]); the update rewrites only
    // partition H — whichever loses the version race must re-resolve
    // through the merge's source-key envelope and still land
    val results = Await.result(Future.sequence(Seq(
      Future {
        try {
          val src = (1L to 5L).map(i => ("A", i, s"m$i")).toDF("p", "id", "v")
          GraftTable.load(spark, path).merge(src, Seq("p", "id")); 1
        } catch { case _: CommitConflictException => 0 }
      },
      Future {
        try { GraftTable.load(spark, path)
          .update($"p" === "H" && $"id" <= 3, Map("v" -> lit("u"))); 1 }
        catch { case _: CommitConflictException => 0 }
      })), 300.seconds)
    assert(results.sum === 2, "key-disjoint MERGE and UPDATE must both land")
    val t = GraftTable.load(spark, path)
    assert(t.snapshot().where($"p" === "A" && $"id" <= 5 &&
      $"v".startsWith("m")).count() === 5L, "merge updates lost")
    assert(t.snapshot().where($"p" === "H" && $"id" <= 3 &&
      $"v" === "u").count() === 3L, "update lost")
    assert(t.snapshot().count() === 8 * 20)
  }

  test("BY SOURCE merge reads the whole table and follows the isolation matrix") {
    import graft.tables.GraftTable.{BySourceDelete, MatchedUpdate, NotMatchedInsert}
    val path = tmp()
    seedTable(path)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    // WriteSerializable (default): a blind append orders AFTER the
    // whole-table-reading merge — both land in every race outcome, and
    // the appended row (unmatched by the source!) must SURVIVE the
    // BY SOURCE DELETE: the merge never read it, so it cannot delete
    // it. A merge that wrongly kept its key-envelope read set would
    // treat the append as commutable and silently delete the fresh
    // row on re-resolution.
    val results = Await.result(Future.sequence(Seq(
      Future {
        try {
          val src = Seq(("A", 1L, "m1"), ("A", 2L, "m2")).toDF("p", "id", "v")
          GraftTable.load(spark, path).merge(src, Seq("p", "id"),
            Seq(MatchedUpdate()), Some(NotMatchedInsert()),
            Seq(BySourceDelete(Some($"p" === "H")))); 1
        } catch { case _: CommitConflictException => 0 }
      },
      Future {
        try { GraftTable.load(spark, path)
          .append(Seq(("H", 500L, "fresh")).toDF("p", "id", "v")); 1 }
        catch { case _: CommitConflictException => 0 }
      })), 300.seconds)
    assert(results.sum === 2,
      "under WriteSerializable both the BY SOURCE merge and the blind append land")
    val t = GraftTable.load(spark, path)
    assert(t.snapshot().where($"p" === "H" && $"id" === 500L).count() === 1,
      "the concurrently appended row must survive the BY SOURCE DELETE")
    assert(t.snapshot().where($"p" === "H" && $"id" <= 20L).count() === 0,
      "pre-merge unmatched H rows are deleted")
    // Serializable: the same lost race IS a conflict — the appended
    // rows were not consulted for unmatchedness, so no serial order
    // exists (the conflict posture the merge commits with:
    // readsTable=true, no predicate)
    t.setProperties(Map("graft.isolationLevel" -> "Serializable"))
    val base = t.latestVersion
    t.append(Seq(("G", 501L, "late")).toDF("p", "id", "v"))
    intercept[CommitConflictException] {
      t.checkDmlConflicts("MERGE", base, t.latestVersion, Set.empty,
        None, readsTable = true)
    }
  }

  test("BY SOURCE probe: unconditional clauses probe every file, conditional ones prune") {
    import graft.tables.GraftTable.{BySourceDelete, MatchedUpdate}
    val path = tmp()
    val t = GraftTable.create(spark, path,
      spark.range(0, 800).select($"id", ($"id" * 1.0).as("x")))
    t.clusterBy(8, "id") // 8 files with disjoint id ranges + stats
    def probed(): Int = {
      val json = Files.readString(java.nio.file.Paths.get(path,
        "_graft_log", f"v${t.latestVersion}%08d.json"))
      "\"numProbedFiles\":(\\d+)".r.findFirstMatchIn(json)
        .map(_.group(1).toInt).getOrElse(-1)
    }
    // an unconditional BY SOURCE DELETE must consult every file even
    // for a 1-key source (any file may hold an unmatched row)...
    t.merge(Seq((5L, -1.0)).toDF("id", "x"), Seq("id"),
      Seq(MatchedUpdate()), None, Seq(BySourceDelete(None)))
    assert(probed() === 8, s"unconditional BY SOURCE must probe all files, got ${probed()}")
    assert(t.snapshot().count() === 1, "everything but the matched key deleted")
    // ...while a stats-refutable condition prunes the probe back down
    val t2dir = tmp()
    val t2 = GraftTable.create(spark, t2dir,
      spark.range(0, 800).select($"id", ($"id" * 1.0).as("x")))
    t2.clusterBy(8, "id")
    t2.merge(Seq((5L, -1.0)).toDF("id", "x"), Seq("id"),
      Seq(MatchedUpdate()), None,
      Seq(BySourceDelete(Some($"id" >= 700L))))
    val json2 = Files.readString(java.nio.file.Paths.get(t2dir,
      "_graft_log", f"v${t2.latestVersion}%08d.json"))
    val p2 = "\"numProbedFiles\":(\\d+)".r.findFirstMatchIn(json2)
      .map(_.group(1).toInt).getOrElse(-1)
    assert(p2 >= 1 && p2 <= 3,
      s"conditional BY SOURCE should stats-prune the probe, got $p2 of 8")
    assert(t2.snapshot().count() === 700)
    assert(t2.snapshot().where($"id" === 5L).select("x").as[Double].head() === -1.0)
  }

  test("BY SOURCE with unboundable keys still probes the matched side") {
    import graft.tables.GraftTable.{BySourceDelete, MatchedUpdate}
    // a BOOLEAN key has no stats envelope (readsTable posture); a
    // conditional BY SOURCE clause must not shrink the probe to its
    // own predicate's files — the matched row still has to rewrite
    val path = tmp()
    val t = GraftTable.create(spark, path,
      Seq((true, "a"), (false, "b")).toDF("flag", "v"))
    t.merge(Seq((true, "A2")).toDF("flag", "v"), Seq("flag"),
      Seq(MatchedUpdate()), None,
      Seq(BySourceDelete(Some($"v" === "zz")))) // matches nothing
    val rows = t.snapshot().orderBy("v").as[(Boolean, String)].collect()
    assert(rows === Array((true, "A2"), (false, "b")),
      s"matched update lost under an unboundable key: ${rows.toSeq}")
  }

  test("DML racing DML on the same partition never loses an update") {
    // the overlap either fail-fasts or serializes — both racers
    // landing must produce the serial result, never a lost update
    val path = tmp()
    seedTable(path)
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val results = Await.result(Future.sequence(Seq(
      Future {
        try { GraftTable.load(spark, path)
          .delete($"p" === "A" && $"id" <= 10); 1 }
        catch { case _: CommitConflictException => 0 }
      },
      Future {
        try { GraftTable.load(spark, path)
          .delete($"p" === "A" && $"id" > 10); 1 }
        catch { case _: CommitConflictException => 0 }
      })), 300.seconds)
    val t = GraftTable.load(spark, path)
    val aCount = t.snapshot().where($"p" === "A").count()
    // both landed → 0 rows left; one landed → 10 rows; the table is
    // NEVER in a state neither serial order explains
    assert(results.sum >= 1, "at least the first committer must land")
    assert(aCount === (if (results.sum == 2) 0L else 10L),
      s"lost update: $aCount rows with ${results.sum} successful deletes")
    assert(t.snapshot().where($"p" =!= "A").count() === 7 * 20)
  }
}
