package graft

import java.nio.file.Files

import graft.tables.GraftTable
import org.apache.spark.sql.functions._

/** Per-file bloom-filter index (`graft.bloom.columns`): sub-range
  * point-lookup pruning that min/max stats cannot provide when every
  * file's key range overlaps (unclustered ingest order).
  */
class BloomIndexSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    Files.createTempDirectory("graft_bloom_").resolve("t").toString

  /** ids 0..799 dealt round-robin into 8 files: every file spans
    * [~0, ~799], so range stats keep all of them for any point key.
    */
  private def overlappingTable(path: String): GraftTable = {
    val t = GraftTable.create(spark, path,
      spark.range(0, 800).select($"id", ($"id" % 8).as("slot"),
        ($"id" * 1.0).as("x")).repartition(8, $"slot").drop("slot"))
    t.setProperties(Map("graft.bloom.columns" -> "id",
      "graft.bloom.bits" -> "4096"))
    t
  }

  test("point predicates prune below range resolution") {
    val t = overlappingTable(tmp())
    val all = t.snapshotInfo(t.latestVersion).files.size
    assert(all >= 4, s"need several overlapping files, got $all")
    // pre-index files: stats can't prune (ranges overlap), bloom absent
    assert(t.candidateFiles($"id" === 500L).size === all,
      "no sidecars yet — pruning must stay conservative")
    t.rebuildBloomIndex()
    val cand = t.candidateFiles($"id" === 500L)
    assert(cand.size < all, s"bloom did not prune: ${cand.size} of $all")
    assert(cand.nonEmpty, "the file holding id=500 must survive")
    // IN-lists prune to the union of their members' files
    val in = t.candidateFiles($"id".isin(500L, 501L))
    assert(in.size < all && in.size >= cand.size)
    // correctness through DML: the point DELETE lands exactly one row
    t.delete($"id" === 500L)
    assert(t.snapshot().count() === 799)
    assert(t.snapshot().where($"id" === 500L).count() === 0)
  }

  test("distributed probe hashes LONG keys natively (prunes, agrees " +
      "with the driver probe); type mismatches degrade to keep-all") {
    val t = overlappingTable(tmp())
    t.setProperties(Map("graft.bloom.columns" -> "id, x",
      "graft.bloom.bits" -> "4096"))
    t.rebuildBloomIndex()
    val all = t.snapshotInfo(t.latestVersion).files.size
    // long keys hash the SAME internal value the write side hashed,
    // so the distributed probe prunes exactly like the driver path
    val keys = spark.range(500, 502).select($"id")
    val (df, kept, total) =
      t.snapshotBloomInDistributedWithCount("id", keys)
    assert(total === all)
    val driverKept = t.candidateFiles($"id".isin(500L, 501L)).size
    assert(kept === driverKept,
      s"distributed long probe kept $kept files, driver kept $driverKept")
    assert(kept < all, "long keys must prune below the full file set")
    // nothing lost: both probe keys' rows survive the pruned scan
    assert(df.where($"id".isin(500L, 501L)).count() === 2)
    // a key type that DISAGREES with the column (double keys against
    // the long column) keeps ALL files — the sidecar hashed long
    // bytes, so hashing doubles would refute files that match
    // (lost rows); keep-all is correct, just unpruned
    val dkeys = spark.range(500, 502).select($"id".cast("double").as("id"))
    val (ddf, dkept, _) = t.snapshotBloomInDistributedWithCount("id", dkeys)
    assert(dkept === all,
      s"type-mismatched probe must keep ALL files, kept $dkept/$all")
    assert(ddf.count() === 800)
    // a DOUBLE column probed with double keys prunes natively
    val xkeys = spark.range(500, 502).select(($"id" * 1.0).as("x"))
    val (xdf, xkept, _) = t.snapshotBloomInDistributedWithCount("x", xkeys)
    val xDriver = t.candidateFiles($"x".isin(500.0, 501.0)).size
    assert(xkept === xDriver,
      s"distributed double probe kept $xkept files, driver kept $xDriver")
    assert(xkept < all, "double keys must prune below the full file set")
    assert(xdf.where($"x".isin(500.0, 501.0)).count() === 2)
  }

  test("distributed probe hashes ARRAY keys through Catalyst's own " +
      "converter: complex-typed bloom columns prune, lose no rows") {
    // round-robin slots: every file spans the id range, so only the
    // bloom can prune. The sidecar hashed the ARRAY's internal
    // ArrayData via codegen'd xxhash64; the probe must reproduce
    // those bytes from external Seq rows — previously this type
    // degraded to keep-all
    val t = GraftTable.create(spark, tmp(),
      spark.range(0, 800).select($"id",
        array($"id", $"id" + 1000L).as("tags"),
        ($"id" % 8).as("slot")).repartition(8, $"slot").drop("slot"))
    t.setProperties(Map("graft.bloom.columns" -> "tags",
      "graft.bloom.bits" -> "4096"))
    t.rebuildBloomIndex()
    val all = t.snapshotInfo(t.latestVersion).files.size
    assert(all >= 4, s"need several overlapping files, got $all")
    val keys = spark.range(500, 502)
      .select(array($"id", $"id" + 1000L).as("tags"))
    val (df, kept, total) =
      t.snapshotBloomInDistributedWithCount("tags", keys)
    assert(total === all)
    assert(kept < all,
      s"array-typed probe must prune below the full set, kept $kept/$all")
    // nothing lost: both probed arrays' rows survive the pruned scan
    assert(df.where($"id".isin(500L, 501L)).count() === 2,
      "complex-key pruning lost rows")
  }

  test("distributed probe hashes DATE and TIMESTAMP keys natively: " +
      "agrees with the driver probe, loses no rows") {
    val path = tmp()
    // 800 distinct days / hours dealt round-robin into 8 files: every
    // file spans the whole range, so stats keep all and only the
    // bloom prunes. Write-side sidecars hash via codegen'd xxhash64
    // over the NATIVE internal values (epoch days int / micros long);
    // the probe must reproduce those exact bytes from external Rows.
    val t = GraftTable.create(spark, path,
      spark.range(0, 800).select(
        date_add(lit(java.sql.Date.valueOf("2020-01-01")),
          $"id".cast("int")).as("d"),
        timestamp_seconds($"id" * 3600L).as("ts"),
        ($"id" % 8).as("slot")).repartition(8, $"slot").drop("slot"))
    t.setProperties(Map("graft.bloom.columns" -> "d, ts",
      "graft.bloom.bits" -> "4096"))
    t.rebuildBloomIndex()
    val all = t.snapshotInfo(t.latestVersion).files.size
    assert(all >= 4, s"need several overlapping files, got $all")
    // DATE keys (external java.sql.Date / LocalDate Rows → epoch days)
    val dkeys = spark.range(500, 502).select(
      date_add(lit(java.sql.Date.valueOf("2020-01-01")),
        $"id".cast("int")).as("d"))
    val (ddf, dkept, dtotal) =
      t.snapshotBloomInDistributedWithCount("d", dkeys)
    assert(dtotal === all)
    // ids 500, 501 land on 2021-05-15/16 (2020 is a leap year)
    val dLits = Seq(java.sql.Date.valueOf("2021-05-15"),
      java.sql.Date.valueOf("2021-05-16"))
    val dDriver = t.candidateFiles($"d".isin(dLits: _*)).size
    assert(dkept === dDriver,
      s"distributed date probe kept $dkept files, driver kept $dDriver")
    assert(dkept < all, "date keys must prune below the full file set")
    assert(ddf.where($"d".isin(dLits: _*)).count() === 2)
    // TIMESTAMP keys (external Timestamp / Instant Rows → epoch micros)
    val tkeys = spark.range(500, 502)
      .select(timestamp_seconds($"id" * 3600L).as("ts"))
    val (tdf, tkept, _) =
      t.snapshotBloomInDistributedWithCount("ts", tkeys)
    val tsLits = Seq(500L, 501L).map(h =>
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(h * 3600L)))
    val tDriver = t.candidateFiles($"ts".isin(tsLits: _*)).size
    assert(tkept === tDriver,
      s"distributed ts probe kept $tkept files, driver kept $tDriver")
    assert(tkept < all, "ts keys must prune below the full file set")
    assert(tdf.where($"ts".isin(tsLits: _*)).count() === 2)
  }

  test("MERGE probe prunes to bloom resolution on unclustered tables") {
    val path = tmp()
    val t = overlappingTable(path)
    t.rebuildBloomIndex()
    val all = t.snapshotInfo(t.latestVersion).files.size
    val total = t.snapshot().count()
    // a 2-key merge into a table whose every file spans the full key
    // range: min/max stats keep ALL files as candidates; the In-list
    // envelope consults the bloom sidecars, so the touched-file probe
    // opens only the file(s) that may actually hold the keys
    t.merge(Seq((500L, -1.0), (501L, -2.0)).toDF("id", "x"), Seq("id"))
    val json = Files.readString(java.nio.file.Paths.get(path,
      "_graft_log", f"v${t.latestVersion}%08d.json"))
    val probed = "\"numProbedFiles\":(\\d+)".r.findFirstMatchIn(json)
      .map(_.group(1).toInt).getOrElse(-1)
    assert(probed >= 1 && probed < all,
      s"bloom must scope the merge probe below $all stats candidates, got $probed")
    assert(t.snapshot().count() === total)
    assert(t.snapshot().where($"id" === 500L).select("x").as[Double]
      .head() === -1.0)
    assert(t.snapshot().where($"id" === 501L).select("x").as[Double]
      .head() === -2.0)
  }

  test("BY SOURCE merge probe: bloom scopes the key side, stats the " +
      "clause side") {
    import GraftTable.{BySourceDelete, MatchedUpdate}
    val path = tmp()
    // ids overlap across all 8 files (round-robin), but seg is
    // file-ALIGNED: each file holds exactly one seg value, so seg
    // stats are narrow while id stats are useless
    val t = GraftTable.create(spark, path,
      spark.range(0, 800).select($"id", ($"id" % 8).as("seg"),
        ($"id" * 1.0).as("x")).repartitionByRange(8, $"seg"))
    t.setProperties(Map("graft.bloom.columns" -> "id",
      "graft.bloom.bits" -> "4096"))
    t.rebuildBloomIndex()
    val all = t.snapshotInfo(t.latestVersion).files.size
    assert(all >= 6, s"need one file per seg, got $all")
    // sync merge: 2 keys (bloom prunes their disjunct to ≤2 files) +
    // a conditional BY SOURCE DELETE on seg=3 (stats prune that
    // disjunct to 1 file). The union probe must stay far below the
    // 8 files the OR'd predicate would keep stats-only.
    t.merge(Seq((500L, 4L, -1.0), (501L, 5L, -2.0))
        .toDF("id", "seg", "x"), Seq("id"),
      Seq(MatchedUpdate()), None,
      Seq(BySourceDelete(Some($"seg" === 3L))))
    val json = Files.readString(java.nio.file.Paths.get(path,
      "_graft_log", f"v${t.latestVersion}%08d.json"))
    val probed = "\"numProbedFiles\":(\\d+)".r.findFirstMatchIn(json)
      .map(_.group(1).toInt).getOrElse(-1)
    assert(probed >= 2 && probed <= 3,
      s"expected bloom(keys) ∪ stats(seg=3) ≈ 3 of $all files, got $probed")
    // semantics: seg=3 unmatched rows deleted, the two keys updated
    assert(t.snapshot().count() === 700)
    assert(t.snapshot().where($"seg" === 3L).count() === 0)
    assert(t.snapshot().where($"id" === 500L).select("x").as[Double]
      .head() === -1.0)
    assert(t.snapshot().where($"id" === 501L).select("x").as[Double]
      .head() === -2.0)
  }

  test("a damaged sidecar degrades conservatively and is NOT memoized") {
    val path = tmp()
    val t = overlappingTable(path)
    t.rebuildBloomIndex()
    val all = t.snapshotInfo(t.latestVersion).files.size
    // corrupt every sidecar in place (simulates a torn read window)
    val dir = java.nio.file.Paths.get(path, "files")
    val sidecars = {
      val s = Files.list(dir)
      try {
        val b = scala.collection.mutable.Buffer.empty[java.nio.file.Path]
        val it = s.iterator()
        while (it.hasNext) { val p = it.next()
          if (p.toString.endsWith(".bloom")) b += p }
        b.toSeq
      } finally s.close()
    }
    assert(sidecars.nonEmpty)
    val saved = sidecars.map(p => p -> Files.readAllBytes(p))
    saved.foreach { case (p, _) => Files.writeString(p, "{torn") }
    // damaged: every file answers "may contain" — conservative
    assert(t.candidateFiles($"id" === 500L).size === all,
      "damaged sidecars must keep, never drop")
    // restore the bytes OUT OF BAND (another session's rebuild): the
    // failed parses must not have been cached, so pruning resumes
    // without any API call invalidating a cache entry
    saved.foreach { case (p, b) => Files.write(p, b) }
    assert(t.candidateFiles($"id" === 500L).size < all,
      "a failed parse was memoized — pruning stayed disabled")
  }

  test("writes build sidecars; vacuum reclaims them with their file") {
    val path = tmp()
    val t = overlappingTable(path)
    t.rebuildBloomIndex()
    // a fresh append builds its own sidecar at write time
    t.append(Seq((9999L, 1.0)).toDF("id", "x"))
    val appended = t.candidateFiles($"id" === 9999L)
    assert(appended.size === 1,
      s"write-time sidecar must isolate the appended file: $appended")
    // rewriting everything retires the old files; vacuum must reclaim
    // their sidecars too, and keep live files' sidecars
    t.compact(2)
    t.vacuum(1)
    val onDisk = {
      val d = java.nio.file.Paths.get(path, "files")
      val s = java.nio.file.Files.list(d)
      try {
        val it = s.iterator()
        val b = scala.collection.mutable.Buffer.empty[String]
        while (it.hasNext) b += it.next().getFileName.toString
        b.toSeq
      } finally s.close()
    }
    val liveData = onDisk.filterNot(_.endsWith(".bloom")).toSet
    onDisk.filter(_.endsWith(".bloom")).foreach { b =>
      assert(liveData.contains(b.stripSuffix(".bloom")),
        s"orphan sidecar survived vacuum: $b")
    }
    assert(t.snapshot().count() === 801)
  }

  test("string keys and missing columns stay correct") {
    val t = GraftTable.create(spark, tmp(),
      (0 until 400).map(i => (s"k$i", i)).toDF("k", "n").repartition(4))
    t.setProperties(Map("graft.bloom.columns" -> "k, missing_col",
      "graft.bloom.bits" -> "4096"))
    t.rebuildBloomIndex()
    val all = t.snapshotInfo(t.latestVersion).files.size
    val cand = t.candidateFiles($"k" === "k123")
    assert(cand.size < all && cand.nonEmpty)
    t.update($"k" === "k123", Map("n" -> lit(-1)))
    assert(t.snapshot().where($"n" === -1).count() === 1)
    // a range predicate ignores the bloom (stats-only shapes)
    assert(t.candidateFiles($"k" >= "k0").nonEmpty)
  }
}
