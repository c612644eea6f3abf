package graft.streaming

import graft.tables.{GraftSql, GraftTable, GraftTableFileIndex}
import org.apache.spark.sql.{DataFrame, GraftPlans, SaveMode, SQLContext, SparkSession}
import org.apache.spark.sql.execution.datasources.HadoopFsRelation
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.streaming.{Offset, Sink, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, RelationProvider, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types.StructType

/** A real Structured Streaming SOURCE over a GraftTable's commit log
  * (the Delta streaming-source analog, reference capability
  * 01-Fraud-Delta.py:175-201): offsets are COMMIT VERSIONS, each
  * micro-batch reads exactly the data files added in (start, end] —
  * version-precise and replayable from the checkpoint, unlike the
  * directory-listing `Streams.followTable` shape which infers
  * newness from file listing state.
  *
  * Usage:
  * {{{
  *   spark.readStream.format("graft-table")
  *     .option("path", tableRoot).load()
  * }}}
  *
  * Scale posture: getOffset is one O(1) log listing; getBatch hands
  * the added files (names only, from O(files) driver metadata) to the
  * vectorized parquet scan — no per-row driver work, no directory
  * re-listing of the data dir. Append-only is the supported contract
  * (as with Delta sources without CDF): a copy-on-write DELETE /
  * UPDATE / MERGE commit would surface rewritten files as if new, so
  * getBatch refuses non-append commits instead of double-reading.
  */
class GraftTableSourceProvider extends StreamSourceProvider
    with RelationProvider with CreatableRelationProvider
    with StreamSinkProvider with DataSourceRegister {
  override def shortName(): String = "graft-table"

  /** BATCH write path: `df.write.format("graft-table").mode(...)
    * .save(path)` — creates the table on first write, then maps
    * SaveMode onto the transactional commits (append/overwrite;
    * ErrorIfExists/Ignore follow their contracts).
    */
  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val spark = sqlContext.sparkSession
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("graft-table sink requires a path"))
    val local = GraftTable.localPath(path)
    val exists =
      try { GraftTable.load(spark, local); true }
      catch { case _: IllegalArgumentException => false }
    // Delta's mergeSchema option: a write carrying new columns
    // evolves the schema additively instead of failing enforcement
    val mergeSchema = parameters.get("mergeSchema")
      .exists(_.equalsIgnoreCase("true"))
    (exists, mode) match {
      case (false, _) => GraftTable.create(spark, local, data)
      case (true, SaveMode.Append) =>
        GraftTable.load(spark, local).append(data, evolve = mergeSchema)
      case (true, SaveMode.Overwrite) =>
        val t = GraftTable.load(spark, local)
        val overwriteSchema = parameters.get("overwriteSchema")
          .exists(_.equalsIgnoreCase("true"))
        val cur = t.snapshot().schema
        // the WRITER-facing schema excludes the identity column
        // (GENERATED ALWAYS — supplying it is refused) and generated
        // columns the frame omits (computed at write); comparison is
        // case- and order-insensitive, matching Spark's resolution
        def norm(fs: Seq[org.apache.spark.sql.types.StructField]) =
          fs.map(f => (f.name.toLowerCase, f.dataType)).toSet
        val writerVisible = cur.fields.toSeq.filterNot(f =>
          t.identityColumn.exists(_.equalsIgnoreCase(f.name)) ||
            (t.generatedColumns.keys.exists(_.equalsIgnoreCase(f.name)) &&
              !data.schema.fieldNames.exists(_.equalsIgnoreCase(f.name))))
        if (mergeSchema) {
          // Delta's overwrite+mergeSchema: UNION of old and new —
          // pad the frame with typed nulls for old-only columns and
          // let overwrite commit the merged shape
          val dataNames = data.schema.fieldNames.map(_.toLowerCase).toSet
          val padded = writerVisible
            .filterNot(f => dataNames.contains(f.name.toLowerCase))
            .foldLeft(data)((d, f) => d.withColumn(f.name,
              org.apache.spark.sql.functions.lit(null).cast(f.dataType)))
          t.overwrite(padded)
        } else {
          // Delta's guard: REPLACING the schema (not just the data)
          // needs explicit opt-in, or a mis-shaped frame silently
          // becomes the contract for every downstream reader
          if (!overwriteSchema && norm(writerVisible) != norm(data.schema.fields))
            throw new IllegalArgumentException(
              s"overwrite changes the schema from ${cur.simpleString} to " +
                s"${data.schema.simpleString}; pass option " +
                "overwriteSchema=true (replace) or mergeSchema=true (union)")
          t.overwrite(data)
        }
      case (true, SaveMode.Ignore) => ()
      case (true, SaveMode.ErrorIfExists) =>
        throw new IllegalArgumentException(s"graft table already exists at $local")
    }
    createRelation(sqlContext, parameters)
  }

  /** STREAMING sink: `ds.writeStream.format("graft-table")
    * .option("path", ...).start()` — each micro-batch lands through
    * the idempotent `appendIfNew` keyed by the query's checkpoint
    * (exactly-once across restarts, the Delta txn pattern;
    * `Streams.streamToTable` is the foreachBatch twin).
    */
  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: OutputMode): Sink = {
    require(outputMode == OutputMode.Append(),
      s"graft-table sink supports Append output mode, got $outputMode")
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("graft-table sink requires .option(\"path\", ...)"))
    // the idempotency watermark is keyed by the query's checkpoint;
    // defaulting it (e.g. to the table path) would make DISTINCT
    // queries share a watermark and silently drop each other's
    // batches — refuse instead
    val appId = parameters.getOrElse("checkpointLocation",
      throw new IllegalArgumentException(
        "graft-table sink requires .option(\"checkpointLocation\", ...) — " +
          "it keys the exactly-once watermark per query"))
    new GraftTableSink(sqlContext.sparkSession, path, appId)
  }

  /** BATCH read path: `spark.read.format("graft-table").load(path)`
    * and `CREATE TABLE t USING `graft-table` OPTIONS (path '...')` —
    * a parquet HadoopFsRelation over [[GraftTableFileIndex]], so
    * commit-log min/max data skipping runs inside scan planning for
    * every consumer (DataFrame or catalog SQL), with the full
    * vectorized parquet reader, pushdown and column pruning intact.
    * `.option("versionAsOf", v)` time-travels the scan.
    */
  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val spark = sqlContext.sparkSession
    val table = tableOf(sqlContext, parameters)
    if (parameters.get("readChangeFeed").exists(_.equalsIgnoreCase("true"))) {
      // batch CDF read (Delta's readChangeFeed option):
      // startingVersion is INCLUSIVE, endingVersion defaults to HEAD;
      // the timestamp spellings resolve through the same commit-time
      // lookups streaming and time travel use (starting = changes AT
      // or AFTER the instant, ending = last commit at or before it)
      require(!(parameters.contains("startingVersion") &&
        parameters.contains("startingTimestamp")),
        "set either startingVersion or startingTimestamp, not both")
      require(!(parameters.contains("endingVersion") &&
        parameters.contains("endingTimestamp")),
        "set either endingVersion or endingTimestamp, not both")
      val fromExcl = parameters.get("startingVersion").map(_.toLong - 1)
        .orElse(parameters.get("startingTimestamp").map(s =>
          table.versionBeforeTimestamp(
            GraftSql.parseSqlTimestamp(spark, s))))
        .getOrElse(-1L)
      val to = parameters.get("endingVersion").map(_.toLong)
        .orElse(parameters.get("endingTimestamp").map(s =>
          table.versionAtTimestamp(GraftSql.parseSqlTimestamp(spark, s))))
        .getOrElse(table.latestVersion)
      val feed = table.changeFeed(fromExcl, to)
      val ctx = sqlContext
      return new BaseRelation with org.apache.spark.sql.sources.TableScan {
        override def sqlContext: SQLContext = ctx
        override def schema: StructType = feed.schema
        override def buildScan(): org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] =
          feed.rdd
      }
    }
    val version = parameters.get("versionAsOf").map(_.toLong)
      .orElse(parameters.get("timestampAsOf").map(s =>
        table.versionAtTimestamp(GraftSql.parseSqlTimestamp(
          sqlContext.sparkSession, s))))
      .getOrElse(table.latestVersion)
    // reader-feature gate (Delta protocol semantics): this path plans
    // scans at FILE granularity and cannot apply row-level deletion
    // vectors — reading through it would resurrect deleted rows.
    // Refuse; snapshot()/snapshotAt() apply DVs, and purgeDvs()
    // returns the table to plain copy-on-write.
    if (table.hasDvs(version))
      throw new UnsupportedOperationException(
        s"graft table at version $version has active deletion vectors, " +
          "which the file-granular batch scan cannot apply; read via " +
          "GraftTable.snapshotAt or run purgeDvs()/compact() first")
    // same reader-feature gate for column mapping: this path reads
    // files under their RAW column names and cannot apply the
    // rename indirection (a renamed column would silently read null)
    if (table.hasColumnMapping(version))
      throw new UnsupportedOperationException(
        s"graft table at version $version has active column mapping " +
          "(RENAME/DROP COLUMN); read via GraftTable.snapshotAt, or " +
          "overwrite()/re-create to clear the mapping")
    val index = new GraftTableFileIndex(spark, table, version)
    // bucketed tables surface their spec so FileSourceScanExec plans
    // bucketed scans — two graft tables bucketed the same way join
    // with ZERO exchange (file names carry the bucket id suffix)
    val bucketSpec = table.bucketSpecAt(version).map { case (cols, n) =>
      org.apache.spark.sql.catalyst.catalog.BucketSpec(n, cols, Nil)
    }
    HadoopFsRelation(index, index.partitionSchema, index.dataSchema,
      bucketSpec, new ParquetFileFormat, parameters)(spark)
  }

  private def tableOf(sqlContext: SQLContext,
      parameters: Map[String, String]): GraftTable = {
    val path = parameters.getOrElse("path",
      throw new IllegalArgumentException("graft-table source requires .option(\"path\", ...)"))
    GraftTable.load(sqlContext.sparkSession, GraftTable.localPath(path))
  }

  private def cdcMode(parameters: Map[String, String]): Boolean =
    parameters.get("mode").exists(_.equalsIgnoreCase("cdc"))

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val base = schema.getOrElse(
      tableOf(sqlContext, parameters).snapshot().schema)
    val out = if (cdcMode(parameters))
      StructType(base.fields ++ Seq(
        org.apache.spark.sql.types.StructField("_change_type",
          org.apache.spark.sql.types.StringType, nullable = false),
        org.apache.spark.sql.types.StructField("_commit_version",
          org.apache.spark.sql.types.LongType, nullable = false)))
    else base
    (shortName(), out)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): Source = {
    val table = tableOf(sqlContext, parameters)
    // Delta's startingVersion: begin the stream at commit n instead of
    // replaying the whole table; "latest" = only future commits.
    // startingTimestamp resolves through the same commit-time lookup
    // as TIMESTAMP AS OF (the earliest commit AT or AFTER the wall
    // clock streams first — Delta's streaming semantics)
    require(!(parameters.contains("startingVersion") &&
        parameters.contains("startingTimestamp")),
      "set either startingVersion or startingTimestamp, not both")
    val startV = parameters.get("startingVersion").map {
      case s if s.equalsIgnoreCase("latest") => table.latestVersion
      case s => s.toLong - 1
    }.orElse(parameters.get("startingTimestamp").map { s =>
      table.versionBeforeTimestamp(
        GraftSql.parseSqlTimestamp(sqlContext.sparkSession, s))
    })
    new GraftTableSource(sqlContext.sparkSession, table,
      cdc = cdcMode(parameters), startVersion = startV,
      maxVersionsPerTrigger =
        parameters.get("maxVersionsPerTrigger").map(_.toLong),
      maxBytesPerTrigger =
        parameters.get("maxBytesPerTrigger").map(parseBytes),
      maxFilesPerTrigger =
        parameters.get("maxFilesPerTrigger").map(_.toLong),
      skipChangeCommits = parameters.get("skipChangeCommits")
        .exists(_.equalsIgnoreCase("true")))
  }

  /** `maxBytesPerTrigger` spellings: a plain byte count or a
    * k/kb/m/mb/g/gb-suffixed size (the spellings Delta and Spark's
    * own byteStringAsBytes accept). Anything else fails naming the
    * option, not with a bare NumberFormatException.
    */
  private val BytesSpelling = """(\d+)\s*([kmg]?b?)""".r
  private def parseBytes(s: String): Long = {
    s.trim.toLowerCase match {
      case BytesSpelling(num, suffix) =>
        val mult = suffix.stripSuffix("b") match {
          case "" => 1L
          case "k" => 1L << 10
          case "m" => 1L << 20
          case "g" => 1L << 30
        }
        val v = num.toLong * mult
        require(v > 0, s"maxBytesPerTrigger must be positive: '$s'")
        v
      case _ => throw new IllegalArgumentException(
        s"cannot parse maxBytesPerTrigger value '$s' " +
          "(use e.g. 10485760, 10m, 10mb, 1g)")
    }
  }
}

/** V1 streaming Sink over a GraftTable: micro-batches land through
  * the idempotent transactional append keyed by (appId, batchId), so
  * replayed epochs after a restart are no-ops — exactly-once without
  * any sink-side dedup state beyond the commit log itself.
  */
class GraftTableSink(spark: SparkSession, path: String,
    appId: String) extends Sink {
  private val local = GraftTable.localPath(path)

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    // addBatch data must be drained via its incremental plan, not
    // re-executed as a fresh query (the FileStreamSink pattern)
    val batch = GraftPlans.batchDF(spark,
      GraftPlans.toInternalRdd(data), data.schema)
    val table =
      try GraftTable.load(spark, local)
      catch {
        case _: IllegalArgumentException =>
          // empty CREATE first so even batch 0 lands through the
          // watermarked append (create itself records no txn id)
          GraftTable.create(spark, local, batch.limit(0))
      }
    table.appendIfNew(batch, batchId, appId)
  }
}

/** @param cdc when true, micro-batches are the row-level CHANGE FEED
  *   between the offsets (insert/delete/update pre+post images with
  *   `_change_type`/`_commit_version`) — Delta's `readChangeFeed`
  *   streaming analog. Unlike the default append-only mode, CDC mode
  *   crosses copy-on-write commits fine: the diff IS the payload.
  */
/** @param startVersion exclusive lower bound for the FIRST batch
  *   (None = replay from table creation) — only consulted when the
  *   checkpoint holds no prior offset.
  */
/** @param maxVersionsPerTrigger admission control (Delta's
  *   maxFilesPerTrigger analog at commit granularity): each trigger
  *   advances the offset at most this many versions, so a restart
  *   against a long backlog catches up in bounded micro-batches
  *   instead of one giant one. The watermark never regresses: the
  *   engine replays the last batch on restart (restoring source
  *   state through getBatch) before asking for a new offset.
  */
/** @param maxBytesPerTrigger byte-budget admission control (Delta's
  *   soft-max semantics): the window advances version by version
  *   while the cumulative ADDED bytes stay within budget, always
  *   admitting at least one version so an oversized commit cannot
  *   stall the stream. Composes with maxVersionsPerTrigger (both
  *   caps apply). Sizing is O(added-files) driver metadata per
  *   admitted version — no data I/O.
  */
/** @param skipChangeCommits Delta's streaming option: silently skip
  *   copy-on-write DML commits (file rewrites, DV adds) instead of
  *   failing the stream. Appends still flow; rows the skipped commit
  *   touched simply never re-emit — the documented opt-in trade for
  *   keeping an append-feed alive over a table that takes occasional
  *   corrections.
  */
/** @param maxFilesPerTrigger Delta's most common rate limit, at its
  *   native granularity: the window advances version by version while
  *   the cumulative billable FILE count stays within the limit —
  *   soft-max like the byte budget (always ≥1 version), zero-billed
  *   for commits that emit nothing, the cdc payload's file count in
  *   CDC mode. Composes with the version and byte caps.
  */
class GraftTableSource(spark: SparkSession, table: GraftTable,
    cdc: Boolean = false, startVersion: Option[Long] = None,
    maxVersionsPerTrigger: Option[Long] = None,
    maxBytesPerTrigger: Option[Long] = None,
    maxFilesPerTrigger: Option[Long] = None,
    skipChangeCommits: Boolean = false) extends Source
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {

  import org.apache.spark.sql.connector.read.streaming.{ReadLimit, Offset => OffsetV2}

  // highest version this source has handed out (offset or batch end);
  // the admission cap advances relative to it
  private var served: Long = -1L

  // AvailableNow semantics: the drain target is pinned at query start,
  // and the admission window walks up to it batch by batch
  private var availableNowTarget: Option[Long] = None

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowTarget = Some(table.latestVersion)

  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()

  /** Admission-control offset resolution (the engine passes the last
    * COMMITTED offset as `start`, so the window never regresses across
    * restarts). Also the AvailableNow path: each call advances at
    * most maxVersionsPerTrigger versions toward the pinned target.
    */
  override def latestOffset(start: OffsetV2, limit: ReadLimit): OffsetV2 = {
    val latest = availableNowTarget.getOrElse(table.latestVersion)
    if (latest < 0) return null
    val base = Option(start).map {
        case LongOffset(v) => v
        case o => o.json().toLong
      }.orElse(startVersion).getOrElse(-1L)
    val capped = admit(base, latest)
    served = math.max(served, capped)
    LongOffset(capped)
  }

  override def schema: StructType =
    if (!cdc) table.snapshot().schema
    else StructType(table.snapshot().schema.fields ++ Seq(
      org.apache.spark.sql.types.StructField("_change_type",
        org.apache.spark.sql.types.StringType, nullable = false),
      org.apache.spark.sql.types.StructField("_commit_version",
        org.apache.spark.sql.types.LongType, nullable = false)))

  /** Latest committed version — the high-watermark offset, capped by
    * the admission control window when one is configured.
    */
  /** Admission window: the highest version a trigger may advance to
    * from `base` — the version cap first, then the byte budget (both
    * soft-max: at least one version always admits so an oversized
    * commit flows instead of wedging the stream). ONE implementation
    * shared by the modern `latestOffset` path and the legacy
    * `getOffset` below — the two must never disagree on a budget.
    * Bytes are billed only for commits that will actually emit rows:
    * maintenance commits, and (under skipChangeCommits) COW change
    * commits, charge zero.
    */
  // committed versions are immutable, so per-version billable bytes
  // memoize: admit() re-walks the backlog window on EVERY engine
  // poll, and an uncached walk re-parses each version's commit JSON
  // (plus its predecessor's) and stats every file — O(backlog ×
  // files) driver work per poll on a long backlog. The source's
  // (skipChangeCommits, cdc) are fixed, so the version alone keys.
  private val billableCache =
    scala.collection.mutable.HashMap.empty[Long, Long]
  private def billable(v: Long): Long =
    billableCache.getOrElseUpdate(v,
      table.billableBytesIn(v, skipChangeCommits, cdc))
  private val billableFilesCache =
    scala.collection.mutable.HashMap.empty[Long, Long]
  private def billableFiles(v: Long): Long =
    billableFilesCache.getOrElseUpdate(v,
      table.billableFilesIn(v, skipChangeCommits, cdc))

  /** Walk the window forward under a cumulative budget (soft-max:
    * the first version always admits, so an oversized commit flows
    * instead of wedging the stream). One implementation for the byte
    * and file budgets — they must pace identically.
    */
  private def budgetWalk(base: Long, vCapped: Long, budget: Long,
      cost: Long => Long): Long = {
    var v = base + 1
    var spent = cost(v)
    var continue = true
    while (continue && v < vCapped) {
      val next = cost(v + 1)
      if (spent + next <= budget) { v += 1; spent += next }
      else continue = false
    }
    v
  }

  private def admit(base: Long, latest: Long): Long = {
    val vCapped = maxVersionsPerTrigger match {
      case Some(m) => math.max(base, math.min(latest, base + math.max(1L, m)))
      case None => math.max(base, latest)
    }
    if (vCapped <= base) return vCapped
    val byteCapped = maxBytesPerTrigger match {
      case Some(budget) => budgetWalk(base, vCapped, budget, billable)
      case None => vCapped
    }
    maxFilesPerTrigger match {
      case Some(limit) => budgetWalk(base, byteCapped, limit, billableFiles)
      case None => byteCapped
    }
  }

  override def getOffset: Option[Offset] = {
    val v = table.latestVersion
    if (v < 0) return None
    val base = math.max(served, startVersion.getOrElse(-1L))
    val capped = admit(base, v)
    if (capped < 0) None
    else {
      served = math.max(served, capped)
      Some(LongOffset(capped))
    }
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val startV = start.map(toVersion)
      .orElse(startVersion).getOrElse(-1L)
    val endV = toVersion(end)
    // restart path: the engine replays the last committed batch to
    // restore state — learn the checkpoint position so the admission
    // window resumes from it instead of regressing
    served = math.max(served, endV)
    val df =
      if (cdc) table.changeFeed(startV, endV)
      else {
        val batch = table.filesAddedIn(startV, endV, skipChangeCommits)
        if (batch.files.isEmpty)
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], batch.schema)
        else table.readBatchFiles(batch.files, batch.schema)
      }
    // V1 sources must hand back an isStreaming=true frame
    GraftPlans.streamingDF(spark, GraftPlans.toInternalRdd(df), df.schema)
  }

  private def toVersion(o: Offset): Long = o match {
    case LongOffset(v) => v
    case other => other.json().toLong
  }

  override def stop(): Unit = ()
}
