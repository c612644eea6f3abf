package graft.sources

import java.nio.file.{Files, Paths}

import graft.Tables
import graft.Tables.{asDouble, dec}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Source connectors and ingestion ops (SURVEY.md §2.A): the
  * reference's CSV ingest (Instructor/01-Fraud-Delta.py:37-51), JSON
  * parsing, and the Auto Loader incremental-ingest pattern
  * (Instructor/Auto Loader demo.py) re-expressed as a file-ledger
  * batch loader (plus the Structured Streaming twin in
  * graft.streaming.Streams.incrementalIngest).
  */
object Ingest {

  /** JSON column parsing: events.props is a JSON string; extract the
    * typed field with from_json (schema'd, codegen'd) and aggregate.
    */
  def jsonExtractProps(spark: SparkSession, sfDir: String): DataFrame =
    Tables.events(spark, sfDir)
      .withColumn("k", from_json(col("props"), StructType(Seq(StructField("k", IntegerType)))).getField("k"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_events"),
        asDouble(sum(dec(col("value")))).as("sum_value"))

  /** CSV ingest with explicit schema/header/delimiter (the 01-
    * notebook's read options), exercised as a full write→read round
    * trip from the canonical table. Returns the re-read data —
    * equality with the source is exactly the oracle check.
    */
  def csvRoundtrip(spark: SparkSession, sfDir: String): DataFrame = {
    val src = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        col("o_orderdate"), col("o_orderpriority"))
    val dir = Files.createTempDirectory("graft_csv_").resolve("orders_csv").toString
    src.write.option("header", "true").option("sep", "|")
      .csv(dir)
    val schema = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", TimestampType),
      StructField("o_orderpriority", StringType)))
    spark.read.schema(schema)
      .option("header", "true").option("sep", "|")
      .csv(dir)
  }

  /** CSV ingest with SCHEMA INFERENCE (01-Fraud-Delta.py:37-51 sets
    * `inferSchema true`): one extra pass over the data buys typed
    * columns without a declared schema. Long/double/timestamp/string
    * all round-trip; `SourcesSpec` asserts the inferred read equals
    * the explicit-schema read column-for-column.
    */
  def csvInferRead(spark: SparkSession, dir: String,
      sep: String = "|"): DataFrame =
    spark.read
      .option("header", "true").option("sep", sep)
      .option("inferSchema", "true")
      // optional zone suffix: TIMESTAMP (instant) columns CSV-write
      // with a zone id ("...Z"), NTZ columns without — accept both
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSS[XXX]")
      .csv(dir)

  /** Auto-Loader-style incremental batch ingest: a ledger file under
    * the checkpoint dir records already-processed files; each run
    * reads only new files and appends them to the output, exactly
    * once. (`cloudFiles.includeExistingFiles=true` + trigger-once
    * semantics from the demo.) Returns the newly ingested rows.
    */
  def incrementalLoad(spark: SparkSession, rawDir: String,
      checkpointDir: String): DataFrame = {
    val cp = Paths.get(checkpointDir)
    Files.createDirectories(cp)
    val ledger = cp.resolve("processed_files.txt")
    val seen = readLedger(ledger)
    val all = listParquet(rawDir)
    val fresh = all.filterNot(seen)
    val out =
      if (fresh.isEmpty) {
        // empty frame with the right schema, from any known file
        if (all.isEmpty) throw new IllegalArgumentException(s"no parquet files in $rawDir")
        spark.read.parquet(all.head).limit(0)
      } else
        // MATERIALIZE the batch BEFORE the ledger advances: the
        // ledger is written eagerly below while the return is a
        // frame — if that frame were lazy over the source files, any
        // caller-side failure before its first action would lose the
        // batch forever (the ledger already skips the files; the
        // lazy plan was never run). Checkpointed, the rows survive
        // in-session for the caller to retry against. A PROCESS
        // crash in the window still loses the batch — the ledger is
        // session-scoped at-least-materialized, not cross-process
        // exactly-once; pipelines that need crash-exactly-once take
        // the streaming twin (Streams.incrementalIngestEvolving),
        // whose sink watermark commits WITH the rows.
        spark.read.parquet(fresh: _*).localCheckpoint(true)
    Files.write(ledger, (seen ++ fresh).toSeq.sorted.asJava)
    out
  }

  /** [[incrementalLoad]] with SCHEMA TRACKING, additive EVOLUTION and
    * a RESCUED-DATA column — the Auto Loader schema-maturity trio
    * (cloudFiles.schemaLocation / schemaEvolutionMode /
    * _rescued_data; the demo pins a fixed schema, but evolution is
    * the first thing a real feed does). The tracked schema lives as
    * `schema.json` under the checkpoint (published atomically:
    * tmp + ATOMIC_MOVE), next to the file ledger — an old checkpoint
    * replays clean because both advance together.
    *
    * Modes:
    *  - `addNewColumns` (default): columns the tracked schema lacks
    *    are APPENDED to it; this batch (and all later ones) carry
    *    them, earlier rows simply never had them. Same-name columns
    *    whose type conflicts with the tracked type are NOT evolved —
    *    their unconvertible values are rescued.
    *  - `rescue`: the schema is frozen at first sight; new columns'
    *    values land in `_rescued_data` (JSON) instead of widening
    *    the table.
    *  - `failOnNewColumns`: a new column aborts the batch (schema
    *    enforcement; the ledger is NOT advanced, so the batch
    *    replays after the operator reacts).
    *
    * `_rescued_data` is a JSON object column, null for rows with
    * nothing to rescue: it carries (a) values of columns dropped by
    * `rescue` mode and (b) values whose cast to the tracked type
    * fails (the tracked column is null there — no value is ever
    * silently lost). Scale shape: pure map-side projection over the
    * fresh files; the schema work is O(columns) driver metadata.
    */
  def incrementalLoadEvolving(spark: SparkSession, rawDir: String,
      checkpointDir: String,
      mode: String = "addNewColumns"): DataFrame = {
    require(Set("addNewColumns", "rescue", "failOnNewColumns")(mode),
      s"unknown schema evolution mode: $mode")
    val cp = Paths.get(checkpointDir)
    Files.createDirectories(cp)
    val ledger = cp.resolve("processed_files.txt")
    val schemaFile = cp.resolve("schema.json")
    val seen = readLedger(ledger)
    val all = listParquet(rawDir)
    val fresh = all.filterNot(seen)
    val tracked: Option[StructType] = readTrackedSchema(schemaFile)
    if (fresh.isEmpty) {
      val schema = tracked.getOrElse {
        if (all.isEmpty)
          throw new IllegalArgumentException(s"no parquet files in $rawDir")
        spark.read.parquet(all.head).schema
      }
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        schema.add("_rescued_data", StringType))
    }
    // mergeSchema unions the BATCH's file footers; conflicts vs the
    // TRACKED schema are resolved below (a batch is assumed
    // self-consistent — files of one producer generation)
    val freshDf = spark.read.option("mergeSchema", "true")
      .parquet(fresh: _*)
    val (evolved, projection) =
      evolveAndProject(tracked, freshDf.schema, mode)
    // materialized before the ledger advances — the incrementalLoad
    // contract: a lazy return over files the ledger already skips
    // would lose the batch on any caller-side failure
    val out = freshDf.select(projection: _*).localCheckpoint(true)
    // publish schema THEN ledger: a crash between the two re-reads
    // the batch against the already-evolved schema (idempotent —
    // evolution is a no-op union), never the reverse (rows silently
    // dropped under a stale ledger)
    publishSchema(cp, schemaFile, evolved)
    Files.write(ledger, (seen ++ fresh).toSeq.sorted.asJava)
    out
  }

  /** List a directory's parquet files, sorted — the shared discovery
    * step of the batch ledger loader and the streaming twin.
    */
  private[graft] def listParquet(dir: String): Seq[String] = {
    val st = Files.list(Paths.get(dir))
    try st.iterator().asScala
      .map(_.toString).filter(_.endsWith(".parquet")).toSeq.sorted
    finally st.close()
  }

  /** Read a processed-files ledger (empty set if absent). */
  private[graft] def readLedger(ledger: java.nio.file.Path): Set[String] =
    if (Files.exists(ledger)) Files.readAllLines(ledger).asScala.toSet
    else Set.empty

  /** Read a tracked schema file (None if absent). */
  private[graft] def readTrackedSchema(
      schemaFile: java.nio.file.Path): Option[StructType] =
    if (Files.exists(schemaFile))
      Some(DataType.fromJson(Files.readString(schemaFile))
        .asInstanceOf[StructType])
    else None

  /** Atomic (tmp + ATOMIC_MOVE) publish of a tracked schema file. */
  private[graft] def publishSchema(cp: java.nio.file.Path,
      schemaFile: java.nio.file.Path, schema: StructType): Unit = {
    val tmp = Files.createTempFile(cp, ".schema", ".tmp")
    Files.writeString(tmp, schema.json)
    Files.move(tmp, schemaFile,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** The schema-evolution kernel shared by the batch ledger loader
    * and the Structured Streaming twin
    * (graft.streaming.Streams.incrementalIngestEvolving): resolve the
    * tracked schema against a batch's incoming schema under `mode`,
    * returning the EVOLVED tracked schema and the projection (evolved
    * columns + `_rescued_data`) to apply over a frame read with
    * `incoming`'s columns. Tracked columns present with the same type
    * pass through; absent ones project null; type-conflicted ones
    * try_cast with the unconvertible original rescued; `rescue`-mode
    * novel columns land whole in `_rescued_data`. Throws under
    * `failOnNewColumns` when a novel column appears — callers must
    * not have advanced any ledger yet.
    */
  private[graft] def evolveAndProject(tracked: Option[StructType],
      incoming: StructType, mode: String)
      : (StructType, Seq[org.apache.spark.sql.Column]) = {
    val (evolved: StructType, rescuedNew: Seq[StructField]) =
      tracked match {
        case None => (incoming, Nil)
        case Some(t) =>
          val known = t.fields.map(f => f.name.toLowerCase).toSet
          val novel = incoming.fields.toSeq
            .filterNot(f => known.contains(f.name.toLowerCase))
          mode match {
            case "addNewColumns" => (StructType(t.fields ++ novel), Nil)
            case "rescue" => (t, novel)
            case "failOnNewColumns" =>
              if (novel.nonEmpty) throw new IllegalArgumentException(
                s"schema evolution refused (failOnNewColumns): new " +
                  s"column(s) ${novel.map(_.name).mkString(", ")}")
              (t, Nil)
          }
      }
    val inByName = incoming.fields.map(f => f.name.toLowerCase -> f).toMap
    // tracked columns: present+same-type pass through; absent → null;
    // type-conflicted → try_cast, with the unconvertible original
    // rescued
    val rescueEntries = scala.collection.mutable.ArrayBuffer
      .empty[(String, org.apache.spark.sql.Column)]
    val projected = evolved.fields.map { f =>
      inByName.get(f.name.toLowerCase) match {
        case None => lit(null).cast(f.dataType).as(f.name)
        case Some(in) if in.dataType == f.dataType =>
          col(s"`${in.name}`").as(f.name)
        case Some(in) =>
          val casted = col(s"`${in.name}`").try_cast(f.dataType)
          rescueEntries += f.name -> when(
            casted.isNull && col(s"`${in.name}`").isNotNull,
            col(s"`${in.name}`").cast(StringType))
          casted.as(f.name)
      }
    }
    rescueEntries ++= rescuedNew.map(f =>
      f.name -> col(s"`${f.name}`").cast(StringType))
    val rescued =
      if (rescueEntries.isEmpty) lit(null).cast(StringType)
      else {
        val obj = to_json(struct(rescueEntries.toSeq.map {
          case (n, c) => c.as(n) }: _*))
        // to_json drops null fields → "{}" when nothing was rescued
        when(obj === "{}", lit(null).cast(StringType)).otherwise(obj)
      }
    (evolved, projected.toSeq :+ rescued.as("_rescued_data"))
  }

  /** Driver-facing wrapper: two incremental passes over the events
    * table staged as "arriving" files — first sees all files, second
    * sees none; returns pass1 ∪ pass2 (== full table, proving
    * exactly-once).
    */
  def incrementalAutoloader(spark: SparkSession, sfDir: String): DataFrame = {
    val stage = Files.createTempDirectory("graft_autoload_")
    val raw = stage.resolve("raw").toString
    Tables.events(spark, sfDir).repartition(4).write.parquet(raw)
    val cp = stage.resolve("cp").toString
    val pass1 = incrementalLoad(spark, raw, cp)
    val pass2 = incrementalLoad(spark, raw, cp)
    pass1.unionByName(pass2)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"))
  }

  /** Stage a frame's parquet files INTO `rawDir` under a batch prefix
    * (the flat layout [[incrementalLoad]] ledgers) — the "new files
    * arrive" half of an Auto-Loader scenario.
    */
  private[graft] def stageBatch(df: DataFrame, rawDir: String,
      prefix: String): Unit = {
    val tmp = Files.createTempDirectory("graft_stage_")
    df.write.parquet(tmp.resolve("b").toString)
    Files.createDirectories(Paths.get(rawDir))
    val st = Files.list(tmp.resolve("b"))
    try st.iterator().asScala
      .filter(_.getFileName.toString.endsWith(".parquet"))
      .zipWithIndex.foreach { case (p, i) =>
        val target = Paths.get(rawDir, s"$prefix-$i.parquet")
        // files must land WHOLE: a bare move degrades to copy+delete
        // across filesystems (tmpfs staging → disk rawDir) and a
        // concurrent ledger pass could list a torn file. Try the
        // atomic rename; across filesystems, copy to a dotted temp
        // name IN the target dir (invisible to the parquet listing)
        // and rename within the same filesystem — always atomic.
        try Files.move(p, target,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        catch {
          case _: java.nio.file.AtomicMoveNotSupportedException =>
            val part = target.resolveSibling("." + target.getFileName)
            Files.copy(p, part)
            Files.move(part, target,
              java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        }
      }
    finally st.close()
  }

  /** Driver scenario for [[incrementalLoadEvolving]]: batch 1 lands
    * with the base event schema; batch 2 arrives mid-stream CARRYING
    * a new `region` column — the ingest evolves additively, batch 2's
    * rows land with the column populated, batch 1's simply never had
    * it, and the old checkpoint (ledger + tracked schema) replays
    * clean (a third pass ingests nothing and keeps the evolved
    * schema). Output: per-type counts + how many rows carry the new
    * column — deterministic, oracle-replayable.
    */
  def autoloaderEvolution(spark: SparkSession, sfDir: String): DataFrame = {
    val stage = Files.createTempDirectory("graft_autoevo_")
    val raw = stage.resolve("raw").toString
    val cp = stage.resolve("cp").toString
    val ev = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"))
    stageBatch(ev.filter(col("event_id") % 2 === 0), raw, "b1")
    val pass1 = incrementalLoadEvolving(spark, raw, cp)
    stageBatch(ev.filter(col("event_id") % 2 === 1)
      .withColumn("region",
        concat(lit("r"), (col("user_id") % 3).cast("string"))),
      raw, "b2")
    val pass2 = incrementalLoadEvolving(spark, raw, cp)
    val pass3 = incrementalLoadEvolving(spark, raw, cp) // replay: empty
    pass1.unionByName(pass2, allowMissingColumns = true)
      .unionByName(pass3, allowMissingColumns = true)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        count(col("region")).as("n_with_region"),
        count(col("_rescued_data")).as("n_rescued"))
  }
}
