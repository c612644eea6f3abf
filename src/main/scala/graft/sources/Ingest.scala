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
    val seen: Set[String] =
      if (Files.exists(ledger)) Files.readAllLines(ledger).asScala.toSet else Set.empty
    val all = {
      val st = Files.list(Paths.get(rawDir))
      try st.iterator().asScala
        .map(_.toString).filter(_.endsWith(".parquet")).toSeq.sorted
      finally st.close()
    }
    val fresh = all.filterNot(seen)
    val out =
      if (fresh.isEmpty) {
        // empty frame with the right schema, from any known file
        if (all.isEmpty) throw new IllegalArgumentException(s"no parquet files in $rawDir")
        spark.read.parquet(all.head).limit(0)
      } else spark.read.parquet(fresh: _*)
    Files.write(ledger, (seen ++ fresh).toSeq.sorted.asJava)
    out
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
}
