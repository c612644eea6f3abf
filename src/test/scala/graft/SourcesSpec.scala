package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Source/sink format coverage beyond the driver-checked CSV
  * roundtrip query: ORC and JSON roundtrips, and dynamic partition
  * overwrite (the lakehouse partial-refresh write mode).
  */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private def orders = Tables.load(spark, sf, "orders")

  test("CSV ingest honors header/delimiter/schema options (01-notebook options)") {
    val df = graft.sources.Ingest.csvRoundtrip(spark, sf)
    assert(df.count() === orders.count())
    assert(df.schema.fieldNames.toSeq ===
      Seq("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"))
    assert(df.where($"o_orderdate".isNull).count() === 0)
  }

  test("CSV schema inference matches the explicit-schema read") {
    val src = orders.select($"o_orderkey", $"o_orderstatus", $"o_totalprice",
      $"o_orderdate", $"o_orderpriority")
    val dir = Files.createTempDirectory("graft_csvinf_").resolve("c").toString
    src.write.option("header", "true").option("sep", "|").csv(dir)
    val inferred = graft.sources.Ingest.csvInferRead(spark, dir)
    assert(inferred.schema.fieldNames.toSeq === src.schema.fieldNames.toSeq)
    val types = inferred.schema.fields.map(f => f.name -> f.dataType).toMap
    // smallest integral type that fits wins (IntegerType at low sf)
    assert(Set[org.apache.spark.sql.types.DataType](
      org.apache.spark.sql.types.IntegerType,
      org.apache.spark.sql.types.LongType).contains(types("o_orderkey")),
      types("o_orderkey").toString)
    assert(types("o_totalprice") === org.apache.spark.sql.types.DoubleType)
    assert(types("o_orderstatus") === org.apache.spark.sql.types.StringType)
    assert(types("o_orderdate").typeName.startsWith("timestamp"),
      types("o_orderdate").toString)
    // inferred read ≡ explicit read, cell for cell
    val explicit = graft.sources.Ingest.csvRoundtrip(spark, sf)
      .select(src.columns.map(col): _*)
    assert(inferred.count() === explicit.count())
    assert(inferred.select($"o_orderkey".cast("long"), $"o_totalprice", $"o_orderstatus")
      .exceptAll(explicit.select($"o_orderkey".cast("long"), $"o_totalprice", $"o_orderstatus"))
      .count() === 0)
    assert(inferred.where($"o_orderdate".isNull).count() === 0)
  }

  test("ORC write/read roundtrip preserves data") {
    val dir = Files.createTempDirectory("graft_orc_").resolve("o").toString
    orders.write.orc(dir)
    val back = spark.read.orc(dir)
    assert(back.count() === orders.count())
    assert(back.except(orders).count() === 0)
  }

  test("JSON lines write/read roundtrip with explicit schema") {
    val dir = Files.createTempDirectory("graft_json_").resolve("o").toString
    orders.write.json(dir)
    val back = spark.read.schema(orders.schema).json(dir)
    assert(back.count() === orders.count())
    assert(back.except(orders).count() === 0)
  }

  test("dynamic partition overwrite replaces only the written partitions") {
    val dir = Files.createTempDirectory("graft_dpo_").resolve("o").toString
    val withYear = orders.withColumn("order_year", year($"o_orderdate"))
    withYear.write.partitionBy("order_year").parquet(dir)
    val before97 = spark.read.parquet(dir)
      .where($"order_year" === 1997).count()
    val beforeOther = spark.read.parquet(dir)
      .where($"order_year" =!= 1997).count()
    // overwrite ONLY 1997 with a filtered slice
    val replacement = withYear.where($"order_year" === 1997 && $"o_orderstatus" === "F")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try replacement.write.mode("overwrite").partitionBy("order_year").parquet(dir)
    finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")
    val after = spark.read.parquet(dir)
    assert(after.where($"order_year" =!= 1997).count() === beforeOther,
      "untouched partitions must survive")
    val after97 = after.where($"order_year" === 1997).count()
    assert(after97 < before97 && after97 === replacement.count())
  }

  private def evoStage(): (String, String) = {
    val d = Files.createTempDirectory("graft_evo_")
    (d.resolve("raw").toString, d.resolve("cp").toString)
  }

  private def land(df: org.apache.spark.sql.DataFrame, raw: String,
      name: String): Unit = {
    val tmp = Files.createTempDirectory("graft_evo_b_")
    df.coalesce(1).write.parquet(tmp.resolve("b").toString)
    Files.createDirectories(java.nio.file.Paths.get(raw))
    val st = Files.list(tmp.resolve("b"))
    try st.iterator().forEachRemaining { p =>
      if (p.getFileName.toString.endsWith(".parquet"))
        Files.move(p, java.nio.file.Paths.get(raw, s"$name.parquet"))
    } finally st.close()
  }

  test("auto-loader evolution: a new column arrives mid-stream and " +
      "old checkpoints replay clean") {
    import graft.sources.Ingest.incrementalLoadEvolving
    val (raw, cp) = evoStage()
    land(Seq((1L, "x"), (2L, "y")).toDF("id", "a"), raw, "b1")
    val p1 = incrementalLoadEvolving(spark, raw, cp)
    assert(p1.columns.toSeq === Seq("id", "a", "_rescued_data"))
    assert(p1.count() === 2)
    // batch 2 carries a NEW double column — additive evolution
    land(Seq((3L, "z", 1.5)).toDF("id", "a", "b"), raw, "b2")
    val p2 = incrementalLoadEvolving(spark, raw, cp)
    assert(p2.columns.toSeq === Seq("id", "a", "b", "_rescued_data"))
    assert(p2.select("b").as[Double].collect().toSeq === Seq(1.5))
    assert(p2.where($"_rescued_data".isNotNull).count() === 0,
      "an evolved column must not be rescued")
    // the old checkpoint replays clean: nothing re-ingests, the
    // evolved schema persists
    val p3 = incrementalLoadEvolving(spark, raw, cp)
    assert(p3.count() === 0)
    assert(p3.columns.toSeq === Seq("id", "a", "b", "_rescued_data"))
  }

  test("auto-loader rescue mode freezes the schema and rescues new " +
      "columns") {
    import graft.sources.Ingest.incrementalLoadEvolving
    val (raw, cp) = evoStage()
    land(Seq((1L, "x")).toDF("id", "a"), raw, "b1")
    incrementalLoadEvolving(spark, raw, cp, mode = "rescue").count()
    land(Seq((2L, "y", 9.25)).toDF("id", "a", "b"), raw, "b2")
    val p2 = incrementalLoadEvolving(spark, raw, cp, mode = "rescue")
    assert(p2.columns.toSeq === Seq("id", "a", "_rescued_data"),
      "rescue mode must not widen the schema")
    val rescued = p2.select(
      get_json_object($"_rescued_data", "$.b")).as[String].head()
    assert(rescued === "9.25", s"rescued payload was $rescued")
  }

  test("auto-loader enforcement mode refuses a new column and stays " +
      "replayable") {
    import graft.sources.Ingest.incrementalLoadEvolving
    val (raw, cp) = evoStage()
    land(Seq((1L, "x")).toDF("id", "a"), raw, "b1")
    incrementalLoadEvolving(spark, raw, cp,
      mode = "failOnNewColumns").count()
    land(Seq((2L, "y", 1.0)).toDF("id", "a", "b"), raw, "b2")
    intercept[IllegalArgumentException] {
      incrementalLoadEvolving(spark, raw, cp, mode = "failOnNewColumns")
    }
    // the refused batch did NOT advance the ledger: a permissive
    // retry ingests it
    val p = incrementalLoadEvolving(spark, raw, cp)
    assert(p.count() === 1)
    assert(p.columns.contains("b"))
  }

  test("auto-loader rescues values whose cast to the tracked type " +
      "fails") {
    import graft.sources.Ingest.incrementalLoadEvolving
    val (raw, cp) = evoStage()
    land(Seq((1L, "x")).toDF("id", "a"), raw, "b1")
    incrementalLoadEvolving(spark, raw, cp).count()
    // batch 2's id regressed to STRING: castable values convert,
    // the unconvertible one lands null WITH its original rescued
    land(Seq(("7", "y"), ("oops", "z")).toDF("id", "a"), raw, "b2")
    val p2 = incrementalLoadEvolving(spark, raw, cp)
    val rows = p2.select($"id", $"a", $"_rescued_data")
      .collect().sortBy(_.getString(1))
    assert(rows(0).getLong(0) === 7L && rows(0).isNullAt(2))
    assert(rows(1).isNullAt(0),
      "an unconvertible value must not invent a number")
    assert(rows(1).getString(2).contains("oops"),
      "the original value must be rescued, not lost")
  }

  test("incrementalLoad materializes the batch BEFORE the ledger " +
      "advances: the returned rows survive source-file loss, so a " +
      "caller-side failure can retry without losing the batch") {
    import java.nio.file.Files
    val stage = Files.createTempDirectory("graft_matload_")
    val raw = stage.resolve("raw").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .coalesce(1).write.parquet(raw)
    val out = graft.sources.Ingest.incrementalLoad(spark, raw,
      stage.resolve("cp").toString)
    // the ledger has already skipped these files; destroy them — a
    // LAZY return would now lose the batch forever (the retry sees
    // nothing fresh and the plan's source is gone)
    val st = Files.list(java.nio.file.Paths.get(raw))
    try st.iterator().forEachRemaining(p => { Files.delete(p): Unit })
    finally st.close()
    assert(out.count() === 2L,
      "the returned batch must be materialized, not a lazy plan " +
        "over files the ledger already skips")
    // the retry sees an empty dir (nothing fresh, no schema source)
    // and refuses descriptively — the materialized return was the
    // only copy
    intercept[IllegalArgumentException] {
      graft.sources.Ingest.incrementalLoad(spark, raw,
        stage.resolve("cp").toString)
    }: Unit
  }
}
