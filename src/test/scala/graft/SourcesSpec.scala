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
}
