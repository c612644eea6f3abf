package graft

import graft.functions.TopKItems
import org.apache.spark.sql.functions._

class TopKItemsSpec extends SparkSpec {
  import spark.implicits._

  test("exact regime (capacity >= distinct) equals groupBy counts") {
    TopKItems.register(spark)
    val docs = Tables.load(spark, sf, "documents")
    val got = docs.select(TopKItems.top_k_items($"lang", 5, 64).as("top"))
      .select(explode($"top").as("t"))
      .select($"t.item", $"t.cnt")
      .as[(String, Long)].collect().toSeq
    val expect = docs.groupBy($"lang").count()
      .orderBy($"count".desc, $"lang")
      .limit(5).as[(String, Long)].collect().toSeq
    assert(got === expect)
  }

  test("works grouped and from SQL") {
    TopKItems.register(spark)
    Tables.load(spark, sf, "documents").createOrReplaceTempView("docs_tk")
    val grouped = spark.sql(
      "SELECT source, top_k_items(lang, 2, 64) AS top FROM docs_tk GROUP BY source")
    assert(grouped.count() > 0)
    assert(grouped.selectExpr("size(top)").as[Int].collect().forall(_ <= 2))
  }

  test("under capacity pressure keeps the true heavy hitter") {
    TopKItems.register(spark)
    // one dominant key + many singletons, capacity ≪ distinct
    val rows = (1 to 500).map(i => s"rare_$i") ++ Seq.fill(300)("dominant")
    val got = rows.toDF("s")
      .select(TopKItems.top_k_items($"s", 1, 16).as("top"))
      .select(explode($"top").as("t")).select($"t.item").as[String].head()
    assert(got === "dominant")
  }
}
