package graft

import graft.functions.RollingHash
import org.apache.spark.sql.functions._

class RollingHashSpec extends SparkSpec {
  import spark.implicits._

  test("codegen expression matches the scala reference byte-for-byte") {
    RollingHash.register(spark)
    val got = Tables.load(spark, sf, "documents")
      .select($"doc_id", RollingHash.rolling_hash($"text").as("h"))
      .as[(Long, Long)].collect().toMap
    val texts = Tables.load(spark, sf, "documents")
      .select($"doc_id", $"text").as[(Long, String)].collect()
    texts.foreach { case (id, t) =>
      assert(got(id) === RollingHash.hashBytes(t.getBytes("UTF-8")))
    }
  }

  test("usable from SQL and inside whole-stage codegen") {
    RollingHash.register(spark)
    Tables.load(spark, sf, "documents").createOrReplaceTempView("docs_rh")
    val viaSql = spark.sql(
      "SELECT count(DISTINCT rolling_hash(text)) FROM docs_rh").as[Long].head()
    assert(viaSql > 0)
    // plan stays inside WholeStageCodegen: the `*(n)` stage marker
    // prefixes the Project in executedPlan.toString
    val plan = spark.sql("SELECT rolling_hash(text) FROM docs_rh")
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(") , plan)
  }

  test("null-safe and empty-string defined") {
    RollingHash.register(spark)
    val out = Seq(Some("abc"), Some(""), None).toDF("s")
      .select(RollingHash.rolling_hash($"s").as("h"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(out(0).contains(RollingHash.hashBytes("abc".getBytes)))
    assert(out(1).contains(0L))
    assert(out(2).isEmpty)
  }
}
