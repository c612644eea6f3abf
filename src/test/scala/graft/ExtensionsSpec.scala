package graft

import org.apache.spark.sql.SparkSessionExtensions

class ExtensionsSpec extends SparkSpec {

  test("GraftExtensions applies cleanly to an extensions object") {
    // the injected behaviors themselves are covered by AsOfNativeSpec
    // (strategy) and the function specs; builder-path coverage here is
    // that all injections register without error
    val e = new SparkSessionExtensions
    new GraftExtensions().apply(e)
  }

  test("extension-injected functions resolve in a session") {
    // same injections applied session-scoped (the runtime path)
    graft.functions.RollingHash.register(spark)
    graft.functions.TopKItems.register(spark)
    Tables.load(spark, sf, "documents").createOrReplaceTempView("docs_ext")
    val row = spark.sql(
      """SELECT rolling_hash(first(text)) AS h,
        |       top_k_items(lang, 1, 64)[0].item AS top_lang
        |FROM docs_ext""".stripMargin).collect()(0)
    assert(!row.isNullAt(0))
    assert(row.getString(1).nonEmpty)
  }
}
