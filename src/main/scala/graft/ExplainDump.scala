package graft

/** Dump `.explain("formatted")` for named queries to files — the
  * plan-evidence artifact the optimization rounds commit under
  * `plans/rNN/` (judge-checkable without running Spark).
  *
  * Usage: `runMain graft.ExplainDump <outDir> <suffix> <query...>`
  * writes `<outDir>/<query>_<suffix>.txt` per query. Reads the usual
  * SPARK_GRAFT_SF_DIR (default sf0.01 — plans, not timings).
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ExplainDump <outDir> <suffix> <query...>")
    val outDir = java.nio.file.Paths.get(args(0))
    java.nio.file.Files.createDirectories(outDir)
    val suffix = args(1)
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Sessions.local(8)
    for (q <- args.drop(2)) {
      val txt = try {
        val df = SparkEntry.queries(q)(spark, sf)
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      } catch { case e: Throwable => s"explain failed: $e" }
      java.nio.file.Files.writeString(
        outDir.resolve(s"${q}_$suffix.txt"), txt)
      println(s"wrote ${q}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
