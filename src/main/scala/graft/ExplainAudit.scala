package graft

import org.apache.spark.sql.SparkSession

/** Plan-audit tool: prints the formatted physical plan of selected
  * driver queries so scan pushdown (PushedFilters/ReadSchema),
  * broadcast choices, and WholeStageCodegen spans can be reviewed.
  * Usage: runMain graft.ExplainAudit <sfDir> <q1,q2,...>
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args(1).split(",").toSeq
      else Seq("q1_pricing_summary", "q5_region_revenue", "tbl_dsv2_read")
    val spark = Sessions.tune(
      SparkSession.builder().master("local[4]"), 4).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n===== $n =====")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
