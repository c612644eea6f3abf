package graft
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local(8)
    val sf = "/root/testdata/sf0.01"
    val queries = if (args.nonEmpty) args.toSeq
      else Seq("q1_pricing_summary", "q3_shipping_priority", "q5_region_revenue")
    for (q <- queries) {
      println(s"===== $q =====")
      val df = SparkEntry.queries(q)(spark, sf)
      val plan = df.queryExecution.executedPlan.toString
      println("PushedFilters: " + plan.linesIterator.filter(_.contains("PushedFilters")).mkString(" | ").take(400))
      println("ReadSchema: " + plan.linesIterator.filter(_.contains("ReadSchema")).map(_.trim.take(160)).mkString("\n  "))
      println("Broadcast joins: " + plan.linesIterator.count(_.contains("BroadcastHashJoin")))
      println("SortMerge joins: " + plan.linesIterator.count(_.contains("SortMergeJoin")))
      println("ShuffledHash joins: " + plan.linesIterator.count(_.contains("ShuffledHashJoin")))
      println("Exchanges: " + plan.linesIterator.count(_.trim.startsWith("Exchange")))
      println("WSCG stages: " + plan.linesIterator.count(_.contains("WholeStageCodegen")))
    }
    spark.stop()
  }
}
