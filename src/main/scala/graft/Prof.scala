package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Measurement harness for the optimization rounds (guide §1):
  * runs named `SparkEntry.queries` under a SparkListener and prints,
  * per query, the top Spark jobs by wall time keyed by job
  * description / short call site — the local[] stand-in for the
  * Stages tab. Diagnostic only; never on a query path.
  *
  * Usage: `sbt "runMain graft.Prof dedup_incremental mv_incremental"`
  * with the usual SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS env.
  */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.entry(spark).count() catch { case _: Throwable => }

    final class Rec(val desc: String, val start: Long) {
      @volatile var end: Long = 0L
    }
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Rec]()
    @volatile var stageTasks = 0L
    @volatile var stageCount = 0L
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val p = js.properties
        val desc = Option(p.getProperty("spark.job.description"))
          .orElse(Option(p.getProperty("callSite.short")))
          .getOrElse("?")
        jobs.put(js.jobId, new Rec(desc, js.time))
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val r = jobs.get(je.jobId)
        if (r != null) r.end = je.time
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stageCount += 1
        stageTasks += sc.stageInfo.numTasks
      }
    }

    val names = if (args.nonEmpty) args.toSeq
      else Seq("dedup_incremental", "mv_incremental")
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      // warm once (template/caches), measure second — mirrors the
      // bench's best-of-2
      try fn(spark, sfDir).count() catch { case e: Throwable =>
        println(s"warm $name failed: $e") }
      jobs.clear(); stageTasks = 0L; stageCount = 0L
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // let the listener bus drain
      spark.sparkContext.removeSparkListener(listener)
      import scala.jdk.CollectionConverters._
      val recs = jobs.values.asScala.toSeq
      val byDesc = recs.groupBy(_.desc).map { case (d, rs) =>
        val tot = rs.map(r => math.max(0L,
          (if (r.end > 0) r.end else r.start) - r.start)).sum
        (d, rs.size, tot)
      }.toSeq.sortBy(-_._3)
      val jobTotal = byDesc.map(_._3).sum
      println(f"===== $name%s wall=$wall%.2fs jobs=${recs.size}%d " +
        f"jobTime=${jobTotal / 1e3}%.2fs stages=$stageCount%d tasks=$stageTasks%d =====")
      byDesc.take(30).foreach { case (d, n, tot) =>
        println(f"  ${tot / 1e3}%8.3fs  x$n%-4d $d%.140s")
      }
    }
    spark.stop()
  }
}
