package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Asymmetric scale probe for `dedup_incremental`: hold the probe
  * BATCH fixed, grow the stored CORPUS 10× — the regime that exposes
  * any O(corpus) term hiding in the per-batch cost (a symmetric 10×
  * sample masks it, because corpus and batch grow together). After
  * r10's candidate-pruned verification fetch the per-batch time
  * should be ~flat in corpus size.
  *
  * Env: SPARK_GRAFT_CORPUS_DIR (sf dir to index),
  * SPARK_GRAFT_BATCH_DIR (sf dir the fixed batch slices from),
  * SPARK_GRAFT_CPUS. Prints one JSON line: index build seconds,
  * per-batch probe seconds, pair count, and the verification fetch's
  * file diagnostics (read vs total).
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val corpusDir = sys.env("SPARK_GRAFT_CORPUS_DIR")
    val batchDir = sys.env("SPARK_GRAFT_BATCH_DIR")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Sessions.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val corpus = Tables.load(spark, corpusDir, "documents")
    // the fixed batch: the batch-sf 20% slice, re-keyed far above any
    // corpus id (scale_up offsets stay < 2e9) so every batch doc is
    // genuinely new against either corpus
    val batch = Tables.load(spark, batchDir, "documents")
      .filter(col("doc_id") % 5 === 0)
      .withColumn("doc_id", col("doc_id") + 2000000000L)
    val path = java.nio.file.Files
      .createTempDirectory("graft_scaleprobe_").toString
    val t0 = System.nanoTime()
    graft.operators.Dedup.incrementalIndex(spark, path, corpus,
      batchId = 0L)
    val t1 = System.nanoTime()
    val (out, st) = graft.operators.Dedup.incrementalDedupWithStats(
      spark, path, batch, batchId = 1L)
    val n = out.count()
    val t2 = System.nanoTime()
    println(s"""{"metric":"scale_probe","corpus":"$corpusDir","batch":"$batchDir","index_sec":${(t1 - t0) / 1e9},"probe_sec":${(t2 - t1) / 1e9},"pairs":$n,"sh_files_total":${st.shingleFilesTotal},"sh_files_read":${st.shingleFilesRead}}""")
    spark.stop()
  }
}
