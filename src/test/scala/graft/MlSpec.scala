package graft

import graft.ml.RiskPipeline
import org.apache.spark.sql.functions._

class MlSpec extends SparkSpec {
  import spark.implicits._

  test("feature frame labels and features are complete") {
    val f = RiskPipeline.featureFrame(spark, sf)
    assert(f.where($"bad_flag".isNull).count() === 0)
    assert(f.count() === Tables.load(spark, sf, "orders").count())
  }

  test("risk pipeline trains and scores the validation years") {
    val scored = RiskPipeline.score(spark, sf)
    assert(scored.count() > 0)
    assert(scored.where(!$"prediction".isin(0.0, 1.0)).count() === 0)
  }

  test("crossvalidated tuning returns a sane AUC") {
    // synthetic labels are ~independent of features, so AUC ≈ 0.5 is
    // CORRECT here; the spec asserts the CV machinery produces a
    // valid, finite metric, not model skill on noise
    val metric = RiskPipeline.tuned(spark, sf)
    assert(metric >= 0.35 && metric <= 0.75, s"cv AUC $metric")
  }

  test("best-F1 threshold is a valid probability") {
    val th = RiskPipeline.bestF1Threshold(spark, sf)
    assert(th >= 0.0 && th <= 1.0, s"threshold $th")
  }

  test("GBT pipeline variant trains and scores") {
    val scored = RiskPipeline.gbtScore(spark, sf)
    assert(scored.count() > 0)
    assert(scored.where(!$"prediction".isin(0.0, 1.0)).count() === 0)
  }

  test("a trained GBT's transform IS the nested-CASE column: the " +
      "fixed-tree translation scores every row like the model") {
    import org.apache.spark.ml.classification.GBTClassifier
    import org.apache.spark.ml.feature.VectorAssembler
    val cols = Array("o_totalprice", "c_acctbal", "n_lines", "sum_qty")
    val data = RiskPipeline.featureFrame(spark, sf)
      .select((cols.map(col) ++ Seq(col("o_orderkey"), col("bad_flag"))).toIndexedSeq: _*)
      .cache()
    val assembled = new VectorAssembler().setInputCols(cols)
      .setOutputCol("features").transform(data)
    val model = new GBTClassifier().setMaxIter(3).setMaxDepth(3)
      .setSeed(42L).setLabelCol("bad_flag").setFeaturesCol("features")
      .fit(assembled)
    // the model's own transform...
    val theirs = model.transform(assembled)
      .select($"o_orderkey", $"prediction".cast("int").as("want"))
    // ...vs the ensemble translated into ONE Column over the raw
    // feature columns — no vector, no model object, plan-inlined
    val margin = RiskPipeline.ensembleMarginColumn(model, i => col(cols(i)))
    val mine = data.select($"o_orderkey",
      (margin > 0.0).cast("int").as("got"))
    val diff = theirs.join(mine, Seq("o_orderkey"))
      .where($"want" =!= $"got").count()
    assert(diff === 0,
      s"$diff rows scored differently from the trained model")
    assert(model.trees.length === 3, "sanity: the ensemble trained")
    data.unpersist()
  }

  test("confusion value covers the label×prediction grid") {
    val cm = RiskPipeline.confusionValue(spark, sf)
    assert(cm.count() <= 4 && cm.count() >= 2)
    val total = cm.agg(sum($"sum_net")).as[Double].head()
    assert(total != 0.0)
  }

  test("run ledger: two runs land two rows, retries land exactly once") {
    val ledger = java.nio.file.Files
      .createTempDirectory("graft_mlruns_").resolve("runs").toString
    RiskPipeline.logRun(spark, ledger, "run-001",
      Map("estimator" -> "lr", "maxIter" -> "10"),
      Map("auc" -> 0.61), "/models/run-001")
    RiskPipeline.logRun(spark, ledger, "run-002",
      Map("estimator" -> "gbt"), Map("auc" -> 0.58))
    // a RETRY of run-001 (same run id) must be a no-op — the
    // exactly-once txn watermark, not a duplicate row
    RiskPipeline.logRun(spark, ledger, "run-001",
      Map("estimator" -> "lr", "maxIter" -> "10"),
      Map("auc" -> 0.61), "/models/run-001")
    val t = graft.tables.GraftTable.load(spark, ledger)
    val rows = t.snapshot()
    assert(rows.count() === 2)
    assert(rows.select("run_id").as[String].collect().toSet ===
      Set("run-001", "run-002"))
    val r1 = rows.where($"run_id" === "run-001").head()
    assert(r1.getAs[String]("params").contains("\"maxIter\":\"10\""))
    assert(r1.getAs[String]("metrics") === """{"auc":"0.61"}""")
    assert(r1.getAs[String]("model_path") === "/models/run-001")
    // the ledger is an ordinary graft table: history shows one commit
    // per DISTINCT run (create + 2 appends; the retry committed none)
    assert(t.history().count() === 3)
  }

  test("model registry: bestRun flips when a better run lands, " +
      "latest tracks recency") {
    val ledger = java.nio.file.Files
      .createTempDirectory("graft_mlreg_").resolve("runs").toString
    def best(): (String, Double) = {
      val r = RiskPipeline.bestRuns(spark, ledger)
        .where($"estimator" === "lr").head()
      (r.getAs[String]("run_id"), r.getAs[Double]("metric_value"))
    }
    RiskPipeline.logRun(spark, ledger, "run-001",
      Map("estimator" -> "lr"), Map("auc" -> 0.61), "/m/1")
    RiskPipeline.logRun(spark, ledger, "run-002",
      Map("estimator" -> "lr"), Map("auc" -> 0.57), "/m/2")
    assert(best() === (("run-001", 0.61)),
      "a worse second run must not displace the best")
    // a better third run flips the best view...
    RiskPipeline.logRun(spark, ledger, "run-003",
      Map("estimator" -> "lr"), Map("auc" -> 0.71), "/m/3")
    assert(best() === (("run-003", 0.71)))
    // ...and serves its model path
    assert(RiskPipeline.bestRuns(spark, ledger)
      .where($"estimator" === "lr").head()
      .getAs[String]("model_path") === "/m/3")
    // latest follows recency, not quality: a newer-but-worse fourth
    RiskPipeline.logRun(spark, ledger, "run-004",
      Map("estimator" -> "lr"), Map("auc" -> 0.60), "/m/4")
    assert(RiskPipeline.latestRuns(spark, ledger)
      .where($"estimator" === "lr").head()
      .getAs[String]("run_id") === "run-004")
    assert(best() === (("run-003", 0.71)),
      "latest must not bleed into best")
    // estimators partition the registry: a gbt run changes nothing
    // on the lr rows, and a replayed run changes nothing at all
    RiskPipeline.logRun(spark, ledger, "run-005",
      Map("estimator" -> "gbt"), Map("auc" -> 0.99), "/m/5")
    RiskPipeline.logRun(spark, ledger, "run-003",
      Map("estimator" -> "lr"), Map("auc" -> 0.71), "/m/3")
    assert(best() === (("run-003", 0.71)))
    assert(RiskPipeline.bestRuns(spark, ledger).count() === 2)
  }
}
