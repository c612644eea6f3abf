package graft.ml

import graft.Tables
import graft.Tables.{asDouble, dec}
import graft.tables.GraftTable
import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.ml.feature._
import org.apache.spark.ml.tuning.{CrossValidator, ParamGridBuilder}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The loan-risk ML pipeline (Instructor/03-Fraud-ML.py) re-targeted
  * at the star schema: predict `bad_flag` (order not fulfilled) from
  * order/customer features, with the exact reference stage chain —
  * StringIndexer → OneHotEncoder → Imputer → VectorAssembler →
  * StandardScaler → LogisticRegression — year-based train/valid
  * split, CrossValidator tuning, and the business-value confusion
  * matrix.
  */
object RiskPipeline {

  val categoricals = Array("o_orderpriority", "c_mktsegment")
  val numerics = Array("o_totalprice", "c_acctbal", "n_lines", "sum_qty")

  /** Feature frame: orders ⋈ customer (planner-sized join) ⋈
    * lineitem agg, labeled like 01-Fraud-Delta.py:63-64.
    */
  def featureFrame(spark: SparkSession, sfDir: String): DataFrame = {
    val o = Tables.load(spark, sfDir, "orders")
    val c = Tables.load(spark, sfDir, "customer")
    val li = Tables.load(spark, sfDir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).cast("double").as("n_lines"),
        asDouble(sum(dec(col("l_quantity")))).as("sum_qty"))
    o.join(c, o("o_custkey") === c("c_custkey"))
      .join(li, o("o_orderkey") === li("l_orderkey"), "left")
      .withColumn("n_lines", coalesce(col("n_lines"), lit(0.0)))
      .withColumn("sum_qty", coalesce(col("sum_qty"), lit(0.0)))
      .withColumn("bad_flag", (col("o_orderstatus") =!= "F").cast("double"))
      .withColumn("issue_year", year(col("o_orderdate")))
      .withColumn("net", asDouble(round(
        dec(col("o_totalprice")) * lit(0.1).cast("decimal(2,1)"), 2)) *
        when(col("bad_flag") === 1.0, -1).otherwise(1))
      .select((categoricals.map(col) ++ numerics.map(col) ++
        Seq(col("o_orderkey"), col("bad_flag"), col("issue_year"), col("net"))): _*)
  }

  /** The reference's model-matrix stages (03-Fraud-ML.py:116-146). */
  def pipeline(): Pipeline = {
    val indexers = categoricals.map(c =>
      new StringIndexer().setInputCol(c).setOutputCol(c + "_idx")
        .setHandleInvalid("keep"))
    val ohes = categoricals.map(c =>
      new OneHotEncoder().setInputCol(c + "_idx").setOutputCol(c + "_class"))
    val imputer = new Imputer().setInputCols(numerics)
      .setOutputCols(numerics.map(_ + "_imp"))
    val assembler = new VectorAssembler()
      .setInputCols(categoricals.map(_ + "_class") ++ numerics.map(_ + "_imp"))
      .setOutputCol("features")
    val scaler = new StandardScaler().setInputCol("features")
      .setOutputCol("scaledFeatures").setWithMean(true).setWithStd(true)
    val lr = new LogisticRegression().setMaxIter(10)
      .setElasticNetParam(0.5).setFeaturesCol("scaledFeatures")
      .setLabelCol("bad_flag")
    new Pipeline().setStages(
      indexers ++ ohes ++ Array(imputer, assembler, scaler, lr))
  }

  /** Train on early years, score the later years
    * (03-Fraud-ML.py:95-96), returning per-order probabilities.
    */
  def score(spark: SparkSession, sfDir: String): DataFrame = {
    val data = featureFrame(spark, sfDir).cache()
    val train = data.filter(col("issue_year") <= 1997)
    val valid = data.filter(col("issue_year") > 1997)
    val model = pipeline().fit(train)
    // fit (the multi-pass consumer) is done — release the cache; the
    // single transform pass below recomputes lazily
    data.unpersist()
    model.transform(valid)
      .select(col("o_orderkey"), col("bad_flag"), col("prediction"),
        col("probability").cast("string").as("probability"),
        // the REAL positive-class score for ranking metrics — a
        // thresholded 0/1 column degenerates AUC to a 2-point ROC
        org.apache.spark.ml.functions.vector_to_array(col("probability"))
          .getItem(1).as("prob_bad"))
  }

  /** Deterministic FIXED-coefficient scoring of the transform path —
    * the oracle-checkable twin of [[score]]: the same one-hot
    * indicators and numeric features, combined by a CONSTANT
    * coefficient vector into a decimal-exact linear score and a
    * thresholded prediction. Training stays rows-only (LBFGS isn't
    * engine-portable); everything downstream of the fitted
    * coefficients — the part `model.transform` actually executes —
    * is replayed bit-identically by the DuckDB oracle.
    */
  def scoreFixed(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.Column
    def ind(c: Column, coef: String): Column =
      when(c, lit(coef).cast("decimal(2,1)"))
        .otherwise(lit(0).cast("decimal(2,1)"))
    val score = round(
      ind(col("o_orderpriority") === "1-URGENT", "0.8") +
        ind(col("o_orderpriority") === "2-HIGH", "0.5") +
        ind(col("c_mktsegment") === "BUILDING", "0.3") +
        dec(col("o_totalprice")) * lit("0.000002").cast("decimal(7,6)") +
        dec(col("c_acctbal")) * lit("0.00005").cast("decimal(7,6)") +
        col("n_lines").cast("decimal(10,1)") * lit("0.01").cast("decimal(3,2)") +
        col("sum_qty").cast("decimal(14,4)") * lit("0.001").cast("decimal(4,3)"),
      6).cast("double")
    featureFrame(spark, sfDir).filter(col("issue_year") > 1997)
      .select(col("o_orderkey"), col("bad_flag").cast("int").as("bad_flag"),
        score.as("score"))
      .withColumn("prediction", (col("score") > 1.0).cast("int"))
  }

  /** AUC of the scored validation set (03-Fraud-ML.py:197-213),
    * evaluated on the model's probability (`prob_bad` from [[score]]),
    * not the hard 0/1 prediction.
    */
  def auc(scored: DataFrame): Double =
    new BinaryClassificationEvaluator().setLabelCol("bad_flag")
      .setRawPredictionCol("prob_bad").evaluate(scored)

  /** The max-F1 THRESHOLD SELECTION as pure relational arithmetic —
    * the oracle-checkable twin of [[bestF1Threshold]] over
    * [[scoreFixed]]'s decimal-exact scores (what
    * `fMeasureByThreshold` computes downstream of the fitted model:
    * every distinct score is a candidate threshold, positive =
    * score ≥ threshold, argmax F1. TIE-BREAK: ties go to the
    * SMALLEST threshold — a deliberate choice this operator and its
    * oracle share, NOT the upstream summary's: Spark's
    * `fMeasureByThreshold` enumerates thresholds in descending-score
    * order, so a max-by over it would surface the LARGEST tied
    * threshold; tied thresholds have identical F1 by definition, and
    * the smaller one admits more positives at the same measure — but
    * a caller reproducing 03-Fraud-ML.py:172-179 exactly should
    * max-tie-break upward). Scale shape: the
    * corpus reduces through ONE hash aggregate to the distinct-score
    * pane first; the cumulative sweep's window runs over THAT pane
    * (bounded by the score formula's value domain, never corpus
    * rows — a production sweep over unbounded raw scores would bin
    * first, the BinaryClassificationMetrics numBins trade). Exact
    * integer counts; one double division at the end, bit-replayable.
    */
  def thresholdFixed(spark: SparkSession, sfDir: String): DataFrame = {
    val scored = scoreFixed(spark, sfDir)
      .select(col("score"), col("bad_flag"))
    val perScore = scored.groupBy(col("score"))
      .agg(count(lit(1)).as("n"),
        sum(col("bad_flag").cast("long")).as("n_pos"))
    // ONE pane: the positives total rides an unbounded frame over the
    // same sorted distinct-score pane as the cumulative sweep — a
    // separate scalar aggregate would re-evaluate the whole feature
    // frame a second time
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc)
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wAll = org.apache.spark.sql.expressions.Window
      .orderBy(col("score").desc)
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    perScore
      .withColumn("__pos_total", sum(col("n_pos")).over(wAll))
      .withColumn("tp", sum(col("n_pos")).over(w))
      .withColumn("pp", sum(col("n")).over(w))
      .withColumn("fp", col("pp") - col("tp"))
      .withColumn("fn", col("__pos_total") - col("tp"))
      .withColumn("f1", (lit(2L) * col("tp")).cast("double") /
        (lit(2L) * col("tp") + col("fp") + col("fn")).cast("double"))
      .orderBy(col("f1").desc, col("score"))
      .limit(1)
      .select(col("score").as("threshold"), col("f1"), col("tp"),
        col("fp"), col("fn"))
  }

  /** Max-F1 threshold selection (03-Fraud-ML.py:172-179): sweep the
    * training summary's fMeasureByThreshold, return the argmax
    * threshold — applied to the fitted LR before scoring.
    */
  def bestF1Threshold(spark: SparkSession, sfDir: String): Double = {
    val data = featureFrame(spark, sfDir)
    val train = data.filter(col("issue_year") <= 1997)
    val model = pipeline().fit(train)
    val lrModel = model.stages.last
      .asInstanceOf[org.apache.spark.ml.classification.LogisticRegressionModel]
    val f = lrModel.binarySummary.fMeasureByThreshold
    val best = f.orderBy(col("F-Measure").desc, col("threshold")).head()
    best.getDouble(f.columns.indexOf("threshold"))
  }

  /** GBTClassifier alternative (03-Fraud-ML.py:109 references the
    * gradient-boosted-trees member of the same pipeline family).
    */
  def gbtScore(spark: SparkSession, sfDir: String): DataFrame = {
    val data = featureFrame(spark, sfDir).cache()
    val train = data.filter(col("issue_year") <= 1997)
    val valid = data.filter(col("issue_year") > 1997)
    val stages = pipeline().getStages
    val gbt = new org.apache.spark.ml.classification.GBTClassifier()
      .setMaxIter(5).setMaxDepth(3).setFeaturesCol("scaledFeatures")
      .setLabelCol("bad_flag").setSeed(42L)
    val pipe = new Pipeline().setStages(stages.dropRight(1) :+ gbt)
    val model = pipe.fit(train)
    data.unpersist()
    model.transform(valid)
      .select(col("o_orderkey"), col("bad_flag"), col("prediction"))
  }

  /** Translate a TRAINED decision tree into a Catalyst Column: the
    * transform path of a tree model IS a nested CASE expression, so
    * scoring needs no model object at all — it inlines into any
    * DataFrame plan (whole-stage codegen'd) and replays relationally.
    * `featureOf` maps the model's vector slot back to its source
    * column (identity for a plain numeric VectorAssembler).
    */
  def treeColumn(node: org.apache.spark.ml.tree.Node,
      featureOf: Int => org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = node match {
    case l: org.apache.spark.ml.tree.LeafNode => lit(l.prediction)
    case n: org.apache.spark.ml.tree.InternalNode =>
      val goLeft = n.split match {
        case c: org.apache.spark.ml.tree.ContinuousSplit =>
          featureOf(c.featureIndex) <= lit(c.threshold)
        case c: org.apache.spark.ml.tree.CategoricalSplit =>
          featureOf(c.featureIndex)
            .isin(c.leftCategories.map(x => x: Any).toIndexedSeq: _*)
        case other => throw new IllegalArgumentException(
          s"unsupported split type ${other.getClass.getName}")
      }
      when(goLeft, treeColumn(n.leftChild, featureOf))
        .otherwise(treeColumn(n.rightChild, featureOf))
  }

  /** A trained GBT ensemble's MARGIN as one Column: Σ weightᵢ ·
    * treeᵢ(x), term order = tree order (the same dot-product order
    * the model's own transform uses). Prediction = margin > 0 for
    * the logistic-loss classifier.
    */
  def ensembleMarginColumn(
      model: org.apache.spark.ml.classification.GBTClassificationModel,
      featureOf: Int => org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    model.trees.zip(model.treeWeights).map { case (t, w) =>
      treeColumn(t.rootNode, featureOf) * lit(w)
    }.reduce(_ + _)

  /** Deterministic FIXED-TREE GBT scoring — the [[scoreFixed]]
    * treatment for the tree-ensemble family: a pinned 3-tree ensemble
    * (weights pre-multiplied into decimal leaf values) over the same
    * feature frame, margin = Σ leaves (decimal-exact), prediction =
    * margin > 0. Training stays rows-only ([[gbtScore]]); everything
    * `GBTClassificationModel.transform` actually executes — nested
    * threshold CASEs and the weighted sum — replays bit-identically
    * in the DuckDB oracle. MlSpec pins the translation machinery
    * ([[treeColumn]]/[[ensembleMarginColumn]]) equal to a REAL
    * trained model's transform.
    */
  def gbtScoreFixed(spark: SparkSession, sfDir: String): DataFrame = {
    def leaf(s: String) = lit(s).cast("decimal(3,2)")
    val t1 = when(col("o_totalprice") <= 150000.0,
        when(col("n_lines") <= 3.0, leaf("-0.40")).otherwise(leaf("0.10")))
      .otherwise(when(col("c_acctbal") <= 0.0, leaf("0.60"))
        .otherwise(leaf("0.30")))
    val t2 = when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"),
        leaf("0.20"))
      .otherwise(when(col("sum_qty") <= 50.0, leaf("-0.10"))
        .otherwise(leaf("0.05")))
    val t3 = when(col("c_mktsegment") === "BUILDING", leaf("0.05"))
      .otherwise(leaf("-0.03"))
    val margin = round(t1 + t2 + t3, 6).cast("double")
    featureFrame(spark, sfDir).filter(col("issue_year") > 1997)
      .select(col("o_orderkey"), col("bad_flag").cast("int").as("bad_flag"),
        margin.as("margin"))
      .withColumn("prediction", (col("margin") > 0.0).cast("int"))
  }

  /** CrossValidator + ParamGridBuilder tuning (03-Fraud-ML.py:149-161). */
  def tuned(spark: SparkSession, sfDir: String): Double = {
    val data = featureFrame(spark, sfDir)
    val pipe = pipeline()
    val lr = pipe.getStages.last.asInstanceOf[LogisticRegression]
    val grid = new ParamGridBuilder()
      .addGrid(lr.regParam, Array(0.1, 0.01)).build()
    val cv = new CrossValidator().setEstimator(pipe)
      .setEstimatorParamMaps(grid)
      .setEvaluator(new BinaryClassificationEvaluator().setLabelCol("bad_flag"))
      .setNumFolds(3)
    val model = cv.fit(data.filter(col("issue_year") <= 1997))
    model.avgMetrics.max
  }

  /** Business-value confusion matrix (03-Fraud-ML.py:230-231):
    * groupBy(label, prediction).agg(sum(net)) — with a DETERMINISTIC
    * rule-based scorer standing in for the fitted model so the
    * DuckDB oracle can replicate it exactly.
    */
  def confusionValue(spark: SparkSession, sfDir: String): DataFrame =
    featureFrame(spark, sfDir)
      .withColumn("prediction",
        (col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
          col("o_totalprice") > 150000).cast("int"))
      .groupBy(col("bad_flag").cast("int").as("label"), col("prediction"))
      .agg(asDouble(sum(dec(col("net")))).as("sum_net"))

  /** Feature-store projections (03-Fraud-ML.py:247-302): keyed
    * feature tables.
    */
  def customerFeatures(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
        col("c_acctbal"), col("c_mktsegment"))

  def orderFeatures(spark: SparkSession, sfDir: String): DataFrame =
    Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"), col("o_orderpriority"))
      .withColumn("bad_flag", (col("o_orderstatus") =!= "F").cast("string"))
      .withColumn("price_band",
        (floor(col("o_totalprice") / 50000).cast("long") * 50000))

  // ---- run ledger (experiment-tracking analog) --------------------------

  /** EXPERIMENT-TRACKING run ledger — the persistence analog of the
    * reference's MLflow logging (03-Fraud-ML.py:186-213 logs params,
    * metrics and the model per run; the repo computed every metric
    * but persisted none): one row per training run in a GraftTable at
    * `ledgerPath` — (run_id, params JSON, metrics JSON, model_path,
    * logged_at millis). The append rides the transactional
    * exactly-once path (txn appId = the run id), so a RETRIED job
    * logs its run ONCE however many times it replays — the same
    * idempotence contract as the streaming sink. The ledger is an
    * ordinary graft table: time travel, history and SQL all work on
    * it (audit = `spark.sql("SELECT ... FROM runs VERSION AS OF n")`).
    */
  def logRun(spark: SparkSession, ledgerPath: String, runId: String,
      params: Map[String, String], metrics: Map[String, Double],
      modelPath: String = ""): Unit = {
    import spark.implicits._
    // minimal JSON string escaping: params/metrics values routinely
    // carry quotes (nested grid specs) — unescaped interpolation
    // would store malformed JSON in the ledger
    def esc(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    def js[A](m: Map[String, A]): String =
      m.toSeq.sortBy(_._1)
        .map { case (k, v) => s""""${esc(k)}":"${esc(v.toString)}"""" }
        .mkString("{", ",", "}")
    val row = Seq((runId, js(params), js(metrics), modelPath,
      System.currentTimeMillis()))
      .toDF("run_id", "params", "metrics", "model_path", "logged_at")
    // race-safe create-or-load: two concurrent FIRST runs logging to
    // a fresh ledger both pass a bare exists() check and one create
    // loses its row — createIfAbsent resolves the race (the loser
    // loads what the winner created)
    GraftTable.createIfAbsent(spark, ledgerPath, row.limit(0))
      .appendIfNew(row, 0L, appId = s"mlrun:$runId")
  }

  // ---- model registry (ledger-driven) -----------------------------------

  /** The run ledger with its registry columns materialized: estimator
    * name out of the params JSON, `metric`'s value out of the metrics
    * JSON (null when the run didn't log it). The base frame both
    * registry views window over.
    */
  private def ledgerRuns(spark: SparkSession, ledgerPath: String,
      metric: String): DataFrame =
    GraftTable.load(spark, ledgerPath).snapshot()
      .withColumn("estimator",
        get_json_object(col("params"), "$.estimator"))
      .withColumn("metric_value",
        get_json_object(col("metrics"), s"$$.$metric").cast("double"))

  /** MODEL REGISTRY, latest view — the newest run per estimator
    * (03-Fraud-ML.py:22-24 serves "the registered model"; the ledger
    * is the source of truth, the registry is a WINDOWED READ over it,
    * so it needs no second store and can never drift from the runs).
    * Ordering is (logged_at, run_id) — the run_id tiebreak keeps the
    * view deterministic when two runs land in the same millisecond.
    * O(runs) with one partial-aggregated window; the ledger is run-
    * count-sized, never data-sized, so this holds at any corpus
    * scale.
    */
  def latestRuns(spark: SparkSession, ledgerPath: String,
      metric: String = "auc"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("estimator"))
      .orderBy(col("logged_at").desc, col("run_id").desc)
    ledgerRuns(spark, ledgerPath, metric)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
      .select(col("estimator"), col("run_id"), col("metric_value"),
        col("model_path"), col("logged_at"))
  }

  /** MODEL REGISTRY, best view — the highest-`metric` run per
    * estimator (ties to the newest, then run_id — deterministic).
    * Runs that never logged the metric sort last and can only win
    * when no run logged it.
    */
  def bestRuns(spark: SparkSession, ledgerPath: String,
      metric: String = "auc"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("estimator"))
      .orderBy(col("metric_value").desc_nulls_last,
        col("logged_at").desc, col("run_id").desc)
    ledgerRuns(spark, ledgerPath, metric)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
      .select(col("estimator"), col("run_id"), col("metric_value"),
        col("model_path"), col("logged_at"))
  }

  /** [[tuned]] with its run persisted: CV params + the best metric
    * land in the ledger exactly once under `runId`.
    */
  def tunedLogged(spark: SparkSession, sfDir: String,
      ledgerPath: String, runId: String): Double = {
    val best = tuned(spark, sfDir)
    logRun(spark, ledgerPath, runId,
      Map("estimator" -> "LogisticRegression", "numFolds" -> "3",
        "grid.regParam" -> "0.1,0.01"),
      Map("bestAvgAUC" -> best))
    best
  }

  /** [[score]] + AUC with the run persisted (the 03-Fraud-ML.py
    * train→score→log flow end-to-end).
    */
  def scoreLogged(spark: SparkSession, sfDir: String,
      ledgerPath: String, runId: String,
      modelPath: String = ""): DataFrame = {
    val scored = score(spark, sfDir)
    logRun(spark, ledgerPath, runId,
      Map("estimator" -> "LogisticRegression", "maxIter" -> "10",
        "elasticNetParam" -> "0.5", "split" -> "issue_year<=1997"),
      Map("auc" -> auc(scored)), modelPath)
    scored
  }
}
