package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, ResolvedHint}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.functions._

/** Plan-regression gate for the TPC-H family: the plan shapes that
  * were hand-audited green (filters reaching the parquet scan, no
  * explicit broadcast hint over an sf-proportional side, no cartesian
  * products) are CI'd here so they cannot rot. At 100 TB the
  * difference between these plans and their degraded cousins is the
  * difference between reading a slice of the fact table and reading
  * all of it — or between a hash join and an executor-OOM broadcast.
  *
  * Plans are inspected with AQE off: the assertions target the
  * STATIC planner output (pushdown, hint placement, join shape),
  * which AQE would wrap in an adaptive root without changing any of
  * the audited properties.
  */
class ExplainAuditSpec extends SparkSpec {

  /** Tables whose size grows with the scale factor — an explicit
    * broadcast hint on any of these is a latent executor OOM at
    * 100×. nation (25 rows) and region (5) are scale-constant.
    */
  private val sfProportional =
    Set("customer", "orders", "lineitem", "supplier", "part", "events",
      "documents", "embeddings")

  /** Which table a relation subtree scans, by its parquet path. */
  private def tablesOf(files: Seq[String]): Set[String] =
    sfProportional.filter(t => files.exists(_.contains(s"/$t.parquet")))

  /** Explicit broadcast hints in the ANALYZED plan whose subtree
    * reads an sf-proportional table. Detection must be logical-level:
    * at tiny SFs the planner auto-broadcasts small sides by size
    * estimate (correct, self-adjusting at scale), so only the
    * user-pinned hint is a regression.
    */
  private def badBroadcastHints(df: DataFrame): Seq[String] =
    df.queryExecution.analyzed.collect {
      case h: ResolvedHint if h.hints.strategy.contains(BROADCAST) =>
        h.child.collect {
          case l: LogicalRelation =>
            tablesOf(l.relation match {
              case r: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
                r.location.inputFiles.toSeq
              case _ => Nil
            })
        }.flatten.toSet
    }.flatten.distinct

  private def scansByTable(df: DataFrame): Map[String, FileSourceScanExec] =
    df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec =>
        s.relation.location.inputFiles.headOption.flatMap(f =>
          (sfProportional ++ Set("nation", "region"))
            .find(t => f.contains(s"/$t.parquet"))).map(_ -> s)
    }.flatten.toMap

  private def withStaticPlans[A](body: => A): A = {
    val aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  /** query → (table → substring that must appear in PushedFilters).
    * These are the selective predicates the verdict audits by hand:
    * each one reaching the scan is what makes the query read a slice
    * of the fact table instead of all of it.
    */
  private val requiredPushdown: Map[String, Map[String, String]] = Map(
    "q1_pricing_summary" -> Map("lineitem" -> "l_shipdate"),
    "q3_shipping_priority" -> Map("lineitem" -> "l_shipdate",
      "orders" -> "o_orderdate", "customer" -> "c_mktsegment"),
    "q5_region_revenue" -> Map("orders" -> "o_orderdate"),
    "q6_forecast_revenue" -> Map("lineitem" -> "l_discount"),
    "q10_returned_revenue" -> Map("lineitem" -> "l_returnflag",
      "orders" -> "o_orderdate"),
    "q18_large_orders" -> Map("lineitem" -> "l_orderkey"),
    "q19_brand_revenue" -> Map("lineitem" -> "l_quantity",
      "part" -> "p_brand"),
    "q12_priority_shipping" -> Map("lineitem" -> "l_shipdate"),
    "q21_waiting_suppliers" -> Map("orders" -> "o_orderstatus"))

  test("TPC-H plans: pushdown reaches the scans, no pinned broadcast " +
      "of a scale-proportional side, no cartesian products") {
    withStaticPlans {
      requiredPushdown.foreach { case (name, wanted) =>
        val df = SparkEntry.queries(name)(spark, sf)

        val hinted = badBroadcastHints(df)
        assert(hinted.isEmpty,
          s"$name: explicit broadcast hint over sf-proportional " +
            s"side(s) ${hinted.mkString(",")}")

        val cartesian = df.queryExecution.executedPlan.collect {
          case c: CartesianProductExec => c
          case b: BroadcastNestedLoopJoinExec => b
        }
        assert(cartesian.isEmpty,
          s"$name: plan contains ${cartesian.map(_.nodeName).mkString(",")}")

        val scans = scansByTable(df)
        wanted.foreach { case (table, marker) =>
          val scan = scans.getOrElse(table,
            fail(s"$name: no parquet scan of $table found"))
          val pushed = scan.metadata.getOrElse("PushedFilters", "[]")
          assert(pushed != "[]" && pushed.contains(marker),
            s"$name: $table scan PushedFilters=$pushed lacks $marker — " +
              "the predicate no longer reaches the scan")
        }
      }
    }
  }

  test("semantic dedup plan: the pairwise stage joins on cent_id — " +
      "no cartesian product, no pinned sf-proportional broadcast") {
    withStaticPlans {
      val df = SparkEntry.queries("dedup_semantic")(spark, sf)
      assert(badBroadcastHints(df).isEmpty,
        "dedup_semantic pins a broadcast over an sf-proportional side")
      val cartesian = df.queryExecution.executedPlan.collect {
        case c: CartesianProductExec => c
        case b: BroadcastNestedLoopJoinExec => b
      }
      assert(cartesian.isEmpty,
        s"dedup_semantic plans ${cartesian.map(_.nodeName).mkString(",")}" +
          " — the within-cluster restriction must be an equi-join key")
    }
  }

  test("export/pack plans: every window is PARTITIONED — the one-task " +
      "global cumsum (the classic export bottleneck) can never rot " +
      "back in, and no stage plans a cartesian") {
    withStaticPlans {
      val docs = Tables.load(spark, sf, "documents")
      val ta = operators.TextAnalysis
      val grams = ta.inducedGrams(spark, sf)
      val frames = Map(
        "exportShards" -> ta.exportShards(docs),
        "exportShardsShuffled" -> ta.exportShardsShuffled(docs),
        "packSequences" -> ta.packSequences(docs),
        "seqManifest" -> ta.seqManifest(docs),
        "packBins" -> ta.packBins(spark, sf),
        "exportShardsMixture" ->
          ta.exportShardsMixture(docs, ta.scenarioMixture),
        "packSequencesVp" -> ta.packSequences(docs, seqLen = 128L,
          tokenizer = "vp", vpGrams = grams),
        "vocabSegments" -> ta.vocabSegments(docs, grams),
        // a vocab-table encode (the rank window inside gramVocab runs
        // over the already-cut 64-row pane and is audited separately;
        // here the vocab arrives as a literal table, the VOCAB FROM
        // shape)
        "vocabSegmentIds" -> ta.vocabSegmentIds(docs,
          spark.createDataFrame(grams.zipWithIndex
            .map { case (g, i) => (g, (i + 1).toLong) })
            .toDF("token", "id")),
        // the merge-order encode must keep the identical plan shape:
        // one 1-row broadcast map build side, map-side kernel
        // projection, zero extra shuffles
        "bpeSegmentIds" -> ta.bpeSegmentIds(docs,
          ta.fixedBpeVocab(spark)))
      // a nested-loop join is allowed ONLY when its broadcast side is
      // provably ONE row: the side's EFFECTIVE ROOT — stripped of
      // cardinality-preserving/reducing unary wrappers (projects,
      // filters, codegen plumbing, the exchange itself, reused
      // exchanges) — must BE a global aggregate with no grouping
      // keys. Merely CONTAINING a scalar aggregate somewhere below a
      // join would not bound the broadcast's row count.
      def scalarSide(
          p: org.apache.spark.sql.execution.SparkPlan): Boolean = {
        import org.apache.spark.sql.execution._
        def strip(q: SparkPlan): SparkPlan = q match {
          case w: WholeStageCodegenExec => strip(w.child)
          case i: InputAdapter => strip(i.child)
          case pr: ProjectExec => strip(pr.child)
          case f: FilterExec => strip(f.child)
          case c: ColumnarToRowExec => strip(c.child)
          case r: exchange.ReusedExchangeExec => strip(r.child)
          case e: exchange.BroadcastExchangeExec => strip(e.child)
          case other => other
        }
        strip(p) match {
          case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec
              if a.groupingExpressions.isEmpty => true
          case _ => false
        }
      }
      frames.foreach { case (name, df) =>
        val global = df.queryExecution.executedPlan.collect {
          case w: org.apache.spark.sql.execution.window.WindowExec
              if w.partitionSpec.isEmpty => w
        }
        assert(global.isEmpty,
          s"$name: UNPARTITIONED Window in the physical plan — this " +
            "serializes the whole corpus through one task")
        val cartesian = df.queryExecution.executedPlan.collect {
          // the scalar-aggregate allowance applies to the BUILD side
          // only: an unbounded streamed side against a 1-row
          // broadcast is a per-row probe, but a scalar STREAMED side
          // against an unbounded broadcast would replicate the whole
          // corpus to every task — buildSide picks the right child
          case b: BroadcastNestedLoopJoinExec
              if !scalarSide(b.buildSide match {
                case org.apache.spark.sql.catalyst.optimizer.BuildLeft =>
                  b.left
                case org.apache.spark.sql.catalyst.optimizer.BuildRight =>
                  b.right
              }) => b
          case c: CartesianProductExec => c
        }
        assert(cartesian.isEmpty,
          s"$name plans ${cartesian.map(_.nodeName).mkString(",")}")
        assert(badBroadcastHints(df).isEmpty,
          s"$name pins a broadcast over an sf-proportional side")
      }
    }
  }

  test("the broadcast-hint detector actually fires on broadcast(customer)") {
    withStaticPlans {
      val orders = Tables.load(spark, sf, "orders")
      val customer = Tables.load(spark, sf, "customer")
      val bad = orders.join(broadcast(customer),
        col("o_custkey") === col("c_custkey"))
      assert(badBroadcastHints(bad) === Seq("customer"))
      // and a scale-constant hint stays allowed
      val nation = Tables.load(spark, sf, "nation")
      val fine = customer.join(broadcast(nation),
        col("c_nationkey") === col("n_nationkey"))
      assert(badBroadcastHints(fine).isEmpty)
    }
  }
}
