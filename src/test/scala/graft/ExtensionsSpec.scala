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

  test("ShingleRewriteRule fuses the HOF shingle spelling into WordShingles") {
    import org.apache.spark.sql.functions._
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.plans.ShingleRewriteRule
    try {
      val hofExpr = "case when size(w) >= 3 then transform(sequence(0, size(w) - 3), " +
        "i -> concat_ws(' ', slice(w, i + 1, 3))) else array() end"
      val docs = Tables.load(spark, sf, "documents").limit(100)
        .select(col("doc_id"),
          regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0)).as("w"))
      val df = docs.select(col("doc_id"), expr(hofExpr).as("sh"))
      // the optimized plan carries the fused native kernel...
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(optimized.toLowerCase.contains("wordshingles"), optimized.take(500))
      // ...and produces exactly the unrewritten results
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == graft.plans.ShingleRewriteRule)
      val unfused = docs.select(col("doc_id"), expr(hofExpr).as("sh"))
      assert(df.exceptAll(unfused).count() === 0)
      assert(unfused.exceptAll(df).count() === 0)
    } finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == graft.plans.ShingleRewriteRule)
  }

  test("ShingleRewriteRule preserves empty-array-on-NULL for nullable inputs") {
    import org.apache.spark.sql.functions._
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ graft.plans.ShingleRewriteRule
    try {
      val hofExpr = "case when size(w) >= 3 then transform(sequence(0, size(w) - 3), " +
        "i -> concat_ws(' ', slice(w, i + 1, 3))) else array() end"
      // a nullable array column: NULL rows must surface size(sh) = 0,
      // not NULL/-1 (WordShingles alone is null-intolerant)
      val df = spark.range(4)
        .selectExpr("id",
          "case when id = 2 then cast(null as array<string>) " +
            "else array('a','b','c','d') end as w")
        .selectExpr("id", s"size($hofExpr) as n")
      val opt = df.queryExecution.optimizedPlan.toString.toLowerCase
      assert(opt.contains("wordshingles"), opt.take(500))
      val byId = df.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(byId(2L) === 0, "NULL input must yield an empty shingle array")
      assert(byId(0L) === 2)
    } finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == graft.plans.ShingleRewriteRule)
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

  test("injected parser: plain spark.sql speaks the graft-table surface") {
    import org.apache.spark.sql.SparkSession
    // a sibling session (same context) built WITH the extensions
    val prev = spark // keep the shared session alive
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = Sessions.tune(SparkSession.builder().master("local[4]")
      .withExtensions(new GraftExtensions), 4).getOrCreate()
    try {
      import org.apache.spark.sql.functions._
      val dir = java.nio.file.Files.createTempDirectory("graft_parser_")
        .resolve("t").toString
      graft.tables.GraftTable.create(s2, dir,
        Tables.load(s2, sf, "orders").repartition(4))
      s2.sql("DROP TABLE IF EXISTS gp_orders")
      s2.sql(s"CREATE TABLE gp_orders USING `graft-table` OPTIONS (path '$dir')")
      val before = s2.table("gp_orders").count()
      // DML straight through spark.sql — no GraftSql wrapper
      s2.sql("DELETE FROM gp_orders WHERE o_orderstatus = 'P'")
      val after = s2.table("gp_orders").count()
      assert(after < before)
      // DESCRIBE HISTORY returns typed rows
      val hist = s2.sql("DESCRIBE HISTORY gp_orders")
      assert(hist.select("operation").collect().map(_.getString(0)).toSeq ===
        Seq("DELETE", "CREATE")) // newest first, limited or not
      // the LIMIT spelling returns rows through the injected path too
      // (resultSchema must cover it, or the rows are silently dropped)
      assert(s2.sql("DESCRIBE HISTORY gp_orders LIMIT 1")
        .select("operation").collect().map(_.getString(0)).toSeq ===
        Seq("DELETE"))
      assert(s2.sql("VACUUM gp_orders RETAIN 99 VERSIONS DRY RUN")
        .columns.toSeq === Seq("path", "size_bytes"))
      // time travel inside an ordinary SELECT
      assert(s2.sql("SELECT count(*) FROM gp_orders VERSION AS OF 0")
        .head.getLong(0) === before)
      // plain INSERT INTO ... VALUES — the reference's literal write
      // surface (01-Fraud-Delta.py:188-189) — lands transactionally
      s2.sql("INSERT INTO gp_orders VALUES " +
        "(91000001, 3, 'O', 11.5, '1996-01-01 00:00:00', '1-URGENT')")
      assert(s2.table("gp_orders")
        .where(col("o_orderkey") === 91000001L).count() === 1)
      // COPY INTO routes through the injected parser (Spark's own
      // grammar has no COPY INTO — an unclaimed statement would
      // ParseException instead of reaching GraftSql)
      val ingest = java.nio.file.Files
        .createTempDirectory("graft_parser_copy_").toString
      Tables.load(s2, sf, "orders")
        .where(col("o_orderkey") % 1000 === 7).limit(5)
        .withColumn("o_orderkey", col("o_orderkey") + 95000000L)
        .write.mode("overwrite").parquet(ingest)
      val preCopy = s2.table("gp_orders").count()
      s2.sql(s"COPY INTO gp_orders FROM '$ingest'")
      assert(s2.table("gp_orders").count() > preCopy,
        "COPY INTO through spark.sql must land the staged files")
      // the wall-clock VACUUM forms route too — the DRY RUN returns
      // typed rows (resultSchema must cover it or they'd be dropped)
      assert(s2.sql("VACUUM gp_orders RETAIN 99 HOURS DRY RUN")
        .columns.toSeq === Seq("path", "size_bytes"))
      s2.sql("VACUUM gp_orders RETAIN 99 HOURS")
      // MAINTAIN INDEX routes through the injected parser too (the
      // target is a PATH, so the claim is shape-based, not catalog)
      val ivf = java.nio.file.Files.createTempDirectory("graft_pivf_")
        .resolve("ivf").toString
      graft.operators.Similarity.ivfIndexBuild(s2, ivf,
        s2.range(0, 8).selectExpr("id AS vec_id", "'x' AS label",
          "CAST(array(CAST(id % 4 AS FLOAT), 1.0F, 0.0F, 0.0F) " +
            "AS ARRAY<FLOAT>) AS embedding"),
        nCentroids = 2)
      s2.sql(s"MAINTAIN ANN INDEX '$ivf'")
      // the pipeline-exit statements claim by quoted-path shape too:
      // PACK SEQUENCES returns span rows, EXPORT SHARDS MIXTURE
      // returns the per-copy manifest — both through plain spark.sql
      val docsDir = java.nio.file.Files
        .createTempDirectory("graft_pseq_").resolve("docs").toString
      Tables.load(s2, sf, "documents")
        .where(col("doc_id") < 50).write.parquet(docsDir)
      assert(s2.sql(s"PACK SEQUENCES FROM '$docsDir' LENGTH 64")
        .count() === 50)
      val mexp = java.nio.file.Files
        .createTempDirectory("graft_pmix_").resolve("exp").toString
      assert(s2.sql(s"EXPORT SHARDS TO '$mexp' FROM '$docsDir' " +
        "MIXTURE ('en' 2.0)").columns.toSeq ===
        Seq("shard_id", "n_copies", "shard_tokens", "first_doc",
          "last_doc"))
      // non-graft SQL is untouched
      assert(s2.sql("SELECT 1 + 1").head.getInt(0) === 2)
      // DML on a non-graft target falls through to Spark's own
      // behavior (analyzer rejection), not a graft error
      val err = intercept[Exception] {
        s2.sql(s"DELETE FROM parquet.`$sf/orders.parquet` WHERE 1 = 1")
      }
      assert(!err.getMessage.contains("graft"), err.getMessage)
      // and a non-graft DESCRIBE HISTORY is not claimed either
      intercept[Exception] { s2.sql("DESCRIBE HISTORY not_a_graft_table") }
      s2.sql("DROP TABLE IF EXISTS gp_orders")
    } finally {
      SparkSession.setActiveSession(prev)
      SparkSession.setDefaultSession(prev)
    }
  }

  test("table_changes() TVF reads the CDF inside ordinary queries") {
    import org.apache.spark.sql.SparkSession
    val prev = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = Sessions.tune(SparkSession.builder().master("local[4]")
      .withExtensions(new GraftExtensions), 4).getOrCreate()
    try {
      import org.apache.spark.sql.functions._
      val dir = java.nio.file.Files.createTempDirectory("graft_tvf_")
        .resolve("t").toString
      val t = graft.tables.GraftTable.create(s2, dir,
        Tables.load(s2, sf, "orders").repartition(2))
      Thread.sleep(30)
      t.delete(col("o_orderstatus") === "P")               // v1
      Thread.sleep(30)
      val betweenMs = System.currentTimeMillis()
      Thread.sleep(30)
      t.update(col("o_orderpriority") === "1-URGENT",
        Map("o_totalprice" -> (col("o_totalprice") + 1.0))) // v2
      s2.sql("DROP TABLE IF EXISTS gp_cdc")
      s2.sql(s"CREATE TABLE gp_cdc USING `graft-table` OPTIONS (path '$dir')")
      def counts(q: String): Map[String, Long] =
        s2.sql(q).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // version args: the full window since v1
      val all = counts("SELECT _change_type, count(*) " +
        "FROM table_changes('gp_cdc', 1) GROUP BY 1")
      assert(all.keySet ===
        Set("delete", "update_preimage", "update_postimage"))
      // bounded: (1, 1) is the delete commit alone
      val v1 = counts("SELECT _change_type, count(*) " +
        "FROM table_changes('gp_cdc', 1, 1) GROUP BY 1")
      assert(v1.keySet === Set("delete"))
      // timestamp string args resolve like the reader options
      val between = new java.sql.Timestamp(betweenMs).toString
      val sinceTs = counts("SELECT _change_type, count(*) " +
        s"FROM table_changes('gp_cdc', '$between') GROUP BY 1")
      assert(sinceTs.keySet === Set("update_preimage", "update_postimage"))
      // and the TVF composes: join the change feed against the table
      val joined = s2.sql(
        """SELECT count(*) FROM table_changes('gp_cdc', 1, 1) c
          |JOIN gp_cdc t ON c.o_orderkey = t.o_orderkey""".stripMargin)
      assert(joined.head.getLong(0) === 0L) // deleted keys are gone
      s2.sql("DROP TABLE IF EXISTS gp_cdc")
    } finally {
      SparkSession.setActiveSession(prev)
      SparkSession.setDefaultSession(prev)
    }
  }

  test("SQL index lifecycle: CREATE -> INGEST -> MAINTAIN -> " +
      "ann_search(), pure SQL, TVF composing in a join") {
    import org.apache.spark.sql.SparkSession
    val prev = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = Sessions.tune(SparkSession.builder().master("local[4]")
      .withExtensions(new GraftExtensions), 4).getOrCreate()
    try {
      // seed corpus: 24 labeled vectors along axes 0..3
      val dir = java.nio.file.Files.createTempDirectory("graft_sqlidx_")
        .resolve("emb").toString
      graft.tables.GraftTable.create(s2, dir,
        s2.range(0, 24).selectExpr("id AS vec_id",
          "concat('r', id % 4) AS label",
          "CAST(array(CAST(id % 4 AS FLOAT), 1.0F, 0.5F, 0.0F) " +
            "AS ARRAY<FLOAT>) AS embedding"))
      s2.sql("DROP TABLE IF EXISTS gp_emb")
      s2.sql(s"CREATE TABLE gp_emb USING `graft-table` OPTIONS (path '$dir')")
      val ivf = java.nio.file.Files.createTempDirectory("graft_sqlidx_")
        .resolve("ivf").toString
      // CREATE from the registered table (bare-identifier source)
      s2.sql(s"CREATE ANN INDEX '$ivf' ON gp_emb")
      // INGEST from a quoted plain-parquet path — and the arrivals
      // carry NO label column (conform-to-index null fill)
      val arrivals = java.nio.file.Files
        .createTempDirectory("graft_sqlidx_").resolve("new").toString
      s2.range(100, 108).selectExpr("id AS vec_id",
        "CAST(array(0.0F, 0.0F, 0.0F, " +
          "CAST(10.0 + (id - 100) * 0.01 AS FLOAT)) " +
          "AS ARRAY<FLOAT>) AS embedding")
        .write.parquet(arrivals)
      s2.sql(s"INGEST INTO ANN INDEX '$ivf' FROM '$arrivals'")
      s2.sql(s"MAINTAIN ANN INDEX '$ivf'")
      // the OPTION-carrying form routes through the injected parser
      // too and surfaces the cycle's metrics row (a silent arity
      // mismatch between the statement regex and the parser's claim
      // list would fall through to Spark's parser and throw)
      val mrow = s2.sql(s"MAINTAIN ANN INDEX '$ivf' REBALANCE THRESHOLD 0")
        .head()
      assert(!mrow.getBoolean(0) && mrow.getDouble(1) > 0.0 &&
        mrow.isNullAt(2),
        "metrics row must carry (rebalanced=false, skew, null recall)")
      // ann_search composes inside an ordinary join; the ingested
      // vectors (nearest the query by cosine) must surface
      val got = s2.sql(
        s"""SELECT s.vec_id, s.cos_sim, t.label
           |FROM ann_search('$ivf', array(0.0, 0.0, 0.0, 10.0), 5) s
           |LEFT JOIN gp_emb t ON s.vec_id = t.vec_id""".stripMargin)
        .collect()
      assert(got.length === 5)
      assert(got.map(_.getLong(0)).forall(id => id >= 100L && id < 108L),
        s"expected the ingested near-axis-3 vectors on top, got " +
          got.map(_.getLong(0)).mkString(","))
      // TVF result ≡ the API query (same path, same parameters)
      val api = graft.operators.Similarity.ivfIndexQuery(s2, ivf,
        Seq(0f, 0f, 0f, 10f), k = 5)
        .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
      val tvf = s2.sql(
        s"SELECT * FROM ann_search('$ivf', array(0.0, 0.0, 0.0, 10.0), 5)")
        .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
      assert(tvf === api, "ann_search diverged from the API query")
      // the BATCH TVF: a frame of query vectors against the same
      // index ≡ the batch API (vec_id-named id columns normalize)
      val qDir = java.nio.file.Files
        .createTempDirectory("graft_sqlidx_").resolve("q").toString
      s2.range(100, 102).selectExpr("id AS vec_id",
        "CAST(array(0.0F, 0.0F, 0.0F, 10.0F) AS ARRAY<FLOAT>) " +
          "AS embedding").write.parquet(qDir)
      val bt = s2.sql(
        s"SELECT * FROM ann_search_batch('$ivf', '$qDir', 5)")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSet
      val bapi = graft.operators.Similarity.indexQueryBatch(s2, ivf,
        s2.read.parquet(qDir).selectExpr("vec_id AS query_id",
          "embedding"), k = 5)
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSet
      assert(bt === bapi, "ann_search_batch diverged from the API batch")
      assert(bt.nonEmpty && !bt.exists(x => x._1 == x._2),
        "query-by-example ids must exclude themselves")
      // an OWN-id-space batch: exclude_self = false keeps the corpus
      // row whose vec_id collides with a query id (it is NOT the
      // query), and a SQL-built array<double> embedding normalizes
      val qDir2 = java.nio.file.Files
        .createTempDirectory("graft_sqlidx_").resolve("q2").toString
      s2.range(100, 101).selectExpr("id AS query_id",
        "array(0.0, 0.0, 0.0, 10.0) AS embedding") // double array
        .write.parquet(qDir2)
      val own = s2.sql("SELECT * FROM ann_search_batch(" +
        s"'$ivf', '$qDir2', 5, 16, 'vec_id >= 0', false)")
        .collect().map(_.getLong(1)).toSet
      assert(own.contains(100L),
        "exclude_self=false must keep the colliding corpus row")
      // a TEMP VIEW as the queries source: the catalog name resolves
      // (r18 sourceFrameAuto) — ≡ the path spelling of the same frame
      s2.read.parquet(qDir).createOrReplaceTempView("graft_batch_q_view")
      try {
        val viaView = s2.sql(
          "SELECT * FROM ann_search_batch(" +
            s"'$ivf', 'graft_batch_q_view', 5)")
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3))).toSet
        assert(viaView === bt,
          "a temp-view queries source diverged from the path spelling")
      } finally s2.catalog.dropTempView("graft_batch_q_view"): Unit
      // DEDUP leg of the lifecycle, same statements: the SQL-built
      // index probes identically to an API-built one
      val docsDir = java.nio.file.Files
        .createTempDirectory("graft_sqlidx_").resolve("docs").toString
      Tables.load(s2, sf, "documents")
        .where(org.apache.spark.sql.functions.col("doc_id") % 5 =!= 0)
        .write.parquet(docsDir)
      val dIdx = java.nio.file.Files
        .createTempDirectory("graft_sqlidx_").resolve("didx").toString
      s2.sql(s"CREATE DEDUP INDEX '$dIdx' ON '$docsDir'")
      s2.sql(s"MAINTAIN DEDUP INDEX '$dIdx'")
      val batch = Tables.load(s2, sf, "documents")
        .where(org.apache.spark.sql.functions.col("doc_id") % 5 === 0)
      val sqlPairs = graft.operators.Dedup
        .incrementalProbe(s2, dIdx, batch)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val apiIdx = java.nio.file.Files
        .createTempDirectory("graft_sqlidx_").resolve("aidx").toString
      graft.operators.Dedup.incrementalIndex(s2, apiIdx,
        Tables.load(s2, sf, "documents")
          .where(org.apache.spark.sql.functions.col("doc_id") % 5 =!= 0))
      val apiPairs = graft.operators.Dedup
        .incrementalProbe(s2, apiIdx, batch)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(sqlPairs === apiPairs,
        "SQL-created dedup index probes differently from the API build")
      // dedup_probe() — the lexical family's retrieval TVF: the same
      // read-only screen from pure SQL, composing in a join
      val batchDir = java.nio.file.Files
        .createTempDirectory("graft_sqlidx_").resolve("batch").toString
      batch.write.parquet(batchDir)
      val tvfPairs = s2.sql(
        s"SELECT doc_a, doc_b FROM dedup_probe('$dIdx', '$batchDir')")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(tvfPairs === apiPairs,
        "dedup_probe() diverged from the API probe")
      // the 3-arg form with a PLAIN fractional literal (parses as
      // DECIMAL — must cast, not ClassCastException)
      val tvfPairs3 = s2.sql(
        s"SELECT doc_a, doc_b FROM dedup_probe('$dIdx', '$batchDir', 0.6)")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(tvfPairs3 === apiPairs,
        "dedup_probe(.., 0.6) diverged from the default-threshold probe")
      // the batch source as a REGISTERED TABLE name (the non-path
      // resolution contract, same as CREATE/INGEST INDEX sources)
      val batchTblDir = java.nio.file.Files
        .createTempDirectory("graft_sqlidx_").resolve("btbl").toString
      graft.tables.GraftTable.create(s2, batchTblDir, batch)
      s2.sql("DROP TABLE IF EXISTS gp_batch")
      s2.sql(s"CREATE TABLE gp_batch USING `graft-table` " +
        s"OPTIONS (path '$batchTblDir')")
      val tvfPairsTbl = s2.sql(
        s"SELECT doc_a, doc_b FROM dedup_probe('$dIdx', 'gp_batch')")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(tvfPairsTbl === apiPairs,
        "dedup_probe over a registered table diverged from the path form")
      s2.sql("DROP TABLE IF EXISTS gp_batch")
      val joined = s2.sql(
        s"""SELECT count(*) FROM dedup_probe('$dIdx', '$batchDir') p
           |JOIN parquet.`$batchDir` d ON p.doc_b = d.doc_id""".stripMargin)
        .head().getLong(0)
      assert(joined >= 0L) // composes: analyzed, planned, executed
      s2.sql("DROP TABLE IF EXISTS gp_emb")
    } finally {
      SparkSession.setActiveSession(prev)
      SparkSession.setDefaultSession(prev)
    }
  }

  test("filtered ANN: predicate inside the cell scan, selectivity-" +
      "scaled probe expansion, TVF filter arg ≡ API ≡ ground truth") {
    import org.apache.spark.sql.SparkSession
    import org.apache.spark.sql.functions._
    import graft.operators.Similarity
    val prev = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = Sessions.tune(SparkSession.builder().master("local[4]")
      .withExtensions(new GraftExtensions), 4).getOrCreate()
    try {
      graft.functions.VectorExprs.register(s2)
      // 40 vectors in 4 natural clusters (axis c + small id jitter),
      // labels 0..9 by id — every (cell, label) stratum is populated
      val src = s2.range(0, 40).selectExpr("id AS vec_id",
        "CAST(id % 10 AS INT) AS label",
        "CAST(array(" +
          "CAST(CASE WHEN id % 4 = 0 THEN 10.0 + id * 0.001 ELSE 0.0 END AS FLOAT), " +
          "CAST(CASE WHEN id % 4 = 1 THEN 10.0 + id * 0.001 ELSE 0.0 END AS FLOAT), " +
          "CAST(CASE WHEN id % 4 = 2 THEN 10.0 + id * 0.001 ELSE 0.0 END AS FLOAT), " +
          "CAST(CASE WHEN id % 4 = 3 THEN 10.0 + id * 0.001 ELSE 1.0 END AS FLOAT)) " +
          "AS ARRAY<FLOAT>) AS embedding")
      val ivf = java.nio.file.Files.createTempDirectory("graft_fann_")
        .resolve("ivf").toString
      Similarity.ivfIndexBuild(s2, ivf, src, nCentroids = 4)
      val q = Seq(10f, 0f, 0f, 0f)
      def bruteFiltered(pred: org.apache.spark.sql.Column, k: Int) =
        src.where(pred)
          .select(col("vec_id"), col("label"),
            round(graft.functions.VectorExprs
              .vec_cosine(col("embedding"), typedLit(q))
              .cast("decimal(18,12)"), 6).cast("double").as("cos_sim"))
          .orderBy(col("cos_sim").desc, col("vec_id"))
          .limit(k).collect()
          .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq
      // (a) 10%-selective predicate, nprobe=1: expansion ceil(40/4)=10
      // saturates past the 4 cells — the filtered answer must be
      // EXACTLY k rows and ≡ filter-then-brute-force ground truth
      val api = Similarity.ivfIndexQuery(s2, ivf, q, k = 3, nprobe = 1,
        filter = Some(col("label") === 3)).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq
      assert(api.length === 3, "post-filter k must hold")
      assert(api === bruteFiltered(col("label") === 3, 3))
      val tvf = s2.sql(
        s"""SELECT * FROM ann_search('$ivf',
           |array(10.0, 0.0, 0.0, 0.0), 3, 1, 'label = 3')""".stripMargin)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq
      assert(tvf === api, "ann_search filter arg diverged from the API")
      // (b) un-saturated regime: 50%-selective predicate expands
      // nprobe 1 → ceil(40/20) = 2 of 4 cells — replay the expanded
      // probe window manually and demand exact agreement
      val cents = Similarity.loadCents(s2, ivf)
      val qQv = q.map(x => math.floor(x.toDouble * 1000000.0).toLong)
      val probe2 = cents.map { case (cid, c) =>
        (c.zip(qQv).map { case (a, b) => val d = a - b; d * d }.sum, cid)
      }.sorted.take(2).map(_._2)
      assert(probe2.length === 2 && cents.length === 4)
      val asg = s2.read.format("graft-table")
        .load(java.nio.file.Paths.get(ivf, "assignments").toString)
      val expected2 = asg
        .where(col("cent_id").isin(probe2.map(Integer.valueOf): _*) &&
          col("label") < 5)
        .select(col("vec_id"), col("label"),
          round(graft.functions.VectorExprs
            .vec_cosine(col("embedding"), typedLit(q))
            .cast("decimal(18,12)"), 6).cast("double").as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("vec_id"))
        .limit(5).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq
      val got2 = Similarity.ivfIndexQuery(s2, ivf, q, k = 5, nprobe = 1,
        filter = Some(col("label") < 5)).collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq
      assert(got2 === expected2,
        "un-saturated filtered probe diverged from the window replay")
      assert(got2.length === 5, "expanded window must still hold k")
      // (b2) the selectivity counting pass memoizes per (index
      // version, predicate): an identical re-query pays no counting
      // scan; an ingest bumps the version and re-counts
      val scans0 = Similarity.selectivityScans.get()
      Similarity.ivfIndexQuery(s2, ivf, q, k = 3, nprobe = 1,
        filter = Some(col("label") === 3)).collect()
      assert(Similarity.selectivityScans.get() === scans0,
        "identical filtered re-query must reuse the memoized counts")
      Similarity.ivfIndexIngest(s2, ivf, s2.range(900, 902).selectExpr(
        "id AS vec_id", "CAST(id % 10 AS INT) AS label",
        "CAST(array(1.0F, 2.0F, 3.0F, 4.0F) AS ARRAY<FLOAT>) AS embedding"))
      Similarity.ivfIndexQuery(s2, ivf, q, k = 3, nprobe = 1,
        filter = Some(col("label") === 3)).collect()
      assert(Similarity.selectivityScans.get() === scans0 + 1,
        "a version bump must invalidate the memoized selectivity")
      // (c) a filter matching NOTHING returns empty, not an error
      assert(Similarity.ivfIndexQuery(s2, ivf, q, k = 3,
        filter = Some(col("label") === 99)).count() === 0L)
      // (d) non-string filter literal refuses loudly
      val err = intercept[Exception] { s2.sql(
        s"SELECT * FROM ann_search('$ivf', array(1.0), 3, 1, 42)") }
      assert(err.getMessage.contains("filter"), err.getMessage)
      // (e) the filter arg dispatches through the IVF+PQ family too:
      // the ADC cascade ranks filtered candidates only, TVF ≡ API
      val pqSrc = s2.range(0, 32).selectExpr("id AS vec_id",
        "CAST(id % 10 AS INT) AS label",
        "CAST(array(CAST(id % 4 AS FLOAT), 1.0F, 0.5F, 0.0F, 0.0F, " +
          "0.0F, 0.0F, CAST(id AS FLOAT) * 0.01F) " +
          "AS ARRAY<FLOAT>) AS embedding")
      val pq = java.nio.file.Files.createTempDirectory("graft_fann_")
        .resolve("pq").toString
      Similarity.ivfPqIndexBuild(s2, pq, pqSrc, nCentroids = 4)
      val apiPq = Similarity.ivfPqIndexQuery(s2, pq,
        Seq(10f, 0f, 0f, 0f, 0f, 0f, 0f, 0f), k = 2, nprobe = 1,
        filter = Some(col("label") === 3)).collect()
        .map(r => (r.getLong(0), r.getDouble(2))).toSeq
      val tvfPq = s2.sql(
        s"""SELECT * FROM ann_search('$pq',
           |array(10.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0),
           |2, 1, 'label = 3')""".stripMargin)
        .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
      assert(tvfPq === apiPq,
        "filtered ann_search must dispatch identically on IVF+PQ")
      assert(tvfPq.length === 2, "post-filter k must hold on the " +
        "ADC cascade (labels 3/13/23 give 3 matches)")
    } finally {
      SparkSession.setActiveSession(prev)
      SparkSession.setDefaultSession(prev)
    }
  }

  test("latest_runs()/best_runs() TVFs serve the registry and compose") {
    import org.apache.spark.sql.SparkSession
    val prev = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = Sessions.tune(SparkSession.builder().master("local[4]")
      .withExtensions(new GraftExtensions), 4).getOrCreate()
    try {
      val ledger = java.nio.file.Files
        .createTempDirectory("graft_reg_tvf_").resolve("runs").toString
      import graft.ml.RiskPipeline.logRun
      // two estimators; LR's BEST run (r1, auc .9) is older than its
      // LATEST (r2, auc .7) — the two views must disagree on LR
      logRun(s2, ledger, "r1",
        Map("estimator" -> "LogisticRegression"), Map("auc" -> 0.9))
      Thread.sleep(5)
      logRun(s2, ledger, "r2",
        Map("estimator" -> "LogisticRegression"), Map("auc" -> 0.7))
      Thread.sleep(5)
      logRun(s2, ledger, "r3",
        Map("estimator" -> "GBT"), Map("auc" -> 0.8))
      def one(q: String): Map[String, String] =
        s2.sql(q).collect().map(r => r.getString(0) -> r.getString(1)).toMap
      val latest = one("SELECT estimator, run_id " +
        s"FROM latest_runs('$ledger')")
      assert(latest === Map("LogisticRegression" -> "r2", "GBT" -> "r3"))
      val best = one("SELECT estimator, run_id " +
        s"FROM best_runs('$ledger', 'auc')")
      assert(best === Map("LogisticRegression" -> "r1", "GBT" -> "r3"))
      // composes like any relation: which estimators are serving a
      // model that is NOT their best run?
      val stale = s2.sql(
        s"""SELECT l.estimator FROM latest_runs('$ledger') l
           |JOIN best_runs('$ledger') b ON l.estimator = b.estimator
           |WHERE l.run_id <> b.run_id""".stripMargin)
        .collect().map(_.getString(0)).toSeq
      assert(stale === Seq("LogisticRegression"))
      // a registered TABLE NAME resolves too
      val dir = graft.tables.GraftTable.load(s2, ledger).root.toString
      s2.sql("DROP TABLE IF EXISTS gp_runs")
      s2.sql(s"CREATE TABLE gp_runs USING `graft-table` OPTIONS (path '$dir')")
      assert(one("SELECT estimator, run_id FROM best_runs('gp_runs')")
        === best)
      s2.sql("DROP TABLE IF EXISTS gp_runs")
    } finally {
      SparkSession.setActiveSession(prev)
      SparkSession.setDefaultSession(prev)
    }
  }
}
