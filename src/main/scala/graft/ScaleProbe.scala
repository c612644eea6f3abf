package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Asymmetric scale probes: hold the PER-REFRESH work fixed, grow the
  * stored CORPUS 10× — the regime that exposes any O(corpus) term
  * hiding in a steady-state cost (a symmetric 10× sample masks it,
  * because corpus and batch grow together).
  *
  * `SPARK_GRAFT_PROBE=dedup` (default): `dedup_incremental`'s fixed
  * batch against a 10× index. After r10's candidate-pruned
  * verification fetch the per-batch time should be ~flat in corpus
  * size.
  *
  * `SPARK_GRAFT_PROBE=mv`: a maintained MIN/MAX view over a
  * group-clustered fact table takes a fixed trickle (one append-only
  * refresh, then one single-group delete refresh). The fold refresh
  * never rescans; the delete refresh recomputes only the affected
  * group through the stats-pruned candidate fetch — both should be
  * ~flat in fact-table size (the deleted group itself grows with the
  * corpus, but stays thousands of rows).
  *
  * Env: SPARK_GRAFT_CORPUS_DIR (sf dir to index),
  * SPARK_GRAFT_BATCH_DIR (dedup only: sf dir the fixed batch slices
  * from), SPARK_GRAFT_CPUS. Prints one JSON line per run.
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val corpusDir = sys.env("SPARK_GRAFT_CORPUS_DIR")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Sessions.tune(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (sys.env.getOrElse("SPARK_GRAFT_PROBE", "dedup") == "mv") {
      mvProbe(spark, corpusDir)
      spark.stop(); return
    }
    if (sys.env.getOrElse("SPARK_GRAFT_PROBE", "dedup") == "admit") {
      admitProbe(spark, corpusDir,
        sys.env("SPARK_GRAFT_BATCH_DIR"))
      spark.stop(); return
    }
    if (sys.env.getOrElse("SPARK_GRAFT_PROBE", "dedup") == "curate") {
      curateProbe(spark, corpusDir,
        sys.env("SPARK_GRAFT_BATCH_DIR"))
      spark.stop(); return
    }
    if (sys.env.getOrElse("SPARK_GRAFT_PROBE", "dedup") == "ivfpq") {
      ivfPqProbe(spark, corpusDir)
      spark.stop(); return
    }
    if (sys.env.getOrElse("SPARK_GRAFT_PROBE", "dedup") == "annfilter") {
      annFilterProbe(spark, corpusDir)
      spark.stop(); return
    }
    if (sys.env.getOrElse("SPARK_GRAFT_PROBE", "dedup") == "semadmit") {
      semAdmitProbe(spark, corpusDir, sys.env("SPARK_GRAFT_BATCH_DIR"))
      spark.stop(); return
    }
    if (sys.env.getOrElse("SPARK_GRAFT_PROBE", "dedup") == "export") {
      exportProbe(spark, corpusDir, sys.env("SPARK_GRAFT_BATCH_DIR"))
      spark.stop(); return
    }
    if (sys.env.getOrElse("SPARK_GRAFT_PROBE", "dedup") == "seqpack") {
      seqPackProbe(spark, corpusDir)
      spark.stop(); return
    }
    if (sys.env.getOrElse("SPARK_GRAFT_PROBE", "dedup") == "annbatch") {
      annBatchProbe(spark, corpusDir)
      spark.stop(); return
    }
    if (sys.env.getOrElse("SPARK_GRAFT_PROBE", "dedup") == "shufexport") {
      shufExportProbe(spark, corpusDir)
      spark.stop(); return
    }
    if (sys.env.getOrElse("SPARK_GRAFT_PROBE", "dedup") == "vppack") {
      vpPackProbe(spark, corpusDir)
      spark.stop(); return
    }
    if (sys.env.getOrElse("SPARK_GRAFT_PROBE", "dedup") == "tokincr") {
      tokIncrProbe(spark, corpusDir, sys.env("SPARK_GRAFT_BATCH_DIR"))
      spark.stop(); return
    }
    if (sys.env.getOrElse("SPARK_GRAFT_PROBE", "dedup") == "tokpack") {
      tokPackProbe(spark, corpusDir)
      spark.stop(); return
    }
    if (sys.env.getOrElse("SPARK_GRAFT_PROBE", "dedup") == "bpe") {
      bpeProbe(spark, corpusDir)
      spark.stop(); return
    }
    val batchDir = sys.env("SPARK_GRAFT_BATCH_DIR")
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
    // index in 4 CONTIGUOUS doc_id ranges, not one shot: the sig
    // table is then forced multi-file (the regime where the bloom-
    // scoped fetch matters — a 1-file table cannot show pruning) and
    // the shingle files keep tight disjoint ranges, matching what a
    // real continuous pipeline's batches + maintainIndex leave behind
    val mm = corpus.agg(min(col("doc_id")), max(col("doc_id"))).head()
    val (lo, hi) = (mm.getAs[Number](0).longValue,
      mm.getAs[Number](1).longValue)
    val step = (hi - lo) / 4 + 1
    (0 until 4).foreach { i =>
      graft.operators.Dedup.incrementalIndex(spark, path,
        corpus.filter(col("doc_id") >= lo + i * step &&
          col("doc_id") < lo + (i + 1) * step), batchId = i.toLong)
    }
    val t1 = System.nanoTime()
    val (out, st) = graft.operators.Dedup.incrementalDedupWithStats(
      spark, path, batch, batchId = 4L)
    val n = out.count()
    val t2 = System.nanoTime()
    println(s"""{"metric":"scale_probe","corpus":"$corpusDir","batch":"$batchDir","index_sec":${(t1 - t0) / 1e9},"probe_sec":${(t2 - t1) / 1e9},"pairs":$n,"sh_files_total":${st.shingleFilesTotal},"sh_files_read":${st.shingleFilesRead},"sig_files_total":${st.sigFilesTotal},"sig_files_read":${st.sigFilesRead}}""")
    spark.stop()
  }

  /** INCREMENTAL SHARD EXPORT steady-state (SPARK_GRAFT_PROBE=
    * export): a FIXED batch ingests into an export whose LANDED
    * corpus grows 10× — the asymmetric regime that would expose any
    * O(landed) term in the per-batch cost (the offset/guard read is
    * an O(batches) state aggregate, the prefix sum is O(batch), and
    * the returned slice rides the stats-pruned candidate fetch that
    * reads only this batch's files). Per-batch time should be ~flat
    * in landed-corpus size.
    */
  private def exportProbe(spark: SparkSession, corpusDir: String,
      batchDir: String): Unit = {
    val corpus = Tables.load(spark, corpusDir, "documents")
    val batch = Tables.load(spark, batchDir, "documents")
      .filter(col("doc_id") % 5 === 0)
      .withColumn("doc_id", col("doc_id") + 2000000000L)
    val path = java.nio.file.Files
      .createTempDirectory("graft_exportprobe_").toString
    // land the corpus as 4 doc_id-monotone batches (the continuous
    // pipeline's steady-state debris: multi-file assignment/state
    // tables, 4 landed state rows)
    val mm = corpus.agg(min(col("doc_id")), max(col("doc_id"))).head()
    val (lo, hi) = (mm.getAs[Number](0).longValue,
      mm.getAs[Number](1).longValue)
    val step = (hi - lo) / 4 + 1
    val t0 = System.nanoTime()
    (0 until 4).foreach { i =>
      val slice = corpus.filter(col("doc_id") >= lo + i * step &&
        col("doc_id") < lo + (i + 1) * step)
      // equal-WIDTH id ranges can be empty on a skewed id
      // distribution; skip instead of tripping the empty-batch
      // refusal (increasing batch ids may legally skip values)
      if (slice.limit(1).count() > 0)
        graft.operators.TextAnalysis.exportShardsIngest(spark, path,
          slice, batchId = i.toLong).count(): Unit
    }
    val t1 = System.nanoTime()
    val n = graft.operators.TextAnalysis
      .exportShardsIngest(spark, path, batch, batchId = 4L).count()
    val t2 = System.nanoTime()
    println(s"""{"metric":"export_probe","corpus":"$corpusDir","batch":"$batchDir","stage_sec":${(t1 - t0) / 1e9},"batch_sec":${(t2 - t1) / 1e9},"batch_rows":$n}""")
  }

  /** SEQUENCE-PACK linearity (SPARK_GRAFT_PROBE=seqpack): the pack is
    * a one-shot corpus transform, so the scale claim is PER-ROW cost
    * flat across a 10× corpus — no superlinear term hiding in the
    * prefix sum, the fragment explosion, or the per-sequence
    * collect_list assembly (each group is bounded by the docs that
    * tile one seqLen window, never corpus-sized). Times the metadata
    * pass and the materialized pack separately.
    */
  private def seqPackProbe(spark: SparkSession, corpusDir: String): Unit = {
    val docs = Tables.load(spark, corpusDir, "documents")
    val rows = docs.count()
    val out = java.nio.file.Files
      .createTempDirectory("graft_seqpackprobe_").resolve("seqs").toString
    val t0 = System.nanoTime()
    val spans = graft.operators.TextAnalysis.packSequences(docs).count()
    val t1 = System.nanoTime()
    val nSeqs = graft.operators.TextAnalysis
      .packSequencesMaterialize(docs, out).count()
    val t2 = System.nanoTime()
    println(s"""{"metric":"seqpack_probe","corpus":"$corpusDir","docs":$rows,"spans":$spans,"sequences":$nSeqs,"metadata_sec":${(t1 - t0) / 1e9},"materialize_sec":${(t2 - t1) / 1e9}}""")
  }

  /** SHUFFLED/MIXTURE export fan-out (SPARK_GRAFT_PROBE=shufexport):
    * the hash-range bucket count now grows with the corpus (the r17
    * fixed div 2⁴⁸ pinned 4096 buckets forever — an in-bucket window
    * of n/4096 rows serialized per task at any n), so the scale claim
    * is PER-ROW cost ~flat across a 10× corpus: the auto-sized width
    * keeps every serial window ~4096 rows, the pane folds stay
    * O(√buckets), and only genuinely linear work (tokenize, shuffle)
    * grows. Times the shuffled one-shot and the mixture composition.
    */
  private def shufExportProbe(spark: SparkSession,
      corpusDir: String): Unit = {
    val docs = Tables.load(spark, corpusDir, "documents")
    val rows = docs.count()
    val t0 = System.nanoTime()
    val n = graft.operators.TextAnalysis.exportShardsShuffled(docs)
      .count()
    val t1 = System.nanoTime()
    val nMix = graft.operators.TextAnalysis.exportShardsMixture(docs,
      graft.operators.TextAnalysis.scenarioMixture).count()
    val t2 = System.nanoTime()
    println(s"""{"metric":"shufexport_probe","corpus":"$corpusDir","docs":$rows,"assigned":$n,"mix_copies":$nMix,"shuffled_sec":${(t1 - t0) / 1e9},"mixture_sec":${(t2 - t1) / 1e9}}""")
  }

  /** TOKEN-ID PACK linearity (SPARK_GRAFT_PROBE=tokpack): the
    * token-ID materializations are one-shot corpus transforms, so the
    * scale claim is PER-ROW cost ~flat across a 10× corpus — no
    * superlinear term in the vocabulary induction (corpus-token-domain
    * hash agg + vocab-sized rank), the broadcast map lookup, the
    * fragment explosion, or the per-sequence id assembly. Times the
    * plain token pack and the mixture composition separately.
    */
  private def tokPackProbe(spark: SparkSession,
      corpusDir: String): Unit = {
    val docs = Tables.load(spark, corpusDir, "documents")
    val rows = docs.count()
    val out1 = java.nio.file.Files
      .createTempDirectory("graft_tokpackprobe_").resolve("a").toString
    val out2 = java.nio.file.Files
      .createTempDirectory("graft_tokpackprobe_").resolve("b").toString
    val t0 = System.nanoTime()
    val n1 = graft.operators.TextAnalysis
      .packTokensMaterialize(docs, out1).count()
    val t1 = System.nanoTime()
    val n2 = graft.operators.TextAnalysis
      .packTokensMixtureMaterialize(docs,
        graft.operators.TextAnalysis.scenarioMixture, out2).count()
    val t2 = System.nanoTime()
    println(s"""{"metric":"tokpack_probe","corpus":"$corpusDir","docs":$rows,"seqs":$n1,"mix_seqs":$n2,"pack_sec":${(t1 - t0) / 1e9},"mixture_pack_sec":${(t2 - t1) / 1e9}}""")
  }

  /** SUBWORD pack across a growing corpus
    * (SPARK_GRAFT_PROBE=vppack): the r19 greedy-encode exit — (a) the
    * encode-only pass (gram induction + per-char fold emitting
    * segment ids, the new map-side linear term) and (b) the full
    * subword pack materialization (encode + doc_id prefix sum + id
    * slicing + per-sequence assembly). Both should scale ~linearly in
    * corpus characters; nothing here may grow with the vocab beyond
    * the broadcast map.
    */
  private def vpPackProbe(spark: SparkSession,
      corpusDir: String): Unit = {
    import graft.operators.TextAnalysis
    val docs = Tables.load(spark, corpusDir, "documents")
    val rows = docs.count()
    val out = java.nio.file.Files
      .createTempDirectory("graft_vppackprobe_").resolve("a").toString
    val t0 = System.nanoTime()
    val vdf = TextAnalysis.gramVocab(docs, 64)
    val segTotal = TextAnalysis.vocabSegmentIds(docs, vdf)
      .agg(sum(size(col("vp_ids")))).head().getLong(0)
    val t1 = System.nanoTime()
    val n1 = TextAnalysis.packTokensMaterialize(docs, out,
      vocabSize = 64, tokenizer = "vp").count()
    val t2 = System.nanoTime()
    println(s"""{"metric":"vppack_probe","corpus":"$corpusDir","docs":$rows,"segments":$segTotal,"seqs":$n1,"encode_sec":${(t1 - t0) / 1e9},"pack_sec":${(t2 - t1) / 1e9}}""")
  }

  /** BPE TRAINER per-merge cost (SPARK_GRAFT_PROBE=bpe): the r20
    * incremental pair-count loop — per-merge wall time should stay
    * FLAT as the merge list grows (the delta work is ∝ words
    * containing the winning pair, never the vocabulary), and the
    * short run should beat the full-recount reference at the same
    * merge count. Prints per-merge seconds at a short and a long
    * merge budget plus the recount baseline at the short budget.
    */
  private def bpeProbe(spark: SparkSession,
      corpusDir: String): Unit = {
    import graft.operators.TextAnalysis
    val docs = Tables.load(spark, corpusDir, "documents")
    val shortM = 32
    val longM = 256
    val t0 = System.nanoTime()
    val vShort = TextAnalysis.bpeInduct(docs, shortM, 2L)
    val nShort = vShort.where(col("left").isNotNull).count()
    val t1 = System.nanoTime()
    val vLong = TextAnalysis.bpeInduct(docs, longM, 2L)
    val nLong = vLong.where(col("left").isNotNull).count()
    val t2 = System.nanoTime()
    val vRec = TextAnalysis.bpeInductRecount(docs, shortM, 2L)
    val nRec = vRec.where(col("left").isNotNull).count()
    val t3 = System.nanoTime()
    println(s"""{"metric":"bpe_probe","corpus":"$corpusDir","docs":${docs.count()},"merges_short":$nShort,"sec_short":${(t1 - t0) / 1e9},"merges_long":$nLong,"sec_long":${(t2 - t1) / 1e9},"per_merge_short":${(t1 - t0) / 1e9 / math.max(1L, nShort)},"per_merge_long":${(t2 - t1) / 1e9 / math.max(1L, nLong)},"recount_merges":$nRec,"recount_sec":${(t3 - t2) / 1e9}}""")
    // the WIDE-WORD-DOMAIN leg — what the delta maintenance is FOR:
    // the testdata vocabulary is ~310 distinct words (job overhead
    // dominates both loops there), but a production trainer's word
    // frame is millions of rows, and the recount loop re-folds and
    // re-aggregates ALL of them every merge while the delta loop
    // touches only words containing the winning pair. 200k distinct
    // 64-char hex words (md5-derived, deterministic) make that
    // visible: per-merge cost recount vs incremental at the same
    // merge budget.
    val wide = spark.range(200000L).select(col("id").as("doc_id"),
      expr("concat(md5(cast(id as string)), " +
        "md5(cast(id + 7 as string)))").as("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    wide.count(): Unit
    val w0 = System.nanoTime()
    val wInc = TextAnalysis.bpeInduct(wide, 24, 2L)
      .where(col("left").isNotNull).count()
    val w1 = System.nanoTime()
    val wRec = TextAnalysis.bpeInductRecount(wide, 24, 2L)
      .where(col("left").isNotNull).count()
    val w2 = System.nanoTime()
    wide.unpersist(): Unit
    println(s"""{"metric":"bpe_probe_wide","distinct_words":200000,"merges":$wInc,"incremental_sec":${(w1 - w0) / 1e9},"recount_merges":$wRec,"recount_sec":${(w2 - w1) / 1e9},"per_merge_incremental":${(w1 - w0) / 1e9 / math.max(1L, wInc)},"per_merge_recount":${(w2 - w1) / 1e9 / math.max(1L, wRec)}}""")
  }

  /** INCREMENTAL TOKEN PACK batch cost against a growing landed
    * corpus (SPARK_GRAFT_PROBE=tokincr): land the whole corpus as
    * batch 0 of [[graft.operators.TextAnalysis.packTokensIngest]],
    * then ingest a FIXED batch (the sf0.01 documents re-keyed above
    * the corpus max) as batch 1 — the steady-state cost a continuous
    * packing pipeline pays per cycle. The batch leg must track batch
    * size, not landed-corpus size: offsets come from O(batches)
    * state rows, the encode/fragment work is the batch's own, and
    * the fragment append is one commit.
    */
  private def tokIncrProbe(spark: SparkSession, corpusDir: String,
      batchDir: String): Unit = {
    import graft.operators.TextAnalysis
    val corpus = Tables.load(spark, corpusDir, "documents")
    // +2e9 keeps the batch above any scale_up corpus key (replica
    // offsets stay < 2e9) — the sibling probes' convention
    val batch = Tables.load(spark, batchDir, "documents")
      .select((col("doc_id") + lit(2000000000L)).as("doc_id"),
        col("text"))
    val rows = corpus.count(); val bRows = batch.count()
    val p = java.nio.file.Files
      .createTempDirectory("graft_tokincr_").toString
    val t0 = System.nanoTime()
    TextAnalysis.packTokensIngest(spark, p, corpus, 0L): Unit
    val t1 = System.nanoTime()
    TextAnalysis.packTokensIngest(spark, p, batch, 1L): Unit
    val t2 = System.nanoTime()
    println(s"""{"metric":"tokincr_probe","corpus":"$corpusDir","docs":$rows,"batch_docs":$bRows,"land_sec":${(t1 - t0) / 1e9},"batch_sec":${(t2 - t1) / 1e9}}""")
  }

  /** BATCH-SERVE latency against a growing index
    * (SPARK_GRAFT_PROBE=annbatch): a FIXED 16-query frame retrieves
    * top-k through the index-backed batch serve while the corpus
    * grows 10× and the cell count scales WITH it
    * (SPARK_GRAFT_CENTROIDS — the IVF design point is constant
    * expected cell size), so the steady-state serve should track
    * cell size + geometry-sized driver math, not corpus size. Build
    * is outside the window; min over 3 after a warm-up.
    */
  private def annBatchProbe(spark: SparkSession,
      corpusDir: String): Unit = {
    import graft.operators.Similarity
    val emb = Tables.load(spark, corpusDir, "embeddings")
    val k = sys.env.getOrElse("SPARK_GRAFT_CENTROIDS", "16").toInt
    val idx = java.nio.file.Files
      .createTempDirectory("graft_annbatch_").resolve("idx").toString
    val t0 = System.nanoTime()
    Similarity.ivfIndexBuild(spark, idx, emb, nCentroids = k)
    val t1 = System.nanoTime()
    val queries = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("query_id"), col("embedding"))
    def serve(): Long = Similarity
      .indexQueryBatch(spark, idx, queries, k = 10, nprobe = 4).count()
    serve() // warm footers/codegen
    val times = (1 to 3).map { _ =>
      val s = System.nanoTime(); serve(); (System.nanoTime() - s) / 1e9
    }
    val n = emb.count()
    println(s"""{"metric":"annbatch_probe","corpus":"$corpusDir","n_vecs":$n,"n_centroids":$k,"n_queries":16,"build_sec":${(t1 - t0) / 1e9},"serve_sec":${times.min}}""")
  }

  /** IVF+PQ SERVE latency against a growing index
    * (SPARK_GRAFT_PROBE=ivfpq): build once over the corpus
    * embeddings with SPARK_GRAFT_CENTROIDS cells (scale k WITH the
    * corpus — the IVF design point is constant expected cell size,
    * so serve cost tracks cell size + k·dim driver math, not corpus
    * size), then time the steady-state serve (probe + code-only ADC
    * + exact re-rank), min over 3 runs after one warm-up (sidecar +
    * centroid caches are process state a real server holds).
    */
  private def ivfPqProbe(spark: SparkSession, corpusDir: String): Unit = {
    val emb = Tables.load(spark, corpusDir, "embeddings")
    val k = sys.env.getOrElse("SPARK_GRAFT_CENTROIDS", "16").toInt
    val idx = java.nio.file.Files
      .createTempDirectory("graft_ivfpqprobe_").resolve("idx").toString
    val t0 = System.nanoTime()
    graft.operators.Similarity.ivfPqIndexBuild(spark, idx, emb,
      nCentroids = k)
    val t1 = System.nanoTime()
    val qv = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0)
    def serve(): Long = graft.operators.Similarity
      .ivfPqIndexQuery(spark, idx, qv, excludeVecId = 0L).count()
    serve() // warm-up
    val times = (1 to 3).map { _ =>
      val s = System.nanoTime(); serve(); (System.nanoTime() - s) / 1e9
    }
    val n = emb.count()
    println(s"""{"metric":"ivfpq_probe","corpus":"$corpusDir","n_vecs":$n,"n_centroids":$k,"build_sec":${(t1 - t0) / 1e9},"serve_sec":${times.min}}""")
  }

  /** SEMANTIC admission (SPARK_GRAFT_PROBE=semadmit): the full gate —
    * lexical screen + within-cell SEMANTIC screen against a built IVF
    * index — for a FIXED embedding-carrying batch against a growing
    * corpus, k scaled with the corpus (SPARK_GRAFT_CENTROIDS — the
    * IVF design point is constant expected cell size). The semantic
    * leg reads only the batch's TOUCHED cells' partitions, so with
    * cell size held constant the admission step should be ~flat in
    * corpus size.
    */
  private def semAdmitProbe(spark: SparkSession, corpusDir: String,
      batchDir: String): Unit = {
    import graft.operators.{Dedup, Similarity}
    val k = sys.env.getOrElse("SPARK_GRAFT_CENTROIDS", "16").toInt
    def docsWithEmb(dir: String) =
      Tables.load(spark, dir, "documents").join(
        Tables.load(spark, dir, "embeddings")
          .select(col("vec_id").as("doc_id"), col("label"),
            col("embedding")), Seq("doc_id"))
    val corpus = docsWithEmb(corpusDir)
    val batch = docsWithEmb(batchDir)
      .filter(col("doc_id") % 5 === 0)
      .withColumn("doc_id", col("doc_id") + 2000000000L)
    val stage = java.nio.file.Files.createTempDirectory("graft_semadm_")
    val idx = stage.resolve("idx").toString
    val ivf = stage.resolve("ivf").toString
    val clusters = stage.resolve("clusters").toString
    val t0 = System.nanoTime()
    Dedup.incrementalIndex(spark, idx, corpus, batchId = 0L)
    Similarity.ivfIndexBuild(spark, ivf,
      corpus.select(col("doc_id").as("vec_id"), col("label"),
        col("embedding")), nCentroids = k)
    val t1 = System.nanoTime()
    val verdicts = Dedup.admitBatch(spark, idx, clusters, batch,
      batchId = 1L, ivfIndexPath = Some(ivf))
    val counts = verdicts.groupBy(col("action")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val t2 = System.nanoTime()
    val st = Dedup.lastAdmitStages("")
    println(s"""{"metric":"semadmit_probe","corpus":"$corpusDir","batch":"$batchDir","n_centroids":$k,"build_sec":${(t1 - t0) / 1e9},"admit_sec":${(t2 - t1) / 1e9},"screen_sec":${st.getOrElse("screen_sec", -1.0)},"cluster_sec":${st.getOrElse("cluster_sec", -1.0)},"kept":${counts.getOrElse("keep", 0L)},"dropped":${counts.getOrElse("drop", 0L)}}""")
  }

  /** The full ADMISSION step (screen → cluster → verdict) for a
    * FIXED batch against a growing corpus: index build is one-time;
    * the per-batch admission time is the steady-state number and
    * should be ~flat in corpus size (probe is bucket-scoped +
    * candidate-pruned; clustering touches only batch components).
    */
  private def admitProbe(spark: SparkSession, corpusDir: String,
      batchDir: String): Unit = {
    val corpus = Tables.load(spark, corpusDir, "documents")
    val batch = Tables.load(spark, batchDir, "documents")
      .filter(col("doc_id") % 5 === 0)
      .withColumn("doc_id", col("doc_id") + 2000000000L)
    val stage = java.nio.file.Files.createTempDirectory("graft_admitprobe_")
    val idx = stage.resolve("idx").toString
    val clusters = stage.resolve("clusters").toString
    val t0 = System.nanoTime()
    graft.operators.Dedup.incrementalIndex(spark, idx, corpus,
      batchId = 0L)
    val t1 = System.nanoTime()
    val verdicts = graft.operators.Dedup.admitBatch(spark, idx, clusters,
      batch, batchId = 1L)
    // one aggregation pass — two separate counts would re-run the
    // verdict join and overstate the published admission cost
    val counts = verdicts.groupBy(col("action")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = counts.getOrElse("keep", 0L)
    val dropped = counts.getOrElse("drop", 0L)
    val t2 = System.nanoTime()
    println(s"""{"metric":"admit_probe","corpus":"$corpusDir","batch":"$batchDir","index_sec":${(t1 - t0) / 1e9},"admit_sec":${(t2 - t1) / 1e9},"kept":$kept,"dropped":$dropped}""")
  }

  /** The curation FRONT DOOR for a fixed arrival batch against a
    * growing curated corpus + index (SPARK_GRAFT_PROBE=curate): seed
    * the index from the corpus and the curated table with the corpus
    * itself (the state a long-running pipeline holds), then time ONE
    * full curationStream cycle — file stream in, screen, cluster
    * fold, verdicts, exactly-once curated append. The cycle should be
    * ~flat in corpus size (bloom-scoped sig probe, candidate-pruned
    * verification, batch-scale cluster fold).
    */
  private def curateProbe(spark: SparkSession, corpusDir: String,
      batchDir: String): Unit = {
    val corpus = Tables.load(spark, corpusDir, "documents")
    val batch = Tables.load(spark, batchDir, "documents")
      .filter(col("doc_id") % 5 === 0)
      .withColumn("doc_id", col("doc_id") + 2000000000L)
    val stage = java.nio.file.Files.createTempDirectory("graft_curprobe_")
    val raw = stage.resolve("raw").toString
    val corpusRows = corpus.count() // outside every timing window
    val t0 = System.nanoTime()
    // seed with batchId = -1 (plain appends): the stream's first
    // epoch is id 0, and a seed recorded AT 0 under the same index
    // appIds would make the cycle's own index appends no-op — the
    // timed cycle must include the real indexing work
    graft.operators.Dedup.incrementalIndex(spark,
      stage.resolve("idx").toString, corpus, batchId = -1L)
    val curated = graft.tables.GraftTable.create(spark,
      stage.resolve("curated").toString, corpus)
    val t1 = System.nanoTime()
    graft.sources.Ingest.stageBatch(batch, raw, "arrival")
    graft.streaming.Streams.curationStream(spark, raw,
      stage.resolve("cp").toString, stage.resolve("idx").toString,
      stage.resolve("clusters").toString, curated)
    val t2 = System.nanoTime()
    val admitted = curated.rowCount.map(_ - corpusRows).getOrElse(-1L)
    // per-stage split of the cycle (r14): screen (band probe + index
    // appends), cluster fold, verdict+glue (admit minus those two),
    // curated append; the remainder vs cycle_sec is stream machinery
    // (source listing, checkpointing, epoch planning)
    val st = graft.streaming.Streams.lastEpochStages(
      stage.resolve("cp").toString)
    def g(k: String): Double = st.getOrElse(k, -1.0)
    val stagesJson = s""""screen_sec":${g("screen_sec")},""" +
      s""""cluster_sec":${g("cluster_sec")},""" +
      s""""admit_sec":${g("admit_sec")},"append_sec":${g("append_sec")}"""
    println(s"""{"metric":"curate_probe","corpus":"$corpusDir","batch":"$batchDir","seed_sec":${(t1 - t0) / 1e9},"cycle_sec":${(t2 - t1) / 1e9},$stagesJson,"admitted":$admitted}""")
  }

  /** FILTERED-SERVE probe (SPARK_GRAFT_PROBE=annfilter): build the
    * IVF index over the corpus embeddings once (outside the window),
    * then time the filtered query — the selectivity counting pass
    * (reads only the filter column) plus the probed-cell scan — for a
    * ~10%-selective predicate, best of 3. The count is one map-side
    * column aggregate and the probe scan is cell-local, so the serve
    * should grow well below corpus growth.
    */
  private def annFilterProbe(spark: SparkSession,
      corpusDir: String): Unit = {
    import graft.operators.Similarity
    val emb = Tables.load(spark, corpusDir, "embeddings")
    val rows = emb.count()
    val stage = java.nio.file.Files.createTempDirectory("graft_annf_")
    val idx = stage.resolve("idx").toString
    Similarity.ivfIndexBuild(spark, idx, emb)
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toSeq
    def once(): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = Similarity.ivfIndexQuery(spark, idx, q, k = 10,
        excludeVecId = 0L, filter = Some(col("label") === 7)).count()
      ((System.nanoTime() - t0) / 1e9, n)
    }
    once() // warm footers/codegen
    val samples = (1 to 3).map(_ => once())
    println(s"""{"metric":"annfilter_probe","corpus":"$corpusDir","corpus_rows":$rows,"serve_sec":${samples.map(_._1).min},"result_rows":${samples.head._2}}""")
  }

  /** Fixed-trickle maintained-view refresh against a growing fact
    * table. Group key `g = o_custkey % 997` keeps the VIEW itself a
    * fixed 997 groups at any corpus size; the fact table clusters by
    * `g` so the single-group delete refresh can prune its recompute
    * fetch to that group's files.
    */
  private def mvProbe(spark: SparkSession, corpusDir: String): Unit = {
    import graft.tables.{GraftTable, IncrementalMatView}
    val orders = Tables.load(spark, corpusDir, "orders")
      .withColumn("g", col("o_custkey") % 997)
    val dir = java.nio.file.Files.createTempDirectory("graft_mvprobe_")
    val t = GraftTable.create(spark, dir.resolve("t").toString,
      orders.repartition(8))
    val rows = t.rowCount.getOrElse(orders.count())
    // scale file count with rows so per-file row counts stay level —
    // the shape a size-targeted compactor maintains on a real table
    t.clusterBy(math.max(8L, rows / 20000L).toInt, "g")
    val t0 = System.nanoTime()
    val mv = IncrementalMatView.create(spark, t,
      dir.resolve("mv").toString, Seq("g"), "o_totalprice",
      extremes = true)
    val t1 = System.nanoTime()
    // fold-path trickle: a fixed 1k-row append, no deletions — the
    // refresh folds monotonically with zero source I/O
    t.append(Tables.load(spark, corpusDir, "orders")
      .orderBy(col("o_orderkey")).limit(1000)
      .withColumn("o_orderkey", col("o_orderkey") + 4000000000L)
      .withColumn("g", col("o_custkey") % 997))
    val t2 = System.nanoTime()
    mv.refresh()
    val t3 = System.nanoTime()
    // recompute-path trickle: retire one group's maxima — the fetch
    // should read only files that may hold g=13
    val filesTotal = t.snapshot().inputFiles.length
    val filesRead = t.snapshotCandidates(col("g") === 13L).inputFiles.length
    t.delete(col("g") === 13L && col("o_totalprice") > 10000.0)
    val t4 = System.nanoTime()
    mv.refresh()
    val t5 = System.nanoTime()
    println(s"""{"metric":"mv_scale_probe","corpus":"$corpusDir","rows":$rows,"create_sec":${(t1 - t0) / 1e9},"fold_refresh_sec":${(t3 - t2) / 1e9},"delete_sec":${(t4 - t3) / 1e9},"recompute_refresh_sec":${(t5 - t4) / 1e9},"files_total":$filesTotal,"files_read":$filesRead}""")
  }
}
