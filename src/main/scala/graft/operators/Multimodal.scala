package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY.md §2.J): treat media as opaque
  * `binary` payloads plus typed metadata, with batch feature
  * extraction over partitions.
  *
  * The decode step is a clearly-marked deterministic STUB (no media
  * codecs in this environment) — everything around it (schema,
  * binary payload handling, per-partition batch shape, partition-
  * preserving extraction) is the real Spark plumbing a production
  * decode would drop into: swap `stubDecode` for a JNI/codec call
  * and the pipeline is unchanged.
  */
object Multimodal {

  /** Media metadata schema: the typed envelope around the payload. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),      // image|audio|video
    StructField("payload", BinaryType, nullable = true),    // opaque bytes
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  /** Build a media table from `documents`: payload = utf-8 bytes of
    * the text (a deterministic opaque blob), kind cycles by id.
    */
  def mediaTable(spark: SparkSession, sfDir: String): DataFrame =
    Tables.spreadCpu(Tables.load(spark, sfDir, "documents")).select(
      col("doc_id").as("media_id"),
      element_at(typedLit(Seq("image", "audio", "video")),
        (col("doc_id") % 3 + 1).cast("int")).as("kind"),
      encode(col("text"), "UTF-8").as("payload"),
      lit(null).cast("int").as("width"),
      lit(null).cast("int").as("height"),
      lit(null).cast("long").as("duration_ms"))

  /** STUB decode: deterministic pseudo-features from the payload
    * bytes (stands in for image decode / audio frame extraction).
    * Runs per-partition over the binary column — the exact batch
    * shape a vectorized codec UDF would use.
    */
  private def stubDecode(payload: Array[Byte]): (Int, Int, Long, Double) = {
    // ??? real codec goes here; deterministic fake derived from bytes:
    val n = payload.length
    val sum = payload.foldLeft(0L)((a, b) => a + (b & 0xff))
    (n % 1024, (n / 3) % 768, sum % 100000, sum.toDouble / math.max(n, 1))
  }

  case class MediaFeature(media_id: Long, kind: String, n_bytes: Int,
      width: Int, height: Int, duration_ms: Long, mean_byte: Double)

  case class FrameFeature(media_id: Long, kind: String, frame_idx: Int,
      frame_offset: Int, frame_len: Int, byte_sum: Long, mean_byte: Double)

  /** Frame sampling: every `stride` bytes take a `frameSize`-byte
    * "frame" from the payload and emit per-frame stub features — the
    * video/audio frame-extraction plumbing (one row in → many frame
    * rows out, flatMap over the typed Dataset, no shuffle; a real
    * decoder slots into the per-frame loop). At 100 TB the frame
    * explosion is map-side and the downstream sees a normal columnar
    * frame table.
    */
  def frameSample(spark: SparkSession, sfDir: String,
      frameSize: Int = 64, stride: Int = 128): DataFrame = {
    import spark.implicits._
    mediaTable(spark, sfDir)
      .select(col("media_id"), col("kind"), col("payload"))
      // payload is declared nullable (a null-text document encodes to
      // a null payload): a frameless asset yields zero frames, not a
      // task-killing NPE in the typed flatMap — the same posture as
      // frameGrid's length(text) > 0 filter
      .where(col("payload").isNotNull)
      .as[(Long, String, Array[Byte])]
      .flatMap { case (id, kind, p) =>
        Iterator.range(0, p.length, stride).zipWithIndex.map { case (off, idx) =>
          val end = math.min(off + frameSize, p.length)
          var s = 0L; var i = off
          while (i < end) { s += p(i) & 0xff; i += 1 }
          val len = end - off
          FrameFeature(id, kind, idx, off, len, s,
            s.toDouble / math.max(len, 1))
        }
      }.toDF()
  }

  /** The sampled-frame grid as (media_id, frame_idx, fc) — the shared
    * declarative extraction under [[frameSignatures]] and
    * [[frameEmbeddings]] (sequence+substring, whole-stage codegen).
    *
    * STUB-DOMAIN scope: this twin cuts the text by CHARACTERS while
    * [[frameSample]] (the byte-true path a real codec slots into)
    * cuts the encoded payload by BYTES — the two grids coincide
    * exactly on single-byte text, which is what the synthetic corpus
    * and the specs pin; a multibyte corpus shifts the character grid
    * off the byte grid, and [[frameEmbeddings]]'s 8 byte-class
    * buckets (x div 32) cover codepoints < 256 only. A real binary
    * payload replaces BOTH with the codec's own framing, so the
    * divergence lives and dies with the stub.
    */
  private def frameGrid(spark: SparkSession, sfDir: String,
      frameSize: Int, stride: Int): DataFrame =
    Tables.spreadCpu(Tables.load(spark, sfDir, "documents"))
      .where(length(col("text")) > 0)
      .select(col("doc_id").as("media_id"),
        explode(sequence(lit(0),
          greatest(ceil(length(col("text")).cast("double") / stride)
            .cast("int") - 1, lit(0)))).as("frame_idx"),
        col("text"))
      .select(col("media_id"), col("frame_idx"),
        expr(s"substring(text, frame_idx * $stride + 1, $frameSize)")
          .as("fc"))

  /** Deterministic per-frame EMBEDDINGS — the bridge from the
    * multimodal column to the SIMILARITY machinery: each sampled
    * frame embeds as its 8 byte-class counts (value div 32 buckets),
    * EXACT small integers carried as floats so every downstream
    * cosine replays bit-identically (a real perceptual encoder slots
    * into the same (id, embedding) shape). vec_id = media_id·2¹⁶ +
    * frame_idx, so frame vectors feed ivfIndexBuild / annTopK /
    * semantic dedup unchanged.
    */
  private[graft] def frameEmbeddings(spark: SparkSession, sfDir: String,
      frameSize: Int = 64, stride: Int = 128): DataFrame =
    frameGrid(spark, sfDir, frameSize, stride)
      .where(length(col("fc")) > 0)
      // the byte array materializes ONCE per frame — interpreted HOFs
      // have no subexpression elimination, so inlining it under the
      // 8-bucket transform would decode the frame 8× (measured ~2× on
      // the whole query at sf0.1)
      .withColumn("__bytes", expr(
        "transform(sequence(1, length(fc)), i -> ascii(substring(fc, i, 1)))"))
      .select(col("media_id"), col("frame_idx"),
        // the 2^16 packing holds only while frame_idx < 65536 — a
        // longer asset would silently collide its vec_ids with the
        // NEXT media_id's frames (and the `div 65536` decode would
        // attribute hits to the wrong asset), so overflow refuses
        // loudly per row instead
        (col("media_id") * 65536L +
          when(col("frame_idx") < 65536, col("frame_idx"))
            .otherwise(expr("raise_error(concat('frame_idx ', " +
              "cast(frame_idx as string), ' overflows the 2^16 " +
              "vec_id packing for media_id ', " +
              "cast(media_id as string), ' - widen the packing or " +
              "raise stride'))"))).as("vec_id"),
        expr("cast(transform(sequence(0, 7), b -> cast(size(filter(" +
          "__bytes, x -> x div 32 = b)) as float)) as array<float>)")
          .as("embedding"))

  /** FRAME-LEVEL SIMILARITY SEARCH: exact top-k cosine neighbors of a
    * query frame over every sampled frame's embedding — reused
    * retrieval semantics ([[graft.operators.Similarity]]'s brute
    * kernel shape: map-side cosine against a broadcast query vector,
    * one top-k), so "find frames like this one" composes with the
    * same decimal-rounded, id-tie-broken contract as the document ANN
    * family; the IVF composition (frame embeddings feeding
    * ivfIndexBuild/ivfIndexQuery) is spec-pinned.
    */
  def frameAnnTopK(spark: SparkSession, sfDir: String, k: Int = 10,
      queryMedia: Long = 0L, queryFrame: Int = 0): DataFrame = {
    graft.functions.VectorExprs.register(spark)
    val emb = frameEmbeddings(spark, sfDir)
    val qRows = emb.where(col("media_id") === queryMedia &&
        col("frame_idx") === queryFrame)
      .select(col("embedding")).take(1)
    // a missing query frame answers EMPTY (matching the relational
    // oracle, whose query CTE is just empty then) — not a crash
    if (qRows.isEmpty)
      return emb.limit(0).select(col("media_id"), col("frame_idx"),
        lit(0.0).as("cos_sim"))
    val q = qRows.head.getSeq[Float](0)
    emb.where(!(col("media_id") === queryMedia &&
        col("frame_idx") === queryFrame))
      .select(col("media_id"), col("frame_idx"),
        round(graft.functions.VectorExprs
          .vec_cosine(col("embedding"), typedLit(q))
          .cast("decimal(18,12)"), 6).cast("double").as("cos_sim"))
      .orderBy(col("cos_sim").desc, col("media_id"), col("frame_idx"))
      .limit(k)
  }

  /** Portable 60-bit SimHash per sampled frame — the signature leg of
    * [[frameNearDup]], exposed for the brute-force equivalence spec.
    * Tokens are the frame content's distinct character 4-grams (the
    * byte-level analog of word shingles — a real codec would emit
    * perceptual features into the same column), hashed with the same
    * md5 residue as the portable text kernels, so the whole pipeline
    * replays in the DuckDB oracle. Frames shorter than one 4-gram
    * carry no signature (and so never pair).
    */
  private[graft] def frameSignatures(spark: SparkSession, sfDir: String,
      frameSize: Int = 64, stride: Int = 128): DataFrame = {
    val nBits = 60
    val frames = frameGrid(spark, sfDir, frameSize, stride)
      .where(length(col("fc")) >= 4)
    val posts = frames.select(col("media_id"), col("frame_idx"),
      explode(expr("array_distinct(transform(sequence(0, length(fc) - 4), " +
        "i -> substring(fc, i + 1, 4)))")).as("t"))
      .select(col("media_id"), col("frame_idx"),
        Tables.md5Residue(col("t")).as("h"))
    val bitAggs = (0 until nBits).map { b =>
      sum(when(shiftrightunsigned(col("h"), b).bitwiseAND(1) === 1, 1)
        .otherwise(-1)).as(s"b$b")
    }
    val bitSums = posts.groupBy(col("media_id"), col("frame_idx"))
      .agg(bitAggs.head, bitAggs.tail: _*)
    val simhashCol = (0 until nBits).map { b =>
      when(col(s"b$b") > 0, lit(1L << b)).otherwise(0L)
    }.reduce((x, y) => x.bitwiseOR(y))
    bitSums.select(col("media_id"), col("frame_idx"),
      simhashCol.as("simhash"))
  }

  /** FRAME-LEVEL NEAR-DUP — the operator that makes the multimodal
    * column a first-class dedup citizen: sampled frames (the
    * [[frameSample]] grid over the opaque payload) sketch to portable
    * SimHash signatures and pair via the block-rotation trick (4
    * blocks × 15 bits covers maxHamming=3 by pigeonhole), exactly the
    * [[Dedup.simhashPortable]] kernel applied per (asset, frame).
    * Cross-asset pairs find reused footage/boilerplate media; same-
    * asset pairs find internal repetition. Scale shape: frame
    * explosion and sketching are map-side, the only shuffles are the
    * signature aggregate and the 15-bit block equi-join — far pairs
    * die inside the join condition before the pair-dedup shuffle.
    * Returns (media_a, frame_a, media_b, frame_b, hamming), each
    * unordered frame pair once.
    */
  def frameNearDup(spark: SparkSession, sfDir: String,
      frameSize: Int = 64, stride: Int = 128,
      maxHamming: Int = 3): DataFrame = {
    val nBits = 60
    val nBlocks = maxHamming + 1
    val blockBits = nBits / nBlocks
    val sigs = frameSignatures(spark, sfDir, frameSize, stride)
    val blocked = sigs.select(col("media_id"), col("frame_idx"),
      col("simhash"),
      explode(array((0 until nBlocks).map { blk =>
        struct(lit(blk).as("blk"),
          shiftrightunsigned(col("simhash"), blk * blockBits)
            .bitwiseAND((1L << blockBits) - 1L).as("bval"))
      }: _*)).as("bk"))
    val a = blocked.as("a"); val b = blocked.as("b")
    val ham = bit_count(col("a.simhash").bitwiseXOR(col("b.simhash")))
    a.join(b, col("a.bk") === col("b.bk") &&
        (col("a.media_id") < col("b.media_id") ||
          (col("a.media_id") === col("b.media_id") &&
            col("a.frame_idx") < col("b.frame_idx"))) &&
        ham <= maxHamming)
      .select(col("a.media_id").as("media_a"),
        col("a.frame_idx").as("frame_a"),
        col("b.media_id").as("media_b"),
        col("b.frame_idx").as("frame_b"),
        ham.cast("int").as("hamming"))
      .dropDuplicates("media_a", "frame_a", "media_b", "frame_b")
  }

  private val frameIdxStages =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Seq[Float])]()

  /** Stage the SQL-lifecycle flat frame index once per (process,
    * sfDir) — the shared staging both the indexed and the filtered
    * frame scenarios serve from (the `pqServeStage` pattern): CREATE
    * on the media_id % 4 ≠ 0 frames, INGEST the held-out quarter,
    * compaction-only MAINTAIN. Returns (index path, query embedding).
    */
  private def frameIdxStage(spark: SparkSession,
      sfDir: String): (String, Seq[Float]) =
    frameIdxStages.computeIfAbsent(sfDir, _ => {
      import org.apache.spark.sql.functions.col
      val emb = frameEmbeddings(spark, sfDir)
      val st = java.nio.file.Files.createTempDirectory("graft_frameidx_")
      val seedDir = st.resolve("seed").toString
      val arrDir = st.resolve("arr").toString
      emb.where(col("media_id") % 4 =!= 0)
        .select(col("vec_id"), col("embedding")).write.parquet(seedDir)
      emb.where(col("media_id") % 4 === 0)
        .select(col("vec_id"), col("embedding")).write.parquet(arrDir)
      val ivf = st.resolve("ivf").toString
      graft.tables.GraftSql.sql(spark,
        s"CREATE ANN INDEX '$ivf' ON '$seedDir'")
      graft.tables.GraftSql.sql(spark,
        s"INGEST INTO ANN INDEX '$ivf' FROM '$arrDir'")
      graft.tables.GraftSql.sql(spark,
        s"MAINTAIN ANN INDEX '$ivf' REBALANCE THRESHOLD 0")
      (ivf, emb.where(col("media_id") === 0L && col("frame_idx") === 0)
        .select(col("embedding")).head().getSeq[Float](0).toSeq)
    })

  /** [[frameAnnTopK]] served from a PERSISTED index — the
    * `ann_sql_lifecycle` pattern applied to the multimodal column:
    * the frame-embedding grid stages once per process through the SQL
    * statements (CREATE ANN INDEX on the media_id % 4 ≠ 0 frames,
    * INGEST the held-out quarter, MAINTAIN compaction-only), and
    * every invocation serves the query frame through the ordinary
    * probed-cell [[graft.operators.Similarity.ivfIndexQuery]]. The
    * probe window covers EVERY cell, so the served answer is exactly
    * the brute-force top-k over the same frames — the oracle checks
    * the whole lifecycle (build, conform-ingest, maintain, read)
    * end-to-end, geometry-independent; the partition-pruned nprobe<k
    * regime is spec-pinned separately (frame-IVF composition,
    * OperatorsSpec "frame embeddings feed the IVF index machinery").
    */
  def frameAnnIndexedScenario(spark: SparkSession, sfDir: String,
      k: Int = 10): DataFrame = {
    import org.apache.spark.sql.functions.col
    val (ivf, q) = frameIdxStage(spark, sfDir)
    graft.operators.Similarity
      .ivfIndexQuery(spark, ivf, q, k = k, nprobe = 1 << 16,
        excludeVecId = 0L)
      .select(expr("vec_id div 65536").cast("long").as("media_id"),
        expr("vec_id % 65536").cast("int").as("frame_idx"),
        col("cos_sim"))
  }

  /** FILTERED retrieval against the persisted frame index — r16's two
    * capabilities composed: the `filter` predicate (media_id ≡ 3 mod
    * 10 over the packed vec_id, ~10% of frames) runs INSIDE the
    * probed-cell scan of the [[frameAnnIndexedScenario]]-staged flat
    * IVF, and [[graft.operators.Similarity.filteredNprobe]]'s
    * selectivity-scaled expansion (ceil(4 · total/matching) at ~10%
    * selectivity) covers every cell of the 16-cell geometry — so the
    * served answer is exactly filter-then-brute-force and the
    * relational oracle applies. The saturation arithmetic is
    * spec-asserted against the live frame counts, so a testdata
    * distribution drift that un-saturates the probe fails the spec
    * rather than silently weakening the oracle.
    */
  def frameAnnFilteredScenario(spark: SparkSession, sfDir: String,
      k: Int = 10): DataFrame = {
    import org.apache.spark.sql.functions.col
    val (ivf, q) = frameIdxStage(spark, sfDir)
    graft.operators.Similarity
      .ivfIndexQuery(spark, ivf, q, k = k, nprobe = 4,
        excludeVecId = 0L,
        filter = Some(expr("(vec_id div 65536) % 10 = 3")))
      .select(expr("vec_id div 65536").cast("long").as("media_id"),
        expr("vec_id % 65536").cast("int").as("frame_idx"),
        col("cos_sim"))
  }

  private val framePqStages =
    new java.util.concurrent.ConcurrentHashMap[String, (String, Seq[Float])]()

  /** [[frameAnnIndexedScenario]] on the IVF+PQ path — the ADC cascade
    * over the multimodal frame grid: the frame-embedding corpus
    * stages once per process through `CREATE ANN INDEX ... USING
    * IVF_PQ` (media_id % 4 ≠ 0 frames train the coarse quantizer AND
    * the 16-seed codebook) + `INGEST` of the held-out quarter
    * (conform-encoded against the STORED codebook), and every
    * invocation serves through [[graft.operators.Similarity
    * .ivfPqIndexQuery]]: all-cells probe (geometry-independent) with
    * the shortlist capped BELOW the candidate count, so the CODE
    * ranking genuinely decides the shortlist and the exact re-rank
    * genuinely repairs it — the oracle replays PQ-encode → ADC →
    * shortlist → exact cosine relationally over the same frame grid.
    */
  def frameAnnPqScenario(spark: SparkSession, sfDir: String,
      k: Int = 10, shortlist: Int = 25): DataFrame = {
    import org.apache.spark.sql.functions.col
    val (ivf, q) = framePqStages.computeIfAbsent(sfDir, _ => {
      val emb = frameEmbeddings(spark, sfDir)
      val st = java.nio.file.Files.createTempDirectory("graft_framepq_")
      val seedDir = st.resolve("seed").toString
      val arrDir = st.resolve("arr").toString
      emb.where(col("media_id") % 4 =!= 0)
        .select(col("vec_id"), col("embedding")).write.parquet(seedDir)
      emb.where(col("media_id") % 4 === 0)
        .select(col("vec_id"), col("embedding")).write.parquet(arrDir)
      val ivf = st.resolve("ivfpq").toString
      graft.tables.GraftSql.sql(spark,
        s"CREATE ANN INDEX '$ivf' ON '$seedDir' USING IVF_PQ")
      graft.tables.GraftSql.sql(spark,
        s"INGEST INTO ANN INDEX '$ivf' FROM '$arrDir'")
      graft.tables.GraftSql.sql(spark,
        s"MAINTAIN ANN INDEX '$ivf' REBALANCE THRESHOLD 0")
      (ivf, emb.where(col("media_id") === 0L && col("frame_idx") === 0)
        .select(col("embedding")).head().getSeq[Float](0).toSeq)
    })
    graft.operators.Similarity
      .ivfPqIndexQuery(spark, ivf, q, k = k, nprobe = 1 << 16,
        shortlist = shortlist, excludeVecId = 0L)
      .select(expr("vec_id div 65536").cast("long").as("media_id"),
        expr("vec_id % 65536").cast("int").as("frame_idx"),
        col("cos_sim"))
  }

  /** Feature extraction over the media table: mapPartitions over the
    * typed Dataset — one decode batch per partition, partitioning
    * preserved (no shuffle), columnar in/out.
    */
  def extractFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val media = mediaTable(spark, sfDir)
    media.select(col("media_id"), col("kind"), col("payload"))
      // nullable payload: skip the asset rather than NPE in the codec
      .where(col("payload").isNotNull)
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, kind, payload) =>
        val (w, h, d, m) = stubDecode(payload)
        MediaFeature(id, kind, payload.length, w, h, d, m)
      })
      .toDF()
  }
}
