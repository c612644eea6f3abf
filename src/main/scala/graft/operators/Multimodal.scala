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
    Tables.load(spark, sfDir, "documents").select(
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

  /** Feature extraction over the media table: mapPartitions over the
    * typed Dataset — one decode batch per partition, partitioning
    * preserved (no shuffle), columnar in/out.
    */
  def extractFeatures(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val media = mediaTable(spark, sfDir)
    media.select(col("media_id"), col("kind"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, kind, payload) =>
        val (w, h, d, m) = stubDecode(payload)
        MediaFeature(id, kind, payload.length, w, h, d, m)
      })
      .toDF()
  }
}
