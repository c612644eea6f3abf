package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnsafeMapData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, MapData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The GREEDY LONGEST-MATCH subword encode as ONE native codegen'd
  * kernel — `vp_encode_ids(text, gram_map, minN, maxN)` emits the
  * per-doc segment-ID array and `vp_encode_count` the segment count,
  * byte-identical to the built-ins fold spelling they replace
  * (TextAnalysis.vocabSegmentIdsFold / vocabSegmentsFold, kept as the
  * spec's equivalence reference): lowercase the text (the same
  * UTF8String.toLowerCase `lower()` evaluates), scan the maximal
  * `[a-z0-9]+` byte runs (equal to the regex's match set on a
  * lowercased string — those byte values never occur inside a
  * multi-byte UTF-8 sequence), and at each cursor position take the
  * LONGEST vocabulary gram that fits (probing maxN down to minN
  * against a hash map), else one character at UNK id 0 — Wu et al.
  * 2016's WordPiece inference.
  *
  * Why native: the fold spelling evaluates its higher-order-function
  * lambdas as interpreted expressions outside whole-stage codegen and
  * re-appends the id array per segment (O(segments²) copies per
  * word); measured at the 100× corpus probe the interpreted encode
  * was ~100% of the subword pack's cost. This kernel is one static
  * call from generated code — one tight byte loop per row, one probe
  * chain per segment, one output array per doc.
  *
  * The vocabulary arrives as the same 1-row broadcast map column the
  * fold probed (built once per write by TextAnalysis.gramMap), so the
  * plan shape — map-side, zero-shuffle, V-bounded broadcast — is
  * unchanged. The kernel builds its probe-side hash map ONCE per task
  * from that MapData and caches it keyed by the map's backing buffer
  * (UnsafeMapData wrappers are re-allocated per row, so identity on
  * the wrapper would rebuild per row) — every hit CONTENT-VERIFIED
  * against a saved copy of the map bytes, because a reused row
  * buffer can serve two different per-row maps at one address (see
  * [[GramMapProbeBase]]); map entries with null ids are unreachable,
  * exactly like the fold's `element_at(...).isNotNull` guard.
  */
abstract class GramMapProbeBase extends BinaryExpression {
  def text: Expression
  def gmap: Expression

  override def left: Expression = text
  override def right: Expression = gmap

  override def checkInputDataTypes() = (text.dataType, gmap.dataType) match {
    case (StringType, MapType(StringType, LongType, _)) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"${prettyName} needs (STRING, MAP<STRING, BIGINT>), got $other")
  }

  /** One immutable holder so a racy re-read can never pair one map's
    * key with another's table (assignment of the reference is atomic;
    * expression instances deserialize per task, so contention is the
    * exception, not the rule). `bytes` is a defensive COPY of the
    * UnsafeMapData's serialized region taken at build time: the
    * (baseObject, offset, size) triple alone is NOT a sound cache key
    * — a per-row map written into a REUSED row buffer (e.g.
    * `map(k, v)` with column arguments on the registered SQL surface)
    * lands at the same address with the same byte size but different
    * contents, and trusting the address would silently probe the
    * previous row's vocabulary. Every hit therefore content-verifies
    * against the copy (an 8-byte-stride compare, O(map bytes) per row
    * — negligible against the probe loop at broadcast-vocab sizes,
    * and strictly cheaper than the rebuild a miss costs; beyond the
    * ~10⁶-entry map ceiling the broadcast-join seam is the production
    * path anyway). Non-Unsafe MapData (literals, interpreted rows) is
    * immutable per instance, so reference identity alone stays sound
    * there (`bytes` null).
    */
  private final class Cached(val key: AnyRef, val off: Long,
      val len: Long, val bytes: Array[Byte],
      val map: java.util.HashMap[UTF8String, java.lang.Long])
  @transient private var cached: Cached = null
  /** Build-count observable so the spec can pin the FAST PATH, not
    * just the output: a rebuild produces identical ids, so without
    * this a regression that rebuilds the map per row (collapsing the
    * kernel back below the interpreted fold) would stay green.
    */
  @transient private[graft] var mapBuilds: Long = 0L

  protected final def lookup(
      m: MapData): java.util.HashMap[UTF8String, java.lang.Long] = {
    val (key, off, len) = m match {
      case u: UnsafeMapData => (u.getBaseObject, u.getBaseOffset,
        u.getSizeInBytes.toLong)
      case other => (other.asInstanceOf[AnyRef], 0L, -1L)
    }
    val c = cached
    if (c != null && (c.key eq key) && c.off == off && c.len == len &&
        (c.bytes == null ||
          org.apache.spark.unsafe.array.ByteArrayMethods.arrayEquals(
            key, off, c.bytes,
            org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len)))
      return c.map
    mapBuilds += 1L
    val h = new java.util.HashMap[UTF8String, java.lang.Long](
      m.numElements() * 2)
    val keys = m.keyArray(); val vals = m.valueArray()
    var i = 0
    while (i < m.numElements()) {
      // a null id is unreachable in the fold (element_at(..).isNotNull
      // fails) — skip it here so the probe misses identically; keys
      // are copied out of the (possibly buffer-backed) MapData
      if (!keys.isNullAt(i) && !vals.isNullAt(i))
        h.put(UTF8String.fromBytes(keys.getUTF8String(i).getBytes),
          vals.getLong(i)): Unit
      i += 1
    }
    val copy = if (len < 0L) null else {
      val a = new Array[Byte](len.toInt)
      org.apache.spark.unsafe.Platform.copyMemory(key, off, a,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len)
      a
    }
    cached = new Cached(key, off, len, copy, h)
    h
  }

  @inline protected final def isWordByte(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= '0' && b <= '9')
}

/** The greedy family's shared base: the probe window bounds. NO
  * require in the class body — Java deserialization re-runs the
  * nearest-non-serializable-ancestor constructor chain with fields
  * still zeroed, so a body-level bounds check would throw (0..0) on
  * every executor; bounds are validated at construction sites
  * (VocabEncode.validate).
  */
abstract class VocabEncodeBase extends GramMapProbeBase {
  def minN: Int
  def maxN: Int
}

/** `vp_encode_ids(text, gram_map, minN, maxN)` → ARRAY<BIGINT>: the
  * flattened greedy segment ids of every `[a-z0-9]+` word in the
  * lowercased text, UNK 0.
  */
case class VocabEncodeIds(text: Expression, gmap: Expression,
    minN: Int, maxN: Int) extends VocabEncodeBase {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(t: Any, m: Any): Any =
    encodeIds(t.asInstanceOf[UTF8String], m.asInstanceOf[MapData])

  def encodeIds(t: UTF8String, mRaw: MapData): ArrayData = {
    val m = lookup(mRaw)
    val b = t.toLowerCase.getBytes
    var out = new Array[Long](math.max(8, b.length / 4))
    var n = 0
    var i = 0
    while (i < b.length) {
      if (!isWordByte(b(i))) i += 1
      else {
        var e = i + 1
        while (e < b.length && isWordByte(b(e))) e += 1
        var pos = i
        while (pos < e) {
          var len = 1; var id = 0L
          var k = math.min(maxN, e - pos)
          var hit = false
          while (!hit && k >= minN) {
            val v = m.get(UTF8String.fromBytes(b, pos, k))
            if (v != null) { hit = true; len = k; id = v }
            else k -= 1
          }
          if (n == out.length) {
            val g = new Array[Long](out.length * 2)
            System.arraycopy(out, 0, g, 0, out.length); out = g
          }
          out(n) = id; n += 1
          pos += len
        }
        i = e
      }
    }
    val res = new Array[Long](n)
    System.arraycopy(out, 0, res, 0, n)
    new GenericArrayData(res)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vpEncodeIds", this)
    nullSafeCodeGen(ctx, ev, (t, m) =>
      s"${ev.value} = $ref.encodeIds($t, $m);")
  }

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): VocabEncodeIds = copy(text = l, gmap = r)
}

/** `vp_encode_count(text, gram_map, minN, maxN)` → BIGINT: the greedy
  * segment count — the same cursor as [[VocabEncodeIds]] without
  * materializing the array (shared byte-run and probe logic by
  * construction: count = the ids the other form would emit).
  */
case class VocabEncodeCount(text: Expression, gmap: Expression,
    minN: Int, maxN: Int) extends VocabEncodeBase {
  override def dataType: DataType = LongType

  override def nullSafeEval(t: Any, m: Any): Any =
    encodeCount(t.asInstanceOf[UTF8String], m.asInstanceOf[MapData])

  def encodeCount(t: UTF8String, mRaw: MapData): Long = {
    val m = lookup(mRaw)
    val b = t.toLowerCase.getBytes
    var cnt = 0L
    var i = 0
    while (i < b.length) {
      if (!isWordByte(b(i))) i += 1
      else {
        var e = i + 1
        while (e < b.length && isWordByte(b(e))) e += 1
        var pos = i
        while (pos < e) {
          var len = 1
          var k = math.min(maxN, e - pos)
          var hit = false
          while (!hit && k >= minN) {
            if (m.get(UTF8String.fromBytes(b, pos, k)) != null) {
              hit = true; len = k
            } else k -= 1
          }
          cnt += 1L
          pos += len
        }
        i = e
      }
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vpEncodeCount", this)
    nullSafeCodeGen(ctx, ev, (t, m) =>
      s"${ev.value} = $ref.encodeCount($t, $m);")
  }

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): VocabEncodeCount = copy(text = l, gmap = r)
}

/** `bpe_encode_ids(text, vocab_map, lefts, rights)` → ARRAY<BIGINT>:
  * the MERGE-ORDER BPE encode — the application a BPE-trained
  * vocabulary is DEFINED by (Sennrich et al. 2016): each `[a-z0-9]+`
  * word of the lowercased text starts as characters, the pinned merge
  * list applies IN TRAINING ORDER (one left-to-right pass per merge,
  * adjacent (left, right) symbols fusing exactly like training's own
  * pass — the bpeMergeFold convention, so encode ≡ what training did
  * to that word), and the final symbols map to their vocabulary ids
  * (UNK 0). Greedy longest-match over the same vocabulary can
  * segment DIFFERENTLY ("abc" under {ab, bc}: greedy → [ab, c];
  * merge-priority with (b, c) ranked first → [a, bc]) — this kernel
  * is the fidelity path for vocabularies that carry their merge
  * ranks.
  *
  * Symbols after any number of merges are CONTIGUOUS substrings of
  * the word, so the pass mutates one boundary array in place — no
  * per-symbol strings until the final id lookup. The merge list is
  * embedded in the expression (bounded by the training-run merge
  * count — the same posture as the broadcast vocab map's ~10⁶-entry
  * ceiling: beyond ~10⁵ merges the per-word pass cost, O(merges ×
  * symbols), wants batched merge application); a word collapsed to
  * ONE symbol exits the merge loop early.
  */
case class BpeMergeEncodeIds(text: Expression, gmap: Expression,
    lefts: Seq[String], rights: Seq[String]) extends GramMapProbeBase {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val leftBytes: Array[Array[Byte]] =
    lefts.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray
  @transient private lazy val rightBytes: Array[Array[Byte]] =
    rights.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray

  override def nullSafeEval(t: Any, m: Any): Any =
    encodeBpe(t.asInstanceOf[UTF8String], m.asInstanceOf[MapData])

  @inline private def symEq(b: Array[Byte], s: Int, e: Int,
      pat: Array[Byte]): Boolean = {
    if (e - s != pat.length) return false
    var i = 0
    while (i < pat.length) {
      if (b(s + i) != pat(i)) return false
      i += 1
    }
    true
  }

  def encodeBpe(t: UTF8String, mRaw: MapData): ArrayData = {
    val m = lookup(mRaw)
    val b = t.toLowerCase.getBytes
    val nMerges = leftBytes.length
    var out = new Array[Long](math.max(8, b.length / 4))
    var n = 0
    var i = 0
    while (i < b.length) {
      if (!isWordByte(b(i))) i += 1
      else {
        var e = i + 1
        while (e < b.length && isWordByte(b(e))) e += 1
        // boundaries: symbol k = [starts(k), starts(k+1)); starts
        // carries a sentinel end so the last symbol needs no special
        // case. Starts as one boundary per character.
        val starts = new Array[Int](e - i + 1)
        var k = 0
        while (k <= e - i) { starts(k) = i + k; k += 1 }
        var nSyms = e - i
        var mi = 0
        while (mi < nMerges && nSyms > 1) {
          val a = leftBytes(mi); val bb = rightBytes(mi)
          // one left-to-right pass: adjacent (a, bb) fuse, consuming
          // both (so "aaa" under a+a yields [aa, a]) — training's own
          // convention, in-place (w <= r throughout)
          var r = 0; var w = 0
          while (r < nSyms) {
            if (r + 1 < nSyms &&
                symEq(b, starts(r), starts(r + 1), a) &&
                symEq(b, starts(r + 1), starts(r + 2), bb)) {
              starts(w) = starts(r); r += 2
            } else { starts(w) = starts(r); r += 1 }
            w += 1
          }
          starts(w) = e
          nSyms = w
          mi += 1
        }
        var s = 0
        while (s < nSyms) {
          if (n == out.length) {
            val g = new Array[Long](out.length * 2)
            System.arraycopy(out, 0, g, 0, out.length); out = g
          }
          val v = m.get(UTF8String.fromBytes(b, starts(s),
            starts(s + 1) - starts(s)))
          out(n) = if (v == null) 0L else v.longValue
          n += 1
          s += 1
        }
        i = e
      }
    }
    val res = new Array[Long](n)
    System.arraycopy(out, 0, res, 0, n)
    new GenericArrayData(res)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeEncodeIds", this)
    nullSafeCodeGen(ctx, ev, (t, m) =>
      s"${ev.value} = $ref.encodeBpe($t, $m);")
  }

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): BpeMergeEncodeIds = copy(text = l, gmap = r)
}

object VocabEncode {
  private def intArg(e: Expression): Int =
    e.eval().asInstanceOf[Number].intValue

  private[functions] def validate(minN: Int, maxN: Int): Unit =
    require(minN >= 1 && maxN >= minN,
      s"vp_encode needs 1 <= minN <= maxN (got $minN..$maxN)")

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vp_encode_ids", exprs => {
        val (lo, hi) = (intArg(exprs(2)), intArg(exprs(3)))
        validate(lo, hi)
        VocabEncodeIds(exprs.head, exprs(1), lo, hi)
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vp_encode_count", exprs => {
        val (lo, hi) = (intArg(exprs(2)), intArg(exprs(3)))
        validate(lo, hi)
        VocabEncodeCount(exprs.head, exprs(1), lo, hi)
      }, "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bpe_encode_ids", exprs => {
        def strs(e: Expression): Seq[String] =
          e.eval().asInstanceOf[ArrayData]
            .toObjectArray(StringType)
            .map(_.asInstanceOf[UTF8String].toString).toSeq
        val (l, r) = (strs(exprs(2)), strs(exprs(3)))
        require(l.length == r.length,
          "bpe_encode_ids: the merge lists (lefts, rights) must pair " +
            s"up 1:1 — got ${l.length} vs ${r.length}")
        BpeMergeEncodeIds(exprs.head, exprs(1), l, r)
      }, "built-in")
  }

  def vp_encode_ids(text: Column, gmap: Column, minN: Int,
      maxN: Int): Column =
    call_function("vp_encode_ids", text, gmap,
      org.apache.spark.sql.functions.lit(minN),
      org.apache.spark.sql.functions.lit(maxN))

  def vp_encode_count(text: Column, gmap: Column, minN: Int,
      maxN: Int): Column =
    call_function("vp_encode_count", text, gmap,
      org.apache.spark.sql.functions.lit(minN),
      org.apache.spark.sql.functions.lit(maxN))

  def bpe_encode_ids(text: Column, gmap: Column, lefts: Seq[String],
      rights: Seq[String]): Column =
    call_function("bpe_encode_ids", text, gmap,
      org.apache.spark.sql.functions.typedLit(lefts),
      org.apache.spark.sql.functions.typedLit(rights))
}
