package graft.tables

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, XxHash64}
import org.apache.spark.sql.functions._

/** Per-file BLOOM FILTER INDEX (Delta's bloom-filter index analog)
  * for point-lookup pruning on declared columns
  * (`graft.bloom.columns` in TBLPROPERTIES).
  *
  * Min/max stats cannot prune a point predicate when every file's key
  * range overlaps (unclustered ingest order); a per-file bloom over
  * the declared columns answers "can this file contain THIS value"
  * at sub-range precision, which is what a 100 TB point DELETE/
  * UPDATE/MERGE needs. Filters live as SIDECAR files next to each
  * data file (`<file>.bloom` — the commit log stays O(metadata);
  * lifecycle follows the data file through VACUUM; shallow clones
  * resolve them through the same absolute path as the data), built by
  * ONE Spark job per write over just the committed files.
  *
  * Hash-domain contract: the WRITE side buckets rows with the
  * codegen'd `xxhash64(seed, col)` expression; the READ side
  * evaluates the SAME Catalyst expression over the pushed literal —
  * bit positions agree by construction, for every type, forever. A
  * missing sidecar, undeclared column, unparseable JSON or saturated
  * filter all answer "may contain" — pruning is only ever
  * conservative.
  */
private[tables] object BloomIndex {
  /** Four independent hash functions via distinct seed prefixes. */
  private val seeds = Seq(0x5eed0001, 0x5eed0002, 0x5eed0003, 0x5eed0004)

  val defaultBits = 1 << 17 // 16 KB/sidecar/col; ~10 bits/key at 13k keys

  private def sidecar(dataFileAbs: String): Path =
    Paths.get(dataFileAbs + ".bloom")

  /** file:-scheme-tolerant local path (matches `_metadata.file_path`
    * spelling back to plain paths).
    */
  private def plain(p: String): String =
    if (p.startsWith("file:"))
      try new java.net.URI(p).getPath match { case null => p; case x => x }
      catch { case _: java.net.URISyntaxException => p }
    else p

  /** Build sidecars for `filesAbs` over physical columns `cols`:
    * one job — explode each row into its k bucket ids, OR the bucket
    * bits into 64-bit words per (file, word), assemble driver-side.
    * Null values set no bits (null never equi-matches).
    */
  def write(spark: SparkSession, filesAbs: Seq[String],
      cols: Seq[String], mBits: Int): Unit = {
    if (filesAbs.isEmpty || cols.isEmpty) return
    val raw = spark.read.parquet(filesAbs: _*)
    // a declared column absent from these files (partition-injected,
    // typo'd) builds no filter — selecting it would fail analysis
    val use = cols.filter(raw.columns.contains)
    if (use.isEmpty) return
    val df = raw.select(col("_metadata.file_path").as("__f") +:
      use.map(c => col(s"`$c`")): _*)
    val byFile = scala.collection.mutable.Map
      .empty[String, scala.collection.mutable.Map[String, Array[Long]]]
    use.foreach { c =>
      val buckets = seeds.map(s =>
        pmod(xxhash64(lit(s), col(s"`$c`")), lit(mBits.toLong)))
      val words = df.where(col(s"`$c`").isNotNull)
        .select(col("__f"), explode(array(buckets: _*)).as("b"))
        .select(col("__f"), (col("b") / 64).cast("int").as("w"),
          expr("shiftleft(1L, int(b % 64))").as("bit"))
        .groupBy(col("__f"), col("w"))
        .agg(expr("bit_or(bit)").as("bits"))
        .collect()
      words.foreach { r =>
        val f = plain(r.getString(0))
        val arr = byFile.getOrElseUpdate(f,
            scala.collection.mutable.Map.empty)
          .getOrElseUpdate(c, new Array[Long](mBits / 64))
        arr(r.getInt(1)) |= r.getLong(2)
      }
    }
    val wanted = filesAbs.map(plain).toSet
    byFile.foreach { case (f, colsMap) =>
      if (wanted.contains(f)) {
        val body = colsMap.map { case (c, arr) =>
          "\"" + c + "\":\"" + arr.map(l => f"$l%016x").mkString + "\""
        }.mkString(",")
        Files.writeString(sidecar(f),
          s"""{"bits":$mBits,"cols":{$body}}""")
        cache.remove(f) // a rebuild replaces any memoized parse
      }
    }
  }

  // sidecars are immutable once written (data files never change);
  // memoize parses so repeated DML planning re-reads nothing. A
  // MISSING sidecar is never memoized — an index built later
  // (rebuildBloomIndex, a property declared mid-life) must become
  // visible to the session that already probed and found nothing.
  private val cache = new java.util.concurrent.ConcurrentHashMap[
    String, Option[(Int, Map[String, Array[Long]])]]()

  private def load(dataFileAbs: String)
      : Option[(Int, Map[String, Array[Long]])] = {
    if (cache.size > 100000) cache.clear() // unbounded-growth guard
    val p = sidecar(dataFileAbs)
    if (!Files.exists(p)) return None
    cache.computeIfAbsent(dataFileAbs, { _ =>
      try {
        val s = Files.readString(p)
        """"bits":(\d+)""".r.findFirstMatchIn(s)
          .map(_.group(1).toInt).flatMap { bits =>
            val cols = """"([^"]+)":"([0-9a-f]+)"""".r.findAllMatchIn(s)
              .filter(_.group(1) != "bits")
              .map(m => m.group(1) -> m.group(2).grouped(16)
                .map(java.lang.Long.parseUnsignedLong(_, 16)).toArray)
              .toMap
            if (cols.values.exists(_.length != bits / 64)) None
            else Some((bits, cols))
          }
      } catch { case scala.util.control.NonFatal(_) => None }
    })
  }

  /** Bucket ids of a pushed literal under the write-side hash — the
    * literal node is reused verbatim so the hashed bytes are exactly
    * the column's internal representation.
    */
  private def bucketsOf(lit0: Literal, mBits: Int): Seq[Int] =
    seeds.map { s =>
      val h = XxHash64(Seq(Literal(s), lit0), 42L)
        .eval(InternalRow.empty).asInstanceOf[Long]
      val m = h % mBits
      (if (m < 0) m + mBits else m).toInt
    }

  /** Can `dataFileAbs` contain `value` in column `col`? Missing or
    * damaged index answers true.
    */
  def mayContain(dataFileAbs: String, colName: String,
      value: Literal): Boolean =
    load(dataFileAbs) match {
      case Some((bits, cols)) => cols.get(colName) match {
        case Some(arr) => bucketsOf(value, bits).forall(b =>
          (arr(b / 64) & (1L << (b % 64))) != 0L)
        case None => true
      }
      case None => true
    }

  /** Point conjuncts a bloom can refute: `col = lit` and
    * `col IN (lits)` over indexed columns. Returns the files that MAY
    * match every such conjunct (non-point shapes are ignored here —
    * the stats layer already handled them).
    */
  def prune(conds: Seq[Expression], indexed: Set[String],
      filesAbs: Seq[String]): Seq[String] = {
    import org.apache.spark.sql.catalyst.expressions._
    val points: Seq[(String, Seq[Literal])] = conds.collect {
      case EqualTo(a: AttributeReference, l: Literal)
        if indexed.contains(a.name) && l.value != null => (a.name, Seq(l))
      case EqualTo(l: Literal, a: AttributeReference)
        if indexed.contains(a.name) && l.value != null => (a.name, Seq(l))
      case In(a: AttributeReference, vs)
        if indexed.contains(a.name) && vs.nonEmpty &&
          vs.forall(v => v.isInstanceOf[Literal] &&
            v.asInstanceOf[Literal].value != null) =>
        (a.name, vs.map(_.asInstanceOf[Literal]))
    }
    if (points.isEmpty) filesAbs
    else filesAbs.filter(f => points.forall { case (c, lits) =>
      lits.exists(l => mayContain(f, c, l))
    })
  }
}
