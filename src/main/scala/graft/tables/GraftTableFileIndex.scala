package graft.tables

import org.apache.hadoop.fs.{FileStatus, Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.{DataType, Decimal, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Scan-planning integration for GraftTable batch reads: a custom
  * [[FileIndex]] whose `listFiles` applies the commit log's per-file
  * min/max stats against the query's pushed data filters — so
  * data-skipping happens INSIDE Catalyst's planning (FileSourceStrategy
  * hands every scan's filters here), not as an out-of-band API the
  * caller must remember to use. This is the public Delta Lake
  * architecture (a log-backed file index under a parquet
  * HadoopFsRelation); SQL over a registered table
  * (`CREATE TABLE ... USING graft-table`, reference capability
  * Instructor/01-Fraud-Delta.py:116-134, 02- Databricks_SQL_Scripts
  * .sql:2-10) prunes files exactly like the Scala API.
  *
  * For tables CONVERTed from a Hive-partitioned layout the adopted
  * files do not physically contain the partition columns, so the
  * index surfaces a real `partitionSchema` and `listFiles` groups
  * files by their commit-log partition tuple, injecting the typed
  * values through [[PartitionDirectory]] rows — the same mechanism
  * Spark's own partition discovery uses, so the scan stays ONE
  * vectorized parquet read with partition pruning intact.
  *
  * Scale posture: pruning is O(files) driver-side interval checks on
  * metadata already in memory — no file I/O, no listing; at 100 TB
  * with clusterBy'd files a selective predicate drops most of the
  * scan before a single row is read.
  */
class GraftTableFileIndex(spark: SparkSession, table: GraftTable,
    version: Long) extends FileIndex {
  import GraftTable.FileStats

  private val snap = table.snapshotInfo(version)

  /** Absolute paths of files needing partition-value injection
    * (Hive-adopted, possibly via a shallow clone's absolute refs;
    * graft-written files are self-describing). Values come from the
    * commit log's partition tuples, so the path is only the SIGNAL —
    * and only counts when its trailing k=v keys are exactly the
    * table's partition columns (a root directory containing '='
    * must not flip a normal table into injection mode).
    */
  private val injected: Set[String] =
    if (snap.partitionBy.isEmpty) Set.empty
    else snap.files.filter(p =>
      GraftTable.hivePartSegments(p).map(_._1) == snap.partitionBy).toSet

  override val partitionSchema: StructType =
    if (injected.isEmpty) StructType(Nil)
    else StructType(snap.partitionBy.map(c => snap.schema(c)))

  /** Schema the scan must use (commit-log authoritative — older files
    * from before an additive evolution surface nulls via parquet
    * schema clipping). With partition-value injection active the
    * partition columns move out of the data schema: adopted files do
    * not contain them, and self-describing files' copies are simply
    * not requested from the reader.
    */
  def dataSchema: StructType =
    if (injected.isEmpty) snap.schema
    else StructType(snap.schema.fields.filterNot(f =>
      snap.partitionBy.contains(f.name)))

  override def rootPaths: Seq[HPath] = Seq(new HPath(table.root.toUri))

  override def refresh(): Unit = ()

  override def inputFiles: Array[String] = snap.files.toArray

  private lazy val statuses: Seq[(FileStatus, Option[FileStats], String)] =
    snap.files.map { p =>
      val f = new java.io.File(p)
      (new FileStatus(f.length, false, 1, 128L * 1024 * 1024,
        f.lastModified, new HPath(f.toURI)), snap.stats.get(p), p)
    }

  override lazy val sizeInBytes: Long = statuses.map(_._1.getLen).sum

  private def castPartValue(s: String, dt: DataType): Any =
    if (s == null || s == "__HIVE_DEFAULT_PARTITION__") null
    else Cast(Literal(UTF8String.fromString(s), StringType), dt,
      Some(spark.sessionState.conf.sessionLocalTimeZone)).eval()

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    // per-filter: partition-column-only predicates evaluate EXACTLY
    // against the commit log's partition tuple, everything else goes
    // through min/max interval pruning — one shared implementation
    // with the DML blast-radius pre-prune (StatsPruning). With a real
    // partitionSchema Spark routes partition predicates through
    // `partitionFilters`; both arms take the same exact path here.
    // generated-column partition pruning applies here too: a filter
    // on the generation INPUT prunes partitions the query never names
    val pushed = partitionFilters ++ dataFilters
    val (derivedFree, derivedTz) =
      try table.derivedGenConds(pushed, snap.partitionBy)
      catch { case _: Exception => (Nil, Nil) }
    val filters = pushed ++ derivedFree
    val kept = statuses.collect {
      case (st, stats, path)
        if filters.forall(StatsPruning.keep(_, stats,
            snap.partValues.get(path), snap.partitionBy, spark)) &&
          // zone-dependent derivations prune per file, only where the
          // recorded writer zone matches this session's
          (derivedTz.isEmpty || !table.fileZoneOk(stats) ||
            derivedTz.forall(StatsPruning.keep(_, stats,
              snap.partValues.get(path), snap.partitionBy, spark)))
        => (st, path)
    }
    if (injected.isEmpty)
      Seq(PartitionDirectory(InternalRow.empty, kept.map(_._1).toArray))
    else kept.groupBy { case (_, path) =>
        snap.partitionBy.map(c =>
          snap.partValues.getOrElse(path, Map.empty).getOrElse(c, null))
      }.map { case (tuple, fs) =>
        val row = InternalRow.fromSeq(
          snap.partitionBy.zip(tuple).map { case (c, v) =>
            castPartValue(v, snap.schema(c).dataType) })
        PartitionDirectory(row, fs.map(_._1).toArray)
      }.toSeq
  }
}
