package graft.tables

import org.apache.hadoop.fs.{FileStatus, Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.execution.datasources.{FileIndex, PartitionDirectory}
import org.apache.spark.sql.types.{Decimal, StructType}

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
  * Scale posture: pruning is O(files) driver-side interval checks on
  * metadata already in memory — no file I/O, no listing; at 100 TB
  * with clusterBy'd files a selective predicate drops most of the
  * scan before a single row is read.
  */
class GraftTableFileIndex(spark: SparkSession, table: GraftTable,
    version: Long) extends FileIndex {
  import GraftTable.FileStats

  private val snap = table.snapshotInfo(version)

  /** Schema the scan must use (commit-log authoritative — older files
    * from before an additive evolution surface nulls via parquet
    * schema clipping).
    */
  def dataSchema: StructType = snap.schema

  override def rootPaths: Seq[HPath] = Seq(new HPath(table.root.toUri))

  override def partitionSchema: StructType = StructType(Nil)

  override def refresh(): Unit = ()

  override def inputFiles: Array[String] = snap.files.toArray

  private lazy val statuses: Seq[(FileStatus, Option[FileStats], String)] =
    snap.files.map { p =>
      val f = new java.io.File(p)
      (new FileStatus(f.length, false, 1, 128L * 1024 * 1024,
        f.lastModified, new HPath(f.toURI)), snap.stats.get(p), p)
    }

  override lazy val sizeInBytes: Long = statuses.map(_._1.getLen).sum

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    // per-filter: partition-column-only predicates evaluate EXACTLY
    // against the commit log's partition tuple, everything else goes
    // through min/max interval pruning — one shared implementation
    // with the DML blast-radius pre-prune (StatsPruning)
    val kept = statuses.collect {
      case (st, stats, path)
        if dataFilters.forall(StatsPruning.keep(_, stats,
          snap.partValues.get(path), snap.partitionBy, spark)) => st
    }
    Seq(PartitionDirectory(InternalRow.empty, kept.toArray))
  }
}
