package graft.tables

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** INCREMENTALLY MAINTAINED materialized aggregate view over a
  * GraftTable — the lakehouse "gold rollup kept fresh" pattern
  * (reference: the dashboard aggregates recomputed per run in
  * Instructor/02- Databricks_SQL_Scripts.sql, here maintained from
  * the change feed instead of rescanned).
  *
  * The view is `SELECT keys, SUM(value), COUNT(*) GROUP BY keys`,
  * held in its own GraftTable. `create` computes it once with a full
  * scan; every `refresh` reads ONLY the row-level change feed since
  * the last reflected source version and folds signed deltas in:
  * insert/update_postimage count +1/+value, delete/update_preimage
  * count −1/−value. SUM and COUNT are abelian-group aggregates, so
  * delta-folding is exact — the sums ride in DECIMAL(38,4), immune
  * to FP reordering, and a maintained view is bit-identical to a
  * recompute.
  *
  * Scale shape (100 TB): refresh cost is O(changed rows) + an
  * overwrite of the view itself (aggregate-sized, not fact-sized) —
  * a broad UPDATE feeds its blast radius through, a trickle append
  * costs a trickle. The reflected source version rides in the view
  * table's commit metrics, so the watermark is transactional with
  * the view data and survives restarts; a MERGE whose feed falls
  * back to ambiguous `upsert` tags (pre-CDC legacy commits) triggers
  * a full recompute rather than a wrong delta.
  */
class IncrementalMatView private (spark: SparkSession,
    val source: GraftTable, val mv: GraftTable,
    keys: Seq[String], valueCol: String) {
  import IncrementalMatView._

  private def dec38(c: org.apache.spark.sql.Column) =
    c.cast("decimal(12,4)").cast("decimal(38,4)")

  private def aggregateOf(df: DataFrame): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(sum(dec38(col(valueCol))).cast("decimal(38,4)").as("m_sum"),
        count(lit(1)).as("m_cnt"))

  /** Source version the view currently reflects. */
  def reflectedVersion: Long = mv.maxMetric(SourceVersionKey).getOrElse(-1L)

  /** Fold the change feed since [[reflectedVersion]] into the view.
    * Returns the source version now reflected (no-op if unchanged).
    */
  def refresh(): Long = {
    val from = reflectedVersion
    val to = source.latestVersion
    if (to <= from) return from
    val feed = source.changeFeed(from, to)
    // pre-CDC MERGE commits surface ambiguous 'upsert' rows (was it
    // an update or an insert?) — a signed delta would double-count;
    // recompute instead of guessing
    if (feed.where(col("_change_type") === "upsert").limit(1).count() > 0) {
      mv.overwrite(aggregateOf(source.snapshotAt(to)),
        Map(SourceVersionKey -> to))
      return to
    }
    val sign = when(col("_change_type")
        .isin("insert", "update_postimage"), 1)
      .when(col("_change_type").isin("delete", "update_preimage"), -1)
      .otherwise(0)
    val delta = feed
      .groupBy(keys.map(col): _*)
      .agg(sum(sign * dec38(col(valueCol))).cast("decimal(38,4)").as("m_sum"),
        sum(sign).cast("long").as("m_cnt"))
    val merged = mv.snapshot().unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("m_sum")).cast("decimal(38,4)").as("m_sum"),
        sum(col("m_cnt")).cast("long").as("m_cnt"))
      .where(col("m_cnt") =!= 0)
    mv.overwrite(merged, Map(SourceVersionKey -> to))
    to
  }

  /** The consumable view frame: group keys, the decimal-exact sum
    * surfaced as a double (rounded BEFORE the cast, the cross-engine
    * parity recipe), and the row count.
    */
  def view(): DataFrame =
    mv.snapshot().select(
      (keys.map(col) ++ Seq(
        round(col("m_sum"), 4).cast("double").as(s"sum_$valueCol"),
        col("m_cnt").as("n_rows"))): _*)
}

object IncrementalMatView {
  private val SourceVersionKey = "mvSourceVersion"

  /** Materialize the view at the source's current version (one full
    * scan) and return the maintained handle.
    */
  def create(spark: SparkSession, source: GraftTable, mvPath: String,
      keys: Seq[String], valueCol: String): IncrementalMatView = {
    val v = source.latestVersion
    val handle = new IncrementalMatView(spark, source, null, keys, valueCol)
    val initial = handle.aggregateOf(source.snapshotAt(v))
    // CREATE records no metrics — land the data through an OVERWRITE
    // so the watermark is transactional with it
    val mv = GraftTable.create(spark, mvPath, initial.limit(0))
    mv.overwrite(initial, Map(SourceVersionKey -> v))
    new IncrementalMatView(spark, source, mv, keys, valueCol)
  }

  /** Re-open an existing maintained view. */
  def load(spark: SparkSession, source: GraftTable, mvPath: String,
      keys: Seq[String], valueCol: String): IncrementalMatView =
    new IncrementalMatView(spark, source,
      GraftTable.load(spark, mvPath), keys, valueCol)
}
