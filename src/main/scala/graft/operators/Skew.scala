package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities (SURVEY.md §5).
  *
  * AQE's skew-join handling covers sort-merge joins at runtime; the
  * explicit salted join below is the static counterpart for the
  * hot-key case AQE can't split (e.g. a single key holding >1
  * partition's worth of rows on BOTH build and probe side, or
  * aggregations over a hot key).
  */
object Skew {

  /** Salted inner equi-join: the (large, skewed) left side scatters
    * each row to one of `nSalts` sub-keys via a deterministic hash
    * of the whole row; the (smaller) right side replicates each row
    * to ALL salts. The hot key's rows then spread over `nSalts`
    * shuffle partitions instead of one. Result set is identical to
    * the plain join (spec-checked).
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
      nSalts: Int = 8): DataFrame = {
    val salted = left.withColumn("__salt",
      pmod(xxhash64(struct(left.columns.map(col): _*)), lit(nSalts)).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  /** Two-phase (partial → final) aggregation for hot-key group-bys:
    * pre-aggregate on (key, salt), then combine per key. Spark's
    * hash aggregate already does map-side partials; this forces an
    * extra reduction tier for keys whose partials STILL overflow a
    * single reducer — the classic hierarchical combine.
    */
  def saltedSum(df: DataFrame, key: String, valueCol: Column,
      nSalts: Int = 8): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(xxhash64(struct(df.columns.map(col): _*)), lit(nSalts)).cast("int"))
    salted.groupBy(col(key), col("__salt"))
      .agg(sum(valueCol).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as("total"))
  }
}
