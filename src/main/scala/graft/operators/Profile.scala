package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/** Table PROFILING (the lakehouse "data profile" / deequ-style
  * column statistics pane): per-column null count, exact distinct
  * count, and typed min/max, in long format. ALL columns profile in
  * ONE aggregate pass — a single scan of the table — then the one
  * result row unpivots driver-side into the long frame. Numeric
  * bounds surface as doubles and string bounds as strings so no
  * cross-engine number formatting is involved.
  *
  * Scale shape: COUNT/MIN/MAX are partial-aggregable; the n exact
  * COUNT(DISTINCT)s plan as one Expand (n+1 projections of the same
  * scan) — still a single pass over storage. At 100 TB swap them for
  * approx_count_distinct (HLL++), which drops the Expand too; the
  * frame shape is unchanged.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame =
    profile(df, cols, approxDistinct = false)

  /** The 100 TB variant SURVEY §A promises: `approxDistinct = true`
    * swaps the n exact COUNT(DISTINCT)s for approx_count_distinct
    * (HLL++, default rsd 5%). The Expand the exact plan needs (n+1
    * projections of the scan) disappears — every metric becomes a
    * plain partial-aggregable one-pass aggregate, so profiling cost
    * stops growing with the distinct-column count. Frame shape is
    * identical; only `n_distinct` carries the HLL estimate.
    */
  def profile(df: DataFrame, cols: Seq[String],
      approxDistinct: Boolean, rsd: Double = 0.05): DataFrame = {
    // Metric aliases are INDEX-based (m0_null, m1_null, …), never
    // embedding the raw column name: re-referencing an alias through
    // col() parses dots/backticks as nested-field access, so a name
    // like "a.b" (or the same column listed twice) would break the
    // rebind below. The data column itself is fetched positionally
    // from the input schema for the same reason.
    def metrics(c: String, i: Int): Seq[Column] = {
      val dt = df.schema(c).dataType
      val isNum = dt.isInstanceOf[NumericType]
      val isStr = dt == StringType
      val in = df(s"`${c.replace("`", "``")}`")
      Seq(
        (count(lit(1)) - count(in)).as(s"m${i}_null"),
        (if (approxDistinct) approx_count_distinct(in, rsd)
         else countDistinct(in)).as(s"m${i}_distinct"),
        (if (isNum) min(in).cast("double") else lit(null).cast("double")).as(s"m${i}_min_num"),
        (if (isNum) max(in).cast("double") else lit(null).cast("double")).as(s"m${i}_max_num"),
        (if (isStr) min(in) else lit(null).cast("string")).as(s"m${i}_min_str"),
        (if (isStr) max(in) else lit(null).cast("string")).as(s"m${i}_max_str"))
    }
    val aggs = count(lit(1)).as("n_rows") +:
      cols.zipWithIndex.flatMap { case (c, i) => metrics(c, i) }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // one row of driver scalars → long format; no second scan
    val perCol = cols.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("column"), col("n_rows"),
        col(s"m${i}_null").as("null_count"),
        col(s"m${i}_distinct").as("n_distinct"),
        col(s"m${i}_min_num").as("min_num"), col(s"m${i}_max_num").as("max_num"),
        col(s"m${i}_min_str").as("min_str"), col(s"m${i}_max_str").as("max_str"))
    }
    wide.select(explode(array(perCol: _*)).as("p")).select(col("p.*"))
  }

  /** Driver query: profile the orders fact table's key columns. */
  def profileOrders(spark: SparkSession, sfDir: String): DataFrame =
    profile(Tables.load(spark, sfDir, "orders"),
      Seq("o_orderkey", "o_custkey", "o_totalprice",
        "o_orderstatus", "o_orderpriority"))

  /** HLL++ profile of the same columns — the shape that runs at
    * 100 TB (estimate error spec-bounded against the exact pane).
    */
  def profileOrdersApprox(spark: SparkSession, sfDir: String): DataFrame =
    profile(Tables.load(spark, sfDir, "orders"),
      Seq("o_orderkey", "o_custkey", "o_totalprice",
        "o_orderstatus", "o_orderpriority"), approxDistinct = true)
}
