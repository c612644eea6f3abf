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

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    def metrics(c: String): Seq[Column] = {
      val dt = df.schema(c).dataType
      val isNum = dt.isInstanceOf[NumericType]
      val isStr = dt == StringType
      Seq(
        (count(lit(1)) - count(col(c))).as(s"null_count_$c"),
        countDistinct(col(c)).as(s"n_distinct_$c"),
        (if (isNum) min(col(c)).cast("double") else lit(null).cast("double")).as(s"min_num_$c"),
        (if (isNum) max(col(c)).cast("double") else lit(null).cast("double")).as(s"max_num_$c"),
        (if (isStr) min(col(c)) else lit(null).cast("string")).as(s"min_str_$c"),
        (if (isStr) max(col(c)) else lit(null).cast("string")).as(s"max_str_$c"))
    }
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap(metrics)
    val wide = df.agg(aggs.head, aggs.tail: _*)
    // one row of driver scalars → long format; no second scan
    val perCol = cols.map { c =>
      struct(lit(c).as("column"), col("n_rows"),
        col(s"null_count_$c").as("null_count"),
        col(s"n_distinct_$c").as("n_distinct"),
        col(s"min_num_$c").as("min_num"), col(s"max_num_$c").as("max_num"),
        col(s"min_str_$c").as("min_str"), col(s"max_str_$c").as("max_str"))
    }
    wide.select(explode(array(perCol: _*)).as("p")).select(col("p.*"))
  }

  /** Driver query: profile the orders fact table's key columns. */
  def profileOrders(spark: SparkSession, sfDir: String): DataFrame =
    profile(Tables.load(spark, sfDir, "orders"),
      Seq("o_orderkey", "o_custkey", "o_totalprice",
        "o_orderstatus", "o_orderpriority"))
}
