package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{NumericType, StringType}

/** Table PROFILING (the lakehouse "data profile" / deequ-style
  * column statistics pane): per-column null count, exact distinct
  * count, and typed min/max, in long format. One aggregate pass per
  * column over a single cached scan; numeric bounds surface as
  * doubles and string bounds as strings so no cross-engine number
  * formatting is involved.
  *
  * Scale shape: each profile column is a pair of partial-aggregable
  * metrics (COUNT/MIN/MAX) plus one exact COUNT(DISTINCT) — at
  * 100 TB swap the latter for approx_count_distinct (HLL++) per
  * column; the frame shape is unchanged.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val src = df
    val parts = cols.map { c =>
      val dt = src.schema(c).dataType
      val isNum = dt.isInstanceOf[NumericType]
      val isStr = dt == StringType
      src.agg(
        count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(col(c))).as("null_count"),
        countDistinct(col(c)).as("n_distinct"),
        (if (isNum) min(col(c)).cast("double") else lit(null).cast("double")).as("min_num"),
        (if (isNum) max(col(c)).cast("double") else lit(null).cast("double")).as("max_num"),
        (if (isStr) min(col(c)) else lit(null).cast("string")).as("min_str"),
        (if (isStr) max(col(c)) else lit(null).cast("string")).as("max_str"))
        .select(lit(c).as("column"), col("n_rows"), col("null_count"),
          col("n_distinct"), col("min_num"), col("max_num"),
          col("min_str"), col("max_str"))
    }
    parts.reduce(_ unionByName _)
  }

  /** Driver query: profile the orders fact table's key columns. */
  def profileOrders(spark: SparkSession, sfDir: String): DataFrame =
    profile(Tables.load(spark, sfDir, "orders"),
      Seq("o_orderkey", "o_custkey", "o_totalprice",
        "o_orderstatus", "o_orderpriority"))
}
