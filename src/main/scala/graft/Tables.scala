package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Canonical access to the testdata star schema plus shared
  * numeric-exactness helpers used by every operator.
  *
  * Money math policy (see SURVEY.md §5): all monetary aggregates are
  * computed over exact decimals (cast before the agg) and the final
  * result is cast back to double. Sums of doubles are
  * order-dependent under Spark's partitioned execution; sums of
  * decimals are exact and therefore deterministic under ANY
  * partitioning — which also makes them comparable bit-for-bit with
  * the DuckDB oracle at any scale factor.
  */
object Tables {
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Spread a CPU-heavy SCAN across the cluster when its natural file
    * parallelism is below the core count (optimization guide §2.5
    * "input skew: one huge unsplittable file … repartition
    * immediately after the read" / §6 input splits): the per-row cost
    * of the sketch operators (shingling, n-gram explosion, minhash /
    * simhash folds, PQ distance tables, perplexity models) is orders
    * of magnitude above scan I/O, so a byte-sized split policy
    * serializes the whole stage behind one small file — parquet
    * cannot split a single row group, so the file-source knobs
    * (`minPartitionNum`, `openCostInBytes`) cannot widen it either.
    * Scale-adaptive by construction: the threshold derives from the
    * session's core count and the scan's OWN split count, so a
    * production corpus (thousands of input splits) passes through
    * untouched — no shuffle is added at scale. Only for scan-shaped
    * frames: `.rdd.getNumPartitions` on a post-shuffle plan would
    * materialize AQE stages (i.e. run jobs) just to count partitions.
    */
  def spreadCpu(df: DataFrame): DataFrame = {
    val cores = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= cores) df else df.repartition(cores)
  }

  /** Exact decimal view of a money/measure column. Precision 12 keeps
    * triple products (price * (1-disc) * (1+tax)) within Spark's
    * 38-digit decimal cap with zero rounding.
    */
  def dec(c: Column): Column = c.cast(DecimalType(12, 4))

  /** Finalize an exact decimal aggregate back to double.
    *
    * The round(·,4) first drops the scale so the unscaled value fits
    * in 2^53: decimal→double is then the exactly-representable
    * n/10^4 in every engine. Without it, wide-scale decimals hit
    * Java's BigDecimal.doubleValue 1-ULP rounding quirk and differ
    * from the oracle in the last bit.
    */
  def asDouble(c: Column): Column = round(c, 4).cast("double")

  /** The engine-portable hash residue: 15 md5 hex chars (60 bits,
    * sign-safe in a long) parsed base-16 — equals DuckDB's
    * CAST('0x'||substr(md5(x),1,15) AS BIGINT). ONE spelling shared
    * by every operator whose oracle replays it (splits, sampling,
    * feature hashing, portable sketches); `offset` picks an
    * independent 60-bit slice of the digest.
    */
  def md5Residue(c: Column, offset: Int = 1): Column =
    conv(substring(md5(c), offset, 15), 16, 10).cast("long")

  /** events.ts has been emitted by the testdata generator under two
    * encodings across rounds: INT64(TIMESTAMP_NANOS) — surfaced as a
    * long via Sessions.nanosAsLong and normalized here — and naive
    * timestamp[us], which reads directly as TimestampType because
    * Sessions.tune pins inferTimestampNTZ off. Both normalize to the
    * same micros under the UTC session zone.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    val raw = load(spark, sfDir, "events")
    raw.schema("ts").dataType.typeName match {
      case "long" | "bigint" =>
        // integral div (ns→µs): `/` would be double division and
        // round up at .5µs instead of truncating like the oracle
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _ => raw
    }
  }
}
