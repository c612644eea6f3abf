package graft

import org.apache.spark.sql.SparkSession

/** Session factory for specs and ad-hoc mains. Verify/Bench build
  * their own sessions (driver contract) but share these conf knobs
  * via `tune`.
  */
object Sessions {
  /** Confs every graft session wants, applied to an existing builder. */
  def tune(b: SparkSession.Builder, shufflePartitions: Int): SparkSession.Builder =
    b.config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
      // events.parquet carries INT64(TIMESTAMP_NANOS); Spark's reader
      // rejects nanos unless surfaced as long (normalized in Tables.events)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // The testdata generator emits naive timestamp[us]
      // (isAdjustedToUTC=false), which Spark 4 would infer as
      // TIMESTAMP_NTZ — a type watermarks/unix_micros reject. Pin
      // Spark-3-style inference: every timestamp column reads as
      // TimestampType, micros-identical under the UTC session TZ, and
      // scan-level filter pushdown stays intact (no cast in the plan).
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      // INT96 (Spark's legacy default for TimestampType) writes no
      // usable footer min/max, which would blind the commit-log stats
      // layer (data skipping, DML blast radius, conflict envelopes)
      // on every timestamp column. INT64 micros is the modern parquet
      // spelling and the same domain Catalyst literals use.
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")

  def local(cores: Int = 4, app: String = "graft"): SparkSession = {
    val s = tune(
      SparkSession.builder().master(s"local[$cores]").appName(app),
      math.max(cores, 4)).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
