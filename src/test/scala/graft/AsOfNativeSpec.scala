package graft

import graft.plans.AsOfJoinNative
import org.apache.spark.sql.functions._

class AsOfNativeSpec extends SparkSpec {
  import spark.implicits._

  test("native as-of exec matches the composed union+window operator") {
    val ev = Tables.events(spark, sf)
      .select($"event_id", $"user_id", $"ts")
    val ord = Tables.load(spark, sf, "orders")
      .select($"o_custkey", $"o_orderdate".cast("timestamp").as("o_orderdate"))
      .dropDuplicates("o_custkey", "o_orderdate")
    val native = AsOfJoinNative.join(ev, ord,
        "user_id", "o_custkey", "ts", "o_orderdate")
      .select($"event_id", $"matched_o_orderdate")
    val composed = operators.TemporalJoins.asofEventsOrders(spark, sf)
      .select($"event_id", $"matched_orderdate".as("matched_o_orderdate"))
    assert(native.count() === ev.count())
    assert(native.except(composed).count() === 0)
    assert(composed.except(native).count() === 0)
  }

  test("native as-of plan contains the custom exec and shuffles on the key") {
    val ev = Tables.events(spark, sf).select($"event_id", $"user_id", $"ts")
    val ord = Tables.load(spark, sf, "orders")
      .select($"o_custkey", $"o_orderdate".cast("timestamp").as("o_orderdate"))
    val df = AsOfJoinNative.join(ev, ord,
      "user_id", "o_custkey", "ts", "o_orderdate")
    // sparkPlan: the physical plan before AQE's lazy wrapper hides it
    // nodeName strips the Exec suffix: the physical node prints "AsOfJoin"
    val plan = df.queryExecution.sparkPlan.toString
    assert(plan.startsWith("AsOfJoin "), plan.take(400))
    df.count() // materialize so EnsureRequirements' exchanges are final
    val finalPlan = df.queryExecution.executedPlan.toString
    assert(finalPlan.contains("hashpartitioning(user_id"), finalPlan.take(800))
  }

  test("left rows with no prior right row get null matches") {
    val l = Seq((1L, ts("2024-01-01 00:00:00")), (2L, ts("2024-01-05 00:00:00")))
      .toDF("k", "t")
    val r = Seq((1L, ts("2024-01-02 00:00:00"))).toDF("k", "rt")
    val out = AsOfJoinNative.join(l, r, "k", "k", "t", "rt")
      .select($"k", $"matched_rt").as[(Long, Option[java.sql.Timestamp])]
      .collect().toMap
    assert(out(1L).isEmpty)   // right row is AFTER the left time
    assert(out(2L).isEmpty)   // different key never matches k=2
  }

  test("wrong key/time types are rejected at the API, not mid-task") {
    val l = Seq((1, ts("2024-01-01 00:00:00"))).toDF("k", "t")   // Int key
    val r = Seq((1L, ts("2024-01-02 00:00:00"))).toDF("k", "rt")
    val e = intercept[IllegalArgumentException] {
      AsOfJoinNative.join(l, r, "k", "k", "t", "rt")
    }
    assert(e.getMessage.contains("must be LongType"))
    val l2 = Seq((1L, "2024-01-01")).toDF("k", "t")              // String time
    val e2 = intercept[IllegalArgumentException] {
      AsOfJoinNative.join(l2, r, "k", "k", "t", "rt")
    }
    assert(e2.getMessage.contains("must be TimestampType"))
  }

  test("NTZ time columns keep NTZ output type; mixed flavors rejected") {
    import org.apache.spark.sql.types.TimestampNTZType
    val l = Seq((1L, ts("2024-01-03 00:00:00"))).toDF("k", "t")
      .select($"k", $"t".cast(TimestampNTZType).as("t"))
    val r = Seq((1L, ts("2024-01-02 00:00:00"))).toDF("k", "rt")
    // mixed TZ/NTZ must be rejected (same micros, shifted semantics)
    val e = intercept[IllegalArgumentException] {
      AsOfJoinNative.join(l, r, "k", "k", "t", "rt")
    }
    assert(e.getMessage.contains("share one timestamp type"))
    // both NTZ: joins fine and the matched column STAYS NTZ
    val rNtz = r.select($"k", $"rt".cast(TimestampNTZType).as("rt"))
    val out = AsOfJoinNative.join(l, rNtz, "k", "k", "t", "rt")
    assert(out.schema("matched_rt").dataType === TimestampNTZType)
    assert(out.select($"matched_rt".cast("string")).as[String].collect()
      .toSeq === Seq("2024-01-02 00:00:00"))
  }

  test("null keys/times join nothing instead of misreading as 0") {
    val l = Seq(
      (Some(1L), Some(ts("2024-01-03 00:00:00"))),
      (None,     Some(ts("2024-01-03 00:00:00"))),  // null key
      (Some(1L), None))                              // null time
      .toDF("k", "t")
    val r = Seq(
      (Some(1L), Some(ts("2024-01-02 00:00:00"))),
      (None,     Some(ts("2024-01-01 00:00:00"))),  // null right key: never a match
      (Some(1L), None))                              // null right time: never a match
      .toDF("k", "rt")
    val out = AsOfJoinNative.join(l, r, "k", "k", "t", "rt")
      .select($"k", $"t", $"matched_rt").collect()
    assert(out.length === 3)
    val matchedFor1 = out.find(row => !row.isNullAt(0) && !row.isNullAt(1)).get
    assert(matchedFor1.getTimestamp(2) === ts("2024-01-02 00:00:00"))
    // the two null-side left rows emit null matches
    assert(out.count(_.isNullAt(2)) === 2)
  }

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)
}
