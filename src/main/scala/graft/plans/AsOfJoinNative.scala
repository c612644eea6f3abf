package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftPlans, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.types.TimestampType

/** The full custom-operator extension ladder (SURVEY.md §2/§5,
  * builder option (c)): a native AS-OF JOIN as
  * LogicalPlan → Strategy → SparkPlan.
  *
  * Physical algorithm: both sides hash-partitioned on the key
  * (`requiredChildDistribution`) and sorted by (key, time)
  * (`requiredChildOrdering`) — Spark inserts the exchanges/sorts —
  * then a single streaming merge pass per partition emits each left
  * row with the latest right time ≤ its own. One shuffle per side,
  * O(1) state, no buffering of either side: the shape that holds at
  * 100 TB. The composed union+window form
  * (operators.TemporalJoins.asofEventsOrders) is the Catalyst-
  * built-ins expression of the same semantics; this operator is the
  * extension-point demonstration and drops the union materialization.
  *
  * Constraints (by construction, spec'd): integral key columns,
  * timestamp time columns, right side deduplicated per (key, time)
  * for the emitted value to be deterministic.
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftKey: String, rightKey: String,
    leftTime: String, rightTime: String,
    matchedAttr: AttributeReference) extends BinaryNode {
  override def output: Seq[Attribute] = left.output :+ matchedAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(matchedAttr :: Nil)
  // keys/times are referenced by NAME, so declare them as references —
  // otherwise ColumnPruning sees an expressionless node and prunes the
  // right child to zero columns
  override def references: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(
      left.output.filter(a => a.name == leftKey || a.name == leftTime) ++
        right.output.filter(a => a.name == rightKey || a.name == rightTime))
  override protected def withNewChildrenInternal(
      l: LogicalPlan, r: LogicalPlan): AsOfJoinPlan = copy(left = l, right = r)
}

case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: String, rightKey: String,
    leftTime: String, rightTime: String,
    matchedAttr: AttributeReference) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output :+ matchedAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(matchedAttr :: Nil)

  private def attr(side: SparkPlan, name: String) =
    side.output.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(s"column $name not in ${side.output.map(_.name)}"))

  override def requiredChildDistribution: Seq[Distribution] = Seq(
    ClusteredDistribution(Seq(attr(left, leftKey))),
    ClusteredDistribution(Seq(attr(right, rightKey))))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(attr(left, leftKey), org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(attr(left, leftTime), org.apache.spark.sql.catalyst.expressions.Ascending)),
    Seq(SortOrder(attr(right, rightKey), org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(attr(right, rightTime), org.apache.spark.sql.catalyst.expressions.Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyIdx = left.output.indexWhere(_.name == leftKey)
    val lTimeIdx = left.output.indexWhere(_.name == leftTime)
    val rKeyIdx = right.output.indexWhere(_.name == rightKey)
    val rTimeIdx = right.output.indexWhere(_.name == rightTime)
    val out = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val proj = UnsafeProjection.create(out, out)
      val matched = new GenericInternalRow(1)
      val joined = new JoinedRow()
      // single forward pass: rows sorted by (key, time) on both sides.
      // Null right keys/times can never be the as-of match (SQL null
      // semantics) — skip them; ascending sort puts them first, so
      // this drains once per partition.
      def nextRight(): InternalRow = {
        while (rIter.hasNext) {
          val r = rIter.next()
          if (!r.isNullAt(rKeyIdx) && !r.isNullAt(rTimeIdx)) return r.copy()
        }
        null
      }
      var rRow: InternalRow = nextRight()
      var lastKey = Long.MinValue
      var lastTime = Long.MinValue
      var hasLast = false
      lIter.map { lRow =>
        if (lRow.isNullAt(lKeyIdx) || lRow.isNullAt(lTimeIdx)) {
          // null key/time joins nothing — emit the row with a null match
          matched.setNullAt(0)
          proj(joined(lRow, matched))
        } else {
        val k = lRow.getLong(lKeyIdx)
        val t = lRow.getLong(lTimeIdx)
        if (hasLast && lastKey != k) hasLast = false
        // advance right while its (key,time) <= (k,t)
        var advancing = true
        while (advancing && rRow != null) {
          val rk = rRow.getLong(rKeyIdx)
          val rt = rRow.getLong(rTimeIdx)
          if (rk < k || (rk == k && rt <= t)) {
            if (rk == k) { lastKey = rk; lastTime = rt; hasLast = true }
            rRow = nextRight()
          } else advancing = false
        }
        if (hasLast && lastKey == k) matched.update(0, lastTime)
        else matched.setNullAt(0)
        proj(joined(lRow, matched))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      l: SparkPlan, r: SparkPlan): AsOfJoinExec = copy(left = l, right = r)
}

/** Planner strategy mapping the logical node to the exec. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, m) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, m) :: Nil
    case _ => Nil
  }
}

object AsOfJoinNative {
  /** Register the strategy once per session (idempotent). */
  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy

  /** left AS-OF JOIN right: every left row gains
    * `matched_<rightTime>` = max right time ≤ its own for the same
    * key (null when none).
    */
  def join(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String): DataFrame = {
    val spark = left.sparkSession
    register(spark)
    // eager name AND type validation: the exec reads keys/times via
    // getLong, so an IntegerType key would ClassCastException (or
    // silently misread) deep inside a task — fail at the API instead
    def check(df: DataFrame, n: String,
        want: Seq[org.apache.spark.sql.types.DataType], role: String): Unit = {
      val f = df.schema.fields.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(
          s"as-of join column '$n' not found in [${df.columns.mkString(", ")}]"))
      require(want.contains(f.dataType),
        s"as-of join $role column '$n' must be ${want.mkString(" or ")}, " +
          s"got ${f.dataType} (cast it before joining)")
    }
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    // both timestamp flavors store micros as a Long internally
    check(left, leftKey, Seq(LongType), "key")
    check(right, rightKey, Seq(LongType), "key")
    check(left, leftTime, Seq(TimestampType, TimestampNTZType), "time")
    check(right, rightTime, Seq(TimestampType, TimestampNTZType), "time")
    // the two time columns must agree on flavor: comparing NTZ micros
    // against session-TZ micros shifts semantics silently
    val ltType = left.schema(leftTime).dataType
    val rtType = right.schema(rightTime).dataType
    require(ltType == rtType,
      s"as-of join time columns must share one timestamp type, got " +
        s"'$leftTime': $ltType vs '$rightTime': $rtType (cast one side)")
    // the matched column keeps the RIGHT time column's actual type —
    // declaring TimestampType for an NTZ input would relabel the same
    // micros into session-timezone display/comparison semantics
    val matched = AttributeReference(s"matched_$rightTime", rtType)()
    val plan = AsOfJoinPlan(
      left.queryExecution.analyzed, right.queryExecution.analyzed,
      leftKey, rightKey, leftTime, rightTime, matched)
    GraftPlans.ofRows(spark, plan)
  }
}
