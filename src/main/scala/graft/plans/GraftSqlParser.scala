package graft.plans

import graft.tables.GraftSql
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression}
import org.apache.spark.sql.catalyst.parser.{ParseException, ParserInterface}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.StructType

/** Parser injection (Delta's approach to its SQL surface): with
  * `GraftExtensions` installed, PLAIN `spark.sql(...)` understands
  * graft-table DML (`DELETE`/`UPDATE`/`MERGE INTO`), the table
  * utilities (`DESCRIBE HISTORY`, `OPTIMIZE [ZORDER BY]`, `VACUUM`,
  * `RESTORE`), and `SELECT ... VERSION AS OF` — no `GraftSql.sql`
  * wrapper needed. Statements whose target is NOT a registered
  * graft table fall through to the delegate parser untouched, so
  * the session's normal SQL is unaffected.
  */
class GraftSqlParser(spark: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan = {
    // utility statements have no Spark grammar — regex-dispatch first,
    // but only claim them when the target IS a graft table
    if (GraftSql.isUtilityStatement(sqlText) &&
        GraftSql.utilityTargetIsGraft(spark, sqlText))
      return GraftSqlCommand(sqlText)
    val plan = delegate.parsePlan(sqlText)
    plan match {
      case d: DeleteFromTable if isGraft(d.table) => GraftSqlCommand(sqlText)
      case u: UpdateTable if isGraft(u.table) => GraftSqlCommand(sqlText)
      case m: MergeIntoTable if isGraft(m.targetTable) => GraftSqlCommand(sqlText)
      case ins: InsertIntoStatement if isGraft(ins.table) =>
        GraftSqlCommand(sqlText)
      case p if p.collectFirst({
          case t: org.apache.spark.sql.catalyst.analysis.RelationTimeTravel
            if isGraft(t.relation) => t
        }).isDefined =>
        GraftSql.substituteTimeTravel(spark, p)
      case other => other
    }
  }

  private def isGraft(plan: LogicalPlan): Boolean =
    GraftSql.tryResolveTarget(spark, plan)

  // ---- pure delegation --------------------------------------------------
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
}

/** Runnable wrapper executing a graft SQL statement at query time.
  * Output rows/schema come from the dispatcher (DESCRIBE HISTORY has
  * a fixed schema; DML and utilities return nothing).
  */
case class GraftSqlCommand(sqlText: String) extends LeafRunnableCommand {
  private val resultSchema = GraftSql.resultSchema(sqlText)

  override val output: Seq[Attribute] = resultSchema
    .map(org.apache.spark.sql.catalyst.types.DataTypeUtils.toAttributes)
    .getOrElse(Nil)

  override def run(sparkSession: SparkSession): Seq[org.apache.spark.sql.Row] =
    if (resultSchema.isDefined)
      GraftSql.sql(sparkSession, sqlText).collect().toSeq
    else { GraftSql.sql(sparkSession, sqlText); Nil }
}
