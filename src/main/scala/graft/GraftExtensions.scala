package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Builder-time registration of every graft Catalyst extension:
  *
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions)...
  *   // or spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * Injects the native as-of join strategy, the ShingleRewriteRule
  * optimizer rule, and the custom functions (rolling_hash /
  * word_shingles / vec_* scalars, top_k_items aggregate). The
  * session-scoped alternatives (`AsOfJoinNative.register`,
  * `RollingHash.register`, `WordShingles.register`,
  * `VectorExprs.register`, `TopKItems.register`) do the same against
  * a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    // plain spark.sql(...) gains the graft-table SQL surface: DML,
    // DESCRIBE HISTORY / OPTIMIZE / VACUUM / RESTORE, VERSION AS OF
    e.injectParser((session, delegate) =>
      new graft.plans.GraftSqlParser(session, delegate))
    // optimizer rule: fuse the composed-HOF shingle spelling into the
    // native WordShingles kernel (Photon/Gluten-style replacement)
    e.injectOptimizerRule(_ => graft.plans.ShingleRewriteRule)
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("rolling_hash"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.RollingHash].getName, "rolling_hash"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.RollingHash(exprs.head)))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("word_shingles"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.WordShingles].getName, "word_shingles"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.WordShingles(exprs.head,
          exprs(1).eval().asInstanceOf[Number].intValue)))
    e.injectFunction((
      new org.apache.spark.sql.catalyst.FunctionIdentifier("top_k_items"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[graft.functions.TopKItemsAgg].getName, "top_k_items"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 3,
          s"top_k_items(col, k, capacity) takes 3 arguments, got ${exprs.length}")
        graft.functions.TopKItemsAgg(exprs(0),
          exprs(1).eval().asInstanceOf[Number].intValue,
          exprs(2).eval().asInstanceOf[Number].intValue).toAggregateExpression()
      }))
  }
}
