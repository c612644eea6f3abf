package graft.plans

import graft.functions.WordShingles
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule (the `Rule[LogicalPlan]` rung of the extension
  * ladder): rewrites the guarded composed-HOF shingle spelling
  *
  * {{{
  *   CASE WHEN size(w) >= n
  *     THEN transform(sequence(0, size(w) - n),
  *                    i -> concat_ws(' ', slice(w, i + 1, n)))
  *     ELSE array() END
  * }}}
  *
  * into the fused native [[graft.functions.WordShingles]] kernel —
  * the same rewrite-to-native-operator shape engines like Photon and
  * Gluten apply, expressed as a standard injected optimizer rule.
  * The HOF form evaluates its lambda interpreted per element; the
  * kernel is one tight loop per row (measured ~3 s/pass at sf0.1).
  * Semantics-preserving by construction: only the GUARDED pattern is
  * matched (identical output incl. the short-doc case), and the
  * rewrite strictly shrinks the tree so the rule is idempotent.
  */
object ShingleRewriteRule extends Rule[LogicalPlan] {

  private object EmptyStringArray {
    def unapply(e: Expression): Boolean = e match {
      case CreateArray(Seq(), _) => true
      case Literal(arr: org.apache.spark.sql.catalyst.util.ArrayData, ArrayType(_, _))
        if arr.numElements() == 0 => true
      case _ => false
    }
  }

  private object IntLit {
    def unapply(e: Expression): Option[Int] = e match {
      case Literal(v: Int, IntegerType) => Some(v)
      case _ => None
    }
  }

  private def spaceLit(e: Expression): Boolean = e match {
    case Literal(s: UTF8String, StringType) => s.toString == " "
    case _ => false
  }

  private def rewrite(e: Expression): Expression = e transformUp {
    case CaseWhen(
        Seq((GreaterThanOrEqual(Size(w1, _), IntLit(n1)),
          ArrayTransform(
            Sequence(IntLit(0), Subtract(Size(w2, _), IntLit(n2), _), None, _),
            LambdaFunction(
              ConcatWs(Seq(sep,
                Slice(w3, Add(lv1: NamedLambdaVariable, IntLit(1), _), IntLit(n3)))),
              Seq(lv2: NamedLambdaVariable), _)))),
        Some(EmptyStringArray()))
      if n1 == n2 && n2 == n3 && spaceLit(sep) &&
        lv1.exprId == lv2.exprId &&
        w1.semanticEquals(w2) && w2.semanticEquals(w3) &&
        // WordShingles reproduces concat_ws's skip-null semantics, so
        // any string-array input qualifies regardless of containsNull
        (w1.dataType match {
          case ArrayType(StringType, _) => true; case _ => false
        }) =>
      // NULL-input semantics differ: the guarded CASE yields an EMPTY
      // array for a NULL input array (size(NULL) >= n is NULL → the
      // ELSE array() branch fires), while WordShingles is
      // null-intolerant and returns NULL. For nullable inputs the
      // rewrite must keep the empty-array-on-null behavior — the rule
      // is injected globally, so "close enough" would silently change
      // user results (e.g. size(sh) flipping 0 → -1).
      if (w1.nullable)
        If(IsNull(w1),
          Literal(new org.apache.spark.sql.catalyst.util.GenericArrayData(
            Array.empty[Any]), ArrayType(StringType, containsNull = false)),
          WordShingles(w1, n1))
      else WordShingles(w1, n1)
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions { case e => rewrite(e) }
}
