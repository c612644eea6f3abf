package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native codegen'd vector kernels over Array[Float] columns — the
  * hot path of every similarity operator. Spark's array
  * higher-order functions (zip_with + aggregate) evaluate their
  * lambdas interpreted, outside whole-stage codegen; these
  * expressions compile to a tight primitive loop instead.
  *
  * Accumulation is double precision, strictly left-to-right — the
  * SAME op sequence as the HOF formulation and the DuckDB oracle's
  * sequential list_sum, so results stay bit-identical (spec-checked)
  * while the loop runs at codegen speed.
  */

/** Analysis-time input validation shared by the vector kernels: the
  * unsafe getFloat/getLong readers would silently misread any other
  * element width (e.g. array<double> read 4 bytes at a time).
  */
private[functions] object VecTypeCheck {
  def arrays(elem: DataType, kinds: Seq[(String, DataType)]): TypeCheckResult = {
    kinds.collectFirst {
      case (name, t) if !t.isInstanceOf[ArrayType] ||
          t.asInstanceOf[ArrayType].elementType != elem =>
        TypeCheckResult.TypeCheckFailure(
          s"$name must be array<${elem.simpleString}>, got ${t.simpleString}")
    }.getOrElse(TypeCheckResult.TypeCheckSuccess)
  }
}

case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    VecTypeCheck.arrays(FloatType,
      Seq(("left", left.dataType), ("right", right.dataType)))
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0; var i = 0
    while (i < n) { acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    acc
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName: several vector kernels commonly share one generated
      // function (vec_cosine = dot + 2 norms) — fixed names collide and
      // Janino's failure silently drops the whole projection to the
      // interpreted path
      val n = ctx.freshName("vdN"); val acc = ctx.freshName("vdAcc")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

case class VecNorm(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    VecTypeCheck.arrays(FloatType, Seq(("input", child.dataType)))
  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var acc = 0.0; var i = 0
    while (i < x.numElements()) {
      val v = x.getFloat(i).toDouble; acc += v * v; i += 1
    }
    math.sqrt(acc)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val acc = ctx.freshName("vnAcc"); val v = ctx.freshName("vnV")
      val i = ctx.freshName("i")
      s"""
         |double $acc = 0.0;
         |for (int $i = 0; $i < $a.numElements(); $i++) {
         |  double $v = (double) $a.getFloat($i);
         |  $acc += $v * $v;
         |}
         |${ev.value} = java.lang.Math.sqrt($acc);
       """.stripMargin
    })
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

case class VecL2Sq(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): TypeCheckResult =
    VecTypeCheck.arrays(FloatType,
      Seq(("left", left.dataType), ("right", right.dataType)))
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0; var i = 0
    while (i < n) {
      val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble
      acc += d * d; i += 1
    }
    acc
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("vlN"); val acc = ctx.freshName("vlAcc")
      val d = ctx.freshName("vlD"); val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = (double) $a.getFloat($i) - (double) $b.getFloat($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Integer (long-array) squared-L2 — the k-means/quantized-code
  * counterpart of VecL2Sq: exact integer accumulation, same tight
  * codegen loop. Both arrays must be long-typed (scaled-integer
  * vectors); result is exact for |values| ≤ 2^31 per element.
  */
case class VecL2SqLong(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    VecTypeCheck.arrays(LongType,
      Seq(("left", left.dataType), ("right", right.dataType)))
  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L; var i = 0
    while (i < n) {
      val d = x.getLong(i) - y.getLong(i)
      acc += d * d; i += 1
    }
    acc
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("vqN"); val acc = ctx.freshName("vqAcc")
      val d = ctx.freshName("vqD"); val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $d = $a.getLong($i) - $b.getLong($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object VectorExprs {
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => VecDot(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_norm", exprs => VecNorm(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_l2sq", exprs => VecL2Sq(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_l2sq_long", exprs => VecL2SqLong(exprs(0), exprs(1)), "built-in")
  }

  def vec_dot(a: Column, b: Column): Column = call_function("vec_dot", a, b)
  def vec_norm(a: Column): Column = call_function("vec_norm", a)
  def vec_l2sq(a: Column, b: Column): Column = call_function("vec_l2sq", a, b)
  def vec_l2sq_long(a: Column, b: Column): Column =
    call_function("vec_l2sq_long", a, b)
  def vec_cosine(a: Column, b: Column): Column =
    vec_dot(a, b) / (vec_norm(a) * vec_norm(b))
}
