package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** word_shingles(tokens, n): contiguous word n-grams joined with a
  * single space — `["a","b","c","d"] → ["a b c", "b c d"]` for n=3;
  * fewer than n tokens → empty array.
  *
  * The Spark-built-ins spelling
  * `transform(sequence(0, size(w)-n), i -> concat_ws(' ', slice(w, i+1, n)))`
  * evaluates its lambda INTERPRETED per element (outside whole-stage
  * codegen) and re-slices per shingle — measured ~3 s per pass over a
  * 5k-doc corpus, recomputed by every dedup operator. This native
  * expression runs one tight loop per row (one static call from the
  * generated code, no per-element interpretation) and byte-identically
  * reproduces the concat_ws(' ') output, so every DuckDB oracle and
  * downstream hash is unchanged.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle size must be >= 1, got $n")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes() =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"word_shingles needs ARRAY<STRING>, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    WordShingles.make(v.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.WordShingles.make($c, $n);")

  override protected def withNewChildInternal(c: Expression): WordShingles =
    copy(child = c)
}

object WordShingles {
  private val SPACE = UTF8String.fromString(" ")

  /** One pass over the token array; shared by eval and codegen. */
  def make(tokens: ArrayData, n: Int): ArrayData = {
    val len = tokens.numElements()
    val out = len - n + 1
    if (out <= 0) return new GenericArrayData(Array.empty[Any])
    val res = new Array[Any](out)
    var i = 0
    while (i < out) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) {
        // null tokens stay null: concatWs skips them, exactly like
        // the concat_ws(' ', slice(...)) spelling this replaces
        parts(j) = if (tokens.isNullAt(i + j)) null
          else tokens.getUTF8String(i + j)
        j += 1
      }
      res(i) = UTF8String.concatWs(SPACE, parts: _*)
      i += 1
    }
    new GenericArrayData(res)
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "word_shingles", exprs => {
        val n = exprs(1).eval(null).asInstanceOf[Int]
        WordShingles(exprs.head, n)
      }, "built-in")

  def word_shingles(c: Column, n: Int): Column =
    call_function("word_shingles", c, org.apache.spark.sql.functions.lit(n))
}
