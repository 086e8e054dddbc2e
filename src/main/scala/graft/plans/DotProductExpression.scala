package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Fixed-order embedding dot product as a native loop expression.
  *
  * The unrolled Column-tree form (`Sketches.dot`) emits `dims`
  * multiply-add terms as ONE expression tree — at 64 dims that is fine in
  * isolation, but when Catalyst collapses the projection into a
  * surrounding hash aggregate (the q78 pair subgraph does exactly this)
  * several unrolled dots and norms land in a single generated method and
  * blow the JVM's 64 KB bytecode limit, so Spark silently falls back to an
  * interpreted aggregate. This node generates one static call: constant
  * bytecode size at any width, stays inside WholeStageCodegen, runs a
  * tight JIT-able loop.
  *
  * Bit-for-bit parity with the unrolled form (and so with the DuckDB
  * oracle twin `dotSql`): the products accumulate LEFT-ASSOCIATED in
  * element order — the same IEEE addition order as the `reduce(_ + _)`
  * term list — and each element is widened float→double before the
  * multiply, exactly as `element_at(a, i).cast("double")` did.
  *
  * Null semantics match the term-tree form: a null element on either side
  * nulls a term and therefore the whole sum; an array shorter than `dims`
  * yields NULL (the engine's embedding tables are fixed-width so neither
  * fires in practice, but the contract is pinned so the expression can
  * never diverge from the oracle on degenerate input).
  */
case class DotProductExpression(left: Expression, right: Expression, dims: Int,
    offset: Int = 0)
    extends BinaryExpression {

  require(dims >= 1, s"dims must be positive, got $dims")
  require(offset >= 0, s"offset must be non-negative, got $offset")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private lazy val leftFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private lazy val rightFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_dot needs (ARRAY<FLOAT|DOUBLE>, ARRAY<FLOAT|DOUBLE>), got ($l, $r)")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotProductExpression.dot(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], dims, offset,
      leftFloat, rightFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val boxed = ctx.freshName("dotResult")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      s"""
         |java.lang.Double $boxed = graft.plans.DotProductExpression.dot(
         |  $a, $b, $dims, $offset, $leftFloat, $rightFloat);
         |if ($boxed == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $boxed.doubleValue();
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_dot"
}

object DotProductExpression {
  /** Static kernel the generated code calls: left-associated
    * sum(a[offset+i] * b[offset+i]) over `dims` elements starting at
    * `offset` (0 = whole-vector dot; a non-zero offset is the
    * product-quantization subspace window), float inputs widened to
    * double per element. Boxed so NULL (null element / short array)
    * survives the codegen boundary.
    */
  def dot(a: ArrayData, b: ArrayData, dims: Int, offset: Int,
      aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val end = offset + dims
    if (a.numElements() < end || b.numElements() < end) return null
    var j = offset
    while (j < end) {
      if (a.isNullAt(j) || b.isNullAt(j)) return null
      j += 1
    }
    var acc = elem(a, offset, aFloat) * elem(b, offset, bFloat)
    j = offset + 1
    while (j < end) {
      acc += elem(a, j, aFloat) * elem(b, j, bFloat)
      j += 1
    }
    java.lang.Double.valueOf(acc)
  }

  @inline private def elem(arr: ArrayData, j: Int, isFloat: Boolean): Double =
    if (isFloat) arr.getFloat(j).toDouble else arr.getDouble(j)
}
