package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Case-insensitive stopword occurrence count as a native loop expression.
  *
  * The Column-tree form — `size(filter(words, w => lower(w).isin(...)))`
  * — rides on a higher-order-function lambda, which is CodegenFallback:
  * the one interpreted expression de-optimizes its ENTIRE host Project
  * out of whole-stage codegen (q41/q84 ran their full quality-scoring
  * projection interpreted because of it). Quality scoring is a
  * per-document map pass over the whole corpus — at 100 TB that Project
  * is exactly the operator that must stay codegen'd.
  *
  * Semantics match the lambda form: each element is lowercased
  * (UTF8String.toLowerCase — the same kernel Spark's `lower` uses) and
  * counted when it is in the stopword set; null elements count as false
  * exactly like a null lambda predicate under `filter`.
  */
/* `stopwords` is a Seq, NOT an Array: case-class equality over an Array
 * parameter is reference equality, which makes structurally identical
 * expressions compare unequal — defeating Catalyst canonicalization and
 * common-subexpression elimination (langIdColumn builds five of these
 * per projection). Seq equality is structural. */
case class StopwordCountExpression(child: Expression, stopwords: Seq[String])
    extends UnaryExpression {

  require(stopwords.nonEmpty, "graft_stopword_count needs a non-empty stopword set")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_stopword_count needs ARRAY<STRING>, got $t")
  }

  /** Lowercased membership set, built once on the driver and shipped as a
    * codegen reference object (HashSet of UTF8String — both are
    * serializable, and lookups run on the raw scan bytes without a
    * per-element String conversion).
    */
  lazy val stopSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](stopwords.size * 2)
    stopwords.foreach(w => s.add(UTF8String.fromString(w.toLowerCase)))
    s
  }

  override protected def nullSafeEval(input: Any): Any =
    StopwordCountExpression.count(input.asInstanceOf[ArrayData], stopSet)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("stopSet", stopSet, "java.util.HashSet")
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.StopwordCountExpression.count($c, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): StopwordCountExpression =
    copy(child = newChild)

  override def prettyName: String = "graft_stopword_count"
}

object StopwordCountExpression {
  /** Static kernel the generated code calls. */
  def count(arr: ArrayData, stops: java.util.HashSet[UTF8String]): Int = {
    var c = 0
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i) && stops.contains(arr.getUTF8String(i).toLowerCase)) c += 1
      i += 1
    }
    c
  }
}
