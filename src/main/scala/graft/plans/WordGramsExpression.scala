package graft.plans


import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** NON-distinct word n-grams in document order, as a native loop
  * expression — the postings construction under term-frequency
  * consumers (the L95 BM25 index), where [[WordShinglesExpression]]'s
  * distinctness would destroy tf.
  *
  * Same codegen rationale as the shingle node: the Column form
  * (`sequence` + `transform(element_at …)`) is a higher-order lambda —
  * CodegenFallback — and one in a projection de-optimizes the whole
  * host Project to interpreted. Same parsing contract too: SPACE-only
  * trim → split on `\s+` (limit -1), empty result below n words,
  * n-grams joined by one space — the DuckDB twin is
  * `list_transform(range(1, len(w) - n + 2), i -> …)` over the same
  * split, duplicates preserved.
  */
case class WordGramsExpression(child: Expression, n: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(n >= 1, s"graft_grams width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def inputTypes: Seq[DataType] = Seq(StringType)

  override protected def nullSafeEval(input: Any): Any =
    WordGramsExpression.grams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.WordGramsExpression.grams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordGramsExpression =
    copy(child = newChild)

  override def prettyName: String = "graft_grams"
}

object WordGramsExpression {
  /** Static kernel the generated code calls — order-preserving, with
    * duplicates (tf survives). Byte-level since r19 ([[WordBytes]]):
    * same trim/split/join contract, no String round trips.
    */
  def grams(s: UTF8String, n: Int): ArrayData = {
    val w = WordBytes.split(s)
    if (w.count < n) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](w.count - n + 1)
      var i = 0
      while (i <= w.count - n) {
        out(i) = w.joined(i, n)
        i += 1
      }
      new GenericArrayData(out)
    }
  }
}
