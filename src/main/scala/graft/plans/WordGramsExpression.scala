package graft.plans

import java.util.regex.Pattern

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
  private val Ws = Pattern.compile("\\s+")

  /** Static kernel the generated code calls — order-preserving, with
    * duplicates (tf survives). `UTF8String.trim` strips U+0020 only
    * (the engine/oracle trim contract, see the shingle node's note).
    */
  def grams(s: UTF8String, n: Int): ArrayData = {
    val words = Ws.split(s.trim.toString, -1)
    if (words.length < n) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](words.length - n + 1)
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i <= words.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(words(i + j))
          j += 1
        }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    }
  }
}
