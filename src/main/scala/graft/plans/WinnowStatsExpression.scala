package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The L52 winnowing per-document stats as ONE native loop expression —
  * r19 optimization round (q117).
  *
  * Replicates bit-for-bit the relational construction q117 gated through
  * round 18 (posexplode + two `lead` windows + a sliding `min` window +
  * two doc-keyed aggregates — an Exchange(doc_id)+sort for values that
  * are pure functions of one document's text):
  *
  *  - trigram positions p ∈ [0, m) with m = words − (n−1) (the
  *    `w_{n-1}.isNotNull` filter), words split by the shared byte-level
  *    contract ([[WordBytes]]);
  *  - pack(p) = (h64(trigramₚ) % 2⁴⁰) · 2²⁰ + p — h64 = low-60-bit md5
  *    prefix digested straight from the word byte slices;
  *  - n_shingles = m; a window at p is FULL iff p + w − 1 ≤ m − 1, so
  *    n_windows = max(m − w + 1, 0);
  *  - n_selected = |distinct min(pack[p .. p+w−1]) over full windows|.
  *
  * Returns null when the document has no trigrams (m == 0) — exactly the
  * rows the legacy inner aggregates dropped — so callers filter nulls.
  */
case class WinnowStatsExpression(child: Expression, n: Int, w: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(n >= 1 && w >= 1, s"graft_winnow_stats needs n,w >= 1, got n=$n w=$w")

  override def dataType: DataType = WinnowStatsExpression.Schema
  override def nullable: Boolean = true
  override def inputTypes: Seq[DataType] = Seq(StringType)

  override protected def nullSafeEval(input: Any): Any =
    WinnowStatsExpression.stats(input.asInstanceOf[UTF8String], n, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = "graft.plans.WinnowStatsExpression.stats"
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $f($c, $n, $w);
      ${ev.isNull} = ${ev.value} == null;
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowStatsExpression =
    copy(child = newChild)

  override def prettyName: String = "graft_winnow_stats"
}

object WinnowStatsExpression {

  val Schema: StructType = StructType(Seq(
    StructField("n_shingles", LongType, nullable = false),
    StructField("n_windows", LongType, nullable = false),
    StructField("n_selected", LongType, nullable = false)))

  private def h64(md: java.security.MessageDigest): Long = {
    val d = md.digest()
    (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
  }

  private val Space = Array[Byte](0x20)

  /** Static kernel the generated code calls; null when no n-grams. */
  def stats(s: UTF8String, n: Int, w: Int): GenericInternalRow = {
    val wd = WordBytes.split(s)
    val m = wd.count - (n - 1)
    if (m <= 0) return null
    val md = java.security.MessageDigest.getInstance("MD5")
    val packs = new Array[Long](m)
    var p = 0
    while (p < m) {
      md.reset()
      var j = 0
      while (j < n) {
        if (j > 0) md.update(Space)
        md.update(wd.bytes, wd.offs(p + j), wd.lens(p + j))
        j += 1
      }
      packs(p) = (h64(md) % 1099511627776L) * 1048576L + p
      p += 1
    }
    val nWindows = math.max(m - w + 1, 0)
    val selected = new java.util.HashSet[java.lang.Long]
    p = 0
    while (p < nWindows) {
      var mn = packs(p)
      var j = 1
      while (j < w) {
        if (packs(p + j) < mn) mn = packs(p + j)
        j += 1
      }
      selected.add(mn)
      p += 1
    }
    new GenericInternalRow(Array[Any](m.toLong, nWindows.toLong,
      selected.size.toLong))
  }
}
