package graft.plans


import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** The L53 content-defined-chunking frame as ONE native loop expression —
  * r19 optimization round, shared by q118 and q133.
  *
  * Replicates bit-for-bit the relational construction both queries gated
  * through round 18 (posexplode + three `lead`/running-sum windows over
  * (doc_id ORDER BY pos) + a (doc, chunk) hash aggregate — an
  * Exchange(doc_id)+sort plus two aggregate exchanges for values that
  * are pure functions of one document's text):
  *
  *  - words: SPACE-only trim → split `\s+` limit -1 (the engine/oracle
  *    parsing contract of the other word-loop expressions);
  *  - boundary at 0-based word p iff p+2 ≤ n−1 and
  *    h64(wₚ ⊔ wₚ₊₁ ⊔ wₚ₊₂) % mod == 0 (h64 = low-60-bit md5 prefix,
  *    non-negative, so `%` is plain mod — [[graft.functions.Sketches]]);
  *  - chunk_id(p) = #boundaries strictly before p; a chunk therefore
  *    ends AT its boundary word and the next starts at p+1;
  *  - cfp = Σ (h64(wₚ) % 2³²) · (p − chunk_start + 1), Long wraparound
  *    exactly like the relational SUM;
  *  - n_w = words in the chunk; chunk_text = the chunk's words joined
  *    by one space (chunks tile the document contiguously, so joining
  *    kept chunk_texts in chunk order with " " reproduces q133's
  *    pos-ordered word rebuild string byte-for-byte).
  *
  * Output: array of (chunk_id, cfp, n_w, chunk_text) structs in chunk
  * order; null text → null (the exploded relational form dropped those
  * rows the same way).
  */
case class CdcChunksExpression(child: Expression, mod: Long)
    extends UnaryExpression with ImplicitCastInputTypes {

  require(mod >= 1, s"graft_cdc_chunks mod must be >= 1, got $mod")

  override def dataType: DataType = CdcChunksExpression.Schema
  override def nullable: Boolean = child.nullable
  override def inputTypes: Seq[DataType] = Seq(StringType)

  override protected def nullSafeEval(input: Any): Any =
    CdcChunksExpression.chunks(input.asInstanceOf[UTF8String], mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.CdcChunksExpression.chunks($c, ${mod}L)")

  override protected def withNewChildInternal(newChild: Expression): CdcChunksExpression =
    copy(child = newChild)

  override def prettyName: String = "graft_cdc_chunks"
}

object CdcChunksExpression {

  val Schema: ArrayType = ArrayType(StructType(Seq(
    StructField("chunk_id", LongType, nullable = false),
    StructField("cfp", LongType, nullable = false),
    StructField("n_w", LongType, nullable = false),
    StructField("chunk_text", StringType, nullable = false))),
    containsNull = false)

  /** Low-60-bit md5 prefix from a prepared digest, identical to
    * `Sketches.h64Scala` / `parseLong(hex(0,15), 16)`: the first 15 hex
    * digits are the digest's first 60 bits, i.e. the big-endian
    * first-8-bytes Long unsigned-shifted right by 4 (no hex round trip).
    */
  private def h64(md: java.security.MessageDigest): Long = {
    val d = md.digest()
    (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
  }

  private val Space = Array[Byte](0x20)

  /** Static kernel the generated code calls — byte-level ([[WordBytes]]):
    * word and 3-gram hashes digest the UTF-8 byte slices directly (a
    * word's UTF-8 bytes ARE its slice; the 3-gram's bytes are the three
    * slices joined by 0x20), so no String is ever built except the
    * chunk_text outputs.
    */
  def chunks(s: UTF8String, mod: Long): ArrayData = {
    val w = WordBytes.split(s)
    val n = w.count
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new java.util.ArrayList[AnyRef](4)
    var chunkId = 0L
    var start = 0
    var cfp = 0L
    var nw = 0L
    var p = 0
    while (p < n) {
      md.reset()
      md.update(w.bytes, w.offs(p), w.lens(p))
      cfp += (h64(md) % 4294967296L) * (p - start + 1)
      nw += 1
      val boundary = p + 2 <= n - 1 && {
        md.reset()
        md.update(w.bytes, w.offs(p), w.lens(p))
        md.update(Space)
        md.update(w.bytes, w.offs(p + 1), w.lens(p + 1))
        md.update(Space)
        md.update(w.bytes, w.offs(p + 2), w.lens(p + 2))
        h64(md) % mod == 0
      }
      if (boundary) {
        out.add(new GenericInternalRow(Array[Any](chunkId, cfp, nw,
          w.joined(start, p - start + 1))))
        chunkId += 1
        start = p + 1
        cfp = 0L
        nw = 0L
      }
      p += 1
    }
    if (nw > 0) {
      out.add(new GenericInternalRow(Array[Any](chunkId, cfp, nw,
        w.joined(start, n - start))))
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  /** Scala-facing twin (specs replay the arithmetic without Catalyst). */
  def chunksScala(text: String, mod: Long): Seq[(Long, Long, Long, String)] = {
    val arr = chunks(UTF8String.fromString(text), mod)
    (0 until arr.numElements()).map { i =>
      val r = arr.getStruct(i, 4).asInstanceOf[InternalRow]
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getUTF8String(3).toString)
    }
  }
}
