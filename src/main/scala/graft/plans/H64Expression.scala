package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The portable 60-bit md5-prefix hash as ONE native expression — the
  * r20 optimization under every `Sketches.h64` / `md5Fingerprint` call
  * site engine-wide.
  *
  * The Column form (`conv(substring(md5(x), 1, 15), 16, 10)`) pays, per
  * row: the Catalyst `Md5` expression (digest → 32-char lowercase-hex
  * UTF8String), a `substring` slice (second UTF8String), and a `conv`
  * base-16 parse back to the long the digest already contained. The
  * first 15 hex characters of an md5 ARE the digest's first 60 bits:
  * the big-endian first-8-bytes long unsigned-shifted right by 4 — the
  * identity [[CdcChunksExpression]] has used since r19 (no hex round
  * trip, no intermediate strings). `H64ExpressionSpec` pins the native
  * form against the legacy Column chain value-for-value (fixture corpus
  * + adversarial inputs) and interpreted == codegen.
  *
  * Null passes through (`md5(NULL)` is NULL, and every downstream op in
  * the legacy chain is null-preserving).
  */
case class H64Expression(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def inputTypes: Seq[DataType] = Seq(StringType)

  override protected def nullSafeEval(input: Any): Any =
    H64Expression.h64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.H64Expression.h64($c)")

  override protected def withNewChildInternal(newChild: Expression): H64Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_h64"
}

object H64Expression {

  /** Per-thread digest + output buffer: MessageDigest.getInstance and the
    * 16-byte digest array are the dominant allocations of a per-row hash;
    * both amortize to zero across the task's rows.
    */
  private final class Ctx {
    val md: java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
    val buf: Array[Byte] = new Array[Byte](16)
  }
  private val local: ThreadLocal[Ctx] =
    ThreadLocal.withInitial(() => new Ctx)

  /** Static kernel the generated code calls: low-60-bit md5 prefix as
    * BIGINT, bit-identical to `parseLong(hex(0, 15), 16)`.
    */
  def h64(s: UTF8String): Long = {
    val c = local.get()
    c.md.reset()
    c.md.update(s.getBytes)
    c.md.digest(c.buf, 0, 16)
    val d = c.buf
    (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
  }
}
