package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Exact integer Gram matrix as a native `TypedImperativeAggregate`:
  * per input vector, quantize each component on the q105 ladder
  * (floor(v·quantum) — bit-identical to Spark's own
  * `floor(cast(x AS double) * quantum)` since float→double widening is
  * exact and the product/floor are single IEEE operations) and
  * accumulate the dims×dims outer product into a Long matrix held as
  * the aggregation buffer.
  *
  * Why native instead of the declarative two-nested-posexplode form:
  * the explode materializes dims² rows PER VECTOR before the aggregate
  * (at sf0.1: 50k vectors × 4096 = 205M rows through the shuffle-write
  * path just to feed a 4096-cell result — measured 32 s of the q176
  * wall). The aggregate form does the same multiply-adds in a tight
  * loop on the buffer: one pass, map-side combined, the only thing
  * crossing the wire is the 4096-long buffer per partition. Matrix
  * addition is associative and commutative, so partial aggregation and
  * any merge tree produce identical state — and integer sums make the
  * result bit-identical to the exploded form and to the DuckDB oracle's
  * unnest join (`SpectralSpec` pins the replay).
  *
  * The buffer serializes as raw big-endian longs — java.nio.ByteBuffer's
  * default order, used verbatim on both sides of the round-trip (no header: unlike
  * the CMS bytes, this buffer never leaves the aggregate — the output
  * is an ARRAY<BIGINT> in row-major order, consumed by posexplode
  * immediately).
  */
case class GramMatrixAgg(
    child: Expression,
    dims: Int,
    quantum: Long,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(dims >= 1 && dims <= 512, s"graft_gram dims must be in [1, 512], got $dims")
  require(quantum >= 1L, s"graft_gram quantum must be positive, got $quantum")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_gram expects ARRAY<FLOAT|DOUBLE>, got $t")
  }

  private val isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](dims * dims)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      require(arr.numElements() == dims,
        s"graft_gram expects $dims components, got ${arr.numElements()}")
      val q = new Array[Long](dims)
      var i = 0
      while (i < dims) {
        val x = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
        q(i) = math.floor(x * quantum).toLong
        i += 1
      }
      i = 0
      while (i < dims) {
        val qi = q(i)
        val row = i * dims
        var j = 0
        while (j < dims) {
          buf(row + j) += qi * q(j)
          j += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) {
      buf(i) += other(i)
      i += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    var i = 0
    while (i < buf.length) {
      bb.putLong(buf(i))
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    require(bytes.length == dims * dims * 8,
      s"graft_gram buffer length mismatch: expected ${dims * dims * 8}, " +
        s"got ${bytes.length}")
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new Array[Long](dims * dims)
    var i = 0
    while (i < out.length) {
      out(i) = bb.getLong()
      i += 1
    }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramMatrixAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramMatrixAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): GramMatrixAgg =
    copy(child = newChild)

  override def prettyName: String = "graft_gram"
}
