package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._

/** Distributed OUTER-PRODUCT accumulator — the d≳256 form of the
  * covariance pair sums ([[graft.operators.Similarity]] `covarianceSums`):
  * per group, Σ mᵢ·mⱼ over every upper-triangle dimension pair (i<j) of an
  * already-quantized `array<bigint>` vector, accumulated into ONE packed
  * d(d−1)/2-cell buffer per partition instead of exploding d(d−1)/2 structs
  * per ROW. Update is d²/2 fused multiply-adds with no row
  * materialization; merge is a buffer add — the canonical mergeable-sketch
  * shape, so partial aggregation and AQE work unchanged.
  *
  * Cells accumulate in 128-BIT integer arithmetic (two longs per cell,
  * carry-propagated): micro-unit products reach 10¹², so a single signed
  * long wraps at ~9·10⁶ vectors — far below the 10⁹-vector corpora this
  * form exists for. Eval emits exact DECIMAL(38,0) sums, bit-identical to
  * the explode form's `sum(CAST(xy AS DECIMAL(38,0)))` (equality is
  * spec-gated on the fixture by `OuterProductAggSpec`).
  *
  * Buffer cost: 16 B · d(d−1)/2 per task — ~8 MB at d=1024, the bound the
  * `covarianceSums` Scaladoc documents.
  */
case class OuterProductAgg(
    child: Expression,
    d: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val cells = d * (d - 1) / 2

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("dim_i", IntegerType, nullable = false),
      StructField("dim_j", IntegerType, nullable = false),
      StructField("sxy", DecimalType(38, 0), nullable = false))),
    containsNull = false)

  /** layout: [n, lo(0), hi(0), lo(1), hi(1), …] — one count + two longs
    * (128-bit two's complement: unsigned low word, signed high word) per
    * upper-triangle cell in row-major (i,j>i) order. */
  override def createAggregationBuffer(): Array[Long] = new Array[Long](1 + 2 * cells)

  /** 128-bit add of signed 64-bit p into cell c (buffer[1+2c]=lo,
    * buffer[2+2c]=hi): unsigned carry-out of the low-word add plus p's
    * sign extension into the high word. */
  @inline private def add128(buffer: Array[Long], c: Int, p: Long): Unit = {
    val base = 1 + 2 * c
    val lo = buffer(base)
    val newLo = lo + p
    // unsigned carry-out of lo + p (HD 2-13): bit 63 of the carry chain
    val carry = ((lo & p) | ((lo | p) & ~newLo)) >>> 63
    buffer(base) = newLo
    buffer(base + 1) += (p >> 63) + carry
  }

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == d,
        s"outer_product_agg(d=$d) got a ${arr.numElements()}-element vector")
      val m = new Array[Long](d)
      var i = 0
      while (i < d) { m(i) = arr.getLong(i); i += 1 }
      buffer(0) += 1L
      var c = 0
      i = 0
      while (i < d - 1) {
        val mi = m(i)
        var j = i + 1
        while (j < d) {
          add128(buffer, c, mi * m(j))
          c += 1
          j += 1
        }
        i += 1
      }
    }
    buffer
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    b1(0) += b2(0)
    var c = 0
    while (c < cells) {
      val base = 1 + 2 * c
      val lo1 = b1(base)
      val lo2 = b2(base)
      val newLo = lo1 + lo2
      val carry = ((lo1 & lo2) | ((lo1 | lo2) & ~newLo)) >>> 63
      b1(base) = newLo
      b1(base + 1) += b2(base + 1) + carry
      c += 1
    }
    b1
  }

  override def eval(buffer: Array[Long]): Any = {
    val out = new Array[AnyRef](cells)
    var c = 0
    var i = 0
    var j = 1
    while (c < cells) {
      val base = 1 + 2 * c
      val value = (BigInt(buffer(base + 1)) << 64) |
        (BigInt(buffer(base)) & OuterProductAgg.LowMask)
      out(c) = InternalRow(i, j,
        Decimal(scala.math.BigDecimal(value), 38, 0))
      j += 1
      if (j == d) { i += 1; j = i + 1 }
      c += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buffer.length)
    buffer.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): OuterProductAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): OuterProductAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object OuterProductAgg {

  private[functions] val LowMask = (BigInt(1) << 64) - 1

  /** `outer_product_agg(m, d)` over an `array<bigint>` column of fixed
    * dimension d: one row per group holding the full upper-triangle
    * Σ mᵢ·mⱼ as array<struct<dim_i, dim_j, sxy:decimal(38,0)>>. */
  def outer_product_agg(c: Column, d: Int): Column =
    ColumnBridge.column(OuterProductAgg(ColumnBridge.expression(c), d).toAggregateExpression())
}
