package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature as a GROUPING AGGREGATE — `minhash_agg(shingle, k)`
  * computes, per group, element i = min over the group's rows of
  * md5("i|" + shingle). This is the mergeable-sketch form of the array
  * expression `MinHashSignature`: partial buffers combine by element-wise
  * min, so partial aggregation/AQE work unchanged and a group's signature
  * can be built across any partitioning — the shape every distributed
  * sketch (HLL, KLL, CMS) takes in Spark.
  *
  * Oracle-exact: element i equals SQL `min(md5('i|' || shingle))`, so the
  * DuckDB twin is a plain grouped aggregation.
  */
case class MinHashAgg(
    child: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[String]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def createAggregationBuffer(): Array[String] = new Array[String](numHashes)

  override def update(buffer: Array[String], input: InternalRow): Array[String] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].getBytes
      val md = java.security.MessageDigest.getInstance("MD5")
      var i = 0
      while (i < numHashes) {
        md.reset()
        md.update(s"$i|".getBytes(StandardCharsets.UTF_8))
        md.update(s)
        val hex = MinHashAgg.toHex(md.digest())
        if (buffer(i) == null || hex.compareTo(buffer(i)) < 0) buffer(i) = hex
        i += 1
      }
    }
    buffer
  }

  override def merge(b1: Array[String], b2: Array[String]): Array[String] = {
    var i = 0
    while (i < numHashes) {
      if (b1(i) == null || (b2(i) != null && b2(i).compareTo(b1(i)) < 0)) b1(i) = b2(i)
      i += 1
    }
    b1
  }

  override def eval(buffer: Array[String]): Any =
    if (buffer.forall(_ == null)) null
    else new GenericArrayData(buffer.map(m => UTF8String.fromString(m): AnyRef))

  override def serialize(buffer: Array[String]): Array[Byte] =
    buffer.map(m => if (m == null) "" else m).mkString(",").getBytes(StandardCharsets.UTF_8)

  override def deserialize(bytes: Array[Byte]): Array[String] =
    new String(bytes, StandardCharsets.UTF_8).split(",", -1).map(s => if (s.isEmpty) null else s)

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MinHashAgg {

  private val HexDigits = "0123456789abcdef".toCharArray

  private[functions] def toHex(dig: Array[Byte]): String = {
    val hex = new Array[Char](32)
    var j = 0
    while (j < 16) {
      hex(2 * j) = HexDigits((dig(j) >> 4) & 0xf)
      hex(2 * j + 1) = HexDigits(dig(j) & 0xf)
      j += 1
    }
    new String(hex)
  }

  def minhash_agg(c: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashAgg(ColumnBridge.expression(c), numHashes).toAggregateExpression())
}
