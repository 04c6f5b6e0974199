package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.ArrayBasedMapData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, MapType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries frequent-items ("heavy hitters") summary as a mergeable
  * grouping aggregate — `misra_gries_agg(value, k)` maintains at most `k`
  * (item → counter) pairs per group and returns them as a map.
  *
  * Stream update is the classic MG step: hit → increment; room → insert at
  * 1; full → decrement every counter and drop zeros. Partial buffers merge
  * by pointwise sum followed by a rank-(k+1) rebase (subtract the (k+1)-th
  * largest counter from all, drop ≤0) — the mergeable-summaries form
  * (Agarwal et al., PODS 2012), which preserves the MG guarantee across any
  * merge tree: for a stream of n items,
  *
  *     true(x) − n/(k+1)  ≤  mg(x)  ≤  true(x),
  *
  * and every item with true frequency > n/(k+1) is present in the summary.
  * The summary is O(k) state per group regardless of stream size — the same
  * partial-aggregation shape as HLL/KLL, so a 1000-executor scan folds to
  * one map with no key-level shuffle.
  *
  * NOTE the surviving BORDERLINE items (true frequency ≤ n/(k+1)) and the
  * residual counters depend on the partial-merge order, which Spark does not
  * fix — so oracle-gated queries must project ORDER-INVARIANT facts only
  * (the guarantees above), the pattern `ProfileQueries.heavyValuesGate`
  * follows. The guarantee bounds themselves are deterministic.
  */
case class MisraGriesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with ImplicitCastInputTypes {

  require(k >= 1, "misra_gries_agg needs k >= 1")

  override def children: Seq[Expression] = Seq(child)
  // coerce numeric/date callers to their canonical string render at
  // analysis time (the DoubleBits pattern) — without this a bigint column
  // dies mid-job with a ClassCastException in update(). AbstractDataType is
  // private[sql]; the inferred Seq[StringType.type] conforms covariantly.
  override def inputTypes = Seq(StringType)
  override def nullable: Boolean = false
  override def dataType: DataType = MapType(StringType, LongType, valueContainsNull = false)

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(
      buffer: mutable.HashMap[String, Long], input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      buffer.get(s) match {
        case Some(c) => buffer.update(s, c + 1)
        case None if buffer.size < k => buffer.update(s, 1L)
        case None =>
          // full and missing: decrement all, drop zeros (one "charge" per
          // live counter — the classic amortized-O(1) MG step)
          val dead = mutable.ArrayBuffer.empty[String]
          buffer.keysIterator.foreach { key =>
            val c = buffer(key) - 1
            if (c == 0) dead += key else buffer.update(key, c)
          }
          dead.foreach(buffer.remove)
      }
    }
    buffer
  }

  override def merge(
      b1: mutable.HashMap[String, Long],
      b2: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b2.foreach { case (key, c) => b1.update(key, b1.getOrElse(key, 0L) + c) }
    if (b1.size > k) {
      // rank-(k+1) rebase: subtracting the (k+1)-th largest counter from
      // every counter leaves ≤ k positives and adds ≤ that value of
      // undercount — the merge that keeps the n/(k+1) bound
      val counts = b1.values.toArray
      java.util.Arrays.sort(counts)
      val pivot = counts(counts.length - (k + 1))
      val dead = mutable.ArrayBuffer.empty[String]
      b1.keysIterator.foreach { key =>
        val c = b1(key) - pivot
        if (c <= 0) dead += key else b1.update(key, c)
      }
      dead.foreach(b1.remove)
    }
    b1
  }

  override def eval(buffer: mutable.HashMap[String, Long]): Any = {
    val sorted = buffer.toArray.sortBy(_._1) // stable map layout
    ArrayBasedMapData(
      sorted.map(e => UTF8String.fromString(e._1): AnyRef),
      sorted.map(e => java.lang.Long.valueOf(e._2): AnyRef))
  }

  override def serialize(buffer: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size)
    buffer.foreach { case (key, c) =>
      val b = key.getBytes(StandardCharsets.UTF_8)
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      m.update(new String(b, StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MisraGriesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
}

object MisraGriesAgg {
  def misra_gries_agg(c: Column, k: Int): Column =
    ColumnBridge.column(MisraGriesAgg(ColumnBridge.expression(c), k).toAggregateExpression())
}
