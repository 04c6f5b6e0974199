package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Point-frequency lookup into a serialized Count-Min sketch — the query
  * side Spark never shipped for its own `count_min_sketch` aggregate (the
  * agg returns opaque bytes; nothing in `functions._` reads them back).
  * With this, the CMS joins the engine's mergeable-sketch family (HLL NDV,
  * KLL quantiles, Misra-Gries heavy hitters, Bloom membership): O(w·d)
  * bytes per group, partial-merge friendly, estimate ≥ truth with
  * ε·n additive error at the chosen confidence.
  *
  * Eval-only (CodegenFallback) BY DESIGN: a lookup deserializes the sketch
  * per call, so the intended shape is a handful of probe rows against a
  * broadcast 1-row sketch frame — never a per-corpus-row hot path (the
  * sketch BUILD is the scan-side work and uses Spark's own codegen'd agg).
  * The item hashes exactly as the builder's String path (UTF-8 bytes), so
  * build and probe agree on the cells.
  */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with CodegenFallback {
  override def inputTypes = Seq(BinaryType, StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override protected def nullSafeEval(sketch: Any, item: Any): Any = {
    val cms = CountMinSketch.readFrom(
      new ByteArrayInputStream(sketch.asInstanceOf[Array[Byte]]))
    cms.estimateCount(item.asInstanceOf[UTF8String].toString)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}

object Cms {
  /** Column wrapper: estimated count of `item` in the CMS bytes `sketch`. */
  def estimate(sketch: Column, item: Column): Column =
    ColumnBridge.column(
      CmsEstimate(ColumnBridge.expression(sketch), ColumnBridge.expression(item)))
}
