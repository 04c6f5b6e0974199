package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{Fixtures, SparkSuite}

/** Planted-recall for the code-likeness screen: exactly the doc_id % 7
  * code-rendered docs must flag, and the per-source rollup must account
  * for them without loss.
  */
class CodeDetectSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  val dir = SparkSuite.Sf0001

  test("exactly the planted code-rendered docs are flagged") {
    val flags = TextAnalysis.codeFlags(spark, dir)
      .select(col("doc_id"), col("is_code")).collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(flags.nonEmpty)
    flags.foreach { case (id, isCode) =>
      assert(isCode == (id % 7 == 0),
        s"doc $id: is_code=$isCode but planted=${id % 7 == 0}")
    }
  }

  test("per-source rollup conserves doc and code counts") {
    val rows = TextAnalysis.codeDetect(spark, dir).collect()
    val total = Fixtures.table(spark, dir, "documents").count()
    assert(rows.map(_.getLong(1)).sum == total)
    val expectedCode = Fixtures.table(spark, dir, "documents")
      .filter(col("doc_id") % 7 === 0).count()
    assert(rows.map(_.getLong(2)).sum == expectedCode)
    rows.foreach { r =>
      val (n, c, ppm) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(ppm == (c * 1000000L + n / 2) / n)
      // prose-only sources must read 0; sources with planted docs must not
      assert((c == 0) == (ppm == 0))
    }
  }
}
