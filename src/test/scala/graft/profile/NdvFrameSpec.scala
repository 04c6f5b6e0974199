package graft.profile

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** The stacked one-job `ndvFrame` must agree with `countDistinct` on every
  * value SQL considers equal or distinct — including the cases a stringify-
  * and-dedup implementation classically gets wrong: negative zero (equal to
  * 0.0 in SQL, different as a string), NaN (one distinct value), infinities,
  * nulls (not counted), and int/long widening.
  */
class NdvFrameSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  private def check(df: org.apache.spark.sql.DataFrame, cols: Seq[String]): Unit = {
    val got = ProfileQueries.ndvFrame(df, cols).collect()(0)
    val expect = df.agg(
      countDistinct(col(cols.head)).as(s"ndv_${cols.head}"),
      cols.tail.map(c => countDistinct(col(c)).as(s"ndv_$c")): _*).collect()(0)
    cols.foreach { c =>
      assert(got.getAs[Long](s"ndv_$c") == expect.getAs[Long](s"ndv_$c"),
        s"column $c: stacked ${got.getAs[Long](s"ndv_$c")} != countDistinct ${expect.getAs[Long](s"ndv_$c")}")
    }
  }

  test("adversarial doubles: -0.0/0.0 merge, NaN counts once, nulls don't count") {
    val schema = StructType(Seq(
      StructField("d", DoubleType), StructField("f", FloatType), StructField("l", LongType)))
    val rows = Seq[(java.lang.Double, java.lang.Float, java.lang.Long)](
      (0.0, 0.0f, 1L), (-0.0, -0.0f, 1L), (Double.NaN, Float.NaN, null),
      (Double.NaN, Float.NaN, 2L), (Double.PositiveInfinity, Float.PositiveInfinity, 2L),
      (Double.NegativeInfinity, Float.NegativeInfinity, Long.MaxValue),
      (1.5, 1.5f, Long.MinValue), (-1.5, -1.5f, 0L), (null, null, null),
      (1.0e-300, 1.0e-30f, -1L), (123456789.123456789, 0.1f, -1L))
      .map { case (d, f, l) => Row(d, f, l) }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toList, 4), schema)
    check(df, Seq("d", "f", "l"))
  }

  test("randomized battery agrees with countDistinct across all profiled types") {
    val rng = new scala.util.Random(20260813L)
    val doublePool = Array[java.lang.Double](0.0, -0.0, Double.NaN, 1.5, -1.5,
      Double.PositiveInfinity, Double.NegativeInfinity, null, 3.14159, 1e100, -1e-100)
    val longPool = Array[java.lang.Long](null, -1L, 0L, 1L, Long.MaxValue, Long.MinValue, 42L)
    val intPool = Array[java.lang.Integer](null, -7, 0, 7, Int.MaxValue)
    val datePool = Array[java.sql.Date](null, java.sql.Date.valueOf("1970-01-01"),
      java.sql.Date.valueOf("2026-08-13"), java.sql.Date.valueOf("1900-02-28"))
    val decPool = Array[java.math.BigDecimal](null, new java.math.BigDecimal("0.00"),
      new java.math.BigDecimal("-1.25"), new java.math.BigDecimal("99999.99"))
    val schema = StructType(Seq(
      StructField("d", DoubleType), StructField("l", LongType),
      StructField("i", IntegerType), StructField("dt", DateType),
      StructField("dec", DecimalType(12, 2))))
    def pick[T <: AnyRef](p: Array[T]): T = p(rng.nextInt(p.length))
    val rows = List.fill(800)(Row(
      pick(doublePool), pick(longPool), pick(intPool), pick(datePool), pick(decPool)))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows, 8), schema)
    check(df, Seq("d", "l", "i", "dt", "dec"))
  }
}
