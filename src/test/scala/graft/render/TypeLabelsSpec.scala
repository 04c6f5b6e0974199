package graft.render

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class TypeLabelsSpec extends AnyFunSuite {
  import TypeLabels._

  test("reference-faithful labels for counterpart types") {
    assert(label(IntegerType) == "int")
    assert(label(LongType) == "bigint")
    assert(label(ShortType) == "smallint")
    assert(label(DoubleType) == "float8")
    assert(label(FloatType) == "real")
    assert(label(DecimalType(18, 2)) == "numeric")
    assert(label(BooleanType) == "bool")
    assert(label(StringType) == "text")
    assert(label(BinaryType) == "bytea")
    assert(label(DateType) == "date")
    assert(label(TimestampType) == "tstz")
    assert(label(TimestampNTZType) == "ts-ntz")
  }

  test("spark-only types get short labels") {
    assert(label(ArrayType(FloatType)) == "array")
    assert(label(MapType(StringType, LongType)) == "map")
    assert(label(StructType(Seq(StructField("a", LongType)))) == "struct")
  }

  test("every label is at most 8 characters") {
    val all = Seq(IntegerType, LongType, ShortType, ByteType, DoubleType, FloatType,
      DecimalType(38, 10), BooleanType, StringType, BinaryType, DateType, TimestampType,
      TimestampNTZType, ArrayType(StringType), MapType(StringType, StringType),
      StructType(Nil), NullType, CalendarIntervalType, DayTimeIntervalType(), YearMonthIntervalType())
    all.foreach(dt => assert(label(dt).length <= 8, s"label for $dt too long"))
  }
}
