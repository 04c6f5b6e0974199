package graft.render

import org.apache.spark.sql.types._

/** Humanized type labels, ≤8 characters.
  *
  * Port of the reference's `humanDataType` (`/root/reference/src/listTables.tsx:81-123`)
  * re-keyed from Postgres `data_type` strings to Spark `DataType`s. Labels are
  * kept identical to the reference where a counterpart type exists
  * (`integer→int`, `double precision→float8`, `timestamp without time zone→ts-ntz`,
  * `boolean→bool`, …); Spark-only types (arrays, maps, structs) get their own
  * short labels. Anything longer than 8 chars is truncated (listTables.tsx:122).
  */
object TypeLabels {

  def label(dt: DataType): String = {
    val raw = dt match {
      case ByteType               => "tinyint"
      case ShortType              => "smallint"
      case IntegerType            => "int"
      case LongType               => "bigint"
      case FloatType              => "real"
      case DoubleType             => "float8"
      case _: DecimalType         => "numeric"
      case BooleanType            => "bool"
      case _: StringType          => "text"
      case BinaryType             => "bytea"
      case DateType               => "date"
      case TimestampType          => "tstz"
      case TimestampNTZType       => "ts-ntz"
      case _: DayTimeIntervalType => "interval"
      case _: YearMonthIntervalType => "interval"
      case CalendarIntervalType   => "interval"
      case _: ArrayType           => "array"
      case _: MapType             => "map"
      case _: StructType          => "struct"
      case NullType               => "null"
      case other                  => other.simpleString
    }
    if (raw.length > 8) raw.substring(0, 8) else raw
  }

  /** Label for a bigint column that actually carries nanos-since-epoch
    * (parquet `TIMESTAMP(NANOS)` surfaced as long under
    * `spark.sql.legacy.parquet.nanosAsLong`). */
  val NanosLabel: String = "ts-nanos"

  /** Label for a timestamp column that actually carries a JDBC TIME —
    * the reference's `time → time-ntz` row (listTables.tsx:91-92). */
  val TimeLabel: String = "time-ntz"
}
