package graft.profile

import org.apache.spark.sql.types._

/** Which profile a column gets. Mirrors the reference's three type predicates
  * (`/root/reference/src/listTables.tsx:31-49,125-138`): numeric and temporal
  * columns get a MIN–MAX range, boolean columns get a tri-state TRUE/FALSE
  * histogram, everything else is displayed but not profiled.
  */
sealed trait ColumnClass
object ColumnClass {
  /** `isNumericDataType` — numeric/decimal/smallint/integer/bigint/real/double. */
  case object Numeric extends ColumnClass
  /** `isTemporalDataType` — date/timestamp[tz]; Spark adds TimestampNTZ. */
  case object Temporal extends ColumnClass
  /** bigint carrying nanos-since-epoch (parquet TIMESTAMP(NANOS) under
    * `spark.sql.legacy.parquet.nanosAsLong`) — temporal by column knowledge,
    * not by type (FIXTURES.md gotcha #1). */
  case object TemporalNanos extends ColumnClass
  /** `isBooleanDataType`. */
  case object Bool extends ColumnClass
  /** Displayed, not profiled (strings/json/binary/arrays/…). */
  case object Other extends ColumnClass
}

object ColumnClassifier {

  /** Classify a Spark type. `nanosOverride` marks a LongType column as
    * temporal-nanos (the type system can't see it). */
  def classify(dt: DataType, nanosOverride: Boolean = false): ColumnClass = dt match {
    case LongType if nanosOverride => ColumnClass.TemporalNanos
    case ByteType | ShortType | IntegerType | LongType | FloatType | DoubleType =>
      ColumnClass.Numeric
    case _: DecimalType => ColumnClass.Numeric
    case DateType | TimestampType | TimestampNTZType => ColumnClass.Temporal
    case BooleanType => ColumnClass.Bool
    case _ => ColumnClass.Other
  }
}
