package graft.sources

import java.sql.Types

import org.apache.spark.sql.jdbc.JdbcDialects
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the PostgreSQL type mapping [[TableSources.readJdbc]] relies on.
  *
  * No network database exists in the container (the Derby round-trip spec
  * covers the live JDBCRelation machinery), so the first run against a real
  * Postgres catalog — the reference's actual storage
  * (`/root/reference/src/listTables.tsx:504`) — would otherwise also be the
  * first TEST of the Postgres-specific type surface. This spec freezes the
  * dialect decisions for the types a Postgres profile actually meets
  * (uuid/jsonb primary keys, timestamptz audit columns, arrays), so a Spark
  * upgrade that changes them fails here, not in production.
  *
  * `None` assertions are the dialect DEFERRING to Spark's common JDBC
  * mapping (BIGINT→Long, DOUBLE→Double, BIT(1)→Boolean, BINARY→Binary) —
  * pinned as None so a dialect override sneaking in is equally visible.
  */
class PostgresDialectSpec extends AnyFunSuite {

  private val dialect = JdbcDialects.get("jdbc:postgresql://localhost:5432/db")

  private def mapped(sqlType: Int, typeName: String, size: Int = 0): Option[DataType] =
    dialect.getCatalystType(sqlType, typeName, size, new MetadataBuilder())

  test("the postgres url resolves to the postgres dialect, not the generic one") {
    assert(dialect.getClass.getName.contains("Postgres"))
    assert(dialect.canHandle("jdbc:postgresql://any/where"))
  }

  test("uuid and json(b) columns arrive as strings") {
    // pg JDBC reports these as Types.OTHER + the pg type name
    assert(mapped(Types.OTHER, "uuid") == Some(StringType))
    assert(mapped(Types.OTHER, "jsonb") == Some(StringType))
    assert(mapped(Types.OTHER, "json") == Some(StringType))
  }

  test("timestamptz maps to the session-zoned timestamp; plain timestamp defers") {
    assert(mapped(Types.TIMESTAMP, "timestamptz") == Some(TimestampType))
    // tz-less timestamp is resolved by the common layer (honoring
    // preferTimestampNTZ), not overridden by the dialect
    assert(mapped(Types.TIMESTAMP, "timestamp") == None)
  }

  test("postgres arrays map to Spark arrays with the right element types") {
    assert(mapped(Types.ARRAY, "_int4") == Some(ArrayType(IntegerType)))
    assert(mapped(Types.ARRAY, "_int8") == Some(ArrayType(LongType)))
    assert(mapped(Types.ARRAY, "_text") == Some(ArrayType(StringType)))
    assert(mapped(Types.ARRAY, "_float8") == Some(ArrayType(DoubleType)))
  }

  test("scalar base types defer to the common JDBC mapping") {
    assert(mapped(Types.BIGINT, "int8") == None)
    assert(mapped(Types.DOUBLE, "float8") == None)
    assert(mapped(Types.BIT, "bool", size = 1) == None)
    assert(mapped(Types.BINARY, "bytea") == None)
  }

  test("identifier quoting is postgres double-quote style") {
    assert(dialect.quoteIdentifier("a table") == "\"a table\"")
    assert(dialect.quoteIdentifier("mixed\"quote") == "\"mixed\"\"quote\"")
  }
}
