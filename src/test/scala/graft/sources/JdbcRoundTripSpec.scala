package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Round-trip through a REAL JDBC database — embedded Apache Derby, which
  * ships on Spark's classpath (and has a registered JdbcDialect), so the
  * reference's literal source path (`/root/reference/src/listTables.tsx:504`
  * connects over the Postgres wire protocol) is exercised end-to-end:
  * Spark's JDBCRelation scan, dialect type mapping, and the write path.
  * Only the wire protocol differs from a network Postgres — there is no
  * database server in the test container (SURVEY §7.5).
  */
class JdbcRoundTripSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  test("jdbc write+read round-trips the nation fixture through embedded Derby") {
    val home = Files.createTempDirectory("derby_home")
    System.setProperty("derby.system.home", home.toString) // keep derby.log out of the repo
    val url = s"jdbc:derby:${home.resolve("db")};create=true"
    val nation = spark.read.parquet(s"${SparkSuite.Sf0001}/nation.parquet")
    TableSources.writeJdbc(nation, url, "nation", "app", "app")
    val back = TableSources.readJdbc(spark, url, "nation", "app", "app")
    // dialect maps long->BIGINT, string->CLOB/VARCHAR; values must survive exactly
    assert(back.count() == nation.count())
    val a = nation.orderBy("n_nationkey").collect().map(_.toSeq.map(String.valueOf))
    val b = back.orderBy("n_nationkey")
      .select(nation.columns.map(col): _*) // same column order
      .collect().map(_.toSeq.map(String.valueOf))
    assert(a.toSeq == b.toSeq, "round-tripped rows differ")
    // predicate pushdown reaches the JDBC source (filter shipped as SQL)
    val filtered = TableSources.readJdbc(spark, url, "nation", "app", "app")
      .filter(col("n_regionkey") === 0L)
    assert(filtered.count() == nation.filter(col("n_regionkey") === 0L).count())
  }
}
