package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Fixtures.table

/** TPC-H battery #2 (round 9): the remaining classic queries expressible on
  * the fixture star schema (no `partsupp` table; no
  * `l_shipmode`/`l_commitdate`/`l_receiptdate`/`p_container`/`c_phone`
  * columns — q4/q17/q19/q21/q22 are adapted to the columns that exist,
  * keeping each query's canonical PLAN SHAPE, which is what the battery is
  * for). Full TPC-H spec semantics per query are noted inline.
  *
  * Scale design notes apply battery-wide:
  *  - every date/brand/segment filter is written at the scan so it reaches
  *    the parquet reader as a pushed filter (`.explain` PushedFilters);
  *  - dimension sides (region/nation/supplier/part/1-row aggregates) are
  *    broadcast — the only shuffles left are the fact-fact joins and the
  *    final keyed aggregates, which partial-aggregate map-side;
  *  - EXISTS / NOT EXISTS become left_semi / left_anti hash joins with an
  *    equi component (orderkey/custkey), never nested-loop;
  *  - top-k outputs are orderBy+limit → TakeOrderedAndProject, never a
  *    global sort;
  *  - every double aggregate routes through DECIMAL (see [[Relational]])
  *    so partial-aggregation order can't flip result bits vs the oracle.
  */
object TpchBattery {

  private def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(s"decimal(18,$scale)")).cast("double")

  /** decimal(18,2) * (1 - decimal(18,2)) — exact, order-independent. */
  private def revenueTerm(price: Column, discount: Column): Column =
    price.cast("decimal(18,2)") * (lit(1).cast("decimal(18,2)") - discount.cast("decimal(18,2)"))

  // ---------------------------------------------------------------- Q4

  /** TPC-H Q4 (order-priority checking), adapted: the spec's
    * `l_commitdate < l_receiptdate` late-line predicate doesn't exist in the
    * fixtures, so "late" is `l_shipdate > o_orderdate + 60 days`. The plan
    * shape is the spec's: quarter-filtered orders EXISTS-joined (left_semi)
    * to lineitem on the order key with the non-equi lateness condition,
    * then a tiny priority rollup. The semi join keeps each order once no
    * matter how many late lines it has — a plain join would double-count. */
  def q4LateOrders(spark: SparkSession, dir: String,
      qStart: String = "1996-07-01", qEnd: String = "1996-10-01"): DataFrame = {
    val o = table(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit(qStart) && col("o_orderdate") < lit(qEnd))
    val li = table(spark, dir, "lineitem").select("l_orderkey", "l_shipdate")
    o.join(li,
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  def q4Oracle(qStart: String = "1996-07-01", qEnd: String = "1996-10-01"): String =
    s"""SELECT o_orderpriority, count(*) AS order_count
       |FROM orders
       |WHERE o_orderdate >= '$qStart' AND o_orderdate < '$qEnd'
       |  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
       |              AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
       |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- Q5

  /** TPC-H Q5 (local supplier volume), verbatim: revenue per nation where
    * the customer and supplier share the nation, one region, one year.
    * supplier/nation/region broadcast; the `c_nationkey = s_nationkey`
    * residual rides on the lineitem⨝supplier hash join. */
  def q5LocalSupplierVolume(spark: SparkSession, dir: String,
      region: String = "ASIA", yStart: String = "1996-01-01", yEnd: String = "1997-01-01"): DataFrame = {
    val c = table(spark, dir, "customer").select("c_custkey", "c_nationkey")
    val o = table(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit(yStart) && col("o_orderdate") < lit(yEnd))
      .select("o_orderkey", "o_custkey")
    val li = table(spark, dir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    val s = table(spark, dir, "supplier").select("s_suppkey", "s_nationkey")
    val n = table(spark, dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    val r = table(spark, dir, "region").filter(col("r_name") === region).select("r_regionkey")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(s),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"), "left_semi")
      .groupBy("n_name")
      .agg(sum(revenueTerm(col("l_extendedprice"), col("l_discount"))).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  def q5Oracle(region: String = "ASIA",
      yStart: String = "1996-01-01", yEnd: String = "1997-01-01"): String =
    s"""SELECT n_name,
       |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
       |FROM customer JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name = '$region' AND o_orderdate >= '$yStart' AND o_orderdate < '$yEnd'
       |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  // ---------------------------------------------------------------- Q6

  /** TPC-H Q6 (forecasting revenue change), verbatim: a pure
    * filter-and-aggregate over the fact table — zero joins, zero shuffles
    * past the final 1-row reduce. All three predicates push to the scan;
    * the canonical "is the scan path fast" probe. */
  def q6ForecastRevenue(spark: SparkSession, dir: String,
      yStart: String = "1996-01-01", yEnd: String = "1997-01-01"): DataFrame =
    table(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit(yStart) && col("l_shipdate") < lit(yEnd) &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(
        sum(col("l_extendedprice").cast("decimal(18,2)") * col("l_discount").cast("decimal(18,2)"))
          .cast("double").as("revenue"),
        count(lit(1)).as("n_items"))

  def q6Oracle(yStart: String = "1996-01-01", yEnd: String = "1997-01-01"): String =
    s"""SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
       |  count(*) AS n_items
       |FROM lineitem
       |WHERE l_shipdate >= '$yStart' AND l_shipdate < '$yEnd'
       |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  // ---------------------------------------------------------------- Q7

  /** TPC-H Q7 (volume shipping), verbatim: bilateral trade volume between
    * two nations by ship year. Both nation dims are pre-filtered to the two
    * names BEFORE their broadcast joins — the pair filter then only has to
    * drop same-nation rows. */
  def q7VolumeShipping(spark: SparkSession, dir: String,
      nationA: String = "NATION_3", nationB: String = "NATION_7",
      dStart: String = "1995-01-01", dEnd: String = "1997-01-01"): DataFrame = {
    val names = Seq(nationA, nationB)
    val n1 = table(spark, dir, "nation").filter(col("n_name").isin(names: _*))
      .select(col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation"))
    val n2 = table(spark, dir, "nation").filter(col("n_name").isin(names: _*))
      .select(col("n_nationkey").as("c_nkey"), col("n_name").as("cust_nation"))
    val s = table(spark, dir, "supplier").select("s_suppkey", "s_nationkey")
    val c = table(spark, dir, "customer").select("c_custkey", "c_nationkey")
    val o = table(spark, dir, "orders").select("o_orderkey", "o_custkey")
    table(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit(dStart) && col("l_shipdate") < lit(dEnd))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nkey"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(sum(revenueTerm(col("l_extendedprice"), col("l_discount"))).cast("double").as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  def q7Oracle(nationA: String = "NATION_3", nationB: String = "NATION_7",
      dStart: String = "1995-01-01", dEnd: String = "1997-01-01"): String =
    s"""SELECT supp_nation, cust_nation, l_year, CAST(sum(volume) AS DOUBLE) AS revenue FROM (
       |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |         CAST(year(l_shipdate) AS INTEGER) AS l_year,
       |         CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume
       |  FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
       |  JOIN orders ON o_orderkey = l_orderkey
       |  JOIN customer ON c_custkey = o_custkey
       |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
       |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
       |  WHERE ((n1.n_name = '$nationA' AND n2.n_name = '$nationB')
       |      OR (n1.n_name = '$nationB' AND n2.n_name = '$nationA'))
       |    AND l_shipdate >= '$dStart' AND l_shipdate < '$dEnd') t
       |GROUP BY supp_nation, cust_nation, l_year
       |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  // ---------------------------------------------------------------- Q8

  /** TPC-H Q8 (national market share), verbatim shape: one nation's share
    * of a region's import volume for one part type, by order year. The
    * conditional numerator uses `sum(when(...))` with NULL else — identical
    * NULL-skip semantics on both engines — and the share divides two
    * exact-decimal-derived doubles, so the ratio is bit-identical. */
  def q8MarketShare(spark: SparkSession, dir: String,
      nation: String = "NATION_7", region: String = "ASIA", ptype: String = "ECONOMY",
      dStart: String = "1995-01-01", dEnd: String = "1997-01-01"): DataFrame = {
    val p = table(spark, dir, "part").filter(col("p_type") === ptype).select("p_partkey")
    val s = table(spark, dir, "supplier").select("s_suppkey", "s_nationkey")
    val o = table(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit(dStart) && col("o_orderdate") < lit(dEnd))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val c = table(spark, dir, "customer").select("c_custkey", "c_nationkey")
    val n1 = table(spark, dir, "nation").select("n_nationkey", "n_regionkey")
    val r = table(spark, dir, "region").filter(col("r_name") === region).select("r_regionkey")
    val n2 = table(spark, dir, "nation")
      .select(col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation"))
    table(spark, dir, "lineitem")
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(broadcast(s), col("l_suppkey") === col("s_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"), "left_semi")
      .join(broadcast(n2), col("s_nationkey") === col("s_nkey"))
      .select(year(col("o_orderdate")).as("o_year"),
        revenueTerm(col("l_extendedprice"), col("l_discount")).as("volume"),
        col("supp_nation"))
      .groupBy("o_year")
      .agg((sum(when(col("supp_nation") === nation, col("volume"))).cast("double") /
        sum(col("volume")).cast("double")).as("mkt_share"))
      .orderBy("o_year")
  }

  def q8Oracle(nation: String = "NATION_7", region: String = "ASIA", ptype: String = "ECONOMY",
      dStart: String = "1995-01-01", dEnd: String = "1997-01-01"): String =
    s"""SELECT o_year,
       |  CAST(sum(CASE WHEN nation = '$nation' THEN volume END) AS DOUBLE)
       |    / CAST(sum(volume) AS DOUBLE) AS mkt_share
       |FROM (
       |  SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
       |         CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS volume,
       |         n2.n_name AS nation
       |  FROM part JOIN lineitem ON p_partkey = l_partkey
       |  JOIN supplier ON s_suppkey = l_suppkey
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
       |  JOIN region ON n1.n_regionkey = r_regionkey
       |  JOIN nation n2 ON s_nationkey = n2.n_nationkey
       |  WHERE r_name = '$region' AND p_type = '$ptype'
       |    AND o_orderdate >= '$dStart' AND o_orderdate < '$dEnd') t
       |GROUP BY o_year ORDER BY o_year""".stripMargin

  // ---------------------------------------------------------------- Q13

  /** TPC-H Q13 (customer distribution), verbatim minus the spec's comment
    * LIKE-filter (no o_comment column): histogram of customers by order
    * count. Two aggregates; the first reduces orders to one row per
    * customer BEFORE the left join's null-preserving count, the second is a
    * tiny histogram reduce. */
  def q13CustomerDistribution(spark: SparkSession, dir: String): DataFrame = {
    val perCust = table(spark, dir, "customer").select("c_custkey")
      .join(table(spark, dir, "orders").select("o_custkey", "o_orderkey"),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
    perCust.groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val q13Oracle: String =
    """SELECT c_count, count(*) AS custdist FROM (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |  GROUP BY c_custkey) t
      |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin

  // ---------------------------------------------------------------- Q14

  /** TPC-H Q14 (promotion effect), verbatim: the month's PROMO share of
    * revenue as a percentage. part broadcast; conditional numerator via
    * NULL-skipping `sum(when(...))`; the final percentage is double
    * arithmetic over two exact decimal sums. */
  def q14PromoEffect(spark: SparkSession, dir: String,
      mStart: String = "1996-03-01", mEnd: String = "1996-04-01"): DataFrame =
    table(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit(mStart) && col("l_shipdate") < lit(mEnd))
      .join(broadcast(table(spark, dir, "part").select("p_partkey", "p_type")),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_type"),
        revenueTerm(col("l_extendedprice"), col("l_discount")).as("disc_price"))
      .agg(
        (lit(100.0) * sum(when(col("p_type") === "PROMO", col("disc_price"))).cast("double") /
          sum(col("disc_price")).cast("double")).as("promo_revenue"),
        count(lit(1)).as("n_items"))

  def q14Oracle(mStart: String = "1996-03-01", mEnd: String = "1996-04-01"): String =
    s"""SELECT 100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN disc_price END) AS DOUBLE)
       |    / CAST(sum(disc_price) AS DOUBLE) AS promo_revenue,
       |  count(*) AS n_items
       |FROM (SELECT p_type,
       |        CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS disc_price
       |      FROM lineitem JOIN part ON l_partkey = p_partkey
       |      WHERE l_shipdate >= '$mStart' AND l_shipdate < '$mEnd') t""".stripMargin

  // ---------------------------------------------------------------- Q15

  /** TPC-H Q15 (top supplier), verbatim: the quarter's revenue per supplier,
    * then the supplier(s) hitting the max. The max is a 1-row aggregate
    * broadcast back over the (tiny, supplier-cardinality) revenue frame —
    * the revenue frame is NOT recomputed twice: Catalyst reuses the
    * exchange for both branches. */
  def q15TopSupplier(spark: SparkSession, dir: String,
      qStart: String = "1996-01-01", qEnd: String = "1996-04-01"): DataFrame = {
    val revenue = table(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit(qStart) && col("l_shipdate") < lit(qEnd))
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(sum(revenueTerm(col("l_extendedprice"), col("l_discount"))).cast("double").as("total_revenue"))
    val maxRev = revenue.agg(max(col("total_revenue")).as("max_revenue"))
    table(spark, dir, "supplier")
      .join(revenue, col("s_suppkey") === col("supplier_no"))
      .join(broadcast(maxRev))
      .filter(col("total_revenue") === col("max_revenue"))
      .select("s_suppkey", "s_name", "total_revenue")
      .orderBy("s_suppkey")
  }

  def q15Oracle(qStart: String = "1996-01-01", qEnd: String = "1996-04-01"): String =
    s"""WITH revenue AS (
       |  SELECT l_suppkey AS supplier_no,
       |    CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS total_revenue
       |  FROM lineitem WHERE l_shipdate >= '$qStart' AND l_shipdate < '$qEnd'
       |  GROUP BY l_suppkey)
       |SELECT s_suppkey, s_name, total_revenue
       |FROM supplier JOIN revenue ON s_suppkey = supplier_no
       |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
       |ORDER BY s_suppkey""".stripMargin

  // ---------------------------------------------------------------- Q17

  /** TPC-H Q17 (small-quantity-order revenue), adapted: no `p_container`
    * column, so the part restriction is brand-only. The spec's correlated
    * `0.5 * avg(l_quantity)` subquery becomes a per-part aggregate joined
    * back — the decorrelation Catalyst itself performs on the SQL form.
    * The brand semi-join shrinks lineitem FIRST; the per-part avg runs on
    * the shrunken frame only (brand parts' lineitems are exactly the
    * correlation domain). avg over integer-valued doubles is exact, so the
    * threshold compare is deterministic. */
  def q17SmallQuantityRevenue(spark: SparkSession, dir: String,
      brand: String = "Brand#4"): DataFrame = {
    val keys = broadcast(table(spark, dir, "part")
      .filter(col("p_brand") === brand).select("p_partkey"))
    val brandLines = table(spark, dir, "lineitem")
      .join(keys, col("l_partkey") === col("p_partkey"), "left_semi")
    val halfAvg = brandLines.groupBy(col("l_partkey").as("hp_partkey"))
      .agg((lit(0.5) * avg(col("l_quantity"))).as("half_avg"))
    brandLines
      .join(broadcast(halfAvg), col("l_partkey") === col("hp_partkey"))
      .filter(col("l_quantity") < col("half_avg"))
      .agg((dsum(col("l_extendedprice")) / 7.0).as("avg_yearly"),
        count(lit(1)).as("n_items"))
  }

  def q17Oracle(brand: String = "Brand#4"): String =
    s"""SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0 AS avg_yearly,
       |  count(*) AS n_items
       |FROM lineitem JOIN part ON p_partkey = l_partkey
       |WHERE p_brand = '$brand'
       |  AND l_quantity < (SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
       |                    WHERE l2.l_partkey = p_partkey)""".stripMargin

  // ---------------------------------------------------------------- Q19

  /** TPC-H Q19 (discounted revenue), adapted: the spec's three disjunctive
    * (brand, container, quantity, shipmode) conjuncts become three
    * (brand, size, quantity) conjuncts on the columns that exist. The
    * plan-shape point survives intact: a disjunction of per-branch
    * conjuncts over a broadcast join, with the IMPLIED union bounds
    * (brand ∈ {...}, quantity ∈ [lo,hi]) written separately at each scan —
    * the coarse pushdown Catalyst cannot derive from the OR itself. */
  def q19DisjunctiveRevenue(spark: SparkSession, dir: String): DataFrame = {
    val branches = Seq(
      ("Brand#4", 1, 15, 1.0, 11.0),
      ("Brand#19", 10, 30, 10.0, 20.0),
      ("Brand#2", 20, 50, 20.0, 30.0))
    val brands = branches.map(_._1)
    val qLo = branches.map(_._4).min
    val qHi = branches.map(_._5).max
    val p = table(spark, dir, "part")
      .filter(col("p_brand").isin(brands: _*)) // implied: pushes to the part scan
      .select("p_partkey", "p_brand", "p_size")
    val li = table(spark, dir, "lineitem")
      .filter(col("l_quantity").between(qLo, qHi)) // implied union bound
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val disjunct = branches.map { case (b, sLo, sHi, lo, hi) =>
      col("p_brand") === b && col("p_size").between(sLo, sHi) &&
        col("l_quantity").between(lo, hi)
    }.reduce(_ || _)
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(disjunct)
      .agg(sum(revenueTerm(col("l_extendedprice"), col("l_discount"))).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  val q19Oracle: String =
    """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem JOIN part ON p_partkey = l_partkey
      |WHERE (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
      |   OR (p_brand = 'Brand#19' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 20)
      |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 30)""".stripMargin

  // ---------------------------------------------------------------- Q21

  /** TPC-H Q21 (suppliers who kept orders waiting), adapted: the spec's
    * `l_receiptdate > l_commitdate` lateness becomes
    * `l_shipdate > o_orderdate + 30 days`, keeping the hard part — the
    * EXISTS (another supplier contributed) + NOT EXISTS (no other supplier
    * shipped later) double-correlation — intact as one left_semi and one
    * left_anti hash join on the order key with supplier/date residuals.
    * Both probe the same lineitem projection; top-100 is TakeOrdered. */
  def q21WaitingSuppliers(spark: SparkSession, dir: String, lateDays: Int = 30): DataFrame = {
    val li = table(spark, dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    val fOrders = table(spark, dir, "orders")
      .filter(col("o_orderstatus") === "F").select("o_orderkey", "o_orderdate")
    val late = li.join(fOrders, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr(s"INTERVAL $lateDays DAYS"))
      .select("l_orderkey", "l_suppkey", "l_shipdate")
    val l2 = li.select(col("l_orderkey").as("lo2"), col("l_suppkey").as("ls2"))
    val l3 = li.select(col("l_orderkey").as("lo3"), col("l_suppkey").as("ls3"),
      col("l_shipdate").as("ld3"))
    late
      .join(l2, col("l_orderkey") === col("lo2") && col("l_suppkey") =!= col("ls2"), "left_semi")
      .join(l3, col("l_orderkey") === col("lo3") && col("l_suppkey") =!= col("ls3") &&
        col("ld3") > col("l_shipdate"), "left_anti")
      .join(broadcast(table(spark, dir, "supplier").select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(100)
  }

  def q21Oracle(lateDays: Int = 30): String =
    s"""SELECT s_name, count(*) AS numwait
       |FROM supplier JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
       |JOIN orders ON o_orderkey = l1.l_orderkey
       |WHERE o_orderstatus = 'F'
       |  AND l1.l_shipdate > o_orderdate + INTERVAL $lateDays DAY
       |  AND EXISTS (SELECT 1 FROM lineitem l2
       |              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
       |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
       |                  WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
       |                    AND l3.l_shipdate > l1.l_shipdate)
       |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin

  // ---------------------------------------------------------------- Q22

  /** TPC-H Q22 (global sales opportunity), adapted: no `c_phone`, so the
    * country-code IN-list becomes a market-segment IN-list and the country
    * grouping is the nation key. The shape is the spec's: an uncorrelated
    * scalar average (broadcast, 1 row) gates wealthy customers, a NOT
    * EXISTS anti-join drops those with recent orders, then a per-country
    * rollup. The spec's plain "no orders at all" is empty on these
    * fixtures (every customer orders), so recency keeps it non-trivial. */
  def q22IdleCustomers(spark: SparkSession, dir: String,
      recentCut: String = "1999-01-01"): DataFrame = {
    val segs = Seq("BUILDING", "AUTOMOBILE", "MACHINERY")
    val c = table(spark, dir, "customer")
      .filter(col("c_mktsegment").isin(segs: _*))
      .select("c_custkey", "c_nationkey", "c_acctbal")
    val avgBal = c.filter(col("c_acctbal") > 0.0)
      .agg((sum(col("c_acctbal").cast("decimal(18,2)")).cast("double") / count(lit(1)))
        .as("avg_bal"))
    val recent = table(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit(recentCut)).select("o_custkey")
    c.join(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey").as("cntry"))
      .agg(count(lit(1)).as("numcust"), dsum(col("c_acctbal")).as("totacctbal"))
      .orderBy("cntry")
  }

  def q22Oracle(recentCut: String = "1999-01-01"): String =
    s"""WITH pos AS (
       |  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_bal
       |  FROM customer
       |  WHERE c_acctbal > 0.0 AND c_mktsegment IN ('BUILDING','AUTOMOBILE','MACHINERY'))
       |SELECT c_nationkey AS cntry, count(*) AS numcust,
       |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
       |FROM customer, pos
       |WHERE c_mktsegment IN ('BUILDING','AUTOMOBILE','MACHINERY') AND c_acctbal > avg_bal
       |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
       |                  AND o_orderdate >= '$recentCut')
       |GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin
}
