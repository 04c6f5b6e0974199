package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Fixtures.table

/** Relational operator coverage (SURVEY §2.2 P*, §2.3 J*, §2.4 A*, §2.5):
  * joins (inner/left/semi/anti/broadcast), group-by aggregation, window
  * functions, sort+limit, set ops — each with a DuckDB oracle twin.
  *
  * Cross-engine float determinism: every SUM over doubles goes through
  * DECIMAL so partial-aggregation order can't change the result
  * (decimal addition is exact and associative; double addition is not).
  * The final cast back to DOUBLE is then bit-identical on both engines.
  * At scale this costs nothing — decimal sums still partial-aggregate
  * map-side.
  */
object Relational {

  /** `sum(x)` computed exactly: cast to decimal, sum, cast back to double. */
  private def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(s"decimal(18,$scale)")).cast("double")

  /** Exact revenue term: decimal multiply keeps it order-independent. */
  private def revenueTerm(price: Column, discount: Column): Column =
    price.cast("decimal(18,2)") * (lit(1).cast("decimal(18,2)") - discount.cast("decimal(18,2)"))

  /** TPC-H Q1-shaped pricing summary: partial-agg-friendly group-by over the
    * fact table, no joins — the canonical "does aggregation scale" probe. */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        sum(revenueTerm(col("l_extendedprice"), col("l_discount"))).cast("double").as("sum_disc_price"),
        (sum(col("l_quantity").cast("decimal(18,2)")).cast("double") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val q1Oracle: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty,
      |  count(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Star-schema rollup: fact ⨝ 3 dims → revenue per region. The dimension
    * tables are broadcast (region/nation always; customer is small relative
    * to lineitem at every SF — at true 100 TB customer would flip to a
    * shuffle join, which AQE decides from runtime sizes). */
  def revenueByRegion(spark: SparkSession, dir: String): DataFrame = {
    val li = table(spark, dir, "lineitem")
    val o = table(spark, dir, "orders")
    val c = table(spark, dir, "customer")
    val n = table(spark, dir, "nation")
    val r = table(spark, dir, "region")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(
        sum(revenueTerm(col("l_extendedprice"), col("l_discount"))).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("r_name")
  }

  val revenueByRegionOracle: String =
    """SELECT r_name,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name
      |ORDER BY r_name""".stripMargin

  /** TPC-H Q3 (shipping priority): revenue of unshipped BUILDING-segment
    * orders as of the cut date — the canonical selective-filter +
    * fact-fact join + top-k plan: both date filters push into the scans,
    * customer broadcasts, and the top-10 is a TakeOrdered, never a global
    * sort. Revenue through DECIMAL (order-independent), ties broken on
    * o_orderkey. */
  def q3ShippingPriority(spark: SparkSession, dir: String, cut: String = "1997-01-01"): DataFrame =
    table(spark, dir, "lineitem").filter(col("l_shipdate") > lit(cut))
      .join(table(spark, dir, "orders").filter(col("o_orderdate") < lit(cut)),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(table(spark, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")),
        col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy(col("o_orderkey"), col("o_orderdate").cast("date").as("o_orderdate"),
        col("o_orderpriority"))
      .agg(sum(revenueTerm(col("l_extendedprice"), col("l_discount"))).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
      .select("o_orderkey", "revenue", "o_orderdate", "o_orderpriority")

  def q3Oracle(cut: String = "1997-01-01"): String =
    s"""SELECT o_orderkey,
       |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       |  CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |WHERE l_shipdate > '$cut' AND o_orderdate < '$cut'
       |  AND o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
       |GROUP BY o_orderkey, CAST(o_orderdate AS DATE), o_orderpriority
       |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin

  /** TPC-H Q10 (returned items): revenue lost to returns per customer in a
    * quarter, top 20 — selective date + flag filters at the scans, the
    * nation dim broadcast, one keyed aggregate, TakeOrdered. */
  def q10ReturnedItems(spark: SparkSession, dir: String,
      qStart: String = "1996-01-01", qEnd: String = "1996-04-01"): DataFrame =
    table(spark, dir, "lineitem").filter(col("l_returnflag") === "R")
      .join(table(spark, dir, "orders")
        .filter(col("o_orderdate") >= lit(qStart) && col("o_orderdate") < lit(qEnd)),
        col("l_orderkey") === col("o_orderkey"))
      .join(table(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(broadcast(table(spark, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "n_name")
      .agg(sum(revenueTerm(col("l_extendedprice"), col("l_discount"))).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
      .select("c_custkey", "c_name", "n_name", "revenue", "n_items")

  def q10Oracle(qStart: String = "1996-01-01", qEnd: String = "1996-04-01"): String =
    s"""SELECT c_custkey, c_name, n_name,
       |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
       |  count(*) AS n_items
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |WHERE l_returnflag = 'R' AND o_orderdate >= '$qStart' AND o_orderdate < '$qEnd'
       |GROUP BY c_custkey, c_name, n_name
       |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  /** TPC-H Q18 (large-volume customers): orders whose total quantity
    * clears a threshold, with their customer — the HAVING-subquery join
    * shape: the per-order rollup reduces the fact table FIRST (partial
    * aggregation map-side), and only qualifying orderkeys join back to
    * orders/customer. Quantity through DECIMAL; top-100 is TakeOrdered
    * with (o_totalprice DESC, o_orderkey) tie-break. */
  def q18LargeVolume(spark: SparkSession, dir: String, minQty: Double = 150.0): DataFrame = {
    val big = table(spark, dir, "lineitem")
      .groupBy("l_orderkey")
      .agg(dsum(col("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > minQty)
    table(spark, dir, "orders")
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(table(spark, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("o_orderdate"),
        col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  def q18Oracle(minQty: Double = 150.0): String =
    s"""SELECT c_custkey, c_name, o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
       |  o_totalprice, sum_qty
       |FROM orders
       |JOIN (
       |  SELECT l_orderkey, CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
       |  FROM lineitem GROUP BY l_orderkey
       |  HAVING CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) > $minQty
       |) big ON o_orderkey = big.l_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""".stripMargin

  /** Left-outer join + COALESCE(…, 0) + GREATEST clamp — the reference's J2
    * join shape (`/root/reference/src/listTables.tsx:331-342`) and its
    * F1/F2/A5 scalar functions, over real data: per-customer order counts
    * with 0 for order-less customers. */
  def customerOrderCounts(spark: SparkSession, dir: String): DataFrame = {
    val c = table(spark, dir, "customer")
    val counts = table(spark, dir, "orders").groupBy("o_custkey").agg(count(lit(1)).as("cnt"))
    c.join(counts, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"), greatest(coalesce(col("cnt"), lit(0L)), lit(0L)).as("order_count"))
      .orderBy("c_custkey")
  }

  val customerOrderCountsOracle: String =
    """SELECT c_custkey, GREATEST(COALESCE(cnt, 0), 0) AS order_count
      |FROM customer
      |LEFT JOIN (SELECT o_custkey, count(*) AS cnt FROM orders GROUP BY o_custkey) o
      |  ON c_custkey = o_custkey
      |ORDER BY c_custkey""".stripMargin

  /** Semi join — customers WITH orders (EXISTS). */
  def customersWithOrders(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "customer")
      .join(table(spark, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey")
      .orderBy("c_custkey")

  val customersWithOrdersOracle: String =
    """SELECT c_custkey FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin

  /** Threshold making the anti join DISCRIMINATING on the fixtures
    * (VERDICT r14 #3: every customer has at least one order, so the raw
    * anti join gated 0 rows — a hash match on the empty set checks
    * nothing). Against orders above this total price, both sides are
    * non-empty at every fixture SF (sf0.001: 3/147, sf0.01: 30/1470,
    * sf0.1: 308/14692). */
  private val BigOrderPrice = 300000

  /** Anti join — customers WITHOUT a big-ticket order (NOT EXISTS over a
    * filtered build side; the filter pushes into the orders scan). */
  def customersWithoutOrders(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "customer")
      .join(table(spark, dir, "orders").filter(col("o_totalprice") > BigOrderPrice),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey")
      .orderBy("c_custkey")

  val customersWithoutOrdersOracle: String =
    s"""SELECT c_custkey FROM customer
       |WHERE NOT EXISTS (SELECT 1 FROM orders
       |                  WHERE o_custkey = c_custkey AND o_totalprice > $BigOrderPrice)
       |ORDER BY c_custkey""".stripMargin

  /** Window function: top-2 orders per customer by total price
    * (deterministic tie-break on order key). */
  def topOrdersPerCustomer(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("o_totalprice").desc, col("o_orderkey"))
    table(spark, dir, "orders")
      .withColumn("rn", row_number().over(w).cast("bigint"))
      .filter(col("rn") <= 2)
      .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
      .orderBy("o_custkey", "rn")
  }

  val topOrdersPerCustomerOracle: String =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders) t
      |WHERE rn <= 2
      |ORDER BY o_custkey, rn""".stripMargin

  /** Global sort + limit (top-k pushes down to a TakeOrdered physical op —
    * no full sort materialization). */
  def topOrdersGlobal(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "orders")
      .select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)

  val topOrdersGlobalOracle: String =
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin

  /** Set op: nation keys with customers but no TOP-tier supplier (EXCEPT).
    * The subtrahend is the nations of the global top-[[EliteSuppliers]]
    * suppliers by account balance (deterministic tie-break on key), NOT
    * all suppliers: every nation has suppliers at every fixture SF, so
    * the raw EXCEPT gated 0 rows (VERDICT r14 #3) — and a fixed-size
    * top-k stays discriminating at ANY scale because its nation coverage
    * cannot grow past k (sf0.001/0.01/0.1: 15/17/16 of 25 nations). The
    * top-k side plans as TakeOrdered — no full sort. */
  def customerOnlyNations(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "customer").select(col("c_nationkey").as("nationkey"))
      .except(
        table(spark, dir, "supplier")
          .orderBy(col("s_acctbal").desc, col("s_suppkey"))
          .limit(EliteSuppliers)
          .select(col("s_nationkey").as("nationkey")))
      .orderBy("nationkey")

  private val EliteSuppliers = 10

  val customerOnlyNationsOracle: String =
    s"""SELECT c_nationkey AS nationkey FROM customer
       |EXCEPT
       |SELECT s_nationkey AS nationkey FROM (
       |  SELECT s_nationkey FROM supplier
       |  ORDER BY s_acctbal DESC, s_suppkey LIMIT $EliteSuppliers) t
       |ORDER BY nationkey""".stripMargin

  /** Scalar subquery: customers with above-average balance. The average is
    * computed exactly (decimal) so both engines compare against the
    * identical threshold double. Catalyst plans the subquery as a separate
    * stage whose single-row result feeds the filter — no rewrite needed. */
  def aboveAverageCustomers(spark: SparkSession, dir: String): DataFrame = {
    val c = table(spark, dir, "customer")
    val avgBal = c.agg(
      (sum(col("c_acctbal").cast("decimal(18,2)")).cast("double") / count(lit(1))).as("avg_bal"))
    // broadcast the 1-row aggregate instead of collecting it on the driver —
    // same plan shape Catalyst builds for a scalar subquery
    c.join(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .select("c_custkey", "c_acctbal")
      .orderBy("c_custkey")
  }

  val aboveAverageCustomersOracle: String =
    """SELECT c_custkey, c_acctbal FROM customer
      |WHERE c_acctbal > (
      |  SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / count(*) FROM customer)
      |ORDER BY c_custkey""".stripMargin

  /** Rollup (hierarchical grouping sets): pricing counts at (flag, status),
    * (flag), and grand-total levels in one pass — Spark expands grouping
    * sets before the aggregate, so it is still a single shuffle. */
  def pricingRollup(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  val pricingRollupOracle: String =
    """SELECT l_returnflag, l_linestatus, count(*) AS n,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  /** Cube: all 2ᵏ grouping combinations of (returnflag, linestatus) in one
    * pass (rollup's superset — SURVEY §2.4 notes the reference has no
    * grouping sets at all). */
  def pricingCube(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "lineitem")
      .cube("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("n"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  val pricingCubeOracle: String =
    """SELECT l_returnflag, l_linestatus, count(*) AS n
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin

  /** As-of join, composed from built-ins (the preferred tier when semantics
    * allow — SURVEY §2.3 notes Spark lacks a native ASOF): for every
    * 'click' event, the most recent 'error' of the same user at-or-before
    * it. Union both sides tagged, sort per user by (time, err-first at
    * ties), carry the last error id forward with an IGNORE NULLS window —
    * ONE shuffle + sort, no join blow-up, no range-join quadratic risk.
    * The DuckDB oracle uses its native ASOF LEFT JOIN. */
  def asOfClickError(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
      .select(col("user_id"), unix_micros(col("ts").cast("timestamp")).as("tus"),
        col("event_id"), col("event_type"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("tus"), col("event_id"), lit(null).cast("bigint").as("err_id"), lit(0).as("is_err"))
    val errs = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("tus"), lit(null).cast("bigint").as("event_id"), col("event_id").as("err_id"), lit(1).as("is_err"))
    // errors sort before clicks at equal tus: `e.tus <= c.tus` is inclusive
    val w = Window.partitionBy("user_id")
      .orderBy(col("tus"), col("is_err").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionAll(errs)
      .withColumn("last_err", last(col("err_id"), ignoreNulls = true).over(w))
      .filter(col("is_err") === 0)
      .select(col("event_id"), col("user_id"), col("tus"), col("last_err").as("err_id"))
      .orderBy("event_id")
  }

  val asOfClickErrorOracle: String =
    """WITH clicks AS (
      |  SELECT user_id, epoch_us(ts) AS tus, event_id FROM events WHERE event_type = 'click'
      |), errs AS (
      |  SELECT user_id, epoch_us(ts) AS tus, event_id AS err_id FROM events WHERE event_type = 'error'
      |)
      |SELECT c.event_id, c.user_id, c.tus, e.err_id
      |FROM clicks c ASOF LEFT JOIN errs e
      |  ON c.user_id = e.user_id AND e.tus <= c.tus
      |ORDER BY c.event_id""".stripMargin

  /** Skew-resistant join via key salting: lineitem's supplier key is heavily
    * skewed at scale (few suppliers, many line items). The big side gets a
    * deterministic salt (`l_orderkey % 8`); the small side is exploded ×8 so
    * every (suppkey, salt) bucket exists — one skewed reducer becomes 8
    * evenly-loaded ones. Result is identical to the unsalted join (the
    * oracle is the plain join); AQE's skew-join handles the same problem
    * reactively, salting handles it by construction. */
  def saltedSupplierRevenue(spark: SparkSession, dir: String, salts: Int = 8): DataFrame = {
    val li = table(spark, dir, "lineitem")
      .withColumn("salt", (col("l_orderkey") % salts).cast("int"))
    val s = table(spark, dir, "supplier")
      .withColumn("salt", explode(array((0 until salts).map(lit): _*)))
    li.join(s, col("l_suppkey") === col("s_suppkey") && li("salt") === s("salt"))
      .groupBy("s_suppkey", "s_name")
      .agg(
        sum(revenueTerm(col("l_extendedprice"), col("l_discount"))).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy("s_suppkey")
  }

  val saltedSupplierRevenueOracle: String =
    """SELECT s_suppkey, s_name,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY s_suppkey, s_name
      |ORDER BY s_suppkey""".stripMargin

  /** Set op: nation keys with both customers and suppliers (INTERSECT). */
  def sharedNations(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "customer").select(col("c_nationkey").as("nationkey"))
      .intersect(table(spark, dir, "supplier").select(col("s_nationkey").as("nationkey")))
      .orderBy("nationkey")

  val sharedNationsOracle: String =
    """SELECT c_nationkey AS nationkey FROM customer
      |INTERSECT
      |SELECT s_nationkey AS nationkey FROM supplier
      |ORDER BY nationkey""".stripMargin
}
