package graft.profile

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Joinability profile: the exact distinct-set overlap and its mergeable-HLL
  * 100 TB twin. The exact form is also driver-oracled (profile_key_overlap);
  * here we pin the semantic invariants the fixture graph guarantees and the
  * sketch twin's in-query tolerance booleans.
  */
class KeyOverlapSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  val dir = SparkSuite.Sf0001

  test("exact overlap: referential integrity of the fixture FK graph") {
    val rows = ProfileQueries.keyOverlap(spark, dir).collect()
    assert(rows.length == ProfileQueries.keyPairs.length)
    rows.foreach { r =>
      val ndvPk = r.getLong(r.fieldIndex("ndv_pk"))
      val ndvFk = r.getLong(r.fieldIndex("ndv_fk"))
      val common = r.getLong(r.fieldIndex("n_common"))
      val orphan = r.getLong(r.fieldIndex("orphan_fk"))
      val pm = r.getLong(r.fieldIndex("containment_pm"))
      assert(ndvPk > 0 && ndvFk > 0, s"$r")
      assert(common <= math.min(ndvPk, ndvFk))
      assert(orphan == ndvFk - common, s"orphan must be the fk-only remainder: $r")
      assert(pm >= 0 && pm <= 1000)
      // TPC-H-ish generators emit FKs drawn from the PK domain: no orphans
      assert(orphan == 0, s"fixture FK ${r.getString(3)} has orphans: $r")
      assert(pm == 1000)
    }
    // lineitem.l_orderkey covers only ordered keys; customer coverage by
    // orders is partial (not every customer has an order) — ndv sanity
    val custOrders = rows.find(r => r.getString(2) == "orders").get
    assert(custOrders.getLong(custOrders.fieldIndex("ndv_fk")) <=
      custOrders.getLong(custOrders.fieldIndex("ndv_pk")))
  }

  test("sketch FK discovery: every true FK pair detected near 1000 permille; direction sane") {
    val cands = ProfileQueries.fkDiscovery(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3)) ->
        r.getLong(r.fieldIndex("containment_pm"))).toMap
    ProfileQueries.keyPairs.foreach { case (pt, pc, ft, fc) =>
      val pm = cands.get((pt, pc, ft, fc))
      assert(pm.isDefined, s"true FK $ft.$fc ⊆ $pt.$pc not discovered")
      assert(pm.get >= 950, s"true FK $ft.$fc ⊆ $pt.$pc containment $pm")
    }
    // true negative: the fixtures' 0-based sequential keys make every
    // small domain a subset of every larger one, so the only structural
    // negatives run big-into-small — 200 part keys cannot live inside 10
    // supplier keys (containment ≈ 50 ‰, far under the 900 cut)
    val neg = cands.get(("supplier", "s_suppkey", "part", "p_partkey"))
    assert(neg.isEmpty, s"200-key column read as contained in a 10-key column: $neg")
  }

  test("ERD classes: TPC-H edges classify one_to_many with exact fanouts; weak on a broken pair") {
    val rows = ProfileQueries.erdClasses(spark, dir).collect()
    assert(rows.length == ProfileQueries.keyPairs.length)
    rows.foreach { r =>
      // the fixture's declared FK edges: full containment, unique pk side,
      // non-unique fk side → every edge must read one_to_many
      assert(r.getString(r.fieldIndex("rel_class")) == "one_to_many", r.toString)
      assert(r.getLong(r.fieldIndex("containment_pm")) == 1000L)
      assert(r.getLong(r.fieldIndex("orphan_fk")) == 0L)
      assert(r.getBoolean(r.fieldIndex("pk_unique")))
      val fanout = r.getLong(r.fieldIndex("fanout_milli"))
      assert(fanout == (r.getLong(r.fieldIndex("fk_rows")) * 1000
        + r.getLong(r.fieldIndex("ndv_fk")) / 2) / r.getLong(r.fieldIndex("ndv_fk")))
      assert(fanout > 1000L, s"a real FK edge should fan out: $r")
    }
    // orders→lineitem fan-out is the TPC-H ~4 lines/order
    val oli = rows.find(r => r.getString(0) == "orders").get
    assert(oli.getLong(oli.fieldIndex("fanout_milli")) / 1000 == 4)
  }

  test("sketch twin: every tolerance boolean holds and exact columns agree") {
    val exact = ProfileQueries.keyOverlap(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(2), r.getString(3)) ->
        (r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))).toMap
    val rows = ProfileQueries.keyOverlapSketch(spark, dir).collect()
    assert(rows.length == ProfileQueries.keyPairs.length)
    rows.foreach { r =>
      val key = (r.getString(0), r.getString(2), r.getString(3))
      assert(exact(key) == ((r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))))
      assert(r.getBoolean(r.fieldIndex("ok_pk")), s"ok_pk: $r")
      assert(r.getBoolean(r.fieldIndex("ok_fk")), s"ok_fk: $r")
      assert(r.getBoolean(r.fieldIndex("ok_common")), s"ok_common: $r")
    }
  }
}
