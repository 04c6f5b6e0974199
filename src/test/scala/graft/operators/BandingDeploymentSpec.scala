package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Banding deployment gate (round 13, VERDICT r12 #6b): the production
  * banding constants must EQUAL [[Dedup.bandingPick]]'s measured
  * recommendation — a change to either the constants or the calibration
  * curve that makes them diverge breaks the build here, not in prose.
  * (The gated `dedup_banding_deployed` row proves both engines agree on
  * the comparison; this spec asserts the comparison's OUTCOME.) */
class BandingDeploymentSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  val dir = SparkSuite.Sf0001

  test("deployed banding equals the measured pick on the fixture") {
    val rows = Dedup.bandingDeployed(spark, dir).collect()
    assert(rows.length == 1)
    val r = rows(0)
    assert(r.getBoolean(r.fieldIndex("deployed_matches_pick")),
      s"deployed (${r.getLong(r.fieldIndex("deployed_n_bands"))} bands × " +
        s"${r.getLong(r.fieldIndex("deployed_band_size"))}) != picked " +
        s"(${r.getLong(r.fieldIndex("picked_n_bands"))} × " +
        s"${r.getLong(r.fieldIndex("picked_band_size"))}) — retune " +
        "NumHashes/BandSize or re-justify the deployment")
  }
}
