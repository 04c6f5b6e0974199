package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.profile.Profiler
import graft.render.TableRenderer

/** t1 smoke: the full exact-mode profile of the sf0.001 catalog must match
  * the checked-in golden text byte-for-byte (SURVEY §5.2 "golden
  * end-to-end"). Regenerate deliberately if semantics change:
  * render → src/test/resources/golden_sf0.001_exact.txt.
  */
class GoldenRenderSpec extends AnyFunSuite {

  test("full sf0.001 exact profile matches golden output") {
    val spark = SparkSuite.spark
    val rendered = TableRenderer.render(
      Profiler.profileRoot(spark, SparkSuite.Sf0001, exact = true), TableRenderer.Exact)
    val golden = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
        getClass.getClassLoader.getResource("golden_sf0.001_exact.txt").toURI)),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(rendered == golden)
  }
}
