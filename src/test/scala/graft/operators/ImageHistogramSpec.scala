package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Luminance histogram + exposure screens through real PNG bytes. */
class ImageHistogramSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  private def png(w: Int, h: Int)(v: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val p = v(x, y); img.setRGB(x, y, (p << 16) | (p << 8) | p)
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("hand-built rasters: bins, gray sum, and the exact 64000 bin edges") {
    // left half black (gray 0, bin 0), right half white (gray 255000, bin 3)
    val half = Multimodal.grayHistogram(png(10, 4)((x, _) => if (x < 5) 0 else 255))
    assert(half == Multimodal.ImgHist(40, 20, 0, 0, 20, 20L * 255000))
    // gray 63000 (v=63) is bin 0; v=64 -> gray 64000 is bin 1: edge exact
    assert(Multimodal.grayHistogram(png(2, 2)((_, _) => 63)).b0 == 4)
    assert(Multimodal.grayHistogram(png(2, 2)((_, _) => 64)).b1 == 4)
    // a non-gray pixel uses the ITU weights: pure red = 299*200 = 59800 (bin 0)
    val img = new java.awt.image.BufferedImage(1, 1,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 200 << 16)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val red = Multimodal.grayHistogram(bos.toByteArray)
    assert(red.graySum == 299L * 200 && red.b0 == 1)
  }

  test("shot cuts: hand-built sequences hit the exact TV gate") {
    val uniform = png(8, 8)((x, y) => (x * 32 + y * 4) % 256) // spread over all bins
    val dark = png(8, 8)((x, y) => (x * 8 + y) % 128)         // bins 0-1 only
    // uniform→uniform: no cut; uniform→dark: cut; dark→dark: no cut
    val (nf, cuts, first) = Multimodal.shotCutStats(Seq(uniform, uniform, dark, dark))
    assert((nf, cuts, first) == ((4L, 1L, 2L)))
    // no frames distance under threshold: a single frame has no cuts
    assert(Multimodal.shotCutStats(Seq(uniform)) == ((1L, 0L, -1L)))
    // mismatched dimensions refuse loudly
    intercept[IllegalArgumentException](
      Multimodal.shotCutStats(Seq(uniform, png(9, 8)((_, _) => 0))))
  }

  test("shot-cut fixture: exactly one cut per clip, at the planted frame") {
    val rows = Multimodal.shotCutProfile(spark, SparkSuite.Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == 8L)
      assert(r.getLong(2) == 1L, s"doc $id: expected exactly the planted cut, got ${r.getLong(2)}")
      assert(r.getLong(3) == 2 + id % 5, s"doc $id: cut at wrong frame")
    }
  }

  test("exposure fixture: exactly the planted dark/bright frames flag") {
    val rows = Multimodal.imageHistogramProfile(spark, SparkSuite.Sf0001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) == (18 + id % 10) * (16 + id % 7), s"doc $id pixel count")
      assert(r.getLong(1) == r.getLong(2) + r.getLong(3) + r.getLong(4) + r.getLong(5),
        s"doc $id bins don't conserve pixels")
      assert(r.getBoolean(7) == (id % 9 == 0), s"doc $id under_exposed")
      assert(r.getBoolean(8) == (id % 9 == 1), s"doc $id over_exposed")
      if (id % 9 == 0) assert(r.getLong(6) == 16000L)
      if (id % 9 == 1) assert(r.getLong(6) == 240000L)
    }
  }
}
