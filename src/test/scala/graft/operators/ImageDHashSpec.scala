package graft.operators

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** The dHash perceptual hash: near-identical images (small noise, mild
  * rescale) land within a small Hamming radius; structurally different
  * images land far; and the hash is bit-deterministic across runs and
  * partitionings (the integer box-average downsample is the point — AWT's
  * platform-varying scalers are banned from the path).
  */
class ImageDHashSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  private def png(img: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Smooth structured gradient — dHash needs cells with consistent
    * left-to-right ordering, which a smooth ramp provides. */
  private def ramp(w: Int, h: Int, phase: Int, noiseAmp: Int = 0, seed: Int = 0): Array[Byte] = {
    val rnd = new scala.util.Random(seed)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val base = ((x * 255 / w + phase) % 256 + y * 31 / h) % 256
      def n() = if (noiseAmp == 0) 0 else rnd.nextInt(2 * noiseAmp + 1) - noiseAmp
      def clamp(v: Int) = math.max(0, math.min(255, v))
      val r = clamp(base + n()); val g = clamp(base + n()); val b = clamp(base + n())
      img.setRGB(x, y, (0xff << 24) | (r << 16) | (g << 8) | b)
    }
    png(img)
  }

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("noise-perturbed copy is near; reversed-ramp image is far") {
    val original = Multimodal.dHash64(ramp(64, 48, phase = 0))
    val noisy = Multimodal.dHash64(ramp(64, 48, phase = 0, noiseAmp = 6, seed = 7))
    val resized = Multimodal.dHash64(ramp(96, 72, phase = 0)) // same scene, different resolution
    val other = {
      // reversed horizontal ramp: every adjacent-cell comparison flips
      val img = new BufferedImage(64, 48, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 48; x <- 0 until 64) {
        val v = (255 - x * 255 / 64 + y * 31 / 48) % 256
        img.setRGB(x, y, (0xff << 24) | (v << 16) | (v << 8) | v)
      }
      Multimodal.dHash64(png(img))
    }
    assert(hamming(original, noisy) <= 10,
      s"noisy copy too far: ${hamming(original, noisy)}")
    assert(hamming(original, resized) <= 10,
      s"rescaled copy too far: ${hamming(original, resized)}")
    assert(hamming(original, other) >= 20,
      s"reversed ramp too close: ${hamming(original, other)}")
  }

  test("deterministic across runs and partitionings via the mapPartitions seam") {
    import spark.implicits._
    val payloads = (0 until 8).map(i => (i.toLong, ramp(32 + i, 24 + i, phase = i * 13)))
    def run(parts: Int): Map[Long, Long] =
      Multimodal.imageDHashes(spark.createDataset(payloads).repartition(parts))
        .collect().toMap
    val a = run(1)
    val b = run(7)
    assert(a == b, "dHash depends on partitioning")
    assert(a.values.toSet.size == payloads.size, "distinct scenes collided")
    // and stable against a direct driver-side computation
    val direct = payloads.map { case (id, p) => id -> Multimodal.dHash64(p) }.toMap
    assert(a == direct)
  }
}
