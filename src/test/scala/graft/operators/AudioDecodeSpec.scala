package graft.operators

import java.io.ByteArrayOutputStream

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

/** Real WAV bytes through the audio decode seam: payloads are genuine
  * RIFF/WAVE PCM files synthesized here (integer sine + square waves), so
  * the parser handles actual container bytes, not a stub.
  */
class AudioDecodeSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  /** Canonical 16-bit PCM WAV writer (the container spec, directly). */
  private def wav(sampleRate: Int, channels: Int, samples: Array[Short],
      extraChunk: Boolean = false): Array[Byte] = {
    val data = new ByteArrayOutputStream()
    def le32(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def le16(v: Int): Array[Byte] = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    val list = if (extraChunk) "LIST".getBytes ++ le32(4) ++ "INFO".getBytes
      else Array.empty[Byte]
    val byteRate = sampleRate * channels * 2
    val dataBytes = samples.flatMap(s => le16(s.toInt & 0xffff))
    val body = "WAVE".getBytes ++
      "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(channels) ++
      le32(sampleRate) ++ le32(byteRate) ++ le16(channels * 2) ++ le16(16) ++
      list ++
      "data".getBytes ++ le32(dataBytes.length) ++ dataBytes
    data.write("RIFF".getBytes); data.write(le32(body.length)); data.write(body)
    data.toByteArray
  }

  test("square wave: exact integer RMS^2, peak, duration; clipping detected") {
    val amp = 32767
    val samples = Array.tabulate(16000)(i => (if (i % 2 == 0) amp else -amp).toShort)
    val st = Multimodal.wavStats(wav(16000, 1, samples))
    assert(st.sampleRate == 16000 && st.channels == 1 && st.nSamples == 16000)
    assert(st.durationMs == 1000)
    assert(st.rms2 == 16000L * amp * amp) // square wave: every sample at amp
    assert(st.peak == amp && st.nClipped == 16000)
  }

  test("quiet stereo with an extra LIST chunk still parses; no clipping") {
    val samples = Array.tabulate(8000)(i => ((i % 100) - 50).toShort)
    val st = Multimodal.wavStats(wav(8000, 2, samples, extraChunk = true))
    assert(st.channels == 2 && st.nSamples == 8000)
    assert(st.durationMs == 500) // 4000 frames at 8kHz
    assert(st.nClipped == 0 && st.peak <= 50)
    val brute = samples.map(s => s.toLong * s).sum
    assert(st.rms2 == brute)
  }

  test("VAD: frame gate recovers a hand-built silence pattern exactly") {
    // 5 frames of 20 samples: voiced, silent, voiced, voiced, silent
    val frame = Array.tabulate(20)(i => ((i * 37) % 400 - 200).toShort)
    val zero = new Array[Short](20)
    val samples = frame ++ zero ++ frame ++ frame ++ zero
    val v = Multimodal.vadStats(wav(8000, 1, samples))
    assert(v == Multimodal.VadStats(5, 3, 2))
    // a partial tail frame is dropped, never counted voiced
    val v2 = Multimodal.vadStats(wav(8000, 1, samples ++ frame.take(7)))
    assert(v2 == Multimodal.VadStats(5, 3, 2))
    // threshold honors exact integer energy: a frame at energy 9999 is silent
    val sub = Array.tabulate[Short](20)(i => if (i < 4) 49 else 0) // 4*2401 = 9604
    assert(Multimodal.vadStats(wav(8000, 1, sub)) == Multimodal.VadStats(1, 0, 0))
    val at = Array.tabulate[Short](20)(i => if (i < 4) 50 else 0) // 4*2500 = 10000
    assert(Multimodal.vadStats(wav(8000, 1, at)) == Multimodal.VadStats(1, 1, 1))
  }

  test("VAD fixture: the planted (frame + doc) % 3 silence structure surfaces") {
    val dir = SparkSuite.Sf0001
    val rows = Multimodal.audioVad(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0); val nf = r.getLong(1)
      assert(nf == (64 + id % 64) / 20)
      val expectActive = (0L until nf).count(f => (f + id) % 3 != 0).toLong
      assert(r.getLong(2) == expectActive, s"doc $id active frames")
      // longest voiced run of the %3 pattern, brute-forced
      val pattern = (0L until nf).map(f => (f + id) % 3 != 0)
      val best = pattern.foldLeft((0L, 0L)) { case ((run, b), a) =>
        if (a) (run + 1, math.max(b, run + 1)) else (0L, b)
      }._2
      assert(r.getLong(3) == best, s"doc $id longest run")
      assert(r.getLong(4) == (1000 * expectActive + nf / 2) / nf)
    }
    // the plant must actually create variety: not every clip fully voiced
    assert(rows.exists(r => r.getLong(2) < r.getLong(1)))
    assert(rows.exists(r => r.getLong(3) >= 2))
  }

  test("distributed seam: per-partition decode matches local; junk rejected") {
    import spark.implicits._
    val payloads = (1L to 8L).map { i =>
      i -> wav(16000, 1, Array.tabulate(1000)(j => ((j * i) % 2000 - 1000).toShort))
    }
    val ds = spark.createDataset(payloads).repartition(4)
    val got = Multimodal.audioFeatures(ds).collect().toMap
    payloads.foreach { case (id, p) =>
      assert(got(id) == Multimodal.wavStats(p), s"id=$id")
    }
    intercept[Exception](Multimodal.wavStats("nonsense".getBytes ++ new Array[Byte](50)))
  }
}
