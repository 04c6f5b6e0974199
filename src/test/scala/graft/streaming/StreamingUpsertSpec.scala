package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

class StreamingUpsertSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  test("foreachBatch upsert maintains latest-state-per-key across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val snap = Files.createTempDirectory("upsert_snap").resolve("state").toString
    val ckpt = Files.createTempDirectory("upsert_ckpt").toString
    val mem = MemoryStream[(Long, Long, Double)]
    val q = StreamingUpsert.start(
      mem.toDF.toDF("k", "ts", "v"), "k", "ts", snap, ckpt)
    try {
      // batch 1: keys 1-5 at ts=1; key 2 also has a newer in-batch row
      mem.addData((1L, 1L, 10.0), (2L, 1L, 20.0), (2L, 2L, 21.0),
        (3L, 1L, 30.0), (4L, 1L, 40.0), (5L, 1L, 50.0))
      q.processAllAvailable()
      // batch 2: keys 3-7 at ts=5 (3-5 updated, 6-7 inserted)
      mem.addData((3L, 5L, 33.0), (4L, 5L, 44.0), (5L, 5L, 55.0),
        (6L, 5L, 60.0), (7L, 5L, 70.0))
      q.processAllAvailable()
      val state = spark.read.parquet(snap)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(state == Map(
        1L -> (1L, 10.0), 2L -> (2L, 21.0), // in-batch latest won
        3L -> (5L, 33.0), 4L -> (5L, 44.0), 5L -> (5L, 55.0),
        6L -> (5L, 60.0), 7L -> (5L, 70.0)))
    } finally q.stop()
  }
}
