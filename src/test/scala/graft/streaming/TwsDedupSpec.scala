package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

class TwsDedupSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  test("transformWithState dedup suppresses cross-batch duplicates (RocksDB store)") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val providerKey = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(providerKey)
    spark.conf.set(providerKey,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val mem = MemoryStream[(Long, String)]
      val q = TwsDedup.dedupStream(
        mem.toDS().map { case (id, h) => TwsDedup.DocHash(id, h) })
        .writeStream.outputMode("append").format("memory")
        .queryName("tws_dedup").start()
      try {
        mem.addData((1L, "a"), (2L, "a"), (3L, "b"))
        q.processAllAvailable()
        mem.addData((4L, "a"), (5L, "c"), (6L, "b"), (7L, "c"))
        q.processAllAvailable()
        val out = spark.table("tws_dedup")
          .collect().map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1)
        // batch 1: hash a → min id 1, hash b → 3; batch 2: only the new
        // hash c survives (within-batch min id 5); 4/6/7 suppressed
        assert(out.toSeq == Seq(1L -> "a", 3L -> "b", 5L -> "c"))
      } finally q.stop()
    } finally {
      prev match {
        case Some(v) => spark.conf.set(providerKey, v)
        case None => spark.conf.unset(providerKey)
      }
    }
  }
}
