package graft.streaming

import java.nio.file.{Files, Path, StandardCopyOption}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** THE shared stream-staging helper for the streaming suites. Seven specs
  * used to carry near-identical private copies of this (and the copies had
  * already drifted — one closed its `Files.list` stream, the rest leaked
  * it); every micro-batch staging detail now lives in exactly one place.
  */
object StreamFixtures {

  /** Stage two DataFrames as `<tag>/batch{0,1}.parquet` with ascending
    * mtimes so the file-stream source replays them as two micro-batches. */
  def stageTwoFrames(a: DataFrame, b: DataFrame, tag: String): String = {
    val staged = Files.createTempDirectory(tag)
    def writeOne(df: DataFrame, name: String): Path = {
      val tmp = Files.createTempDirectory(s"${tag}_$name")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val listing = Files.list(tmp)
      val part =
        try listing.filter(p => p.getFileName.toString.endsWith(".parquet")).findFirst().get()
        finally listing.close()
      Files.copy(part, staged.resolve(s"$name.parquet"), StandardCopyOption.REPLACE_EXISTING)
      staged.resolve(s"$name.parquet")
    }
    val f0 = writeOne(a, "batch0")
    val f1 = writeOne(b, "batch1")
    f0.toFile.setLastModified(System.currentTimeMillis() - 120000)
    f1.toFile.setLastModified(System.currentTimeMillis() - 60000)
    staged.toString
  }

  /** Split the fixture `events` table at the median `ts` into two stream
    * files so windows/state accumulate across a micro-batch boundary. */
  def stageEventsTwoBatches(spark: SparkSession, dir: String,
      tag: String = "events_stream"): String = {
    val events = spark.read.parquet(s"$dir/events.parquet")
    val median = events.selectExpr("percentile_approx(ts, 0.5)").collect()(0)
      .getAs[java.time.LocalDateTime](0)
    stageTwoFrames(
      events.filter(col("ts") < median),
      events.filter(col("ts") >= median), tag)
  }

  /** Split by an arbitrary predicate (first frame = rows matching it). */
  def stageSplit(df: DataFrame, firstBatch: Column, tag: String): String =
    stageTwoFrames(df.filter(firstBatch), df.filter(!firstBatch), tag)
}
