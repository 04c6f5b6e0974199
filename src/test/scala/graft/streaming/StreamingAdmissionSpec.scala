package graft.streaming

import java.nio.file.{Files, StandardCopyOption}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkSuite

class StreamingAdmissionSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark

  /** Batch 0 = exact copies of the reference corpus under new ids (every
    * row must be REJECTED); batch 1 = suffix-perturbed texts under other
    * ids (every row is novel content and must be ADMITTED). Two files with
    * ordered mtimes so maxFilesPerTrigger=1 yields two micro-batches —
    * the static side must screen correctly across the batch boundary. */
  private def stage(dir: String): String = {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val staged = Files.createTempDirectory("docs_admission")
    def writeOne(df: org.apache.spark.sql.DataFrame, name: String): java.nio.file.Path = {
      val tmp = Files.createTempDirectory(s"adm_$name")
      df.coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = Files.list(tmp).filter(p => p.getFileName.toString.endsWith(".parquet")).findFirst().get()
      Files.copy(part, staged.resolve(s"$name.parquet"), StandardCopyOption.REPLACE_EXISTING)
      staged.resolve(s"$name.parquet")
    }
    val copies = docs.withColumn("doc_id", col("doc_id") + 1000000L)
    val novel = docs
      .withColumn("doc_id", col("doc_id") + 2000000L)
      .withColumn("text", expr("substring(text, instr(text, ' ') + 1)"))
    val f0 = writeOne(copies, "batch0")
    val f1 = writeOne(novel, "batch1")
    f0.toFile.setLastModified(System.currentTimeMillis() - 120000)
    f1.toFile.setLastModified(System.currentTimeMillis() - 60000)
    staged.toString
  }

  test("stream-static anti-join admits exactly the novel-content docs, stateless") {
    val dir = SparkSuite.Sf0001
    val staged = stage(dir)
    val q = StreamingAdmission.admitted(spark, staged, dir)
      .writeStream.outputMode("append").format("memory")
      .queryName("stream_admission").start()
    try {
      q.processAllAvailable()
      assert(q.recentProgress.map(_.numInputRows).sum == 1000L, "both staged batches must ingest")
      val streamed = spark.table("stream_admission")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      // batch twin: the same anti-join run as one batch query
      val ref = spark.read.parquet(s"$dir/documents.parquet")
        .select(md5(col("text")).as("text_hash")).distinct()
      val batch = spark.read.parquet(staged)
        .withColumn("text_hash", md5(col("text")))
        .join(ref, Seq("text_hash"), "left_anti")
        .select(col("doc_id"), col("text_hash"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(streamed == batch, "stream and batch admission sets differ")
      // every exact copy rejected, every perturbed doc admitted
      assert(streamed.map(_._1).forall(_ >= 2000000L), "an exact copy slipped through")
      assert(streamed.size == 500, s"expected all 500 novel docs admitted, got ${streamed.size}")
      // stateless: a stream-static join must keep NO join state rows
      val lastProgress = q.recentProgress.last
      assert(Option(lastProgress.stateOperators).forall(_.isEmpty),
        "stream-static anti-join should run stateless")
    } finally q.stop()
  }

  test("shuffled stream-static form (broadcast disabled) stays stateless and matches batch") {
    // the 100 TB fallback StreamingAdmission documents: the reference md5
    // table outgrows broadcast range, the same declaration plans as a
    // SHUFFLED stream-static anti-join — it must still run with zero
    // state operators and agree with the batch twin (VERDICT r7 #3)
    val dir = SparkSuite.Sf0001
    val staged = stage(dir)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val q = StreamingAdmission.admitted(spark, staged, dir, broadcastRef = false)
      .writeStream.outputMode("append").format("memory")
      .queryName("stream_admission_shuffled").start()
    try {
      q.processAllAvailable()
      assert(q.recentProgress.map(_.numInputRows).sum == 1000L, "both staged batches must ingest")
      // the planner must actually have picked the shuffled join, or this
      // test silently re-covers the broadcast form
      val exec = q.asInstanceOf[org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper]
        .streamingQuery.lastExecution.executedPlan
      // unwrap AQE/stage/reuse wrappers — plain collect stops at them
      def allNodes(p: org.apache.spark.sql.execution.SparkPlan):
          Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a +: allNodes(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec => s +: allNodes(s.plan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec => r +: allNodes(r.child)
        case other => other +: other.children.flatMap(allNodes)
      }
      val joinNodes = allNodes(exec).map(_.nodeName).filter(_.contains("Join"))
      assert(joinNodes.nonEmpty, "no join in the executed micro-batch plan")
      assert(!joinNodes.exists(_.contains("Broadcast")),
        s"join still broadcast under threshold=-1: ${joinNodes.mkString(",")}")
      val streamed = spark.table("stream_admission_shuffled")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val ref = spark.read.parquet(s"$dir/documents.parquet")
        .select(md5(col("text")).as("text_hash")).distinct()
      val batch = spark.read.parquet(staged)
        .withColumn("text_hash", md5(col("text")))
        .join(ref, Seq("text_hash"), "left_anti")
        .select(col("doc_id"), col("text_hash"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(streamed == batch, "shuffled stream and batch admission sets differ")
      assert(streamed.size == 500 && streamed.map(_._1).forall(_ >= 2000000L))
      // stateless in the shuffled form too: stream-static needs no
      // watermark or join state regardless of the physical join strategy
      assert(q.recentProgress.forall(p => Option(p.stateOperators).forall(_.isEmpty)),
        "shuffled stream-static anti-join should run stateless")
    } finally {
      q.stop()
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
    }
  }
}
