package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming exact dedup on the MODERN arbitrary-state API
  * (`transformWithState`, Spark 4) — the successor to
  * `flatMapGroupsWithState` that [[StreamingDedup]] uses: typed per-key
  * state handles (ValueState/ListState/MapState), optional TTL, timers,
  * and a RocksDB-backed store (the API requires the RocksDB provider).
  * Semantics match [[StreamingDedup.dedupStream]]: first micro-batch to
  * see a text hash emits its smallest doc_id; every later duplicate is
  * suppressed. State per key is one Long (~the same ~32 B/key footprint
  * as the legacy twin), sharded by the state store on the group key. */
object TwsDedup {

  case class DocHash(doc_id: Long, text_hash: String)

  class KeepFirstProcessor extends StatefulProcessor[String, DocHash, DocHash] {
    @transient private var seen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Long]("seen", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[DocHash],
        timerValues: TimerValues): Iterator[DocHash] = {
      val first = rows.minBy(_.doc_id)
      if (seen.exists()) Iterator.empty
      else {
        seen.update(first.doc_id)
        Iterator.single(first)
      }
    }
  }

  /** keep-first dedup over a stream of (doc_id, text_hash). */
  def dedupStream(hashes: Dataset[DocHash]): Dataset[DocHash] = {
    import hashes.sparkSession.implicits._
    hashes
      .groupByKey(_.text_hash)
      .transformWithState(new KeepFirstProcessor, TimeMode.None(), OutputMode.Append())
  }
}
