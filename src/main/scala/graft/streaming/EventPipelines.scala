package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured Streaming pipelines over the events shape (event_id, ts,
  * user_id, event_type, value) — SURVEY.md §2.8 "Streaming": watermarked
  * event-time windows and custom sessionization state, the capabilities the
  * reference's single-pass pipeline lacks but a Spark-native engine gets.
  *
  * All transforms take a (possibly streaming) DataFrame, so batch tests and
  * readStream production use the same code path. At scale: windowed aggs
  * shuffle on (window, key) with partial aggregation; state store size is
  * bounded by the watermark.
  */
object EventPipelines {

  /** Tumbling-window counts/sums per event type with a watermark bounding
    * late data and state. */
  def windowedStats(events: DataFrame, watermark: String = "10 minutes",
                    window_ : String = "5 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"),
           round(sum(col("value").cast("decimal(18,2)")), 2).cast("double").as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double)
  final case class SessionState(count: Long, lastTs: Long)
  final case class Session(user_id: Long, events: Long, complete: Boolean)

  /** Session counter via mapGroupsWithState — the KeyValueGroupedDataset
    * custom-state surface. With `withTimeout` a processing-time gap of
    * `gapMs` closes (and emits) the session; note the engine then triggers
    * continuously to poll timeouts, so tests and bounded runs use the
    * default NoTimeout mode. */
  def sessionize(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L,
                 withTimeout: Boolean = false): Dataset[Session] = {
    implicit val sessionEnc = Encoders.product[Session]
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val longEnc = Encoders.scalaLong
    val timeoutConf =
      if (withTimeout) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    events.groupByKey(_.user_id)
      .mapGroupsWithState(timeoutConf)(
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) => {
          if (withTimeout && state.hasTimedOut) {
            val s = state.get
            state.remove()
            Session(userId, s.count, complete = true)
          } else {
            val events = batch.toSeq
            val prev = state.getOption.getOrElse(SessionState(0, 0L))
            val maxTs = (prev.lastTs +: events.map(_.ts.getTime)).max
            val next = SessionState(prev.count + events.size, maxTs)
            state.update(next)
            if (withTimeout) state.setTimeoutDuration(gapMs)
            Session(userId, next.count, complete = false)
          }
        })
  }

  /** foreachBatch sink: run any batch writer per micro-batch (the
    * streaming Solr path — reference's put/close contract becomes one
    * foreachBatch call per trigger). */
  def foreachBatchWriter(write: (DataFrame, Long) => Unit): (Dataset[org.apache.spark.sql.Row], Long) => Unit =
    (batch, id) => write(batch.toDF(), id)
}
