package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured Streaming surface over the events schema
  * (`event_id, ts, user_id, event_type, value, props`).
  *
  * The reference has no streaming layer (its "sensor time-series" is a
  * sorted batch table — SURVEY §1.4), so this extends the engine the
  * Spark-native way: the same ⊕-aggregation semantics expressed over
  * unbounded input with watermarks bounding state.
  *
  * Scale notes: windowed aggregation state is pruned by the watermark;
  * sessionization state is per-user and removed on timeout — both bounded,
  * both shuffle once on their grouping key, exactly like the batch agg.
  */
object EventStreams {

  /** Watermarked sliding-window aggregate per event_type — the streaming
    * twin of `RelationalQueries.eventsBin`.
    */
  def windowedAggregate(events: DataFrame,
                        windowDur: String = "1 hour",
                        slide: String = "1 hour",
                        watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowDur, slide), col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(col("value")).as("sum_value"))
      .select(col("window.start").as("win_start"), col("event_type"),
        col("n"), col("sum_value"))

  /** Streaming exact-dedup at ingestion: drop documents whose content
    * digest was already seen within the watermark horizon — the streaming
    * twin of `pipeline.Dedup.exact`, for dedup-at-ingest in a training-data
    * feed. State is the digest set, pruned by the event-time watermark.
    * Expects columns (ts: timestamp, text: string, ...).
    */
  def streamingDedup(docs: DataFrame, watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("content_hash", md5(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("content_hash")

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double)
  final case class Session(user_id: Long, session_start: Timestamp,
                           session_end: Timestamp, n_events: Int, total_value: Double)
  final case class SessionState(start: Long, last: Long, n: Int, total: Double)

  /** Gap-based sessionization via flatMapGroupsWithState: a session closes
    * when no event arrives within `gapMs` of the last one (event time,
    * enforced by watermark timeout). Custom keyed state — the
    * `KeyValueGroupedDataset` path the reference has no equivalent for.
    */
  def sessionize(events: Dataset[Event], gapMs: Long): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", s"${gapMs / 1000} seconds")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, new Timestamp(s.start), new Timestamp(s.last), s.n, s.total))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = List.empty[Session]
            var cur = state.getOption
            for (e <- sorted) {
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.last <= gapMs =>
                  cur = Some(SessionState(s.start, t, s.n + 1, s.total + e.value))
                case Some(s) =>
                  closed ::= Session(userId, new Timestamp(s.start), new Timestamp(s.last), s.n, s.total)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.reverseIterator
          }
      }
  }
}
