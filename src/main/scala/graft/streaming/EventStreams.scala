package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event row (the driver's `events` fixture schema). */
case class Event(
    event_id: Long, ts: Timestamp, user_id: Long,
    event_type: String, value: Double, props: String)

/** Closed gap-session emitted by [[EventStreams.sessionize]]. */
case class SessionAgg(
    user_id: Long, session_start: Timestamp, session_end: Timestamp,
    n_events: Long, sum_value: Double)

/** Open-session state carried between micro-batches. */
case class SessionState(start: Long, end: Long, n: Long, sum: Double)

/** Structured Streaming operators over event streams (SURVEY.md §2.10).
  * The reference's "streaming" is an external scheduler re-running a
  * batch (`README.md:25`); these are the real streaming twins of the
  * analytics layer, built on event time + watermarks. Batch equivalents
  * are oracle-checked as q13 / s01 / s02; these transforms also run on
  * batch DataFrames unchanged (tested in EventStreamsSpec, which also
  * checks streaming-vs-batch agreement).
  *
  * Scale: state lives in the state store keyed by group — partitioned by
  * user_id/group key across executors; watermarks bound state size.
  */
object EventStreams {

  /** Stream-static broadcast enrichment — the streaming twin of the
    * weather ingest's dimension join (J3): each micro-batch joins the
    * STATIC dim (broadcast, re-resolved per batch — dim updates are
    * picked up at batch boundaries), then windows per province. The
    * static side never enters the state store; the watermark bounds
    * window state exactly as in [[hourlyByType]]. At 100 TB the dim is
    * the small side by construction (a dimension table), so this stays
    * a map-side hash join inside every micro-batch.
    *
    * `locationKey` derives the join key from the event row; the default
    * mirrors the synthetic fixture (user_id mod the reference dim's 146
    * rows). A caller joining a dim with different key coverage MUST
    * supply a derivation that lands inside it — the join is inner, so
    * uncovered keys drop events.
    */
  def enrichedHourly(events: DataFrame, dim: DataFrame,
      watermark: String = "2 hours",
      locationKey: Column = col("user_id") % 146): DataFrame =
    events.withWatermark("ts", watermark)
      .withColumn("location_id", locationKey)
      .join(broadcast(dim), Seq("location_id"))
      .groupBy(window(col("ts"), "1 hour"), col("province_name"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour_start"), col("province_name"),
        col("n_events"), col("sum_value"))

  /** Tumbling window aggregate with watermark — streaming twin of q13. */
  def hourlyByType(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Sliding-window aggregate with watermark — streaming twin of s04:
    * each event multiplies into size/slide overlapping windows; state
    * per open window evicts once the watermark passes the window end.
    */
  def slidingByType(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Keep-first dedup bounded by the watermark — streaming twin of s02;
    * the fix-forward for the reference's re-run duplicate inserts
    * (SURVEY.md §2.10 dedup row).
    */
  def dedupKeepFirst(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("user_id", "event_type")

  /** Stream-stream interval join — each purchase pairs with ALL of the
    * same user's clicks from the trailing `windowMinutes` (enrichment
    * fan-out, vs the as-of join's single nearest match). Both inputs
    * carry watermarks and the join condition is time-bounded, so each
    * side's buffered state evicts as the watermark clears the interval —
    * state is proportional to the active window, never to history.
    * `withWatermark` is a no-op on batch frames, so the SAME function is
    * the batch twin, oracle-gated as w03_interval_join.
    */
  def clickToPurchase(events: DataFrame, windowMinutes: Int = 60,
      watermark: String = "2 hours"): DataFrame = {
    val ck = events.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("click_ts"), col("event_id").as("click_id"))
      .withWatermark("click_ts", watermark)
    val pu = events.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"))
      .withWatermark("purchase_ts", watermark)
    ck.join(pu,
        col("user_id") === col("p_user_id") &&
          col("click_ts") <= col("purchase_ts") &&
          col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(col("user_id"), col("purchase_id"), col("click_id"),
        col("purchase_ts"), col("click_ts"))
  }

  /** Gap-based sessionization with custom state — streaming twin of s01.
    * Sessions close when `gap` passes with no event (event-time timeout);
    * Append mode emits only closed sessions.
    */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 15,
      watermark: String = "2 hours"): Dataset[SessionAgg] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60000L

    def close(uid: Long, st: SessionState): SessionAgg =
      SessionAgg(uid, new Timestamp(st.start), new Timestamp(st.end), st.n, st.sum)

    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionAgg](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(close(uid, _))
            state.remove()
            out.iterator
          } else {
            var closed = List.empty[SessionAgg]
            var cur = state.getOption
            for (e <- batch.toSeq.sortBy(_.ts.getTime)) {
              val t = e.ts.getTime
              cur = cur match {
                case Some(st) if t - st.end <= gapMs =>
                  Some(SessionState(st.start, math.max(st.end, t), st.n + 1, st.sum + e.value))
                case Some(st) =>
                  closed ::= close(uid, st)
                  Some(SessionState(t, t, 1, e.value))
                case None =>
                  Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { st =>
              state.update(st)
              state.setTimeoutTimestamp(st.end + gapMs)
            }
            closed.reverse.iterator
          }
      }
  }
}
