package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec

/** Structured Streaming operators via MemoryStream replay (SURVEY.md §5
  * item 5): watermark windowing, watermark dedup, stateful sessionization
  * (including streaming-vs-batch agreement for the session op).
  */
class EventStreamsSpec extends SparkSpec {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")
  private def tsH(hour: Int, minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $hour%02d:$minute%02d:00")

  private def ev(id: Long, t: Timestamp, uid: Long, typ: String, v: Double) =
    Event(id, t, uid, typ, v, "{}")

  test("hourlyByType aggregates tumbling windows (streaming twin of q13)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(
      ev(1, tsH(10, 5), 1, "click", 1.0), ev(2, tsH(10, 55), 2, "click", 2.0),
      ev(3, tsH(11, 5), 1, "view", 5.0))
    val q = EventStreams.hourlyByType(mem.toDF())
      .writeStream.format("memory").queryName("hourly")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(ev(4, tsH(14, 0), 1, "click", 1.0)) // advances watermark past 11:xx
      q.processAllAvailable()
      val rows = spark.sql(
        "SELECT hour_start, event_type, n_events, sum_value FROM hourly ORDER BY 1, 2")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      assert(rows.contains((tsH(10, 0), "click", 2L, 3.0)))
      assert(rows.contains((tsH(11, 0), "view", 1L, 5.0)))
    } finally q.stop()
  }

  test("slidingByType emits every overlapping window (streaming twin of s04)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(ev(1, tsH(10, 20), 1, "click", 2.0))
    val q = EventStreams.slidingByType(mem.toDF())
      .writeStream.format("memory").queryName("sliding")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(ev(2, tsH(14, 0), 1, "view", 1.0)) // watermark past 11:20
      q.processAllAvailable()
      val starts = spark.sql(
        "SELECT window_start FROM sliding WHERE event_type = 'click'")
        .collect().map(_.getTimestamp(0)).toSet
      // 10:20 lands in exactly 4 windows: starts 09:30, 09:45, 10:00, 10:15
      assert(starts === Set(tsH(9, 30), tsH(9, 45), tsH(10, 0), tsH(10, 15)))
      // and the streaming result matches the batch s04 expressions on
      // the same rows (same grid, same multiplicity)
      val batch = Seq((tsH(10, 20), "click", 2.0)).toDF("ts", "event_type", "value")
        .groupBy(org.apache.spark.sql.functions.window($"ts", "1 hour", "15 minutes"))
        .count().select($"window.start").collect().map(_.getTimestamp(0)).toSet
      assert(batch === starts)
    } finally q.stop()
  }

  test("dedupKeepFirst drops repeats of (user_id, event_type) within watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(
      ev(1, ts(0), 1, "click", 1.0), ev(2, ts(1), 1, "click", 9.0),
      ev(3, ts(2), 2, "click", 2.0), ev(4, ts(3), 1, "view", 3.0))
    val q = EventStreams.dedupKeepFirst(mem.toDF())
      .writeStream.format("memory").queryName("dedup")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      val ids = spark.sql("SELECT event_id FROM dedup").collect().map(_.getLong(0)).toSet
      assert(ids === Set(1L, 3L, 4L))
    } finally q.stop()
  }

  test("clickToPurchase interval join pairs purchases with trailing-hour clicks") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    mem.addData(
      ev(1, tsH(10, 0), 1, "click", 1.0),   // within the hour of purchase 3
      ev(2, tsH(10, 30), 1, "click", 1.0),  // within
      ev(3, tsH(10, 45), 1, "purchase", 9.0),
      ev(4, tsH(9, 40), 1, "click", 1.0),   // 65 min before — outside
      ev(5, tsH(10, 20), 2, "click", 1.0))  // other user — no purchase
    val q = EventStreams.clickToPurchase(mem.toDF())
      .writeStream.format("memory").queryName("ivj")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      val pairs = spark.sql("SELECT purchase_id, click_id FROM ivj")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs === Set((3L, 1L), (3L, 2L)))
    } finally q.stop()
  }

  test("streaming clickToPurchase agrees with its batch twin (w03) on the fixture") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val batchDf = graft.Tables(spark, dir, "events")
    batchDf.write.mode("overwrite").parquet("/tmp/stream_ivj_in")
    val stream = spark.readStream.schema(batchDf.schema).parquet("/tmp/stream_ivj_in")
    val q = EventStreams.clickToPurchase(stream)
      .writeStream.format("memory").queryName("ivj_file")
      .outputMode(OutputMode.Append).start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql("SELECT purchase_id, click_id FROM ivj_file")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val batch = EventStreams.clickToPurchase(batchDf)
        .select("purchase_id", "click_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed === batch)
      assert(batch.nonEmpty)
    } finally q.stop()
  }

  test("file-source stream (AvailableNow-style) agrees with the batch q13 result") {
    import spark.implicits._
    // real streaming source over the parquet fixture: one-pass catch-up,
    // the scheduler-driven micro-batch shape of the reference (§2.10)
    val dir = "/root/testdata/sf0.001"
    val batchDf = graft.Tables(spark, dir, "events")
    // stage the fixture as a stream input dir (overwrite clears it)
    batchDf.write.mode("overwrite").parquet("/tmp/stream_events_in")
    val stream = spark.readStream.schema(batchDf.schema)
      .parquet("/tmp/stream_events_in")

    val q = EventStreams.hourlyByType(stream, watermark = "10 seconds")
      .writeStream.format("memory").queryName("file_hourly")
      .outputMode(OutputMode.Complete()).start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql("SELECT * FROM file_hourly")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      val batch = batchDf
        .groupBy(org.apache.spark.sql.functions.window($"ts", "1 hour"), $"event_type")
        .count()
        .select($"window.start", $"event_type", $"count")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("stream-static broadcast enrichment agrees with its batch twin") {
    import spark.implicits._
    val dir = "/root/testdata/sf0.001"
    val batchDf = graft.Tables(spark, dir, "events")
    batchDf.write.mode("overwrite").parquet("/tmp/stream_enrich_in")
    val dim = spark.range(146).select(
      $"id".as("location_id"),
      org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("P"), $"id" % 30).as("province_name"))
    val stream = spark.readStream.schema(batchDf.schema)
      .parquet("/tmp/stream_enrich_in")
    val q = EventStreams.enrichedHourly(stream, dim, watermark = "10 seconds")
      .writeStream.format("memory").queryName("enriched_hourly")
      .outputMode(OutputMode.Complete()).start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql("SELECT * FROM enriched_hourly")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
          math.round(r.getDouble(3) * 1e6))).toSet
      val batch = EventStreams.enrichedHourly(batchDf, dim)
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2),
          math.round(r.getDouble(3) * 1e6))).toSet
      assert(streamed === batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("sessionize closes sessions on gap timeout; agrees with batch logic") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    // user 1: events at 10:00, 10:05 (one session), then 10:40 (new session)
    // user 2: single event 10:02
    mem.addData(
      ev(1, ts(0), 1, "c", 1.0), ev(2, ts(5), 1, "c", 2.0),
      ev(3, ts(2), 2, "c", 4.0))
    val q = EventStreams.sessionize(mem.toDS(), gapMinutes = 15)
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Append).start()
    try {
      mem.addData(ev(4, ts(40), 1, "c", 8.0))
      q.processAllAvailable()
      // push watermark far ahead so all sessions time out and emit
      mem.addData(ev(5, tsH(14, 0), 9, "c", 0.0))
      q.processAllAvailable()
      mem.addData(ev(6, tsH(18, 0), 9, "c", 0.0))
      q.processAllAvailable()

      val rows = spark.sql(
        """SELECT user_id, session_start, n_events, sum_value
          |FROM sessions WHERE user_id IN (1, 2) ORDER BY user_id, session_start""".stripMargin)
        .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getDouble(3)))
      assert(rows.toSeq === Seq(
        (1L, ts(0), 2L, 3.0),
        (1L, ts(40), 1L, 8.0),
        (2L, ts(2), 1L, 4.0)))
    } finally q.stop()
  }
}
