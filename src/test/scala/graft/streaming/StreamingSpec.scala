package graft.streaming

import java.sql.Timestamp
import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

/** MemoryStream-driven tests of the §2.C streaming surface with
  * manufactured event times (SURVEY §5 item 6).
  */
class StreamingSpec extends SparkSpec {

  import spark.implicits._
  implicit private lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private var sinkSeq = 0

  private def ts(hhmm: String): Timestamp =
    Timestamp.valueOf(s"2024-01-01 $hhmm:00")

  type Ev = (Long, Timestamp, Long, String, Double)

  private def toEventsDf(ms: MemoryStream[Ev]): DataFrame =
    ms.toDF.toDF("event_id", "ts", "user_id", "event_type", "value")

  private def startQuery(df: DataFrame, mode: String): (StreamingQuery, String) = {
    sinkSeq += 1
    val name = s"sink_$sinkSeq"
    (df.writeStream.outputMode(mode).format("memory").queryName(name).start(), name)
  }

  test("q177's late-row-drop boundary lands EXACTLY where the watermark " +
    "rule says at sf0.001: accepted = on-time + marker + late rows whose " +
    "window outlived the batch-1 watermark, and the drop is non-vacuous") {
    import org.apache.spark.sql.functions._
    val sinkTotal = StreamQueries.queries("q177_stream_late_audit")(spark, sf001)
      .agg(sum(col("n"))).head().getLong(0)
    // the batch twin of the acceptance rule (the sf0.01 DuckDB oracle's
    // construction): watermark = max on-time event time floored to ms
    // (Spark tracks event time at ms) minus the 1h lateness; a late row
    // survives iff its 1h window's END clears that watermark
    val ev = graft.Tables.eventsUs(spark, sf001)
    val onTime = ev.filter(col("event_id") % 10 =!= 0)
    val nOnTime = onTime.count()
    val maxUs = onTime.agg(max(col("ts_us"))).head().getLong(0)
    val wmk = (maxUs / 1000L) * 1000L - 3600000000L
    val late = ev.filter(col("event_id") % 10 === 0)
    val nLate = late.count()
    val nAccepted = late
      .filter(expr(s"(ts_us div 3600000000 + 1) * 3600000000 > $wmk")).count()
    assert(sinkTotal == nOnTime + 1 + nAccepted,
      s"sink holds $sinkTotal rows; the watermark rule predicts " +
        s"$nOnTime on-time + 1 marker + $nAccepted accepted-late")
    assert(nAccepted < nLate,
      s"all $nLate late rows were accepted — the drop path is untested")
  }

  test("q182's stream-static enrichment exercises the missing-dimension " +
    "null path and covers every event exactly once") {
    val rows = StreamQueries.queries("q182_stream_static_enrich")(spark, sf001)
      .collect()
    assert(rows.map(_.getLong(2)).sum ==
      graft.Tables.events(spark, sf001).count(),
      "enrichment must be a left join — no event may vanish")
    assert(rows.exists(_.getString(0) == "unknown"),
      "carved users (c_custkey % 17 == 0 dropped from the dim) must " +
        "land in 'unknown'")
    assert(rows.map(_.getString(0)).distinct.length > 1,
      "matched events must spread across real segments")
  }

  test("tumbling window counts aggregate by 10-minute windows") {
    val ms = MemoryStream[Ev]
    val (q, sink) = startQuery(StreamingOps.tumblingCounts(toEventsDf(ms)), "complete")
    ms.addData(
      (1L, ts("00:01"), 1L, "click", 1.0),
      (2L, ts("00:04"), 1L, "click", 2.0),
      (3L, ts("00:12"), 2L, "click", 3.0))
    q.processAllAvailable(); q.stop()
    val rows = spark.table(sink).collect()
      .map(r => (r.getTimestamp(0).toString, r.getLong(2), r.getDouble(3))).toSet
    assert(rows == Set(
      ("2024-01-01 00:00:00.0", 2L, 3.0),
      ("2024-01-01 00:10:00.0", 1L, 3.0)))
  }

  test("watermark drops events later than the allowed lateness") {
    val ms = MemoryStream[Ev]
    val (q, sink) = startQuery(StreamingOps.watermarkedCounts(toEventsDf(ms)), "append")
    // batch 1: two on-time events in [00:00,00:10), plus one at 01:00
    // that advances the watermark to 00:50
    ms.addData(
      (1L, ts("00:01"), 1L, "click", 1.0),
      (2L, ts("00:07"), 1L, "click", 1.0),
      (3L, ts("01:00"), 1L, "click", 1.0))
    q.processAllAvailable()
    // batch 2: a late event for the closed [00:00,00:10) window (must
    // be dropped) and a fresh one to trigger emission
    ms.addData(
      (4L, ts("00:06"), 1L, "click", 1.0),
      (5L, ts("01:05"), 1L, "click", 1.0))
    q.processAllAvailable(); q.stop()
    val w0 = spark.table(sink).collect()
      .filter(_.getTimestamp(0).toString == "2024-01-01 00:00:00.0")
    assert(w0.length == 1 && w0.head.getLong(2) == 2,
      s"late event must not count: ${w0.mkString(",")}")
  }

  test("session windows merge within the gap and split across it") {
    val ms = MemoryStream[Ev]
    val (q, sink) = startQuery(StreamingOps.sessionCounts(toEventsDf(ms)), "append")
    ms.addData(
      (1L, ts("00:00"), 7L, "click", 1.0),
      (2L, ts("00:10"), 7L, "click", 2.0), // same session (gap < 30m)
      (3L, ts("01:00"), 7L, "click", 4.0)) // new session
    q.processAllAvailable()
    ms.addData((4L, ts("03:00"), 7L, "click", 0.0)) // advance watermark
    q.processAllAvailable(); q.stop()
    val sessions = spark.table(sink).collect()
      .map(r => (r.getTimestamp(0).toString, r.getTimestamp(1).toString,
        r.getLong(3), r.getDouble(4)))
    assert(sessions.contains(
      ("2024-01-01 00:00:00.0", "2024-01-01 00:40:00.0", 2L, 3.0)),
      s"merged session missing: ${sessions.mkString(";")}")
    assert(sessions.contains(
      ("2024-01-01 01:00:00.0", "2024-01-01 01:30:00.0", 1L, 4.0)),
      s"split session missing: ${sessions.mkString(";")}")
  }

  test("dropDuplicatesWithinWatermark emits each event_id once") {
    val ms = MemoryStream[Ev]
    val (q, sink) = startQuery(StreamingOps.dedupByEventId(toEventsDf(ms)), "append")
    ms.addData((1L, ts("00:01"), 1L, "click", 1.0), (2L, ts("00:02"), 1L, "click", 1.0))
    q.processAllAvailable()
    ms.addData((2L, ts("00:03"), 1L, "click", 1.0), (3L, ts("00:04"), 1L, "click", 1.0))
    q.processAllAvailable(); q.stop()
    val ids = spark.table(sink).collect().map(_.getLong(0)).sorted
    assert(ids.sameElements(Array(1L, 2L, 3L)), s"got ${ids.mkString(",")}")
  }

  test("stream-stream join matches purchases to preceding clicks within the window") {
    val ms = MemoryStream[Ev]
    val (q, sink) = startQuery(
      StreamingOps.clickToPurchaseJoin(toEventsDf(ms)), "append")
    ms.addData(
      (1L, ts("00:05"), 7L, "click", 0.0),
      (2L, ts("00:20"), 7L, "purchase", 99.0),  // within 1h of click 1
      (3L, ts("02:30"), 7L, "purchase", 11.0),  // no click within 1h
      (4L, ts("00:10"), 8L, "click", 0.0))      // other user, no purchase
    q.processAllAvailable()
    ms.addData((5L, ts("05:00"), 9L, "click", 0.0)) // advance watermarks
    q.processAllAvailable(); q.stop()
    val rows = spark.table(sink).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.toSet == Set((7L, 1L, 2L, 99.0)), rows.mkString(";"))
  }

  test("parquet streaming sink appends files that read back consistently") {
    val dir = java.nio.file.Files.createTempDirectory("psink")
    val ms = MemoryStream[Ev]
    val q = StreamingOps.tumblingCounts(toEventsDf(ms).withWatermark("ts", "1 minute"))
      .writeStream.outputMode("append")
      .option("checkpointLocation", s"$dir/ckpt")
      .format("parquet").start(s"$dir/out")
    ms.addData(
      (1L, ts("00:01"), 1L, "click", 1.0),
      (2L, ts("00:04"), 1L, "click", 2.0),
      (3L, ts("01:00"), 2L, "view", 3.0)) // advances watermark past 00:10
    q.processAllAvailable()
    ms.addData((4L, ts("02:00"), 2L, "view", 0.0))
    q.processAllAvailable(); q.stop()
    val back = spark.read.parquet(s"$dir/out")
      .collect().map(r => (r.getTimestamp(0).toString, r.getLong(2), r.getDouble(3)))
    assert(back.contains(("2024-01-01 00:00:00.0", 2L, 3.0)),
      s"finalized window missing from parquet sink: ${back.mkString(";")}")
  }

  test("transformWithState applies the online model step across batches " +
    "(RocksDB state store)") {
    import StreamingOps.{ModelUpdate, UserEvent}
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[UserEvent]
      val (q, sink) = startQuery(
        StreamingOps.onlineModel(ms.toDS(), epsilon = 0.5).toDF(), "update")
      ms.addData(UserEvent(1L, 9L, 10.0)) // w: 0 + 0.5*(10-0) = 5
      q.processAllAvailable()
      ms.addData(UserEvent(2L, 9L, 10.0)) // w: 5 + 0.5*(10-5) = 7.5
      q.processAllAvailable(); q.stop()
      val rows = spark.table(sink).as[ModelUpdate].collect()
      assert(rows.contains(ModelUpdate(9L, 1L, 5.0)), rows.mkString(";"))
      assert(rows.contains(ModelUpdate(9L, 2L, 7.5)), rows.mkString(";"))
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState holds per-key VECTOR state: gradient rows " +
    "accumulate element-wise across batches (RocksDB state store)") {
    import StreamingOps.{GradientEvent, WeightRow}
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val ms = MemoryStream[GradientEvent]
      val (q, sink) = startQuery(
        StreamingOps.gradientMeans(ms.toDS()).toDF(), "update")
      ms.addData(GradientEvent(7L, Array(2.0, 4.0, 6.0)))
      q.processAllAvailable()
      ms.addData(GradientEvent(7L, Array(4.0, 0.0, 6.0)),
        GradientEvent(8L, Array(1.0, 1.0, 1.0)))
      q.processAllAvailable(); q.stop()
      val rows = spark.table(sink).as[WeightRow].collect()
        .map(w => (w.key, w.n) -> w.mean.toSeq).toMap
      // batch 1: mean = the single gradient; batch 2: element-wise
      // mean of both gradients — state carried the first vector
      assert(rows((7L, 1L)) == Seq(2.0, 4.0, 6.0), rows.toString)
      assert(rows((7L, 2L)) == Seq(3.0, 2.0, 6.0), rows.toString)
      assert(rows((8L, 1L)) == Seq(1.0, 1.0, 1.0), rows.toString)
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("flatMapGroupsWithState carries running per-user state across batches") {
    import StreamingOps.{UserEvent, UserRunning}
    val ms = MemoryStream[UserEvent]
    val (q, sink) = startQuery(
      StreamingOps.runningPerUser(ms.toDS()).toDF(), "update")
    ms.addData(UserEvent(1L, 42L, 10.0), UserEvent(2L, 42L, 5.0))
    q.processAllAvailable()
    ms.addData(UserEvent(3L, 42L, 1.0), UserEvent(4L, 43L, 2.0))
    q.processAllAvailable(); q.stop()
    val rows = spark.table(sink).as[UserRunning].collect()
    assert(rows.contains(UserRunning(42L, 3L, 16.0)),
      s"state not carried: ${rows.mkString(";")}")
    assert(rows.contains(UserRunning(43L, 1L, 2.0)))
  }
}
