package graft.streaming

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.QueryModule
import graft.operators.RelationalCore.{dsum, dsumSql}

/** q46 — the streaming engine replaying the batch `events` fixture
  * through a file-source → tumbling-window aggregation → memory sink,
  * then returning the sink table. Because replay of a finite source is
  * deterministic, the streaming result is oracle-checkable against
  * plain batch SQL — the strongest streaming/batch-consistency
  * assertion available (SURVEY §2.C is otherwise MemoryStream-tested
  * in StreamingSpec).
  */
object StreamQueries extends QueryModule {

  private val runId = new AtomicInteger()

  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q46_stream_tumbling_replay" -> ((s, d) =>
      replay(s, d) { stream =>
        StreamingOps.tumblingCounts(stream, "1 hour")
          .select(col("w_start").cast("long").as("hour_sec"),
            col("event_type"), col("n"))
      }.orderBy(col("hour_sec"), col("event_type"))),

    // Sliding windows (2h width, 1h slide): every event lands in two
    // overlapping windows, so the batch twin is an explicit 2-way
    // window-start expansion — a second streaming/batch-consistency
    // proof with genuinely overlapping state.
    "q79_stream_sliding_replay" -> ((s, d) =>
      replay(s, d) { stream =>
        StreamingOps.slidingCounts(stream, "2 hours", "1 hour")
          .select(col("w_start").cast("long").as("hour_sec"),
            col("event_type"), col("n"))
      }.orderBy(col("hour_sec"), col("event_type"))),

    // Stateful dedup under replay: the fixture staged TWICE into the
    // source dir, so every event arrives duplicated in one batch;
    // dropDuplicatesWithinWatermark must collapse each event_id back
    // to one row (append mode — dedup emits rows, no aggregation
    // state). The per-type counts over the deduped sink then equal the
    // plain batch counts, proving exactly-once delivery semantics over
    // an at-least-once source.
    "q92_stream_dedup_replay" -> ((s, d) =>
      replay(s, d, copies = 2, mode = "append") { stream =>
        StreamingOps.dedupByEventId(stream, "10 minutes")
      }.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          count_distinct(col("event_id")).as("n_ids"))
        .orderBy(col("event_type")))
  )

  /** Shared replay harness: stage the events fixture into a temp dir
    * (the file stream source requires a directory) `copies` times
    * (>1 = an at-least-once source: every event duplicated), run
    * `build` over a file-source stream of it — one deterministic
    * batch — into a memory sink, and return the (unordered) sink
    * table; callers apply their own transforms/ordering. Conf
    * overrides and staging files are restored/removed before
    * returning — the memory sink holds the result rows driver-side,
    * so nothing references them.
    *
    * Shuffle partitions are pinned to 8 for the stateful stage:
    * state-store instances (and their checkpoint dirs + open/commit
    * cost) scale with shuffle partitions, and a few thousand groups in
    * one replayed batch gain nothing from the session's CPU-count
    * setting. An unbounded deployment would size this to key
    * cardinality, not core count.
    *
    * ns → µs inside is integer division (`ts div 1000`): double
    * arithmetic cannot represent epoch-ns exactly (2^53 << 1.7e18).
    */
  private def replay(s: SparkSession, d: String, copies: Int = 1,
      mode: String = "complete")(
      build: DataFrame => DataFrame): DataFrame = {
    val prevNanos = s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    val stage = java.nio.file.Files.createTempDirectory("replay_events")
    val dsts = (1 to copies).map(i => stage.resolve(s"events_$i.parquet"))
    try {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s.conf.set("spark.sql.shuffle.partitions", "8")
      val src = java.nio.file.Paths.get(s"$d/events.parquet")
      dsts.foreach { dst =>
        try java.nio.file.Files.createLink(dst, src)
        catch { case _: Exception => java.nio.file.Files.copy(src, dst) }
      }
      val stream = s.readStream.schema(eventsSchema)
        .parquet(stage.toString)
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      val sink = s"replay_${runId.incrementAndGet()}"
      val q = build(stream).writeStream.outputMode(mode)
        .format("memory").queryName(sink).start()
      try q.processAllAvailable() finally q.stop()
      s.table(sink)
    } finally {
      prevNanos match {
        case Some(v) => s.conf.set("spark.sql.legacy.parquet.nanosAsLong", v)
        case None => s.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
      }
      s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      dsts.foreach(java.nio.file.Files.deleteIfExists(_))
      java.nio.file.Files.deleteIfExists(stage)
    }
  }

  def oracle: Map[String, String] = Map(
    "q46_stream_tumbling_replay" ->
      """SELECT (epoch_ns(ts) // 3600000000000) * 3600 AS hour_sec,
        |  event_type, COUNT(*) AS n
        |FROM events
        |GROUP BY 1, 2 ORDER BY hour_sec, event_type""".stripMargin,

    // q92: duplicated replay + dedup ≡ plain distinct counts.
    "q92_stream_dedup_replay" ->
      """SELECT event_type, COUNT(*) AS n,
        |  COUNT(DISTINCT event_id) AS n_ids
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // Each event belongs to the 2h windows starting at its hour and
    // the hour before — the batch twin expands both starts per event.
    "q79_stream_sliding_replay" ->
      """SELECT ws AS hour_sec, event_type, COUNT(*) AS n
        |FROM (
        |  SELECT unnest([
        |      (epoch_ns(ts) // 3600000000000) * 3600,
        |      (epoch_ns(ts) // 3600000000000) * 3600 - 3600]) AS ws,
        |    event_type
        |  FROM events)
        |GROUP BY 1, 2 ORDER BY hour_sec, event_type""".stripMargin
  )
}
