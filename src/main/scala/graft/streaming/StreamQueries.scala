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
    "q46_stream_tumbling_replay" -> ((s, d) => {
      // Session conf is mutated for the replay only; both knobs are
      // restored in the finally so running a registry query leaves the
      // session as it found it.
      val prevNanos = s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
      val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
      // The file stream source requires a directory; the fixture is a
      // single parquet file → stage a hardlink/copy into a temp dir
      // (replay semantics unchanged: one file, one batch).
      val stage = java.nio.file.Files.createTempDirectory("q46_events")
      val dst = stage.resolve("events.parquet")
      try {
        s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        // One replayed batch over a few thousand groups: state-store
        // instances scale with shuffle partitions (one store + its
        // checkpoint dir per partition), so the session's CPU-count
        // setting buys nothing here and multiplies store open/commit
        // cost. 8 partitions keeps the stateful stage wide enough for
        // the fixture while an unbounded deployment would size it to
        // the key cardinality, not the core count.
        s.conf.set("spark.sql.shuffle.partitions", "8")
        val src = java.nio.file.Paths.get(s"$d/events.parquet")
        try java.nio.file.Files.createLink(dst, src)
        catch { case _: Exception => java.nio.file.Files.copy(src, dst) }
        val stream = s.readStream.schema(eventsSchema)
          .parquet(stage.toString)
          // ns → µs must be integer division: double arithmetic cannot
          // represent epoch-ns exactly (2^53 << 1.7e18).
          .withColumn("ts", timestamp_micros(expr("ts div 1000")))
        val agg = StreamingOps.tumblingCounts(stream, "1 hour")
          .select(col("w_start").cast("long").as("hour_sec"),
            col("event_type"), col("n"))
        val sink = s"q46_replay_${runId.incrementAndGet()}"
        val q = agg.writeStream.outputMode("complete")
          .format("memory").queryName(sink).start()
        try q.processAllAvailable() finally q.stop()
        // The memory sink holds the result rows driver-side — the
        // staging dir and conf overrides are no longer referenced.
        s.table(sink).orderBy(col("hour_sec"), col("event_type"))
      } finally {
        prevNanos match {
          case Some(v) => s.conf.set("spark.sql.legacy.parquet.nanosAsLong", v)
          case None => s.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
        }
        s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
        java.nio.file.Files.deleteIfExists(dst)
        java.nio.file.Files.deleteIfExists(stage)
      }
    })
  )

  def oracle: Map[String, String] = Map(
    "q46_stream_tumbling_replay" ->
      """SELECT (epoch_ns(ts) // 3600000000000) * 3600 AS hour_sec,
        |  event_type, COUNT(*) AS n
        |FROM events
        |GROUP BY 1, 2 ORDER BY hour_sec, event_type""".stripMargin
  )
}
