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

  /** The events fixture's ACTUAL scan schema, probed from the parquet
    * footer (a metadata read, no data scan). The file stream source
    * needs an explicit schema, and hard-coding one is how a fixture
    * precision change silently corrupts every replay: reading µs
    * TIMESTAMP parquet through a `ts: LongType` schema yields raw
    * micros where ns were assumed, compressing all event time 1000×.
    * Probing keeps the replay harness faithful to whatever physical
    * type the generator chose (ns-as-long, µs TIMESTAMP, or µs NTZ —
    * the same trichotomy as [[graft.Tables.tsToUs]]).
    */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[String, StructType]()
  private def eventsSchema(s: SparkSession, d: String): StructType =
    schemaCache.computeIfAbsent(d,
      _ => s.read.parquet(s"$d/events.parquet").schema)

  private def tsType(schema: StructType): DataType = schema("ts").dataType

  /** Normalize the scanned `ts` to a proper TimestampType instant (µs
    * precision, wall-clock-as-UTC — the session zone is pinned UTC in
    * Tables.sessionConfs) so watermarks/windows see identical event
    * time at any fixture precision. ns→µs is integer division: double
    * arithmetic cannot represent epoch-ns exactly (2^53 << 1.7e18).
    */
  private def tsAsTimestamp(dt: DataType) = dt match {
    case LongType => timestamp_micros(expr("ts div 1000"))
    case TimestampType => col("ts")
    case TimestampNTZType => col("ts").cast(TimestampType)
    case other => throw new IllegalStateException(
      s"events.ts: unsupported timestamp physical type $other")
  }

  /** A `ts` literal for synthetic rows (sentinel/marker), in the
    * probed schema's native representation of the given epoch-µs.
    */
  private def tsValue(dt: DataType, us: Long): Any = {
    val instant = java.time.Instant.ofEpochSecond(
      us / 1000000L, (us % 1000000L) * 1000L)
    dt match {
      case LongType => us * 1000L
      case TimestampType => java.sql.Timestamp.from(instant)
      case TimestampNTZType =>
        java.time.LocalDateTime.ofInstant(instant, java.time.ZoneOffset.UTC)
      case other => throw new IllegalStateException(
        s"events.ts: unsupported timestamp physical type $other")
    }
  }

  /** Far-future sentinel event time (~year 2096) in epoch-µs: pushes
    * every watermark past all real fixture events; its own windows are
    * filtered from sinks (`hour_sec` ≥ 3e9 / `user_id` = -1).
    */
  private val farUs = 4000000000000000L

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
    ,

    // Stateful SESSION windows under replay, append mode — the only
    // output mode session aggregations support, which means a session
    // row is emitted exactly once, when the watermark finalizes it
    // (the replay harness's sentinel batch advances the watermark past
    // every real session). Proven equal to the batch
    // lag/cumulative-sum sessionization (q30's construction) computed
    // at the same µs precision the stream sees. The decimal-summed
    // value keeps the per-session total order-independent.
    // Stream-STREAM inner join under replay: each click joined to the
    // same user's preceding views within 2h. Both sides carry
    // watermarks — the state-cleanup contract that makes this run
    // unbounded: Spark buffers each side only within
    // watermark + join-interval per user, so state is the 2h
    // correlation window, not the stream. Append mode (the only mode
    // stream-stream joins support); inner-join output is complete for
    // a drained finite replay, so the batch twin is the identical
    // interval join at the same µs precision.
    "q121_stream_join_replay" -> ((s, d) =>
      replay(s, d, mode = "append") { stream =>
        val clicks = stream.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts").as("c_ts"),
            col("event_id").as("c_id"))
          .withWatermark("c_ts", "1 hour")
        val views = stream.filter(col("event_type") === "view")
          .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
            col("event_id").as("v_id"))
          .withWatermark("v_ts", "1 hour")
        clicks.join(views,
          col("user_id") === col("v_user") &&
            col("v_ts") >= col("c_ts") - expr("INTERVAL 2 HOURS") &&
            col("v_ts") <= col("c_ts"))
      }.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_pairs"),
          count_distinct(col("c_id")).as("n_clicks"),
          count_distinct(col("v_id")).as("n_views"))
        .orderBy(col("user_id"))),

    // UPSERT materialized view under replay: the latest event per key,
    // maintained by the streaming engine (max_by aggregation — per-key
    // state is one row, the streaming analogue of q126's batch CDC
    // merge / q98's keep-latest). Complete mode because the memory-sink
    // replay needs the whole view in one table; an unbounded deployment
    // emits the SAME aggregation in update mode to an upsert sink —
    // the keyed state (and so the scale bound: key cardinality, not
    // stream length) is identical, only the sink protocol changes.
    // Tie-break and precision match the batch twin at the µs the
    // stream sees.
    "q133_stream_upsert_replay" -> ((s, d) =>
      replay(s, d) { stream =>
        stream.groupBy(col("user_id"))
          .agg(max_by(
            struct(col("event_id"), col("ts"), col("event_type"), col("value")),
            struct(col("ts"), col("event_id"))).as("last"))
          .select(col("user_id"), col("last.event_id").as("event_id"),
            unix_micros(col("last.ts")).as("ts_us"),
            col("last.event_type").as("event_type"),
            col("last.value").as("value"))
      }.orderBy(col("user_id"))),

    // Stream-STREAM LEFT OUTER interval join under replay — the outer
    // variant q121 doesn't cover: an unmatched click's null-padded row
    // can only be emitted once the watermark proves no matching view
    // can still arrive, so this exercises watermark-gated state
    // FINALIZATION, not just state cleanup. The far-future sentinel
    // rides both sides (filters keep it) to push both watermarks past
    // every real event; Spark's no-data batch then flushes the
    // unmatched rows, and the sentinel's own rows are filtered out of
    // the sink (q101's pattern).
    "q156_stream_outer_join_replay" -> ((s, d) =>
      replay(s, d, mode = "append", sentinel = true) { stream =>
        val clicks = stream
          .filter(col("event_type").isin("click", "sentinel"))
          .select(col("user_id"), col("ts").as("c_ts"),
            col("event_id").as("c_id"))
          .withWatermark("c_ts", "1 hour")
        val views = stream
          .filter(col("event_type").isin("view", "sentinel"))
          .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
            col("event_id").as("v_id"))
          .withWatermark("v_ts", "1 hour")
        clicks.join(views,
          col("user_id") === col("v_user") &&
            col("v_ts") >= col("c_ts") - expr("INTERVAL 2 HOURS") &&
            col("v_ts") <= col("c_ts"),
          "left_outer")
      }.filter(col("user_id") =!= -1L)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("v_id").isNull, 1).otherwise(0)).cast("int")
            .as("n_unmatched"),
          count_distinct(col("c_id")).as("n_clicks"))
        .orderBy(col("user_id"))),

    // Stream-STREAM FULL outer interval join under replay — the last
    // §2.C join mode (q121 inner, q156 left outer): BOTH sides'
    // unmatched rows are null-padded, and each can only be emitted
    // once the watermark proves no partner can still arrive — an
    // unmatched click waits on the view-side watermark and an
    // unmatched view on the click-side one, so this exercises
    // watermark-gated finalization of BOTH state stores. The
    // far-future sentinel rides both sides to flush both tails; its
    // own rows (and their self-join pair) are filtered out of the
    // sink. Grouping key is COALESCE(click user, view user) — exactly
    // one is non-null on a padded row.
    "q214_stream_full_outer_join_replay" -> ((s, d) =>
      replay(s, d, mode = "append", sentinel = true) { stream =>
        val clicks = stream
          .filter(col("event_type").isin("click", "sentinel"))
          .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
            col("event_id").as("c_id"))
          .withWatermark("c_ts", "1 hour")
        val views = stream
          .filter(col("event_type").isin("view", "sentinel"))
          .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
            col("event_id").as("v_id"))
          .withWatermark("v_ts", "1 hour")
        clicks.join(views,
          col("c_user") === col("v_user") &&
            col("v_ts") >= col("c_ts") - expr("INTERVAL 2 HOURS") &&
            col("v_ts") <= col("c_ts"),
          "full_outer")
      }.filter(coalesce(col("c_user"), col("v_user")) =!= -1L)
        .groupBy(coalesce(col("c_user"), col("v_user")).as("user_id"))
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("c_id").isNotNull && col("v_id").isNotNull, 1)
            .otherwise(0)).cast("long").as("n_pairs"),
          sum(when(col("v_id").isNull, 1).otherwise(0)).cast("int")
            .as("n_click_unmatched"),
          sum(when(col("c_id").isNull, 1).otherwise(0)).cast("int")
            .as("n_view_unmatched"))
        .orderBy(col("user_id"))),

    // Stream-STREAM LEFT SEMI interval join under replay — the
    // existence-test join mode (q121 inner, q156 left outer, q214
    // full outer): a click is emitted AT MOST ONCE iff any same-user
    // view precedes it within 2h, however many views match — the
    // streaming form of "keep events that have context". State
    // contract matches the outer joins (both sides watermarked,
    // buffered only within watermark + interval), but the output is
    // left-side-only rows with no duplication, so the batch twin is
    // an EXISTS predicate, not a join product.
    "q216_stream_semi_join_replay" -> ((s, d) =>
      replay(s, d, mode = "append", sentinel = true) { stream =>
        val clicks = stream
          .filter(col("event_type").isin("click", "sentinel"))
          .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
            col("event_id").as("c_id"))
          .withWatermark("c_ts", "1 hour")
        val views = stream
          .filter(col("event_type").isin("view", "sentinel"))
          .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
            col("event_id").as("v_id"))
          .withWatermark("v_ts", "1 hour")
        clicks.join(views,
          col("c_user") === col("v_user") &&
            col("v_ts") >= col("c_ts") - expr("INTERVAL 2 HOURS") &&
            col("v_ts") <= col("c_ts"),
          "left_semi")
      }.filter(col("c_user") =!= -1L)
        .groupBy(col("c_user").as("user_id"))
        .agg(count(lit(1)).as("n_rows"),
          count_distinct(col("c_id")).as("n_clicks"))
        .orderBy(col("user_id"))),

    // Stream-STREAM LEFT ANTI interval join under replay — the
    // absence-test join mode that completes the §2.C matrix (q121
    // inner, q156 left outer, q214 full outer, q216 left semi): emit
    // each click iff NO same-user view precedes it within 2h.
    // Structured Streaming has no native stream-stream left_anti, so
    // the operator is COMPOSED: the watermarked left_outer join (whose
    // state contract already proves "no partner can still arrive"
    // before null-padding) followed by an in-stream IS NULL filter —
    // the engine itself emits only the contextless clicks, nothing is
    // post-processed batch-side. The sentinel click matches the
    // sentinel view (same user/ts), so the filter drops it in-stream;
    // the sink-side -1 guard is belt only. State: identical bound to
    // q156 (both sides buffered within watermark + interval).
    "q226_stream_anti_join_replay" -> ((s, d) =>
      replay(s, d, mode = "append", sentinel = true) { stream =>
        val clicks = stream
          .filter(col("event_type").isin("click", "sentinel"))
          .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
            col("event_id").as("c_id"))
          .withWatermark("c_ts", "1 hour")
        val views = stream
          .filter(col("event_type").isin("view", "sentinel"))
          .select(col("user_id").as("v_user"), col("ts").as("v_ts"),
            col("event_id").as("v_id"))
          .withWatermark("v_ts", "1 hour")
        clicks.join(views,
          col("c_user") === col("v_user") &&
            col("v_ts") >= col("c_ts") - expr("INTERVAL 2 HOURS") &&
            col("v_ts") <= col("c_ts"),
          "left_outer")
          .filter(col("v_id").isNull)
      }.filter(col("c_user") =!= -1L)
        .groupBy(col("c_user").as("user_id"))
        .agg(count(lit(1)).as("n_rows"),
          count_distinct(col("c_id")).as("n_clicks"))
        .orderBy(col("user_id"))),

    // Streaming SKETCH maintenance under replay — the streaming leg
    // of the sketch family (q114 HLL, q215 theta algebra, q217 KLL):
    // the custom graft_theta_sketch_agg TypedImperativeAggregate runs
    // INSIDE the streaming engine (complete mode, q133's shape), so
    // per-type distinct-user state is a bounded k-entry sketch
    // maintained incrementally across micro-batches — the unbounded-
    // stream answer to COUNT(DISTINCT), which streaming cannot do
    // exactly. A theta set is order-independent (the k smallest
    // hashes), so the estimate is invariant to batch slicing; the
    // gate is the sketch's own 3σ interval against the batch-exact
    // distinct count (q215's bounded-error twin pattern), evaluated
    // on the ≤|types| sink rows.
    "q220_stream_sketch_replay" -> ((s, d) => {
      import graft.functions.exprs.graft_theta_sketch_agg
      val sink = replay(s, d) { stream =>
        stream.groupBy(col("event_type"))
          .agg(graft_theta_sketch_agg(col("user_id"), 4096).as("sk"))
      }
      val exact = graft.Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(count_distinct(col("user_id")).as("n_exact"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val rows = sink.collect().map { r =>
        val sk = org.apache.datasketches.theta.Sketches.wrapSketch(
          org.apache.datasketches.memory.Memory.wrap(
            r.getAs[Array[Byte]]("sk")))
        val ex = exact(r.getString(0))
        (r.getString(0), ex,
          sk.getLowerBound(3) <= ex.toDouble &&
            ex.toDouble <= sk.getUpperBound(3))
      }.sortBy(_._1)
      import s.implicits._
      rows.toSeq.toDF("event_type", "n_exact", "exact_within_bounds")
        .orderBy(col("event_type"))
    }),

    // Streaming LEADERBOARD under replay — the per-key cumulative
    // ledger (complete mode, q133's bounded-state shape: one exact
    // integer-cents sum per (type,user), updated incrementally across
    // micro-batches) finished by the q213 heap top-k OUTSIDE the
    // stream: streaming supports a single stateful aggregation level,
    // so the scalable shape is ledger-in-stream + collect_top_k on
    // the sink — never a second stateful agg, never a rank window
    // over the ledger (the fat-partition shape the q209 gate exists
    // for). Integer cents make the ledger deterministic under any
    // batch slicing, so the full batch oracle applies.
    // Streaming model-quality monitor under replay — q282's
    // calibration math maintained LIVE: the production shape for
    // watching a deployed classifier drift (per-bin confidence vs
    // observed rate over the event stream, ECE/MCE on the sink). The
    // in-stream state is q274's integer-ledger discipline — per score
    // bin, (n, positives, score-sum) exact integers, complete mode,
    // batch-slicing-invariant by commutativity — and ALL non-integer
    // arithmetic (conf/acc/gap/ECE) happens on the batch sink, where
    // q282's round-once-then-DECIMAL folds apply unchanged. Score =
    // value-cents per-mille (deterministic), label = purchase.
    "q289_stream_ece_replay" -> ((s, d) => {
      val sink = replay(s, d) { stream =>
        stream
          .withColumn("sm",
            expr("CAST(round(value * 100, 0) AS BIGINT) % 1000"))
          .withColumn("lab",
            when(col("event_type") === "purchase", 1L).otherwise(0L))
          .groupBy(expr("CAST(sm DIV 100 AS INT)").as("bin"))
          .agg(count(lit(1)).as("n"), sum(col("lab")).as("npos"),
            sum(col("sm")).as("sum_sm"))
      }
      val bins = sink
        .withColumn("conf", round(col("sum_sm").cast("double") /
          (col("n").cast("double") * 1000.0), 6).cast("decimal(12,6)"))
        .withColumn("acc", round(col("npos").cast("double") /
          col("n").cast("double"), 6).cast("decimal(12,6)"))
        .withColumn("gap", abs(col("acc") - col("conf")))
      val g = bins.agg(
        round(sum(col("gap") * col("n")).cast("double") /
          sum(col("n")).cast("double"), 6).as("ece"),
        max(col("gap")).cast("double").as("mce"))
      bins.select(col("bin"), col("n").cast("int").as("n"),
          col("conf").cast("double").as("conf"),
          col("acc").cast("double").as("acc"),
          col("gap").cast("double").as("gap"))
        .crossJoin(broadcast(g))
        .orderBy(col("bin"))
    }),

    // Streaming CUSUM changepoint monitor under replay — q251's
    // integer CUSUM LIVE: the production shape for watching ingest
    // volume for level shifts as the stream runs. In-stream state is
    // the per-(type, day) count ledger (q274's integer discipline —
    // exact, complete mode, batch-slicing-invariant by count
    // commutativity); the ORDER-dependent part of CUSUM (the
    // cumulative max/alarm scan) runs on the batch sink over the
    // calendar-bounded day grid with q251's exact-integer fold, so
    // the alarm day is bit-identical to the batch twin however the
    // stream was sliced into micro-batches.
    "q303_stream_cusum_replay" -> ((s, d) => {
      val sink = replay(s, d) { stream =>
        stream
          .withColumn("day", expr("unix_micros(ts) div 86400000000"))
          .groupBy(col("event_type"), col("day"))
          .agg(count(lit(1)).as("cnt"))
      }
      sink.groupBy(col("event_type"))
        .agg(array_sort(collect_list(struct(col("day"), col("cnt"))))
            .as("arr"),
          count(lit(1)).as("n_days"), sum(col("cnt")).as("tot"))
        .withColumn("k", expr("tot DIV n_days"))
        .withColumn("fold", expr(
          """aggregate(arr,
            |  named_struct('s', 0L, 'smax', 0L, 'alarm', -1L),
            |  (acc, x) -> named_struct(
            |    's', greatest(0L, acc.s + x.cnt - k),
            |    'smax', greatest(acc.smax,
            |      greatest(0L, acc.s + x.cnt - k)),
            |    'alarm', CASE WHEN acc.alarm >= 0L THEN acc.alarm
            |      WHEN greatest(0L, acc.s + x.cnt - k) > 3 * k THEN x.day
            |      ELSE -1L END),
            |  acc -> acc)""".stripMargin))
        .select(col("event_type"), col("n_days").cast("int").as("n_days"),
          col("k"), col("fold.smax").as("max_cusum"),
          when(col("fold.alarm") === -1L, lit(null).cast("long"))
            .otherwise(col("fold.alarm")).as("alarm_day"))
        .orderBy(col("event_type"))
    }),

    "q274_stream_topk_replay" -> ((s, d) => {
      val sink = replay(s, d) { stream =>
        stream.groupBy(col("event_type"), col("user_id"))
          .agg(sum(expr("cast(round(value * 100, 0) as bigint)"))
            .as("cents"))
      }
      import graft.functions.exprs.graft_collect_top_k
      sink.groupBy(col("event_type"))
        .agg(graft_collect_top_k(
          struct(col("cents"), (-col("user_id")).as("negu")), 3, false)
          .as("top"))
        .select(col("event_type"),
          posexplode(sort_array(col("top"), asc = false)))
        .select(col("event_type"), (col("pos") + 1).cast("int").as("rank"),
          (-col("col.negu")).as("user_id"), col("col.cents").as("cents"))
        .orderBy(col("event_type"), col("rank"))
    }),

    // foreachBatch MERGE sink under at-least-once replay: each
    // micro-batch is CDC-applied (keep-latest merge) into a parquet
    // snapshot via read-modify-write + directory swap — the mechanism
    // production incremental pipelines use to apply a stream to a
    // table (a Delta/Iceberg MERGE; the dir swap stands in for the
    // format's atomic commit). The fixture is staged TWICE with
    // maxFilesPerTrigger=1, so the same data arrives across multiple
    // batches and the final view is correct only because keep-latest
    // is idempotent — exactly the sink-side contract an at-least-once
    // stream requires. q133 keeps this view in engine state (complete
    // mode); here the state lives in the TABLE, so engine state is
    // zero and the view survives restarts — the 100 TB deployment
    // shape.
    "q150_stream_merge_sink" -> ((s, d) => replayMergeSink(s, d)),

    "q101_stream_session_replay" -> ((s, d) =>
      replay(s, d, mode = "append", sentinel = true) { stream =>
        stream.withWatermark("ts", "10 minutes")
          .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
          .agg(count(lit(1)).as("n_events"),
            dsum(col("value")).as("sum_value"))
          .select(unix_micros(col("session_window.start")).as("s_start_us"),
            unix_micros(col("session_window.end")).as("s_end_us"),
            col("user_id"), col("n_events"), col("sum_value"))
      }.filter(col("user_id") =!= -1L)
        .orderBy(col("user_id"), col("s_start_us"))),

    "q177_stream_late_audit" -> ((s, d) => lateAuditReplay(s, d)),

    // Stream-STATIC broadcast enrichment join under replay — the most
    // common production streaming shape (every event stream is joined
    // to a dimension before anything else) and the §2.C capability
    // q121/q156's stream-stream joins don't cover: the static side is
    // a plain batch DataFrame in the streaming plan, re-resolved per
    // micro-batch and BROADCAST, so the stream side never shuffles for
    // the join and no join state is kept at all (nothing to watermark
    // — state is the dimension, not the stream). LEFT join keeps
    // unmatched events; the dimension is deliberately carved (every
    // 17th customer dropped — q175's detectability convention) so the
    // enrichment's null path is provably exercised, not just the happy
    // path: carved users' events land in 'unknown'.
    "q182_stream_static_enrich" -> ((s, d) => {
      val dim = graft.Tables.customer(s, d)
        .filter(col("c_custkey") % 17 =!= 0)
        .select(col("c_custkey"), col("c_mktsegment"))
      replay(s, d) { stream =>
        stream.join(broadcast(dim), col("user_id") === col("c_custkey"),
            "left")
          .groupBy(coalesce(col("c_mktsegment"), lit("unknown")).as("seg"),
            col("event_type"))
          .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      }.orderBy(col("seg"), col("event_type"))
    }),

    // transformWithState (per-key custom state, RocksDB-backed) under
    // replay, ORACLE-checked — §2.C's newest state API graduated from
    // spec-gated to hash-compared. GradientMeanProcessor's update is a
    // commutative vector sum, so per-key arrival order (which a
    // multi-partition shuffle does NOT fix) cannot change the result:
    // the mean of [value, value²] per user is order-free, and rounding
    // absorbs the fold's ulp-level association drift. Single batch +
    // update mode → exactly one emitted row per key.
    // Streaming weighted reservoir — q195's Efraimidis–Spirakis race
    // maintained INCREMENTALLY per event_type with bounded state
    // (capacity entries + a counter per key). Min-k of a set is
    // arrival-order-invariant, so the final reservoir equals the batch
    // top-k however the stream was micro-batched — which is what makes
    // a streaming sampler oracle-able at all. The replay delivers the
    // whole fixture TWICE across two micro-batches (copies=2, one file
    // per trigger): at-least-once redelivery, the failure mode a
    // crawl-stream sampler actually faces — state dedups by event_id
    // so a replayed event can never occupy two reservoir slots, and
    // the oracle (top-k over DISTINCT events) proves it. Callers keep
    // the final generation (gen=2, one emission per key per batch).
    // Zero-weight rule (explicit): Efraimidis–Spirakis assigns weight-0
    // items zero inclusion probability — they can never win a slot —
    // so value=0 events are filtered OUT of the race before the key is
    // computed. This is both the correct sampling semantics and what
    // keeps the key finite under ANSI mode: the sf0.1 fixture contains
    // value=0.0 rows, and -log(u)/0 is a DIVIDE_BY_ZERO there (the
    // round-9 escape). The oracle twin applies the identical filter;
    // FixtureContractSpec pins value >= 0 so a negative-weight domain
    // can't silently invert the rule.
    "q196_stream_reservoir" -> ((s, d) => {
      val out = replay(s, d, copies = 2, mode = "update",
        filesPerTrigger = Some(1)) { stream =>
        import stream.sparkSession.implicits._
        val u = ((graft.llm.TextAnalysis.md5Int(
          concat(lit("rs:"), col("event_id").cast("string"))) % 1000000)
          .cast("double") + 0.5) / 1000000.0
        stream.filter(col("value") > 0.0)
          .select(col("event_type").as("etype"), col("event_id"),
            col("user_id").as("uid"), col("value").as("v"),
            (-log(u) / col("value")).as("k"))
          .as[StreamingOps.ResEvent]
          .transform(StreamingOps.streamingReservoir(_, 5)).toDF()
      }
      out.filter(col("gen") === 2)
        .select(col("etype").as("event_type"), col("event_id"),
          col("uid").as("user_id"), col("v").as("value"))
        .orderBy(col("event_type"), col("event_id"))
    }),

    "q178_stream_tws_replay" -> ((s, d) => {
      val prev = s.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      try {
        s.conf.set("spark.sql.streaming.stateStore.providerClass",
          "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
        replay(s, d, mode = "update") { stream =>
          import stream.sparkSession.implicits._
          val evs = stream.select(col("user_id").as("key"),
            array(col("value"), col("value") * col("value")).as("grad"))
            .as[StreamingOps.GradientEvent]
          StreamingOps.gradientMeans(evs).toDF()
            .select(col("key").as("user_id"), col("n"),
              round(element_at(col("mean"), 1), 6).as("mean_v"),
              round(element_at(col("mean"), 2), 6).as("mean_v2"))
        }.orderBy(col("user_id"))
      } finally prev match {
        case Some(v) =>
          s.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None =>
          s.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    })
  )

  // Replay staging + checkpoints live on graft.Scratch (tmpfs): replay
  // checkpoints are throwaway — the WAL/state durability they buy is
  // meaningless for a finite deterministic replay whose result is
  // collected to a memory sink in the same call. A real deployment
  // would point checkpointLocation at durable storage.

  /** Content-addressed staged-source cache: one staged copy of the
    * events fixture per (sfDir, copies, sentinel) shape, shared across
    * the four replay queries and across reruns in the same JVM —
    * q46/q79 share a key outright, and repeated Verify/Bench passes
    * pay the staging (and q101's sentinel-write Spark job) once.
    * Safe to share: the file stream source only reads the directory,
    * and each replay gets its own fresh checkpoint, so per-query
    * processed-file tracking never collides.
    */
  private val stageCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int, Boolean), java.nio.file.Path]()

  private def stagedSource(s: SparkSession, d: String, copies: Int,
      sentinel: Boolean): java.nio.file.Path =
    stageCache.computeIfAbsent((d, copies, sentinel), _ => {
      val stage = graft.Scratch.dir("replay_src_")
      val src = java.nio.file.Paths.get(s"$d/events.parquet")
      (1 to copies).foreach { i =>
        val dst = stage.resolve(s"events_$i.parquet")
        // hardlink fails across devices (fixture on disk, stage on
        // tmpfs) → copy; the fixture is small relative to tmpfs
        try java.nio.file.Files.createLink(dst, src)
        catch { case _: Exception => java.nio.file.Files.copy(src, dst) }
      }
      if (sentinel) {
        // Append-mode state (session windows) only EMITS once the
        // watermark passes it, and a finite replay's watermark stops at
        // max(ts) − lateness — the tail sessions would stay unemitted
        // forever. A single far-future sentinel event in a LATER batch
        // (maxFilesPerTrigger=1 + later mtime orders it second) pushes
        // the watermark past every real session; Spark's no-data batch
        // then evicts and emits them. The sentinel's own session stays
        // un-finalized, so callers filter its user_id (-1).
        val schema = eventsSchema(s, d)
        import scala.jdk.CollectionConverters._
        val row = org.apache.spark.sql.Row(
          -1L, tsValue(tsType(schema), farUs), -1L, "sentinel", 0.0, "{}")
        val tmpOut = stage.resolve("sentinel_build")
        s.createDataFrame(Seq(row).asJava, schema)
          .coalesce(1).write.parquet(tmpOut.toString)
        val listing = java.nio.file.Files.list(tmpOut)
        val part =
          try listing.iterator().asScala
            .find(_.toString.endsWith(".parquet")).get
          finally listing.close()
        val sentinelDst = stage.resolve("events_zz_sentinel.parquet")
        java.nio.file.Files.move(part, sentinelDst)
        graft.Scratch.deleteTree(tmpOut)
        java.nio.file.Files.setLastModifiedTime(sentinelDst,
          java.nio.file.attribute.FileTime.fromMillis(
            System.currentTimeMillis() + 60000))
      }
      stage
    })

  /** Shared replay harness: stage the events fixture into a cached
    * tmpfs dir (the file stream source requires a directory) `copies`
    * times (>1 = an at-least-once source: every event duplicated), run
    * `build` over a file-source stream of it — one deterministic
    * batch — into a memory sink, and return the (unordered) sink
    * table; callers apply their own transforms/ordering. Conf
    * overrides and the per-run checkpoint are restored/removed before
    * returning — the memory sink holds the result rows driver-side,
    * so nothing references them.
    *
    * Shuffle partitions are pinned to 4 for the stateful stage:
    * state-store instances (and their checkpoint dirs + open/commit
    * cost) scale with shuffle partitions, and the ≤100k keys in one
    * replayed batch gain nothing from the session's CPU-count
    * setting. An unbounded deployment would size this to key
    * cardinality, not core count. Whole-stage codegen is disabled for
    * the replay for the same finite-batch reason: each micro-batch
    * re-plans and re-compiles the generated code, a fixed ~0.2-0.4s
    * that a 1-3-batch replay never amortizes (a long-running stream
    * compiles once and runs thousands of batches — it would keep
    * codegen on). Both settings are restored on exit.
    *
    * Event time is normalized once at the source via [[tsAsTimestamp]]
    * (schema-probed, precision-portable); everything downstream sees a
    * proper µs TimestampType whatever the fixture's physical type.
    *
    * Concurrency contract: the session-conf overrides make this
    * harness single-query-at-a-time per session (a query planned
    * concurrently in the same session would inherit the temporary
    * shuffle setting). The driver's Verify/Bench run queries
    * sequentially; a server deployment would isolate replays in their
    * own session (`spark.newSession()`).
    */
  private def t[A](label: String)(body: => A): A = {
    val t0 = System.nanoTime()
    val r = body
    if (sys.env.contains("GRAFT_REPLAY_TIMING"))
      println(f"[replay-t] $label ${(System.nanoTime() - t0) / 1e9}%.3f s")
    r
  }

  /** The q150 harness: replay with a foreachBatch CDC-merge sink.
    * Per batch: keep-latest within the batch, merge with the current
    * parquet snapshot, write the next snapshot generation, swap. The
    * final view is collected before the scratch dirs are deleted (the
    * q107 materialize-before-drop pattern) — it is key-cardinality
    * sized by construction (one row per user).
    */
  private def replayMergeSink(s: SparkSession, d: String): DataFrame = {
    val prevNanos = s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    val ckpt = graft.Scratch.dir("merge_ckpt_")
    val snapRoot = graft.Scratch.dir("merge_snap_")
    try {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s.conf.set("spark.sql.shuffle.partitions", "4")
      val stage = stagedSource(s, d, copies = 2, sentinel = false)
      val schema = eventsSchema(s, d)
      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stage.toString)
        .withColumn("ts", tsAsTimestamp(tsType(schema)))
      // keep-latest per user by (ts, event_id) — associative and
      // idempotent, so batch slicing and duplicate delivery are both
      // invisible in the final snapshot
      def keepLatest(df: DataFrame): DataFrame =
        df.groupBy(col("user_id"))
          .agg(max(struct(col("ts"), col("event_id"), col("value"))).as("m"))
          .select(col("user_id"), col("m.ts").as("ts"),
            col("m.event_id").as("event_id"), col("m.value").as("value"))
      var cur: Option[String] = None
      var gen = 0
      val applyBatch: (org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
        Long) => Unit = (batch, _) => {
        val delta = keepLatest(batch)
        val merged = cur match {
          case Some(p) => keepLatest(s.read.parquet(p).unionByName(delta))
          case None => delta
        }
        gen += 1
        val next = snapRoot.resolve(s"g$gen").toString
        merged.write.mode("overwrite").parquet(next)
        cur = Some(next)
      }
      val q = stream.writeStream.outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", ckpt.toString)
        .foreachBatch(applyBatch)
        .start()
      try q.awaitTermination() finally q.stop()
      require(cur.nonEmpty, "no micro-batch produced a snapshot")
      val rows = s.read.parquet(cur.get)
        .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
          col("event_id"), col("value"))
        .orderBy(col("user_id")).collect()
      import scala.jdk.CollectionConverters._
      s.createDataFrame(rows.toSeq.asJava, StructType(Seq(
          StructField("user_id", LongType), StructField("ts_us", LongType),
          StructField("event_id", LongType), StructField("value", DoubleType))))
        .orderBy(col("user_id"))
    } finally {
      prevNanos match {
        case Some(v) => s.conf.set("spark.sql.legacy.parquet.nanosAsLong", v)
        case None => s.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
      }
      s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      graft.Scratch.deleteTree(ckpt)
      graft.Scratch.deleteTree(snapRoot)
    }
  }

  /** q177 — watermark LATE-DATA semantics under replay: the fixture is
    * split into an on-time bulk (event_id % 10 != 0, batch 1) and a
    * late slice (event_id % 10 == 0, batch 2, arriving after batch 1
    * advanced the watermark to max(on-time ts) − 1h). Append-mode
    * 1h-tumbling counts then accept a late row iff its window has not
    * been finalized (window end > the batch-1 watermark) — already-
    * emitted windows drop late contributions. A far-future sentinel
    * (batch 3) flushes the tail windows. The oracle states the exact
    * acceptance rule in batch SQL at the stream's ms watermark
    * precision, so the hash-compare pins Spark's late-row-drop
    * boundary, not just the happy path.
    */
  private def lateAuditReplay(s: SparkSession, d: String): DataFrame = {
    val prevNanos = s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    val ckpt = graft.Scratch.dir("late_ckpt_")
    val stage = graft.Scratch.dir("late_src_")
    try {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s.conf.set("spark.sql.shuffle.partitions", "4")
      import scala.jdk.CollectionConverters._
      def writeOne(df: DataFrame, name: String, mtimePlusMs: Long): Unit = {
        val tmp = stage.resolve(s"${name}_build")
        df.coalesce(1).write.parquet(tmp.toString)
        val listing = java.nio.file.Files.list(tmp)
        val part =
          try listing.iterator().asScala
            .find(_.toString.endsWith(".parquet")).get
          finally listing.close()
        val dst = stage.resolve(s"$name.parquet")
        java.nio.file.Files.move(part, dst)
        graft.Scratch.deleteTree(tmp)
        java.nio.file.Files.setLastModifiedTime(dst,
          java.nio.file.attribute.FileTime.fromMillis(
            System.currentTimeMillis() + mtimePlusMs))
      }
      val schema = eventsSchema(s, d)
      val ev = s.read.schema(schema).parquet(s"$d/events.parquet")
      val onTime = ev.filter(col("event_id") % 10 =!= 0)
      writeOne(onTime, "events_a_ontime", 0)
      // Eviction runs at the END of the first batch executed UNDER the
      // advanced watermark — late data arriving in that same batch
      // still merges into live state (observed: 0 dropped when the
      // late slice was batch 2 of 3). So a 1-row on-time MARKER batch
      // activates the watermark and triggers the eviction, and only
      // THEN does the late slice arrive against evicted state. The
      // marker reuses the on-time max ts in the schema's own native
      // representation (no re-encoding — get(0) passes it through).
      val maxATs = onTime.agg(max(col("ts"))).head().get(0)
      writeOne(s.createDataFrame(Seq(org.apache.spark.sql
          .Row(-2L, maxATs, -2L, "marker", 0.0, "{}")).asJava, schema),
        "events_m_marker", 30000)
      writeOne(ev.filter(col("event_id") % 10 === 0), "events_x_late", 60000)
      writeOne(s.createDataFrame(Seq(org.apache.spark.sql
          .Row(-1L, tsValue(tsType(schema), farUs), -1L, "sentinel", 0.0,
            "{}")).asJava, schema),
        "events_zz_sentinel", 120000)

      val stream = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(stage.toString)
        .withColumn("ts", tsAsTimestamp(tsType(schema)))
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("n"))
        .select(col("window.start").cast("long").as("hour_sec"), col("n"))
      val sink = s"late_audit_${runId.incrementAndGet()}"
      val q = stream.writeStream.outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", ckpt.toString)
        .format("memory").queryName(sink).start()
      try q.awaitTermination() finally q.stop()
      val rows = s.table(sink)
        .filter(col("hour_sec") < 3000000000L) // sentinel's 2096 window
        .orderBy(col("hour_sec")).collect()
      s.createDataFrame(rows.toSeq.asJava, org.apache.spark.sql.types
          .StructType(Seq(
            org.apache.spark.sql.types.StructField("hour_sec",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("n",
              org.apache.spark.sql.types.LongType))))
        .orderBy(col("hour_sec"))
    } finally {
      prevNanos match {
        case Some(v) => s.conf.set("spark.sql.legacy.parquet.nanosAsLong", v)
        case None => s.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
      }
      s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      graft.Scratch.deleteTree(ckpt)
      graft.Scratch.deleteTree(stage)
    }
  }

  private def replay(s: SparkSession, d: String, copies: Int = 1,
      mode: String = "complete", sentinel: Boolean = false,
      filesPerTrigger: Option[Int] = None)(
      build: DataFrame => DataFrame): DataFrame = {
    val prevNanos = s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    val prevCodegen = s.conf.get("spark.sql.codegen.wholeStage", "true")
    val ckpt = graft.Scratch.dir("replay_ckpt_")
    try {
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      s.conf.set("spark.sql.shuffle.partitions", "4")
      s.conf.set("spark.sql.codegen.wholeStage", "false")
      val stage = t("stage") { stagedSource(s, d, copies, sentinel) }
      // Non-sentinel replays (q92's at-least-once dedup proof in
      // particular) rely on ALL staged copies landing in ONE
      // micro-batch: a second copy arriving in a later batch would sit
      // below the watermark the first advanced, where
      // dropDuplicatesWithinWatermark gives no dedup guarantee. The
      // default source behavior (unset maxFilesPerTrigger = all
      // available files per trigger) already does this, but pin it
      // explicitly so a Spark default change can't silently break the
      // single-batch assumption. Sentinel replays need the OPPOSITE
      // (1 file per batch) so the sentinel arrives after the data.
      val schema = eventsSchema(s, d)
      val reader = s.readStream.schema(schema)
        .option("maxFilesPerTrigger", filesPerTrigger.map(_.toString)
          .getOrElse(if (sentinel) "1" else (copies + 1).toString))
      val stream = reader
          .parquet(stage.toString)
          .withColumn("ts", tsAsTimestamp(tsType(schema)))
      val sink = s"replay_${runId.incrementAndGet()}"
      // Trigger.AvailableNow (round-9 verdict ask #6): the query drains
      // everything available at start — honoring maxFilesPerTrigger, so
      // the sentinel still arrives in its own later batch — runs the
      // final watermark-commit no-data batch (the fix AvailableNow was
      // introduced for over Trigger.Once), and TERMINATES on its own.
      // That removes the stop-vs-trigger race class entirely: there is
      // no external stop() racing an in-flight trigger, and a stream
      // error surfaces deterministically from awaitTermination().
      val q = t("query-start") { build(stream).writeStream.outputMode(mode)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .option("checkpointLocation", ckpt.toString)
        .format("memory").queryName(sink).start() }
      try t("await") { q.awaitTermination() } finally t("stop") { q.stop() }
      s.table(sink)
    } finally {
      prevNanos match {
        case Some(v) => s.conf.set("spark.sql.legacy.parquet.nanosAsLong", v)
        case None => s.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
      }
      s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      s.conf.set("spark.sql.codegen.wholeStage", prevCodegen)
      graft.Scratch.deleteTree(ckpt)
    }
  }

  def oracle: Map[String, String] = Map(
    // q303: the in-stream ledger is the exact (type, day) count, so
    // the batch twin is q251's recursive CUSUM over the same grid
    "q303_stream_cusum_replay" ->
      """WITH RECURSIVE dc AS (
        |  SELECT event_type, epoch_ns(ts)//1000 // 86400000000 AS day,
        |    COUNT(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |idx AS (
        |  SELECT event_type, day, cnt,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS i
        |  FROM dc),
        |kh AS (
        |  SELECT event_type, COUNT(*) AS n_days,
        |    SUM(cnt) // COUNT(*) AS k
        |  FROM dc GROUP BY 1),
        |r AS (
        |  SELECT kh.event_type, 0 AS i, CAST(0 AS BIGINT) AS s,
        |    CAST(0 AS BIGINT) AS smax, CAST(NULL AS BIGINT) AS alarm
        |  FROM kh
        |  UNION ALL
        |  SELECT r.event_type, r.i + 1,
        |    GREATEST(0, r.s + idx.cnt - kh.k),
        |    GREATEST(r.smax, GREATEST(0, r.s + idx.cnt - kh.k)),
        |    COALESCE(r.alarm,
        |      CASE WHEN GREATEST(0, r.s + idx.cnt - kh.k) > 3 * kh.k
        |           THEN idx.day END)
        |  FROM r
        |  JOIN idx ON idx.event_type = r.event_type AND idx.i = r.i + 1
        |  JOIN kh ON kh.event_type = r.event_type)
        |SELECT kh.event_type, CAST(kh.n_days AS INT) AS n_days,
        |  CAST(kh.k AS BIGINT) AS k, r.smax AS max_cusum,
        |  r.alarm AS alarm_day
        |FROM r JOIN kh ON kh.event_type = r.event_type
        |  AND r.i = kh.n_days
        |ORDER BY kh.event_type""".stripMargin,

    // q289: the in-stream ledger is exact integers per bin, so the
    // batch twin is q282's arithmetic over the same derivation
    "q289_stream_ece_replay" ->
      """WITH t AS (
        |  SELECT CAST(round(value * 100, 0) AS BIGINT) % 1000 AS sm,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS lab
        |  FROM events),
        |b AS (
        |  SELECT sm // 100 AS bin, COUNT(*) AS n, SUM(lab) AS npos,
        |    SUM(sm) AS sum_sm
        |  FROM t GROUP BY 1),
        |e AS (
        |  SELECT bin, n,
        |    CAST(ROUND(CAST(sum_sm AS DOUBLE) /
        |      (CAST(n AS DOUBLE) * 1000.0), 6) AS DECIMAL(12,6)) AS conf,
        |    CAST(ROUND(CAST(npos AS DOUBLE) / CAST(n AS DOUBLE), 6)
        |      AS DECIMAL(12,6)) AS acc
        |  FROM b),
        |e2 AS (SELECT bin, n, conf, acc, ABS(acc - conf) AS gap FROM e),
        |g AS (
        |  SELECT ROUND(CAST(SUM(gap * n) AS DOUBLE) /
        |    CAST(SUM(n) AS DOUBLE), 6) AS ece,
        |    CAST(MAX(gap) AS DOUBLE) AS mce
        |  FROM e2)
        |SELECT CAST(bin AS INT) AS bin, CAST(n AS INT) AS n,
        |  CAST(conf AS DOUBLE) AS conf, CAST(acc AS DOUBLE) AS acc,
        |  CAST(gap AS DOUBLE) AS gap, g.ece, g.mce
        |FROM e2, g ORDER BY bin""".stripMargin,

    // q274: the streaming ledger is exact integer cents per
    // (type,user) — batch-slicing-invariant — so the leaderboard is
    // the plain batch top-3 with the same (cents DESC, user) tiebreak
    "q274_stream_topk_replay" ->
      """WITH pu AS (
        |  SELECT event_type, user_id,
        |    SUM(CAST(round(value * 100, 0) AS BIGINT)) AS cents
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT event_type, user_id, cents,
        |    ROW_NUMBER() OVER (PARTITION BY event_type
        |      ORDER BY cents DESC, user_id) AS rank
        |  FROM pu)
        |SELECT event_type, CAST(rank AS INT) AS rank, user_id,
        |  CAST(cents AS BIGINT) AS cents
        |FROM r WHERE rank <= 3
        |ORDER BY event_type, rank""".stripMargin,

    // q177: the late-acceptance rule stated in batch SQL — a late row
    // counts iff its window end clears the batch-1 watermark, which is
    // the on-time max event time FLOORED TO MS (Spark tracks event
    // time at ms precision) minus the 1h delay; the +1 marker row is
    // the watermark-activating batch
    "q177_stream_late_audit" ->
      """WITH a AS (
        |  SELECT epoch_ns(ts)//1000 AS us FROM events
        |  WHERE event_id % 10 <> 0),
        |mx AS (SELECT MAX(us) AS max_us FROM a),
        |wm AS (SELECT (max_us // 1000) * 1000 - 3600000000 AS wmk FROM mx),
        |b AS (
        |  SELECT epoch_ns(ts)//1000 AS us FROM events
        |  WHERE event_id % 10 = 0),
        |keep AS (
        |  SELECT us FROM a
        |  UNION ALL SELECT max_us FROM mx
        |  UNION ALL SELECT b.us FROM b, wm
        |    WHERE (b.us // 3600000000 + 1) * 3600000000 > wm.wmk)
        |SELECT (us // 3600000000) * 3600 AS hour_sec, COUNT(*) AS n
        |FROM keep GROUP BY 1 ORDER BY 1""".stripMargin,

    // the race over DISTINCT events restated as a per-type top-k:
    // redelivered duplicates must be invisible to the reservoir.
    // WHERE value > 0 is the query's explicit zero-weight rule (ES:
    // weight-0 items have zero inclusion probability), mirrored here.
    "q196_stream_reservoir" ->
      s"""WITH keyed AS (
         |  SELECT event_type, event_id, user_id, value,
         |    -ln((${graft.llm.TextAnalysis.md5IntSql("'rs:' || CAST(event_id AS VARCHAR)")}
         |         % 1000000 + 0.5) / 1000000.0) / value AS es_key
         |  FROM events WHERE value > 0),
         |ranked AS (
         |  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
         |    ORDER BY es_key, event_id) AS rn
         |  FROM keyed)
         |SELECT event_type, event_id, user_id, value
         |FROM ranked WHERE rn <= 5
         |ORDER BY event_type, event_id""".stripMargin,

    // q178: per-user mean of [value, value²] — commutative, so the
    // batch twin needs no ordering assumptions; n is the processor's
    // per-event counter, i.e. the per-user event count
    "q178_stream_tws_replay" ->
      """SELECT user_id, COUNT(*) AS n,
        |  ROUND(AVG(value), 6) AS mean_v,
        |  ROUND(AVG(value * value), 6) AS mean_v2
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q46_stream_tumbling_replay" ->
      """SELECT (epoch_ns(ts) // 3600000000000) * 3600 AS hour_sec,
        |  event_type, COUNT(*) AS n
        |FROM events
        |GROUP BY 1, 2 ORDER BY hour_sec, event_type""".stripMargin,

    // q121: the same click⋈view interval join at the same µs precision
    // the stream computes after its ns→µs conversion
    "q121_stream_join_replay" ->
      """WITH p AS (
        |  SELECT a.user_id, a.event_id AS c_id, b.event_id AS v_id
        |  FROM events a JOIN events b
        |    ON a.user_id = b.user_id
        |   AND a.event_type = 'click' AND b.event_type = 'view'
        |   AND epoch_ns(b.ts)//1000
        |       BETWEEN epoch_ns(a.ts)//1000 - 7200000000
        |           AND epoch_ns(a.ts)//1000)
        |SELECT user_id, COUNT(*) AS n_pairs,
        |  CAST(COUNT(DISTINCT c_id) AS BIGINT) AS n_clicks,
        |  CAST(COUNT(DISTINCT v_id) AS BIGINT) AS n_views
        |FROM p GROUP BY user_id ORDER BY user_id""".stripMargin,

    // q101: the batch sessionization twin runs on epoch-µs longs —
    // the same precision the stream sees after its ns→µs conversion —
    // so gap-boundary comparisons agree exactly. Session end = last
    // event + gap, and the break test is `>=` because session_window's
    // end is EXCLUSIVE: an event at exactly prev+gap starts a new
    // session in the stream, so it must in the twin too.
    "q101_stream_session_replay" ->
      s"""WITH e AS (
        |  SELECT user_id, epoch_us(ts) AS tu, value FROM events),
        |f AS (
        |  SELECT user_id, tu, value,
        |    CASE WHEN LAG(tu) OVER w IS NULL
        |           OR tu >= LAG(tu) OVER w + 1800000000 THEN 1 ELSE 0 END
        |      AS is_new
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tu)),
        |s2 AS (
        |  SELECT user_id, tu, value,
        |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY tu
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        |  FROM f)
        |SELECT MIN(tu) AS s_start_us, MAX(tu) + 1800000000 AS s_end_us,
        |  user_id, COUNT(*) AS n_events,
        |  ${dsumSql("value")} AS sum_value
        |FROM s2 GROUP BY user_id, sess
        |ORDER BY user_id, s_start_us""".stripMargin,

    // q133: the batch keep-latest twin, ordered at the µs precision
    // the stream's ns→µs conversion produces (a sub-µs-only ordering
    // difference must not flip which event is "latest").
    "q133_stream_upsert_replay" ->
      """SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us,
        |  event_type, value
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |    ORDER BY epoch_ns(ts) // 1000 DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    // q156: drained left-outer replay ≡ the batch left interval join
    // at the µs precision the stream sees
    "q156_stream_outer_join_replay" ->
      """WITH c AS (
        |  SELECT user_id, epoch_ns(ts) // 1000 AS c_ts, event_id AS c_id
        |  FROM events WHERE event_type = 'click'),
        |v AS (
        |  SELECT user_id AS v_user, epoch_ns(ts) // 1000 AS v_ts,
        |    event_id AS v_id
        |  FROM events WHERE event_type = 'view')
        |SELECT user_id, COUNT(*) AS n_rows,
        |  CAST(SUM(CASE WHEN v_id IS NULL THEN 1 ELSE 0 END) AS INT)
        |    AS n_unmatched,
        |  COUNT(DISTINCT c_id) AS n_clicks
        |FROM c LEFT JOIN v
        |  ON c.user_id = v.v_user
        |    AND v.v_ts BETWEEN c.c_ts - 7200000000 AND c.c_ts
        |GROUP BY user_id ORDER BY user_id""".stripMargin,

    // q214: drained full-outer replay ≡ the batch FULL interval join
    // at the µs precision the stream sees — every unmatched row on
    // EITHER side appears null-padded exactly once
    "q214_stream_full_outer_join_replay" ->
      """WITH c AS (
        |  SELECT user_id AS c_user, epoch_ns(ts) // 1000 AS c_ts,
        |    event_id AS c_id
        |  FROM events WHERE event_type = 'click'),
        |v AS (
        |  SELECT user_id AS v_user, epoch_ns(ts) // 1000 AS v_ts,
        |    event_id AS v_id
        |  FROM events WHERE event_type = 'view'),
        |j AS (
        |  SELECT c_user, v_user, c_id, v_id
        |  FROM c FULL JOIN v
        |    ON c.c_user = v.v_user
        |      AND v.v_ts BETWEEN c.c_ts - 7200000000 AND c.c_ts)
        |SELECT COALESCE(c_user, v_user) AS user_id, COUNT(*) AS n_rows,
        |  CAST(SUM(CASE WHEN c_id IS NOT NULL AND v_id IS NOT NULL
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_pairs,
        |  CAST(SUM(CASE WHEN v_id IS NULL THEN 1 ELSE 0 END) AS INT)
        |    AS n_click_unmatched,
        |  CAST(SUM(CASE WHEN c_id IS NULL THEN 1 ELSE 0 END) AS INT)
        |    AS n_view_unmatched
        |FROM j GROUP BY 1 ORDER BY user_id""".stripMargin,

    // q216: drained semi-join replay ≡ batch EXISTS — each matched
    // click exactly once regardless of how many views matched, so
    // n_rows must equal n_clicks
    "q216_stream_semi_join_replay" ->
      """WITH c AS (
        |  SELECT user_id, epoch_ns(ts) // 1000 AS c_ts, event_id AS c_id
        |  FROM events WHERE event_type = 'click'),
        |v AS (
        |  SELECT user_id AS v_user, epoch_ns(ts) // 1000 AS v_ts
        |  FROM events WHERE event_type = 'view'),
        |m AS (
        |  SELECT user_id, c_id FROM c
        |  WHERE EXISTS (SELECT 1 FROM v
        |    WHERE v.v_user = c.user_id
        |      AND v.v_ts BETWEEN c.c_ts - 7200000000 AND c.c_ts))
        |SELECT user_id, COUNT(*) AS n_rows,
        |  COUNT(DISTINCT c_id) AS n_clicks
        |FROM m GROUP BY user_id ORDER BY user_id""".stripMargin,

    // q226: drained anti-join replay ≡ batch NOT EXISTS — each
    // contextless click exactly once, so n_rows must equal n_clicks
    "q226_stream_anti_join_replay" ->
      """WITH c AS (
        |  SELECT user_id, epoch_ns(ts) // 1000 AS c_ts, event_id AS c_id
        |  FROM events WHERE event_type = 'click'),
        |v AS (
        |  SELECT user_id AS v_user, epoch_ns(ts) // 1000 AS v_ts
        |  FROM events WHERE event_type = 'view'),
        |m AS (
        |  SELECT user_id, c_id FROM c
        |  WHERE NOT EXISTS (SELECT 1 FROM v
        |    WHERE v.v_user = c.user_id
        |      AND v.v_ts BETWEEN c.c_ts - 7200000000 AND c.c_ts))
        |SELECT user_id, COUNT(*) AS n_rows,
        |  COUNT(DISTINCT c_id) AS n_clicks
        |FROM m GROUP BY user_id ORDER BY user_id""".stripMargin,

    // q220: DuckDB twins the exact per-type distinct-user counts; the
    // interval booleans are the sketch's own guarantee (q215 pattern)
    "q220_stream_sketch_replay" ->
      """SELECT event_type,
        |  COUNT(DISTINCT user_id) AS n_exact,
        |  true AS exact_within_bounds
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // q150: the merged snapshot ≡ plain batch keep-latest at the µs
    // precision the stream sees — batch slicing and the duplicated
    // staging are invisible because the merge is idempotent
    "q150_stream_merge_sink" ->
      """SELECT user_id, epoch_ns(ts) // 1000 AS ts_us, event_id, value
        |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
        |    ORDER BY epoch_ns(ts) // 1000 DESC, event_id DESC) AS rn
        |  FROM events)
        |WHERE rn = 1 ORDER BY user_id""".stripMargin,

    // q182: drained stream-static replay ≡ the identical batch
    // enrichment join over the same carved dimension; carved users'
    // events land in 'unknown'
    "q182_stream_static_enrich" ->
      s"""SELECT COALESCE(c_mktsegment, 'unknown') AS seg, event_type,
         |  COUNT(*) AS n, ${dsumSql("value")} AS sum_value
         |FROM events LEFT JOIN (
         |  SELECT c_custkey, c_mktsegment FROM customer
         |  WHERE c_custkey % 17 <> 0) dim ON user_id = c_custkey
         |GROUP BY 1, 2 ORDER BY seg, event_type""".stripMargin,

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
