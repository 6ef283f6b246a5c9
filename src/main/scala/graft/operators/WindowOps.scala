package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.{QueryModule, Tables}

/** Window-function family (absent from the reference — SURVEY §2.A
  * notes its only sort is the incidental A12 framework sort,
  * `propreducer.java:13-24`). Ranking, analytic frames, top-k per
  * group, and batch sessionization (q30's streaming twin lives in
  * `graft.streaming`).
  *
  * Determinism: every window ORDER BY carries a unique tiebreaker key
  * (row_number over a non-unique sort is engine-dependent), and
  * running sums go through DECIMAL so frame accumulation is exact.
  * Scale: windows partition by customer/user keys — high-cardinality,
  * skew-free shuffles; no global window is ever used.
  */
object WindowOps extends QueryModule {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q22_window_ranking" -> ((s, d) => {
      // row_number needs the unique o_orderkey tiebreak; rank/dense_rank
      // are deterministic under ties so they rank on price alone.
      val wUnique = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val wTies = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc)
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(wUnique).cast("int").as("rn"),
          rank().over(wTies).cast("int").as("rk"),
          dense_rank().over(wTies).cast("int").as("drk"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    "q23_window_analytic" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"),
          lag(col("value"), 1).over(w).as("prev_val"),
          lead(col("event_id"), 1).over(w).as("next_event"),
          count(lit(1)).over(frame).as("run_cnt"),
          sum(col("value").cast(DecimalType(20, 4))).over(frame)
            .cast("double").as("run_sum"))
        .orderBy(col("event_id"))
    }),

    "q24_topk_per_group" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(w).cast("int").as("rn"))
        .filter(col("rn") <= 3)
        .orderBy(col("o_custkey"), col("rn"))
    }),

    // Batch sessionization: 30-min-gap sessions via lag + cumulative sum
    // of session-break flags (SURVEY q30; streaming twin uses
    // session_window in graft.streaming.StreamingOps). The gap test is
    // pure integer µs arithmetic on Tables.eventsUs's canonical ts_us —
    // exact on both engines at any fixture precision. The break test is
    // `>=` to match session_window's exclusive end (an event at exactly
    // prev+gap starts a new session), keeping q30's batch convention
    // identical to q101's streaming semantics.
    "q30_session_window_batch" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      val frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val gapUs = 30L * 60 * 1000 * 1000
      Tables.eventsUs(s, d)
        .withColumn("prev_ts", lag(col("ts_us"), 1).over(w))
        .withColumn("is_new",
          when(col("prev_ts").isNull ||
            col("ts_us") >= col("prev_ts") + lit(gapUs), 1).otherwise(0))
        .withColumn("sess", sum(col("is_new")).over(frame))
        .groupBy(col("user_id"), col("sess"))
        .agg(count(lit(1)).as("n_events"),
          min(col("event_id")).as("first_event"),
          max(col("event_id")).as("last_event"),
          RelationalCore.dsum(col("value")).as("sum_value"))
        .orderBy(col("user_id"), col("sess"))
    }),

    // Time-series resample + forward-fill: per user, an hourly grid
    // spanning first→last active hour, gaps carrying the last observed
    // value forward (LAST ... IGNORE NULLS) — the gap-fill every
    // metrics/feature pipeline needs before ML. The per-(user,hour)
    // downsample is a keyed hash-agg (arg-max by ts, deterministic:
    // (user_id,ts) is unique in the fixture); the grid explodes from a
    // per-user span table orders of magnitude smaller than the events;
    // the fill is a user-partitioned window — grid rows per user are
    // bounded by the span (≤720 here), never by event count, so the
    // window partitions stay small at any corpus scale.
    "q138_gap_fill_resample" -> ((s, d) => {
      val hourUs = 3600L * 1000 * 1000
      val ev = Tables.eventsUs(s, d).filter(col("user_id") < 20)
        .select(col("user_id"), expr(s"ts_us div $hourUs").as("h"),
          col("ts_us"), col("value"))
      val hourly = ev.groupBy(col("user_id"), col("h"))
        .agg(max_by(col("value"), col("ts_us")).as("v"),
          count(lit(1)).cast("int").as("n_ev"))
      val spans = hourly.groupBy(col("user_id"))
        .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      val grid = spans.select(col("user_id"),
        explode(sequence(col("h0"), col("h1"))).as("h"))
      val w = Window.partitionBy(col("user_id")).orderBy(col("h"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(hourly, Seq("user_id", "h"), "left")
        .withColumn("fill_value",
          round(last(col("v"), ignoreNulls = true).over(w), 6))
        .select(col("user_id"), col("h"), col("fill_value"),
          coalesce(col("n_ev"), lit(0)).as("n_ev"),
          col("v").isNull.as("is_gap"))
        .orderBy(col("user_id"), col("h"))
    }),

    // Session funnel: view → click → purchase conversion within q30's
    // 30-min sessions — each stage's timestamp is the first qualifying
    // event AT OR AFTER the previous stage (ordered funnel, not mere
    // co-occurrence). The three dependent stage minima stack as window
    // aggregates over the SAME (user,sess) partition, so they share
    // one exchange+sort; the final summary is a tiny global rollup of
    // the per-session stage table.
    "q151_session_funnel" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      val frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val gapUs = 30L * 60 * 1000 * 1000
      val ws = Window.partitionBy(col("user_id"), col("sess"))
      val sessions = Tables.eventsUs(s, d)
        .withColumn("prev_ts", lag(col("ts_us"), 1).over(w))
        .withColumn("is_new",
          when(col("prev_ts").isNull ||
            col("ts_us") >= col("prev_ts") + lit(gapUs), 1).otherwise(0))
        .withColumn("sess", sum(col("is_new")).over(frame))
        .withColumn("t_view",
          min(when(col("event_type") === "view", col("ts_us"))).over(ws))
        .withColumn("t_click",
          min(when(col("event_type") === "click" &&
            col("ts_us") >= col("t_view"), col("ts_us"))).over(ws))
        .withColumn("t_purchase",
          min(when(col("event_type") === "purchase" &&
            col("ts_us") >= col("t_click"), col("ts_us"))).over(ws))
      val perSession = sessions.groupBy(col("user_id"), col("sess"))
        .agg(max(col("t_view")).as("t_view"),
          max(col("t_click")).as("t_click"),
          max(col("t_purchase")).as("t_purchase"))
      perSession.agg(count(lit(1)).cast("int").as("n_sessions"),
          count(col("t_view")).cast("int").as("n_view"),
          count(col("t_click")).cast("int").as("n_view_click"),
          count(col("t_purchase")).cast("int").as("n_full_funnel"))
        .select(col("n_sessions"), col("n_view"), col("n_view_click"),
          col("n_full_funnel"),
          round(col("n_view_click").cast("double") / col("n_view"), 6)
            .as("click_rate"),
          round(col("n_full_funnel").cast("double") / col("n_view_click"), 6)
            .as("purchase_rate"))
    }),

    // Cohort retention: users grouped by first-seen day, activity
    // counted per day offset — the (cohort, offset) retention matrix.
    // The cohort table is user-cardinality (broadcastable at any
    // realistic user count ÷ corpus ratio); the activity relation is
    // the distinct (user, day) projection.
    "q152_cohort_retention" -> ((s, d) => {
      val day = expr("ts_us div 86400000000")
      val cohorts = Tables.eventsUs(s, d)
        .groupBy(col("user_id")).agg(min(day).as("cohort_day"))
      val active = Tables.eventsUs(s, d)
        .select(col("user_id"), day.as("day")).distinct()
      active.join(broadcast(cohorts), "user_id")
        .groupBy(col("cohort_day"),
          (col("day") - col("cohort_day")).as("day_offset"))
        .agg(countDistinct(col("user_id")).cast("int").as("n_active"))
        .orderBy(col("cohort_day"), col("day_offset"))
    }),

    // Interval union (gaps-and-islands): each event opens a 30-minute
    // interval; overlapping intervals per user merge via the classic
    // running-max-end break detector, then per-user coverage stats.
    // ONE user-keyed shuffle feeds both windows and both groupBys
    // (partitioning on user_id satisfies the (user_id, grp)
    // clustering); (user_id, ts) is unique in the fixture so the
    // (s, e) window order is a total order. All integer µs arithmetic
    // — no float parity risk.
    "q180_interval_union" -> ((s, d) => {
      val us = col("ts_us")
      val iv = Tables.eventsUs(s, d)
        .select(col("user_id"), us.as("s"),
          (us + lit(1800000000L)).as("e"))
      val wPrev = Window.partitionBy(col("user_id"))
        .orderBy(col("s"), col("e"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val wRun = Window.partitionBy(col("user_id"))
        .orderBy(col("s"), col("e"))
        .rowsBetween(Window.unboundedPreceding, 0)
      iv.withColumn("brk",
          when(col("s") > coalesce(max(col("e")).over(wPrev), lit(-1L)), 1L)
            .otherwise(0L))
        .withColumn("grp", sum(col("brk")).over(wRun))
        .groupBy(col("user_id"), col("grp"))
        .agg(min(col("s")).as("gs"), max(col("e")).as("ge"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).cast("int").as("n_intervals"),
          sum(col("ge") - col("gs")).as("covered_us"),
          min(col("gs")).as("first_start_us"))
        .orderBy(col("user_id"))
    }),

    // q24's grouped top-k WITHOUT the window: Spark's internal
    // bounded-heap aggregate (CollectTopK, surfaced as
    // graft_collect_top_k) keeps 3 (price, -orderkey) structs per
    // customer in an O(k) heap with map-side PARTIAL merge — the
    // shuffle carries ≤k rows per group where q24's window shuffles
    // and SORTS every group member. Same result by construction
    // (sort_array over the heap's survivors recovers the rank
    // deterministically: price DESC, orderkey ASC via the negated
    // tiebreak); the oracle is q24's rn≤3 rule. At 100 TB this is THE
    // grouped-top-k shape — aggregate state bounded by k, never by
    // group size. TopKAggSpec pins the no-window plan and the
    // equivalence to q24's window form.
    "q213_grouped_topk_agg" -> ((s, d) => {
      import graft.functions.exprs.graft_collect_top_k
      Tables.orders(s, d)
        .groupBy(col("o_custkey"))
        .agg(graft_collect_top_k(
          struct(col("o_totalprice"), (-col("o_orderkey")).as("negk")),
          3, false).as("top"))
        .select(col("o_custkey"),
          posexplode(sort_array(col("top"), asc = false)))
        .select(col("o_custkey"), (-col("col.negk")).as("o_orderkey"),
          col("col.o_totalprice").as("o_totalprice"),
          (col("pos") + 1).cast("int").as("rn"))
        .orderBy(col("o_custkey"), col("rn"))
    }),

    // Irregular-interval EWMA smoothing: each event's smoothed value
    // is the exp-decay-weighted mean of the trailing 10 events, with
    // weight e^(-ln2·Δt/half-life) on the REAL µs gap — the time-series
    // smoother for event streams whose ticks aren't equally spaced
    // (where the classic α-recurrence is wrong). The trailing frame is
    // collected per row (10 structs) and folded by one aggregate HOF in
    // frame order — bounded state per row, user-keyed shuffle only, no
    // self-join. q179 is the corpus-level decay AGGREGATE; this is the
    // per-row decay SIGNAL. exp() cross-engine parity is q179's
    // precedent; 6dp rounding absorbs the ulp tail.
    "q206_ewma_trailing" -> ((s, d) => {
      val halfLifeUs = 3600000000.0 // 1 hour
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id")).rowsBetween(-9, 0)
      def decay(p: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        exp(lit(-0.693147180559945) * (col("ts_us") - p.getField("t"))
          / lit(halfLifeUs))
      Tables.eventsUs(s, d)
        .select(col("user_id"), col("ts_us"), col("event_id"), col("value"))
        .withColumn("pts",
          collect_list(struct(col("ts_us").as("t"), col("value").as("v")))
            .over(w))
        .select(col("user_id"), col("ts_us"), col("event_id"),
          round(
            aggregate(col("pts"), lit(0.0),
              (acc, p) => acc + p.getField("v") * decay(p)) /
            aggregate(col("pts"), lit(0.0), (acc, p) => acc + decay(p)),
            6).as("ewma"))
        .orderBy(col("user_id"), col("ts_us"), col("event_id"))
    }),

    // First-order Markov transition matrix over per-user event
    // sequences: P(next event type | current) — the session-model
    // statistic behind journey analysis and synthetic-session
    // generation. The heavy stage is the per-user LEAD (user-keyed
    // shuffle, skew-free); everything after operates on the
    // |types|²-row count table, so the normalizing window is bounded
    // by the type vocabulary, not the corpus.
    "q207_markov_transitions" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      val pairs = Tables.eventsUs(s, d)
        .select(col("user_id"), col("event_type"),
          lead(col("event_type"), 1).over(w).as("next_type"))
        .filter(col("next_type").isNotNull)
      val counts = pairs.groupBy(col("event_type"), col("next_type"))
        .agg(count(lit(1)).as("n"))
      val wt = Window.partitionBy(col("event_type"))
      counts
        .select(col("event_type"), col("next_type"), col("n"),
          round(col("n").cast("double") / sum(col("n")).over(wt), 6)
            .as("prob"))
        .orderBy(col("event_type"), col("next_type"))
    }),

    // SCD2 (slowly-changing-dimension type 2) history build: collapse
    // each user's event-type stream into validity intervals — a row
    // per state CHANGE carrying [valid_from, valid_to) and a current
    // flag — the standard warehouse history shape q126's CDC merge
    // feeds. Change detection is one LAG, interval closing one LEAD
    // over the change rows; both windows are user-keyed. valid_to for
    // the open interval is a fixed far-future sentinel (2100-01-01)
    // rather than NULL so the column stays integer-typed and
    // hash-comparable on both engines.
    "q210_scd2_history" -> ((s, d) => {
      val farUs = 4102444800000000L // 2100-01-01T00:00Z epoch µs
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      val changes = Tables.eventsUs(s, d).filter(col("user_id") < 40)
        .select(col("user_id"), col("ts_us"), col("event_id"),
          col("event_type"))
        .withColumn("prev_type", lag(col("event_type"), 1).over(w))
        .filter(col("prev_type").isNull ||
          col("prev_type") =!= col("event_type"))
      val w2 = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      changes
        .select(col("user_id"), col("event_type").as("state"),
          col("ts_us").as("valid_from_us"),
          coalesce(lead(col("ts_us"), 1).over(w2) - 1, lit(farUs))
            .as("valid_to_us"))
        .withColumn("is_current", col("valid_to_us") === farUs)
        .orderBy(col("user_id"), col("valid_from_us"))
    }),

    // MATCH_RECOGNIZE-lite: regex pattern matching over each user's
    // time-ordered event-type SEQUENCE (SQL:2016 row-pattern
    // recognition, which Spark lacks natively). Each event type maps
    // to one symbol; the per-user symbol string is assembled with
    // array_sort(collect_list(struct(ts,id,sym))) — the struct's
    // (ts_us, event_id) prefix makes the sort a deterministic event-
    // time order — then quantified patterns run as ordinary codegen'd
    // regexes: `v+c+p` (funnel with quantifiers: ≥1 view then ≥1
    // click then purchase, strictly adjacent), `e{2,}` (error
    // bursts), and the longest view-run via regexp_extract_all+
    // array_max. One user-keyed shuffle; per-user state is the
    // symbol string (one byte per event). At 100 TB the same operator
    // runs per (user, session_window) — q30's sessionizer bounds the
    // string length — the per-user form here keeps the oracle twin
    // exact. Both engines' regex dialects (Java util.regex / RE2)
    // agree on greedy non-overlapping scan for these constructs —
    // no backrefs or lazy quantifiers cross the engine boundary.
    "q227_event_pattern_match" -> ((s, d) => {
      val sym = when(col("event_type") === "view", "v")
        .when(col("event_type") === "click", "c")
        .when(col("event_type") === "purchase", "p")
        .when(col("event_type") === "signup", "s")
        .otherwise("e")
      Tables.eventsUs(s, d)
        .select(col("user_id"), col("ts_us"), col("event_id"),
          sym.as("sym"))
        .groupBy(col("user_id"))
        .agg(array_sort(collect_list(
          struct(col("ts_us"), col("event_id"), col("sym")))).as("evs"))
        .select(col("user_id"),
          array_join(expr("transform(evs, x -> x.sym)"), "").as("seq"))
        .select(col("user_id"),
          length(col("seq")).cast("int").as("n_events"),
          size(expr("regexp_extract_all(seq, 'v+c+p', 0)"))
            .cast("int").as("n_funnels"),
          size(expr("regexp_extract_all(seq, 'e{2,}', 0)"))
            .cast("int").as("n_error_bursts"),
          coalesce(
            expr("array_max(transform(regexp_extract_all(seq, 'v+', 0)," +
              " x -> length(x)))"), lit(0))
            .cast("int").as("max_view_run"))
        .orderBy(col("user_id"))
    }),

    // Last-touch attribution — the conversion-credit readout every
    // marketing/growth pipeline computes: each purchase credits the
    // most recent same-user view/click no older than 2h ("none" when
    // no touch qualifies). One user-keyed window over the interleaved
    // event stream — `last(touch IGNORE NULLS)` over the preceding-
    // rows frame IS the as-of lookup (q55's semantics without a second
    // relation, since touches and conversions share a stream); order
    // (ts_us, event_id) makes same-microsecond ties deterministic.
    // Linear per user partition; the credit rollup is a |channels|-row
    // aggregate with decimal-cast value sums (the money-parity rule).
    "q242_attribution" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val touched = Tables.eventsUs(s, d)
        .withColumn("touch", last(
          when(col("event_type").isin("view", "click"),
            struct(col("ts_us"), col("event_type"))),
          ignoreNulls = true).over(w))
      touched.filter(col("event_type") === "purchase")
        .withColumn("channel",
          when(col("touch").isNull ||
            col("ts_us") - col("touch.ts_us") > 7200000000L, "none")
            .otherwise(col("touch.event_type")))
        .groupBy(col("channel"))
        .agg(count(lit(1)).cast("int").as("n_purchases"),
          RelationalCore.dsum(col("value")).as("sum_value"))
        .orderBy(col("channel"))
    })
  )

  def oracle: Map[String, String] = Map(
    "q22_window_ranking" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn,
        |  CAST(RANK() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC) AS INT) AS rk,
        |  CAST(DENSE_RANK() OVER (PARTITION BY o_custkey
        |    ORDER BY o_totalprice DESC) AS INT) AS drk
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    "q23_window_analytic" ->
      """SELECT event_id, user_id,
        |  LAG(value, 1) OVER w AS prev_val,
        |  LEAD(event_id, 1) OVER w AS next_event,
        |  COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_cnt,
        |  CAST(SUM(CAST(value AS DECIMAL(20,4))) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_sum
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY event_id""".stripMargin,

    "q24_topk_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    // tsu = epoch_ns//1000 floors the oracle to the SAME µs grain the
    // engine computes on (Tables.eventsUs), so the >= break test, the
    // 30-min gap, and the (tsu, event_id) ordering agree even on a
    // true-ns fixture with nonzero sub-µs digits
    "q30_session_window_batch" ->
      s"""WITH flagged AS (
         |  SELECT user_id, epoch_ns(ts)//1000 AS tsu, event_id, value,
         |    CASE WHEN LAG(epoch_ns(ts)//1000, 1) OVER w IS NULL
         |           OR epoch_ns(ts)//1000 >=
         |              LAG(epoch_ns(ts)//1000, 1) OVER w + 1800000000
         |         THEN 1 ELSE 0 END AS is_new
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts)//1000,
         |    event_id)),
         |sessions AS (
         |  SELECT user_id, event_id, value,
         |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY tsu, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
         |  FROM flagged)
         |SELECT user_id, CAST(sess AS BIGINT) AS sess, COUNT(*) AS n_events,
         |  MIN(event_id) AS first_event, MAX(event_id) AS last_event,
         |  ${RelationalCore.dsumSql("value")} AS sum_value
         |FROM sessions GROUP BY user_id, sess ORDER BY user_id, sess""".stripMargin,

    // arg_max twin of max_by; range(h0,h1+1) twin of sequence(h0,h1);
    // LAST_VALUE IGNORE NULLS over the same cumulative frame
    "q138_gap_fill_resample" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_ns(ts) // 3600000000000 AS h, ts, value
        |  FROM events WHERE user_id < 20),
        |hourly AS (
        |  SELECT user_id, h, arg_max(value, ts) AS v,
        |    CAST(COUNT(*) AS INT) AS n_ev
        |  FROM ev GROUP BY 1, 2),
        |spans AS (SELECT user_id, MIN(h) AS h0, MAX(h) AS h1
        |          FROM hourly GROUP BY 1),
        |grid AS (SELECT user_id, unnest(range(h0, h1 + 1)) AS h FROM spans),
        |j AS (SELECT g.user_id, g.h, hourly.v, hourly.n_ev
        |      FROM grid g LEFT JOIN hourly
        |        ON g.user_id = hourly.user_id AND g.h = hourly.h)
        |SELECT user_id, CAST(h AS BIGINT) AS h,
        |  ROUND(LAST_VALUE(v IGNORE NULLS) OVER (PARTITION BY user_id
        |    ORDER BY h ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
        |    AS fill_value,
        |  COALESCE(n_ev, 0) AS n_ev, v IS NULL AS is_gap
        |FROM j ORDER BY user_id, h""".stripMargin,

    // q30's session CTEs; the dependent stage minima become join-backs
    // (DuckDB twin of the stacked same-partition window aggregates).
    // Like q30, tsn is FLOORED to µs (epoch_ns//1000) so gap test and
    // ordering match the engine's Tables.eventsUs grain exactly at any
    // fixture precision
    "q151_session_funnel" ->
      """WITH flagged AS (
        |  SELECT user_id, epoch_ns(ts)//1000 AS tsn, event_id, event_type,
        |    CASE WHEN LAG(epoch_ns(ts)//1000, 1) OVER w IS NULL
        |           OR epoch_ns(ts)//1000 >= LAG(epoch_ns(ts)//1000, 1) OVER w
        |              + 1800000000
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts)//1000,
        |    event_id)),
        |sessions AS (
        |  SELECT user_id, tsn, event_type,
        |    SUM(is_new) OVER (PARTITION BY user_id ORDER BY tsn, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        |  FROM flagged),
        |s1 AS (
        |  SELECT user_id, sess,
        |    MIN(CASE WHEN event_type = 'view' THEN tsn END) AS t_view
        |  FROM sessions GROUP BY 1, 2),
        |s2 AS (
        |  SELECT e.user_id, e.sess, t_view,
        |    MIN(CASE WHEN event_type = 'click' AND tsn >= t_view
        |        THEN tsn END) AS t_click
        |  FROM sessions e JOIN s1 USING (user_id, sess) GROUP BY 1, 2, 3),
        |s3 AS (
        |  SELECT e.user_id, e.sess, t_view, t_click,
        |    MIN(CASE WHEN event_type = 'purchase' AND tsn >= t_click
        |        THEN tsn END) AS t_purchase
        |  FROM sessions e JOIN s2 USING (user_id, sess)
        |  GROUP BY 1, 2, 3, 4),
        |agg AS (
        |  SELECT CAST(COUNT(*) AS INT) AS n_sessions,
        |    CAST(COUNT(t_view) AS INT) AS n_view,
        |    CAST(COUNT(t_click) AS INT) AS n_view_click,
        |    CAST(COUNT(t_purchase) AS INT) AS n_full_funnel
        |  FROM s3)
        |SELECT n_sessions, n_view, n_view_click, n_full_funnel,
        |  ROUND(CAST(n_view_click AS DOUBLE) / n_view, 6) AS click_rate,
        |  ROUND(CAST(n_full_funnel AS DOUBLE) / n_view_click, 6)
        |    AS purchase_rate
        |FROM agg""".stripMargin,

    "q152_cohort_retention" ->
      """WITH d AS (
        |  SELECT user_id, epoch_ns(ts) // 86400000000000 AS day
        |  FROM events),
        |cohorts AS (SELECT user_id, MIN(day) AS cohort_day
        |            FROM d GROUP BY 1),
        |active AS (SELECT DISTINCT user_id, day FROM d)
        |SELECT cohort_day, day - cohort_day AS day_offset,
        |  CAST(COUNT(DISTINCT user_id) AS INT) AS n_active
        |FROM active JOIN cohorts USING (user_id)
        |GROUP BY 1, 2 ORDER BY cohort_day, day_offset""".stripMargin,

    // same running-max-end break detector at the same µs precision
    "q180_interval_union" ->
      """WITH iv AS (
        |  SELECT user_id, epoch_ns(ts)//1000 AS s,
        |         epoch_ns(ts)//1000 + 1800000000 AS e
        |  FROM events),
        |m AS (
        |  SELECT user_id, s, e,
        |    CASE WHEN s > COALESCE(MAX(e) OVER (PARTITION BY user_id
        |        ORDER BY s, e ROWS BETWEEN UNBOUNDED PRECEDING
        |        AND 1 PRECEDING), -1) THEN 1 ELSE 0 END AS brk
        |  FROM iv),
        |g AS (
        |  SELECT user_id, s, e,
        |    SUM(brk) OVER (PARTITION BY user_id ORDER BY s, e
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
        |  FROM m),
        |merged AS (
        |  SELECT user_id, grp, MIN(s) AS gs, MAX(e) AS ge
        |  FROM g GROUP BY user_id, grp)
        |SELECT user_id, CAST(COUNT(*) AS INT) AS n_intervals,
        |  CAST(SUM(ge - gs) AS BIGINT) AS covered_us,
        |  CAST(MIN(gs) AS BIGINT) AS first_start_us
        |FROM merged GROUP BY user_id ORDER BY user_id""".stripMargin,

    // q24's ranking rule restated — the heap + sort_array path must
    // equal the window top-k exactly
    "q213_grouped_topk_agg" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
        |  FROM orders) t
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    // the same trailing-10 decayed mean: list() over the identical
    // frame preserves frame order, list_sum folds in list order, and
    // the decay expression is written with the identical double
    // literals so both engines run the same IEEE ops
    "q206_ewma_trailing" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_ns(ts)//1000 AS ts_us, event_id, value
        |  FROM events),
        |fr AS (
        |  SELECT user_id, ts_us, event_id,
        |    list(struct_pack(t := ts_us, v := value)) OVER (
        |      PARTITION BY user_id ORDER BY ts_us, event_id
        |      ROWS BETWEEN 9 PRECEDING AND CURRENT ROW) AS pts
        |  FROM ev)
        |SELECT user_id, ts_us, event_id,
        |  ROUND(
        |    list_sum(list_transform(pts, p -> p.v *
        |      exp(-0.693147180559945 * (ts_us - p.t) / 3600000000.0))) /
        |    list_sum(list_transform(pts, p ->
        |      exp(-0.693147180559945 * (ts_us - p.t) / 3600000000.0))),
        |    6) AS ewma
        |FROM fr ORDER BY user_id, ts_us, event_id""".stripMargin,

    "q207_markov_transitions" ->
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |    LEAD(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY epoch_ns(ts)//1000, event_id) AS next_type
        |  FROM events),
        |c AS (
        |  SELECT event_type, next_type, COUNT(*) AS n
        |  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2)
        |SELECT event_type, next_type, n,
        |  ROUND(CAST(n AS DOUBLE) /
        |    SUM(n) OVER (PARTITION BY event_type), 6) AS prob
        |FROM c ORDER BY event_type, next_type""".stripMargin,

    "q210_scd2_history" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_ns(ts)//1000 AS ts_us, event_id,
        |    event_type
        |  FROM events WHERE user_id < 40),
        |ch AS (
        |  SELECT user_id, ts_us, event_id, event_type,
        |    LAG(event_type, 1) OVER (PARTITION BY user_id
        |      ORDER BY ts_us, event_id) AS prev_type
        |  FROM ev),
        |changes AS (
        |  SELECT user_id, ts_us, event_id, event_type FROM ch
        |  WHERE prev_type IS NULL OR prev_type <> event_type)
        |SELECT user_id, event_type AS state, ts_us AS valid_from_us,
        |  COALESCE(LEAD(ts_us, 1) OVER (PARTITION BY user_id
        |    ORDER BY ts_us, event_id) - 1, 4102444800000000) AS valid_to_us,
        |  COALESCE(LEAD(ts_us, 1) OVER (PARTITION BY user_id
        |    ORDER BY ts_us, event_id) - 1, 4102444800000000)
        |    = 4102444800000000 AS is_current
        |FROM changes ORDER BY user_id, valid_from_us""".stripMargin,

    // q227: DuckDB assembles the same symbol string with an ordered
    // string_agg; RE2's greedy non-overlapping scan matches Java
    // regex for these quantifier-only patterns
    "q227_event_pattern_match" ->
      """WITH s AS (
        |  SELECT user_id,
        |    string_agg(CASE event_type WHEN 'view' THEN 'v'
        |      WHEN 'click' THEN 'c' WHEN 'purchase' THEN 'p'
        |      WHEN 'signup' THEN 's' ELSE 'e' END, ''
        |      ORDER BY epoch_ns(ts) // 1000, event_id) AS seq
        |  FROM events GROUP BY user_id)
        |SELECT user_id, CAST(length(seq) AS INT) AS n_events,
        |  CAST(len(regexp_extract_all(seq, 'v+c+p')) AS INT)
        |    AS n_funnels,
        |  CAST(len(regexp_extract_all(seq, 'e{2,}')) AS INT)
        |    AS n_error_bursts,
        |  CAST(COALESCE(list_max(list_transform(
        |    regexp_extract_all(seq, 'v+'), x -> length(x))), 0) AS INT)
        |    AS max_view_run
        |FROM s ORDER BY user_id""".stripMargin,

    // q242: same preceding-rows IGNORE NULLS window at the same µs
    // grain and (tsu, event_id) tie order; decimal-cast value sums
    "q242_attribution" -> s"""
        |WITH e AS (
        |  SELECT user_id, epoch_ns(ts)//1000 AS tsu, event_id,
        |    event_type, value
        |  FROM events),
        |t AS (
        |  SELECT user_id, tsu, event_id, event_type, value,
        |    LAST_VALUE(CASE WHEN event_type IN ('view','click')
        |        THEN struct_pack(tsu := tsu, et := event_type) END
        |      IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY tsu, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS touch
        |  FROM e),
        |p AS (
        |  SELECT CASE WHEN touch IS NULL OR tsu - touch.tsu > 7200000000
        |              THEN 'none' ELSE touch.et END AS channel, value
        |  FROM t WHERE event_type = 'purchase')
        |SELECT channel, CAST(COUNT(*) AS INT) AS n_purchases,
        |  ${RelationalCore.dsumSql("value")} AS sum_value
        |FROM p GROUP BY channel ORDER BY channel""".stripMargin
  )
}
