package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}

/** Statistical-analysis operators over the events stream: survival
  * analysis (Kaplan–Meier), time-series diagnostics, and resampling
  * inference. Each query's corpus-sized work is ONE aggregation whose
  * output is bounded by a calendar/domain constant (days, lags,
  * cohorts) — the q251 shape — so the sequential statistical
  * recursion that follows runs over a model-sized array, never a fat
  * window partition, and the DuckDB twin replays the identical
  * IEEE-double recursion (same association order, rounded once at the
  * output boundary).
  */
object StatsOps extends QueryModule {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Kaplan–Meier survival estimator (JASA 1958) — the
    // censoring-aware churn curve: per user, observation = days from
    // first to last event; users still active in the study's final
    // 2 days are right-CENSORED (their true lifetime exceeds what we
    // saw), everyone else churned at their last activity. S(t) is the
    // product-limit Π_{t_i ≤ t} (1 − d_i / n_i) over the distinct
    // duration days — naive "avg lifetime of churned users" both
    // underestimates (drops censored evidence) and biases (censored
    // users are the longest-lived); KM prices the at-risk set in.
    // Plan shape: the only corpus-sized pass is the per-user min/max
    // aggregation; durations then collapse to ≤ |study-days| rows (a
    // calendar constant whatever the event volume, q251's argument),
    // and the risk-set recursion n_{k+1} = n_k − d_k − c_k with the
    // running product runs as ONE ordered-array fold — no
    // partition-less window, no driver loop. The oracle replays the
    // identical left-to-right double recursion as a recursive CTE, so
    // s agrees bit-for-bit before the 6dp output rounding.
    "q255_kaplan_meier" -> ((s, d) => {
      val perUser = Tables.eventsUs(s, d)
        .groupBy(col("user_id"))
        .agg(min(col("ts_us")).as("fs"), max(col("ts_us")).as("ls"))
        .select(expr("(ls - fs) div 86400000000").as("dur"),
          expr("ls div 86400000000").as("last_day"))
      val g = perUser.crossJoin(broadcast(
          perUser.agg(max(col("last_day")).as("gmax"))))
        .select(col("dur"),
          (col("last_day") < col("gmax") - 2).as("observed"))
        .groupBy(col("dur"))
        .agg(sum(when(col("observed"), 1L).otherwise(0L)).as("d_cnt"),
          sum(when(col("observed"), 0L).otherwise(1L)).as("c_cnt"))
      g.agg(array_sort(collect_list(struct(col("dur"), col("d_cnt"),
          col("c_cnt")))).as("arr"))
        .withColumn("rows", expr(
          """aggregate(arr,
            |  named_struct(
            |    'n', cast(aggregate(arr, 0L,
            |           (a, x) -> a + x.d_cnt + x.c_cnt) as double),
            |    's', cast(1.0 as double),
            |    'out', cast(array() as
            |      array<struct<t:int,n_risk:int,d:int,c:int,surv:double>>)),
            |  (acc, x) -> named_struct(
            |    'n', acc.n - x.d_cnt - x.c_cnt,
            |    's', acc.s * (cast(1.0 as double)
            |                  - cast(x.d_cnt as double) / acc.n),
            |    'out', concat(acc.out, array(named_struct(
            |      't', cast(x.dur as int),
            |      'n_risk', cast(acc.n as int),
            |      'd', cast(x.d_cnt as int),
            |      'c', cast(x.c_cnt as int),
            |      'surv', acc.s * (cast(1.0 as double)
            |                       - cast(x.d_cnt as double) / acc.n))))),
            |  acc -> acc.out)""".stripMargin))
        .select(posexplode(col("rows")))
        .select(col("col.t").as("t"), col("col.n_risk").as("n_risk"),
          col("col.d").as("d"), col("col.c").as("c"),
          round(col("col.surv"), 6).as("surv"))
        .orderBy(col("t"))
    }),

    // Autocorrelation diagnostics + Ljung–Box portmanteau test (1978)
    // per event-type daily series — the seasonality/burstiness check a
    // pipeline runs before trusting q174/q251's i.i.d.-ish alarms.
    // ACF at lags 1..3 is computed from EXACT INTEGER sufficient
    // statistics: expanding Σ(x_t−m)(x_{t−k}−m) with m = S/n and
    // multiplying through by n² gives
    //   ρ_k = (n²A_k − nSB_k + (n−k)S²) / (n²Q − nS²)
    // with A_k = Σx_t·x_{t−k}, B_k = Σ(x_t+x_{t−k}), S = Σx, Q = Σx² —
    // every term an exact long (the fixture's magnitudes stay ≤ ~1e11;
    // a 100 TB deployment would widen to decimal128), so each ρ_k is
    // ONE double division of integers agreeing bit-for-bit across
    // engines, in ANY evaluation order. The lag products come from a
    // fold over the day-sorted array (≤ |study-days| entries — q251's
    // bounded-domain argument; day gaps would contract the lag index
    // identically on both engines since both fold the same sorted
    // array). Ljung–Box Q = n(n+2)Σρ_k²/(n−k) is assembled from the
    // 6dp-ROUNDED ρ_k in one shared association order, rounded 4dp
    // before the χ²₃(0.95) = 7.8147 rejection compare.
    "q257_autocorrelation" -> ((s, d) => {
      val daily = Tables.eventsUs(s, d)
        .select(col("event_type"), expr("ts_us div 86400000000").as("day"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("cnt"))
      val g = daily.groupBy(col("event_type"))
        .agg(array_sort(collect_list(struct(col("day"), col("cnt"))))
            .as("a"),
          count(lit(1)).as("n"), sum(col("cnt")).as("sx"),
          sum(col("cnt") * col("cnt")).as("qx"))
      def lagSums(df: DataFrame, k: Int) = df
        .withColumn(s"a$k", expr(
          s"""aggregate(sequence(${k + 1}, cast(n as int)), 0L,
             |  (acc, i) -> acc + element_at(a, i).cnt
             |              * element_at(a, i - $k).cnt)""".stripMargin))
        .withColumn(s"b$k", expr(
          s"""aggregate(sequence(${k + 1}, cast(n as int)), 0L,
             |  (acc, i) -> acc + element_at(a, i).cnt
             |              + element_at(a, i - $k).cnt)""".stripMargin))
      val withLags = lagSums(lagSums(lagSums(g, 1), 2), 3)
      def acf(k: Int) = round(
        (col("n") * col("n") * col(s"a$k") -
          col("n") * col("sx") * col(s"b$k") +
          (col("n") - k) * col("sx") * col("sx")).cast("double") /
        (col("n") * col("n") * col("qx") -
          col("n") * col("sx") * col("sx")).cast("double"), 6)
      val scored = withLags.select(col("event_type"),
        col("n").cast("int").as("n_days"), col("n"),
        acf(1).as("acf1"), acf(2).as("acf2"), acf(3).as("acf3"))
      val lb = round(col("n").cast("double") * (col("n") + 2) * (
        col("acf1") * col("acf1") / (col("n") - 1) +
        col("acf2") * col("acf2") / (col("n") - 2) +
        col("acf3") * col("acf3") / (col("n") - 3)), 4)
      scored.withColumn("ljung_box", lb)
        .select(col("event_type"), col("n_days"),
          col("acf1"), col("acf2"), col("acf3"), col("ljung_box"),
          (col("ljung_box") > 7.8147).as("white_noise_rejected"))
        .orderBy(col("event_type"))
    })
  )

  def oracle: Map[String, String] = Map(

    // q255: the identical risk-set recursion as a recursive CTE over
    // 1-based duration indices — same double division, same
    // subtract-then-multiply association, same final 6dp rounding
    "q255_kaplan_meier" ->
      """WITH RECURSIVE pu AS (
        |  SELECT user_id,
        |    (MAX(epoch_ns(ts)//1000) - MIN(epoch_ns(ts)//1000))
        |      // 86400000000 AS dur,
        |    MAX(epoch_ns(ts)//1000) // 86400000000 AS last_day
        |  FROM events GROUP BY user_id),
        |gm AS (SELECT MAX(last_day) AS gmax FROM pu),
        |g AS (
        |  SELECT dur,
        |    SUM(CASE WHEN last_day < gmax - 2 THEN 1 ELSE 0 END) AS d_cnt,
        |    SUM(CASE WHEN last_day < gmax - 2 THEN 0 ELSE 1 END) AS c_cnt
        |  FROM pu, gm GROUP BY dur),
        |idx AS (
        |  SELECT dur, d_cnt, c_cnt,
        |    ROW_NUMBER() OVER (ORDER BY dur) AS i
        |  FROM g),
        |tot AS (SELECT CAST(SUM(d_cnt + c_cnt) AS DOUBLE) AS n0,
        |               COUNT(*) AS ni FROM g),
        |r AS (
        |  SELECT 0 AS i, (SELECT n0 FROM tot) AS n,
        |    CAST(1.0 AS DOUBLE) AS s, CAST(NULL AS BIGINT) AS t,
        |    CAST(NULL AS INT) AS n_risk, CAST(NULL AS INT) AS d,
        |    CAST(NULL AS INT) AS c, CAST(NULL AS DOUBLE) AS surv
        |  UNION ALL
        |  SELECT r.i + 1, r.n - idx.d_cnt - idx.c_cnt,
        |    r.s * (CAST(1.0 AS DOUBLE) - CAST(idx.d_cnt AS DOUBLE) / r.n),
        |    idx.dur, CAST(r.n AS INT), CAST(idx.d_cnt AS INT),
        |    CAST(idx.c_cnt AS INT),
        |    r.s * (CAST(1.0 AS DOUBLE) - CAST(idx.d_cnt AS DOUBLE) / r.n)
        |  FROM r JOIN idx ON idx.i = r.i + 1)
        |SELECT CAST(t AS INT) AS t, n_risk, d, c, ROUND(surv, 6) AS surv
        |FROM r WHERE i >= 1 ORDER BY t""".stripMargin,

    // q257: identical integer sufficient statistics (lag products via
    // a ROW_NUMBER self-join instead of the array fold — same exact
    // longs either way), identical single-division ρ_k, identical
    // Ljung–Box association order over the 6dp-rounded ρ_k
    "q257_autocorrelation" ->
      """WITH dc AS (
        |  SELECT event_type, epoch_ns(ts)//1000 // 86400000000 AS day,
        |    COUNT(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |idx AS (
        |  SELECT event_type, cnt,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS i
        |  FROM dc),
        |st AS (
        |  SELECT event_type, COUNT(*) AS n, SUM(cnt) AS sx,
        |    SUM(cnt * cnt) AS qx
        |  FROM dc GROUP BY 1),
        |l1 AS (
        |  SELECT a.event_type, SUM(a.cnt * b.cnt) AS a1,
        |    SUM(a.cnt + b.cnt) AS b1
        |  FROM idx a JOIN idx b
        |    ON b.event_type = a.event_type AND b.i = a.i - 1
        |  GROUP BY 1),
        |l2 AS (
        |  SELECT a.event_type, SUM(a.cnt * b.cnt) AS a2,
        |    SUM(a.cnt + b.cnt) AS b2
        |  FROM idx a JOIN idx b
        |    ON b.event_type = a.event_type AND b.i = a.i - 2
        |  GROUP BY 1),
        |l3 AS (
        |  SELECT a.event_type, SUM(a.cnt * b.cnt) AS a3,
        |    SUM(a.cnt + b.cnt) AS b3
        |  FROM idx a JOIN idx b
        |    ON b.event_type = a.event_type AND b.i = a.i - 3
        |  GROUP BY 1),
        |r AS (
        |  SELECT st.event_type, st.n,
        |    ROUND(CAST(st.n*st.n*l1.a1 - st.n*st.sx*l1.b1
        |               + (st.n-1)*st.sx*st.sx AS DOUBLE)
        |      / CAST(st.n*st.n*st.qx - st.n*st.sx*st.sx AS DOUBLE), 6)
        |      AS acf1,
        |    ROUND(CAST(st.n*st.n*l2.a2 - st.n*st.sx*l2.b2
        |               + (st.n-2)*st.sx*st.sx AS DOUBLE)
        |      / CAST(st.n*st.n*st.qx - st.n*st.sx*st.sx AS DOUBLE), 6)
        |      AS acf2,
        |    ROUND(CAST(st.n*st.n*l3.a3 - st.n*st.sx*l3.b3
        |               + (st.n-3)*st.sx*st.sx AS DOUBLE)
        |      / CAST(st.n*st.n*st.qx - st.n*st.sx*st.sx AS DOUBLE), 6)
        |      AS acf3
        |  FROM st JOIN l1 USING (event_type) JOIN l2 USING (event_type)
        |    JOIN l3 USING (event_type)),
        |f AS (
        |  SELECT event_type, CAST(n AS INT) AS n_days,
        |    acf1, acf2, acf3,
        |    ROUND(CAST(n AS DOUBLE) * (n + 2) * (
        |      acf1*acf1/(n-1) + acf2*acf2/(n-2) + acf3*acf3/(n-3)), 4)
        |      AS ljung_box
        |  FROM r)
        |SELECT event_type, n_days, acf1, acf2, acf3, ljung_box,
        |  (ljung_box > 7.8147) AS white_noise_rejected
        |FROM f ORDER BY event_type""".stripMargin
  )
}
