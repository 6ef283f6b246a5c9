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
        |FROM r WHERE i >= 1 ORDER BY t""".stripMargin
  )
}
