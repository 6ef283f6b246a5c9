package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}

/** Statistical inference + experiment/sampling design operators: the
  * stratified-association, forecasting-backtest, cross-fitting,
  * sampling-allocation and shrinkage primitives a corpus pipeline
  * runs AFTER the per-slice statistics land — "is the effect real
  * once stratified", "how do I spend a labeling budget", "how do I
  * rate small sources without overreacting to noise".
  *
  * Arithmetic discipline (q276/q290's totalization rule): corpus
  * passes reduce to exact-integer grids bounded by strata/folds/
  * calendar; every per-cell transcendental or division is rounded
  * ONCE to a documented grain and the cross-cell folds run in DECIMAL
  * or exact integers, so no association order or float ulp can flip a
  * statistic, a ranking, or an allocation across engines.
  *
  * Reference scope: §2.E addendum surface; the reference's only
  * statistical reduction is the gradient mean (rbmreducer.java).
  */
object InferenceOps extends QueryModule {

  /** Weak dup label over whitespace tokens (q229's convention). */
  private def dupLab =
    when(array_contains(TextAnalysis.tokens(col("text")), "dup"), 1L)
      .otherwise(0L)

  private val dupLabSql =
    s"""CASE WHEN list_contains(${TextAnalysis.tokensSql}, 'dup')
       |  THEN 1 ELSE 0 END""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Cochran–Mantel–Haenszel stratified association test (Mantel &
    // Haenszel 1959) — does the alternating ingest batch (exposure =
    // (doc_id DIV 20) % 2, the within-source carve; doc_id PARITY is
    // confounded with source in this data model) shift the dup rate
    // once SOURCE is held fixed? The Simpson's-paradox-proof version
    // of q235's pooled test. One corpus pass to the |sources|×2×2
    // cell grid; T = Σa_k is exact, E/V/OR numerators are per-stratum
    // rationals of exact integers rounded ONCE to 6dp and totalized
    // in DECIMAL, χ² = (T−E)²/V is one double expression of those
    // settled values. Per-stratum rows ride along with the global
    // verdict (χ² vs the 3.841 95% critical value, decided on the
    // rounded statistic).
    "q296_cmh_test" -> ((s, d) => {
      val cells = Tables.documents(s, d)
        .select(col("source"),
          ((col("doc_id") / 20).cast("long") % 2).cast("int").as("e"),
          dupLab.as("y"))
        .groupBy(col("source"))
        .agg(
          sum(when(col("e") === 1 && col("y") === 1, 1L).otherwise(0L)).as("a"),
          sum(when(col("e") === 1 && col("y") === 0, 1L).otherwise(0L)).as("b"),
          sum(when(col("e") === 0 && col("y") === 1, 1L).otherwise(0L)).as("c"),
          sum(when(col("e") === 0 && col("y") === 0, 1L).otherwise(0L)).as("dd"))
        // strata-bounded after the one corpus pass; truncated so the
        // global fold and the per-stratum rows share it
        .localCheckpoint()
        .withColumn("n", col("a") + col("b") + col("c") + col("dd"))
        .withColumn("e6", expr(
          """CAST(ROUND(CAST((a + b) * (a + c) AS DOUBLE) / n, 6)
            |  AS DECIMAL(18,6))""".stripMargin))
        .withColumn("v6", expr(
          """CAST(ROUND(CAST((a + b) * (c + dd) AS DOUBLE) * (a + c) * (b + dd)
            |  / (CAST(n AS DOUBLE) * n * (n - 1)), 6) AS DECIMAL(18,6))""".stripMargin))
        .withColumn("rr6", expr(
          "CAST(ROUND(CAST(a * dd AS DOUBLE) / n, 6) AS DECIMAL(18,6))"))
        .withColumn("ss6", expr(
          "CAST(ROUND(CAST(b * c AS DOUBLE) / n, 6) AS DECIMAL(18,6))"))
      val g = cells.agg(
          sum(col("a")).as("t"), sum(col("e6")).as("se"),
          sum(col("v6")).as("sv"),
          sum(col("rr6")).as("sr"), sum(col("ss6")).as("ssum"))
        .select(
          round(pow(col("t") - col("se").cast("double"), 2) /
            col("sv").cast("double"), 6).as("cmh_chi2"),
          round(col("sr").cast("double") / col("ssum").cast("double"), 6)
            .as("or_mh"))
        .withColumn("significant_95", col("cmh_chi2") > 3.841459)
      cells
        .select(col("source"), col("a"), col("b"), col("c"),
          col("dd").as("d"), col("e6").cast("double").as("e_k"),
          col("v6").cast("double").as("v_k"))
        .crossJoin(broadcast(g))
        .orderBy(col("source"))
    }),

    // Holt double-exponential-smoothing backtest (Holt 1957) over the
    // per-type daily count grid — the TREND-aware sibling of q271's
    // seasonal-naive MASE and q206's level-only EWMA: one-step-ahead
    // forecasts ŷ_t = l_{t−1} + b_{t−1} with α=0.2, β=0.1, state
    // rounded to 6dp after EVERY update (the q288 fixed-point
    // discipline: rounded state is the value BOTH engines carry, so
    // the 30-step recurrence stays bit-identical without unbounded
    // decimal growth). Corpus-sized work is the one (type, day)
    // count aggregation — the recurrence is a linear array fold over
    // the calendar-bounded grid (the oracle replays it as a
    // recursive CTE); absolute errors are 6dp-rounded per step and
    // summed in DECIMAL.
    "q297_holt_backtest" -> ((s, d) => {
      val daily = Tables.eventsUs(s, d)
        .select(col("event_type"), expr("ts_us div 86400000000").as("day"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("cnt"))
      daily.groupBy(col("event_type"))
        .agg(array_sort(collect_list(struct(col("day"), col("cnt"))))
          .as("a"), count(lit(1)).as("n"))
        .filter(col("n") >= 3) // init needs y1,y2; backtest needs y3
        .withColumn("h", expr(
          """aggregate(sequence(3, cast(n as int)),
            |  named_struct(
            |    'l', cast(element_at(a, 2).cnt as double),
            |    'b', cast(element_at(a, 2).cnt - element_at(a, 1).cnt as double),
            |    'sae', cast(0 as decimal(18,6))),
            |  (acc, i) -> named_struct(
            |    'l', cast(round(0.2d * element_at(a, i).cnt
            |           + 0.8d * (acc.l + acc.b), 6) as double),
            |    'b', cast(round(0.1d * (cast(round(0.2d * element_at(a, i).cnt
            |             + 0.8d * (acc.l + acc.b), 6) as double) - acc.l)
            |           + 0.9d * acc.b, 6) as double),
            |    'sae', cast(acc.sae + cast(round(abs(element_at(a, i).cnt
            |             - (acc.l + acc.b)), 6) as decimal(18,6))
            |           as decimal(18,6))))""".stripMargin))
        .withColumn("san", expr(
          """aggregate(sequence(3, cast(n as int)), 0L,
            |  (acc, i) -> acc + abs(element_at(a, i).cnt
            |              - element_at(a, i - 1).cnt))""".stripMargin))
        .select(col("event_type"), col("n").cast("int").as("n_days"),
          col("h.sae").cast("double").as("sae_holt"),
          col("san").as("sae_naive"),
          round(col("h.sae").cast("double") / col("san"), 6).as("mae_ratio"),
          (round(col("h.sae").cast("double") / col("san"), 6) < 1.0)
            .as("holt_helps"),
          col("h.l").as("level_end"), col("h.b").as("trend_end"))
        .orderBy(col("event_type"))
    }),

    // K-fold CROSS-FITTING audit (the out-of-fold estimation pattern
    // under every honest model evaluation, cf. Chernozhukov et al.
    // 2018's cross-fitted nuisance estimates): users hash into 5
    // folds (md5 — the engine's portable hash, so fold membership is
    // leakage-free BY CONSTRUCTION: a user's events share a fold),
    // each fold is scored by the conversion rate fitted on the OTHER
    // four (exact integer complement algebra: (P−p_f)/(N−n_f)), and
    // the fold's Brier score of that out-of-fold constant predictor
    // is pure arithmetic on exact counts. ONE corpus-sized pass (the
    // per-fold count aggregation); the 5-row grid does the rest;
    // global cross-fitted Brier totalizes n_f·brier_f in DECIMAL.
    "q298_cv_folds" -> ((s, d) => {
      val folds = Tables.events(s, d)
        .select(pmod(TextAnalysis.md5Int(
          concat(lit("cv:"), col("user_id").cast("string"))), lit(5L))
          .cast("int").as("fold"),
          col("user_id"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
        .groupBy(col("fold"))
        .agg(count(lit(1)).as("n_f"), sum(col("y")).as("p_f"),
          count_distinct(col("user_id")).as("users_f"))
        .localCheckpoint() // 5-row fold grid; one corpus pass total
      val tot = folds.agg(sum(col("n_f")).as("nn"), sum(col("p_f")).as("pp"))
      val scored = folds.crossJoin(broadcast(tot))
        .withColumn("oof_rate", expr(
          """CAST(ROUND(CAST(pp - p_f AS DOUBLE) / (nn - n_f), 6)
            |  AS DECIMAL(12,6))""".stripMargin))
        // Brier of the constant OOF predictor r on (n_f, p_f):
        // r² − 2r·p_f/n_f + p_f/n_f, one double expression of the
        // settled 6dp r and exact counts, rounded once
        .withColumn("brier6", expr(
          """CAST(ROUND(CAST(oof_rate AS DOUBLE) * CAST(oof_rate AS DOUBLE)
            |  - 2 * CAST(oof_rate AS DOUBLE) * p_f / n_f
            |  + CAST(p_f AS DOUBLE) / n_f, 6) AS DECIMAL(18,6))""".stripMargin))
      val g = scored.agg(
        round(sum(col("brier6") * col("n_f")).cast("double") /
          sum(col("n_f")).cast("double"), 6).as("cv_brier"))
      scored
        .select(col("fold"), col("n_f"), col("users_f"), col("p_f"),
          round(col("p_f").cast("double") / col("n_f"), 6).as("fold_rate"),
          col("oof_rate").cast("double").as("oof_rate"),
          col("brier6").cast("double").as("brier"))
        .crossJoin(broadcast(g))
        .orderBy(col("fold"))
    }),

    // Neyman-optimal stratified sampling allocation (Neyman 1934) —
    // how a 1000-doc labeling/audit budget SHOULD spread over sources:
    // n_h ∝ N_h·σ_h beats proportional n_h ∝ N_h whenever strata
    // variances differ. Per-source (N_h, Σy, Σy²) of doc length is
    // the one corpus pass (exact integers, map-side combinable);
    // σ_h = round6(sqrt(sample var)) is one correctly-rounded-by-
    // IEEE sqrt per stratum; the integer micro weights N_h·σ6·10⁶
    // then drive LARGEST-REMAINDER (Hamilton) apportionment — floor
    // quotas via integer DIV, leftovers to the largest exact-integer
    // remainders (source asc ties) — so both allocations sum to the
    // budget exactly and no float can reorder the apportionment.
    // Reported estimator variances (×N², per-mean scale) compare the
    // two designs: Var_ney = (ΣN_hσ_h)²/n, Var_prop = N·ΣN_hσ_h²/n.
    "q299_neyman_allocation" -> ((s, d) => {
      val budget = 1000L
      // |sources|-bounded after the one corpus pass; truncated so the
      // two apportionments, the variance scalar and the final select
      // never re-aggregate the corpus
      val strata = Tables.documents(s, d)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("nh"), sum(col("n_chars")).as("sy"),
          sum(col("n_chars") * col("n_chars")).as("syy"))
        .withColumn("sigma6", expr(
          """CAST(ROUND(SQRT((nh * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy)
            |  / (CAST(nh AS DOUBLE) * (nh - 1))), 6) AS DECIMAL(18,6))""".stripMargin))
        // operand types pinned so no decimal product can exceed
        // precision 38 (Spark would silently round to fit — the
        // DuckDB twin auto-widens and would drift in the low digits)
        .withColumn("wn", expr(
          "CAST(CAST(nh AS DECIMAL(12,0)) * sigma6 * 1000000 AS BIGINT)"))
        .withColumn("wp", col("nh")) // proportional weight
        .localCheckpoint()
      // Hamilton apportionment entirely inside array expressions on
      // the one bounded row (struct sort is lexicographic: negated
      // remainder asc = remainder desc, then source asc) — no window,
      // no second shuffle
      def apportion(w: String, alias: String) = strata
        .agg(collect_list(struct(col("source"), col(w).as("w"))).as("sw"),
          sum(col(w)).as("tw"))
        .withColumn("srt", expr(
          s"""array_sort(transform(sw, x -> named_struct(
             |  'negrem', -(($budget * x.w) % tw),
             |  'source', x.source,
             |  'base', ($budget * x.w) DIV tw)))""".stripMargin))
        .withColumn("basesum", expr("aggregate(srt, 0L, (a, x) -> a + x.base)"))
        .select(explode(expr(
          s"""transform(sequence(1, size(srt)), i -> named_struct(
             |  'source', element_at(srt, i).source,
             |  'alloc', element_at(srt, i).base +
             |    if(i <= $budget - basesum, 1L, 0L)))""".stripMargin)).as("r"))
        .select(col("r.source").as("source"), col("r.alloc").as(alias))
      val ney = apportion("wn", "alloc_neyman")
      val prop = apportion("wp", "alloc_prop")
      val vars = strata.agg(
        round(pow(sum(expr("CAST(nh AS DECIMAL(12,0)) * sigma6"))
          .cast("double"), 2) / budget, 6).as("var_neyman"),
        round(sum(col("nh")).cast("double") *
          sum(expr(
            "CAST(nh AS DECIMAL(10,0)) * CAST(sigma6 * sigma6 AS DECIMAL(26,12))"))
            .cast("double") / budget, 6).as("var_prop"))
      strata.select(col("source"), col("nh"),
          col("sigma6").cast("double").as("sigma"))
        .join(ney, "source").join(prop, "source")
        .crossJoin(broadcast(vars))
        .orderBy(col("source"))
    }),

    // Two-sample Cramér–von Mises test (Anderson 1962) on the doc-
    // length distribution across the within-source ingest-batch carve
    // — the whole-distribution sibling of q165's KS (CvM integrates
    // the squared ECDF gap instead of taking its sup, so it sees
    // spread-out drift KS dilutes). The statistic is EXACT INTEGER
    // end-to-end: with doubled midranks (ties are real in integer
    // lengths) R2 − I2 is an even integer, so U4 = n·Σcx(R2−I2x)² +
    // m·Σcy(R2−I2y)² is exact (≲10¹⁶ at sf0.1, BIGINT-safe), and
    // T = U4/(4nmN) − (4nm−1)/(6N) divides once, rounded 6dp. One
    // corpus pass to the distinct-length grid (value-bounded, never
    // corpus-bounded), one linear array fold for the cumulative
    // midranks.
    "q302_cvm_test" -> ((s, d) => {
      val g = Tables.documents(s, d)
        .select(col("n_chars"),
          ((col("doc_id") / 20).cast("long") % 2).cast("int").as("e"))
        .groupBy(col("n_chars"))
        .agg(sum(when(col("e") === 0, 1L).otherwise(0L)).as("cx"),
          sum(when(col("e") === 1, 1L).otherwise(0L)).as("cy"))
      g.agg(sort_array(collect_list(
            struct(col("n_chars"), col("cx"), col("cy")))).as("a"),
          sum(col("cx")).as("n"), sum(col("cy")).as("m"))
        .withColumn("u4", expr(
          """aggregate(a,
            |  named_struct('ax', 0L, 'ay', 0L, 'sx', 0L, 'sy', 0L),
            |  (acc, v) -> named_struct(
            |    'ax', acc.ax + v.cx, 'ay', acc.ay + v.cy,
            |    'sx', acc.sx + v.cx *
            |      (2 * (acc.ax + acc.ay) + v.cx + v.cy + 1
            |       - (2 * acc.ax + v.cx + 1))
            |      * (2 * (acc.ax + acc.ay) + v.cx + v.cy + 1
            |       - (2 * acc.ax + v.cx + 1)),
            |    'sy', acc.sy + v.cy *
            |      (2 * (acc.ax + acc.ay) + v.cx + v.cy + 1
            |       - (2 * acc.ay + v.cy + 1))
            |      * (2 * (acc.ax + acc.ay) + v.cx + v.cy + 1
            |       - (2 * acc.ay + v.cy + 1))),
            |  acc -> n * acc.sx + m * acc.sy)""".stripMargin))
        .select(col("n"), col("m"), col("u4"),
          round(col("u4").cast("double") /
              (lit(4.0) * col("n") * col("m") * (col("n") + col("m"))) -
            (lit(4.0) * col("n") * col("m") - 1) /
              (lit(6.0) * (col("n") + col("m"))), 6).as("t"))
        .withColumn("reject_10pct", col("t") > 0.347)
        .withColumn("reject_5pct", col("t") > 0.461)
    }),

    // Split-conformal prediction audit (Vovk et al. 2005; Lei et al.
    // 2018) — distribution-free uncertainty for the per-lang length
    // predictor: docs md5-split into fit/calibration/test (hash
    // carves, q298's leakage argument), the fit carve fits ŷ(lang) =
    // mean length (rounded once to 6dp so every residual |y − ŷ| is
    // an exact decimal), the calibration carve takes the
    // ⌈(n_cal+1)(1−α)⌉-th smallest residual as q̂ by EXACT rank
    // selection over the value-bounded residual grid (q247's
    // two-phase argument: grid rows, never corpus rows), and the
    // test carve's coverage |y − ŷ| ≤ q̂ is an exact-decimal compare
    // — the marginal-coverage guarantee ≥ 90% is then auditable.
    "q304_conformal" -> ((s, d) => {
      val base = Tables.documents(s, d)
        .select(col("doc_id"), col("lang"), col("n_chars"),
          pmod(TextAnalysis.md5Int(
            concat(lit("cf:"), col("doc_id").cast("string"))), lit(4L))
            .cast("int").as("h"))
      val fit = base.filter(col("h") <= 1)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_fit"),
          expr("CAST(ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 6) AS DECIMAL(14,6))")
            .as("yhat"))
        .localCheckpoint() // |langs|-bounded model
      val resid = base.filter(col("h") === 2).join(broadcast(fit), "lang")
        .select(expr("CAST(ABS(CAST(n_chars AS DECIMAL(14,6)) - yhat) AS DECIMAL(14,6))")
          .as("r"))
        .groupBy(col("r")).agg(count(lit(1)).as("c"))
      // exact ⌈(n+1)·0.9⌉-th smallest over the residual-value grid
      val qhat = resid
        .agg(sort_array(collect_list(struct(col("r"), col("c")))).as("a"),
          sum(col("c")).as("ncal"))
        .withColumn("k", expr("CAST(ceil((ncal + 1) * 0.9) AS BIGINT)"))
        .withColumn("qhat", expr(
          """aggregate(a, named_struct('cum', 0L, 'q', CAST(NULL AS DECIMAL(14,6))),
            |  (acc, x) -> named_struct(
            |    'cum', acc.cum + x.c,
            |    'q', CASE WHEN acc.q IS NULL AND acc.cum + x.c >= k
            |      THEN x.r ELSE acc.q END),
            |  acc -> acc.q)""".stripMargin))
        .select(col("ncal"), col("k"), col("qhat"))
      val cover = base.filter(col("h") === 3).join(broadcast(fit), "lang")
        .crossJoin(broadcast(qhat))
        .agg(count(lit(1)).as("n_test"),
          sum(when(expr("ABS(CAST(n_chars AS DECIMAL(14,6)) - yhat) <= qhat"),
            1L).otherwise(0L)).as("n_covered"),
          first(col("ncal")).as("n_cal"),
          first(col("qhat")).as("qh"))
      fit.select(col("lang"), col("n_fit"),
          col("yhat").cast("double").as("yhat"))
        .crossJoin(broadcast(cover.select(col("n_cal"), col("n_test"),
          col("n_covered"),
          col("qh").cast("double").as("qhat"),
          round(col("n_covered").cast("double") / col("n_test"), 6)
            .as("coverage"))))
        .orderBy(col("lang"))
    }),

    // Sequential probability ratio test (Wald 1945) on the purchase
    // share, replayed over the daily ledger — the ALWAYS-VALID
    // monitoring twin of q235's fixed-horizon z-test (peeking at a
    // z-test inflates false positives; the SPRT's boundaries are
    // crossing-safe by construction). H₀ p=0.18 vs H₁ p=0.22,
    // α=β=0.05. The two log-likelihood-ratio increments and the two
    // Wald boundaries are each ONE transcendental rounded ONCE to
    // micro-units; the per-day ledger x_d·la + (n_d−x_d)·lb and its
    // cumulative fold are then EXACT INTEGER arithmetic, so the
    // first-crossing day is float-proof. One corpus pass to the
    // ≤|calendar| day grid; the scan is a linear array fold.
    "q305_sprt" -> ((s, d) => {
      val la = "CAST(ROUND(1000000 * LN(0.22 / 0.18), 0) AS BIGINT)"
      val lb = "CAST(ROUND(1000000 * LN(0.78 / 0.82), 0) AS BIGINT)"
      val ua = "CAST(ROUND(1000000 * LN(0.95 / 0.05), 0) AS BIGINT)"
      val daily = Tables.eventsUs(s, d)
        .select(expr("ts_us div 86400000000").as("day"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
        .groupBy(col("day"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("x"))
      daily
        .agg(sort_array(collect_list(struct(col("day"), col("n"), col("x"))))
          .as("a"))
        .select(posexplode(expr(
          s"""aggregate(a,
             |  named_struct('cum', 0L, 'dday', CAST(NULL AS BIGINT),
             |    'dec', CAST(NULL AS STRING),
             |    'rows', cast(array() as array<struct<
             |      day:bigint,n:bigint,x:bigint,cum:bigint,state:string>>)),
             |  (acc, v) -> named_struct(
             |    'cum', acc.cum + v.x * $la + (v.n - v.x) * $lb,
             |    'dday', CASE WHEN acc.dday IS NOT NULL THEN acc.dday
             |      WHEN acc.cum + v.x * $la + (v.n - v.x) * $lb >= $ua
             |        OR acc.cum + v.x * $la + (v.n - v.x) * $lb <= -$ua
             |      THEN v.day ELSE CAST(NULL AS BIGINT) END,
             |    'dec', CASE WHEN acc.dec IS NOT NULL THEN acc.dec
             |      WHEN acc.cum + v.x * $la + (v.n - v.x) * $lb >= $ua
             |      THEN 'accept_h1'
             |      WHEN acc.cum + v.x * $la + (v.n - v.x) * $lb <= -$ua
             |      THEN 'accept_h0' ELSE CAST(NULL AS STRING) END,
             |    'rows', concat(acc.rows, array(named_struct(
             |      'day', v.day, 'n', v.n, 'x', v.x,
             |      'cum', acc.cum + v.x * $la + (v.n - v.x) * $lb,
             |      'state', CASE
             |        WHEN acc.dec IS NOT NULL THEN 'decided'
             |        WHEN acc.cum + v.x * $la + (v.n - v.x) * $lb >= $ua
             |        THEN 'accept_h1'
             |        WHEN acc.cum + v.x * $la + (v.n - v.x) * $lb <= -$ua
             |        THEN 'accept_h0' ELSE 'continue' END)))),
             |  acc -> acc.rows)""".stripMargin)).as(Seq("pos", "r")))
        .select(col("r.day").as("day"), col("r.n").as("n"),
          col("r.x").as("x"),
          round(col("r.cum").cast("double") / 1e6, 6).as("cum_llr"),
          col("r.state").as("state"))
        .orderBy(col("day"))
    }),

    // Empirical-Bayes beta-binomial shrinkage of per-source dup rates
    // (Robbins 1956; the Morris 1983 small-area posture): a 25-doc
    // source's raw rate overreacts to one bad draw — shrink toward
    // the cross-source prior with method-of-moments strength. The
    // corpus pass is the per-source (n_h, x_h) count; everything else
    // is |sources|-bounded: per-source rates round ONCE to 6dp, the
    // prior mean/variance fold those settled decimals in DECIMAL
    // (order-free), MoM strength M = m(1−m)/v − 1 (clamped ≥ 0) and
    // α = mM, β = (1−m)M are single double expressions rounded 6dp,
    // and each posterior mean (x+α)/(n+M) divides once.
    "q300_eb_shrinkage" -> ((s, d) => {
      val src = Tables.documents(s, d)
        .select(col("source"), dupLab.as("y"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("nh"), sum(col("y")).as("xh"))
        .localCheckpoint() // |sources|-bounded; one corpus pass total
        .withColumn("p6", expr(
          "CAST(ROUND(CAST(xh AS DOUBLE) / nh, 6) AS DECIMAL(12,6))"))
      val prior = src
        .agg(sum(col("p6")).as("sp"),
          sum(col("p6") * col("p6")).as("spp"),
          count(lit(1)).as("h"))
        .select(
          expr("CAST(ROUND(CAST(sp AS DOUBLE) / h, 6) AS DECIMAL(12,6))")
            .as("m6"),
          col("sp"), col("spp"), col("h"))
        .select(col("m6"),
          // sample variance of the settled p6 via the settled m6:
          // Σp² − 2mΣp + Hm² over H−1, exact decimals divided once
          expr("""CAST(ROUND(CAST(spp - 2 * m6 * sp + h * m6 * m6 AS DOUBLE)
            |  / (h - 1), 6) AS DECIMAL(12,6))""".stripMargin).as("v6"))
        .select(col("m6"), col("v6"),
          expr("""CAST(ROUND(GREATEST(CAST(m6 AS DOUBLE) * (1 - m6) / v6 - 1,
            |  0.0), 6) AS DECIMAL(18,6))""".stripMargin).as("mm"))
      src.crossJoin(broadcast(prior))
        .select(col("source"), col("nh"), col("xh"),
          col("p6").cast("double").as("raw_rate"),
          col("m6").cast("double").as("prior_mean"),
          col("v6").cast("double").as("prior_var"),
          col("mm").cast("double").as("prior_strength"),
          expr("""ROUND((CAST(xh AS DOUBLE) + m6 * mm) / (nh + mm), 6)""")
            .as("shrunk_rate"))
        .orderBy(col("source"))
    })
  )

  def oracle: Map[String, String] = Map(

    "q296_cmh_test" ->
      s"""WITH cells AS (
         |  SELECT source,
         |    SUM(CASE WHEN e = 1 AND y = 1 THEN 1 ELSE 0 END) AS a,
         |    SUM(CASE WHEN e = 1 AND y = 0 THEN 1 ELSE 0 END) AS b,
         |    SUM(CASE WHEN e = 0 AND y = 1 THEN 1 ELSE 0 END) AS c,
         |    SUM(CASE WHEN e = 0 AND y = 0 THEN 1 ELSE 0 END) AS dd
         |  FROM (SELECT source,
         |          CAST((doc_id // 20) % 2 AS INT) AS e,
         |          $dupLabSql AS y
         |        FROM documents) z
         |  GROUP BY 1),
         |k AS (
         |  SELECT source, a, b, c, dd, a + b + c + dd AS n,
         |    CAST(ROUND(CAST((a + b) * (a + c) AS DOUBLE) / (a + b + c + dd),
         |      6) AS DECIMAL(18,6)) AS e6,
         |    CAST(ROUND(CAST((a + b) * (c + dd) AS DOUBLE) * (a + c) * (b + dd)
         |      / (CAST(a + b + c + dd AS DOUBLE) * (a + b + c + dd)
         |         * (a + b + c + dd - 1)), 6) AS DECIMAL(18,6)) AS v6,
         |    CAST(ROUND(CAST(a * dd AS DOUBLE) / (a + b + c + dd), 6)
         |      AS DECIMAL(18,6)) AS rr6,
         |    CAST(ROUND(CAST(b * c AS DOUBLE) / (a + b + c + dd), 6)
         |      AS DECIMAL(18,6)) AS ss6
         |  FROM cells),
         |g AS (
         |  SELECT
         |    ROUND(POW(SUM(a) - CAST(SUM(e6) AS DOUBLE), 2)
         |      / CAST(SUM(v6) AS DOUBLE), 6) AS cmh_chi2,
         |    ROUND(CAST(SUM(rr6) AS DOUBLE) / CAST(SUM(ss6) AS DOUBLE), 6)
         |      AS or_mh
         |  FROM k)
         |SELECT k.source, CAST(k.a AS BIGINT) AS a, CAST(k.b AS BIGINT) AS b,
         |  CAST(k.c AS BIGINT) AS c, CAST(k.dd AS BIGINT) AS d,
         |  CAST(k.e6 AS DOUBLE) AS e_k, CAST(k.v6 AS DOUBLE) AS v_k,
         |  g.cmh_chi2, g.or_mh, g.cmh_chi2 > 3.841459 AS significant_95
         |FROM k, g ORDER BY k.source""".stripMargin,

    "q297_holt_backtest" ->
      s"""WITH RECURSIVE daily AS (
         |  SELECT event_type, epoch_ns(ts)//1000 // 86400000000 AS day,
         |    COUNT(*) AS cnt
         |  FROM events GROUP BY 1, 2),
         |idx AS (
         |  SELECT event_type, cnt,
         |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS i
         |  FROM daily),
         |nd AS (SELECT event_type, COUNT(*) AS n FROM idx GROUP BY 1
         |       HAVING COUNT(*) >= 3),
         |rec AS (
         |  SELECT i2.event_type, 2 AS i,
         |    CAST(i2.cnt AS DOUBLE) AS l,
         |    CAST(i2.cnt - i1.cnt AS DOUBLE) AS b,
         |    CAST(0 AS DECIMAL(18,6)) AS sae
         |  FROM idx i1
         |  JOIN idx i2 ON i2.event_type = i1.event_type AND i2.i = 2
         |  JOIN nd ON nd.event_type = i1.event_type
         |  WHERE i1.i = 1
         |  UNION ALL
         |  SELECT r.event_type, r.i + 1,
         |    CAST(ROUND(0.2 * x.cnt + 0.8 * (r.l + r.b), 6) AS DOUBLE),
         |    CAST(ROUND(0.1 * (CAST(ROUND(0.2 * x.cnt + 0.8 * (r.l + r.b), 6)
         |        AS DOUBLE) - r.l) + 0.9 * r.b, 6) AS DOUBLE),
         |    CAST(r.sae + CAST(ROUND(ABS(x.cnt - (r.l + r.b)), 6)
         |      AS DECIMAL(18,6)) AS DECIMAL(18,6))
         |  FROM rec r
         |  JOIN idx x ON x.event_type = r.event_type AND x.i = r.i + 1),
         |fin AS (
         |  SELECT r.event_type, r.l, r.b, r.sae
         |  FROM rec r JOIN nd ON nd.event_type = r.event_type
         |  WHERE r.i = nd.n),
         |naive AS (
         |  SELECT a.event_type, SUM(ABS(a.cnt - b.cnt)) AS san
         |  FROM idx a JOIN idx b
         |    ON b.event_type = a.event_type AND b.i = a.i - 1
         |  WHERE a.i >= 3 GROUP BY 1)
         |SELECT f.event_type, CAST(nd.n AS INT) AS n_days,
         |  CAST(f.sae AS DOUBLE) AS sae_holt,
         |  CAST(nv.san AS BIGINT) AS sae_naive,
         |  ROUND(CAST(f.sae AS DOUBLE) / nv.san, 6) AS mae_ratio,
         |  ROUND(CAST(f.sae AS DOUBLE) / nv.san, 6) < 1.0 AS holt_helps,
         |  f.l AS level_end, f.b AS trend_end
         |FROM fin f
         |JOIN nd ON nd.event_type = f.event_type
         |JOIN naive nv ON nv.event_type = f.event_type
         |ORDER BY f.event_type""".stripMargin,

    "q298_cv_folds" ->
      s"""WITH folds AS (
         |  SELECT ${TextAnalysis.md5IntSql("'cv:' || CAST(user_id AS VARCHAR)")}
         |      % 5 AS fold,
         |    COUNT(*) AS n_f,
         |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS p_f,
         |    COUNT(DISTINCT user_id) AS users_f
         |  FROM events GROUP BY 1),
         |tot AS (SELECT SUM(n_f) AS nn, SUM(p_f) AS pp FROM folds),
         |sc AS (
         |  SELECT fold, n_f, p_f, users_f,
         |    CAST(ROUND(CAST(pp - p_f AS DOUBLE) / (nn - n_f), 6)
         |      AS DECIMAL(12,6)) AS oof_rate
         |  FROM folds, tot),
         |sc2 AS (
         |  SELECT fold, n_f, p_f, users_f, oof_rate,
         |    CAST(ROUND(CAST(oof_rate AS DOUBLE) * CAST(oof_rate AS DOUBLE)
         |      - 2 * CAST(oof_rate AS DOUBLE) * p_f / n_f
         |      + CAST(p_f AS DOUBLE) / n_f, 6) AS DECIMAL(18,6)) AS brier6
         |  FROM sc),
         |g AS (
         |  SELECT ROUND(CAST(SUM(brier6 * n_f) AS DOUBLE)
         |    / CAST(SUM(n_f) AS DOUBLE), 6) AS cv_brier FROM sc2)
         |SELECT CAST(fold AS INT) AS fold, CAST(n_f AS BIGINT) AS n_f,
         |  CAST(users_f AS BIGINT) AS users_f, CAST(p_f AS BIGINT) AS p_f,
         |  ROUND(CAST(p_f AS DOUBLE) / n_f, 6) AS fold_rate,
         |  CAST(oof_rate AS DOUBLE) AS oof_rate,
         |  CAST(brier6 AS DOUBLE) AS brier, g.cv_brier
         |FROM sc2, g ORDER BY fold""".stripMargin,

    "q299_neyman_allocation" ->
      s"""WITH strata AS (
         |  SELECT source, COUNT(*) AS nh, SUM(n_chars) AS sy,
         |    SUM(n_chars * n_chars) AS syy
         |  FROM documents GROUP BY 1),
         |s2 AS (
         |  SELECT source, nh,
         |    CAST(ROUND(SQRT((nh * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy)
         |      / (CAST(nh AS DOUBLE) * (nh - 1))), 6) AS DECIMAL(18,6))
         |      AS sigma6
         |  FROM strata),
         |w AS (
         |  SELECT source, nh, sigma6,
         |    CAST(nh * sigma6 * 1000000 AS BIGINT) AS wn,
         |    CAST(nh AS BIGINT) AS wp
         |  FROM s2),
         |tw AS (SELECT SUM(wn) AS twn, SUM(wp) AS twp FROM w),
         |alloc AS (
         |  SELECT w.source,
         |    (1000 * w.wn) // tw.twn AS base_n, (1000 * w.wn) % tw.twn AS rem_n,
         |    (1000 * w.wp) // tw.twp AS base_p, (1000 * w.wp) % tw.twp AS rem_p
         |  FROM w, tw),
         |rk AS (
         |  SELECT source, base_n, base_p,
         |    ROW_NUMBER() OVER (ORDER BY rem_n DESC, source ASC) AS rn_n,
         |    ROW_NUMBER() OVER (ORDER BY rem_p DESC, source ASC) AS rn_p,
         |    SUM(base_n) OVER () AS sb_n, SUM(base_p) OVER () AS sb_p
         |  FROM alloc),
         |fin AS (
         |  SELECT source,
         |    base_n + CASE WHEN rn_n <= 1000 - sb_n THEN 1 ELSE 0 END
         |      AS alloc_neyman,
         |    base_p + CASE WHEN rn_p <= 1000 - sb_p THEN 1 ELSE 0 END
         |      AS alloc_prop
         |  FROM rk),
         |vars AS (
         |  SELECT
         |    ROUND(POW(CAST(SUM(nh * sigma6) AS DOUBLE), 2) / 1000, 6)
         |      AS var_neyman,
         |    ROUND(CAST(SUM(nh) AS DOUBLE)
         |      * CAST(SUM(nh * sigma6 * sigma6) AS DOUBLE) / 1000, 6)
         |      AS var_prop
         |  FROM w)
         |SELECT w.source, CAST(w.nh AS BIGINT) AS nh,
         |  CAST(w.sigma6 AS DOUBLE) AS sigma,
         |  CAST(f.alloc_neyman AS BIGINT) AS alloc_neyman,
         |  CAST(f.alloc_prop AS BIGINT) AS alloc_prop,
         |  v.var_neyman, v.var_prop
         |FROM w JOIN fin f ON f.source = w.source, vars v
         |ORDER BY w.source""".stripMargin,

    // q302: window cumsums over the same value grid; the difference
    // identities R2−I2x = 2·ayb+cy / R2−I2y = 2·axb+cx are the
    // algebraic simplification of the engine's full midrank spelling
    "q302_cvm_test" ->
      s"""WITH b AS (
         |  SELECT n_chars, CAST((doc_id // 20) % 2 AS INT) AS e
         |  FROM documents),
         |g AS (
         |  SELECT n_chars,
         |    SUM(CASE WHEN e = 0 THEN 1 ELSE 0 END) AS cx,
         |    SUM(CASE WHEN e = 1 THEN 1 ELSE 0 END) AS cy
         |  FROM b GROUP BY 1),
         |c AS (
         |  SELECT n_chars, cx, cy,
         |    SUM(cx) OVER (ORDER BY n_chars) - cx AS axb,
         |    SUM(cy) OVER (ORDER BY n_chars) - cy AS ayb
         |  FROM g),
         |t AS (SELECT SUM(cx) AS n, SUM(cy) AS m FROM g),
         |u AS (
         |  SELECT t.n AS n, t.m AS m,
         |    t.n * SUM(c.cx * (2 * c.ayb + c.cy) * (2 * c.ayb + c.cy))
         |    + t.m * SUM(c.cy * (2 * c.axb + c.cx) * (2 * c.axb + c.cx))
         |      AS u4
         |  FROM c, t GROUP BY t.n, t.m)
         |SELECT CAST(n AS BIGINT) AS n, CAST(m AS BIGINT) AS m,
         |  CAST(u4 AS BIGINT) AS u4,
         |  ROUND(CAST(u4 AS DOUBLE) / (4.0 * n * m * (n + m))
         |    - (4.0 * n * m - 1) / (6.0 * (n + m)), 6) AS t,
         |  ROUND(CAST(u4 AS DOUBLE) / (4.0 * n * m * (n + m))
         |    - (4.0 * n * m - 1) / (6.0 * (n + m)), 6) > 0.347
         |    AS reject_10pct,
         |  ROUND(CAST(u4 AS DOUBLE) / (4.0 * n * m * (n + m))
         |    - (4.0 * n * m - 1) / (6.0 * (n + m)), 6) > 0.461
         |    AS reject_5pct
         |FROM u""".stripMargin,

    "q304_conformal" ->
      s"""WITH base AS (
         |  SELECT doc_id, lang, n_chars,
         |    ${TextAnalysis.md5IntSql("'cf:' || CAST(doc_id AS VARCHAR)")}
         |      % 4 AS h
         |  FROM documents),
         |fit AS (
         |  SELECT lang, COUNT(*) AS n_fit,
         |    CAST(ROUND(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 6)
         |      AS DECIMAL(14,6)) AS yhat
         |  FROM base WHERE h <= 1 GROUP BY 1),
         |rg AS (
         |  SELECT CAST(ABS(CAST(b.n_chars AS DECIMAL(14,6)) - f.yhat)
         |      AS DECIMAL(14,6)) AS r, COUNT(*) AS c
         |  FROM base b JOIN fit f ON f.lang = b.lang
         |  WHERE b.h = 2 GROUP BY 1),
         |k AS (
         |  SELECT SUM(c) AS ncal,
         |    CAST(CEIL((SUM(c) + 1) * 0.9) AS BIGINT) AS k FROM rg),
         |cum AS (SELECT r, SUM(c) OVER (ORDER BY r) AS cc FROM rg),
         |q AS (SELECT MIN(cum.r) AS qhat FROM cum, k WHERE cum.cc >= k.k),
         |cov AS (
         |  SELECT COUNT(*) AS n_test,
         |    SUM(CASE WHEN ABS(CAST(b.n_chars AS DECIMAL(14,6)) - f.yhat)
         |      <= q.qhat THEN 1 ELSE 0 END) AS n_covered
         |  FROM base b JOIN fit f ON f.lang = b.lang, q
         |  WHERE b.h = 3)
         |SELECT f.lang, CAST(f.n_fit AS BIGINT) AS n_fit,
         |  CAST(f.yhat AS DOUBLE) AS yhat,
         |  CAST(k.ncal AS BIGINT) AS n_cal,
         |  CAST(cov.n_test AS BIGINT) AS n_test,
         |  CAST(cov.n_covered AS BIGINT) AS n_covered,
         |  CAST(q.qhat AS DOUBLE) AS qhat,
         |  ROUND(CAST(cov.n_covered AS DOUBLE) / cov.n_test, 6) AS coverage
         |FROM fit f, k, q, cov ORDER BY f.lang""".stripMargin,

    "q305_sprt" -> {
      val la = "CAST(ROUND(1000000 * LN(0.22 / 0.18), 0) AS BIGINT)"
      val lb = "CAST(ROUND(1000000 * LN(0.78 / 0.82), 0) AS BIGINT)"
      val ua = "CAST(ROUND(1000000 * LN(0.95 / 0.05), 0) AS BIGINT)"
      s"""WITH daily AS (
         |  SELECT epoch_ns(ts)//1000 // 86400000000 AS day,
         |    COUNT(*) AS n,
         |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS x
         |  FROM events GROUP BY 1),
         |c AS (
         |  SELECT day, n, x,
         |    SUM(x * $la + (n - x) * $lb) OVER (ORDER BY day) AS cum
         |  FROM daily),
         |f AS (
         |  SELECT MIN(day) AS fday FROM c
         |  WHERE cum >= $ua OR cum <= -($ua))
         |SELECT c.day, CAST(c.n AS BIGINT) AS n, CAST(c.x AS BIGINT) AS x,
         |  ROUND(CAST(c.cum AS DOUBLE) / 1000000.0, 6) AS cum_llr,
         |  CASE WHEN f.fday IS NOT NULL AND c.day > f.fday THEN 'decided'
         |    WHEN c.cum >= $ua THEN 'accept_h1'
         |    WHEN c.cum <= -($ua) THEN 'accept_h0'
         |    ELSE 'continue' END AS state
         |FROM c, f ORDER BY c.day""".stripMargin
    },

    "q300_eb_shrinkage" ->
      s"""WITH src AS (
         |  SELECT source, COUNT(*) AS nh, SUM(y) AS xh
         |  FROM (SELECT source, $dupLabSql AS y FROM documents) z
         |  GROUP BY 1),
         |p AS (
         |  SELECT source, nh, xh,
         |    CAST(ROUND(CAST(xh AS DOUBLE) / nh, 6) AS DECIMAL(12,6)) AS p6
         |  FROM src),
         |agg AS (
         |  SELECT SUM(p6) AS sp, SUM(p6 * p6) AS spp, COUNT(*) AS h FROM p),
         |m AS (
         |  SELECT CAST(ROUND(CAST(sp AS DOUBLE) / h, 6) AS DECIMAL(12,6))
         |    AS m6, sp, spp, h FROM agg),
         |v AS (
         |  SELECT m6,
         |    CAST(ROUND(CAST(spp - 2 * m6 * sp + h * m6 * m6 AS DOUBLE)
         |      / (h - 1), 6) AS DECIMAL(12,6)) AS v6
         |  FROM m),
         |pr AS (
         |  SELECT m6, v6,
         |    CAST(ROUND(GREATEST(CAST(m6 AS DOUBLE) * (1 - m6) / v6 - 1, 0.0),
         |      6) AS DECIMAL(18,6)) AS mm
         |  FROM v)
         |SELECT p.source, CAST(p.nh AS BIGINT) AS nh,
         |  CAST(p.xh AS BIGINT) AS xh,
         |  CAST(p.p6 AS DOUBLE) AS raw_rate,
         |  CAST(pr.m6 AS DOUBLE) AS prior_mean,
         |  CAST(pr.v6 AS DOUBLE) AS prior_var,
         |  CAST(pr.mm AS DOUBLE) AS prior_strength,
         |  ROUND((CAST(p.xh AS DOUBLE) + pr.m6 * pr.mm) / (p.nh + pr.mm), 6)
         |    AS shrunk_rate
         |FROM p, pr ORDER BY p.source""".stripMargin
  )
}
