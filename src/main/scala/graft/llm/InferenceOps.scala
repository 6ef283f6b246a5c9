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

    // Importance-weighted AUC under covariate shift (Sugiyama et al.
    // 2007's density-ratio reweighting applied to ranking evaluation):
    // the labeled REF carve (even doc_id) evaluates the q229 score,
    // but the deployment target is the CUR carve — so every ref doc
    // is reweighted by its score-bucket's density ratio
    // (n_cur+0.5)/(n_ref+0.5), quantized ONCE to micro-units, and the
    // weighted Mann–Whitney runs in EXACT integer mass (wp = np·w_µ)
    // through q229's doubled-tie fold with DECIMAL(38,0) accumulators
    // — one division at the end. Plain AUC rides along so the shift
    // correction is visible. One corpus pass to the score grid.
    "q308_shift_weighted_auc" -> ((s, d) => {
      val ts = TextAnalysis.tokens(col("text"))
      val base = Tables.documents(s, d)
        .withColumn("n_tok", size(ts))
        .filter(col("n_tok") > 0) // zero-token guard (q229's rationale)
        .withColumn("stop_cnt", size(filter(ts,
          t => t.isin(TextAnalysis.Stopwords: _*))))
        .withColumn("lab",
          when(array_contains(ts, "dup"), 1L).otherwise(0L))
        .select(expr("CAST((1000 * stop_cnt) DIV n_tok AS INT)").as("sm"),
          col("lab"), (col("doc_id") % 2 === 0).as("is_ref"))
      val g = base.groupBy(col("sm")).agg(
          sum(when(col("is_ref") && col("lab") === 1, 1L).otherwise(0L))
            .as("np"),
          sum(when(col("is_ref") && col("lab") === 0, 1L).otherwise(0L))
            .as("nn"),
          sum(when(col("is_ref"), 1L).otherwise(0L)).as("n_ref_s"),
          sum(when(!col("is_ref"), 1L).otherwise(0L)).as("n_cur_s"))
        .localCheckpoint() // score-grid-bounded; one corpus pass
      val buckets = g.groupBy(expr("sm DIV 100").cast("int").as("bucket"))
        .agg(sum(col("n_ref_s")).as("n_ref"), sum(col("n_cur_s")).as("n_cur"))
        .withColumn("wm", expr(
          """CAST(ROUND(1000000 * (n_cur + 0.5) / (n_ref + 0.5), 0)
            |  AS BIGINT)""".stripMargin))
      val folded = g
        .join(broadcast(buckets.select(col("bucket"), col("wm"))),
          expr("CAST(sm DIV 100 AS INT)") === col("bucket"))
        .select(col("sm"), col("np"), col("nn"), col("wm"))
        .agg(sort_array(collect_list(
            struct(col("sm"), col("np"), col("nn"), col("wm")))).as("bs"),
          sum(col("np")).as("tp"), sum(col("nn")).as("tn"),
          sum(expr("np * wm")).as("wp_tot"),
          sum(expr("nn * wm")).as("wn_tot"))
        .withColumn("plain2", expr(
          """aggregate(bs, named_struct('cum', 0L, 'num', 0L),
            |  (a, x) -> named_struct('cum', a.cum + x.nn,
            |    'num', a.num + x.np * (2 * a.cum + x.nn)), a -> a.num)"""
            .stripMargin))
        .withColumn("shift2", expr(
          """aggregate(bs,
            |  named_struct('cum', CAST(0 AS DECIMAL(38,0)),
            |    'num', CAST(0 AS DECIMAL(38,0))),
            |  (a, x) -> named_struct(
            |    'cum', CAST(a.cum + x.nn * x.wm AS DECIMAL(38,0)),
            |    'num', CAST(a.num + CAST(x.np * x.wm AS DECIMAL(38,0))
            |      * (2 * a.cum + x.nn * x.wm) AS DECIMAL(38,0))),
            |  a -> a.num)""".stripMargin))
        .select(
          round(col("plain2").cast("double") /
            (lit(2.0) * col("tp") * col("tn")), 6).as("auc_plain"),
          round(col("shift2").cast("double") /
            (lit(2.0) * col("wp_tot").cast("double") * col("wn_tot")
              .cast("double")), 6).as("auc_shifted"))
      buckets
        .select(col("bucket"), col("n_ref"), col("n_cur"),
          round(col("wm").cast("double") / 1e6, 6).as("weight"))
        .crossJoin(broadcast(folded))
        .orderBy(col("bucket"))
    }),

    // Token-budget mixture WATER-FILLING (the deterministic core of
    // source-mixture tuning à la DoReMi/data-mixing: hit a TARGET
    // language mix under per-language supply caps): per-lang token
    // capacities from one corpus pass, target shares as micro-unit
    // constants, budget = 60% of the corpus. Langs process in
    // exact-rational c/t order (cross-multiplied compares, never a
    // float ratio); a lang whose proportional share ≥ its capacity is
    // capped at supply and the remainder re-levels over the rest —
    // the classic water-fill, decided entirely in BIGINT cross
    // products; the final uncapped distribution is q299's Hamilton
    // largest-remainder, so allocations sum to the budget EXACTLY.
    // The |langs|-row fill runs on the driver over collected exact
    // longs (A13's model-state argument; ≤64-row result) and is
    // bit-matched by the oracle's recursive-CTE replay.
    "q309_mixture_waterfill" -> ((s, d) => {
      import s.implicits._
      val targets = Map("en" -> 300000L, "zh" -> 250000L, "es" -> 200000L,
        "de" -> 150000L, "fr" -> 100000L)
      val caps = Tables.documents(s, d)
        .select(col("lang"), size(TextAnalysis.tokens(col("text")))
          .cast("long").as("tok"))
        .groupBy(col("lang")).agg(sum(col("tok")).as("cap"))
        .as[(String, Long)].collect().toMap
      val total = caps.values.sum
      val budget = 6L * total / 10L
      // ratio order: c/t asc via the exact integer surrogate
      // (cap·10⁹ DIV target) with lang tiebreak — the same key the
      // recursive oracle sorts on, so near-equal rationals can never
      // order differently across engines
      val order = caps.keys.toSeq
        .sortBy(l => ((caps(l) * 1000000000L) / targets(l), l))
      var remB = budget
      var remT = order.map(targets).sum
      var capped = Map.empty[String, Long]
      var uncapped = order
      var done = false
      for (l <- order if !done) {
        // provisional share ≥ capacity ⇔ remB·t_l ≥ c_l·remT
        if (remB * targets(l) >= caps(l) * remT) {
          capped += l -> caps(l); remB -= caps(l); remT -= targets(l)
          uncapped = uncapped.filterNot(_ == l)
        } else done = true // ratio order: all later langs fit too
      }
      // Hamilton largest-remainder over the uncapped suffix
      val tSum = uncapped.map(targets).sum
      val baseRem = uncapped.map { l =>
        (l, (remB * targets(l)) / tSum, (remB * targets(l)) % tSum)
      }
      val leftover = remB - baseRem.map(_._2).sum
      val plusOne = baseRem.sortBy { case (l, _, r) => (-r, l) }
        .take(leftover.toInt).map(_._1).toSet
      val alloc = capped ++ baseRem.map { case (l, b, _) =>
        l -> (b + (if (plusOne(l)) 1L else 0L)) }.toMap
      val rows = caps.keys.toSeq.sorted.map { l =>
        (l, caps(l), targets(l), alloc(l), capped.contains(l),
          math.round(1e6 * alloc(l).toDouble / budget) / 1e6.toDouble)
      }
      s.createDataFrame(rows)
        .toDF("lang", "cap_tokens", "target_micro", "alloc_tokens",
          "capped", "realized_share")
        .orderBy(col("lang"))
    }),

    // Hampel outlier filter (Hampel 1974; Pearson 2002's recommended
    // robust despiker) over the per-type daily counts — the
    // median/MAD sibling of q251's CUSUM (CUSUM finds LEVEL SHIFTS;
    // Hampel flags individual spikes without letting the spike
    // contaminate its own baseline the way a mean/stddev window
    // does). Centered 7-day windows, full windows only (odd count ⇒
    // the median and the MAD are EXACT INTEGERS), flag when
    // |x − med| > 3·MAD — the entire query is integer arithmetic on
    // the calendar-bounded grid: one corpus pass to (type, day)
    // counts, per-type array fold with sorted 7-slices.
    "q310_hampel_filter" -> ((s, d) => {
      val daily = Tables.eventsUs(s, d)
        .select(col("event_type"), expr("ts_us div 86400000000").as("day"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("cnt"))
      daily.groupBy(col("event_type"))
        .agg(array_sort(collect_list(struct(col("day"), col("cnt"))))
          .as("a"), count(lit(1)).as("n"))
        .filter(col("n") >= 7)
        .select(col("event_type"), posexplode(expr(
          """transform(sequence(4, cast(n as int) - 3), i ->
            |  named_struct(
            |    'day', element_at(a, i).day,
            |    'cnt', element_at(a, i).cnt,
            |    'med', element_at(array_sort(transform(
            |      slice(a, i - 3, 7), x -> x.cnt)), 4),
            |    'mad', element_at(array_sort(transform(
            |      slice(a, i - 3, 7), x -> abs(x.cnt -
            |        element_at(array_sort(transform(
            |          slice(a, i - 3, 7), y -> y.cnt)), 4)))), 4)))"""
            .stripMargin)))
        .select(col("event_type"), col("col.day").as("day"),
          col("col.cnt").as("cnt"), col("col.med").as("med"),
          col("col.mad").as("mad"),
          (abs(col("col.cnt") - col("col.med")) > lit(3) * col("col.mad"))
            .as("is_outlier"))
        .orderBy(col("event_type"), col("day"))
    }),

    // Difference-in-differences (Card & Krueger 1994's workhorse
    // design) on conversion rate: group = user parity, period =
    // calendar half (day < 15 pre / ≥ 15 post); the 2×2 cell means
    // are exact integer rates rounded once, DiD = (p̂₁₁−p̂₁₀) −
    // (p̂₀₁−p̂₀₀) on the settled 6dp decimals, SE = √Σ p(1−p)/n with
    // each variance term a single double expression of exact counts,
    // and significance decided on the ROUNDED z (q235's round-first
    // rule). ONE corpus pass to 4 cells; the parallel-trends caveat
    // is the analyst's, the arithmetic is the engine's.
    "q321_did" -> ((s, d) => {
      val ev = Tables.eventsUs(s, d)
        .select((col("user_id") % 2).cast("int").as("grp"),
          expr("ts_us div 86400000000").as("day"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
      val d0 = ev.agg(min(col("day")).as("d0"))
      val cells = ev.crossJoin(broadcast(d0))
        .withColumn("post", (col("day") - col("d0") >= 15).cast("int"))
        .groupBy(col("grp"), col("post"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("x"))
        .withColumn("p6", expr(
          "CAST(ROUND(CAST(x AS DOUBLE) / n, 6) AS DECIMAL(12,6))"))
        .localCheckpoint() // 4 cells
      val g = cells.agg(
          sum(when(col("grp") === 1 && col("post") === 1, col("p6"))).as("p11"),
          sum(when(col("grp") === 1 && col("post") === 0, col("p6"))).as("p10"),
          sum(when(col("grp") === 0 && col("post") === 1, col("p6"))).as("p01"),
          sum(when(col("grp") === 0 && col("post") === 0, col("p6"))).as("p00"),
          sum(expr("""CAST(ROUND(CAST(x AS DOUBLE) / n * (1 - CAST(x AS DOUBLE) / n)
            |  / n, 12) AS DECIMAL(18,12))""".stripMargin)).as("varsum"))
        .select(
          ((col("p11") - col("p10")) - (col("p01") - col("p00")))
            .cast("double").as("did"),
          expr("ROUND(SQRT(CAST(varsum AS DOUBLE)), 6)").as("se"))
        .withColumn("z", expr("ROUND(did / se, 6)"))
        .withColumn("significant_95", abs(col("z")) > 1.959964)
      cells.select(col("grp"), col("post"), col("n"), col("x"),
          col("p6").cast("double").as("rate"))
        .crossJoin(broadcast(g))
        .orderBy(col("grp"), col("post"))
    }),

    // Poisson-bootstrap confidence interval for AUC (the q231
    // resampling machinery applied to the q229 ranking metric —
    // Efron 1979 percentile CI, Poissonized for one-pass
    // distribution à la Chamandy et al. 2012): every doc draws R=100
    // Poisson(1) replicate weights from the md5 hash (inverse-CDF
    // thresholds inlined as micro constants, identical both
    // engines), the (r, score) weighted counts partial-aggregate
    // map-side — the shuffle carries R×grid CELLS, never R×corpus
    // rows — and each replicate's AUC folds exactly over its own
    // grid. The CI is the exact 3rd/98th order statistic of the 100
    // rounded AUCs (percentile method), selected by integer rank.
    "q316_auc_bootstrap" -> ((s, d) => {
      val R = 100
      // P(Poisson(1) ≤ k)·10⁶ for k = 0..7 (k = 8 absorbs the tail)
      val cdf = Seq(367879L, 735759L, 919699L, 981012L, 996340L,
        999406L, 999917L, 999990L)
      val wExpr = cdf.zipWithIndex
        .map { case (t, k) => s"WHEN u < $t THEN ${k}L" }
        .mkString("CASE ", " ", " ELSE 8L END")
      val ts = TextAnalysis.tokens(col("text"))
      val base = Tables.documents(s, d)
        .withColumn("n_tok", size(ts))
        .filter(col("n_tok") > 0)
        .withColumn("stop_cnt", size(filter(ts,
          t => t.isin(TextAnalysis.Stopwords: _*))))
        .withColumn("lab",
          when(array_contains(ts, "dup"), 1L).otherwise(0L))
        .select(col("doc_id"),
          expr("CAST((1000 * stop_cnt) DIV n_tok AS INT)").as("sm"),
          col("lab"))
        .localCheckpoint() // shared by the point fold + 100 replicates
      val point = base.groupBy(col("sm")).agg(
          sum(col("lab")).as("np"),
          (count(lit(1)) - sum(col("lab"))).as("nn"))
        .agg(sort_array(collect_list(struct(col("sm"), col("np"),
            col("nn")))).as("bs"),
          sum(col("np")).as("tp"), sum(col("nn")).as("tn"))
        .select(round(expr(
          """aggregate(bs, named_struct('cum', 0L, 'num', 0L),
            |  (a, x) -> named_struct('cum', a.cum + x.nn,
            |    'num', a.num + x.np * (2 * a.cum + x.nn)), a -> a.num)"""
            .stripMargin).cast("double") /
          (lit(2.0) * col("tp") * col("tn")), 6).as("auc_point"))
      val reps = base
        .select(col("doc_id"), col("sm"), col("lab"),
          explode(expr(s"sequence(1, $R)")).as("r"))
        .withColumn("u", pmod(TextAnalysis.md5Int(
          concat(lit("bs:"), col("r").cast("string"), lit(":"),
            col("doc_id").cast("string"))), lit(1000000L)))
        .withColumn("w", expr(wExpr))
        .groupBy(col("r"), col("sm"))
        .agg(sum(col("lab") * col("w")).as("wp"),
          sum((lit(1L) - col("lab")) * col("w")).as("wn"))
      val aucs = reps.groupBy(col("r"))
        .agg(sort_array(collect_list(struct(col("sm"), col("wp"),
            col("wn")))).as("bs"),
          sum(col("wp")).as("tp"), sum(col("wn")).as("tn"))
        .select(round(expr(
          """aggregate(bs, named_struct('cum', 0L, 'num', 0L),
            |  (a, x) -> named_struct('cum', a.cum + x.wn,
            |    'num', a.num + x.wp * (2 * a.cum + x.wn)), a -> a.num)"""
            .stripMargin).cast("double") /
          (lit(2.0) * col("tp") * col("tn")), 6)
          .cast("decimal(12,6)").as("auc_r"))
      aucs.agg(sort_array(collect_list(col("auc_r"))).as("a"),
          count(lit(1)).as("nr"),
          sum(col("auc_r")).as("sa"))
        .select(lit(R).cast("int").as("n_replicates"),
          round(col("sa").cast("double") / col("nr"), 6).as("boot_mean"),
          expr("CAST(element_at(a, 3) AS DOUBLE)").as("ci_lo"),
          expr("CAST(element_at(a, 98) AS DOUBLE)").as("ci_hi"))
        .crossJoin(broadcast(point))
        .select(col("auc_point"), col("n_replicates"), col("boot_mean"),
          col("ci_lo"), col("ci_hi"))
    }),

    // Quantile treatment effects (Doksum 1974; the distributional
    // readout q235's mean test hides — a treatment can move the tail
    // and not the mean): per A/B variant (user parity), the exact
    // k/10-quantiles of event value-cents by two-phase rank selection
    // over the value grid (t_k = smallest cents with cum ≥ ⌈k·n/10⌉,
    // ceiling in pure integer), QTE_k = t_k(B) − t_k(A) — EXACT
    // INTEGER CENTS end-to-end, one corpus pass to the two
    // value-grid cells.
    "q318_qte" -> ((s, d) => {
      val g = Tables.events(s, d)
        .select((col("user_id") % 2).cast("int").as("v"),
          expr("CAST(ROUND(value * 100, 0) AS BIGINT)").as("cents"))
        .groupBy(col("v"), col("cents")).agg(count(lit(1)).as("c"))
      def qs(v: Int) = g.filter(col("v") === v)
        .agg(sort_array(collect_list(struct(col("cents"), col("c"))))
          .as("a"), sum(col("c")).as("n"))
        .select(expr(
          """transform(sequence(1, 9), k ->
            |  aggregate(a, named_struct('cum', 0L, 'q', CAST(NULL AS BIGINT)),
            |    (acc, x) -> named_struct(
            |      'cum', acc.cum + x.c,
            |      'q', CASE WHEN acc.q IS NULL
            |        AND acc.cum + x.c >= (k * n + 9) DIV 10
            |        THEN x.cents ELSE acc.q END),
            |    acc -> acc.q))""".stripMargin).as(s"t$v"),
          col("n").as(s"n$v"))
      qs(0).crossJoin(broadcast(qs(1)))
        .select(col("n0"), col("n1"),
          posexplode(expr(
            """transform(sequence(1, 9), k -> named_struct(
              |  'k', k, 'qa', element_at(t0, k), 'qb', element_at(t1, k)))"""
              .stripMargin)))
        .select(col("col.k").cast("int").as("decile"),
          col("col.qa").as("q_variant0_cents"),
          col("col.qb").as("q_variant1_cents"),
          (col("col.qb") - col("col.qa")).as("qte_cents"),
          round((col("col.qb") - col("col.qa")).cast("double") / 100.0, 6)
            .as("qte_dollars"),
          col("n0"), col("n1"))
        .orderBy(col("decile"))
    }),

    // Chapman capture–recapture estimate (Chapman 1951; Lincoln–
    // Petersen with small-sample correction) of the TOTAL duplicate
    // mass from two independent weak detectors — the "how many dups
    // did we MISS" answer no single detector gives: detector A flags
    // the weak token label, detector B flags exact-fingerprint
    // collisions (q35's md5 construction); treating them as two
    // captures, N̂ = (nA+1)(nB+1)/(m+1) − 1 estimates the full dup
    // population from the overlap m. One corpus pass for the flags +
    // one fp-keyed shuffle for B's collision counts; the estimator,
    // its Seber variance and the 95% CI are single double expressions
    // of exact counts — CI endpoints computed from the ROUNDED
    // estimate and SE so both engines assemble identical bounds.
    "q306_capture_recapture" -> ((s, d) => {
      val base = Tables.documents(s, d)
        .select(col("doc_id"), dupLab.as("a"), md5(col("text")).as("fp"))
      val fpc = base.groupBy(col("fp")).agg(count(lit(1)).as("c"))
      val flags = base.join(fpc, "fp")
        .select(col("a"),
          when(col("c") > 1, 1L).otherwise(0L).as("b"))
      flags.agg(count(lit(1)).as("n_docs"),
          sum(col("a")).as("n_a"), sum(col("b")).as("n_b"),
          sum(col("a") * col("b")).as("n_both"),
          sum(greatest(col("a"), col("b"))).as("n_any"))
        .withColumn("chapman_est", expr(
          """ROUND((n_a + 1) * (n_b + 1) / CAST(n_both + 1 AS DOUBLE) - 1,
            |  6)""".stripMargin))
        .withColumn("se", expr(
          """ROUND(SQRT(CAST((n_a + 1) * (n_b + 1) AS DOUBLE)
            |  * (n_a - n_both) * (n_b - n_both)
            |  / (CAST(n_both + 1 AS DOUBLE) * (n_both + 1)
            |     * (n_both + 2))), 6)""".stripMargin))
        .withColumn("ci_lo", expr("ROUND(chapman_est - 1.96 * se, 6)"))
        .withColumn("ci_hi", expr("ROUND(chapman_est + 1.96 * se, 6)"))
    }),

    // RFM (recency / frequency / monetary) quintile segmentation
    // (Hughes 1994) — the classic user-value grid a growth pipeline
    // materializes per refresh: per purchasing user, days-since-last-
    // purchase, purchase count, exact cents total, each coded 1–5 by
    // EXACT quintile thresholds (ascending-value codes; R=1 is the
    // most recent). Two-phase ranking discipline throughout: ONE
    // corpus pass to the per-user table (localCheckpointed,
    // user-bounded), each dimension's thresholds come from a
    // value-grid cumulative fold (t_k = smallest value with cum ≥
    // ⌈k·n/5⌉, ceiling in pure integer (k·n+4) DIV 5), codes are
    // integer compares against the settled thresholds, and the
    // output is the ≤125-cell segment grid — no partition-less
    // window anywhere.
    "q307_rfm_segments" -> ((s, d) => {
      val purchases = Tables.eventsUs(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), expr("ts_us div 86400000000").as("day"),
          expr("CAST(ROUND(value * 100, 0) AS BIGINT)").as("cents"))
      val lastDay = purchases.agg(max(col("day")).as("last_day"))
      val users = purchases.groupBy(col("user_id"))
        .agg(max(col("day")).as("max_day"), count(lit(1)).as("f"),
          sum(col("cents")).as("mon"))
        .crossJoin(broadcast(lastDay))
        .withColumn("rec", col("last_day") - col("max_day"))
        .select(col("user_id"), col("rec"), col("f"), col("mon"))
        .localCheckpoint() // user-bounded; one corpus pass total
      def thresholds(dim: String) = users
        .groupBy(col(dim).as("v")).agg(count(lit(1)).as("c"))
        .agg(sort_array(collect_list(struct(col("v"), col("c")))).as("a"),
          sum(col("c")).as("n"))
        .select(expr(
          """transform(sequence(1, 4), k ->
            |  aggregate(a, named_struct('cum', 0L, 'q', CAST(NULL AS BIGINT)),
            |    (acc, x) -> named_struct(
            |      'cum', acc.cum + x.c,
            |      'q', CASE WHEN acc.q IS NULL
            |        AND acc.cum + x.c >= (k * n + 4) DIV 5
            |        THEN x.v ELSE acc.q END),
            |    acc -> acc.q))""".stripMargin).as(s"t_$dim"))
      val coded = users
        .crossJoin(broadcast(thresholds("rec")))
        .crossJoin(broadcast(thresholds("f")))
        .crossJoin(broadcast(thresholds("mon")))
        .select(col("mon"),
          expr("""1 + IF(rec > element_at(t_rec, 1), 1, 0)
            |  + IF(rec > element_at(t_rec, 2), 1, 0)
            |  + IF(rec > element_at(t_rec, 3), 1, 0)
            |  + IF(rec > element_at(t_rec, 4), 1, 0)""".stripMargin)
            .cast("int").as("r_code"),
          expr("""1 + IF(f > element_at(t_f, 1), 1, 0)
            |  + IF(f > element_at(t_f, 2), 1, 0)
            |  + IF(f > element_at(t_f, 3), 1, 0)
            |  + IF(f > element_at(t_f, 4), 1, 0)""".stripMargin)
            .cast("int").as("f_code"),
          expr("""1 + IF(mon > element_at(t_mon, 1), 1, 0)
            |  + IF(mon > element_at(t_mon, 2), 1, 0)
            |  + IF(mon > element_at(t_mon, 3), 1, 0)
            |  + IF(mon > element_at(t_mon, 4), 1, 0)""".stripMargin)
            .cast("int").as("m_code"))
      coded.groupBy(col("r_code"), col("f_code"), col("m_code"))
        .agg(count(lit(1)).as("n_users"),
          round(sum(col("mon")).cast("double") / count(lit(1)) / 100.0, 6)
            .as("avg_monetary"))
        .orderBy(col("r_code"), col("f_code"), col("m_code"))
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

  /** q316's twin: the same seeded Poisson(1) draws (identical md5 →
    * inverse-CDF micro thresholds), per-replicate weighted AUC via
    * window cumsums, exact 3rd/98th order statistics.
    */
  private def aucBootstrapOracleSql: String = {
    val cdf = Seq(367879L, 735759L, 919699L, 981012L, 996340L,
      999406L, 999917L, 999990L)
    val wExpr = cdf.zipWithIndex
      .map { case (t, k) => s"WHEN u < $t THEN $k" }
      .mkString("CASE ", " ", " ELSE 8 END")
    val hash = TextAnalysis.md5IntSql(
      "'bs:' || CAST(r.r AS VARCHAR) || ':' || CAST(b.doc_id AS VARCHAR)")
    s"""WITH base AS (
       |  SELECT doc_id,
       |    CAST((1000 * CAST(len(list_filter(ts,
       |      t -> list_contains(['the','a','of','and','to','in','is'], t)))
       |      AS BIGINT)) // len(ts) AS INT) AS sm,
       |    CASE WHEN list_contains(ts, 'dup') THEN 1 ELSE 0 END AS lab
       |  FROM (SELECT doc_id, ${TextAnalysis.tokensSql} AS ts
       |        FROM documents) z
       |  WHERE len(ts) > 0),
       |pg AS (
       |  SELECT sm, SUM(lab) AS np, COUNT(*) - SUM(lab) AS nn
       |  FROM base GROUP BY 1),
       |pc AS (
       |  SELECT sm, np, nn,
       |    SUM(nn) OVER (ORDER BY sm) - nn AS cum FROM pg),
       |pt AS (
       |  SELECT ROUND(CAST(SUM(np * (2 * cum + nn)) AS DOUBLE)
       |    / (2.0 * (SELECT SUM(np) FROM pg)
       |       * (SELECT SUM(nn) FROM pg)), 6) AS auc_point
       |  FROM pc),
       |reps AS (
       |  SELECT r.r, b.sm, b.lab, $wExpr AS w
       |  FROM base b,
       |    (SELECT unnest(range(1, 101)) AS r) r,
       |    LATERAL (SELECT $hash % 1000000 AS u) h),
       |wg AS (
       |  SELECT r, sm, SUM(lab * w) AS wp, SUM((1 - lab) * w) AS wn
       |  FROM reps GROUP BY 1, 2),
       |wc AS (
       |  SELECT r, sm, wp, wn,
       |    SUM(wn) OVER (PARTITION BY r ORDER BY sm) - wn AS cum
       |  FROM wg),
       |wa AS (
       |  SELECT r,
       |    CAST(ROUND(CAST(SUM(wp * (2 * cum + wn)) AS DOUBLE)
       |      / (2.0 * SUM(wp) * SUM(wn)), 6) AS DECIMAL(12,6)) AS auc_r
       |  FROM wc GROUP BY r),
       |rk AS (
       |  SELECT auc_r, ROW_NUMBER() OVER (ORDER BY auc_r) AS rn,
       |    COUNT(*) OVER () AS nr, SUM(auc_r) OVER () AS sa
       |  FROM wa)
       |SELECT pt.auc_point, CAST(100 AS INT) AS n_replicates,
       |  ROUND(CAST(rk.sa AS DOUBLE) / rk.nr, 6) AS boot_mean,
       |  (SELECT CAST(auc_r AS DOUBLE) FROM rk WHERE rn = 3) AS ci_lo,
       |  (SELECT CAST(auc_r AS DOUBLE) FROM rk WHERE rn = 98) AS ci_hi
       |FROM pt, rk WHERE rk.rn = 1""".stripMargin
  }

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

    "q316_auc_bootstrap" -> aucBootstrapOracleSql,

    "q321_did" ->
      """WITH ev AS (
        |  SELECT CAST(user_id % 2 AS INT) AS grp,
        |    epoch_ns(ts)//1000 // 86400000000 AS day,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
        |  FROM events),
        |d0 AS (SELECT MIN(day) AS d0 FROM ev),
        |cells AS (
        |  SELECT grp, CAST(day - d0.d0 >= 15 AS INT) AS post,
        |    COUNT(*) AS n, SUM(y) AS x
        |  FROM ev, d0 GROUP BY 1, 2),
        |c2 AS (
        |  SELECT grp, post, n, x,
        |    CAST(ROUND(CAST(x AS DOUBLE) / n, 6) AS DECIMAL(12,6)) AS p6
        |  FROM cells),
        |g AS (
        |  SELECT
        |    CAST((SUM(CASE WHEN grp = 1 AND post = 1 THEN p6 END)
        |      - SUM(CASE WHEN grp = 1 AND post = 0 THEN p6 END))
        |      - (SUM(CASE WHEN grp = 0 AND post = 1 THEN p6 END)
        |      - SUM(CASE WHEN grp = 0 AND post = 0 THEN p6 END))
        |      AS DOUBLE) AS did,
        |    ROUND(SQRT(CAST(SUM(CAST(ROUND(CAST(x AS DOUBLE) / n
        |      * (1 - CAST(x AS DOUBLE) / n) / n, 12) AS DECIMAL(18,12)))
        |      AS DOUBLE)), 6) AS se
        |  FROM c2),
        |g2 AS (
        |  SELECT did, se, ROUND(did / se, 6) AS z,
        |    ABS(ROUND(did / se, 6)) > 1.959964 AS significant_95
        |  FROM g)
        |SELECT c2.grp, c2.post, CAST(c2.n AS BIGINT) AS n,
        |  CAST(c2.x AS BIGINT) AS x, CAST(c2.p6 AS DOUBLE) AS rate,
        |  g2.did, g2.se, g2.z, g2.significant_95
        |FROM c2, g2 ORDER BY c2.grp, c2.post""".stripMargin,

    "q318_qte" ->
      """WITH g AS (
        |  SELECT CAST(user_id % 2 AS INT) AS v,
        |    CAST(ROUND(value * 100, 0) AS BIGINT) AS cents,
        |    COUNT(*) AS c
        |  FROM events GROUP BY 1, 2),
        |n AS (SELECT v, SUM(c) AS n FROM g GROUP BY 1),
        |cum AS (
        |  SELECT v, cents,
        |    SUM(c) OVER (PARTITION BY v ORDER BY cents) AS cc
        |  FROM g),
        |ks(k) AS (VALUES (1),(2),(3),(4),(5),(6),(7),(8),(9)),
        |th AS (
        |  SELECT cum.v, ks.k, MIN(cum.cents) AS q
        |  FROM cum JOIN n ON n.v = cum.v, ks
        |  WHERE cum.cc >= (ks.k * n.n + 9) // 10
        |  GROUP BY 1, 2)
        |SELECT CAST(a.k AS INT) AS decile,
        |  a.q AS q_variant0_cents, b.q AS q_variant1_cents,
        |  b.q - a.q AS qte_cents,
        |  ROUND(CAST(b.q - a.q AS DOUBLE) / 100.0, 6) AS qte_dollars,
        |  (SELECT CAST(n AS BIGINT) FROM n WHERE v = 0) AS n0,
        |  (SELECT CAST(n AS BIGINT) FROM n WHERE v = 1) AS n1
        |FROM th a JOIN th b ON b.k = a.k AND a.v = 0 AND b.v = 1
        |ORDER BY decile""".stripMargin,

    "q308_shift_weighted_auc" ->
      s"""WITH base AS (
         |  SELECT CAST((1000 * CAST(len(list_filter(ts,
         |      t -> list_contains(['the','a','of','and','to','in','is'], t)))
         |      AS BIGINT)) // len(ts) AS INT) AS sm,
         |    CASE WHEN list_contains(ts, 'dup') THEN 1 ELSE 0 END AS lab,
         |    doc_id % 2 = 0 AS is_ref
         |  FROM (SELECT doc_id, ${TextAnalysis.tokensSql} AS ts
         |        FROM documents) z
         |  WHERE len(ts) > 0),
         |g AS (
         |  SELECT sm,
         |    SUM(CASE WHEN is_ref AND lab = 1 THEN 1 ELSE 0 END) AS np,
         |    SUM(CASE WHEN is_ref AND lab = 0 THEN 1 ELSE 0 END) AS nn,
         |    SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS n_ref_s,
         |    SUM(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS n_cur_s
         |  FROM base GROUP BY 1),
         |bk AS (
         |  SELECT CAST(sm // 100 AS INT) AS bucket,
         |    SUM(n_ref_s) AS n_ref, SUM(n_cur_s) AS n_cur,
         |    CAST(ROUND(1000000 * (SUM(n_cur_s) + 0.5)
         |      / (SUM(n_ref_s) + 0.5), 0) AS BIGINT) AS wm
         |  FROM g GROUP BY 1),
         |j AS (
         |  SELECT g.sm, g.np, g.nn, bk.wm
         |  FROM g JOIN bk ON bk.bucket = CAST(g.sm // 100 AS INT)),
         |tot AS (
         |  SELECT SUM(np) AS tp, SUM(nn) AS tn,
         |    SUM(np * wm) AS wp, SUM(nn * wm) AS wn FROM j),
         |c AS (
         |  SELECT sm, np, nn, wm,
         |    SUM(nn) OVER (ORDER BY sm) - nn AS cumn,
         |    SUM(nn * wm) OVER (ORDER BY sm) - nn * wm AS cumwn
         |  FROM j),
         |a AS (
         |  SELECT SUM(np * (2 * cumn + nn)) AS p2,
         |    SUM(CAST(np * wm AS HUGEINT) * (2 * cumwn + nn * wm)) AS s2
         |  FROM c),
         |gl AS (
         |  SELECT ROUND(CAST(a.p2 AS DOUBLE) / (2.0 * tot.tp * tot.tn), 6)
         |      AS auc_plain,
         |    ROUND(CAST(a.s2 AS DOUBLE)
         |      / (2.0 * CAST(tot.wp AS DOUBLE) * CAST(tot.wn AS DOUBLE)), 6)
         |      AS auc_shifted
         |  FROM a, tot)
         |SELECT bk.bucket, CAST(bk.n_ref AS BIGINT) AS n_ref,
         |  CAST(bk.n_cur AS BIGINT) AS n_cur,
         |  ROUND(CAST(bk.wm AS DOUBLE) / 1000000.0, 6) AS weight,
         |  gl.auc_plain, gl.auc_shifted
         |FROM bk, gl ORDER BY bk.bucket""".stripMargin,

    // q309: the water-fill replayed as a recursive CTE in the same
    // exact integer surrogate order, then q299's Hamilton rank
    "q309_mixture_waterfill" ->
      s"""WITH RECURSIVE caps AS (
         |  SELECT lang, SUM(CAST(len(${TextAnalysis.tokensSql}) AS BIGINT))
         |    AS cap
         |  FROM documents GROUP BY 1),
         |tgt(lang, t) AS (VALUES ('en', 300000), ('zh', 250000),
         |  ('es', 200000), ('de', 150000), ('fr', 100000)),
         |j AS (SELECT c.lang, c.cap, CAST(tgt.t AS BIGINT) AS t
         |      FROM caps c JOIN tgt ON tgt.lang = c.lang),
         |tot AS (SELECT SUM(cap) AS total, SUM(t) AS tsum FROM j),
         |bg AS (SELECT 6 * total // 10 AS budget FROM tot),
         |ord AS (
         |  SELECT lang, cap, t,
         |    ROW_NUMBER() OVER (ORDER BY (cap * 1000000000) // t, lang)
         |      AS i
         |  FROM j),
         |rec AS (
         |  SELECT 0 AS i, bg.budget AS remb, tot.tsum AS remt,
         |    TRUE AS allc
         |  FROM bg, tot
         |  UNION ALL
         |  SELECT o.i,
         |    CASE WHEN r.allc AND r.remb * o.t >= o.cap * r.remt
         |      THEN r.remb - o.cap ELSE r.remb END,
         |    CASE WHEN r.allc AND r.remb * o.t >= o.cap * r.remt
         |      THEN r.remt - o.t ELSE r.remt END,
         |    r.allc AND r.remb * o.t >= o.cap * r.remt
         |  FROM rec r JOIN ord o ON o.i = r.i + 1),
         |capped AS (SELECT ord.lang FROM rec JOIN ord ON ord.i = rec.i
         |           WHERE rec.allc),
         |fin AS (SELECT remb, remt FROM rec
         |        WHERE i = (SELECT MAX(i) FROM rec)),
         |unc AS (
         |  SELECT o.lang, o.cap, o.t,
         |    (f.remb * o.t) // f.remt AS base_a,
         |    (f.remb * o.t) % f.remt AS rem_a
         |  FROM ord o, fin f
         |  WHERE o.lang NOT IN (SELECT lang FROM capped)),
         |rk AS (
         |  SELECT lang, base_a,
         |    ROW_NUMBER() OVER (ORDER BY rem_a DESC, lang) AS rn,
         |    SUM(base_a) OVER () AS sb
         |  FROM unc),
         |alloc AS (
         |  SELECT j.lang, j.cap, j.t,
         |    CASE WHEN cp.lang IS NOT NULL THEN j.cap
         |      ELSE rk.base_a + CASE WHEN rk.rn <=
         |        (SELECT remb FROM fin) - rk.sb THEN 1 ELSE 0 END END
         |      AS a,
         |    cp.lang IS NOT NULL AS capped
         |  FROM j
         |  LEFT JOIN capped cp ON cp.lang = j.lang
         |  LEFT JOIN rk ON rk.lang = j.lang)
         |SELECT al.lang, CAST(al.cap AS BIGINT) AS cap_tokens,
         |  CAST(al.t AS BIGINT) AS target_micro,
         |  CAST(al.a AS BIGINT) AS alloc_tokens, al.capped,
         |  CAST(ROUND(1000000.0 * al.a / bg.budget, 0) AS BIGINT)
         |    / 1000000.0 AS realized_share
         |FROM alloc al, bg ORDER BY al.lang""".stripMargin,

    "q310_hampel_filter" ->
      """WITH dc AS (
        |  SELECT event_type, epoch_ns(ts)//1000 // 86400000000 AS day,
        |    COUNT(*) AS cnt
        |  FROM events GROUP BY 1, 2),
        |idx AS (
        |  SELECT event_type, day, cnt,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS i,
        |    COUNT(*) OVER (PARTITION BY event_type) AS n
        |  FROM dc),
        |w AS (
        |  SELECT a.event_type, a.day, a.cnt,
        |    list_sort(list(b.cnt)) AS win
        |  FROM idx a JOIN idx b ON b.event_type = a.event_type
        |    AND b.i BETWEEN a.i - 3 AND a.i + 3
        |  WHERE a.i >= 4 AND a.i <= a.n - 3 AND a.n >= 7
        |  GROUP BY a.event_type, a.day, a.cnt),
        |m AS (SELECT event_type, day, cnt, win, win[4] AS med FROM w),
        |m2 AS (
        |  SELECT event_type, day, cnt, med,
        |    list_sort(list_transform(win, x -> abs(x - med)))[4] AS mad
        |  FROM m)
        |SELECT event_type, day, CAST(cnt AS BIGINT) AS cnt,
        |  CAST(med AS BIGINT) AS med, CAST(mad AS BIGINT) AS mad,
        |  abs(cnt - med) > 3 * mad AS is_outlier
        |FROM m2 ORDER BY event_type, day""".stripMargin,

    "q306_capture_recapture" ->
      s"""WITH base AS (
         |  SELECT doc_id, $dupLabSql AS a, md5(text) AS fp
         |  FROM documents),
         |fpc AS (SELECT fp, COUNT(*) AS c FROM base GROUP BY 1),
         |flags AS (
         |  SELECT b.a, CASE WHEN f.c > 1 THEN 1 ELSE 0 END AS b
         |  FROM base b JOIN fpc f ON f.fp = b.fp),
         |g AS (
         |  SELECT COUNT(*) AS n_docs, SUM(a) AS n_a, SUM(b) AS n_b,
         |    SUM(a * b) AS n_both, SUM(GREATEST(a, b)) AS n_any
         |  FROM flags),
         |e AS (
         |  SELECT n_docs, n_a, n_b, n_both, n_any,
         |    ROUND((n_a + 1) * (n_b + 1) / CAST(n_both + 1 AS DOUBLE) - 1,
         |      6) AS chapman_est,
         |    ROUND(SQRT(CAST((n_a + 1) * (n_b + 1) AS DOUBLE)
         |      * (n_a - n_both) * (n_b - n_both)
         |      / (CAST(n_both + 1 AS DOUBLE) * (n_both + 1)
         |         * (n_both + 2))), 6) AS se
         |  FROM g)
         |SELECT CAST(n_docs AS BIGINT) AS n_docs,
         |  CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
         |  CAST(n_both AS BIGINT) AS n_both, CAST(n_any AS BIGINT) AS n_any,
         |  chapman_est, se,
         |  ROUND(chapman_est - 1.96 * se, 6) AS ci_lo,
         |  ROUND(chapman_est + 1.96 * se, 6) AS ci_hi
         |FROM e""".stripMargin,

    "q307_rfm_segments" ->
      s"""WITH p AS (
         |  SELECT user_id, epoch_ns(ts)//1000 // 86400000000 AS day,
         |    CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
         |  FROM events WHERE event_type = 'purchase'),
         |ld AS (SELECT MAX(day) AS last_day FROM p),
         |u AS (
         |  SELECT user_id, ld.last_day - MAX(day) AS rec,
         |    COUNT(*) AS f, SUM(cents) AS mon
         |  FROM p, ld GROUP BY user_id, ld.last_day),
         |nn AS (SELECT COUNT(*) AS n FROM u),
         |ks(k) AS (VALUES (1), (2), (3), (4)),
         |rg AS (SELECT rec AS v, COUNT(*) AS c FROM u GROUP BY 1),
         |rc AS (SELECT v, SUM(c) OVER (ORDER BY v) AS cc FROM rg),
         |rt AS (SELECT ks.k, MIN(rc.v) AS t FROM rc, nn, ks
         |       WHERE rc.cc >= (ks.k * nn.n + 4) // 5 GROUP BY 1),
         |fg AS (SELECT f AS v, COUNT(*) AS c FROM u GROUP BY 1),
         |fc AS (SELECT v, SUM(c) OVER (ORDER BY v) AS cc FROM fg),
         |ft AS (SELECT ks.k, MIN(fc.v) AS t FROM fc, nn, ks
         |       WHERE fc.cc >= (ks.k * nn.n + 4) // 5 GROUP BY 1),
         |mg AS (SELECT mon AS v, COUNT(*) AS c FROM u GROUP BY 1),
         |mc AS (SELECT v, SUM(c) OVER (ORDER BY v) AS cc FROM mg),
         |mt AS (SELECT ks.k, MIN(mc.v) AS t FROM mc, nn, ks
         |       WHERE mc.cc >= (ks.k * nn.n + 4) // 5 GROUP BY 1),
         |coded AS (
         |  SELECT u.user_id, u.mon,
         |    CAST(1 + (SELECT COUNT(*) FROM rt WHERE u.rec > rt.t) AS INT)
         |      AS r_code,
         |    CAST(1 + (SELECT COUNT(*) FROM ft WHERE u.f > ft.t) AS INT)
         |      AS f_code,
         |    CAST(1 + (SELECT COUNT(*) FROM mt WHERE u.mon > mt.t) AS INT)
         |      AS m_code
         |  FROM u)
         |SELECT r_code, f_code, m_code,
         |  CAST(COUNT(*) AS BIGINT) AS n_users,
         |  ROUND(CAST(SUM(mon) AS DOUBLE) / COUNT(*) / 100.0, 6)
         |    AS avg_monetary
         |FROM coded GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

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
