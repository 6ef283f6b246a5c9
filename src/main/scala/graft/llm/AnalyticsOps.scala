package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{QueryModule, Tables}

/** Event-path / co-occurrence / interval analytics: the peak-load,
  * attribution and co-occurrence primitives of a product-analytics
  * warehouse, plus consumers of the dedup family's staged candidate
  * pairs. Same exactness discipline as the rest of the registry:
  * corpus passes reduce to bounded grids or per-key (user/doc)
  * partitions, sequential logic runs as folds over calendar/bucket
  * grids, credits and scores are exact integers until one final
  * rounded division.
  */
object AnalyticsOps extends QueryModule {

  /** q322's candidate LSH configurations and the S-curve collision
    * probability 1 − (1 − θʳ)ᵇ spelled as EXPLICIT multiplication
    * chains (power-by-squaring with a fixed association order):
    * libm/Java `pow` are not correctly-rounded and may disagree by an
    * ulp, but a literal product chain is plain IEEE arithmetic both
    * engines execute identically. Shared verbatim by the DataFrame
    * expression and the DuckDB twin.
    */
  private[llm] val lshGrid: Seq[(Int, Int)] =
    Seq((4, 4), (8, 4), (16, 4), (32, 4), (8, 8), (16, 8), (32, 8), (64, 2))

  private[llm] def sCurveSql(theta: String, b: Int, r: Int): String = {
    def chain(base: String, n: Int): String = {
      // power by squaring with explicit parens: same tree both engines
      require(n >= 1)
      if (n == 1) base
      else if (n % 2 == 0) { val h = chain(base, n / 2); s"($h * $h)" }
      else { val h = chain(base, n - 1); s"($h * $base)" }
    }
    // both engines parse bare numeric literals as DECIMAL — the chain
    // must run in DOUBLE (Spark would silently truncate precision,
    // DuckDB errors past scale 38)
    val tr = chain(s"(CAST($theta AS DOUBLE))", r) // θ^r
    val u = s"(1.0 - $tr)"             // 1 − θ^r
    s"(1.0 - ${chain(u, b)})"          // 1 − (1 − θ^r)^b
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // MinHash-LSH PARAMETER PLANNER (the (bands, rows) S-curve design
    // table of Leskovec–Rajaraman–Ullman ch.3, §3.4): for each
    // candidate (b, r) with b·r ≤ 256, the collision probability
    // 1 − (1−θʳ)ᵇ at the design points θ ∈ {0.5, 0.7, 0.9} — spelled
    // as explicit multiplication chains so both engines compute
    // identical doubles (pow is not correctly-rounded) — plus the
    // EXPECTED RECALL against the corpus's OBSERVED near-dup jaccard
    // distribution (the staged θ=0.7 pair histogram in 0.05 bins,
    // q279's zero-discovery-cost consumption), each bin contribution
    // rounded once and totalized in DECIMAL. The chosen config
    // maximizes micro-unit recall@observed − fp@0.5 in exact integer
    // arithmetic (b asc, r asc ties).
    "q322_lsh_planner" -> ((s, d) => {
      val pairs = Dedup.prefixJaccardPairs(s, d, "0.7")
      val hist = pairs
        .groupBy(expr("CAST(FLOOR((jac - 0.7) / 0.05) AS INT)").as("bin"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("mid", expr("0.725 + 0.05 * bin"))
        .localCheckpoint() // ≤7-bin histogram
      val tot = hist.agg(sum(col("cnt")).as("tc"))
      val rows = lshGrid.map { case (b, r) =>
        val p5 = sCurveSql("0.5", b, r)
        val p7 = sCurveSql("0.7", b, r)
        val p9 = sCurveSql("0.9", b, r)
        // recall against the observed histogram: per-bin S-curve at
        // the bin midpoint (mid is data-independent: 0.725 + 0.05·bin)
        val pm = sCurveSql("mid", b, r)
        hist.crossJoin(broadcast(tot))
          .agg(sum(expr(
            s"""CAST(ROUND($pm * cnt / tc, 6) AS DECIMAL(18,6))"""))
            .as("recall6"))
          .select(lit(b).as("bands"), lit(r).as("rows_per_band"),
            lit(b * r).as("signature_len"),
            round(expr(p5), 6).as("p_at_05"),
            round(expr(p7), 6).as("p_at_07"),
            round(expr(p9), 6).as("p_at_09"),
            col("recall6").cast("double").as("recall_observed"))
      }
      // utility in exact micro ints: round(recall·1e6) − round(p@0.5·1e6)
      val scored = rows.reduce(_ unionByName _)
        .withColumn("util", expr(
          """CAST(ROUND(recall_observed * 1000000, 0) AS BIGINT)
            | - CAST(ROUND(p_at_05 * 1000000, 0) AS BIGINT)""".stripMargin))
        .localCheckpoint() // 8 config rows
      val best = scored.agg(max(struct(col("util"),
        (-col("bands")).as("nb"), (-col("rows_per_band")).as("nr")))
        .as("b"))
      scored.crossJoin(broadcast(best))
        .withColumn("chosen",
          col("util") === col("b.util") &&
            col("bands") === -col("b.nb") &&
            col("rows_per_band") === -col("b.nr"))
        .drop("b")
        .orderBy(col("bands"), col("rows_per_band"))
    }),

    // PEAK CONCURRENCY (interval max-overlap): how many 30-minute
    // event windows are simultaneously open, per type, and when the
    // peak happens — the capacity-planning sweep (the classic +1/−1
    // boundary scan) restated for a cluster: a global ordered scan
    // would be one task, so the sweep is TWO-PHASE (q202's ranking
    // discipline): boundaries hash into 16 time-range buckets, the
    // running sum is a window partitioned by (type, bucket) — a
    // scale-following partition — and the cross-bucket carry is a
    // fold over the 16-row-per-type bucket grid. End boundaries sort
    // before starts at equal timestamps (closed-open intervals), so
    // the count is exact; the peak instant is the EARLIEST boundary
    // achieving the global max (integer argmin over one filtered
    // pass).
    "q311_peak_concurrency" -> ((s, d) => {
      val dur = 1800000000L // 30 min in µs
      val ev = Tables.eventsUs(s, d)
      val bounds = ev.select(col("event_type"), explode(array(
          struct(col("ts_us").as("t"), lit(1L).as("delta")),
          struct((col("ts_us") + dur).as("t"), lit(-1L).as("delta"))))
          .as("b"))
        .select(col("event_type"), col("b.t").as("t"),
          col("b.delta").as("delta"))
      val rng = ev.agg(min(col("ts_us")).as("lo"),
        (max(col("ts_us")) + dur + 1L).as("hi"))
      val bucketed = bounds.crossJoin(broadcast(rng))
        .withColumn("bkt",
          expr("CAST((t - lo) * 16 DIV (hi - lo) AS INT)"))
      val w = Window.partitionBy(col("event_type"), col("bkt"))
        .orderBy(col("t"), col("delta"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val run = bucketed.withColumn("run", sum(col("delta")).over(w))
        .localCheckpoint() // window result reused by grid + argmin pass
      val grid = run.groupBy(col("event_type"), col("bkt"))
        .agg(sum(col("delta")).as("tot"), max(col("run")).as("mx"))
      // carry = Σ totals of preceding buckets; per-type global peak
      val peaks = grid.groupBy(col("event_type"))
        .agg(sort_array(collect_list(
          struct(col("bkt"), col("tot"), col("mx")))).as("g"))
        .withColumn("peak", expr(
          """aggregate(g, named_struct('carry', 0L, 'pk', 0L),
            |  (a, x) -> named_struct(
            |    'carry', a.carry + x.tot,
            |    'pk', greatest(a.pk, a.carry + x.mx)),
            |  a -> a.pk)""".stripMargin))
        .withColumn("carries", expr(
          """aggregate(g, named_struct('carry', 0L,
            |    'm', map(-1, 0L)),
            |  (a, x) -> named_struct(
            |    'carry', a.carry + x.tot,
            |    'm', map_concat(a.m, map(x.bkt, a.carry))),
            |  a -> a.m)""".stripMargin))
        .select(col("event_type"), col("peak"), col("carries"))
      val peakT = run
        .join(broadcast(peaks), "event_type")
        .filter(col("run") + expr("element_at(carries, bkt)") ===
          col("peak"))
        .groupBy(col("event_type"), col("peak"))
        .agg(min(col("t")).as("peak_t"))
      val nEv = ev.groupBy(col("event_type")).agg(count(lit(1)).as("n_events"))
      peakT.join(nEv, "event_type")
        .select(col("event_type"), col("n_events"),
          col("peak").as("peak_concurrency"), col("peak_t"))
        .orderBy(col("event_type"))
    }),

    // WHAT-IF FILTER IMPACT simulation — the curation-planning table
    // computed BEFORE committing to a quality threshold: for each
    // candidate stopword-score cutoff t (keep docs with sm ≤ t), the
    // surviving doc/token counts and the L1 shift of the LANGUAGE MIX
    // vs the unfiltered corpus (the collateral a filter inflicts on
    // low-resource languages is usually the deciding factor). One
    // corpus pass to the (score, lang) value grid; the nine rungs
    // fold over that bounded grid; mix shares round once to 6dp and
    // the L1 totalizes those settled decimals per rung.
    "q328_filter_whatif" -> ((s, d) => {
      val ts = TextAnalysis.tokens(col("text"))
      val grid = Tables.documents(s, d)
        .withColumn("n_tok", size(ts))
        .filter(col("n_tok") > 0)
        .withColumn("stop_cnt", size(filter(ts,
          t => t.isin(TextAnalysis.Stopwords: _*))))
        .select(expr("CAST((1000 * stop_cnt) DIV n_tok AS INT)").as("sm"),
          col("lang"), col("n_tok"))
        .groupBy(col("sm"), col("lang"))
        .agg(count(lit(1)).as("nd"), sum(col("n_tok")).as("nt"))
      grid
        .agg(collect_list(struct(col("sm"), col("lang"), col("nd"),
            col("nt"))).as("g"),
          sum(col("nd")).as("td"), sum(col("nt")).as("tt"))
        .withColumn("langs", expr(
          "array_sort(array_distinct(transform(g, x -> x.lang)))"))
        .select(col("td"), col("tt"), posexplode(expr(
          """transform(sequence(1, 9), k -> named_struct(
            |  'thr', k * 100,
            |  'nd', aggregate(filter(g, x -> x.sm <= k * 100), 0L,
            |    (a, x) -> a + x.nd),
            |  'nt', aggregate(filter(g, x -> x.sm <= k * 100), 0L,
            |    (a, x) -> a + x.nt),
            |  'l1', aggregate(langs, CAST(0 AS DECIMAL(18,6)),
            |    (a, l) -> CAST(a + abs(
            |      CAST(ROUND(CAST(aggregate(
            |        filter(g, x -> x.sm <= k * 100 AND x.lang = l), 0L,
            |        (b, x) -> b + x.nt) AS DOUBLE)
            |        / aggregate(filter(g, x -> x.sm <= k * 100), 0L,
            |            (b, x) -> b + x.nt), 6) AS DECIMAL(12,6))
            |      - CAST(ROUND(CAST(aggregate(
            |          filter(g, x -> x.lang = l), 0L,
            |          (b, x) -> b + x.nt) AS DOUBLE) / tt, 6)
            |        AS DECIMAL(12,6))) AS DECIMAL(18,6)))))"""
            .stripMargin)))
        .select(expr("col.thr").cast("int").as("threshold"),
          expr("col.nd").as("n_docs"), expr("col.nt").as("n_tokens"),
          round(expr("col.nd").cast("double") / col("td"), 6)
            .as("frac_docs"),
          expr("CAST(col.l1 AS DOUBLE)").as("l1_mix_shift"))
        .orderBy(col("threshold"))
    }),

    // CUPED variance reduction (Deng et al. 2013 — the pre-experiment
    // covariate adjustment every mature experimentation platform
    // applies): pre-period spend X (first calendar half) adjusts
    // post-period spend Y, θ = cov(X,Y)/var(X) from EXACT integer
    // cents sufficient statistics (one per-user pass, map-side
    // combinable), adjusted means on 6dp-settled values, and the
    // variance-reduction factor ρ² = cov²/(varX·varY) — the whole
    // query is integer algebra until four documented 6dp rounds.
    "q329_cuped" -> ((s, d) => {
      val ev = Tables.eventsUs(s, d)
        .select(col("user_id"), expr("ts_us div 86400000000").as("day"),
          expr("CAST(ROUND(value * 100, 0) AS BIGINT)").as("cents"))
      val d0 = ev.agg(min(col("day")).as("d0"))
      val users = ev.crossJoin(broadcast(d0))
        .groupBy(col("user_id"))
        .agg(sum(when(col("day") - col("d0") < 15, col("cents"))
            .otherwise(0L)).as("x"),
          sum(when(col("day") - col("d0") >= 15, col("cents"))
            .otherwise(0L)).as("y"))
        .withColumn("v", (col("user_id") % 2).cast("int"))
        .localCheckpoint() // user-bounded; one corpus pass
      val g = users.agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        // the n·Σ products approach 2⁶³ at larger SFs — compute the
        // covariance algebra in DOUBLE from the exact integer sums
        // (identical expression trees both engines; no pow(), an
        // explicit square — pow is not correctly rounded)
        .withColumn("numd", expr(
          "CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy"))
        .withColumn("dx", expr(
          "CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx"))
        .withColumn("dy", expr(
          "CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy"))
        .withColumn("theta", expr("ROUND(numd / dx, 6)"))
        .withColumn("rho2", expr("ROUND(numd * numd / (dx * dy), 6)"))
        .withColumn("xbar", expr("ROUND(CAST(sx AS DOUBLE) / n, 6)"))
      val arms = users.groupBy(col("v"))
        .agg(count(lit(1)).as("n_v"), sum(col("x")).as("sx_v"),
          sum(col("y")).as("sy_v"))
        .withColumn("ybar", expr("ROUND(CAST(sy_v AS DOUBLE) / n_v, 6)"))
        .withColumn("xbar_v", expr("ROUND(CAST(sx_v AS DOUBLE) / n_v, 6)"))
      arms.crossJoin(broadcast(g.select(col("theta"), col("rho2"),
          col("xbar"))))
        .withColumn("ybar_cuped",
          expr("ROUND(ybar - theta * (xbar_v - xbar), 6)"))
        .select(col("v").as("variant"), col("n_v").as("n_users"),
          col("ybar").as("mean_post_cents"),
          col("xbar_v").as("mean_pre_cents"),
          col("ybar_cuped").as("mean_cuped_cents"),
          col("theta"), col("rho2").as("variance_reduction"))
        .orderBy(col("variant"))
    }),

    // Negative-binomial overdispersion fit (method of moments) on the
    // per-type daily counts — the distributional follow-up to q310's
    // spike filter and q320's burstiness: a Poisson ingest has
    // var ≈ mean; real traffic is overdispersed, and r = m²/(v−m),
    // p = m/v parameterize the NB a capacity model should use. The
    // OVERDISPERSION VERDICT is decided in EXACT INTEGERS
    // (n·Σx² − (Σx)² > (n−1)·Σx ⇔ v > m — cross-multiplied, no float
    // can flip it); m, v, r, p are single rounded expressions of the
    // same sufficient statistics. One corpus pass to the day grid.
    "q330_negbin_fit" -> ((s, d) => {
      Tables.eventsUs(s, d)
        .select(col("event_type"), expr("ts_us div 86400000000").as("day"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("x"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("x") * col("x")).as("sxx"))
        .withColumn("overdispersed",
          expr("n * sxx - sx * sx > (n - 1) * sx"))
        .withColumn("mean_", expr("ROUND(CAST(sx AS DOUBLE) / n, 6)"))
        .withColumn("var_", expr(
          """ROUND(CAST(n * sxx - sx * sx AS DOUBLE)
            |  / (CAST(n AS DOUBLE) * (n - 1)), 6)""".stripMargin))
        .withColumn("dispersion", expr(
          """ROUND(CAST(n * sxx - sx * sx AS DOUBLE) * n
            |  / (CAST(n AS DOUBLE) * (n - 1) * sx), 6)""".stripMargin))
        .withColumn("nb_r", expr(
          """CASE WHEN overdispersed THEN
            |  ROUND(CAST(sx AS DOUBLE) * sx /
            |    (CAST(n AS DOUBLE) * n) /
            |    (CAST(n * sxx - sx * sx AS DOUBLE)
            |      / (CAST(n AS DOUBLE) * (n - 1))
            |     - CAST(sx AS DOUBLE) / n), 6)
            |END""".stripMargin))
        .withColumn("nb_p", expr(
          """CASE WHEN overdispersed THEN
            |  ROUND((CAST(sx AS DOUBLE) / n) /
            |    (CAST(n * sxx - sx * sx AS DOUBLE)
            |      / (CAST(n AS DOUBLE) * (n - 1))), 6)
            |END""".stripMargin))
        .select(col("event_type"), col("n").cast("int").as("n_days"),
          col("mean_").as("mean"), col("var_").as("variance"),
          col("dispersion"), col("overdispersed"),
          col("nb_r"), col("nb_p"))
        .orderBy(col("event_type"))
    }),

    // JOIN-KEY SKEW PROFILER — the pre-flight diagnostic behind
    // q52's salted join and q191's AQE rescue: for each join key the
    // pipeline shuffles on, the frequency distribution's shape (max /
    // p50 / p99 frequency by EXACT rank over the frequency-value
    // grid), the skew ratio vs the mean, and the integer salting
    // factor that would cap the biggest key at ~4× an average
    // partition share: salt = ⌈max_freq·n_keys / (4·n_rows)⌉. One
    // count pass per audited key, then grid-bounded rank folds — the
    // profile a planner consults BEFORE choosing broadcast / salt /
    // AQE at 100 TB.
    "q323_skew_profiler" -> ((s, d) => {
      def profile(keyName: String, df: DataFrame): DataFrame = {
        val freq = df.groupBy(col("k")).agg(count(lit(1)).as("f"))
        freq.groupBy(col("f")).agg(count(lit(1)).as("nk"))
          .agg(sort_array(collect_list(struct(col("f"), col("nk"))))
            .as("a"), sum(col("nk")).as("keys"),
            sum(col("f") * col("nk")).as("rows"), max(col("f")).as("mx"))
          .withColumn("p50", expr(
            """aggregate(a, named_struct('cum', 0L, 'q', CAST(NULL AS BIGINT)),
              |  (acc, x) -> named_struct('cum', acc.cum + x.nk,
              |    'q', CASE WHEN acc.q IS NULL
              |      AND acc.cum + x.nk >= (keys + 1) DIV 2
              |      THEN x.f ELSE acc.q END),
              |  acc -> acc.q)""".stripMargin))
          .withColumn("p99", expr(
            """aggregate(a, named_struct('cum', 0L, 'q', CAST(NULL AS BIGINT)),
              |  (acc, x) -> named_struct('cum', acc.cum + x.nk,
              |    'q', CASE WHEN acc.q IS NULL
              |      AND acc.cum + x.nk >= (99 * keys + 99) DIV 100
              |      THEN x.f ELSE acc.q END),
              |  acc -> acc.q)""".stripMargin))
          .select(lit(keyName).as("join_key"), col("rows").as("n_rows"),
            col("keys").as("n_keys"), col("mx").as("max_freq"),
            col("p50").as("p50_freq"), col("p99").as("p99_freq"),
            round(col("mx").cast("double") * col("keys") / col("rows"), 6)
              .as("skew_ratio"),
            expr("(mx * keys + 4 * rows - 1) DIV (4 * rows)")
              .as("recommended_salt"))
      }
      profile("lineitem.l_orderkey",
          Tables.lineitem(s, d).select(col("l_orderkey").as("k")))
        .unionByName(profile("events.user_id",
          Tables.events(s, d).select(col("user_id").as("k"))))
        .unionByName(profile("documents.source",
          Tables.documents(s, d).select(col("source").cast("string")
            .as("k"))))
        .orderBy(col("join_key"))
    }),

    // K-step ABSORPTION PROBABILITY into 'purchase' (the finite-
    // horizon absorbing-chain readout on q207/q317's transition
    // matrix — "what fraction of users in state s convert within k
    // steps"): purchase made absorbing, vₖ(i) = p(i,abs) +
    // Σ_{j≠abs} p(i,j)·vₖ₋₁(j), four unrolled steps with the q288
    // fixed-point discipline — transition probabilities rounded ONCE
    // to 6dp decimals, every step's products exact decimals summed
    // exactly and rounded back to 6dp, so the recursion is
    // bit-identical to the oracle's four unrolled join-CTEs. The
    // |types|²-grid is the only state; corpus work is q317's one
    // lead() pass.
    "q324_markov_absorption" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      val trans = Tables.eventsUs(s, d)
        .select(col("user_id"), col("event_id"), col("ts_us"),
          col("event_type"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type"), col("next_type"))
        .agg(count(lit(1)).as("nij"))
        .localCheckpoint()
      val ni = trans.groupBy(col("event_type")).agg(sum(col("nij")).as("ni"))
      val probs = trans.join(broadcast(ni), "event_type")
        .withColumn("p6", expr(
          "CAST(ROUND(CAST(nij AS DOUBLE) / ni, 6) AS DECIMAL(12,6))"))
        .select(col("event_type").as("i"), col("next_type").as("j"),
          col("p6"))
      val folded = probs
        .agg(collect_list(struct(col("i"), col("j"), col("p6"))).as("m"))
        .withColumn("states", expr(
          "array_sort(array_distinct(transform(m, x -> x.i)))"))
        // v1(i) = p(i, purchase); v_{k+1}(i) = p(i,abs) + Σ_{j≠abs} p(i,j)·v_k(j)
        .withColumn("v1", expr(
          """transform(states, s -> named_struct('s', s, 'v',
            |  CAST(coalesce(
            |    element_at(map_from_entries(transform(
            |      filter(m, x -> x.i = s AND x.j = 'purchase'),
            |      x -> struct(x.i, x.p6))), s),
            |    CAST(0 AS DECIMAL(12,6))) AS DECIMAL(12,6))))""".stripMargin))
      def step(prev: String) = expr(
        s"""transform(states, s -> named_struct('s', s, 'v',
           |  CAST(ROUND(CAST(
           |    coalesce(element_at(map_from_entries(transform(
           |      filter(m, x -> x.i = s AND x.j = 'purchase'),
           |      x -> struct(x.i, x.p6))), s), CAST(0 AS DECIMAL(12,6)))
           |    + aggregate(
           |        filter(m, x -> x.i = s AND x.j <> 'purchase'),
           |        CAST(0 AS DECIMAL(28,12)),
           |        (acc, x) -> CAST(acc + x.p6 * coalesce(
           |          element_at(map_from_entries(transform($prev,
           |            y -> struct(y.s, y.v))), x.j),
           |          CAST(0 AS DECIMAL(12,6))) AS DECIMAL(28,12)))
           |   AS DOUBLE), 6) AS DECIMAL(12,6))))""".stripMargin)
      folded
        .withColumn("v2", step("v1"))
        .withColumn("v3", step("v2"))
        .withColumn("v4", step("v3"))
        .select(explode(expr(
          """transform(states, s -> named_struct('state', s,
            |  'p1', element_at(map_from_entries(transform(v1,
            |    y -> struct(y.s, y.v))), s),
            |  'p2', element_at(map_from_entries(transform(v2,
            |    y -> struct(y.s, y.v))), s),
            |  'p3', element_at(map_from_entries(transform(v3,
            |    y -> struct(y.s, y.v))), s),
            |  'p4', element_at(map_from_entries(transform(v4,
            |    y -> struct(y.s, y.v))), s)))""".stripMargin)).as("r"))
        .select(col("r.state").as("state"),
          col("r.p1").cast("double").as("p_absorb_1"),
          col("r.p2").cast("double").as("p_absorb_2"),
          col("r.p3").cast("double").as("p_absorb_3"),
          col("r.p4").cast("double").as("p_absorb_4"))
        .orderBy(col("state"))
    }),

    // Per-source BOXPLOT profile with exact Tukey fences (Tukey
    // 1977): q1/median/q3 of doc length by exact rank over the
    // value grid, IQR fences at ±1.5·IQR decided in DOUBLED integer
    // arithmetic (2x vs 2q1−3·IQR — 1.5·IQR is a half-integer, so
    // the ×2 spelling keeps the outlier test in pure BIGINTs), and
    // outlier counts per side — the data-profile table every
    // ingest QA run prints; one corpus pass to the per-source value
    // grids.
    "q325_boxplot_profile" -> ((s, d) => {
      val g = Tables.documents(s, d)
        .groupBy(col("source"), col("n_chars"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint()
      def rank(k: String) =
        s"""aggregate(a, named_struct('cum', 0L, 'q', CAST(NULL AS BIGINT)),
           |  (acc, x) -> named_struct('cum', acc.cum + x.c,
           |    'q', CASE WHEN acc.q IS NULL AND acc.cum + x.c >= $k
           |      THEN x.n_chars ELSE acc.q END),
           |  acc -> acc.q)""".stripMargin
      g.groupBy(col("source"))
        .agg(sort_array(collect_list(struct(col("n_chars"), col("c"))))
          .as("a"), sum(col("c")).as("n"))
        .withColumn("q1", expr(rank("(n + 3) DIV 4")))
        .withColumn("q2", expr(rank("(n + 1) DIV 2")))
        .withColumn("q3", expr(rank("(3 * n + 3) DIV 4")))
        .withColumn("iqr", col("q3") - col("q1"))
        // outliers: 2x < 2q1 − 3·IQR or 2x > 2q3 + 3·IQR (pure ints)
        .withColumn("lo_out", expr(
          """aggregate(a, 0L, (acc, x) -> acc +
            |  IF(2 * x.n_chars < 2 * q1 - 3 * iqr, x.c, 0L))""".stripMargin))
        .withColumn("hi_out", expr(
          """aggregate(a, 0L, (acc, x) -> acc +
            |  IF(2 * x.n_chars > 2 * q3 + 3 * iqr, x.c, 0L))""".stripMargin))
        .select(col("source"), col("n"), col("q1"), col("q2"), col("q3"),
          col("iqr"), col("lo_out").as("n_low_outliers"),
          col("hi_out").as("n_high_outliers"))
        .orderBy(col("source"))
    }),

    // Markov ENTROPY RATE of user event sequences (Shannon 1948;
    // Song et al. 2010's predictability framing) — how predictable
    // the next event type is given the current one, the information-
    // theoretic summary sitting on top of q207's transition counts:
    // H = Σᵢⱼ (nᵢⱼ/N)·(−ln(nᵢⱼ/nᵢ·)) over the |types|²-bounded
    // transition grid, every term a round-once 6dp decimal totalized
    // in DECIMAL (q276's rule); per-state rows carry each row
    // distribution's entropy; the predictability ratio divides by
    // ln|types| once. Transitions order inside per-user windows.
    "q317_entropy_rate" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      val trans = Tables.eventsUs(s, d)
        .select(col("user_id"), col("event_id"), col("ts_us"),
          col("event_type"))
        .withColumn("next_type", lead(col("event_type"), 1).over(w))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type"), col("next_type"))
        .agg(count(lit(1)).as("nij"))
        .localCheckpoint() // |types|²-bounded
      val ni = trans.groupBy(col("event_type")).agg(sum(col("nij")).as("ni"))
      val tot = trans.agg(sum(col("nij")).as("nn"),
        count_distinct(col("event_type")).as("states"))
      val terms = trans.join(broadcast(ni), "event_type")
        .crossJoin(broadcast(tot))
        // joint term for the rate; conditional term for the row entropy
        .withColumn("jt6", expr(
          """CAST(ROUND((CAST(nij AS DOUBLE) / nn)
            |  * LN(CAST(nij AS DOUBLE) / ni), 6) AS DECIMAL(18,6))"""
            .stripMargin))
        .withColumn("ct6", expr(
          """CAST(ROUND((CAST(nij AS DOUBLE) / ni)
            |  * LN(CAST(nij AS DOUBLE) / ni), 6) AS DECIMAL(18,6))"""
            .stripMargin))
        .localCheckpoint() // |types|²-bounded; row + global folds share it
      val perState = terms.groupBy(col("event_type"))
        .agg(first(col("ni")).as("n_out"),
          (-sum(col("ct6"))).cast("double").as("h_row"))
      val g = terms.agg((-sum(col("jt6"))).as("hsum"),
          first(col("states")).as("st"))
        .select(col("hsum").cast("double").as("entropy_rate"),
          round(col("hsum").cast("double") /
            log(col("st").cast("double")), 6).as("predictability_ratio"))
      perState.crossJoin(broadcast(g))
        .select(col("event_type"), col("n_out"), col("h_row"),
          col("entropy_rate"), col("predictability_ratio"))
        .orderBy(col("event_type"))
    }),

    // Count-weighted (multiset) Jaccard RESCORING of the staged
    // near-dup candidates — a zero-discovery-cost consumer of the
    // θ=0.7 pair table (q279's staged-artifact pattern): shingle-set
    // Jaccard treats a token repeated 50× like one occurrence;
    // multiset overlap Σmin(cA,cB)/Σmax(cA,cB) re-scores each
    // candidate on exact integer token counts (one tokenize pass,
    // joins bounded by the PAIR table, never all-pairs), exposing
    // boilerplate-heavy pairs whose set-Jaccard overstated them.
    "q312_weighted_jaccard" -> ((s, d) => {
      val pairs = Dedup.prefixJaccardPairs(s, d, "0.7")
      val tokCnt = Tables.documents(s, d)
        .select(col("doc_id"),
          explode(TextAnalysis.tokens(col("text"))).as("tok"))
        .groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("c"))
        .localCheckpoint() // one tokenize pass shared by both join sides
      val tots = tokCnt.groupBy(col("doc_id")).agg(sum(col("c")).as("tot"))
      val inter = pairs
        .join(tokCnt.select(col("doc_id").as("doc_a"), col("tok"),
          col("c").as("ca")), Seq("doc_a"))
        .join(tokCnt.select(col("doc_id").as("doc_b"), col("tok"),
          col("c").as("cb")), Seq("doc_b", "tok"))
        .groupBy(col("doc_a"), col("doc_b"))
        .agg(sum(least(col("ca"), col("cb"))).as("iw"))
      pairs
        .join(inter, Seq("doc_a", "doc_b"), "left")
        .join(tots.select(col("doc_id").as("doc_a"), col("tot").as("ta")),
          "doc_a")
        .join(tots.select(col("doc_id").as("doc_b"), col("tot").as("tb")),
          "doc_b")
        .withColumn("iw2", coalesce(col("iw"), lit(0L)))
        .select(col("doc_a"), col("doc_b"), col("jac"),
          round(col("iw2").cast("double") /
            (col("ta") + col("tb") - col("iw2")), 6).as("wjac"))
        .withColumn("overstated", col("jac") - col("wjac") > 0.1)
        .orderBy(col("doc_a"), col("doc_b"))
    }),

    // Tiered-dedup REVIEW QUEUE with RESOURCE-ALLOCATION link
    // prediction (Zhou–Lü–Zhang, Eur. Phys. J. B 2009) — the triage
    // step of a two-threshold dedup pipeline: θ≥0.95 pairs auto-merge;
    // everything else with evidence lands in a ranked review queue.
    // Evidence is DIRECT (a θ=0.7 pair below the strict cut — its own
    // settled jac is the primary key) or INDIRECT (two-hop
    // connectivity in the θ=0.7 graph, scored by RA = Σ_w 1/deg(w)
    // over common neighbors — the link-prediction signal that
    // surfaces pairs the pairwise pass NEVER scored; a near-dup
    // Jaccard graph is close to transitive, so indirect-only entries
    // appear as the corpus and its dup clusters grow, while the
    // direct tier keeps the queue meaningful at any size). Both tiers
    // are FILTERS/joins of the one staged evidence table — no extra
    // corpus pass or pair join. RA is chosen over Adamic–Adar deliberately: 1/d is ONE
    // correctly-rounded IEEE division (bit-identical on both
    // engines), where AA's 1/ln(d) rides on a non-correctly-rounded
    // libm log — each contribution settles at 12dp into exact DECIMAL
    // and sums order-free. Wedge enumeration is center-keyed and
    // HUB-CAPPED at deg ≤ 64 (the standard LP sparsification: a
    // super-hub's per-neighbor contribution is ≤ 1/65 and its fan-out
    // quadratic — bounds the self-join at Σ min(deg,64)², q223's
    // posting-cap posture). Top-20 on the exact decimal, pair ties.
    "q337_link_prediction" -> ((s, d) => {
      val pairs = Dedup.prefixJaccardPairs(s, d, "0.7")
      val evid = pairs.select(col("doc_a").as("u"), col("doc_b").as("v"))
      val strict = pairs.filter(col("jac") >= 0.95)
        .select(col("doc_a").as("u"), col("doc_b").as("v"))
      val und = evid
        .unionAll(evid.select(col("v").as("u"), col("u").as("v")))
      val deg = und.groupBy(col("u").as("w")).agg(count(lit(1)).as("dw"))
      val undD = und.select(col("u").as("w"), col("v").as("n"))
        .join(deg.filter(col("dw") <= 64), "w")
      val cand = undD.select(col("w"), col("dw"), col("n").as("a"))
        .join(undD.select(col("w"), col("n").as("b")), Seq("w"))
        .filter(col("a") < col("b"))
      val wedgeScores = cand
        .join(strict.select(col("u").as("a"), col("v").as("b")),
          Seq("a", "b"), "left_anti")
        .groupBy(col("a"), col("b"))
        .agg(count(lit(1)).as("cn"),
          sum(expr("CAST(ROUND(CAST(1 AS DOUBLE) / dw, 12) " +
            "AS DECIMAL(16,12))")).as("ra"))
      val direct = pairs.filter(col("jac") < 0.95)
        .select(col("doc_a").as("a"), col("doc_b").as("b"),
          col("jac").as("direct_jac"))
      wedgeScores.join(direct, Seq("a", "b"), "full_outer")
        .select(col("a").as("doc_u"), col("b").as("doc_v"),
          col("direct_jac"),
          coalesce(col("cn"), lit(0L)).as("common_neighbors"),
          coalesce(col("ra"),
            expr("CAST(0 AS DECIMAL(16,12))")).as("rad"))
        .orderBy(coalesce(col("direct_jac"), lit(0.0)).desc,
          col("rad").desc, col("doc_u"), col("doc_v"))
        .limit(20)
        .select(col("doc_u"), col("doc_v"), col("direct_jac"),
          col("common_neighbors"),
          col("rad").cast("double").as("ra_score"))
    }),

    // Spectral-radius bracketing of the dup graph via two EXACT
    // INTEGER power-iteration steps (x₁ = A·1 = degrees, x₂ = A·x₁ =
    // neighbor-degree sums) — the connectivity gauge behind
    // label-propagation/PageRank convergence budgeting (iteration
    // count scales with the spectral gap; λ₁ ≥ Rayleigh(x₁) =
    // x₁ᵀx₂/x₁ᵀx₁ ≥ avg degree, monotone in the step count). q260's
    // integer-matvec posture: each step is one shuffled groupBy over
    // the staged edge table, the quotients are DECIMAL(38,0)
    // cross-products with ONE division each at the output boundary —
    // no float ever iterates.
    "q343_spectral_radius" -> ((s, d) => {
      val dec = "decimal(38,0)"
      val edges = Dedup.prefixJaccardPairs(s, d, "0.7")
        .select(col("doc_a").as("u"), col("doc_b").as("v"))
      val und = edges
        .unionAll(edges.select(col("v").as("u"), col("u").as("v")))
      val x1 = und.groupBy(col("u")).agg(count(lit(1)).as("deg"))
      val x2 = und
        .join(x1.select(col("u").as("v"), col("deg").as("dv")), "v")
        .groupBy(col("u")).agg(sum(col("dv")).as("x2"))
      x1.join(x2, "u")
        .agg(count(lit(1)).as("n_nodes"), sum(col("deg")).as("twom"),
          max(col("deg")).as("max_deg"),
          sum(col("deg").cast(dec) * col("x2").cast(dec)).as("rn"),
          sum(col("deg").cast(dec) * col("deg").cast(dec)).as("rd"))
        .select(col("n_nodes").cast("int").as("n_nodes"),
          expr("twom div 2").as("n_edges"), col("max_deg"),
          round(col("twom").cast("double") /
            col("n_nodes").cast("double"), 6).as("avg_degree"),
          round(col("rn").cast("double") / col("rd").cast("double"), 6)
            .as("rayleigh_2"))
    }),

    // Skip-gram co-occurrence counts (window ±3, forward-counted) —
    // the word2vec/SGNS training-pair extraction (Mikolov et al.
    // 2013): per doc, (wᵢ, wᵢ₊ₖ) for k ∈ {1,2,3} via lead() over the
    // per-doc position window (doc_id partitions follow the data, no
    // fat window), one shuffle to the vocab²-bounded pair grid, PMI
    // from the same pass's unigram margins (6dp, q134's convention),
    // global top-30 by exact count (pair lexicographic tiebreak)
    // through the collect_top_k heap.
    "q313_skipgram_cooc" -> ((s, d) => {
      import graft.functions.exprs.graft_collect_top_k
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), posexplode(
          array_remove(split(lower(col("text")), "[^a-z]+"), "")))
        .toDF("doc_id", "pos", "w")
      val wnd = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
      val pairs = toks
        .select(col("w").as("wa"),
          lead(col("w"), 1).over(wnd).as("l1"),
          lead(col("w"), 2).over(wnd).as("l2"),
          lead(col("w"), 3).over(wnd).as("l3"))
        .select(col("wa"),
          explode(array(col("l1"), col("l2"), col("l3"))).as("wb"))
        .filter(col("wb").isNotNull)
        .groupBy(col("wa"), col("wb"))
        .agg(count(lit(1)).as("cnt"))
        .localCheckpoint() // vocab²-bounded; margins derive from it
      val ua = pairs.groupBy(col("wa")).agg(sum(col("cnt")).as("ca"))
      val ub = pairs.groupBy(col("wb")).agg(sum(col("cnt")).as("cb"))
      val tot = pairs.agg(sum(col("cnt")).as("tt"))
      pairs.join(ua, "wa").join(ub, "wb").crossJoin(broadcast(tot))
        .withColumn("pmi", round(log(
          (col("cnt").cast("double") * col("tt")) /
            (col("ca").cast("double") * col("cb"))), 6))
        .agg(graft_collect_top_k(
          struct(col("cnt"), col("wa"), col("wb"), col("pmi")), 30, false)
          .as("top"))
        .select(posexplode(sort_array(col("top"), asc = false)))
        .select((col("pos") + 1).cast("int").as("rn"),
          col("col.wa").as("wa"), col("col.wb").as("wb"),
          col("col.cnt").as("cnt"), col("col.pmi").as("pmi"))
        .orderBy(col("rn"))
    }),

    // Elkan–Noto positive-unlabeled class-prior estimate (Elkan &
    // Noto 2008, estimator e1): with only POSITIVE labels observable
    // (the ref carve's weak dup flags stand in for the hand-labeled
    // sample), c = E[s|labeled] on the labeled positives and
    // π̂ = E[s]/c on the unlabeled carve recover the true positive
    // fraction a PU classifier needs. Score = q229's per-mille
    // integer, so both expectations are exact integer sums divided
    // once; one corpus pass to the two (labeled?, Σsm, n) cells.
    "q314_pu_prior" -> ((s, d) => {
      val ts = TextAnalysis.tokens(col("text"))
      val base = Tables.documents(s, d)
        .withColumn("n_tok", size(ts))
        .filter(col("n_tok") > 0)
        .withColumn("stop_cnt", size(filter(ts,
          t => t.isin(TextAnalysis.Stopwords: _*))))
        .withColumn("lab", when(array_contains(ts, "dup") &&
          col("doc_id") % 2 === 0, 1L).otherwise(0L))
        .select(expr("CAST((1000 * stop_cnt) DIV n_tok AS INT)").as("sm"),
          col("lab"))
      base.agg(
          sum(when(col("lab") === 1, 1L).otherwise(0L)).as("n_lab"),
          sum(when(col("lab") === 1, col("sm").cast("long"))
            .otherwise(0L)).as("s_lab"),
          sum(when(col("lab") === 0, 1L).otherwise(0L)).as("n_unlab"),
          sum(when(col("lab") === 0, col("sm").cast("long"))
            .otherwise(0L)).as("s_unlab"))
        .withColumn("c_hat", expr(
          "ROUND(CAST(s_lab AS DOUBLE) / (1000.0 * n_lab), 6)"))
        .withColumn("e_unlab", expr(
          "ROUND(CAST(s_unlab AS DOUBLE) / (1000.0 * n_unlab), 6)"))
        .withColumn("pi_hat", expr(
          "ROUND(LEAST(e_unlab / c_hat, 1.0), 6)"))
    }),

    // Right-to-be-forgotten DELETION-CASCADE impact audit — the
    // blast-radius analysis a GDPR/CCPA erasure run computes BEFORE
    // touching data: tombstoned customers (key % 97, the q175 carve
    // convention) cascade through orders → lineitem; per relation,
    // rows deleted and fraction, plus the distinct suppliers whose
    // history the cascade touches. The tombstone and tombstoned-order
    // key sets broadcast (deletion lists are small by nature); each
    // child relation is ONE scan + broadcast semi-join — no shuffle
    // of the big tables at any scale.
    "q319_deletion_cascade" -> ((s, d) => {
      val tomb = Tables.customer(s, d)
        .filter(col("c_custkey") % 97 === 0).select(col("c_custkey"))
      val orders = Tables.orders(s, d)
      val delOrders = orders.join(broadcast(tomb),
        col("o_custkey") === col("c_custkey")).select(col("o_orderkey"))
        .localCheckpoint() // tombstone-bounded key list
      val li = Tables.lineitem(s, d)
        .join(broadcast(delOrders.withColumnRenamed("o_orderkey", "dk")),
          col("l_orderkey") === col("dk"), "left")
      val liAgg = li.agg(count(lit(1)).as("n_rows"),
        sum(when(col("dk").isNotNull, 1L).otherwise(0L)).as("n_deleted"),
        count_distinct(when(col("dk").isNotNull, col("l_suppkey")))
          .as("touched"))
      val custAgg = Tables.customer(s, d).agg(count(lit(1)).as("n_rows"),
        sum(when(col("c_custkey") % 97 === 0, 1L).otherwise(0L))
          .as("n_deleted"))
      val ordAgg = orders.join(broadcast(tomb),
          col("o_custkey") === col("c_custkey"), "left")
        .agg(count(lit(1)).as("n_rows"),
          sum(when(col("c_custkey").isNotNull, 1L).otherwise(0L))
            .as("n_deleted"))
      val rows = custAgg.select(lit("customer").as("relation"),
          col("n_rows"), col("n_deleted"), lit(0L).as("suppliers_touched"))
        .unionByName(ordAgg.select(lit("orders").as("relation"),
          col("n_rows"), col("n_deleted"), lit(0L).as("suppliers_touched")))
        .unionByName(liAgg.select(lit("lineitem").as("relation"),
          col("n_rows"), col("n_deleted"),
          col("touched").as("suppliers_touched")))
      rows.select(col("relation"), col("n_rows"), col("n_deleted"),
          round(col("n_deleted").cast("double") / col("n_rows"), 6)
            .as("frac_deleted"), col("suppliers_touched"))
        .orderBy(col("relation"))
    }),

    // Token BURSTINESS (Church & Gale 1995; the Fano factor /
    // index of dispersion): content words clump — a token appearing
    // 100× in one doc carries different signal than 100 docs × 1 —
    // and burstiness is what separates them. For the top-20 tokens by
    // exact total count: Fano = var/mean over PER-DOC counts
    // (zeros included via the sufficient-statistics identity:
    // N·Σc² − (Σc)² needs only the nonzero cells + the doc total),
    // an exact rational of one tokenize pass divided once.
    "q320_burstiness" -> ((s, d) => {
      import graft.functions.exprs.graft_collect_top_k
      val docsN = Tables.documents(s, d).agg(count(lit(1)).as("nd"))
      val cell = Tables.documents(s, d)
        .select(col("doc_id"),
          explode(TextAnalysis.tokens(col("text"))).as("tok"))
        .groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("c"))
      val stats = cell.groupBy(col("tok"))
        .agg(sum(col("c")).as("total"), count(lit(1)).as("n_with"),
          sum(col("c") * col("c")).as("ss"))
      stats.crossJoin(broadcast(docsN))
        .withColumn("fano", expr(
          """ROUND(CAST(nd * ss - total * total AS DOUBLE)
            |  / (CAST(nd - 1 AS DOUBLE) * total), 6)""".stripMargin))
        .agg(graft_collect_top_k(
          struct(col("total"), col("tok"), col("n_with"), col("fano")),
          20, false).as("top"))
        .select(posexplode(sort_array(col("top"), asc = false)))
        .select((col("pos") + 1).cast("int").as("rn"),
          col("col.tok").as("tok"), col("col.total").as("total"),
          col("col.n_with").as("n_docs_with"), col("col.fano").as("fano"),
          (col("col.fano") > 1.0).as("bursty"))
        .orderBy(col("rn"))
    }),

    // Multi-touch attribution comparison (the marketing-science
    // ladder: last-touch ≡ q242, first-touch, linear, U-shaped
    // 40/40/20) over each user's pre-conversion touch path. Credits
    // are EXACT micro-units summing to 10⁶ per conversion BY
    // CONSTRUCTION — integer division remainders are assigned by
    // documented rule (linear: first r touches; U-shaped: earliest
    // middles), so the cross-user credit totals are exact integers
    // and the one rounded division is each channel's share. Paths
    // order inside per-user windows (scale-following partitions);
    // one corpus pass + one (rule × channel)-bounded aggregation.
    "q315_multitouch_attribution" -> ((s, d) => {
      val ev = Tables.eventsUs(s, d)
      val firstPurchase = ev.filter(col("event_type") === "purchase")
        .groupBy(col("user_id")).agg(min(col("ts_us")).as("conv_ts"))
      val touches = ev.join(firstPurchase, "user_id")
        .filter(col("ts_us") < col("conv_ts") &&
          col("event_type") =!= "purchase")
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us"), col("event_id"))
      val pos = touches
        .select(col("user_id"), col("event_type"),
          row_number().over(w).as("i"),
          count(lit(1)).over(Window.partitionBy(col("user_id"))).as("n"))
      val credited = pos.select(col("event_type"), expr(
        """stack(4,
          |  'last_touch', IF(i = n, 1000000L, 0L),
          |  'first_touch', IF(i = 1, 1000000L, 0L),
          |  'linear', 1000000L DIV n + IF(i <= 1000000L % n, 1L, 0L),
          |  'u_shaped', CASE
          |    WHEN n = 1 THEN 1000000L
          |    WHEN n = 2 THEN 500000L
          |    WHEN i = 1 OR i = n THEN 400000L
          |    ELSE 200000L DIV (n - 2)
          |      + IF(i - 1 <= 200000L % (n - 2), 1L, 0L) END)
          |AS (rule, credit)""".stripMargin))
      val byRule = credited.groupBy(col("rule"), col("event_type"))
        .agg(sum(col("credit")).as("credit_micro"))
        .localCheckpoint() // (rule × channel)-bounded
      val ruleTot = byRule.groupBy(col("rule"))
        .agg(sum(col("credit_micro")).as("rt"))
      byRule.join(broadcast(ruleTot), "rule")
        .select(col("rule"), col("event_type").as("channel"),
          col("credit_micro"),
          round(col("credit_micro").cast("double") / col("rt"), 6)
            .as("share"))
        .orderBy(col("rule"), col("channel"))
    })
  )

  def oracle: Map[String, String] = Map(

    // q311: the oracle is the single global sweep (windows are free
    // in DuckDB); end-before-start via the (t, delta) sort key
    "q311_peak_concurrency" ->
      """WITH ev AS (
        |  SELECT event_type, epoch_ns(ts)//1000 AS t FROM events),
        |b AS (
        |  SELECT event_type, t, CAST(1 AS BIGINT) AS delta FROM ev
        |  UNION ALL
        |  SELECT event_type, t + 1800000000, CAST(-1 AS BIGINT) FROM ev),
        |r AS (
        |  SELECT event_type, t, delta,
        |    SUM(delta) OVER (PARTITION BY event_type
        |      ORDER BY t, delta
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
        |  FROM b),
        |p AS (
        |  SELECT event_type, MAX(run) AS peak FROM r GROUP BY 1),
        |pt AS (
        |  SELECT r.event_type, p.peak, MIN(r.t) AS peak_t
        |  FROM r JOIN p ON p.event_type = r.event_type
        |    AND r.run = p.peak
        |  GROUP BY 1, 2),
        |n AS (SELECT event_type, COUNT(*) AS n_events FROM ev GROUP BY 1)
        |SELECT pt.event_type, CAST(n.n_events AS BIGINT) AS n_events,
        |  CAST(pt.peak AS BIGINT) AS peak_concurrency, pt.peak_t
        |FROM pt JOIN n ON n.event_type = pt.event_type
        |ORDER BY pt.event_type""".stripMargin,

    "q312_weighted_jaccard" ->
      s"""${Dedup.prefixPairSqlCtes("0.7")},
         |p7 AS MATERIALIZED (
         |  SELECT doc_a, doc_b, jac FROM v WHERE jac >= 0.7),
         |tc AS (
         |  SELECT doc_id, tok, COUNT(*) AS c
         |  FROM (SELECT doc_id, unnest(${TextAnalysis.tokensSql}) AS tok
         |        FROM documents) z
         |  GROUP BY 1, 2),
         |tt AS (SELECT doc_id, SUM(c) AS tot FROM tc GROUP BY 1),
         |iw AS (
         |  SELECT p.doc_a, p.doc_b, SUM(LEAST(a.c, b.c)) AS iw
         |  FROM p7 p
         |  JOIN tc a ON a.doc_id = p.doc_a
         |  JOIN tc b ON b.doc_id = p.doc_b AND b.tok = a.tok
         |  GROUP BY 1, 2)
         |SELECT p.doc_a, p.doc_b, p.jac,
         |  ROUND(CAST(COALESCE(iw.iw, 0) AS DOUBLE) /
         |    (ta.tot + tb.tot - COALESCE(iw.iw, 0)), 6) AS wjac,
         |  p.jac - ROUND(CAST(COALESCE(iw.iw, 0) AS DOUBLE) /
         |    (ta.tot + tb.tot - COALESCE(iw.iw, 0)), 6) > 0.1 AS overstated
         |FROM p7 p
         |LEFT JOIN iw ON iw.doc_a = p.doc_a AND iw.doc_b = p.doc_b
         |JOIN tt ta ON ta.doc_id = p.doc_a
         |JOIN tt tb ON tb.doc_id = p.doc_b
         |ORDER BY p.doc_a, p.doc_b""".stripMargin,

    // q343: identical integer matvecs over the same pair CTEs
    "q343_spectral_radius" ->
      s"""${Dedup.prefixPairSqlCtes("0.7")},
         |p7 AS MATERIALIZED (
         |  SELECT doc_a AS u, doc_b AS v FROM v WHERE jac >= 0.7),
         |und AS (SELECT u, v FROM p7 UNION ALL SELECT v, u FROM p7),
         |x1 AS (SELECT u, COUNT(*) AS deg FROM und GROUP BY 1),
         |x2 AS (
         |  SELECT und.u, SUM(n.deg) AS x2
         |  FROM und JOIN x1 n ON n.u = und.v GROUP BY 1),
         |j AS (
         |  SELECT COUNT(*) AS n_nodes, SUM(x1.deg) AS twom,
         |    MAX(x1.deg) AS max_deg,
         |    SUM(CAST(x1.deg AS HUGEINT) * x2.x2) AS rn,
         |    SUM(CAST(x1.deg AS HUGEINT) * x1.deg) AS rd
         |  FROM x1 JOIN x2 ON x2.u = x1.u)
         |SELECT CAST(n_nodes AS INT) AS n_nodes,
         |  CAST(twom // 2 AS BIGINT) AS n_edges,
         |  CAST(max_deg AS BIGINT) AS max_deg,
         |  ROUND(CAST(twom AS DOUBLE) / CAST(n_nodes AS DOUBLE), 6)
         |    AS avg_degree,
         |  ROUND(CAST(rn AS DOUBLE) / CAST(rd AS DOUBLE), 6)
         |    AS rayleigh_2
         |FROM j""".stripMargin,

    // q337: same hub-capped wedge enumeration over the θ=0.7 evidence
    // tier, anti-joined against the strict θ≥0.95 tier (the same v
    // CTE filtered twice, exactly like the engine filters its one
    // staged table); 1/dw is one IEEE
    // division (bit-identical both engines) settled at 12dp into
    // exact DECIMAL before the order-free sum
    "q337_link_prediction" ->
      s"""${Dedup.prefixPairSqlCtes("0.7")},
         |p7 AS MATERIALIZED (
         |  SELECT doc_a AS u, doc_b AS v FROM v WHERE jac >= 0.7),
         |p9 AS (SELECT doc_a AS u, doc_b AS v FROM v WHERE jac >= 0.95),
         |und AS (SELECT u, v FROM p7 UNION ALL SELECT v, u FROM p7),
         |deg AS (SELECT u AS w, COUNT(*) AS dw FROM und GROUP BY 1),
         |undd AS (
         |  SELECT und.u AS w, deg.dw, und.v AS n
         |  FROM und JOIN deg ON deg.w = und.u WHERE deg.dw <= 64),
         |cand2 AS (
         |  SELECT a.w, a.dw, a.n AS a, b.n AS b
         |  FROM undd a JOIN undd b ON b.w = a.w AND a.n < b.n),
         |ne AS (
         |  SELECT c.a, c.b, c.dw FROM cand2 c
         |  LEFT JOIN p9 e ON e.u = c.a AND e.v = c.b
         |  WHERE e.u IS NULL),
         |sc AS (
         |  SELECT a, b, COUNT(*) AS cn,
         |    SUM(CAST(ROUND(CAST(1 AS DOUBLE) / dw, 12)
         |      AS DECIMAL(16,12))) AS ra
         |  FROM ne GROUP BY 1, 2),
         |direct AS (
         |  SELECT doc_a AS a, doc_b AS b, jac AS direct_jac
         |  FROM v WHERE jac >= 0.7 AND jac < 0.95),
         |queue AS (
         |  SELECT COALESCE(sc.a, direct.a) AS doc_u,
         |    COALESCE(sc.b, direct.b) AS doc_v,
         |    direct.direct_jac,
         |    COALESCE(sc.cn, 0) AS common_neighbors,
         |    COALESCE(sc.ra, CAST(0 AS DECIMAL(16,12))) AS rad
         |  FROM sc FULL OUTER JOIN direct
         |    ON direct.a = sc.a AND direct.b = sc.b)
         |SELECT doc_u, doc_v, direct_jac,
         |  CAST(common_neighbors AS BIGINT) AS common_neighbors,
         |  CAST(rad AS DOUBLE) AS ra_score
         |FROM queue
         |ORDER BY COALESCE(direct_jac, 0.0) DESC, rad DESC, doc_u, doc_v
         |LIMIT 20""".stripMargin,

    "q313_skipgram_cooc" ->
      """WITH toks AS (
        |  SELECT doc_id, p AS pos, w
        |  FROM (SELECT doc_id,
        |          unnest(list_filter(string_split_regex(lower(text),
        |            '[^a-z]+'), x -> x != '')) AS w,
        |          generate_subscripts(list_filter(string_split_regex(
        |            lower(text), '[^a-z]+'), x -> x != ''), 1) AS p
        |        FROM documents) z),
        |pairs AS (
        |  SELECT a.w AS wa, b.w AS wb, COUNT(*) AS cnt
        |  FROM toks a JOIN toks b
        |    ON b.doc_id = a.doc_id AND b.pos - a.pos BETWEEN 1 AND 3
        |  GROUP BY 1, 2),
        |ua AS (SELECT wa, SUM(cnt) AS ca FROM pairs GROUP BY 1),
        |ub AS (SELECT wb, SUM(cnt) AS cb FROM pairs GROUP BY 1),
        |tot AS (SELECT SUM(cnt) AS tt FROM pairs),
        |scored AS (
        |  SELECT p.wa, p.wb, p.cnt,
        |    ROUND(LN((CAST(p.cnt AS DOUBLE) * tot.tt) /
        |      (CAST(ua.ca AS DOUBLE) * ub.cb)), 6) AS pmi
        |  FROM pairs p
        |  JOIN ua ON ua.wa = p.wa JOIN ub ON ub.wb = p.wb, tot),
        |rk AS (
        |  SELECT wa, wb, cnt, pmi,
        |    ROW_NUMBER() OVER (ORDER BY cnt DESC, wa DESC, wb DESC) AS rn
        |  FROM scored)
        |SELECT CAST(rn AS INT) AS rn, wa, wb,
        |  CAST(cnt AS BIGINT) AS cnt, pmi
        |FROM rk WHERE rn <= 30 ORDER BY rn""".stripMargin,

    "q314_pu_prior" ->
      s"""WITH base AS (
         |  SELECT CAST((1000 * CAST(len(list_filter(ts,
         |      t -> list_contains(['the','a','of','and','to','in','is'], t)))
         |      AS BIGINT)) // len(ts) AS INT) AS sm,
         |    CASE WHEN list_contains(ts, 'dup') AND doc_id % 2 = 0
         |      THEN 1 ELSE 0 END AS lab
         |  FROM (SELECT doc_id, ${TextAnalysis.tokensSql} AS ts
         |        FROM documents) z
         |  WHERE len(ts) > 0),
         |g AS (
         |  SELECT SUM(CASE WHEN lab = 1 THEN 1 ELSE 0 END) AS n_lab,
         |    SUM(CASE WHEN lab = 1 THEN sm ELSE 0 END) AS s_lab,
         |    SUM(CASE WHEN lab = 0 THEN 1 ELSE 0 END) AS n_unlab,
         |    SUM(CASE WHEN lab = 0 THEN sm ELSE 0 END) AS s_unlab
         |  FROM base),
         |e AS (
         |  SELECT n_lab, s_lab, n_unlab, s_unlab,
         |    ROUND(CAST(s_lab AS DOUBLE) / (1000.0 * n_lab), 6) AS c_hat,
         |    ROUND(CAST(s_unlab AS DOUBLE) / (1000.0 * n_unlab), 6)
         |      AS e_unlab
         |  FROM g)
         |SELECT CAST(n_lab AS BIGINT) AS n_lab,
         |  CAST(s_lab AS BIGINT) AS s_lab,
         |  CAST(n_unlab AS BIGINT) AS n_unlab,
         |  CAST(s_unlab AS BIGINT) AS s_unlab,
         |  c_hat, e_unlab,
         |  ROUND(LEAST(e_unlab / c_hat, 1.0), 6) AS pi_hat
         |FROM e""".stripMargin,

    "q328_filter_whatif" ->
      s"""WITH base AS (
         |  SELECT CAST((1000 * CAST(len(list_filter(ts,
         |      t -> list_contains(['the','a','of','and','to','in','is'], t)))
         |      AS BIGINT)) // len(ts) AS INT) AS sm,
         |    lang, len(ts) AS n_tok
         |  FROM (SELECT lang, ${TextAnalysis.tokensSql} AS ts
         |        FROM documents) z
         |  WHERE len(ts) > 0),
         |grid AS (
         |  SELECT sm, lang, COUNT(*) AS nd, SUM(n_tok) AS nt
         |  FROM base GROUP BY 1, 2),
         |tot AS (SELECT SUM(nd) AS td, SUM(nt) AS tt FROM grid),
         |langs AS (SELECT DISTINCT lang FROM grid),
         |rungs AS (SELECT unnest(range(1, 10)) AS k),
         |ft AS (
         |  SELECT r.k, SUM(g.nd) AS nd, SUM(g.nt) AS nt
         |  FROM rungs r JOIN grid g ON g.sm <= r.k * 100 GROUP BY 1),
         |fl AS (
         |  SELECT r.k, l.lang, COALESCE(SUM(g.nt), 0) AS nt
         |  FROM rungs r CROSS JOIN langs l
         |  LEFT JOIN grid g ON g.sm <= r.k * 100 AND g.lang = l.lang
         |  GROUP BY 1, 2),
         |om AS (
         |  SELECT l.lang,
         |    CAST(ROUND(CAST(COALESCE(SUM(g.nt), 0) AS DOUBLE) / tot.tt,
         |      6) AS DECIMAL(12,6)) AS m
         |  FROM langs l LEFT JOIN grid g ON g.lang = l.lang, tot
         |  GROUP BY l.lang, tot.tt),
         |l1 AS (
         |  SELECT fl.k,
         |    CAST(SUM(ABS(
         |      CAST(ROUND(CAST(fl.nt AS DOUBLE) / ft.nt, 6)
         |        AS DECIMAL(12,6)) - om.m)) AS DECIMAL(18,6)) AS l1
         |  FROM fl JOIN ft ON ft.k = fl.k JOIN om ON om.lang = fl.lang
         |  GROUP BY 1)
         |SELECT CAST(ft.k * 100 AS INT) AS threshold,
         |  CAST(ft.nd AS BIGINT) AS n_docs,
         |  CAST(ft.nt AS BIGINT) AS n_tokens,
         |  ROUND(CAST(ft.nd AS DOUBLE) / tot.td, 6) AS frac_docs,
         |  CAST(l1.l1 AS DOUBLE) AS l1_mix_shift
         |FROM ft JOIN l1 ON l1.k = ft.k, tot
         |ORDER BY threshold""".stripMargin,

    "q329_cuped" ->
      """WITH ev AS (
        |  SELECT user_id, epoch_ns(ts)//1000 // 86400000000 AS day,
        |    CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
        |  FROM events),
        |d0 AS (SELECT MIN(day) AS d0 FROM ev),
        |users AS (
        |  SELECT user_id,
        |    SUM(CASE WHEN day - d0.d0 < 15 THEN cents ELSE 0 END) AS x,
        |    SUM(CASE WHEN day - d0.d0 >= 15 THEN cents ELSE 0 END) AS y,
        |    CAST(user_id % 2 AS INT) AS v
        |  FROM ev, d0 GROUP BY user_id),
        |g AS (
        |  SELECT COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
        |    SUM(x * y) AS sxy, SUM(x * x) AS sxx, SUM(y * y) AS syy
        |  FROM users),
        |g2 AS (
        |  SELECT
        |    CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy AS numd,
        |    CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx AS dx,
        |    CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy AS dy,
        |    ROUND(CAST(sx AS DOUBLE) / n, 6) AS xbar
        |  FROM g),
        |g3 AS (
        |  SELECT ROUND(numd / dx, 6) AS theta,
        |    ROUND(numd * numd / (dx * dy), 6) AS rho2, xbar
        |  FROM g2),
        |arms AS (
        |  SELECT v, COUNT(*) AS n_v, SUM(x) AS sx_v, SUM(y) AS sy_v
        |  FROM users GROUP BY 1),
        |a2 AS (
        |  SELECT v, n_v,
        |    ROUND(CAST(sy_v AS DOUBLE) / n_v, 6) AS ybar,
        |    ROUND(CAST(sx_v AS DOUBLE) / n_v, 6) AS xbar_v
        |  FROM arms)
        |SELECT a2.v AS variant, CAST(a2.n_v AS BIGINT) AS n_users,
        |  a2.ybar AS mean_post_cents, a2.xbar_v AS mean_pre_cents,
        |  ROUND(a2.ybar - g3.theta * (a2.xbar_v - g3.xbar), 6)
        |    AS mean_cuped_cents,
        |  g3.theta, g3.rho2 AS variance_reduction
        |FROM a2, g3 ORDER BY variant""".stripMargin,

    "q330_negbin_fit" ->
      """WITH dc AS (
        |  SELECT event_type, epoch_ns(ts)//1000 // 86400000000 AS day,
        |    COUNT(*) AS x
        |  FROM events GROUP BY 1, 2),
        |st AS (
        |  SELECT event_type, COUNT(*) AS n, SUM(x) AS sx,
        |    SUM(x * x) AS sxx
        |  FROM dc GROUP BY 1)
        |SELECT event_type, CAST(n AS INT) AS n_days,
        |  ROUND(CAST(sx AS DOUBLE) / n, 6) AS mean,
        |  ROUND(CAST(n * sxx - sx * sx AS DOUBLE)
        |    / (CAST(n AS DOUBLE) * (n - 1)), 6) AS variance,
        |  ROUND(CAST(n * sxx - sx * sx AS DOUBLE) * n
        |    / (CAST(n AS DOUBLE) * (n - 1) * sx), 6) AS dispersion,
        |  n * sxx - sx * sx > (n - 1) * sx AS overdispersed,
        |  CASE WHEN n * sxx - sx * sx > (n - 1) * sx THEN
        |    ROUND(CAST(sx AS DOUBLE) * sx /
        |      (CAST(n AS DOUBLE) * n) /
        |      (CAST(n * sxx - sx * sx AS DOUBLE)
        |        / (CAST(n AS DOUBLE) * (n - 1))
        |       - CAST(sx AS DOUBLE) / n), 6)
        |  END AS nb_r,
        |  CASE WHEN n * sxx - sx * sx > (n - 1) * sx THEN
        |    ROUND((CAST(sx AS DOUBLE) / n) /
        |      (CAST(n * sxx - sx * sx AS DOUBLE)
        |        / (CAST(n AS DOUBLE) * (n - 1))), 6)
        |  END AS nb_p
        |FROM st ORDER BY event_type""".stripMargin,

    "q322_lsh_planner" -> {
      val cfgs = lshGrid.map { case (b, r) =>
        val p5 = sCurveSql("0.5", b, r)
        val p7 = sCurveSql("0.7", b, r)
        val p9 = sCurveSql("0.9", b, r)
        val pm = sCurveSql("mid", b, r)
        s"""SELECT CAST($b AS INT) AS bands, CAST($r AS INT) AS rows_per_band,
           |  CAST(${b * r} AS INT) AS signature_len,
           |  ROUND($p5, 6) AS p_at_05, ROUND($p7, 6) AS p_at_07,
           |  ROUND($p9, 6) AS p_at_09,
           |  (SELECT CAST(SUM(CAST(ROUND($pm * cnt / tc, 6)
           |    AS DECIMAL(18,6))) AS DOUBLE) FROM h2, tot)
           |    AS recall_observed""".stripMargin
      }.mkString("\nUNION ALL\n")
      s"""${Dedup.prefixPairSqlCtes("0.7")},
         |p7m AS MATERIALIZED (
         |  SELECT doc_a, doc_b, jac FROM v WHERE jac >= 0.7),
         |hist AS (
         |  SELECT CAST(FLOOR((jac - 0.7) / 0.05) AS INT) AS bin,
         |    COUNT(*) AS cnt
         |  FROM p7m GROUP BY 1),
         |h2 AS (SELECT bin, cnt, 0.725 + 0.05 * bin AS mid FROM hist),
         |tot AS (SELECT SUM(cnt) AS tc FROM h2),
         |cfgs AS (
         |$cfgs),
         |u AS (
         |  SELECT *, CAST(ROUND(recall_observed * 1000000, 0) AS BIGINT)
         |    - CAST(ROUND(p_at_05 * 1000000, 0) AS BIGINT) AS util
         |  FROM cfgs),
         |mx AS (SELECT util, bands, rows_per_band FROM u
         |       ORDER BY util DESC, bands, rows_per_band LIMIT 1)
         |SELECT u.bands, u.rows_per_band, u.signature_len,
         |  u.p_at_05, u.p_at_07, u.p_at_09, u.recall_observed, u.util,
         |  (u.util = mx.util AND u.bands = mx.bands
         |   AND u.rows_per_band = mx.rows_per_band) AS chosen
         |FROM u, mx ORDER BY u.bands, u.rows_per_band""".stripMargin
    },

    "q323_skew_profiler" ->
      """WITH f AS (
        |  SELECT 'lineitem.l_orderkey' AS join_key,
        |    CAST(l_orderkey AS VARCHAR) AS k FROM lineitem
        |  UNION ALL
        |  SELECT 'events.user_id', CAST(user_id AS VARCHAR) FROM events
        |  UNION ALL
        |  SELECT 'documents.source', source FROM documents),
        |fr AS (SELECT join_key, k, COUNT(*) AS f FROM f GROUP BY 1, 2),
        |gr AS (SELECT join_key, f, COUNT(*) AS nk FROM fr GROUP BY 1, 2),
        |st AS (
        |  SELECT join_key, SUM(nk) AS keys, SUM(f * nk) AS rows_,
        |    MAX(f) AS mx
        |  FROM gr GROUP BY 1),
        |cum AS (
        |  SELECT join_key, f,
        |    SUM(nk) OVER (PARTITION BY join_key ORDER BY f) AS cc
        |  FROM gr),
        |p50 AS (
        |  SELECT c.join_key, MIN(c.f) AS p50 FROM cum c
        |  JOIN st ON st.join_key = c.join_key
        |  WHERE c.cc >= (st.keys + 1) // 2 GROUP BY 1),
        |p99 AS (
        |  SELECT c.join_key, MIN(c.f) AS p99 FROM cum c
        |  JOIN st ON st.join_key = c.join_key
        |  WHERE c.cc >= (99 * st.keys + 99) // 100 GROUP BY 1)
        |SELECT st.join_key, CAST(st.rows_ AS BIGINT) AS n_rows,
        |  CAST(st.keys AS BIGINT) AS n_keys,
        |  CAST(st.mx AS BIGINT) AS max_freq,
        |  CAST(p50.p50 AS BIGINT) AS p50_freq,
        |  CAST(p99.p99 AS BIGINT) AS p99_freq,
        |  ROUND(CAST(st.mx AS DOUBLE) * st.keys / st.rows_, 6)
        |    AS skew_ratio,
        |  CAST((st.mx * st.keys + 4 * st.rows_ - 1) // (4 * st.rows_)
        |    AS BIGINT) AS recommended_salt
        |FROM st
        |JOIN p50 ON p50.join_key = st.join_key
        |JOIN p99 ON p99.join_key = st.join_key
        |ORDER BY st.join_key""".stripMargin,

    "q324_markov_absorption" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, epoch_ns(ts)//1000 AS t, event_type
        |  FROM events),
        |tr AS (
        |  SELECT event_type,
        |    LEAD(event_type) OVER (PARTITION BY user_id
        |      ORDER BY t, event_id) AS next_type
        |  FROM ev),
        |trans AS (
        |  SELECT event_type, next_type, COUNT(*) AS nij
        |  FROM tr WHERE next_type IS NOT NULL GROUP BY 1, 2),
        |ni AS (SELECT event_type, SUM(nij) AS ni FROM trans GROUP BY 1),
        |p AS (
        |  SELECT t.event_type AS i, t.next_type AS j,
        |    CAST(ROUND(CAST(t.nij AS DOUBLE) / ni.ni, 6)
        |      AS DECIMAL(12,6)) AS p6
        |  FROM trans t JOIN ni ON ni.event_type = t.event_type),
        |states AS (SELECT DISTINCT i AS s FROM p),
        |v1 AS (
        |  SELECT s.s, CAST(COALESCE(p.p6, 0) AS DECIMAL(12,6)) AS v
        |  FROM states s
        |  LEFT JOIN p ON p.i = s.s AND p.j = 'purchase'),
        |v2 AS (
        |  SELECT s.s, CAST(ROUND(CAST(
        |    COALESCE(MIN(pp.p6), 0) + COALESCE(SUM(p.p6 * w.v), 0)
        |    AS DOUBLE), 6) AS DECIMAL(12,6)) AS v
        |  FROM states s
        |  LEFT JOIN p pp ON pp.i = s.s AND pp.j = 'purchase'
        |  LEFT JOIN p ON p.i = s.s AND p.j <> 'purchase'
        |  LEFT JOIN v1 w ON w.s = p.j
        |  GROUP BY s.s),
        |v3 AS (
        |  SELECT s.s, CAST(ROUND(CAST(
        |    COALESCE(MIN(pp.p6), 0) + COALESCE(SUM(p.p6 * w.v), 0)
        |    AS DOUBLE), 6) AS DECIMAL(12,6)) AS v
        |  FROM states s
        |  LEFT JOIN p pp ON pp.i = s.s AND pp.j = 'purchase'
        |  LEFT JOIN p ON p.i = s.s AND p.j <> 'purchase'
        |  LEFT JOIN v2 w ON w.s = p.j
        |  GROUP BY s.s),
        |v4 AS (
        |  SELECT s.s, CAST(ROUND(CAST(
        |    COALESCE(MIN(pp.p6), 0) + COALESCE(SUM(p.p6 * w.v), 0)
        |    AS DOUBLE), 6) AS DECIMAL(12,6)) AS v
        |  FROM states s
        |  LEFT JOIN p pp ON pp.i = s.s AND pp.j = 'purchase'
        |  LEFT JOIN p ON p.i = s.s AND p.j <> 'purchase'
        |  LEFT JOIN v3 w ON w.s = p.j
        |  GROUP BY s.s)
        |SELECT s.s AS state,
        |  CAST(v1.v AS DOUBLE) AS p_absorb_1,
        |  CAST(v2.v AS DOUBLE) AS p_absorb_2,
        |  CAST(v3.v AS DOUBLE) AS p_absorb_3,
        |  CAST(v4.v AS DOUBLE) AS p_absorb_4
        |FROM states s
        |JOIN v1 ON v1.s = s.s JOIN v2 ON v2.s = s.s
        |JOIN v3 ON v3.s = s.s JOIN v4 ON v4.s = s.s
        |ORDER BY state""".stripMargin,

    "q325_boxplot_profile" ->
      """WITH g AS (
        |  SELECT source, n_chars, COUNT(*) AS c
        |  FROM documents GROUP BY 1, 2),
        |n AS (SELECT source, SUM(c) AS n FROM g GROUP BY 1),
        |cum AS (
        |  SELECT source, n_chars, c,
        |    SUM(c) OVER (PARTITION BY source ORDER BY n_chars) AS cc
        |  FROM g),
        |q1 AS (SELECT c.source, MIN(c.n_chars) AS q FROM cum c
        |  JOIN n ON n.source = c.source
        |  WHERE c.cc >= (n.n + 3) // 4 GROUP BY 1),
        |q2 AS (SELECT c.source, MIN(c.n_chars) AS q FROM cum c
        |  JOIN n ON n.source = c.source
        |  WHERE c.cc >= (n.n + 1) // 2 GROUP BY 1),
        |q3 AS (SELECT c.source, MIN(c.n_chars) AS q FROM cum c
        |  JOIN n ON n.source = c.source
        |  WHERE c.cc >= (3 * n.n + 3) // 4 GROUP BY 1),
        |o AS (
        |  SELECT g.source,
        |    SUM(CASE WHEN 2 * g.n_chars < 2 * q1.q - 3 * (q3.q - q1.q)
        |      THEN g.c ELSE 0 END) AS lo,
        |    SUM(CASE WHEN 2 * g.n_chars > 2 * q3.q + 3 * (q3.q - q1.q)
        |      THEN g.c ELSE 0 END) AS hi
        |  FROM g
        |  JOIN q1 ON q1.source = g.source
        |  JOIN q3 ON q3.source = g.source
        |  GROUP BY 1)
        |SELECT n.source, CAST(n.n AS BIGINT) AS n,
        |  CAST(q1.q AS BIGINT) AS q1, CAST(q2.q AS BIGINT) AS q2,
        |  CAST(q3.q AS BIGINT) AS q3,
        |  CAST(q3.q - q1.q AS BIGINT) AS iqr,
        |  CAST(o.lo AS BIGINT) AS n_low_outliers,
        |  CAST(o.hi AS BIGINT) AS n_high_outliers
        |FROM n
        |JOIN q1 ON q1.source = n.source JOIN q2 ON q2.source = n.source
        |JOIN q3 ON q3.source = n.source JOIN o ON o.source = n.source
        |ORDER BY n.source""".stripMargin,

    "q317_entropy_rate" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, epoch_ns(ts)//1000 AS t, event_type
        |  FROM events),
        |tr AS (
        |  SELECT event_type,
        |    LEAD(event_type) OVER (PARTITION BY user_id
        |      ORDER BY t, event_id) AS next_type
        |  FROM ev),
        |trans AS (
        |  SELECT event_type, next_type, COUNT(*) AS nij
        |  FROM tr WHERE next_type IS NOT NULL GROUP BY 1, 2),
        |ni AS (SELECT event_type, SUM(nij) AS ni FROM trans GROUP BY 1),
        |tot AS (SELECT SUM(nij) AS nn,
        |  COUNT(DISTINCT event_type) AS st FROM trans),
        |terms AS (
        |  SELECT t.event_type, t.next_type, t.nij, ni.ni, tot.nn, tot.st,
        |    CAST(ROUND((CAST(t.nij AS DOUBLE) / tot.nn)
        |      * LN(CAST(t.nij AS DOUBLE) / ni.ni), 6) AS DECIMAL(18,6))
        |      AS jt6,
        |    CAST(ROUND((CAST(t.nij AS DOUBLE) / ni.ni)
        |      * LN(CAST(t.nij AS DOUBLE) / ni.ni), 6) AS DECIMAL(18,6))
        |      AS ct6
        |  FROM trans t JOIN ni ON ni.event_type = t.event_type, tot),
        |ps AS (
        |  SELECT event_type, MIN(ni) AS n_out,
        |    CAST(-SUM(ct6) AS DOUBLE) AS h_row
        |  FROM terms GROUP BY 1),
        |g AS (
        |  SELECT CAST(-SUM(jt6) AS DOUBLE) AS entropy_rate,
        |    ROUND(CAST(-SUM(jt6) AS DOUBLE)
        |      / LN(CAST(MIN(st) AS DOUBLE)), 6) AS predictability_ratio
        |  FROM terms)
        |SELECT ps.event_type, CAST(ps.n_out AS BIGINT) AS n_out, ps.h_row,
        |  g.entropy_rate, g.predictability_ratio
        |FROM ps, g ORDER BY ps.event_type""".stripMargin,

    "q319_deletion_cascade" ->
      """WITH tomb AS (
        |  SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0),
        |delo AS (
        |  SELECT o.o_orderkey FROM orders o
        |  JOIN tomb t ON t.c_custkey = o.o_custkey),
        |cu AS (
        |  SELECT 'customer' AS relation, COUNT(*) AS n_rows,
        |    SUM(CASE WHEN c_custkey % 97 = 0 THEN 1 ELSE 0 END)
        |      AS n_deleted,
        |    CAST(0 AS BIGINT) AS suppliers_touched
        |  FROM customer),
        |oa AS (
        |  SELECT 'orders' AS relation, COUNT(*) AS n_rows,
        |    SUM(CASE WHEN t.c_custkey IS NOT NULL THEN 1 ELSE 0 END)
        |      AS n_deleted,
        |    CAST(0 AS BIGINT) AS suppliers_touched
        |  FROM orders o LEFT JOIN tomb t ON t.c_custkey = o.o_custkey),
        |la AS (
        |  SELECT 'lineitem' AS relation, COUNT(*) AS n_rows,
        |    SUM(CASE WHEN dk.o_orderkey IS NOT NULL THEN 1 ELSE 0 END)
        |      AS n_deleted,
        |    COUNT(DISTINCT CASE WHEN dk.o_orderkey IS NOT NULL
        |      THEN l.l_suppkey END) AS suppliers_touched
        |  FROM lineitem l
        |  LEFT JOIN delo dk ON dk.o_orderkey = l.l_orderkey),
        |u AS (SELECT * FROM cu UNION ALL SELECT * FROM oa
        |      UNION ALL SELECT * FROM la)
        |SELECT relation, CAST(n_rows AS BIGINT) AS n_rows,
        |  CAST(n_deleted AS BIGINT) AS n_deleted,
        |  ROUND(CAST(n_deleted AS DOUBLE) / n_rows, 6) AS frac_deleted,
        |  CAST(suppliers_touched AS BIGINT) AS suppliers_touched
        |FROM u ORDER BY relation""".stripMargin,

    "q320_burstiness" ->
      s"""WITH nd AS (SELECT COUNT(*) AS nd FROM documents),
         |cell AS (
         |  SELECT doc_id, tok, COUNT(*) AS c
         |  FROM (SELECT doc_id, unnest(${TextAnalysis.tokensSql}) AS tok
         |        FROM documents) z
         |  GROUP BY 1, 2),
         |st AS (
         |  SELECT tok, SUM(c) AS total, COUNT(*) AS n_with,
         |    SUM(c * c) AS ss
         |  FROM cell GROUP BY 1),
         |sc AS (
         |  SELECT tok, total, n_with,
         |    ROUND(CAST(nd.nd * ss - total * total AS DOUBLE)
         |      / (CAST(nd.nd - 1 AS DOUBLE) * total), 6) AS fano
         |  FROM st, nd),
         |rk AS (
         |  SELECT tok, total, n_with, fano,
         |    ROW_NUMBER() OVER (ORDER BY total DESC, tok DESC) AS rn
         |  FROM sc)
         |SELECT CAST(rn AS INT) AS rn, tok,
         |  CAST(total AS BIGINT) AS total,
         |  CAST(n_with AS BIGINT) AS n_docs_with, fano,
         |  fano > 1.0 AS bursty
         |FROM rk WHERE rn <= 20 ORDER BY rn""".stripMargin,

    "q315_multitouch_attribution" ->
      """WITH fp AS (
        |  SELECT user_id, MIN(epoch_ns(ts)//1000) AS conv_ts
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |touch AS (
        |  SELECT e.user_id, e.event_type,
        |    ROW_NUMBER() OVER (PARTITION BY e.user_id
        |      ORDER BY epoch_ns(e.ts)//1000, e.event_id) AS i,
        |    COUNT(*) OVER (PARTITION BY e.user_id) AS n
        |  FROM events e JOIN fp ON fp.user_id = e.user_id
        |  WHERE epoch_ns(e.ts)//1000 < fp.conv_ts
        |    AND e.event_type <> 'purchase'),
        |credited AS (
        |  SELECT event_type, 'last_touch' AS rule,
        |    CASE WHEN i = n THEN 1000000 ELSE 0 END AS credit FROM touch
        |  UNION ALL
        |  SELECT event_type, 'first_touch',
        |    CASE WHEN i = 1 THEN 1000000 ELSE 0 END FROM touch
        |  UNION ALL
        |  SELECT event_type, 'linear',
        |    1000000 // n + CASE WHEN i <= 1000000 % n THEN 1 ELSE 0 END
        |  FROM touch
        |  UNION ALL
        |  SELECT event_type, 'u_shaped',
        |    CASE WHEN n = 1 THEN 1000000
        |      WHEN n = 2 THEN 500000
        |      WHEN i = 1 OR i = n THEN 400000
        |      ELSE 200000 // (n - 2)
        |        + CASE WHEN i - 1 <= 200000 % (n - 2) THEN 1 ELSE 0 END
        |    END
        |  FROM touch),
        |br AS (
        |  SELECT rule, event_type AS channel,
        |    SUM(credit) AS credit_micro
        |  FROM credited GROUP BY 1, 2),
        |rt AS (SELECT rule, SUM(credit_micro) AS rt FROM br GROUP BY 1)
        |SELECT br.rule, br.channel,
        |  CAST(br.credit_micro AS BIGINT) AS credit_micro,
        |  ROUND(CAST(br.credit_micro AS DOUBLE) / rt.rt, 6) AS share
        |FROM br JOIN rt ON rt.rule = br.rule
        |ORDER BY br.rule, br.channel""".stripMargin
  )
}
