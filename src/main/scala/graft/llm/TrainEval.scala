package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}

/** Supervised train/eval operators for the corpus-quality-classifier
  * leg of a training-data pipeline: an exact multinomial Naive Bayes
  * trainer + its held-out confusion-matrix evaluation (the classic
  * first-pass language/quality labeler a 100 TB curation run fits on
  * the cluster), the precision–recall curve with exact average
  * precision (the threshold-picking twin of q229's ROC-AUC), an
  * information-gain feature ranking (the entropy sibling of q233's
  * χ² association), and an exact decision-stump split search whose
  * argmax is decided in pure integer arithmetic.
  *
  * Scale posture shared by the family: every corpus-sized reduction
  * is a single tokenize pass into a model-sized (vocab-, class- or
  * score-grid-bounded) aggregate; model tables broadcast back for
  * scoring; scores and ranking keys are exact integers (micro-unit
  * log-probabilities, cross-multiplied Gini surrogates) so argmax
  * decisions cannot flip on a float ulp across engines or partition
  * orders. Transcendentals are taken once per model cell and rounded
  * at a documented boundary (the q276/q290 totalization rule).
  *
  * Reference scope: the reference's own learning loop is the RBM/DBN
  * trainer (rbmdriver.java); this module is §2.E addendum surface —
  * the shallow supervised classifiers that curate the corpus the deep
  * model trains on.
  */
object TrainEval extends QueryModule {

  /** Lowercased alpha tokens (CorpusOps' tokenizer, redeclared — the
    * modules keep their helper surfaces private by design).
    */
  private def alphaTokens =
    array_remove(split(lower(col("text")), "[^a-z]+"), "")

  private val alphaTokensSql =
    """list_filter(string_split_regex(lower(text), '[^a-z]+'), x -> x != '')"""

  /** q229's per-mille stopword score + weak dup label over whitespace
    * tokens, zero-token docs guarded out on both engines.
    */
  private def scoredBase(s: SparkSession, d: String): DataFrame = {
    val ts = TextAnalysis.tokens(col("text"))
    Tables.documents(s, d)
      .withColumn("n_tok", size(ts))
      .filter(col("n_tok") > 0)
      .withColumn("stop_cnt", size(filter(ts,
        t => t.isin(TextAnalysis.Stopwords: _*))))
      .withColumn("lab", when(array_contains(ts, "dup"), 1L).otherwise(0L))
      .select(expr("CAST((1000 * stop_cnt) DIV n_tok AS INT)").as("sm"),
        col("lab"))
  }

  private val scoredBaseSql =
    s"""SELECT CAST((1000 * CAST(len(list_filter(ts,
       |    t -> list_contains(['the','a','of','and','to','in','is'], t)))
       |    AS BIGINT)) // len(ts) AS INT) AS sm,
       |  CASE WHEN list_contains(ts, 'dup') THEN 1 ELSE 0 END AS lab
       |FROM (SELECT ${TextAnalysis.tokensSql} AS ts FROM documents) z
       |WHERE len(ts) > 0""".stripMargin

  /** Multinomial NB sufficient statistics over the even-doc_id train
    * carve (q280's carve convention): per-(lang, tok) occurrence
    * counts, per-lang token totals, train vocabulary size, per-lang
    * doc counts. All exact integers; one tokenize pass shuffled into
    * the vocab-bounded cell table, everything downstream model-sized.
    */
  private def nbStats(s: SparkSession, d: String): (DataFrame, DataFrame, DataFrame) = {
    val train = Tables.documents(s, d).filter(col("doc_id") % 2 === 0)
    // the ONE corpus-sized pass, truncated so the vocab-bounded cell
    // table is computed once however many model derivations read it
    // (static plan dedup — AQE's runtime ReusedExchange can't merge
    // branches that diverge before the exchange; q243's argument)
    val cell = train
      .select(col("lang"), explode(alphaTokens).as("tok"))
      .groupBy(col("lang"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val byLang = cell.groupBy(col("lang")).agg(sum(col("cnt")).as("t_l"))
    // |langs|-bounded; truncated so the prior and the doc total don't
    // each re-scan the train carve
    val docs = train.groupBy(col("lang")).agg(count(lit(1)).as("d_l"))
      .localCheckpoint()
    (cell, byLang, docs)
  }

  private val nbCellSql =
    s"""SELECT lang, tok, COUNT(*) AS cnt
       |FROM (SELECT lang, unnest($alphaTokensSql) AS tok
       |      FROM documents WHERE doc_id % 2 = 0) z
       |GROUP BY 1, 2""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Multinomial Naive Bayes TRAINER (language model of the corpus,
    // label = lang, McCallum & Nigam 1998): Laplace-smoothed token
    // log-likelihoods ln((c+1)/(T_l+V)) and class log-priors
    // ln(D_l/D) over the even-doc_id train carve. The trained model
    // is vocab×class-bounded (broadcastable at any corpus scale); the
    // only corpus-sized work is ONE tokenize pass map-side-combined
    // into the (lang, tok) cell table. Output: per class, the prior
    // and the top-10 highest-count tokens with their smoothed
    // log-likelihoods — ranking by EXACT integer count (tok as the
    // deterministic tie-break), never by the rounded transcendental.
    "q291_nb_train" -> ((s, d) => {
      import graft.functions.exprs.graft_collect_top_k
      val (cell, byLang, docs) = nbStats(s, d)
      val vocab = cell.agg(count_distinct(col("tok")).as("v"))
      val tot = docs.agg(sum(col("d_l")).as("dd"))
      val priors = docs.crossJoin(broadcast(tot))
        .select(col("lang"), col("d_l"),
          round(log(col("d_l").cast("double") / col("dd")), 6)
            .as("prior_lp"))
      val top = cell
        .groupBy(col("lang"))
        .agg(graft_collect_top_k(struct(col("cnt"), col("tok")), 10, false)
          .as("top"))
        .select(col("lang"), posexplode(sort_array(col("top"), asc = false)))
        .select(col("lang"), (col("pos") + 1).cast("int").as("rn"),
          col("col.tok").as("tok"), col("col.cnt").as("cnt"))
      top.join(broadcast(byLang), "lang")
        .crossJoin(broadcast(vocab))
        .withColumn("lp", round(log((col("cnt") + lit(1)).cast("double") /
          (col("t_l") + col("v")).cast("double")), 6))
        .join(broadcast(priors), "lang")
        .select(col("lang"), col("rn"), col("tok"),
          col("cnt").cast("bigint").as("cnt"), col("lp"),
          col("prior_lp"), col("d_l").cast("int").as("n_train_docs"),
          col("t_l").cast("bigint").as("n_tok_lang"),
          col("v").cast("bigint").as("vocab"))
        .orderBy(col("lang"), col("rn"))
    }),

    // NB held-out CONFUSION MATRIX — q291's model applied to the odd
    // doc_id carve. The decisive trick is the scoring arithmetic:
    // every log-probability is quantized ONCE to an exact micro-unit
    // BIGINT (round(1e6·ln(p))), so the per-(doc, class) score
    // prior + Σ count·lp is an exact integer sum — association-free,
    // partition-order-free, and the argmax over classes (ties broken
    // by lang) cannot flip on a float ulp. Unseen test tokens take the
    // class's smoothed-zero mass ln(1/(T_l+V)) via the left join's
    // coalesce. At scale: the model is vocab-bounded (broadcast), the
    // test side is one tokenize pass + one doc-keyed aggregation; the
    // ×|classes| explode is a constant factor, not a shuffle.
    "q292_nb_confusion" -> ((s, d) => {
      val (cell, byLang, docs) = nbStats(s, d)
      val vocab = cell.agg(count_distinct(col("tok")).as("v"))
      val tot = docs.agg(sum(col("d_l")).as("dd"))
      val langStats = byLang.crossJoin(broadcast(vocab))
        .join(docs, "lang").crossJoin(broadcast(tot))
        .select(col("lang").as("clang"),
          expr("CAST(ROUND(1000000 * LN(1.0 / CAST(t_l + v AS DOUBLE)), 0) AS BIGINT)")
            .as("unseen_lpm"),
          expr("CAST(ROUND(1000000 * LN(CAST(d_l AS DOUBLE) / dd), 0) AS BIGINT)")
            .as("prior_lpm"))
      val model = cell.join(byLang, "lang").crossJoin(broadcast(vocab))
        .select(col("lang").as("clang"), col("tok"),
          expr("CAST(ROUND(1000000 * LN(CAST(cnt + 1 AS DOUBLE) / CAST(t_l + v AS DOUBLE)), 0) AS BIGINT)")
            .as("lpm"))
      val testTok = Tables.documents(s, d).filter(col("doc_id") % 2 =!= 0)
        .select(col("doc_id"), col("lang").as("true_lang"),
          explode(alphaTokens).as("tok"))
        .groupBy(col("doc_id"), col("true_lang"), col("tok"))
        .agg(count(lit(1)).as("tcnt"))
      val scored = testTok
        .crossJoin(broadcast(langStats))
        .join(broadcast(model), Seq("clang", "tok"), "left")
        .withColumn("lpm2", coalesce(col("lpm"), col("unseen_lpm")))
        .groupBy(col("doc_id"), col("true_lang"), col("clang"),
          col("prior_lpm"))
        .agg(sum(col("tcnt") * col("lpm2")).as("tok_lpm"))
        .withColumn("score", col("prior_lpm") + col("tok_lpm"))
        .groupBy(col("doc_id"), col("true_lang"))
        .agg(max_by(col("clang"), struct(col("score"), col("clang")))
          .as("pred_lang"))
      // the confusion matrix is |classes|²-bounded at any corpus
      // scale; truncating here lets the accuracy scalar derive from
      // it without re-running the scoring pass
      val conf = scored.groupBy(col("true_lang"), col("pred_lang"))
        .agg(count(lit(1)).as("n"))
        .localCheckpoint()
      val acc = conf.agg(
        round(sum(when(col("true_lang") === col("pred_lang"), col("n"))
          .otherwise(0L)).cast("double") / sum(col("n")), 6).as("accuracy"))
      conf.crossJoin(broadcast(acc))
        .select(col("true_lang"), col("pred_lang"),
          col("n").cast("bigint").as("n"), col("accuracy"))
        .orderBy(col("true_lang"), col("pred_lang"))
    }),

    // Precision–recall curve + exact AVERAGE PRECISION over q229's
    // per-mille stopword score vs the weak dup label — the
    // threshold-selection readout a quality filter is actually tuned
    // on when positives are rare (Davis & Goadrich 2006: PR beats ROC
    // under class imbalance). One corpus pass into the ≤1001-row
    // score grid; the descending-threshold scan is a single linear
    // array fold on that one bounded row (no window, no second
    // shuffle), accumulating exact integer TP/FP and the AP sum in
    // micro-units: each threshold's term np·tp/(tp+fp) is rounded
    // ONCE to an integer micro value, so the fold is
    // association-free and the oracle's window spelling lands on the
    // identical integers.
    "q293_pr_curve" -> ((s, d) => {
      val g = scoredBase(s, d).groupBy(col("sm")).agg(
        sum(col("lab")).as("np"),
        (count(lit(1)) - sum(col("lab"))).as("nn"))
      g.agg(
          reverse(sort_array(collect_list(
            struct(col("sm"), col("np"), col("nn"))))).as("bs"),
          sum(col("np")).as("p"), sum(col("nn")).as("q"))
        .withColumn("acc2", expr(
          """aggregate(bs,
            |  named_struct('tp', 0L, 'fp', 0L, 'apm', 0L,
            |    'rows', cast(array() as array<struct<sm:int,tp:bigint,fp:bigint>>)),
            |  (a, x) -> named_struct(
            |    'tp', a.tp + x.np, 'fp', a.fp + x.nn,
            |    'apm', a.apm + if(x.np > 0,
            |      cast(round(1000000d * x.np * (a.tp + x.np) /
            |        (a.tp + x.np + a.fp + x.nn), 0) as bigint), 0L),
            |    'rows', concat(a.rows, array(named_struct(
            |      'sm', x.sm, 'tp', a.tp + x.np, 'fp', a.fp + x.nn)))))""".stripMargin))
        .select(col("p"), col("q"),
          round(col("acc2.apm").cast("double") / (col("p") * lit(1e6)), 6)
            .as("ap"),
          explode(col("acc2.rows")).as("r"))
        .select(col("r.sm").as("thr"), col("r.tp").as("tp"),
          col("r.fp").as("fp"), (col("p") - col("r.tp")).as("fn"),
          round(col("r.tp").cast("double") / (col("r.tp") + col("r.fp")), 6)
            .as("precision"),
          round(col("r.tp").cast("double") / col("p"), 6).as("recall"),
          col("ap"))
        .orderBy(col("thr").desc)
    }),

    // INFORMATION-GAIN token ranking for the weak dup label — the
    // entropy sibling of q233's χ²: IG(tok) = H(lab) − H(lab | tok
    // present/absent) over document-level token PRESENCE (Yang &
    // Pedersen 1997's IG feature selection). One tokenize pass into
    // the vocab-bounded presence-cell table (doc-distinct tokens, so
    // a token counts once per doc); margins derive from one tiny
    // label aggregate. Every entropy term (x/N)·ln(x/r) is computed
    // from exact integer counts, rounded ONCE to 6dp, and summed in
    // DECIMAL (q276's totalization) — the ranking key is that exact
    // decimal (cast to double only for the heap), tok the tie-break.
    "q294_info_gain" -> ((s, d) => {
      import graft.functions.exprs.graft_collect_top_k
      val ts = TextAnalysis.tokens(col("text"))
      val base = Tables.documents(s, d)
        .withColumn("lab",
          when(array_contains(ts, "dup"), 1L).otherwise(0L))
      val tot = base.agg(count(lit(1)).as("nn"), sum(col("lab")).as("p"))
      val cell = base
        .select(col("lab"), explode(array_distinct(alphaTokens)).as("tok"))
        .groupBy(col("tok"))
        .agg(count(lit(1)).as("n_t"), sum(col("lab")).as("n1"))
      // t6(x, r): round6((x/N)·ln(x/r)) as DECIMAL(18,6); x ln x → 0
      def t6(x: String, r: String) =
        s"""CAST(CASE WHEN $x = 0 THEN 0 ELSE
           |  ROUND((CAST($x AS DOUBLE) / nn) *
           |    LN(CAST($x AS DOUBLE) / $r), 6) END AS DECIMAL(18,6))""".stripMargin
      val scored = cell.crossJoin(broadcast(tot))
        .withColumn("n0", col("n_t") - col("n1"))
        .withColumn("a1", expr("p - n1"))      // lab=1, absent
        .withColumn("a0", expr("nn - p - n0")) // lab=0, absent
        .withColumn("n_a", expr("nn - n_t"))
        .withColumn("hp6", expr(
          s"-(${t6("p", "nn")} + ${t6("nn - p", "nn")})"))
        .withColumn("wh6", expr(
          s"""-(${t6("n1", "n_t")} + ${t6("n0", "n_t")} +
             |  ${t6("a1", "n_a")} + ${t6("a0", "n_a")})""".stripMargin))
        .withColumn("ig", (col("hp6") - col("wh6")).cast("double"))
      scored
        .agg(graft_collect_top_k(struct(col("ig"), col("tok"),
          col("n_t"), col("n1")), 20, false).as("top"))
        .select(posexplode(sort_array(col("top"), asc = false)))
        .select((col("pos") + 1).cast("int").as("rn"),
          col("col.tok").as("tok"),
          col("col.n_t").cast("bigint").as("n_with"),
          col("col.n1").cast("bigint").as("n_pos_with"),
          col("col.ig").as("ig"))
        .orderBy(col("rn"))
    }),

    // Exact DECISION-STUMP split search on the per-mille stopword
    // score: the best Gini split is chosen by an EXACT integer
    // surrogate — maximizing F(t) = (pL²+qL²)/nL + (pR²+qR²)/nR is
    // equivalent to minimizing weighted Gini, and F's numerator
    // cross-multiplied to the common denominator nL·nR scales to the
    // integer (num·10¹²) DIV (nL·nR), so the argmax (tie → smallest
    // threshold) is decided entirely in integer arithmetic — no
    // float boundary can reorder candidates across engines or
    // partition orders (CART's split criterion, Breiman et al. 1984).
    // One corpus pass into the ≤1001-row score grid; the cumulative
    // scan is a linear array fold on that single bounded row; the
    // reported gain is one double expression of exact integers
    // (< 2⁵³, every product exact) rounded 6dp.
    "q295_decision_stump" -> ((s, d) => {
      val g = scoredBase(s, d).groupBy(col("sm")).agg(
        count(lit(1)).as("n"), sum(col("lab")).as("p"))
      g.agg(
          sort_array(collect_list(struct(col("sm"), col("n"), col("p"))))
            .as("bs"),
          sum(col("n")).as("nn"), sum(col("p")).as("pp"))
        .withColumn("rows", expr(
          """aggregate(bs,
            |  named_struct('nl', 0L, 'pl', 0L,
            |    'rows', cast(array() as array<struct<
            |      thr:int,nl:bigint,pl:bigint,nr:bigint,pr:bigint,sc:bigint>>)),
            |  (a, x) -> named_struct(
            |    'nl', a.nl + x.n, 'pl', a.pl + x.p,
            |    'rows', if(a.nl + x.n < nn,
            |      concat(a.rows, array(named_struct(
            |        'thr', x.sm, 'nl', a.nl + x.n, 'pl', a.pl + x.p,
            |        'nr', nn - a.nl - x.n, 'pr', pp - a.pl - x.p,
            |        'sc', cast((cast(
            |            ((a.pl + x.p) * (a.pl + x.p) +
            |             (a.nl + x.n - a.pl - x.p) * (a.nl + x.n - a.pl - x.p)) *
            |              (nn - a.nl - x.n) +
            |            ((pp - a.pl - x.p) * (pp - a.pl - x.p) +
            |             (nn - a.nl - x.n - pp + a.pl + x.p) *
            |             (nn - a.nl - x.n - pp + a.pl + x.p)) * (a.nl + x.n)
            |          as decimal(38,0)) * 1000000000000L)
            |          DIV cast((a.nl + x.n) * (nn - a.nl - x.n) as decimal(38,0))
            |          as bigint)))),
            |      a.rows)),
            |  a -> a.rows)""".stripMargin))
        .withColumn("best", expr(
          "array_max(transform(rows, r -> struct(r.sc as sc, -r.thr as nt)))"))
        .select(col("nn"), col("pp"), col("best"), explode(col("rows")).as("r"))
        .select(col("r.thr").as("thr"),
          col("r.nl").as("n_left"), col("r.pl").as("pos_left"),
          col("r.nr").as("n_right"), col("r.pr").as("pos_right"),
          round((col("r.pl") * col("r.pl") + (col("r.nl") - col("r.pl")) *
              (col("r.nl") - col("r.pl"))).cast("double") /
              (col("nn") * col("r.nl")) +
            ((col("r.pr") * col("r.pr") + (col("r.nr") - col("r.pr")) *
              (col("r.nr") - col("r.pr"))).cast("double") /
              (col("nn") * col("r.nr"))) -
            (col("pp") * col("pp") + (col("nn") - col("pp")) *
              (col("nn") - col("pp"))).cast("double") /
              (col("nn") * col("nn")), 6).as("gain"),
          (col("r.thr") === -col("best.nt")).as("is_best"))
        .orderBy(col("thr"))
    })
  )

  def oracle: Map[String, String] = Map(

    "q291_nb_train" ->
      s"""WITH cell AS ($nbCellSql),
         |bl AS (SELECT lang, SUM(cnt) AS t_l FROM cell GROUP BY 1),
         |v AS (SELECT COUNT(DISTINCT tok) AS v FROM cell),
         |dc AS (SELECT lang, COUNT(*) AS d_l FROM documents
         |       WHERE doc_id % 2 = 0 GROUP BY 1),
         |tot AS (SELECT SUM(d_l) AS dd FROM dc),
         |top AS (
         |  SELECT lang, tok, cnt,
         |    ROW_NUMBER() OVER (PARTITION BY lang
         |      ORDER BY cnt DESC, tok DESC) AS rn
         |  FROM cell)
         |SELECT t.lang, CAST(t.rn AS INT) AS rn, t.tok,
         |  CAST(t.cnt AS BIGINT) AS cnt,
         |  ROUND(LN(CAST(t.cnt + 1 AS DOUBLE) / (bl.t_l + v.v)), 6) AS lp,
         |  ROUND(LN(CAST(dc.d_l AS DOUBLE) / tot.dd), 6) AS prior_lp,
         |  CAST(dc.d_l AS INT) AS n_train_docs,
         |  CAST(bl.t_l AS BIGINT) AS n_tok_lang,
         |  CAST(v.v AS BIGINT) AS vocab
         |FROM top t, bl, v, dc, tot
         |WHERE t.rn <= 10 AND bl.lang = t.lang AND dc.lang = t.lang
         |ORDER BY t.lang, t.rn""".stripMargin,

    "q292_nb_confusion" ->
      s"""WITH cell AS ($nbCellSql),
         |bl AS (SELECT lang, SUM(cnt) AS t_l FROM cell GROUP BY 1),
         |v AS (SELECT COUNT(DISTINCT tok) AS v FROM cell),
         |dc AS (SELECT lang, COUNT(*) AS d_l FROM documents
         |       WHERE doc_id % 2 = 0 GROUP BY 1),
         |tot AS (SELECT SUM(d_l) AS dd FROM dc),
         |ls AS (
         |  SELECT bl.lang AS clang,
         |    CAST(ROUND(1000000 * LN(1.0 / CAST(bl.t_l + v.v AS DOUBLE)), 0)
         |      AS BIGINT) AS unseen_lpm,
         |    CAST(ROUND(1000000 * LN(CAST(dc.d_l AS DOUBLE) / tot.dd), 0)
         |      AS BIGINT) AS prior_lpm
         |  FROM bl, v, dc, tot WHERE dc.lang = bl.lang),
         |model AS (
         |  SELECT cell.lang AS clang, cell.tok,
         |    CAST(ROUND(1000000 * LN(CAST(cell.cnt + 1 AS DOUBLE) /
         |      CAST(bl.t_l + v.v AS DOUBLE)), 0) AS BIGINT) AS lpm
         |  FROM cell, bl, v WHERE bl.lang = cell.lang),
         |tt AS (
         |  SELECT doc_id, true_lang, tok, COUNT(*) AS tcnt
         |  FROM (SELECT doc_id, lang AS true_lang,
         |          unnest($alphaTokensSql) AS tok
         |        FROM documents WHERE doc_id % 2 <> 0) z
         |  GROUP BY 1, 2, 3),
         |sc AS (
         |  SELECT tt.doc_id, tt.true_lang, ls.clang,
         |    ls.prior_lpm + SUM(tt.tcnt * COALESCE(m.lpm, ls.unseen_lpm))
         |      AS score
         |  FROM tt CROSS JOIN ls
         |  LEFT JOIN model m ON m.clang = ls.clang AND m.tok = tt.tok
         |  GROUP BY 1, 2, 3, ls.prior_lpm),
         |pred AS (
         |  SELECT doc_id, true_lang, clang AS pred_lang,
         |    ROW_NUMBER() OVER (PARTITION BY doc_id
         |      ORDER BY score DESC, clang DESC) AS rn
         |  FROM sc),
         |p1 AS (SELECT * FROM pred WHERE rn = 1),
         |acc AS (
         |  SELECT ROUND(SUM(CASE WHEN true_lang = pred_lang THEN 1
         |    ELSE 0 END) * 1.0 / COUNT(*), 6) AS accuracy FROM p1)
         |SELECT true_lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n,
         |  acc.accuracy
         |FROM p1, acc GROUP BY 1, 2, acc.accuracy
         |ORDER BY true_lang, pred_lang""".stripMargin,

    "q293_pr_curve" ->
      s"""WITH base AS ($scoredBaseSql),
         |g AS (
         |  SELECT sm, SUM(lab) AS np, COUNT(*) - SUM(lab) AS nn
         |  FROM base GROUP BY 1),
         |tot AS (SELECT SUM(np) AS p FROM g),
         |c AS (
         |  SELECT sm, np,
         |    SUM(np) OVER (ORDER BY sm DESC) AS tp,
         |    SUM(nn) OVER (ORDER BY sm DESC) AS fp
         |  FROM g),
         |ap AS (
         |  SELECT SUM(CASE WHEN np > 0 THEN CAST(ROUND(
         |      1000000.0 * np * tp / (tp + fp), 0) AS BIGINT)
         |    ELSE 0 END) AS apm FROM c)
         |SELECT CAST(c.sm AS INT) AS thr,
         |  CAST(c.tp AS BIGINT) AS tp, CAST(c.fp AS BIGINT) AS fp,
         |  CAST(tot.p - c.tp AS BIGINT) AS fn,
         |  ROUND(CAST(c.tp AS DOUBLE) / (c.tp + c.fp), 6) AS precision,
         |  ROUND(CAST(c.tp AS DOUBLE) / tot.p, 6) AS recall,
         |  ROUND(CAST(ap.apm AS DOUBLE) / (tot.p * 1000000.0), 6) AS ap
         |FROM c, tot, ap ORDER BY thr DESC""".stripMargin,

    "q294_info_gain" -> {
      def t6(x: String, r: String) =
        s"""CAST(CASE WHEN $x = 0 THEN 0 ELSE
           |  ROUND((CAST($x AS DOUBLE) / nn) *
           |    LN(CAST($x AS DOUBLE) / $r), 6) END AS DECIMAL(18,6))""".stripMargin
      s"""WITH base AS (
         |  SELECT doc_id,
         |    CASE WHEN list_contains(${TextAnalysis.tokensSql}, 'dup')
         |      THEN 1 ELSE 0 END AS lab,
         |    $alphaTokensSql AS ats
         |  FROM documents),
         |tot AS (SELECT COUNT(*) AS nn, SUM(lab) AS p FROM base),
         |cell AS (
         |  SELECT tok, COUNT(*) AS n_t, SUM(lab) AS n1
         |  FROM (SELECT lab, unnest(list_distinct(ats)) AS tok FROM base) z
         |  GROUP BY 1),
         |sc AS (
         |  SELECT tok, n_t, n1, n_t - n1 AS n0,
         |    p - n1 AS a1, nn - p - (n_t - n1) AS a0, nn - n_t AS n_a,
         |    nn, p
         |  FROM cell, tot),
         |ig AS (
         |  SELECT tok, n_t, n1,
         |    CAST(-(${t6("p", "nn")} + ${t6("nn - p", "nn")})
         |      - (-(${t6("n1", "n_t")} + ${t6("n0", "n_t")} +
         |           ${t6("a1", "n_a")} + ${t6("a0", "n_a")}))
         |      AS DOUBLE) AS ig
         |  FROM sc),
         |rk AS (
         |  SELECT tok, n_t, n1, ig,
         |    ROW_NUMBER() OVER (ORDER BY ig DESC, tok DESC) AS rn
         |  FROM ig)
         |SELECT CAST(rn AS INT) AS rn, tok,
         |  CAST(n_t AS BIGINT) AS n_with, CAST(n1 AS BIGINT) AS n_pos_with,
         |  ig
         |FROM rk WHERE rn <= 20 ORDER BY rn""".stripMargin
    },

    "q295_decision_stump" ->
      s"""WITH base AS ($scoredBaseSql),
         |g AS (SELECT sm, COUNT(*) AS n, SUM(lab) AS p FROM base GROUP BY 1),
         |tot AS (SELECT SUM(n) AS nn, SUM(p) AS pp FROM g),
         |c AS (
         |  SELECT sm AS thr,
         |    SUM(n) OVER (ORDER BY sm) AS nl,
         |    SUM(p) OVER (ORDER BY sm) AS pl
         |  FROM g),
         |r AS (
         |  SELECT thr, nl, pl, nn - nl AS nr, pp - pl AS pr, nn, pp,
         |    CAST((CAST((pl * pl + (nl - pl) * (nl - pl)) * (nn - nl) +
         |      ((pp - pl) * (pp - pl) +
         |       (nn - nl - pp + pl) * (nn - nl - pp + pl)) * nl AS HUGEINT)
         |      * 1000000000000) // CAST(nl * (nn - nl) AS HUGEINT)
         |      AS BIGINT) AS sc
         |  FROM c, tot WHERE nl < nn),
         |best AS (
         |  SELECT thr AS bthr FROM r
         |  ORDER BY sc DESC, thr ASC LIMIT 1)
         |SELECT CAST(thr AS INT) AS thr,
         |  CAST(nl AS BIGINT) AS n_left, CAST(pl AS BIGINT) AS pos_left,
         |  CAST(nr AS BIGINT) AS n_right, CAST(pr AS BIGINT) AS pos_right,
         |  ROUND(CAST(pl * pl + (nl - pl) * (nl - pl) AS DOUBLE) / (nn * nl)
         |    + CAST(pr * pr + (nr - pr) * (nr - pr) AS DOUBLE) / (nn * nr)
         |    - CAST(pp * pp + (nn - pp) * (nn - pp) AS DOUBLE) / (nn * nn),
         |    6) AS gain,
         |  thr = best.bthr AS is_best
         |FROM r, best ORDER BY thr""".stripMargin
  )
}
