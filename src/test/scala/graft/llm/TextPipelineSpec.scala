package graft.llm

import graft.SparkSpec

/** Invariants for the corpus-preparation pipeline ops. */
class TextPipelineSpec extends SparkSpec {

  test("q80 tfidf: ubiquitous terms weigh zero, ranks are 1..k per doc") {
    val rows = TextPipeline.queries("q80_tfidf")(spark, sf001).collect()
    val nDocs = graft.Tables.documents(spark, sf001).count()
    rows.filter(_.getLong(3) == nDocs)
      .foreach(r => assert(r.getDouble(4) == 0.0,
        s"df == N must zero the weight: $r"))
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getInt(5)).sorted.sameElements(1 to rs.length))
    }
  }

  test("q128's bigram stage is the codegen AdjacentPairs expression, " +
    "not a CodegenFallback higher-order function") {
    // HOFs (ArrayTransform/ArrayFilter) are CodegenFallback: one in the
    // scan projection breaks the whole stage out of codegen — the
    // round-6 bench measured q128's HOF form as the registry's most
    // expensive query. Pin the fix structurally so a refactor can't
    // silently reintroduce the interpreted path.
    val plan = TextPipeline.queries("q128_repetition_quality")(spark, sf001)
      .queryExecution.optimizedPlan.toString()
    assert(plan.contains("graft_adjacent_pairs"),
      "q128 lost its native bigram expression")
    assert(!plan.contains("transform("),
      "q128 regrew an interpreted transform() lambda")
    assert(!plan.contains("filter(split("),
      "the tokenizer regrew its interpreted filter() lambda")
  }

  test("q81 pii scrub finds the injected PII and leaves none behind") {
    val rows = TextPipeline.queries("q81_pii_scrub")(spark, sf001).collect()
    assert(rows.forall(_.getInt(1) >= 1), "every doc got an email injected")
    assert(rows.forall(_.getInt(2) >= 1), "every doc got a phone injected")
    val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}".r
    rows.foreach { r =>
      val tail = r.getString(3)
      assert(emailRe.findFirstIn(tail).isEmpty, s"residual email in: $tail")
      assert(tail.contains("<PHONE>"), s"expected scrub tag in: $tail")
    }
  }

  test("q82 vocab: ranks sequential, frequencies non-increasing, " +
    "shares are a sub-distribution") {
    val rows = TextPipeline.queries("q82_vocab_topk")(spark, sf001).collect()
    assert(rows.map(_.getInt(3)).sameElements(1 to rows.length))
    val freqs = rows.map(_.getLong(1))
    assert(freqs.zip(freqs.tail).forall { case (a, b) => a >= b })
    val shareSum = rows.map(_.getDouble(2)).sum
    assert(shareSum > 0.0 && shareSum <= 1.0 + 1e-9)
  }

  test("q134's repeated corpus subtrees dedupe at runtime — AQE reuses " +
    "the identical unigram/bigram exchanges the static plan repeats") {
    // PlanBudgetSpec carries a static-count override for q134 (11
    // pre-AQE exchanges); this is the proof the overage is not real
    // work: the five corpus-scan subtrees collapse onto the same two
    // aggregates once exchange reuse runs.
    val df = graft.SparkEntry.queries("q134_bigram_pmi")(spark, sf001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage"),
      s"no runtime exchange reuse in the final adaptive plan:\n$plan")
  }

  test("q142's scored-docs subtree dedupes at runtime — the bounds " +
    "branch reuses the main branch's exchanges") {
    // PlanBudgetSpec carries a static-count override for q142 (15
    // pre-AQE exchanges): the tertile-bounds branch repeats the whole
    // tokenise→model-join→per-doc-score pipeline in the static plan,
    // and this is the proof the repeat is not executed twice.
    val df = graft.SparkEntry.queries("q142_ccnet_bucket")(spark, sf001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage"),
      s"no runtime exchange reuse in the final adaptive plan:\n$plan")
  }

  test("q211 releases its (doc,term) cache and ranks coherently") {
    // q211 persists the single tokenize→(doc,term) pass (its four
    // consumers prune different columns, so AQE exchange reuse cannot
    // dedupe them — the cache IS the single-corpus-pass claim) and
    // must release it before returning: a leaked cache would pin
    // corpus-sized blocks for the rest of the session.
    spark.sharedState.cacheManager.clearCache()
    val rows = graft.SparkEntry.queries("q211_bm25_topk")(spark, sf001)
      .collect()
    assert(spark.sharedState.cacheManager.isEmpty,
      "q211 leaked its persisted (doc,term) stage")
    assert(rows.map(_.getAs[Int]("rank")).toSeq == (1 to rows.length),
      "ranks are not contiguous from 1")
    val scores = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
      "scores are not non-increasing in rank order")
    assert(scores.forall(_ > 0.0), "BM25 scores should be positive")
  }

  test("the vocabulary/stats tables BROADCAST into their scoring joins " +
    "(q136 unigram model, q140 per-lang percentile bounds) — the scale " +
    "claim each query's comment makes") {
    for (q <- Seq("q136_unigram_logprob", "q140_length_winsorize")) {
      val plan = graft.SparkEntry.queries(q)(spark, sf001)
        .queryExecution.executedPlan.toString()
      assert(plan.contains("BroadcastHashJoin"),
        s"$q: model/stats join is not a broadcast join:\n$plan")
      assert(!plan.contains("SortMergeJoin"),
        s"$q: corpus-side shuffle join appeared:\n$plan")
    }
  }

  test("q144 finds real URL dedup structure and q146 emits a valid " +
    "sampling plan (weights <= 1, achieved mix sums to 1)") {
    val urls = graft.SparkEntry.queries("q144_url_canonicalize")(spark, sf001)
      .collect()
    assert(urls.nonEmpty)
    // doc_id%50 paths inside doc_id%20 domains guarantee canonical
    // collisions once a domain holds >= 6 docs
    assert(urls.exists(r => r.getInt(2) < r.getInt(1)),
      "no canonical-URL collisions found")
    val mix = graft.SparkEntry.queries("q146_source_mix_weights")(spark, sf001)
      .collect()
    assert(mix.forall(_.getDouble(4) <= 1.0 + 1e-9), "weight above 1")
    val share = mix.map(_.getDouble(6)).sum
    assert(math.abs(share - 1.0) < 1e-3, s"achieved mix sums to $share")
  }

  test("q146's source rollup dedupes at runtime — the totals branches " +
    "reuse the corpus rollup's exchange (PlanBudgetSpec override proof)") {
    val df = graft.SparkEntry.queries("q146_source_mix_weights")(spark, sf001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage"),
      s"no runtime exchange reuse in the final adaptive plan:\n$plan")
  }

  test("q187 BPE encode: token-count conservation (chars - merges = " +
    "tokens), ids_csv arity matches n_tokens, and merges actually fire") {
    val rows = graft.SparkEntry.queries("q187_bpe_tokenize")(spark, sf001)
      .collect()
    assert(rows.nonEmpty)
    // per doc: every symbol is 1 or 2 chars; each 2-char symbol is one
    // merge; pre-merge char count = n_tokens + n_merged
    import org.apache.spark.sql.functions._
    val charCounts = graft.Tables.documents(spark, sf001)
      .select(col("doc_id"), aggregate(
        array_remove(split(lower(col("text")), "[^a-z]+"), ""),
        lit(0L), (acc, t) => acc + length(t)).as("n_alpha"))
      .collect().map(r => r.get(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (nTok, nMerged) = (r.getLong(1), r.getLong(2))
      assert(nTok + nMerged == charCounts(r.get(0)),
        s"doc ${r.get(0)}: $nTok tokens + $nMerged merges != " +
          s"${charCounts(r.get(0))} alpha chars")
      assert(r.getString(3).count(_ == ',') + 1 == nTok,
        s"doc ${r.get(0)}: ids_csv arity != n_tokens")
    }
    assert(rows.map(_.getLong(2)).sum > 0,
      "no merge ever fired — the rank-ordered replace passes are dead")
  }

  test("q189 packs exactly the BPE token mass q187 emits: bin_tokens " +
    "sums to total n_tokens, and bins are contiguous from 0 per " +
    "(lang, shard) — no doc on this fixture exceeds one 512-token bin") {
    val packed = graft.SparkEntry.queries("q189_pack_bpe_tokens")(
      spark, sf001).collect()
    val tokenized = graft.SparkEntry.queries("q187_bpe_tokenize")(
      spark, sf001).collect()
    assert(packed.nonEmpty)
    assert(packed.map(_.getLong(4)).sum == tokenized.map(_.getLong(1)).sum,
      "packing lost or invented tokens")
    packed.groupBy(r => (r.getString(0), r.getInt(1))).foreach {
      case (_, rs) =>
        val bins = rs.map(_.getLong(2)).sorted
        assert(bins.head == 0 && bins.sameElements(bins.head to bins.last),
          s"bins not contiguous from 0: ${bins.mkString(",")}")
    }
  }

  test("q187's greedy pass order is rank-major: a higher-rank merge " +
    "consumes a char before a lower-rank one can pair with it") {
    // 'abc' under rules rank1="bc", rank2="ab": true BPE (rank-major)
    // yields [a, bc]; a single any-rule left-to-right pass would
    // wrongly yield [ab, c]. Reproduce the engine's wrapped-string
    // fold exactly as q187 composes it.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val ranked = Seq("bc", "ab")
    val wrapped = concat(lit("|"), array_join(split(col("tok"), ""),
      "||"), lit("|"))
    val encoded = ranked.foldLeft(wrapped)((c, p) =>
      replace(c, lit(s"|${p(0)}||${p(1)}|"), lit(s"|$p|")))
    val out = Seq("abc").toDF("tok")
      .select(split(trim(encoded, "|"), "\\|\\|").as("syms"))
      .as[Seq[String]].head()
    assert(out == Seq("a", "bc"), s"got $out")
    // and the aaa/aa overlap rule: leftmost-first non-overlapping
    val out2 = Seq("aaaa", "aaa").toDF("tok")
      .select(split(trim(Seq("aa").foldLeft(wrapped)((c, p) =>
        replace(c, lit(s"|${p(0)}||${p(1)}|"), lit(s"|$p|"))), "|"),
        "\\|\\|").as("syms"))
      .as[Seq[String]].collect().toSeq
    assert(out2 == Seq(Seq("aa", "aa"), Seq("aa", "a")), s"got $out2")
  }
}
