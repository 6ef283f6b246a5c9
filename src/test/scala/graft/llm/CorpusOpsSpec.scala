package graft.llm

import graft.SparkSpec

/** Behavioral and plan-shape guarantees for the CorpusOps module
  * (q162–q167): determinism/coverage invariants each query's semantics
  * promise, plus the runtime exchange-reuse proofs backing the
  * PlanBudgetSpec static-count overrides for q163/q165.
  */
class CorpusOpsSpec extends SparkSpec {

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, sf001)

  test("q184 epoch invariants: copy counts are exactly base+residual per " +
    "bucket, the mix shifts toward head, every emitted doc has contiguous " +
    "copy_ids, and two runs emit the identical epoch") {
    val rows = run("q184_epoch_materialize").collect()
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.foreach { case (id, rs) =>
      val n = rs.head.getInt(4)
      assert(rs.map(_.getInt(5)).sorted.sameElements(1 to n),
        s"doc $id: copy_ids not contiguous 1..$n")
      val bucket = rs.head.getString(2)
      val ok = bucket match {
        case "head" => n == 1 || n == 2
        case "middle" => n == 1
        case "tail" => n == 1 // 0-copy tail docs are absent entirely
        case other => fail(s"unknown bucket $other")
      }
      assert(ok, s"doc $id: $bucket with $n copies")
    }
    val nDocs = graft.Tables.documents(spark, sf001).count()
    val emittedDocs = byDoc.size
    assert(emittedDocs < nDocs, "no tail doc was downsampled to zero")
    val headDocs = byDoc.count(_._2.head.getString(2) == "head")
    val headCopies = rows.count(_.getString(2) == "head")
    assert(headCopies > headDocs, "no head doc was upsampled")
    val again = run("q184_epoch_materialize").collect()
      .map(r => (r.getLong(0), r.getInt(5))).sorted
    assert(again.sameElements(
      rows.map(r => (r.getLong(0), r.getInt(5))).sorted),
      "epoch is not reproducible across runs")
  }

  test("q162's shuffle is a pure function of (seed, doc_id): two runs " +
    "agree row-for-row, shards partition the corpus, positions are " +
    "dense ranks within each shard") {
    val a = run("q162_deterministic_shuffle").collect()
    val b = run("q162_deterministic_shuffle").collect()
    assert(a.toSeq == b.toSeq, "shuffle is not reproducible")
    assert(a.map(_.getLong(0)).distinct.length == a.length)
    val byShard = a.groupBy(_.getInt(2))
    assert(byShard.keySet.subsetOf((0 until 8).toSet))
    byShard.foreach { case (shard, rows) =>
      val ps = rows.map(_.getInt(3)).sorted
      assert(ps.toSeq == (1 to rows.length).toSeq,
        s"shard $shard positions are not dense: ${ps.take(5).toSeq}...")
    }
  }

  test("q163 never exceeds the token budget, and no unselected doc " +
    "from a fully-kept bucket exists (the selection is best-first)") {
    import spark.implicits._
    val sel = run("q163_token_budget_select").collect()
    val docs = graft.Tables.documents(spark, sf001)
    val total = docs
      .select(org.apache.spark.sql.functions.expr(
        "sum(size(filter(split(text, '\\\\s+'), t -> t != '')))"))
      .as[Long].head()
    val budget = total / 2
    assert(sel.map(_.getLong(2)).sum <= budget,
      s"selected tokens exceed budget $budget")
    // greedy fill: adding the smallest unselected doc of the boundary
    // bucket must overflow the budget (selection is maximal in order)
    assert(sel.nonEmpty && sel.map(_.getLong(0)).distinct.length == sel.length)
  }

  test("q163's static union branches dedupe at runtime — AQE reuses the " +
    "scored-docs exchanges (PlanBudgetSpec override proof)") {
    val df = run("q163_token_budget_select")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage"),
      s"no runtime exchange reuse in the final adaptive plan:\n$plan")
  }

  test("q164 flags exactly the docs whose rounded robust z exceeds 2.5, " +
    "and zero-MAD sources degrade to z=0, never a division error") {
    val rows = run("q164_mad_outliers").collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val z = r.getDouble(5)
      assert(!z.isNaN && !z.isInfinite, s"non-finite z for ${r.getLong(0)}")
      assert(r.getBoolean(6) == (math.abs(z) > 2.5))
    }
  }

  test("q165 emits every unordered source pair once with a KS statistic " +
    "in [0,1], and the pairwise self-join reuses the CDF exchanges " +
    "(PlanBudgetSpec override proof)") {
    val df = run("q165_ks_drift")
    val rows = df.collect()
    val srcs = rows.flatMap(r => Seq(r.getString(0), r.getString(1))).distinct
    assert(rows.length == srcs.length * (srcs.length - 1) / 2,
      s"${rows.length} pairs for ${srcs.length} sources")
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1), "pair not canonically ordered")
      val ks = r.getDouble(2)
      assert(ks >= 0.0 && ks <= 1.0, s"KS out of range: $ks")
    }
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage"),
      s"no runtime exchange reuse in the final adaptive plan:\n$plan")
  }

  test("q166's smoothed bigram probabilities are proper: avg_logp < 0, " +
    "ppl = exp(-avg_logp) > 1, and the model tables broadcast into the " +
    "scoring join (the scale claim the query's comment makes)") {
    val df = run("q166_bigram_ppl")
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(2) < 0.0)
      assert(r.getDouble(3) > 1.0)
    }
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("BroadcastHashJoin"),
      s"model join is not a broadcast join:\n$plan")
    assert(!plan.contains("SortMergeJoin"),
      s"a corpus-sized sort-merge join crept into the scoring pass:\n$plan")
  }

  test("q167's statuses are complete and mutually consistent with the " +
    "snapshot carving rules") {
    val rows = run("q167_snapshot_diff").collect()
    rows.foreach { r =>
      val id = r.getLong(0)
      val status = r.getString(1)
      val inA = id % 7 != 0
      val inB = id % 5 != 0
      assert(inA || inB)
      val expected =
        if (!inA) Set("added")
        else if (!inB) Set("removed")
        // the rewrite uppercases; a caseless text stays "unchanged"
        else if (id % 3 == 0) Set("changed", "unchanged")
        else Set("unchanged")
      assert(expected(status), s"doc $id: $status not in $expected")
    }
  }

  test("q198's KMV estimate lands within the 2/sqrt(k) sampling bound " +
    "of the exact Jaccard") {
    val r = CorpusOps.queries("q198_kmv_overlap")(spark, sf001).head()
    val k = r.getAs[Int]("k")
    val est = r.getAs[Double]("est_jaccard")
    val exact = r.getAs[Double]("true_jaccard")
    // the carve makes the true overlap substantial — a sketch that
    // degenerated to disjoint-or-identical would show here first
    assert(exact > 0.3 && exact < 0.9, s"carve produced J=$exact")
    assert(math.abs(est - exact) <= 2.0 / math.sqrt(k.toDouble),
      s"KMV estimate $est too far from exact $exact for k=$k")
  }

  test("q218's importance-resampled selection is genuinely enriched in " +
    "target-exemplar docs vs the raw pool") {
    // The whole point of DSIR is that the selected pool looks more like
    // the target than the raw pool does; if the hashed-LM log-ratio or
    // the Gumbel race broke (e.g. sign flip, model join dropping
    // buckets), selection would regress to uniform and this enrichment
    // vanishes — a semantic check the hash-match oracle can't express.
    // Target = docs carrying the fixture's one discriminative token
    // ('dup'); measured enrichment at β=0.1 is ~2.8× the 5% pool share
    // at sf0.001/0.01 — the 1.5× floor keeps the test robust to
    // fixture regeneration while still catching a signal collapse.
    import org.apache.spark.sql.functions._
    val sel = run("q218_dsir_resample").collect()
    assert(sel.length == 50, s"expected 50 selected, got ${sel.length}")
    val docs = graft.Tables.documents(spark, sf001)
    val isTgt = array_contains(
      array_remove(split(lower(col("text")), "[^a-z]+"), ""), "dup")
    val tgtIds = docs.filter(isTgt).select("doc_id").collect()
      .map(_.getLong(0)).toSet
    val poolShare = tgtIds.size.toDouble / docs.count()
    val selShare = sel.count(r => tgtIds(r.getLong(0))).toDouble / sel.length
    assert(selShare > 1.5 * poolShare,
      f"selection target-share $selShare%.3f not enriched over pool " +
        f"$poolShare%.3f (need >1.5x)")
    // and every selected doc carries a finite importance score
    assert(sel.forall(r => !r.getDouble(2).isNaN && !r.getDouble(2).isInfinite))
  }

  test("q229: AUC is one valid probability repeated on every bin row, " +
    "and the calibration bins partition the corpus") {
    val rows = run("q229_auc_calibration").collect()
    val aucs = rows.map(_.getDouble(4)).distinct
    assert(aucs.length == 1, s"AUC differs across bin rows: ${aucs.toSeq}")
    assert(aucs.head >= 0.0 && aucs.head <= 1.0, s"AUC ${aucs.head}")
    rows.foreach { r =>
      val (pr, avg) = (r.getDouble(2), r.getDouble(3))
      assert(pr >= 0.0 && pr <= 1.0, s"pos_rate $pr")
      assert(avg >= 0.0 && avg <= 1.0, s"avg_score $avg")
      val bin = r.getInt(0)
      // a bin's average score must lie inside the bin's score range
      assert(avg >= bin / 10.0 - 1e-9 && avg < (bin + 1) / 10.0 + 1e-9,
        s"bin $bin avg_score $avg outside [${bin / 10.0}, ${(bin + 1) / 10.0})")
    }
    val n = rows.map(_.getInt(1).toLong).sum
    assert(n == graft.Tables.documents(spark, sf001).count(),
      "bins do not partition the corpus")
  }

  test("q230's repeated bigram/unigram model subtrees dedupe at runtime — " +
    "AQE reuses the model exchanges (PlanBudgetSpec override proof), and " +
    "backoff branch counts partition every doc's scored positions") {
    val df = run("q230_backoff_trigram_lm")
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(1) == r.getInt(2) + r.getInt(3) + r.getInt(4),
        s"doc ${r.getLong(0)}: branches don't sum to n_scored")
      assert(r.getDouble(5) < 0.0, "log-score of a proper ratio must be < 0")
    }
    // held-out scoring must actually exercise backoff somewhere
    assert(rows.map(_.getInt(3).toLong).sum +
      rows.map(_.getInt(4).toLong).sum > 0,
      "no position ever backed off — train/eval carve is broken")
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage"),
      s"no runtime exchange reuse in the final adaptive plan:\n$plan")
  }

  test("q233 emits exactly 5 ranked terms per source with finite " +
    "non-negative chi2, and the repeated tokenize subtree reuses at " +
    "runtime (PlanBudgetSpec override proof)") {
    val df = run("q233_chi2_terms")
    val rows = df.collect()
    val bySrc = rows.groupBy(_.getString(0))
    bySrc.foreach { case (src, rs) =>
      assert(rs.map(_.getInt(1)).sorted.sameElements(1 to 5),
        s"$src: ranks not 1..5")
      val chis = rs.sortBy(_.getInt(1)).map(_.getDouble(4))
      assert(chis.forall(c => c >= 0.0 && !c.isNaN && !c.isInfinite))
      assert(chis.sameElements(chis.sorted.reverse),
        s"$src: chi2 not descending by rank")
    }
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage"),
      s"no runtime exchange reuse in the final adaptive plan:\n$plan")
  }

  test("q234: rendezvous resharding moves exactly shard 7's residents " +
    "while mod resharding reshuffles most of the corpus") {
    val rows = run("q234_rendezvous_shard").collect()
    assert(rows.map(_.getInt(0)).sorted.sameElements(0 to 7))
    rows.foreach { r =>
      val (shard, nH, mH) = (r.getInt(0), r.getInt(1), r.getInt(2))
      if (shard < 7) assert(mH == 0,
        s"shard $shard: HRW moved $mH docs without its shard being removed")
      else assert(mH == nH, s"shard 7: only $mH of $nH residents moved")
    }
    val total = rows.map(_.getInt(3).toLong).sum
    val movedHrw = rows.map(_.getInt(2).toLong).sum
    val movedMod = rows.map(_.getInt(4).toLong).sum
    assert(movedHrw * 4 < movedMod,
      s"HRW movement $movedHrw not ≪ mod movement $movedMod (n=$total)")
  }

  test("q231: every source's bootstrap interval is ordered, finite, and " +
    "n matches the source's row count") {
    val rows = run("q231_bootstrap_ci").collect()
    val sizes = graft.Tables.documents(spark, sf001)
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(_.getString(0)).toSet == sizes.keySet)
    rows.foreach { r =>
      val (lo, hi, mean) = (r.getDouble(3), r.getDouble(4), r.getDouble(2))
      assert(lo <= hi, s"${r.getString(0)}: ci_lo $lo > ci_hi $hi")
      assert(!lo.isNaN && !hi.isNaN && !mean.isNaN)
      assert(r.getInt(1).toLong == sizes(r.getString(0)))
      // a percentile-bootstrap interval of the mean should bracket a
      // neighborhood of the point estimate (loose: within the interval
      // widened by its own width on each side)
      val w = math.max(hi - lo, 1e-6)
      assert(mean >= lo - w && mean <= hi + w,
        s"${r.getString(0)}: mean $mean far outside [$lo, $hi]")
    }
  }
}
