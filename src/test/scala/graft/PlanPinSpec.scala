package graft

import org.apache.spark.sql.DataFrame

/** Pinned physical-plan fingerprints for the most expensive
  * DECLARATIVE queries in the registry (round-8 verdict ask #3): the
  * wall-clock bench gate is noise-bound under driver co-load, so plan
  * regressions on the heavy tail — a join strategy flip, a grown
  * exchange, a lost codegen stage — should fail STRUCTURALLY and
  * deterministically, here, not as a maybe-noise 2× flag.
  *
  * Scope: the top-10 bench-time queries whose work IS their plan. The
  * remaining heavy hitters run their own jobs internally and already
  * have structural gates where their cost lives: q111/q15/q54
  * (BackpropSpec/RbmGoldenSpec golden trajectories + partition
  * invariance), q101/q121/q156/q177 (stream replay specs,
  * watermark-bounded state), q113/q153/q159/q117 (DedupPlanSpec band
  * cache reuse + join shapes), q186 (BucketingSpec zero join-key
  * exchanges after the bucketed write).
  *
  * The fingerprint counts STATIC (pre-AQE) executed-plan lines, the
  * same view PlanBudgetSpec audits: exchange lines, join strategies,
  * whole-stage-codegen spans. Exact equality, not bounds — a pin
  * moving DOWN is news too (it usually means a subtree stopped being
  * planned at all). After a deliberate plan improvement, re-pin via
  * `sbt "Test/runMain graft.PlanPinProbe"`.
  */
object PlanPinSpec {
  /** exch / bhj / smj / shj / bnlj / wsc counts of the static plan. */
  final case class Fp(exch: Int, bhj: Int, smj: Int, shj: Int,
      bnlj: Int, wsc: Int) {
    override def toString =
      s"Fp(exch=$exch, bhj=$bhj, smj=$smj, shj=$shj, bnlj=$bnlj, wsc=$wsc)"
  }

  def fingerprint(df: DataFrame): Fp = {
    // exchange/join counts come from the STATIC (pre-AQE) plan — the
    // deterministic declared shape; codegen stages only exist in the
    // FINAL adaptive plan, so the query is executed (cheap at sf0.001)
    // and `*(n)` node-prefix ids counted DISTINCT afterwards — "a
    // stage split in two" and "a stage fell out of codegen entirely"
    // both move the pin.
    val p = df.queryExecution.executedPlan.toString()
    def c(s: String) = p.linesIterator.count(_.contains(s))
    df.collect()
    val fin = df.queryExecution.executedPlan.toString()
    val wsc = """\*\((\d+)\)""".r.findAllMatchIn(fin).map(_.group(1)).toSet.size
    Fp(c("Exchange"), c("BroadcastHashJoin"), c("SortMergeJoin"),
      c("ShuffledHashJoin"), c("BroadcastNestedLoopJoin"), wsc)
  }

  val pins: Map[String, Fp] = Map(
    // round 14 (optimization): both join inputs pre-aggregate below
    // the bucket join (2 extra partial/final agg exchanges), join
    // intermediate ~37M pair rows → ~150k group rows
    "q118_interval_bucket_join" -> Fp(exch = 5, bhj = 1, smj = 0, shj = 0, bnlj = 0, wsc = 6),
    "q128_repetition_quality" -> Fp(exch = 3, bhj = 0, smj = 0, shj = 0, bnlj = 0, wsc = 4),
    "q148_trigram_langid" -> Fp(exch = 9, bhj = 1, smj = 0, shj = 0, bnlj = 0, wsc = 11),
    "q188_winnow_dedup" -> Fp(exch = 14, bhj = 5, smj = 0, shj = 0, bnlj = 0, wsc = 14),
    "q169_profile_report" -> Fp(exch = 2, bhj = 0, smj = 0, shj = 0, bnlj = 0, wsc = 3),
    "q187_bpe_tokenize" -> Fp(exch = 5, bhj = 1, smj = 0, shj = 0, bnlj = 0, wsc = 5),
    "q176_recursive_cte" -> Fp(exch = 2, bhj = 0, smj = 0, shj = 0, bnlj = 0, wsc = 3),
    "q52_salted_join" -> Fp(exch = 3, bhj = 1, smj = 0, shj = 0, bnlj = 0, wsc = 4),
    "q43_ann_lsh" -> Fp(exch = 6, bhj = 3, smj = 0, shj = 0, bnlj = 0, wsc = 8),
    "q163_token_budget_select" -> Fp(exch = 12, bhj = 1, smj = 0, shj = 0, bnlj = 3, wsc = 14),
    // round-9 heavy additions (verdict ask #7): PQ's encode + LUT join
    // + exact re-rank chain, and the KMV sketch top-k chain
    "q197_ann_pq" -> Fp(exch = 5, bhj = 2, smj = 0, shj = 0, bnlj = 1, wsc = 7),
    "q198_kmv_overlap" -> Fp(exch = 15, bhj = 3, smj = 0, shj = 0, bnlj = 2, wsc = 19),
    // round-13 TPC-H join-stress shapes: the pins assert the broadcast
    // discipline (dimension legs NEVER sort-merge; the only SMJ-class
    // work is fact⋈fact, and at sf0.001 even those broadcast)
    "q358_tpch_q7" -> Fp(exch = 7, bhj = 5, smj = 0, shj = 0, bnlj = 0, wsc = 8),
    "q359_tpch_q8" -> Fp(exch = 9, bhj = 7, smj = 0, shj = 0, bnlj = 0, wsc = 10),
    // round-14 TPC-H: Q21's chained-EXISTS collapse (the anti-join
    // shape must never degrade to BNLJ — round-13 verdict #4's pin)
    // and Q9's triple-fact profit join over the partsupp surrogate
    "q367_tpch_q21" -> Fp(exch = 8, bhj = 4, smj = 0, shj = 0, bnlj = 0, wsc = 8),
    "q371_tpch_q9" -> Fp(exch = 7, bhj = 5, smj = 0, shj = 0, bnlj = 0, wsc = 8))
  /** q358's bilateral-trade population is EMPTY at sf0.001 (AQE
    * propagates the empty relation and erases the codegen spans), so
    * its pin runs at sf0.01 where the plan is the real 3-fact shape.
    */
  val pinDir: Map[String, String] =
    Map("q358_tpch_q7" -> "/root/testdata/sf0.01")

  def pinned: Seq[String] = Seq(
    "q118_interval_bucket_join", "q128_repetition_quality",
    "q148_trigram_langid", "q188_winnow_dedup", "q169_profile_report",
    "q187_bpe_tokenize", "q176_recursive_cte", "q52_salted_join",
    "q43_ann_lsh", "q163_token_budget_select", "q197_ann_pq",
    "q198_kmv_overlap", "q358_tpch_q7", "q359_tpch_q8",
    "q367_tpch_q21", "q371_tpch_q9")
}

class PlanPinSpec extends SparkSpec {
  test("heavy-tail query plans match their pinned structural fingerprints") {
    val offenders = PlanPinSpec.pinned.flatMap { name =>
      val dir = PlanPinSpec.pinDir.getOrElse(name, sf001)
      val got = PlanPinSpec.fingerprint(SparkEntry.queries(name)(spark, dir))
      val want = PlanPinSpec.pins(name)
      if (got != want) Some(s"$name: got $got, pinned $want") else None
    }
    assert(offenders.isEmpty,
      offenders.mkString("", "\n", "\n— a deliberate plan change? re-pin " +
        "with `sbt \"Test/runMain graft.PlanPinProbe\"`"))
  }
}
