package graft.operators

import graft.{SparkEntry, SparkSpec}

/** Pins that Spark 4 plans q24's `row_number() <= k` filter through
  * WindowGroupLimitExec — the partial per-group top-k that runs BEFORE
  * the window sort's shuffle, so each map task forwards at most k rows
  * per group instead of the whole group (the window-side analogue of
  * q213's collect_top_k heap aggregate, which TopKAggSpec pins). If a
  * Spark upgrade or a query edit ever re-shapes q24 so the
  * group-limit optimization stops firing, the full-group sort comes
  * back silently — this spec makes that a red test instead.
  */
class WindowGroupLimitSpec extends SparkSpec {

  test("q24's rank filter plans a WindowGroupLimit partial top-k") {
    val plan = SparkEntry.queries("q24_topk_per_group")(spark, sf001)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("WindowGroupLimit"),
      s"q24 no longer plans WindowGroupLimitExec — the rn<=3 filter is " +
        s"being evaluated AFTER a full per-group window sort:\n$plan")
    // and both phases (Partial before the shuffle, Final after) fire —
    // the partial phase is what bounds the shuffle to k rows per group
    // per map task
    assert(plan.contains("Partial"),
      s"q24's WindowGroupLimit lost its partial (pre-shuffle) phase:\n$plan")
  }
}
