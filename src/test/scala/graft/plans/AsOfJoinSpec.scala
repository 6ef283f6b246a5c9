package graft.plans

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** The native as-of join operator: plan shape (the custom physical
  * operator fires, with NO window machinery), edge semantics on a
  * synthetic fixture where every case has a hand-derived answer, and
  * partitioning invariance (the merge must not depend on how rows
  * land in partitions — EnsureRequirements' exchanges make that so).
  */
class AsOfJoinSpec extends SparkSpec {

  import spark.implicits._

  private def leftDf = Seq(
    // (pid, key, time)
    (1L, 10L, 100L), // exact-tie boundary: click AT 100 must NOT match
    (2L, 10L, 150L), // strictly-after: latest of {100, 120} wins
    (3L, 10L, 121L), // ties on right time 120: greatest tiebreak wins
    (4L, 20L, 500L), // key with no clicks at all → null
    (5L, 30L, 50L),  // clicks exist but all AFTER → null
    (6L, 40L, 999L)  // single candidate, far past → still matches
  ).toDF("pid", "key", "t")

  private def rightDf = Seq(
    // (rkey, rtime, rid)
    (10L, 100L, 7L),
    (10L, 120L, 8L),
    (10L, 120L, 9L), // same instant as rid=8 — tiebreak: 9 wins
    (30L, 60L, 11L),
    (40L, 1L, 12L)
  ).toDF("rkey", "rt", "rid")

  private def joined =
    AsOfJoin.join(leftDf, rightDf, "key", "rkey", "t", "rt", "rid")
      .select(col("pid"), col("rid"), col("rt"))
      .orderBy(col("pid"))

  test("as-of semantics: strict time bound, tie-break on the greatest " +
    "id, null-padded when nothing precedes") {
    val got = joined.collect().map(r =>
      (r.getLong(0),
        if (r.isNullAt(1)) null else r.getLong(1),
        if (r.isNullAt(2)) null else r.getLong(2))).toSeq
    val want = Seq(
      (1L, null, null),      // rt=100 not < t=100
      (2L, 9L, 120L),        // latest below 150 is 120; tiebreak 9 > 8
      (3L, 9L, 120L),        // 121 > 120, strict bound satisfied
      (4L, null, null),      // no rows for key 20
      (5L, null, null),      // only click at 60 > 50
      (6L, 12L, 1L))
    assert(got == want, s"got $got")
  }

  test("the plan runs the custom physical operator — no window, no " +
    "standard join") {
    val plan = joined.queryExecution.executedPlan.toString()
    assert(plan.contains("AsOfJoin"), s"custom operator missing:\n$plan")
    assert(!plan.contains("Window") && !plan.contains("SortMergeJoin") &&
      !plan.contains("BroadcastHashJoin"),
      s"as-of fell back to composed machinery:\n$plan")
    // and both children carry the required (key, time) sort
    assert(plan.contains("Sort"), s"children not sorted:\n$plan")
  }

  test("result is invariant to input partitioning") {
    val base = joined.collect().toSeq
    val reshuffled = AsOfJoin.join(
      leftDf.repartition(7, col("t")),   // deliberately NOT by key
      rightDf.repartition(3, col("rid")),
      "key", "rkey", "t", "rt", "rid")
      .select(col("pid"), col("rid"), col("rt"))
      .orderBy(col("pid")).collect().toSeq
    assert(base == reshuffled)
  }

  test("q222 rides the operator end-to-end and matches q55's window " +
    "composition where their semantics coincide") {
    // q55: most recent click strictly before in (ts, event_id) order;
    // q222: greatest ts strictly below, ties by greatest id. The two
    // rules agree whenever no click shares a purchase's exact ts —
    // true of the fixture (FixtureContractSpec pins event_id-unique
    // rows; exact ts collisions across types would differ) — so on
    // the matched subset the chosen click ids must be identical.
    val native = SparkEntry.queries("q222_asof_join_native")(spark, sf001)
      .select(col("event_id"), col("prev_click"))
    val window = SparkEntry.queries("q55_asof_join")(spark, sf001)
      .select(col("event_id"), col("prev_click"))
    val diff = native.exceptAll(window).count() +
      window.exceptAll(native).count()
    assert(diff == 0, s"native vs window as-of: $diff differing rows")
  }
}
