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

  test("randomized: the operator equals a brute-force as-of reference " +
    "on 30 seeded datasets with heavy key/time collisions") {
    // Small domains (8 keys, 12 times, ids 0..99) force the edge cases
    // — exact-time boundaries, duplicate times needing the tiebreak,
    // keys present on one side only — to occur constantly.
    val rnd = new scala.util.Random(20260814L)
    for (round <- 1 to 30) {
      val lRows = Seq.fill(40)((rnd.nextInt(100).toLong,
        rnd.nextInt(8).toLong, rnd.nextInt(12).toLong))
      val rRows = Seq.fill(60)((rnd.nextInt(8).toLong,
        rnd.nextInt(12).toLong, rnd.nextInt(100).toLong))
      val l = lRows.toDF("pid", "key", "t")
      val r = rRows.toDF("rkey", "rt", "rid")
      val got = AsOfJoin.join(l, r, "key", "rkey", "t", "rt", "rid")
        .select(col("pid"), col("key"), col("t"), col("rid"))
        .collect()
        .map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
          if (x.isNullAt(3)) -1L else x.getLong(3)))
        .sorted
      val want = lRows.map { case (pid, k, t) =>
        val cand = rRows.filter(rr => rr._1 == k && rr._2 < t)
        val best = if (cand.isEmpty) -1L
          else cand.maxBy(rr => (rr._2, rr._3))._3
        (pid, k, t, best)
      }.sorted
      assert(got.toSeq == want,
        s"round $round: operator diverged from brute force")
    }
  }

  test("null keys and null times match nothing and crash nothing") {
    import org.apache.spark.sql.types._
    import scala.jdk.CollectionConverters._
    val lSchema = StructType(Seq(StructField("pid", LongType),
      StructField("key", LongType), StructField("t", LongType)))
    val rSchema = StructType(Seq(StructField("rkey", LongType),
      StructField("rt", LongType), StructField("rid", LongType)))
    val l = spark.createDataFrame(Seq(
      org.apache.spark.sql.Row(1L, 10L, 100L),
      org.apache.spark.sql.Row(2L, null, 100L),   // null key
      org.apache.spark.sql.Row(3L, 10L, null)     // null time
    ).asJava, lSchema)
    val r = spark.createDataFrame(Seq(
      org.apache.spark.sql.Row(10L, 50L, 7L),
      org.apache.spark.sql.Row(10L, null, 8L),    // null right time
      org.apache.spark.sql.Row(null, 50L, 9L)     // null right key
    ).asJava, rSchema)
    val got = AsOfJoin.join(l, r, "key", "rkey", "t", "rt", "rid")
      .select(col("pid"), col("rid")).orderBy(col("pid")).collect()
      .map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1)))
      .toSeq
    // only pid=1 matches (the real 50 < 100 row); null-key/time left
    // rows and null-key/time right rows all fall out as non-matches
    assert(got == Seq((1L, 7L), (2L, -1L), (3L, -1L)), s"got $got")
  }
}
