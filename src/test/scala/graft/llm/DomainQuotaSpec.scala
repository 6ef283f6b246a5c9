package graft.llm

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pins q209's (and q181's) two-phase ranking against the naive
  * per-source window it replaced (round-10 verdict: a window
  * partitioned ONLY by `source` funnels each source's entire corpus
  * share into one task — bounded per-domain STATE is not bounded
  * per-domain PARTITION). Two contracts:
  *
  *  1. Semantics unchanged: the bucketed two-phase evaluation emits
  *     the exact ledger/ranks the single-window formulation defines —
  *     the quota rule (`prior < budget` under longest-first order) and
  *     the QN rank (`row_number` under shortest-first order) are
  *     order-theoretic statements, and bucketing by a monotone
  *     function of the sort key must not change them.
  *
  *  2. No fat partitions: every window in both plans partitions on
  *     the (source, bucket) pair — never on `source` alone — so no
  *     window partition carries more than one bucket of one source.
  *     PlanBudgetSpec's constant-cardinality gate enforces the same
  *     registry-wide; this is the targeted positive proof.
  */
class DomainQuotaSpec extends SparkSpec {

  private def toks = array_remove(split(lower(col("text")), "[^a-z]+"), "")

  test("q209 two-phase ledger equals the naive per-source window ledger") {
    val got = SparkEntry.queries("q209_domain_quota")(spark, sf001)
    val budget = 1000L
    val w = Window.partitionBy(col("source"))
      .orderBy(col("n_chars").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ref = Tables.documents(spark, sf001)
      .select(col("doc_id"), col("source"), col("n_chars"),
        size(toks).cast("long").as("n_tok"))
      .withColumn("prior", coalesce(sum(col("n_tok")).over(w), lit(0L)))
      .withColumn("kept", col("prior") < budget)
      .groupBy(col("source"))
      .agg(count(lit(1)).cast("int").as("n_docs"),
        sum(when(col("kept"), 1).otherwise(0)).cast("int").as("n_kept"),
        sum(when(col("kept"), col("n_tok")).otherwise(0L)).as("tokens_kept"),
        sum(when(!col("kept"), col("n_tok")).otherwise(0L))
          .as("tokens_dropped"))
    val diff = got.exceptAll(ref).count() + ref.exceptAll(got).count()
    assert(diff == 0, s"two-phase vs naive-window ledger: $diff differing rows")
    // the straddling class must actually be exercised, or this test
    // proves nothing about the windowed branch: at least one source
    // must have both kept and dropped docs
    val straddle = got.filter(col("tokens_dropped") > 0 && col("n_kept") > 0)
      .count()
    assert(straddle > 0, "fixture exercises no budget-straddling source")
  }

  test("q181 two-phase ranks equal the naive per-source window ranks") {
    val got = SparkEntry.queries("q181_quantile_normalize")(spark, sf001)
    val wr = Window.partitionBy(col("source"))
      .orderBy(col("n_chars"), col("doc_id"))
    val r = Tables.documents(spark, sf001)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("rk", row_number().over(wr))
    val m = r.groupBy(col("rk"))
      .agg(round(avg(col("n_chars")), 6).as("calibrated"))
    val ref = r.join(m, "rk")
      .select(col("doc_id"), col("source"), col("n_chars"),
        col("rk").cast("int").as("rk"), col("calibrated"))
    val diff = got.exceptAll(ref).count() + ref.exceptAll(got).count()
    assert(diff == 0, s"two-phase vs naive-window QN: $diff differing rows")
  }

  test("every window in q209/q181 partitions on (source, bucket), " +
    "never source alone") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LW}
    for (q <- Seq("q209_domain_quota", "q181_quantile_normalize")) {
      val windows = SparkEntry.queries(q)(spark, sf001)
        .queryExecution.optimizedPlan.collect { case w: LW => w }
      assert(windows.nonEmpty, s"$q: expected a windowed branch")
      windows.foreach { w =>
        val names = w.partitionSpec.flatMap(_.references.map(_.name)).toSet
        assert(names.contains("b") && names.contains("source"),
          s"$q: window partitions on $names — must be (source, b) so no " +
            "partition carries more than one bucket of one source")
      }
    }
  }
}
