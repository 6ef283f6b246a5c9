package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import graft.{Confs, PlanWalk, SparkSpec}

/** Pins q193's actual claim — Catalyst injects the bloom probe and the
  * probe kills fact rows BEFORE the shuffle — which the oracle (result
  * equality) cannot see: the exact join re-checks every bloom survivor,
  * so a never-injected filter would stay green forever.
  */
class RuntimeFilterSpec extends SparkSpec {

  /** Runs the frame and returns (final plan string, total shuffle
    * records written across all exchanges incl. subqueries).
    */
  private def run(df: DataFrame): (String, Long) = {
    df.collect()
    val plan = df.queryExecution.executedPlan
    val recs = PlanWalk.nodes(plan)
      .collect { case e: ShuffleExchangeExec => e }
      .map(_.metrics("shuffleRecordsWritten").value).sum
    (plan.toString(), recs)
  }

  test("bloom probe is injected and kills fact rows before the shuffle") {
    val (plan, withFilter) = Confs.withConfs(spark, JoinOps.runtimeFilterConfs) {
      run(JoinOps.runtimeFilterJoinFrame(spark, sf001))
    }
    // Spark 4 renders the probe as might_contain(<subquery>) fed by a
    // bloom_filter_agg subquery aggregate
    assert(plan.contains("might_contain") && plan.contains("bloom_filter_agg"),
      s"no runtime bloom probe in the final plan:\n$plan")
    val off = JoinOps.runtimeFilterConfs :+
      ("spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false")
    val (plainPlan, without) = Confs.withConfs(spark, off) {
      run(JoinOps.runtimeFilterJoinFrame(spark, sf001))
    }
    assert(!plainPlan.contains("might_contain"))
    // '1-URGENT' keeps ~18% of orders; even charging the probe's own
    // subquery shuffle, the filtered run must move under half the rows
    assert(withFilter * 2 < without,
      s"bloom probe did not reduce shuffle volume: $withFilter vs $without")
  }

  test("the runtime filter is result-invisible") {
    val filtered = Confs.withConfs(spark, JoinOps.runtimeFilterConfs) {
      JoinOps.runtimeFilterJoinFrame(spark, sf001).collect()
    }
    val off = JoinOps.runtimeFilterConfs :+
      ("spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false")
    val plain = Confs.withConfs(spark, off) {
      JoinOps.runtimeFilterJoinFrame(spark, sf001).collect()
    }
    assert(filtered.map(_.toString).toSeq == plain.map(_.toString).toSeq,
      "runtime bloom filter changed results")
  }
}
