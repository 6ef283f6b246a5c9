package graft.operators

import graft.SparkSpec

/** Pins q191's actual claim: AQE detects the 70%-hot shuffle partition
  * at RUNTIME and splits it (`skew=true` on the join node of the final
  * adaptive plan), and that surgery changes no results. The oracle can
  * only see the second half; without this spec a conf typo could turn
  * the query into an ordinary skewed SMJ and stay green forever.
  */
class SkewJoinSpec extends SparkSpec {

  test("AQE splits the hot partition (skew=true) and the rescue is " +
    "result-invisible") {
    // thresholds sized for sf0.001's ~1k events (the registered query
    // uses 16k/8k for the driver's sf0.01+); factor 2 and a sub-hot-
    // partition advisory size make the 70% key an unambiguous skew
    val rescued = AdvancedOps.withSkewConfs(spark, threshold = "2k", advisory = "1k") {
      val df = AdvancedOps.skewedJoinFrame(spark, sf001)
      val rows = df.collect()
      val plan = df.queryExecution.executedPlan.toString()
      assert(plan.contains("skew=true"),
        s"AQE did not mark the join skewed:\n$plan")
      rows
    }
    // same join, skew handling off (broadcast still off so the SAME
    // shuffled-join shape runs, just without the partition surgery)
    val plain = graft.Confs.withConfs(spark, Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.enabled" -> "false")) {
      AdvancedOps.skewedJoinFrame(spark, sf001).collect()
    }
    assert(rescued.map(_.toString).toSeq == plain.map(_.toString).toSeq,
      "skew rescue changed results")
  }
}
