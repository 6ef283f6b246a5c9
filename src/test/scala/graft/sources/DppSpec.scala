package graft.sources

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import graft.{PlanWalk, Scratch, SparkSpec}

/** Pins q192's actual claim — that the fact scan is pruned at RUNTIME
  * by the dimension's filter — which the oracle (result equality)
  * cannot see: without this spec a conf typo or a broken layout could
  * turn the query into a full-scan join and stay green forever.
  *
  * Three assertions, strongest first: the executed scan carries a
  * `dynamicpruning` partition filter; its partitions-read metric is 3
  * (Q2's months) out of the 12 written; and the static-files metric
  * still shows the pre-prune denominator, i.e. the skip happened at
  * runtime, not because the writer dropped data.
  */
class DppSpec extends SparkSpec {

  private def scans(p: SparkPlan): Seq[FileSourceScanExec] =
    PlanWalk.nodes(p).collect { case f: FileSourceScanExec => f }

  test("the dim filter prunes fact partitions at runtime (3 of 12)") {
    val dir = Scratch.dir("dpp_spec_")
    try {
      SourceQueries.stageDppLayout(spark, sf001, dir.toString)
      val df = SourceQueries.dppJoinFrame(spark, dir.toString)
      df.collect()
      val plan = df.queryExecution.executedPlan
      val factScans = scans(plan)
        .filter(_.metadata.get("Location").exists(_.contains(dir.getFileName.toString)))
      assert(factScans.nonEmpty, s"no fact scan found:\n$plan")
      val scan = factScans.head
      assert(scan.partitionFilters.exists(_.toString.contains("dynamicpruning")),
        s"no dynamicpruning filter on the fact scan: ${scan.partitionFilters}")
      val read = scan.metrics("numPartitions").value
      assert(read == 3, s"expected 3 partitions read (months 4-6), got $read")
      // the pre-prune denominator: all 12 month files were candidates
      val staticFiles = scan.metrics("staticFilesNum").value
      val dynFiles = scan.metrics("numFiles").value
      assert(staticFiles > dynFiles,
        s"static file count $staticFiles not above post-prune $dynFiles — " +
          "the skip did not happen at runtime")
    } finally Scratch.deleteTree(dir)
  }

  test("the runtime prune is result-invisible") {
    val dir = Scratch.dir("dpp_inv_")
    try {
      SourceQueries.stageDppLayout(spark, sf001, dir.toString)
      val pruned = SourceQueries.dppJoinFrame(spark, dir.toString).collect()
      val plain = graft.Confs.withConfs(spark, Seq(
        "spark.sql.optimizer.dynamicPartitionPruning.enabled" -> "false")) {
        SourceQueries.dppJoinFrame(spark, dir.toString).collect()
      }
      assert(pruned.map(_.toString).toSeq == plain.map(_.toString).toSeq,
        "dynamic partition pruning changed results")
    } finally Scratch.deleteTree(dir)
  }
}
