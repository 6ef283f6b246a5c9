package graft.llm

import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** q195's two claims the oracle can't see: the global top-k plans as
  * TakeOrderedAndProject (per-partition partial top-k + driver merge,
  * no corpus-wide sort or shuffle), and the race actually WEIGHTS —
  * long docs are over-represented relative to a uniform draw.
  */
class WeightedSampleSpec extends SparkSpec {

  test("top-k plans TakeOrderedAndProject, and sampling is length-biased") {
    val df = CorpusOps.queries("q195_weighted_sample")(spark, "/root/testdata/sf0.01")
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("TakeOrderedAndProject"),
      s"global top-k lost its partial-top-k plan:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("Exchange range"),
      s"unexpected global sort/join in the sample plan:\n$plan")
    // weighting: expected sample mean of n_chars under w=n_chars is the
    // corpus's E[X^2]/E[X] > E[X]; with 100 of 500 docs the gap is
    // far outside noise unless the weights are being ignored
    // (sf0.01: 100 of 500 docs)
    val sampleMean = df.agg(avg(col("n_chars"))).head().getDouble(0)
    val corpusMean = Tables.documents(spark, "/root/testdata/sf0.01")
      .agg(avg(col("n_chars"))).head().getDouble(0)
    assert(sampleMean > corpusMean * 1.05,
      s"sample not length-biased: sample=$sampleMean corpus=$corpusMean")
  }
}
