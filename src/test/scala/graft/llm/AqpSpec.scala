package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** q203's statistical gate — what the exact-arithmetic oracle can't
  * say: the Horvitz–Thompson estimates actually LAND where their CIs
  * promise. Deterministic sample → deterministic coverage, so this
  * pins the fixture's exact outcome, not a flaky probabilistic bound.
  */
class AqpSpec extends SparkSpec {

  test("every per-lang estimate lands inside its own 95% CI at sf0.1") {
    val df = CorpusOps.queries("q203_aqp_estimate")(
      spark, "/root/testdata/sf0.1")
    val out = df.select(col("lang"),
        (abs(col("est_chars") - col("true_chars")) <= col("ci95_chars"))
          .as("covered"),
        (col("ci95_chars") < col("true_chars")).as("informative"))
      .collect()
    assert(out.length == 5, s"expected 5 langs, got ${out.length}")
    val misses = out.filter(!_.getAs[Boolean]("covered")).map(_.getString(0))
    assert(misses.isEmpty, s"estimates outside their CI: ${misses.mkString(",")}")
    // the CI must also be INFORMATIVE — narrower than the quantity
    // itself — or the coverage claim is vacuous
    val vacuous = out.filter(!_.getAs[Boolean]("informative")).map(_.getString(0))
    assert(vacuous.isEmpty, s"vacuously wide CIs: ${vacuous.mkString(",")}")
  }
}
