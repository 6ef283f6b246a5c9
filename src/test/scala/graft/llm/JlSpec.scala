package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** q200's quality gate — the JL property the exact-match oracle can't
  * express: with k=16 and 1/√k scaling, projected norms concentrate
  * around the originals (E‖Rx‖² = ‖x‖²), so geometry survives the 4×
  * dimension cut.
  */
class JlSpec extends SparkSpec {

  test("projected norms concentrate around the originals") {
    val df = Similarity.queries("q200_jl_projection")(
      spark, "/root/testdata/sf0.01")
    val r = df.agg(avg(col("norm_ratio")).as("mean"),
        max(col("norm_ratio")).as("mx"), min(col("norm_ratio")).as("mn"),
        avg(abs(col("norm_ratio") - 1)).as("dev"))
      .head()
    // measured on the fixture: mean 0.957, range [0.48, 1.50],
    // mean |ratio−1| 0.144 — gates sit outside so a seeding or
    // scaling regression fails while fixture jitter does not
    assert(math.abs(r.getAs[Double]("mean") - 1.0) < 0.15,
      s"mean norm ratio drifted: ${r.getAs[Double]("mean")}")
    assert(r.getAs[Double]("mn") > 0.3 && r.getAs[Double]("mx") < 2.0,
      s"norm ratio outliers: [${r.getAs[Double]("mn")}, ${r.getAs[Double]("mx")}]")
    assert(r.getAs[Double]("dev") < 0.25,
      s"norm concentration too loose: ${r.getAs[Double]("dev")}")
  }
}
