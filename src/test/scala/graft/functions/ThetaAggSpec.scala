package graft.functions

import graft.{SparkSpec, Tables}
import graft.functions.exprs.graft_theta_sketch_agg
import org.apache.spark.sql.functions._

/** The theta-sketch TypedImperativeAggregate as a first-class SQL
  * aggregate: per-group sketches in a plain groupBy with the engine's
  * partial/final split, estimates inside the sketch's own interval
  * against exact distinct counts, and the SQL-registered name working
  * through GraftExtensions.
  */
class ThetaAggSpec extends SparkSpec {

  test("groupBy theta sketches estimate per-group distinct counts " +
    "within their own 3-sigma bounds, through a partial+final plan") {
    val df = Tables.lineitem(spark, sf001)
      .groupBy(col("l_returnflag"))
      .agg(graft_theta_sketch_agg(col("l_suppkey"), 4096).as("sk"))
    // the planner must split the aggregate: partial sketches before
    // the shuffle, merge after — the whole point of the mergeable form
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("partial_graft_theta_sketch_agg") ||
      plan.contains("Partial"), s"no partial aggregation phase:\n$plan")
    val exact = Tables.lineitem(spark, sf001)
      .groupBy(col("l_returnflag"))
      .agg(count_distinct(col("l_suppkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val rows = df.collect()
    assert(rows.length == exact.size)
    rows.foreach { r =>
      val sk = org.apache.datasketches.theta.Sketches.wrapSketch(
        org.apache.datasketches.memory.Memory.wrap(r.getAs[Array[Byte]]("sk")))
      val ex = exact(r.getString(0)).toDouble
      assert(sk.getLowerBound(3) <= ex && ex <= sk.getUpperBound(3),
        s"${r.getString(0)}: exact $ex outside " +
          s"[${sk.getLowerBound(3)}, ${sk.getUpperBound(3)}]")
    }
  }

  test("the SQL-registered graft_theta_sketch_agg matches the Column " +
    "surface, and rejects a non-foldable nominalEntries") {
    import graft.plans.GraftExtensions
    spark.sessionState.functionRegistry.registerFunction(
      new org.apache.spark.sql.catalyst.FunctionIdentifier(
        "graft_theta_sketch_agg"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[ThetaSketchAgg].getName, "graft_theta_sketch_agg"),
      GraftExtensions.buildThetaSketchAgg)
    Tables.documents(spark, sf001).createOrReplaceTempView("g_theta_docs")
    val viaSql = spark.sql(
      """SELECT graft_theta_sketch_agg(doc_id, 4096) AS sk
        |FROM g_theta_docs""".stripMargin)
      .head().getAs[Array[Byte]]("sk")
    val viaCol = Tables.documents(spark, sf001)
      .agg(graft_theta_sketch_agg(col("doc_id"), 4096).as("sk"))
      .head().getAs[Array[Byte]]("sk")
    assert(ThetaSketchAgg.estimate(viaSql) == ThetaSketchAgg.estimate(viaCol))
    val err = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql(
        """SELECT graft_theta_sketch_agg(doc_id, CAST(n_chars AS INT))
          |FROM g_theta_docs""".stripMargin).collect()
    }
    assert(err.getCondition == "NON_FOLDABLE_ARGUMENT", err.getMessage)
    // out-of-range Int literals must fail analysis with the intended
    // message, not reach DataSketches (the Long branch already did;
    // the Int branch was unchecked until round 12)
    val bad = intercept[IllegalArgumentException] {
      spark.sql("SELECT graft_theta_sketch_agg(doc_id, 0) FROM g_theta_docs")
        .collect()
    }
    assert(bad.getMessage.contains("bad nominalEntries"), bad.getMessage)
    import graft.plans.GraftExtensions.buildKllSketchAgg
    import org.apache.spark.sql.catalyst.expressions.Literal
    val badK = intercept[IllegalArgumentException] {
      buildKllSketchAgg(Seq(Literal(1.0), Literal(7))) // Int k below KLL min 8
    }
    assert(badK.getMessage.contains("bad k"), badK.getMessage)
  }

  test("groupBy KLL sketches honor the published rank-error bound " +
    "per group, through a partial+final plan") {
    import graft.functions.exprs.graft_kll_sketch_agg
    import org.apache.datasketches.kll.{KllDoublesSketch, KllSketch}
    import org.apache.datasketches.quantilescommon.QuantileSearchCriteria
    val df = Tables.orders(spark, sf001)
      .groupBy(col("o_orderpriority"))
      .agg(graft_kll_sketch_agg(col("o_totalprice"), 200).as("sk"))
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("partial_graft_kll_sketch_agg") ||
      plan.contains("Partial"), s"no partial aggregation phase:\n$plan")
    val eps = 2.0 * KllSketch.getNormalizedRankError(200, false)
    val groups = df.collect()
    assert(groups.nonEmpty)
    groups.foreach { r =>
      val sk = KllDoublesSketch.heapify(
        org.apache.datasketches.memory.Memory.wrap(r.getAs[Array[Byte]]("sk")))
      val med = sk.getQuantile(0.5, QuantileSearchCriteria.INCLUSIVE)
      // tie-robust exact-rank interval check (the q217 gate), per group
      val vals = Tables.orders(spark, sf001)
        .filter(col("o_orderpriority") === r.getString(0))
        .select(col("o_totalprice")).collect().map(_.getDouble(0))
      val lo = vals.count(_ < med).toDouble / vals.length
      val hi = vals.count(_ <= med).toDouble / vals.length
      assert(lo - eps <= 0.5 && 0.5 <= hi + eps,
        s"${r.getString(0)}: median rank interval [$lo,$hi] misses 0.5+-$eps")
    }
  }
}
