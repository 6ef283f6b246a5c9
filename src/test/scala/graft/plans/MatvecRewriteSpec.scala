package graft.plans

import graft.{SparkSpec, SparkEntry, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Proof that [[RewriteMatvecJoin]] closes SURVEY §4.2 item 3 as a
  * WHOLE-PLAN rewrite: the MapReduce-style relational matvec
  * (posexplode ⋈ posexplode on pos → sum of products) collapses into
  * the fused `SUM(graft_vec_dot_matched)` over un-exploded rows —
  * asserted on q11's registered plan, result-parity-checked on
  * adversarial array shapes, and shown to BAIL when the aggregate
  * contains anything the fused form can't reproduce.
  */
class MatvecRewriteSpec extends SparkSpec {

  private def withRule[A](f: => A): A = {
    spark.experimental.extraOptimizations = Seq(RewriteMatvecJoin)
    try f finally spark.experimental.extraOptimizations = Nil
  }

  test("q11's relational matvec rewrites to the fused dot-product " +
    "aggregate — no explode, no position join — with identical results") {
    val plain = SparkEntry.queries("q11_matvec_agg")(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    withRule {
      val df = SparkEntry.queries("q11_matvec_agg")(spark, sf001)
      val opt = df.queryExecution.optimizedPlan.toString()
      assert(opt.contains("graft_vec_dot_matched"), s"rewrite did not fire:\n$opt")
      assert(!opt.contains("posexplode") && !opt.contains("Generate"),
        s"explode survived the rewrite:\n$opt")
      // q11 rounds to 6 decimals, so summation-order freedom between
      // the exploded and fused forms cannot surface here
      val fused = df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(fused == plain, "fused matvec changed q11's results")
    }
  }

  /** Relational matvec in q11's exact shape over arbitrary inputs. */
  private def relational(xs: DataFrame, ws: DataFrame): DataFrame = {
    val x = xs.select(col("id"), posexplode(col("xarr")).as(Seq("pos", "xval")))
    val w = ws.select(posexplode(col("warr")).as(Seq("pos", "wval")))
    x.join(w, Seq("pos"))
      .groupBy(col("id"))
      .agg(sum(col("xval") * col("wval")).as("dot"))
      .orderBy(col("id"))
  }

  // integer-valued doubles: products and sums are exact, so the parity
  // assertion below is bit-exact regardless of summation order
  private def fixtures: (DataFrame, DataFrame) = {
    // integer-valued DOUBLES (floor returns bigint — cast back): exact
    // products/sums, and fp arrays are what the rule fires on
    val v = floor(col("o_totalprice")).cast("double")
    val xs = Tables.orders(spark, sf001).limit(8)
      .select(col("o_orderkey").as("id"),
        when(col("o_orderkey") % 5 === 0, lit(null)) // null array
          .when(col("o_orderkey") % 3 === 0,
            slice(array(v, v), 1, 0))                // empty array
          .when(col("o_orderkey") % 2 === 0,
            array(when(col("o_orderkey") % 4 === 0, v), v)) // null element
          .otherwise(array(v, v * 2, v * 3))         // longer than w
          .as("xarr"))
    val ws = Tables.orders(spark, sf001).limit(2)
      .select(array(lit(2.0),
        when(col("o_orderkey") % 2 === 0, floor(col("o_totalprice")).cast("double")))
        .as("warr")) // 2 rows: multi-vector right side; nullable slot
    (xs, ws)
  }

  test("rewrite is result-invisible on null/empty/mismatched arrays " +
    "and a multi-row right side") {
    val (xs, ws) = fixtures
    def rows(df: DataFrame) = df.collect().map(r =>
      r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
    val plain = rows(relational(xs, ws))
    val fused = withRule {
      val df = relational(xs, ws)
      assert(df.queryExecution.optimizedPlan.toString()
        .contains("graft_vec_dot_matched"),
        "rewrite did not fire on the synthetic shape — parity is vacuous")
      rows(df)
    }
    assert(fused.sameElements(plain),
      s"rewrite changed results:\n plain=${plain.mkString(",")}\n fused=${fused.mkString(",")}")
    // the shapes must actually exercise the edge cases
    assert(plain.length < 8, "null/empty-array rows must drop out of the group set")
  }

  test("rule bails on integer arrays (exact long-sum semantics and " +
    "result type would change under double accumulation)") {
    val xs = Tables.orders(spark, sf001).limit(8)
      .select(col("o_orderkey").as("id"),
        array(col("o_orderkey"), col("o_orderkey") * 2).as("xarr"))
    val ws = Tables.orders(spark, sf001).limit(2)
      .select(array(lit(3L), col("o_orderkey")).as("warr"))
    val x = xs.select(col("id"), posexplode(col("xarr")).as(Seq("pos", "xval")))
    val w = ws.select(posexplode(col("warr")).as(Seq("pos", "wval")))
    val df = x.join(w, Seq("pos")).groupBy(col("id"))
      .agg(sum(col("xval") * col("wval")).as("dot"))
    withRule {
      val opt = df.queryExecution.optimizedPlan.toString()
      assert(!opt.contains("graft_vec_dot_matched"),
        s"rewrite fired on integer arrays:\n$opt")
      df.collect() // and the plan still executes
    }
  }

  test("rule bails on an uncast float×float multiply (fp32 product " +
    "rounding that double accumulation would not reproduce)") {
    val e = Tables.embeddings(spark, sf001) // embedding: array<float>
    val x = e.select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "xval")))
    val w = e.filter(col("vec_id") === 0)
      .select(posexplode(col("embedding")).as(Seq("pos", "wval")))
    val df = x.join(w, Seq("pos")).groupBy(col("vec_id"))
      .agg(sum(col("xval") * col("wval")).as("dot")) // no casts: FLOAT multiply
    withRule {
      val opt = df.queryExecution.optimizedPlan.toString()
      assert(!opt.contains("graft_vec_dot_matched"),
        s"rewrite fired on a float-typed multiply:\n$opt")
    }
  }

  test("rule bails when the aggregate carries anything but the matched " +
    "sum (count(*) counts positions, which the fused form drops)") {
    val (xs, ws) = fixtures
    val x = xs.select(col("id"), posexplode(col("xarr")).as(Seq("pos", "xval")))
    val w = ws.select(posexplode(col("warr")).as(Seq("pos", "wval")))
    val mixed = x.join(w, Seq("pos"))
      .groupBy(col("id"))
      .agg(sum(col("xval") * col("wval")).as("dot"),
        count(lit(1)).as("n_pos"))
    withRule {
      val opt = mixed.queryExecution.optimizedPlan.toString()
      assert(!opt.contains("graft_vec_dot_matched"),
        s"unsound rewrite fired under count(*):\n$opt")
    }
  }
}
