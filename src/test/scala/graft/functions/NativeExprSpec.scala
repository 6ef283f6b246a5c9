package graft.functions

import java.math.BigInteger
import graft.SparkSpec
import graft.rbm.{CD1GradientAggregator, RBM}
import org.apache.spark.sql.functions._
import graft.functions.exprs._

/** Pins the custom Catalyst layer: native expressions against
  * independent implementations, the optimizer rewrite rule, and the
  * fused CD-1 Aggregator against the treeAggregate path.
  */
class NativeExprSpec extends SparkSpec {

  import spark.implicits._

  test("graft_sigmoid equals the composed builtin form bit-for-bit") {
    val df = Seq(-5.0, -0.5, 0.0, 0.5, 5.0, 50.0, -50.0).toDF("x")
    val rows = df.select(
      graft_sigmoid(col("x")).as("native"),
      (lit(1.0) / (lit(1.0) + exp(-col("x")))).as("composed")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("graft_byte_ngrams equals the composed char-array HOF form on " +
    "real corpus text, and handles the short-string edges") {
    val docs = graft.Tables.documents(spark, sf001)
      .select(lower(regexp_replace(col("text"), "[^A-Za-z ]", "")).as("nt"))
    val composed = transform(
      sequence(lit(1), length(col("nt")) - 2),
      i => col("nt").substr(i, lit(3)))
    val rows = docs.filter(length(col("nt")) >= 3)
      .select(graft_byte_ngrams(col("nt"), 3).as("native"),
        composed.as("composed")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[String](0) == r.getSeq[String](1))
    }
    val edges = Seq("", "a", "ab", "abc").toDF("s")
      .select(graft_byte_ngrams(col("s"), 3).as("g")).collect()
    assert(edges.map(_.getSeq[String](0).toList).toList ==
      List(Nil, Nil, Nil, List("abc")))
  }

  test("graft_jaro_winkler matches the published golden values, the " +
    "pinned edge semantics, and a direct-eval sweep through codegen") {
    // classics (Winkler 1990 examples, values DuckDB also returns)
    val golden = Seq(
      ("MARTHA", "MARHTA", 0.9611111111111111),
      ("DWAYNE", "DUANE", 0.8400000000000001),
      ("DIXON", "DICKSONX", 0.8133333333333332),
      ("abc", "abc", 1.0),
      ("abc", "xyz", 0.0),
      ("", "", 0.0), // pinned: empty is 0, not 1 (DuckDB semantics)
      ("", "x", 0.0),
      ("ab", "ba", 0.0), // window 0 at len 2 — no cross-match
      // floored transpositions: half=3 → t=1 (the /2.0 variant gives
      // a smaller score here)
      ("aeadabce", " cedbead ", 0.6601851851851852))
    golden.foreach { case (a, b, want) =>
      assert(JaroWinkler.jw(a, b) == want, s"jw($a,$b)")
    }
    // codegen path (DataFrame select) ≡ interpreted object method
    val rows = golden.toDF("a", "b", "w")
      .select(graft_jaro_winkler(col("a"), col("b")).as("g"), col("w"))
      .collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("graft_adjacent_pairs equals the composed transform/element_at " +
    "HOF form on real corpus tokens, and handles the short-array edges") {
    val toks = graft.Tables.documents(spark, sf001)
      .select(array_remove(split(lower(col("text")), "[^a-z]+"), "").as("ts"))
    val composed = transform(sequence(lit(1), size(col("ts")) - 1),
      i => concat(element_at(col("ts"), i), lit(" "),
        element_at(col("ts"), i + 1)))
    val rows = toks.filter(size(col("ts")) >= 2)
      .select(graft_adjacent_pairs(col("ts")).as("native"),
        composed.as("composed")).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getSeq[String](0) == r.getSeq[String](1)))
    val edges = Seq(Seq.empty[String], Seq("a"), Seq("a", "b"))
      .toDF("ts").select(graft_adjacent_pairs(col("ts")).as("g")).collect()
    assert(edges.map(_.getSeq[String](0).toList).toList ==
      List(Nil, Nil, List("a b")))
  }

  test("graft_vec_dot equals the zip_with+aggregate form bit-for-bit, " +
    "for float and double arrays, and is null-safe") {
    val df = Seq(
      (Array(1.0f, 2.5f, -3.25f), Array(0.5, -1.5, 2.0)),
      (Array(0.1f, 0.2f, 0.3f), Array(1e10, -1e-10, 7.0)),
      (Array(0.0f, 0.0f, 0.0f), Array(1.0, 2.0, 3.0))
    ).toDF("f", "d")
    val rows = df.select(
      graft_vec_dot(col("f"), col("d")).as("native"),
      aggregate(zip_with(col("f"), col("d"),
        (x, y) => x.cast("double") * y.cast("double")),
        lit(0.0), (acc, x) => acc + x).as("composed"),
      graft_vec_dot(col("f"), col("f")).as("self")).collect()
    rows.foreach { r =>
      assert(r.getDouble(0) == r.getDouble(1), "float·double parity")
      assert(r.getDouble(2) >= 0.0, "self dot is a squared norm")
    }
    val withNull = df.select(
      graft_vec_dot(lit(null).cast("array<double>"), col("d")).as("n"),
      graft_vec_dot(array(lit(1.0)), col("d")).as("mismatch"),
      graft_vec_dot(array(lit(1.0), lit(null).cast("double"), lit(3.0)),
        col("d").cast("array<double>")).as("null_elem"))
      .collect()
    assert(withNull.forall(_.isNullAt(0)), "null array must yield null")
    assert(withNull.forall(_.isNullAt(1)),
      "length mismatch must yield null (zip_with null-pad parity)")
    assert(withNull.forall(_.isNullAt(2)),
      "null element must poison the sum (zip_with parity)")
    // non-float/double arrays are an analysis error, not a runtime one
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(graft_vec_dot(array(lit(1), lit(2)), array(lit(3), lit(4))))
        .collect()
    }
    assert(e.getMessage.contains("graft_vec_dot"))
  }

  test("rolling hash matches an independent BigInteger implementation") {
    val mod = BigInteger.valueOf(2).pow(61).subtract(BigInteger.ONE)
    def reference(s: String): Long = {
      var h = BigInteger.ZERO
      for (b <- s.getBytes("UTF-8"))
        h = h.multiply(BigInteger.valueOf(257))
          .add(BigInteger.valueOf(b & 0xff)).mod(mod)
      h.longValueExact()
    }
    val inputs = Seq("", "a", "hello world", "the quick brown fox", "ü¢∆")
    val got = inputs.toDF("s")
      .select(graft_rolling_hash(col("s"))).as[Long].collect()
    inputs.zip(got).foreach { case (s, g) =>
      assert(g == reference(s), s"mismatch for '$s'")
    }
  }

  test("RewriteSigmoid collapses 1/(1+exp(-x)) into the native expression") {
    spark.experimental.extraOptimizations = Seq(graft.plans.RewriteSigmoid)
    try {
      // must read a real source: local literal relations constant-fold
      // before the pattern can survive into the optimized plan
      val df = graft.Tables.lineitem(spark, sf001)
        .select((lit(1.0) / (lit(1.0) + exp(-col("l_quantity")))).as("s"))
      val optimized = df.queryExecution.optimizedPlan.toString()
      assert(optimized.contains("graft_sigmoid"),
        s"rewrite did not fire:\n$optimized")
      // and semantics are unchanged
      val v = df.limit(1).as[Double].head()
      assert(v > 0.5 && v <= 1.0) // sigmoid of quantity ≥ 1
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("RewriteVecDot fuses aggregate(zip_with(*)) into graft_vec_dot " +
    "with identical results, including nullable-element arrays") {
    def composedOf(dfArrays: org.apache.spark.sql.DataFrame) =
      dfArrays.select(col("o_orderkey"),
        aggregate(zip_with(col("a"), col("b"),
          (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0), (acc, v) => acc + v).as("dot"))
    def results(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap

    val price = coalesce(col("o_totalprice"), lit(0.0))
    val dense = graft.Tables.orders(spark, sf001).limit(50)
      .select(col("o_orderkey"),
        array(price, price * 2).as("a"),
        array(lit(0.5), lit(-1.5)).as("b"))
    // nullable elements (CASE WHEN injects a nullable slot): the
    // fused kernel must null-propagate exactly like the composed form
    val sparse = graft.Tables.orders(spark, sf001).limit(50)
      .select(col("o_orderkey"),
        array(when(col("o_orderkey") % 2 === 0, col("o_totalprice")),
          lit(1.0)).as("a"),
        array(lit(0.5), lit(-1.5)).as("b"))
    // mismatched lengths: zip_with null-pads → composed sum is null
    val mismatched = graft.Tables.orders(spark, sf001).limit(50)
      .select(col("o_orderkey"),
        array(price, price * 2).as("a"),
        array(lit(0.5)).as("b"))

    for (src <- Seq(dense, sparse, mismatched)) {
      spark.experimental.extraOptimizations = Nil
      val expected = results(composedOf(src))
      spark.experimental.extraOptimizations = Seq(graft.plans.RewriteVecDot)
      try {
        val fused = composedOf(src)
        assert(fused.queryExecution.optimizedPlan.toString()
          .contains("graft_vec_dot"),
          s"rewrite did not fire:\n${fused.queryExecution.optimizedPlan}")
        assert(results(fused) == expected, "fused results must be identical")
      } finally spark.experimental.extraOptimizations = Nil
    }
    // sanity on the shapes: sparse has nulls for odd keys, mismatched
    // is all-null — the parity above must not be vacuous
    val sparseExpected = results(composedOf(sparse))
    assert(sparseExpected.values.exists(_.isEmpty) &&
      sparseExpected.values.exists(_.nonEmpty))
    assert(results(composedOf(mismatched)).values.forall(_.isEmpty))
  }

  test("SQL names registered by GraftExtensions resolve and evaluate, " +
    "and wrong arity is a friendly analysis error") {
    import graft.plans.GraftExtensions
    // runtime registration of the SAME builders injectFunction uses
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_sigmoid", GraftExtensions.buildSigmoid, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_rolling_hash", GraftExtensions.buildRollingHash, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_vec_dot", GraftExtensions.buildVecDot, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_adjacent_pairs", GraftExtensions.buildAdjacentPairs, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_byte_ngrams", GraftExtensions.buildByteNgrams, "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_nfc_normalize", GraftExtensions.buildNfcNormalize, "scala_udf")
    val r = spark.sql(
      "SELECT graft_sigmoid(0) AS s, graft_rolling_hash('ab') AS h, " +
        "graft_vec_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS v, " +
        "graft_adjacent_pairs(array('a', 'b', 'c')) AS p, " +
        "graft_byte_ngrams('abcd', 2) AS g, " +
        "graft_nfc_normalize('á') AS n")
      .head()
    assert(r.getDouble(0) == 0.5)
    assert(r.getLong(1) == 257L * 'a'.toLong + 'b'.toLong)
    assert(r.getDouble(2) == 11.0)
    assert(r.getSeq[String](3) == Seq("a b", "b c"))
    assert(r.getSeq[String](4) == Seq("ab", "bc", "cd"))
    assert(r.getString(5) == "á")
    // arity is validated at analysis time with WRONG_NUM_ARGS, not an
    // IndexOutOfBoundsException from children(1)
    for ((sql, fn) <- Seq(
        "SELECT graft_vec_dot(array(1.0d))" -> "graft_vec_dot",
        "SELECT graft_sigmoid(1.0d, 2.0d)" -> "graft_sigmoid",
        "SELECT graft_rolling_hash()" -> "graft_rolling_hash")) {
      val e = intercept[org.apache.spark.sql.AnalysisException](spark.sql(sql))
      assert(e.getCondition == "WRONG_NUM_ARGS.WITHOUT_SUGGESTION", sql)
      assert(e.getMessage.contains(fn), sql)
    }
    // n accepts any foldable integral expression (the builder runs
    // before constant folding), and a genuinely non-foldable n raises
    // the dedicated error class, not a misleading arity error
    val folded = spark.sql(
      "SELECT graft_byte_ngrams('abcd', 1 + 1) AS a, " +
        "graft_byte_ngrams('abcd', CAST(3 AS INT)) AS b, " +
        "graft_byte_ngrams('abcd', 2L) AS c, " +
        "graft_byte_ngrams('abcd', CAST(3 AS BIGINT)) AS d").head()
    assert(folded.getSeq[String](0) == Seq("ab", "bc", "cd"))
    assert(folded.getSeq[String](1) == Seq("abc", "bcd"))
    // BIGINT literals are foldable too — they must fold, not raise a
    // misleading NON_FOLDABLE_ARGUMENT; out-of-Int-range n is a range
    // error naming the value
    assert(folded.getSeq[String](2) == Seq("ab", "bc", "cd"))
    assert(folded.getSeq[String](3) == Seq("abc", "bcd"))
    val oor = intercept[Exception](
      spark.sql("SELECT graft_byte_ngrams('abcd', 5000000000)").collect())
    assert(oor.getMessage.contains("out of Int range"), oor.getMessage)
    val nf = intercept[org.apache.spark.sql.AnalysisException](
      spark.range(1).selectExpr("graft_byte_ngrams('abcd', CAST(id AS INT))")
        .collect())
    assert(nf.getCondition == "NON_FOLDABLE_ARGUMENT", nf.getMessage)
  }

  test("fused CD1 Aggregator produces the same gradient as a scalar sweep") {
    val d = 4; val h = 3; val seed = 11L
    val cfg = RBM.Config(d, h, seed = seed)
    val w = RBM.initWeights(cfg)
    val wFlat = Array.tabulate(d * h)(k => w(k / h, k % h))
    val examples = (0L until 16L).map { id =>
      id -> Array.tabulate(d)(i => ((id * 13 + i * 7) % 100) / 100.0)
    }
    // engine: through the Dataset aggregation API (partial+final agg)
    val agg = new CD1GradientAggregator(wFlat, d, h, seed)
    val got = spark.createDataset(examples).repartition(3)
      .select(agg.toColumn).head()
    // independent: plain sequential fold
    val draw = new RBM.HashDraw(seed)
    val want = examples.foldLeft(new Array[Double](d * h)) { case (acc, (id, x)) =>
      RBM.accumulateGradient(acc, x, wFlat, d, h, id, draw)
    }
    got.zip(want).zipWithIndex.foreach { case ((g, e), k) =>
      assert(math.abs(g - e) < 1e-12, s"grad[$k]: $g vs $e")
    }
  }
}
