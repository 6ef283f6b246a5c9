package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Fixture data-contract tripwire (round-6 verdict ask #2): the driver
  * regenerated `/root/testdata` with `events.ts` as TIMESTAMP(MICROS)
  * where it had been TIMESTAMP(NANOS), and nothing in `sbt test` named
  * the drift — 16 queries broke silently in the driver's report. This
  * suite pins what the engine actually ASSUMES about each fixture
  * table, so the next regeneration fails HERE with the drifted column
  * in the message:
  *
  *  - every non-timestamp column's exact Spark-side type;
  *  - timestamp columns against the SET of encodings the engine
  *    tolerates (not one physical type — over-pinning is what broke);
  *  - the µs/ns/instant trichotomy of [[Tables.eventsUs]], proven on
  *    generated twins of all three encodings, so ts portability stays
  *    tested even while the live fixture exercises only one branch.
  */
class FixtureContractSpec extends SparkSpec {

  private def fields(name: String): Map[String, DataType] =
    Tables.table(spark, sf001, name).schema
      .map(f => f.name -> f.dataType).toMap

  private def assertCols(table: String, expected: Map[String, DataType]): Unit = {
    val got = fields(table)
    assert(got.keySet == expected.keySet,
      s"$table columns drifted: got ${got.keySet.toSeq.sorted}, " +
        s"expected ${expected.keySet.toSeq.sorted}")
    expected.foreach { case (c, dt) =>
      assert(got(c) == dt, s"$table.$c drifted: got ${got(c)}, expected $dt")
    }
  }

  /** The encodings a timestamp-ish fixture column may arrive in; the
    * same trichotomy [[Tables.tsToUs]] folds to canonical epoch-µs.
    */
  private val tsEncodings: Set[DataType] =
    Set(LongType, TimestampType, TimestampNTZType)

  test("TPC-H-ish fixture columns match the engine's assumed contract") {
    assertCols("region", Map(
      "r_regionkey" -> IntegerType, "r_name" -> StringType))
    assertCols("nation", Map(
      "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType))
    assertCols("customer", Map(
      "c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType))
    assertCols("supplier", Map(
      "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType))
    assertCols("part", Map(
      "p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType))

    val orders = fields("orders")
    assertCols("orders", Map(
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> orders("o_orderdate"),
      "o_orderpriority" -> StringType))
    assert(tsEncodings.contains(orders("o_orderdate")),
      s"orders.o_orderdate drifted to unsupported ${orders("o_orderdate")}")
    val li = fields("lineitem")
    assertCols("lineitem", Map(
      "l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> li("l_shipdate")))
    assert(tsEncodings.contains(li("l_shipdate")),
      s"lineitem.l_shipdate drifted to unsupported ${li("l_shipdate")}")
  }

  test("LLM fixture columns match the engine's assumed contract") {
    assertCols("documents", Map(
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType))
    assertCols("embeddings", Map(
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType),
      "label" -> IntegerType))
    // Dimensionality tripwire: q15/q54's Gaussian W0 literals, q43's
    // hyperplane literals, and q16's fixed weight formula all assume
    // 64-dim embeddings. A regenerated fixture with a different dim
    // would fail those queries cryptically (arity require / silent
    // oracle mismatch) — fail HERE with the contract named instead.
    import org.apache.spark.sql.functions.{size => asize, col, min, max}
    val dims = graft.Tables.embeddings(spark, sf001)
      .select(min(asize(col("embedding"))).as("lo"),
        max(asize(col("embedding"))).as("hi")).head()
    assert(dims.getInt(0) == 64 && dims.getInt(1) == 64,
      s"embeddings dim drifted from the assumed 64: [${dims.getInt(0)}, " +
        s"${dims.getInt(1)}] — q15/q16/q43/q54 weight literals must be " +
        "regenerated for the new dimensionality")
  }

  test("documents.text stays inside the oracle power-table bounds") {
    // q48's DuckDB twin builds its 257^e power table only to e <= 2047
    // (FnQueries.scala), so a document longer than 2048 UTF-8 bytes
    // silently loses its leading-byte terms through the pw join and
    // the oracle hash goes wrong — a FALSE mismatch blamed on the
    // engine. q188's twin caps gram exponents at 1023 (Dedup.scala), a
    // bound implied by text <= 1024 CHARS (a gram is a substring-sized
    // join of 8 tokens). Current fixtures max out under 600; if a
    // regeneration ever crosses these lines, fail HERE naming the
    // oracle to re-derive (bound it by
    // (SELECT MAX(octet_length(encode(text))) FROM documents)) rather
    // than in a cryptic hash diff.
    val m = Tables.documents(spark, sf001)
      .select(max(octet_length(col("text"))).as("b"),
        max(length(col("text"))).as("c")).head()
    assert(m.getInt(0) <= 2048,
      s"documents.text reaches ${m.getInt(0)} UTF-8 bytes > 2048: q48's " +
        "oracle pw recursion (e < 2047) must be re-derived from the data")
    assert(m.getInt(1) <= 1024,
      s"documents.text reaches ${m.getInt(1)} chars > 1024: q188's " +
        "oracle pw recursion (e < 1023) must be re-derived from the data")
  }

  test("divisor/log domains the sampling queries lean on hold") {
    // Positivity tripwires (round-9 verdict ask #4): these are the
    // domain assumptions that let divide/log expressions survive ANSI
    // mode, and a fixture regeneration can move them silently — q196's
    // sf0.1 DIVIDE_BY_ZERO escape is exactly this class. Each assert
    // names the dependent query so the failure is self-explanatory.
    //
    // q196_stream_reservoir: the Efraimidis–Spirakis key divides by
    // events.value under an explicit `value > 0` race filter — correct
    // ONLY while the domain is non-negative (a negative weight would
    // silently pass the filter's complement into "can never win" when
    // ES semantics for w<0 are undefined). Checked at BOTH the
    // correctness SF and the bench SF: the round-9 escape was precisely
    // an sf0.1-only domain fact invisible at sf0.01.
    // The bench SF leg resolves the SAME way Bench does
    // (SPARK_GRAFT_SF_DIR, falling back to /root/testdata/sf0.1): a
    // relocated bench fixture must not silently disable exactly the
    // bench-SF domain check this test exists to provide. If the bench
    // fixture is genuinely absent the skip is LOUD (a named assert
    // message via info + a hard fail would block sf-less dev boxes, so
    // this logs the skip where the suite output shows it).
    val benchSf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val legs = Seq(sf001, benchSf)
      .filter(sf => new java.io.File(s"$sf/events.parquet").exists)
    if (!legs.contains(benchSf))
      info(s"SKIPPED bench-SF positivity leg: $benchSf/events.parquet absent " +
        "— q196's value>0 domain is verified at the correctness SF only")
    for (sf <- legs) {
      val vmin = Tables.table(spark, sf, "events")
        .agg(min(col("value"))).head().getDouble(0)
      assert(vmin >= 0.0,
        s"events.value reaches $vmin < 0 at $sf: q196's zero-weight rule " +
          "(filter value > 0) assumes a non-negative weight domain — " +
          "re-derive the Efraimidis-Spirakis key rule before trusting it")
    }
    // q195_weighted_sample: -ln(u)/n_chars — a zero-length document
    // would divide by zero in the race key.
    val cmin = Tables.documents(spark, sf001)
      .agg(min(col("n_chars"))).head().getLong(0)
    assert(cmin > 0L,
      s"documents.n_chars reaches $cmin <= 0: q195's weight key divides " +
        "by n_chars — add the q196-style positive-weight filter first")
    // q201_corrupt_ingest: the oracle buckets synthetic corrupt docs
    // under a NULL lang key; a genuinely-NULL fixture lang would
    // collide with it under ORDER BY lang NULLS FIRST and surface as a
    // confusing q201 hash diff instead of a named contract break.
    val nullLang = Tables.documents(spark, sf001)
      .filter(col("lang").isNull).count()
    assert(nullLang == 0L,
      s"documents.lang has $nullLang NULL rows: q201's quarantine oracle " +
        "reserves the NULL lang bucket for synthetic corrupt records")
  }

  test("parquetRowCount (footer metadata) equals the scanned count") {
    // q183 derives its adaptive k from footer metadata instead of an
    // eager full-table count(); this pins the two sources agreeing on
    // both fixture shapes: a single parquet file and a multi-part
    // directory with _SUCCESS/hidden entries to skip.
    for (t <- Seq("embeddings", "documents", "region"))
      assert(Tables.parquetRowCount(spark, sf001, t) ==
        Tables.table(spark, sf001, t).count(), s"footer count drift on $t")
    val dir = Scratch.dir("footer_count_")
    try {
      Tables.documents(spark, sf001).repartition(3)
        .write.parquet(dir.resolve("docs.parquet").toString)
      assert(Tables.parquetRowCount(spark, dir.toString, "docs") ==
        Tables.documents(spark, sf001).count(),
        "footer count drift on multi-part directory")
    } finally Scratch.deleteTree(dir)
  }

  test("events columns match, and ts is a supported timestamp encoding") {
    val ev = fields("events")
    assert(ev.keySet == Set("event_id", "ts", "user_id", "event_type",
      "value", "props"), s"events columns drifted: ${ev.keySet.toSeq.sorted}")
    Map("event_id" -> LongType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType,
      "props" -> StringType).foreach { case (c, dt) =>
      assert(ev(c) == dt, s"events.$c drifted: got ${ev(c)}, expected $dt")
    }
    assert(tsEncodings.contains(ev("ts")),
      s"events.ts drifted to unsupported encoding ${ev("ts")} — " +
        "extend Tables.tsToUs (and StreamQueries' replay normalization) " +
        "before trusting any event-time query")
    // the canonical view always lands on BIGINT micros
    assert(Tables.eventsUs(spark, sf001).schema("ts_us").dataType == LongType)
  }

  test("eventsUs folds all three ts encodings to identical epoch-us") {
    val base = Tables.eventsUs(spark, sf001).orderBy("event_id").limit(64)
      .select(col("event_id"), col("ts_us"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .cache()
    val expected = base.select("event_id", "ts_us").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(expected.nonEmpty)

    // twin generators: same rows, ts re-encoded per physical flavor.
    // (Spark cannot WRITE TIMESTAMP(NANOS); the raw-long twin stands in
    // for it — under nanosAsLong a ns file scans as exactly this.)
    val twins: Seq[(String, DataFrame)] = Seq(
      "ns-as-long" -> base.withColumn("ts", col("ts_us") * 1000),
      "timestamp-ltz" -> base.withColumn("ts", timestamp_micros(col("ts_us"))),
      "timestamp-ntz" -> base.withColumn("ts",
        timestamp_micros(col("ts_us")).cast(TimestampNTZType)))

    twins.foreach { case (flavor, df) =>
      val dir = Scratch.dir(s"fixture_twin_")
      try {
        df.select(col("event_id"), col("ts"), col("user_id"),
            col("event_type"), col("value"), col("props"))
          .write.parquet(dir.resolve("events.parquet").toString)
        val got = Tables.eventsUs(spark, dir.toString)
          .select("event_id", "ts_us").collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == expected,
          s"$flavor twin decoded differently: " +
            got.collect { case (k, v) if expected(k) != v =>
              s"event $k: $v vs ${expected(k)}" }.take(3).mkString("; "))
      } finally Scratch.deleteTree(dir)
    }
    base.unpersist()
  }
}
