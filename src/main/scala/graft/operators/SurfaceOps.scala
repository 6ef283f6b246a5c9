package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}

/** API-surface coverage: the entry points a reference user would
  * expect beyond the core relational set — struct-exploding
  * generators, the typed Dataset API, delimited-string maps, and XML
  * parsing. Each is a thin deterministic query whose oracle re-derives
  * the same rows relationally.
  */
object SurfaceOps extends QueryModule {

  // public: generated encoder/projection code must reach these types
  case class Li(flag: String, qty: Double, price: Double)
  case class LiStats(n: Long, sumQty: Double, sumPrice: Double)
  case class LiStatsBuf(n: Long, sumQty: Double, sumPriceCents: Long)

  /** Typed three-way statistics in one partial-aggregable pass — the
    * Dataset-API analogue of count+sum+avg (same HashAggregate plan
    * the untyped agg produces). Money accumulates as exact long CENTS
    * (prices carry 2 decimals): a raw double price sum's partial-agg
    * merge order is nondeterministic, so cent-rounding vs the oracle
    * would be a flake — the repo's money-parity rule (dsum elsewhere),
    * expressed here in the typed-Aggregator buffer instead. Quantity
    * stays double: integer-valued, so its double sum is exact.
    */
  object LiStatsAgg
      extends org.apache.spark.sql.expressions.Aggregator[Li, LiStatsBuf, LiStats] {
    import org.apache.spark.sql.{Encoder, Encoders}
    override def zero: LiStatsBuf = LiStatsBuf(0L, 0.0, 0L)
    override def reduce(b: LiStatsBuf, a: Li): LiStatsBuf =
      LiStatsBuf(b.n + 1, b.sumQty + a.qty, b.sumPriceCents + math.round(a.price * 100))
    override def merge(x: LiStatsBuf, y: LiStatsBuf): LiStatsBuf =
      LiStatsBuf(x.n + y.n, x.sumQty + y.sumQty, x.sumPriceCents + y.sumPriceCents)
    override def finish(r: LiStatsBuf): LiStats =
      LiStats(r.n, r.sumQty, r.sumPriceCents / 100.0)
    override def bufferEncoder: Encoder[LiStatsBuf] = Encoders.product[LiStatsBuf]
    override def outputEncoder: Encoder[LiStats] = Encoders.product[LiStats]
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Struct-exploding generators: inline() turns an array of structs
    // into columns-per-field rows (one narrow Generate, like explode);
    // stack() is its literal-table cousin — both surfaces exercised
    // and unioned. Multipliers keep values at 2 decimals: a /2 would
    // land on exact .xx5 halves where the engines' double-rounding
    // conventions differ (shortest-decimal vs binary value).
    "q102_inline_stack" -> ((s, d) => {
      val inlined = Tables.orders(s, d)
        .select(col("o_orderkey"),
          inline(array(
            struct(lit("total").as("kind"), col("o_totalprice").as("v")),
            struct(lit("double").as("kind"), (col("o_totalprice") * 2).as("v")))))
      val stacked = Tables.orders(s, d)
        .select(col("o_orderkey"), expr(
          "stack(2, 'triple', o_totalprice * 3, 'tens', o_totalprice * 10)" +
            " AS (kind, v)"))
      inlined.unionByName(stacked)
        .select(col("o_orderkey"), col("kind"), round(col("v"), 2).as("v"))
        .orderBy(col("o_orderkey"), col("kind"))
    }),

    // The typed Dataset API end-to-end: case-class encoder, typed
    // filter/map, groupByKey + typed aggregators — same Catalyst plan
    // underneath (encoders compile to expressions), proven by the
    // relational oracle.
    "q103_typed_dataset" -> ((s, d) => {
      import s.implicits._
      Tables.lineitem(s, d)
        .select(col("l_returnflag").as("flag"), col("l_quantity").as("qty"),
          col("l_extendedprice").as("price"))
        .as[Li]
        .filter((li: Li) => li.qty > 10.0)
        .groupByKey((li: Li) => li.flag)
        .agg(LiStatsAgg.toColumn.name("stats"))
        .toDF("flag", "stats")
        .select(col("flag"), col("stats.n").as("n"),
          round(col("stats.sumQty"), 2).as("sum_qty"),
          round(col("stats.sumPrice") / col("stats.n"), 2).as("avg_price"))
        .orderBy(col("flag"))
    }),

    // Delimited-string maps (str_to_map): the poor man's properties
    // column every log pipeline carries, parsed without a UDF.
    "q104_str_to_map" -> ((s, d) => {
      val kv = concat(lit("pri:"), col("o_orderpriority"),
        lit(",st:"), col("o_orderstatus"),
        lit(",k:"), col("o_orderkey") % 100)
      val m = str_to_map(kv, lit(","), lit(":"))
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          element_at(m, "pri").as("pri"),
          element_at(m, "st").as("st"),
          element_at(m, "k").cast("int").as("k"),
          size(m).as("n_keys"))
        .orderBy(col("o_orderkey"))
    }),

    // Timezone conversions: wall-clock ↔ UTC both ways plus a direct
    // zone-to-zone hop, over dates that straddle DST transitions. The
    // Spark side assumes the engine's pinned UTC session zone
    // (build.sbt -Duser.timezone + Verify's session.timeZone config) —
    // to_utc_timestamp and date_format read/render through it. The
    // DuckDB twin is made session-independent explicitly: instants as
    // epoch µs, wall clocks as naive strings, naive→instant through an
    // explicit timezone('UTC', ...) hop.
    "q106_timezones" -> ((s, d) => {
      val ts = col("o_orderdate")
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          unix_micros(to_utc_timestamp(ts, "America/New_York"))
            .as("ny_wall_as_utc_us"),
          date_format(from_utc_timestamp(ts, "America/New_York"),
            "yyyy-MM-dd HH:mm:ss").as("utc_as_ny_wall"),
          date_format(convert_timezone(lit("America/New_York"),
            lit("Asia/Tokyo"), ts), "yyyy-MM-dd HH:mm:ss")
            .as("ny_to_tokyo_wall"))
        .orderBy(col("o_orderkey"))
    }),

    // Catalog DDL surface: CREATE TABLE ... USING parquet at an
    // external location, INSERT INTO from a query, read back through
    // the catalog name, DROP — the managed-metadata path a SQL user
    // expects. The result is materialized before the table and its
    // files are dropped, so the query leaves no catalog or disk state.
    "q107_catalog_ddl" -> ((s, d) => {
      val loc = graft.Scratch.dir("q107_tbl_")
      val tbl = s"graft_q107_${System.nanoTime()}"
      try {
        Tables.orders(s, d).createOrReplaceTempView("g_orders_ddl")
        s.sql(s"""CREATE TABLE $tbl (o_orderstatus STRING, n BIGINT,
          |  sum_price DOUBLE) USING parquet LOCATION '$loc'""".stripMargin)
        // money sum through DECIMAL(20,4): merge-order-free
        s.sql(s"""INSERT INTO $tbl
          |SELECT o_orderstatus, COUNT(*) AS n,
          |  ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE), 2)
          |    AS sum_price
          |FROM g_orders_ddl GROUP BY o_orderstatus""".stripMargin)
        val back = s.sql(s"SELECT * FROM $tbl ORDER BY o_orderstatus")
        s.createDataFrame(
          java.util.Arrays.asList(back.collect(): _*), back.schema)
      } finally {
        // cleanup is log-and-continue: a throwing finally would mask
        // the root-cause exception from the try body
        def quietly(step: => Unit): Unit =
          try step catch { case e: Exception =>
            System.err.println(s"[q107] cleanup step failed: ${e.getMessage}") }
        quietly(s.sql(s"DROP TABLE IF EXISTS $tbl"))
        quietly(s.catalog.dropTempView("g_orders_ddl"))
        quietly {
          val walk = java.nio.file.Files.walk(loc)
          try walk.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
            .forEach(f => java.nio.file.Files.deleteIfExists(f))
          finally walk.close()
        }
      }
    }),

    // Data masking (mask()): the character-class redaction primitive
    // for sharing datasets with PII shapes intact — uppercase/
    // lowercase/digit classes each mapped to a fixed placeholder,
    // punctuation preserved (complements q81's pattern-level scrub).
    "q108_mask" -> ((s, d) => {
      val raw = concat(col("o_orderpriority"), lit("/"),
        col("o_orderstatus"), lit("#"), col("o_orderkey") % 1000)
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          mask(raw).as("masked_default"),
          mask(raw, lit("U"), lit("l"), lit("9"), lit("*")).as("masked_custom"))
        .orderBy(col("o_orderkey"))
    }),

    // Banker's rounding (bround, HALF_EVEN): demonstrated on
    // binary-EXACT halves (k + 0.5, k + 0.25) — the only tie values
    // where both engines provably see the same tie. A data-derived
    // .xx5 double is not exactly representable, and the engines break
    // the phantom tie differently (Spark rounds the shortest-decimal
    // rendering, DuckDB the binary value), so those stay out of the
    // oracle-checked surface.
    "q109_bround" -> ((s, d) => {
      val half = col("o_orderkey") + 0.5
      val quarter = col("o_orderkey") + 0.25
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          bround(half, 0).as("even_int"),
          bround(quarter, 1).as("even_tenth"),
          round(half, 0).as("up_int"))
        .orderBy(col("o_orderkey"))
    }),

    // Cryptographic hash + binary encodings: sha2-256 and md5 digests,
    // base64 and hex round-trips — content addressing and wire
    // encodings every ingest pipeline leans on (q42's fingerprint used
    // md5; this pins the wider family, with a decode-what-you-encoded
    // proof column).
    "q110_hash_encode" -> ((s, d) => {
      val txt = concat(col("o_orderpriority"), lit("|"), col("o_orderkey"))
      // decode columns reuse the projected encode columns, so the
      // round-trip provably decodes the same encoding it pins (and
      // each encoding is computed once)
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          sha2(txt, 256).as("sha256_hex"),
          md5(txt).as("md5_hex"),
          base64(txt.cast("binary")).as("b64"),
          lower(hex(txt)).as("hex_str"))
        .withColumn("b64_rt", unbase64(col("b64")).cast("string"))
        .withColumn("hex_rt", unhex(col("hex_str")).cast("string"))
        .orderBy(col("o_orderkey"))
    }),

    // Observed metrics (Observation API / CollectMetrics): data-quality
    // counters piggyback on an action the pipeline runs anyway — ZERO
    // extra scans, vs the naive "run a second aggregate over the
    // input" (at 100 TB the second scan is the whole cost). Here the
    // driving action is the per-flag count the pipeline wanted; the
    // observed metrics arrive with it and become the query's result.
    // SurfaceOpsSpec proves the piggyback (a CollectMetrics node in
    // the executed plan, one scan).
    "q112_observe_metrics" -> ((s, d) => {
      val obs = org.apache.spark.sql.Observation(
        s"q112_${System.nanoTime()}")
      val watched = Tables.lineitem(s, d).observe(obs,
        count(lit(1)).as("n_rows"),
        round(RelationalCore.dsum(col("l_extendedprice")), 2).as("sum_price"),
        count_if(col("l_quantity") > 45.0).as("n_big"),
        count_if(col("l_discount") === 0.0).as("n_nodisc"))
      val perFlag = watched.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n")).collect() // the driving action
      val m = obs.get
      import s.implicits._
      Seq((m("n_rows").asInstanceOf[Long],
        m("sum_price").asInstanceOf[Double],
        m("n_big").asInstanceOf[Long],
        m("n_nodisc").asInstanceOf[Long],
        perFlag.length))
        .toDF("n_rows", "sum_price", "n_big", "n_nodisc", "n_flags")
    }),

    // Recursive CTE (Spark 4 WITH RECURSIVE): iterative graph
    // reachability expressed declaratively — each step joins the
    // frontier to a fingerprint-derived edge list (one deterministic
    // outgoing edge per doc below 200, so paths never branch and
    // UNION ALL can't blow up). The engine iterates to the fixpoint
    // (~9 steps here; hop sizes are tuned so the step count, which is
    // pure scheduling overhead at 10 frontier rows, stays O(10)) under the depth guard; at scale this replaces
    // the hand-rolled driver loop in Dedup.components for
    // bounded-diameter traversals.
    "q176_recursive_cte" -> ((s, d) => {
      Tables.documents(s, d).createOrReplaceTempView("g_docs_rec")
      s.sql(
        """WITH RECURSIVE
          |e AS (
          |  SELECT doc_id AS src,
          |    doc_id + CAST(conv(substr(md5(text), 1, 15), 16, 10)
          |      AS BIGINT) % 19 + 6 AS dst
          |  FROM g_docs_rec WHERE doc_id < 100),
          |reach(root, node, depth) AS (
          |  SELECT doc_id, doc_id, 0 FROM g_docs_rec WHERE doc_id < 10
          |  UNION ALL
          |  SELECT r.root, e.dst, r.depth + 1
          |  FROM reach r JOIN e ON r.node = e.src
          |  WHERE r.depth < 99)
          |SELECT root, CAST(COUNT(*) AS INT) AS n_reachable,
          |  CAST(MAX(depth) AS INT) AS max_depth,
          |  CAST(MAX(node) AS BIGINT) AS terminal
          |FROM reach GROUP BY root ORDER BY root""".stripMargin)
    }),

    // XML parsing (Spark 4 from_xml): typed struct extraction out of a
    // markup column — the oracle re-extracts the same fields from the
    // identical document with regexps, so the check is value-level,
    // not parser-level.
    "q105_from_xml" -> ((s, d) => {
      val xml = concat(lit("<order><key>"), col("o_orderkey"),
        lit("</key><status>"), col("o_orderstatus"),
        lit("</status><price>"), col("o_totalprice"),
        lit("</price></order>"))
      val parsed = from_xml(xml, lit("STRUCT<key: BIGINT, status: STRING, price: DOUBLE>"))
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          parsed.getField("key").as("xkey"),
          parsed.getField("status").as("xstatus"),
          round(parsed.getField("price"), 2).as("xprice"))
        .orderBy(col("o_orderkey"))
    })
  )

  def oracle: Map[String, String] = Map(
    "q102_inline_stack" ->
      """SELECT o_orderkey, kind, ROUND(v, 2) AS v FROM (
        |  SELECT o_orderkey, 'total' AS kind, o_totalprice AS v FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, 'double' AS kind, o_totalprice * 2 AS v FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, 'triple' AS kind, o_totalprice * 3 AS v FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, 'tens' AS kind, o_totalprice * 10 AS v FROM orders)
        |ORDER BY o_orderkey, kind""".stripMargin,

    // avg_price's sum through DECIMAL(20,4) — the exact value the
    // Spark side's long-cents buffer produces, merge-order-free.
    "q103_typed_dataset" ->
      """SELECT l_returnflag AS flag, COUNT(*) AS n,
        |  ROUND(SUM(l_quantity), 2) AS sum_qty,
        |  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4))) AS DOUBLE)
        |    / COUNT(*), 2) AS avg_price
        |FROM lineitem WHERE l_quantity > 10.0
        |GROUP BY l_returnflag ORDER BY flag""".stripMargin,

    "q104_str_to_map" ->
      """SELECT o_orderkey, o_orderpriority AS pri, o_orderstatus AS st,
        |  CAST(o_orderkey % 100 AS INT) AS k, 3 AS n_keys
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q106_timezones" ->
      """SELECT o_orderkey,
        |  epoch_us(timezone('America/New_York', o_orderdate))
        |    AS ny_wall_as_utc_us,
        |  strftime(timezone('America/New_York',
        |    timezone('UTC', o_orderdate)), '%Y-%m-%d %H:%M:%S')
        |    AS utc_as_ny_wall,
        |  strftime(timezone('Asia/Tokyo',
        |    timezone('America/New_York', o_orderdate)), '%Y-%m-%d %H:%M:%S')
        |    AS ny_to_tokyo_wall
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q107_catalog_ddl" ->
      """SELECT o_orderstatus, COUNT(*) AS n,
        |  ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DOUBLE), 2)
        |    AS sum_price
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "q112_observe_metrics" ->
      """SELECT COUNT(*) AS n_rows,
        |  ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4))) AS DOUBLE), 2)
        |    AS sum_price,
        |  COUNT(*) FILTER (WHERE l_quantity > 45.0) AS n_big,
        |  COUNT(*) FILTER (WHERE l_discount = 0.0) AS n_nodisc,
        |  CAST((SELECT COUNT(DISTINCT l_returnflag) FROM lineitem) AS INT)
        |    AS n_flags
        |FROM lineitem""".stripMargin,

    // same edge construction (the md5-hex-to-int bridge) and the same
    // depth guard; DuckDB's recursive UNION ALL is the semantic twin
    "q176_recursive_cte" ->
      """WITH RECURSIVE
        |e AS (
        |  SELECT doc_id AS src,
        |    doc_id + CAST('0x' || substr(md5(text), 1, 15) AS BIGINT) % 19
        |      + 6 AS dst
        |  FROM documents WHERE doc_id < 100),
        |reach(root, node, depth) AS (
        |  SELECT doc_id, doc_id, 0 FROM documents WHERE doc_id < 10
        |  UNION ALL
        |  SELECT r.root, e.dst, r.depth + 1
        |  FROM reach r JOIN e ON r.node = e.src
        |  WHERE r.depth < 99)
        |SELECT root, CAST(COUNT(*) AS INT) AS n_reachable,
        |  CAST(MAX(depth) AS INT) AS max_depth,
        |  CAST(MAX(node) AS BIGINT) AS terminal
        |FROM reach GROUP BY root ORDER BY root""".stripMargin,

    "q108_mask" ->
      """WITH t AS (SELECT o_orderkey,
        |    o_orderpriority || '/' || o_orderstatus || '#'
        |      || (o_orderkey % 1000) AS raw
        |  FROM orders)
        |SELECT o_orderkey,
        |  regexp_replace(regexp_replace(regexp_replace(raw,
        |    '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
        |    AS masked_default,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(raw,
        |    '[A-Z]', 'U', 'g'), '[a-z]', 'l', 'g'), '[0-9]', '9', 'g'),
        |    '[^Ul9]', '*', 'g') AS masked_custom
        |FROM t ORDER BY o_orderkey""".stripMargin,

    "q109_bround" ->
      """SELECT o_orderkey,
        |  round_even(o_orderkey + 0.5, 0) AS even_int,
        |  round_even(o_orderkey + 0.25, 1) AS even_tenth,
        |  ROUND(o_orderkey + 0.5, 0) AS up_int
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q110_hash_encode" ->
      """WITH t AS (SELECT o_orderkey,
        |    o_orderpriority || '|' || o_orderkey AS txt FROM orders)
        |SELECT o_orderkey, sha256_hex, md5_hex, b64, hex_str,
        |  CAST(from_base64(b64) AS VARCHAR) AS b64_rt,
        |  CAST(unhex(hex_str) AS VARCHAR) AS hex_rt
        |FROM (SELECT o_orderkey,
        |    sha256(txt) AS sha256_hex, md5(txt) AS md5_hex,
        |    to_base64(txt::BLOB) AS b64, lower(hex(txt)) AS hex_str
        |  FROM t)
        |ORDER BY o_orderkey""".stripMargin,

    "q105_from_xml" ->
      """WITH x AS (SELECT o_orderkey,
        |    '<order><key>' || o_orderkey || '</key><status>'
        |      || o_orderstatus || '</status><price>' || o_totalprice
        |      || '</price></order>' AS doc
        |  FROM orders)
        |SELECT o_orderkey,
        |  CAST(regexp_extract(doc, '<key>(.*)</key>', 1) AS BIGINT) AS xkey,
        |  regexp_extract(doc, '<status>(.*)</status>', 1) AS xstatus,
        |  ROUND(CAST(regexp_extract(doc, '<price>(.*)</price>', 1) AS DOUBLE), 2)
        |    AS xprice
        |FROM x ORDER BY o_orderkey""".stripMargin
  )
}
