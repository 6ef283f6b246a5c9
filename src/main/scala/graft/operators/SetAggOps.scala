package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}

/** Distinct / set operations / grouping sets / scalar-function suite /
  * approximate aggregation — operator families absent from the
  * reference (SURVEY §2.A gap list), expressed as stock Catalyst plans.
  *
  * Scale notes: set ops run on pre-distinct'd key sets (tiny after
  * dedup); CUBE expands each input row into its grouping-set
  * combinations before the shuffle — acceptable for low-cardinality
  * group keys, and AQE coalesces the post-shuffle partitions.
  * approx_count_distinct is the HLL sketch the reference had no answer
  * to — constant memory at any scale vs an exact distinct's shuffle.
  */
object SetAggOps extends QueryModule {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // DISTINCT + set-op semantics over customer vs supplier nation
    // keys, tagged so one deterministic relation captures all.
    // INTERSECT/EXCEPT/EXCEPT-reversed as three separate branches cost
    // 10 exchanges (each branch re-shuffles both inputs); one full
    // outer join over the two distinct sets gives identical semantics
    // in 3 — the rewrite PlanBudgetSpec's shuffle budget forced.
    "q25_distinct_setops" -> ((s, d) => {
      // null-safe join (<=>) + presence markers, not ck.isNotNull: SQL
      // INTERSECT/EXCEPT treat NULL keys as equal (IS NOT DISTINCT
      // FROM), so a NULL key in both sets must tag 'both', which a
      // plain equi-join + null checks would mis-tag.
      val cn = Tables.customer(s, d).select(col("c_nationkey").as("ck"))
        .distinct().withColumn("in_c", lit(1))
      val sn = Tables.supplier(s, d).select(col("s_nationkey").as("sk"))
        .distinct().withColumn("in_s", lit(1))
      cn.join(sn, col("ck") <=> col("sk"), "full_outer")
        .select(
          when(col("in_c").isNotNull && col("in_s").isNotNull, "both")
            .when(col("in_c").isNotNull, "cust_only")
            .otherwise("supp_only").as("tag"),
          coalesce(col("ck"), col("sk")).as("k"))
        .orderBy(col("tag"), asc_nulls_first("k"))
    }),

    // CUBE over (returnflag, linestatus) with grouping() markers; null
    // group cells coalesced to 'ALL' so cross-engine null ordering never
    // enters the comparison.
    "q26_rollup_cube" -> ((s, d) => {
      Tables.lineitem(s, d)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(grouping(col("l_returnflag")).cast("int").as("g_rf"),
          grouping(col("l_linestatus")).cast("int").as("g_ls"),
          count(lit(1)).as("cnt"),
          sum(col("l_quantity")).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("g_rf"), col("g_ls"), col("cnt"), col("sum_qty"))
        .orderBy(col("rf"), col("ls"), col("g_rf"), col("g_ls"))
    }),

    // Scalar-function suite: string, date, math, conditional — all
    // codegen'd builtins (SURVEY §2.B q27).
    "q27_scalar_fn_suite" -> ((s, d) => {
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          upper(col("o_orderpriority")).as("up"),
          substring(col("o_orderpriority"), 1, 3).as("sub"),
          concat(col("o_orderstatus"), lit("-"), col("o_orderpriority")).as("cc"),
          col("o_orderpriority").like("%URGENT%").as("is_urgent"),
          year(col("o_orderdate")).cast("int").as("yr"),
          month(col("o_orderdate")).cast("int").as("mo"),
          datediff(lit("1998-01-01").cast("date"), col("o_orderdate").cast("date"))
            .cast("int").as("days_to_98"),
          round(col("o_totalprice") / 7.0, 2).as("div_price"),
          abs(col("o_totalprice") - 250000.0).as("abs_diff"),
          round(sqrt(col("o_totalprice")), 4).as("root"),
          when(col("o_totalprice") > 250000.0, "big").otherwise("small").as("bucket"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("status2"))
        .orderBy(col("o_orderkey"))
    }),

    // Array/map construction, JSON extraction, higher-order functions
    // (transform/aggregate) over events.props.
    "q28_array_map_json" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("kv"),
          aggregate(array(col("value"), col("value") * 2.0), lit(0.0),
            (acc, x) => acc + x).as("s2"),
          element_at(transform(array(col("value")), x => x + 1.0), 1).as("t1"),
          element_at(map(lit("a"), col("value")), "a").as("mval"))
        .orderBy(col("event_id"))
    }),

    // HLL approximate distinct vs exact, bounded-error check column
    // (approx sketches differ across engines, so the compared output is
    // the exact count plus a both-sides-true tolerance predicate).
    "q29_approx_distinct" -> ((s, d) => {
      Tables.events(s, d)
        .agg(countDistinct(col("user_id")).as("exact_users"),
          count(lit(1)).as("n"),
          approx_count_distinct(col("user_id")).as("approx_raw"))
        .select(col("exact_users"), col("n"),
          (abs(col("approx_raw") - col("exact_users")) <=
            col("exact_users") * 0.2).as("approx_ok"))
    }),

    // MERGEABLE HLL sketches (Spark 4 datasketches): per-group sketches
    // union into the global sketch with NO rescan — the re-aggregation
    // pattern that matters at 100 TB (store a sketch per day/partition,
    // answer any range by merging KB-sized sketches). The query proves
    // the algebra: union(per-flag sketches) estimates what the direct
    // whole-table sketch estimates to within 2% (not bit-equal: the
    // datasketches impl promotes representations — sparse coupons →
    // dense HLL_4, unions target HLL_8 — so estimates coincide exactly
    // only below the promotion threshold; closeness IS the mergeability
    // contract), plus a 5% bounded-error check vs the exact count.
    // Both proofs travel as both-sides-true predicates (q29's
    // convention — sketch internals aren't SQL-portable).
    "q114_hll_merge" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("g_li_hll")
      s.sql(
        """WITH parts AS (
          |  SELECT l_returnflag, hll_sketch_agg(l_suppkey) AS sk
          |  FROM g_li_hll GROUP BY l_returnflag),
          |merged AS (
          |  SELECT hll_sketch_estimate(hll_union_agg(sk)) AS est_merged
          |  FROM parts),
          |direct AS (
          |  SELECT hll_sketch_estimate(hll_sketch_agg(l_suppkey)) AS est_direct,
          |    COUNT(DISTINCT l_suppkey) AS n_exact
          |  FROM g_li_hll)
          |SELECT n_exact,
          |  (ABS(est_merged - est_direct) <= 0.02 * GREATEST(n_exact, 1))
          |    AS merge_lossless_2pct,
          |  (ABS(est_merged - n_exact) <= 0.05 * n_exact) AS err_within_5pct
          |FROM merged CROSS JOIN direct""".stripMargin)
    }),

    // EXACT distinct counting via Spark 4's BITMAP aggregate family —
    // the zero-error sibling of the sketch path (q29 approx, q114 HLL,
    // q215 theta): user ids bucket into 32768-bit bitmaps
    // (bitmap_bucket_number / bitmap_bit_position), per-(type,bucket)
    // bitmaps build with bitmap_construct_agg, MERGE with
    // bitmap_or_agg, and pop-count with bitmap_count. Distinct-count
    // state becomes a mergeable 4 KB-per-bucket binary — the
    // re-aggregatable EXACT answer where COUNT(DISTINCT) would
    // re-shuffle raw ids on every re-slice (store per-day bitmaps,
    // answer any date range by OR-ing them); bucketing keeps each
    // bitmap bounded however wide the id domain. The merge level is
    // exercised for real: per-(type, user-parity) bitmaps are OR'd
    // into the per-type answer.
    "q250_bitmap_distinct" -> ((s, d) => {
      Tables.events(s, d).createOrReplaceTempView("g_ev_bm")
      s.sql(
        """WITH seg AS (
          |  SELECT event_type, user_id % 2 AS seg,
          |    bitmap_bucket_number(user_id) AS bkt,
          |    bitmap_construct_agg(bitmap_bit_position(user_id)) AS bm
          |  FROM g_ev_bm
          |  GROUP BY event_type, user_id % 2, bitmap_bucket_number(user_id)),
          |merged AS (
          |  SELECT event_type, bkt, bitmap_or_agg(bm) AS bm
          |  FROM seg GROUP BY event_type, bkt),
          |cnt AS (
          |  SELECT event_type,
          |    CAST(SUM(bitmap_count(bm)) AS BIGINT) AS n_distinct_bitmap
          |  FROM merged GROUP BY event_type),
          |exact AS (
          |  SELECT event_type, COUNT(DISTINCT user_id) AS n_exact
          |  FROM g_ev_bm GROUP BY event_type)
          |SELECT cnt.event_type, cnt.n_distinct_bitmap, exact.n_exact,
          |  cnt.n_distinct_bitmap = exact.n_exact AS agree
          |FROM cnt JOIN exact ON exact.event_type = cnt.event_type
          |ORDER BY cnt.event_type""".stripMargin)
    })
  )

  def oracle: Map[String, String] = Map(
    // q250: the bitmap path is EXACT, so the oracle is plain
    // COUNT(DISTINCT) on both output columns and a pinned-true agree
    "q250_bitmap_distinct" ->
      """SELECT event_type,
        |  COUNT(DISTINCT user_id) AS n_distinct_bitmap,
        |  COUNT(DISTINCT user_id) AS n_exact,
        |  TRUE AS agree
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q25_distinct_setops" ->
      """WITH cn AS (SELECT DISTINCT c_nationkey AS k FROM customer),
        |sn AS (SELECT DISTINCT s_nationkey AS k FROM supplier)
        |SELECT 'both' AS tag, k FROM (SELECT k FROM cn INTERSECT SELECT k FROM sn)
        |UNION ALL
        |SELECT 'cust_only' AS tag, k FROM (SELECT k FROM cn EXCEPT SELECT k FROM sn)
        |UNION ALL
        |SELECT 'supp_only' AS tag, k FROM (SELECT k FROM sn EXCEPT SELECT k FROM cn)
        |ORDER BY tag, k NULLS FIRST""".stripMargin,

    "q26_rollup_cube" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf,
        |  COALESCE(l_linestatus, 'ALL') AS ls,
        |  CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
        |  CAST(GROUPING(l_linestatus) AS INT) AS g_ls,
        |  COUNT(*) AS cnt, SUM(l_quantity) AS sum_qty
        |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY rf, ls, g_rf, g_ls""".stripMargin,

    "q27_scalar_fn_suite" ->
      """SELECT o_orderkey,
        |  UPPER(o_orderpriority) AS up,
        |  SUBSTRING(o_orderpriority, 1, 3) AS sub,
        |  CONCAT(o_orderstatus, '-', o_orderpriority) AS cc,
        |  (o_orderpriority LIKE '%URGENT%') AS is_urgent,
        |  CAST(YEAR(o_orderdate) AS INT) AS yr,
        |  CAST(MONTH(o_orderdate) AS INT) AS mo,
        |  CAST(DATE_DIFF('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS INT) AS days_to_98,
        |  ROUND(o_totalprice / 7.0, 2) AS div_price,
        |  ABS(o_totalprice - 250000.0) AS abs_diff,
        |  ROUND(SQRT(o_totalprice), 4) AS root,
        |  CASE WHEN o_totalprice > 250000.0 THEN 'big' ELSE 'small' END AS bucket,
        |  COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status2
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q28_array_map_json" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS kv,
        |  ((0.0 + value) + (value * 2.0)) AS s2,
        |  (value + 1.0) AS t1,
        |  value AS mval
        |FROM events ORDER BY event_id""".stripMargin,

    "q29_approx_distinct" ->
      """SELECT COUNT(DISTINCT user_id) AS exact_users, COUNT(*) AS n,
        |  (ABS(approx_count_distinct(user_id) - COUNT(DISTINCT user_id))
        |     <= COUNT(DISTINCT user_id) * 0.2) AS approx_ok
        |FROM events""".stripMargin,

    // the exact count is recomputed; the two sketch-algebra predicates
    // are asserted true — if Spark's merge ever diverges from the
    // direct sketch by >2%, or the estimate error exceeds 5%, the hash
    // comparison fails
    "q114_hll_merge" ->
      """SELECT COUNT(DISTINCT l_suppkey) AS n_exact,
        |  true AS merge_lossless_2pct,
        |  true AS err_within_5pct
        |FROM lineitem""".stripMargin
  )
}
