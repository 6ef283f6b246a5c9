package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}
import exprs._

/** Queries exercising the native Catalyst expressions. */
object FnQueries extends QueryModule {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Native codegen sigmoid — same semantics as q09's composed form,
    // one expression node. Oracle-checked, proving the custom
    // Expression is bit-compatible with the builtin composition.
    "q47_sigmoid_native" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_id"),
          round(graft_sigmoid(col("value") / lit(100.0)), 6).as("sig"))
        .orderBy(col("event_id"))
    }),

    // Streaming polynomial fingerprint (mod 2^61-1). Oracled since
    // round 8 via the q188 technique: the DuckDB twin restates the
    // hash in closed form (SUM(byte_j * 257^(L-1-j)) mod M) over a
    // HUGEINT power table, reading EXACT UTF-8 bytes through
    // to_hex(encode(text)) so parity holds at any fixture encoding;
    // NativeExprSpec's independent BigInteger implementation
    // additionally pins the kernel.
    "q48_rolling_fingerprint" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), graft_rolling_hash(col("text")).as("rhash"))
        .orderBy(col("doc_id"))
    }),

    // Blocked Jaro–Winkler similarity join over part names — the
    // record-linkage kernel (q259's scorer family) as a native
    // codegen expression: candidates come from a composite blocking
    // key (brand × first name token — block sizes bounded by the key
    // product whatever the catalog size, the q228/q259 blocking
    // contract), each candidate pays ONE O(len·window) JW evaluation
    // inside whole-stage codegen (a Scala UDF here would box every
    // row), and the per-brand summary ranks its best pair by the
    // 6dp-ROUNDED score with full name tiebreaks — deterministic even
    // if two engines' doubles drifted a ulp below the rounding
    // boundary (they don't: semantics pinned to DuckDB's
    // implementation, 50k randomized pairs verified equal, and
    // NativeExprSpec pins interpreted ≡ codegen ≡ golden values).
    "q266_jaro_winkler_block" -> ((s, d) => {
      val p = Tables.part(s, d).select(col("p_brand"), col("p_name"),
        split(col("p_name"), " ").getItem(0).as("blk"))
      val b = p.select(col("p_brand").as("brand_b"),
        col("p_name").as("name_b"), col("blk").as("blk_b"))
      p.join(b, col("p_brand") === col("brand_b") &&
          col("blk") === col("blk_b") && col("p_name") < col("name_b"))
        .select(col("p_brand"), col("p_name").as("name_a"), col("name_b"),
          round(graft_jaro_winkler(col("p_name"), col("name_b")), 6)
            .as("jw"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).cast("int").as("n_pairs"),
          sum(when(col("jw") >= 0.9, 1L).otherwise(0L)).cast("int")
            .as("n_high"),
          max(struct(col("jw"), col("name_a"), col("name_b"))).as("best"))
        .select(col("p_brand"), col("n_pairs"), col("n_high"),
          col("best.jw").as("best_jw"), col("best.name_a").as("best_a"),
          col("best.name_b").as("best_b"))
        .orderBy(col("p_brand"))
    })
  )

  def oracle: Map[String, String] = Map(
    "q47_sigmoid_native" ->
      """SELECT event_id, ROUND(1.0 / (1.0 + EXP(-(value / 100.0))), 6) AS sig
        |FROM events ORDER BY event_id""".stripMargin,

    // closed-form RollingHash twin (see q188): byte stream via
    // to_hex(encode(...)) — exact UTF-8 bytes, not code points — and
    // the 2^61-1 modular polynomial in HUGEINT; empty text hashes to 0
    "q48_rolling_fingerprint" ->
      """WITH RECURSIVE
        |pw AS (SELECT 0 AS e, CAST(1 AS HUGEINT) AS p
        |       UNION ALL
        |       SELECT e + 1, (p * 257) % 2305843009213693951
        |       FROM pw WHERE e < 2047),
        |bytes AS (
        |  SELECT doc_id, blen, j,
        |    CAST('0x' || substr(hx, 2 * j + 1, 2) AS INT) AS code
        |  FROM (SELECT doc_id, hx, length(hx) // 2 AS blen,
        |          CAST(unnest(range(length(hx) // 2)) AS INT) AS j
        |        FROM (SELECT doc_id, to_hex(encode(text)) AS hx
        |              FROM documents) h) e),
        |fp AS (
        |  SELECT doc_id,
        |    CAST(SUM((CAST(code AS HUGEINT) * pw.p) % 2305843009213693951)
        |         % 2305843009213693951 AS BIGINT) AS rhash
        |  FROM bytes JOIN pw ON pw.e = blen - 1 - j
        |  GROUP BY doc_id)
        |SELECT d.doc_id, COALESCE(fp.rhash, 0) AS rhash
        |FROM documents d LEFT JOIN fp ON d.doc_id = fp.doc_id
        |ORDER BY d.doc_id""".stripMargin,

    // q266: DuckDB's own jaro_winkler_similarity IS the semantic
    // referent the native expression was pinned to (floored
    // transpositions, left-closed window, 0.7 boost gate, prefix cap
    // 4) — the hash compare here is the cross-engine proof. Best pair
    // via ROW_NUMBER on (jw DESC, name_a DESC, name_b DESC) ≡ Spark's
    // max(struct) tuple order; both engines rank the ROUNDED score.
    "q266_jaro_winkler_block" ->
      """WITH p AS (
        |  SELECT p_brand, p_name, string_split(p_name, ' ')[1] AS blk
        |  FROM part),
        |pr AS (
        |  SELECT a.p_brand, a.p_name AS name_a, b.p_name AS name_b,
        |    ROUND(jaro_winkler_similarity(a.p_name, b.p_name), 6) AS jw
        |  FROM p a JOIN p b ON a.p_brand = b.p_brand AND a.blk = b.blk
        |    AND a.p_name < b.p_name),
        |best AS (
        |  SELECT p_brand, jw, name_a, name_b FROM (
        |    SELECT p_brand, jw, name_a, name_b,
        |      ROW_NUMBER() OVER (PARTITION BY p_brand
        |        ORDER BY jw DESC, name_a DESC, name_b DESC) AS rn
        |    FROM pr) z
        |  WHERE rn = 1)
        |SELECT pr.p_brand, CAST(COUNT(*) AS INT) AS n_pairs,
        |  CAST(SUM(CASE WHEN pr.jw >= 0.9 THEN 1 ELSE 0 END) AS INT)
        |    AS n_high,
        |  MAX(best.jw) AS best_jw, MAX(best.name_a) AS best_a,
        |  MAX(best.name_b) AS best_b
        |FROM pr JOIN best ON best.p_brand = pr.p_brand
        |GROUP BY pr.p_brand
        |ORDER BY pr.p_brand""".stripMargin
  )
}
