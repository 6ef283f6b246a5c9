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
        |ORDER BY d.doc_id""".stripMargin
  )
}
