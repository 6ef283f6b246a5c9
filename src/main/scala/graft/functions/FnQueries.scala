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

    // Streaming polynomial fingerprint (mod 2^61-1) — no cross-engine
    // oracle exists (DuckDB has no equivalent); pinned instead by an
    // independent BigInteger implementation in NativeExprSpec.
    "q48_rolling_fingerprint" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), graft_rolling_hash(col("text")).as("rhash"))
        .orderBy(col("doc_id"))
    })
  )

  def oracle: Map[String, String] = Map(
    "q47_sigmoid_native" ->
      """SELECT event_id, ROUND(1.0 / (1.0 + EXP(-(value / 100.0))), 6) AS sig
        |FROM events ORDER BY event_id""".stripMargin
  )
}
