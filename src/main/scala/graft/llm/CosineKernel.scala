package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Typed cosine-similarity kernel: the small side (query vectors) is
  * collected and broadcast, the large side streams through one
  * `mapPartitions` pass emitting (qid, cid, cosine) — a map-side
  * broadcast nested-loop join specialized for dense vectors.
  *
  * Versus the declarative `crossJoin + zip_with + aggregate` form this
  * replaces: identical arithmetic (float→double casts, ascending-index
  * summation — bit-identical cosines, so the DuckDB oracles are
  * unaffected) but no per-pair array materialization, which is what
  * dominated the expression-tree version's runtime. At 100 TB the
  * broadcast side stays driver-bounded (queries ≤ a few MB) and the
  * candidate side never shuffles.
  */
object CosineKernel {

  /** (qid, cid, cosine) for every broadcast query × candidate pair,
    * `pairFilter`-selected. Cosine is emitted unrounded; callers apply
    * Spark `round()` so decimal rounding semantics match the oracles.
    */
  def pairCosines(
      s: SparkSession,
      candidates: DataFrame, // (vec_id, embedding)
      queryPred: org.apache.spark.sql.Column,
      antisymmetric: Boolean): DataFrame = {
    import s.implicits._
    val qRows = candidates.filter(queryPred)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect()
      .map { case (id, e) => (id, e, norm(e)) }
    val bq = s.sparkContext.broadcast(qRows)
    candidates.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val qs = bq.value
        it.flatMap { case (cid, emb) =>
          val nc = norm(emb)
          qs.iterator
            .filter { case (qid, _, _) =>
              if (antisymmetric) qid < cid else qid != cid
            }
            .map { case (qid, qe, nq) =>
              (qid, cid, dot(qe, emb) / (nq * nc))
            }
        }
      }
      .toDF("qid", "cid", "cosine")
  }

  /** Ascending-index double dot product — same op order as
    * `aggregate(zip_with(a, b, cast*cast))`.
    */
  private def dot(a: Array[Float], b: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  private def norm(a: Array[Float]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i).toDouble * a(i).toDouble; i += 1 }
    math.sqrt(s)
  }
}
