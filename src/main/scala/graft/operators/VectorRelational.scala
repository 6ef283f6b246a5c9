package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}

/** Array/generator operators: the reference's flatMap-style gradient
  * emit (A8, reference `rbmmapper.java:259-268` — explode a matrix into
  * `(weightId, delta)` rows) and the MapReduce-style relational
  * expression of its dense linear algebra (A5's `data·W` matvec and
  * `dataᵀ·probs` outer product, `rbmmapper.java:144-183`).
  *
  * Scale notes: q11 broadcasts the exploded weight vector (64 rows) so
  * the matvec is a broadcast-hash join with no shuffle of the big side
  * except the final per-vector aggregation; q12's cross join is two
  * 64-row inputs — constant size regardless of SF.
  */
object VectorRelational extends QueryModule {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A8: generator/UDTF — posexplode is the builtin Catalyst Generator
    // replacing the reference's hand-rolled emit loop.
    "q04_explode_generator" -> ((s, d) => {
      Tables.embeddings(s, d)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "val")))
        .orderBy(col("vec_id"), col("pos"))
    }),

    // A5 matvec as a relational plan: explode data rows and the weight
    // vector, equi-join on the index, sum products per row — exactly the
    // shape a MapReduce matmul takes, but with the small side broadcast.
    "q11_matvec_agg" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val w = e.filter(col("vec_id") === 0)
        .select(posexplode(col("embedding")).as(Seq("pos", "wval")))
      val x = e.select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "xval")))
      x.join(broadcast(w), Seq("pos"))
        .groupBy(col("vec_id"))
        .agg(round(sum(col("xval").cast("double") * col("wval").cast("double")), 6).as("dot"))
        .orderBy(col("vec_id"))
    }),

    // A5 outer product posprods = dataᵀ·probs (rbmmapper.java:163):
    // cross join of two exploded vectors.
    "q12_outer_product" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
      val a = e.filter(col("vec_id") === 0)
        .select(posexplode(col("embedding")).as(Seq("i", "aval")))
      val b = e.filter(col("vec_id") === 1)
        .select(posexplode(col("embedding")).as(Seq("j", "bval")))
      a.crossJoin(broadcast(b))
        .select(col("i"), col("j"),
          (col("aval").cast("double") * col("bval").cast("double")).as("prod"))
        .orderBy(col("i"), col("j"))
    })
  )

  def oracle: Map[String, String] = Map(
    // DuckDB zips parallel unnests in the same SELECT list, giving
    // positional alignment = Spark's posexplode.
    "q04_explode_generator" ->
      """SELECT vec_id,
        |  CAST(unnest(range(len(embedding))) AS INT) AS pos,
        |  unnest(embedding) AS val
        |FROM embeddings ORDER BY vec_id, pos""".stripMargin,

    "q11_matvec_agg" ->
      """WITH x AS (
        |  SELECT vec_id,
        |    CAST(unnest(range(len(embedding))) AS INT) AS pos,
        |    CAST(unnest(embedding) AS DOUBLE) AS xval
        |  FROM embeddings),
        |w AS (
        |  SELECT CAST(unnest(range(len(embedding))) AS INT) AS pos,
        |    CAST(unnest(embedding) AS DOUBLE) AS wval
        |  FROM embeddings WHERE vec_id = 0)
        |SELECT x.vec_id, ROUND(SUM(x.xval * w.wval), 6) AS dot
        |FROM x JOIN w USING (pos)
        |GROUP BY x.vec_id ORDER BY x.vec_id""".stripMargin,

    "q12_outer_product" ->
      """WITH a AS (
        |  SELECT CAST(unnest(range(len(embedding))) AS INT) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS aval
        |  FROM embeddings WHERE vec_id = 0),
        |b AS (
        |  SELECT CAST(unnest(range(len(embedding))) AS INT) AS j,
        |    CAST(unnest(embedding) AS DOUBLE) AS bval
        |  FROM embeddings WHERE vec_id = 1)
        |SELECT a.i, b.j, a.aval * b.bval AS prod
        |FROM a CROSS JOIN b ORDER BY i, j""".stripMargin
  )
}
