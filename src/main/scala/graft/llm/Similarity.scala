package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}

/** Similarity search over the embedding column.
  *
  * q32 is the exact baseline: brute-force cosine top-k as a cross join
  * + per-query window top-k. q43 is the scale path: random-hyperplane
  * LSH buckets turn the O(Q×N) cross join into an equi-join on bucket
  * id — at 100 TB the candidate set per query is ~N/2^planes and the
  * join is an ordinary shuffled hash join on a dense integer key.
  */
object Similarity extends QueryModule {

  /** Exact double-precision cosine between two float-array columns. */
  private def cosine(ea: Column, eb: Column, na: Column, nb: Column): Column =
    round(aggregate(zip_with(ea, eb, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x) / (na * nb), 6)

  private def withNorm(df: DataFrame): DataFrame =
    df.select(col("vec_id"), col("embedding"),
      sqrt(aggregate(col("embedding"), lit(0.0),
        (acc, x) => acc + x.cast("double") * x.cast("double"))).as("nrm"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Brute-force cosine top-3 per query (queries = vec_id<10), via the
    // broadcast typed kernel (bit-identical to the declarative
    // crossJoin+zip_with form it replaced, minus its per-pair array
    // materialization).
    "q32_knn_similarity" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("cosine").desc, col("cid"))
      CosineKernel.pairCosines(s, Tables.embeddings(s, d),
          col("vec_id") < 10, antisymmetric = false)
        .select(col("qid"), col("cid"), round(col("cosine"), 6).as("cosine"))
        .withColumn("rank", row_number().over(w).cast("int"))
        .filter(col("rank") <= 3)
        .orderBy(col("qid"), col("rank"))
    }),

    // LSH-bucketed ANN: 4 seeded random hyperplanes → 16 buckets;
    // candidates are bucket-mates only. Deterministic (seeded planes)
    // but not SQL-expressible → rows-only gate; recall vs q32 is
    // asserted in SimilaritySpec. The bucketing is pure expressions
    // (planes inlined as array literals), so the whole query stays one
    // lazy codegen'd plan — no typed map, no eager materialization.
    "q43_ann_lsh" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val nPlanes = 4
      val dims = 64
      val rnd = new java.util.Random(7L)
      val planes = Array.fill(nPlanes, dims)(rnd.nextGaussian())
      val bucketCol = (0 until nPlanes).map { p =>
        val plane = array(planes(p).map(lit(_)): _*)
        val dot = aggregate(
          zip_with(col("embedding"), plane, (x, y) => x.cast("double") * y),
          lit(0.0), (acc, x) => acc + x)
        when(dot > 0, lit(1 << p)).otherwise(lit(0))
      }.reduce(_ + _)
      val e = withNorm(Tables.embeddings(s, d))
        .withColumn("bucket", bucketCol)
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("eq"),
          col("nrm").as("nq"), col("bucket"))
      val c = e.select(col("vec_id").as("cid"), col("embedding").as("ec"),
        col("nrm").as("nc"), col("bucket"))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("cosine").desc, col("cid"))
      q.join(c, Seq("bucket")).filter(col("qid") =!= col("cid"))
        .select(col("qid"), col("cid"),
          cosine(col("eq"), col("ec"), col("nq"), col("nc")).as("cosine"))
        .withColumn("rank", row_number().over(w).cast("int"))
        .filter(col("rank") <= 3)
        .orderBy(col("qid"), col("rank"))
    })
  )

  def oracle: Map[String, String] = Map(
    "q32_knn_similarity" ->
      """WITH n AS (
        |  SELECT vec_id, embedding,
        |    sqrt((SELECT SUM(CAST(u AS DOUBLE) * CAST(u AS DOUBLE))
        |          FROM (SELECT unnest(embedding) AS u) z)) AS nrm
        |  FROM embeddings),
        |p AS (
        |  SELECT a.vec_id AS qid, b.vec_id AS cid,
        |    ROUND((SELECT SUM(CAST(ua AS DOUBLE) * CAST(ub AS DOUBLE))
        |           FROM (SELECT unnest(a.embedding) AS ua,
        |                        unnest(b.embedding) AS ub) z)
        |      / (a.nrm * b.nrm), 6) AS cosine
        |  FROM n a, n b
        |  WHERE a.vec_id < 10 AND a.vec_id <> b.vec_id),
        |r AS (
        |  SELECT qid, cid, cosine,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY qid
        |      ORDER BY cosine DESC, cid) AS INT) AS rank
        |  FROM p)
        |SELECT qid, cid, cosine, rank FROM r
        |WHERE rank <= 3 ORDER BY qid, rank""".stripMargin
    // q43 intentionally absent (LSH planes not SQL-expressible).
  )
}
