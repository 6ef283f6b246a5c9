package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every [[QueryModule]] into the single registry the driver
  * harness consumes: `queries` (name → DataFrame builder over an sfDir)
  * and `oracleSql` (name → DuckDB twin for the hash-compare gate).
  */
object SparkEntry {

  /** All registered engine slices, in SURVEY §7 build order. */
  private def modules: Seq[QueryModule] = Seq(
    operators.RelationalCore,
    operators.VectorRelational,
    operators.JoinOps,
    operators.WindowOps,
    operators.SetAggOps,
    operators.AdvancedOps,
    operators.ExtendedOps,
    operators.SurfaceOps,
    rbm.RbmQueries,
    llm.TextAnalysis,
    llm.Dedup,
    llm.Similarity,
    llm.Multimodal,
    llm.TextPipeline,
    llm.CorpusOps,
    llm.CleanOps,
    llm.StatsOps,
    llm.FeatureOps,
    llm.TrainEval,
    llm.InferenceOps,
    llm.AnalyticsOps,
    ml.Classifier,
    streaming.StreamQueries,
    functions.FnQueries,
    functions.TypeOps,
    sources.SourceQueries,
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The TPC-H Q5-shaped star join (SURVEY §2.B q21) — exercises scan,
    * broadcast dim joins, a fact-fact join, aggregation and sort at once.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q21_multiway_star_join")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2.
    * Cross-module name collisions fail fast (within-module duplicates
    * are unreachable by construction — each module's registry is
    * already a Map).
    */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] = {
    val all = modules.flatMap(_.queries)
    val dups = all.groupBy(_._1).filter(_._2.length > 1).keys
    require(dups.isEmpty, s"duplicate query names across modules: ${dups.mkString(",")}")
    all.toMap
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  lazy val oracleSql: Map[String, String] = {
    val all = modules.flatMap(_.oracle)
    val dups = all.groupBy(_._1).filter(_._2.length > 1).keys
    require(dups.isEmpty, s"duplicate oracle names across modules: ${dups.mkString(",")}")
    val o = all.toMap
    val orphans = o.keySet -- queries.keySet
    require(orphans.isEmpty, s"oracle entries without queries: ${orphans.mkString(",")}")
    o
  }
}
