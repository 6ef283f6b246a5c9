package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Tables.configure(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen/parquet-reader paths on a tiny table before
    // timing starts: otherwise the alphabetically-first query absorbs
    // ~4s of one-time init and its number stops meaning anything.
    try {
      spark.read.parquet(s"$sfDir/region.parquet")
        .groupBy("r_name").count().orderBy("r_name").collect()
      // writer paths too: the first parquet write (q101's sentinel) and
      // first csv write (q77) otherwise absorb one-time sink init
      val wdir = Scratch.dir("bench_warm_")
      val tiny = spark.read.parquet(s"$sfDir/region.parquet").limit(1)
      tiny.write.mode("overwrite").parquet(s"$wdir/p")
      tiny.write.mode("overwrite").csv(s"$wdir/c")
      tiny.write.mode("overwrite").orc(s"$wdir/o")
      tiny.write.mode("overwrite").json(s"$wdir/j")
      Scratch.deleteTree(wdir)
    } catch { case _: Throwable => () }
    // Same for the micro-batch engine: the first streaming query pays
    // ~2s of one-time init (streaming planner, state-store coordinator,
    // file-source listing, session-window/append state machinery) that
    // belongs to the engine, not the query — without this,
    // alphabetically-first q101 absorbs it all. The warmup mirrors the
    // replay shape: file source → watermark → session window → append
    // → memory sink.
    try {
      import spark.implicits._
      val sdir = Scratch.dir("bench_warm_stream_")
      spark.range(3)
        .selectExpr("id AS k", "timestamp_micros(id * 1000000) AS ts")
        .coalesce(1).write.parquet(s"$sdir/src")
      val q = spark.readStream
        .schema("k BIGINT, ts TIMESTAMP").parquet(s"$sdir/src")
        .withWatermark("ts", "1 second")
        .groupBy(org.apache.spark.sql.functions.session_window($"ts", "1 second"), $"k")
        .count()
        .writeStream.outputMode("append")
        .option("checkpointLocation", s"$sdir/ckpt")
        .format("memory").queryName("bench_warm_stream").start()
      q.processAllAvailable()
      q.stop()
      Scratch.deleteTree(sdir)
    } catch { case _: Throwable => () }
    // Sorted execution order: run-to-run comparability, instead of
    // whatever query Map iteration order happened to put first.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    // The harness retains only a ~2.4KB tail of stdout; at 181 queries
    // even qNN-shortened keys push an inline per-query map past that
    // and the tail begins mid-JSON (BENCH_r06 arrived parsed:null). So
    // the per-query map goes to bench_queries.json next to the repo
    // root, its line is printed FIRST (truncation can only eat the
    // front of the tail), and the FINAL stdout line is just the total
    // — <200 bytes, always inside any tail window. Locale.ROOT: a
    // comma-decimal default locale would render "1,234" and corrupt
    // the JSON.
    def f(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    def shortKey(name: String): String = name.takeWhile(_ != '_')
    val qs = results.map { case (k, v) => s"\"" + shortKey(k) + "\":" + f(v) }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    val full =
      s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // CWD-relative by the driver contract (Bench runs from the repo
    // root); a failed write must not kill the run but must not be
    // silent either — a stale committed file would misattribute old
    // timings to this run
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("bench_queries.json"), full + "\n")
    catch { case e: Throwable =>
      System.err.println(s"[bench] bench_queries.json not written: $e")
    }
    println(full)
    println(s"""{"metric":"total","value":${f(total)},"unit":"sec","sf":"$sfDir"}""")
    spark.stop()
  }
}
