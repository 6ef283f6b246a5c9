package graft.sources

import org.apache.spark.sql.functions._
import graft.{Scratch, SparkSpec, Tables}

/** Proves q190's Z-order layout actually SKIPS — the property the
  * oracle (result-invisibility) cannot see.
  *
  * Method: write lineitem twice at sf0.001 into 16 files — once
  * range-clustered on the Morton key, once on `l_partkey` alone (the
  * single-column layout a naive sort gives you) — then, for a band
  * predicate on `l_suppkey` ONLY, count how many files a min/max
  * pruner must read (per-file min/max gathered via input_file_name).
  * The partkey-sorted layout is blind to suppkey: partkey and suppkey
  * are independent, so every file spans nearly the full suppkey domain
  * and nothing prunes. The Z layout keeps both columns' ranges tight
  * per file, so the same band touches only the files whose Z blocks
  * intersect it.
  */
class ZOrderSpec extends SparkSpec {

  test("a suppkey band prunes most Z-ordered files and no partkey-sorted ones") {
    val (pmin, pmax) = Tables.parquetColumnMinMaxLong(spark, sf001, "lineitem", "l_partkey")
    val (smin, smax) = Tables.parquetColumnMinMaxLong(spark, sf001, "lineitem", "l_suppkey")
    val slo = smin + (smax - smin) / 10
    val shi = smin + 3 * ((smax - smin) / 10)
    val base = Tables.lineitem(spark, sf001)
      .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"))
    val dir = Scratch.dir("zorder_spec_")
    try {
      ZOrder.writeClustered(base,
        ZOrder.zkey(col("l_partkey"), col("l_suppkey"), (pmin, pmax), (smin, smax)),
        s"$dir/z", numFiles = 16)
      ZOrder.writeClustered(base, col("l_partkey"), s"$dir/linear", numFiles = 16)
      def filesTouched(path: String): (Long, Long) = {
        val stats = spark.read.parquet(path)
          .groupBy(input_file_name().as("f"))
          .agg(min(col("l_suppkey")).as("lo"), max(col("l_suppkey")).as("hi"))
        val total = stats.count()
        val touched = stats.filter(col("lo") <= shi && col("hi") >= slo).count()
        (touched, total)
      }
      val (zTouched, zTotal) = filesTouched(s"$dir/z")
      val (linTouched, linTotal) = filesTouched(s"$dir/linear")
      assert(zTotal == 16 && linTotal == 16,
        s"expected 16 files per layout, got z=$zTotal linear=$linTotal")
      // independence makes the single-column layout read ~everything…
      assert(linTouched >= 12,
        s"partkey-sorted layout unexpectedly pruned suppkey band: $linTouched/16")
      // …while the Z layout reads at most half of what linear does
      assert(zTouched * 2 <= linTouched,
        s"Z layout did not skip: z=$zTouched linear=$linTouched")
    } finally Scratch.deleteTree(dir)
  }

  test("q190's box predicates are pushed to the parquet scan") {
    // skipping inside surviving files (row-group min/max) rides on the
    // pushed parquet filters; if the filters stop reaching the scan,
    // the layout stops paying inside files too
    val dir = Scratch.dir("zorder_push_")
    try {
      val (pmin, pmax) = Tables.parquetColumnMinMaxLong(spark, sf001, "lineitem", "l_partkey")
      val (smin, smax) = Tables.parquetColumnMinMaxLong(spark, sf001, "lineitem", "l_suppkey")
      ZOrder.writeClustered(
        Tables.lineitem(spark, sf001)
          .select(col("l_partkey"), col("l_suppkey"), col("l_quantity")),
        ZOrder.zkey(col("l_partkey"), col("l_suppkey"), (pmin, pmax), (smin, smax)),
        s"$dir/z", numFiles = 4)
      val p = spark.read.parquet(s"$dir/z")
        .filter(col("l_partkey").between(10, 50) &&
          col("l_suppkey").between(2, 5))
        .queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val pushed = p.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
      for (c <- Seq("l_partkey", "l_suppkey"))
        assert(pushed.contains(s"GreaterThanOrEqual($c") &&
          pushed.contains(s"LessThanOrEqual($c"),
          s"box predicate on $c not pushed:\n$pushed")
    } finally Scratch.deleteTree(dir)
  }

  test("the Morton key interleaves bits exactly") {
    // closed-form check on a degenerate-free grid: domain 0..(2^4-1)
    // quantizes to identity at bits=4, so zkey must equal the textbook
    // interleave
    def morton(x: Long, y: Long, bits: Int): Long =
      (0 until bits).map(i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))).sum
    import spark.implicits._
    val rows = for (x <- 0L to 15L; y <- 0L to 15L) yield (x, y)
    val got = rows.toDF("x", "y")
      .select(col("x"), col("y"),
        ZOrder.zkey(col("x"), col("y"), (0L, 15L), (0L, 15L), bits = 4).as("z"))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) == morton(r.getLong(0), r.getLong(1), 4),
        s"(${r.getLong(0)},${r.getLong(1)})")
    }
  }
}
