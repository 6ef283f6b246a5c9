package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-column data-skipping layout: Z-order (Morton) interleaving.
  *
  * Single-column layouts prune on one predicate only: q125's partition
  * dirs prune `lang=`, q186's buckets co-locate ONE join key, and a
  * file sorted by column A has useless min/max stats for column B. A
  * Z-ordered layout interleaves the bits of two columns' quantized
  * ranks into one sort key, so files hold spatially-compact (A, B)
  * blocks and EVERY file carries tight min/max for BOTH columns — a
  * two-predicate box then skips most files outright from footer stats
  * (and row groups inside survivors, via the pushed parquet filters).
  * This is the standard lakehouse technique (Delta/Iceberg `OPTIMIZE
  * ZORDER BY`), re-expressed as plain Spark: the key is a codegen'd
  * arithmetic expression, the clustering one `repartitionByRange` +
  * `sortWithinPartitions` — a single shuffle paid once at WRITE time
  * (q186's economics), after which reads prune forever.
  *
  * The reference has no layout story at all (a flat text dir scanned
  * whole, reference `driver.java:161`); this is the 100 TB replacement.
  */
object ZOrder {

  /** Morton key over two integral columns: each value is affinely
    * quantized into a `bits`-wide rank on its FULL domain `[lo, hi]`
    * (exact footer-stats min/max — see
    * [[graft.Tables.parquetColumnMinMaxLong]]), then the rank bits are
    * interleaved x→even, y→odd. Pure Column arithmetic — no UDF,
    * stays inside whole-stage codegen. Note the exactness bound:
    * Spark plans `/` on long columns as IEEE DOUBLE true division
    * (the quant expression resolves to DoubleType before the int
    * cast), so multiply-then-divide is exact while
    * (hi−lo)·(2^bits−1) fits double's 53-bit mantissa — spans up to
    * ~1.4e11 at bits=16. Beyond that the quantized ranks drift off
    * the exact grid (loosening skipping, never correctness — the key
    * only CLUSTERS); a span that large should drop `bits` or switch
    * the division to `floor(a / b)` over decimals.
    */
  def zkey(x: Column, y: Column, xRange: (Long, Long), yRange: (Long, Long),
      bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits=$bits out of range")
    def quant(c: Column, r: (Long, Long)): Column = {
      val span = r._2 - r._1
      if (span <= 0L) lit(0L)
      // the division resolves to DoubleType (true division on longs);
      // the cast makes the double→long truncation EXPLICIT rather than
      // leaning on implicit narrowing coercion, which stricter (ANSI)
      // type-coercion modes reject at analysis time
      else ((c.cast("long") - lit(r._1)) * lit((1L << bits) - 1) / lit(span))
        .cast("long")
    }
    val xq = quant(x, xRange)
    val yq = quant(y, yRange)
    (0 until bits).map { i =>
      shiftright(xq, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(yq, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)
  }

  /** Writes `df` as `numFiles` parquet files globally range-clustered
    * on the given sort key (Z-order or plain): one shuffle, then a
    * per-file local sort; the key itself is dropped from the written
    * schema — the layout is invisible in the data, visible only in the
    * footer min/max statistics it tightens.
    */
  def writeClustered(df: DataFrame, key: Column, dir: String,
      numFiles: Int): Unit =
    df.withColumn("__ckey", key)
      .repartitionByRange(numFiles, col("__ckey"))
      .sortWithinPartitions(col("__ckey"))
      .drop("__ckey")
      .write.mode("overwrite").parquet(dir)
}
