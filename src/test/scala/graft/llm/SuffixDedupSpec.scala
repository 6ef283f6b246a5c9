package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q278: distributed prefix-doubling substring dedup.
  *
  * Two obligations. (1) EXACTNESS: the doubling-label engine must
  * equal the brute-force "group every 16-token window string" dedup on
  * the real fixture — the labels are supposed to be a lossless
  * equality relabeling, so the outputs must be identical row sets,
  * not approximations. (2) SEMANTICS, surgically: on a planted corpus
  * the reported spans must be exactly the planted shared passages —
  * token-resolution boundaries, correct window counts, correct merge
  * behavior across nearby-but-distinct regions.
  */
class SuffixDedupSpec extends SparkSpec {
  import spark.implicits._

  test("doubling labels equal brute-force window-string grouping on " +
    "the sf0.001 fixture (lossless relabeling, row-for-row)") {
    val got = Dedup.suffixDupSpans(graft.Tables.documents(spark, sf001), 16)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getInt(3), r.getLong(4), r.getDouble(5))).toSeq.sortBy(_._1)

    // brute force: explode every 16-token window STRING, group, flag
    // cross-doc groups, merge with the same islands rule
    import org.apache.spark.sql.expressions.Window
    val L = 16
    val alphaToks = array_remove(split(lower(col("text")), "[^a-z]+"), "")
    val base = graft.Tables.documents(spark, sf001)
      .select(col("doc_id"), alphaToks.as("ts"))
      .withColumn("n", size(col("ts"))).filter(col("n") >= L)
    val wins = base.select(col("doc_id"), col("n"),
        posexplode(expr(s"transform(sequence(1, n - ${L - 1}), " +
          s"i -> array_join(slice(ts, i, $L), ' '))"))
          .as(Seq("p0", "win")))
      .select(col("doc_id"), col("n"), (col("p0") + 1).as("pos"),
        col("win"))
    val dupWins = wins.groupBy(col("win"))
      .agg(count_distinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2).select(col("win"))
    val dupPos = wins.join(dupWins, "win")
      .select(col("doc_id"), col("n"), col("pos"))
    val wD = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val bf = dupPos
      .withColumn("brk",
        when(col("pos") - lag(col("pos"), 1).over(wD) <= L, 0).otherwise(1))
      .withColumn("sid", sum(col("brk")).over(
        wD.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("n"), col("sid"))
      .agg(min(col("pos")).as("st"), (max(col("pos")) + (L - 1)).as("en"),
        count(lit(1)).as("nw"))
      .groupBy(col("doc_id"), col("n"))
      .agg(sum(col("nw")).cast("int").as("dup_windows"),
        count(lit(1)).cast("int").as("n_spans"),
        sum(col("en") - col("st") + 1).as("dup_tokens"))
      .select(col("doc_id"), col("n").cast("int"), col("dup_windows"),
        col("n_spans"), col("dup_tokens"),
        round(col("dup_tokens").cast("double") / col("n"), 6))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getInt(3), r.getLong(4), r.getDouble(5))).toSeq.sortBy(_._1)

    assert(bf.nonEmpty, "no duplicated windows at sf0.001 — pin vacuous")
    assert(got == bf,
      s"doubling diverged from brute force: missing=${bf.diff(got).take(3)} " +
        s"extra=${got.diff(bf).take(3)}")
  }

  test("planted passages: exact span boundaries, window counts, and " +
    "no merge across a >L gap") {
    // vocabulary of unique filler tokens so only the PLANTED passages
    // repeat; doc 30 shares a 20-token passage with doc 10 (one span,
    // 5 windows, 20 dup tokens) and a SECOND 16-token passage with
    // doc 20 placed >16 tokens downstream (own span, 1 window)
    def toks(prefix: String, n: Int): Seq[String] =
      (0 until n).map(i => f"$prefix$i%03d")
    val passA = (0 until 20).map(i => f"shareda$i%03d")
    val passB = (0 until 16).map(i => f"sharedb$i%03d")
    val doc10 = toks("xa", 5) ++ passA ++ toks("xb", 5)          // 30 toks
    val doc20 = toks("xc", 4) ++ passB ++ toks("xd", 4)          // 24 toks
    val doc30 = toks("xe", 3) ++ passA ++ toks("xf", 20) ++
      passB ++ toks("xg", 3)                                     // 62 toks
    val doc40 = toks("xh", 25)                                   // no dups
    val docs = Seq((10L, doc10), (20L, doc20), (30L, doc30), (40L, doc40))
      .map { case (id, ts) => (id, ts.mkString(" ")) }
      .toDF("doc_id", "text")

    val got = Dedup.suffixDupSpans(docs, 16)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getInt(3), r.getLong(4))).toSeq.sortBy(_._1)
    // doc10: passA at pos 6..25 → starts 6..10 (5 windows), 1 span, 20
    // doc20: passB at pos 5..20 → start 5, 1 window, 1 span, 16
    // doc30: passA at 4..23 (starts 4..8) + passB at 44..59 (start 44)
    //        — gap 44-8=36 > 16 → two spans, 6 windows, 36 dup tokens
    // doc40: absent (no duplicated window)
    assert(got == Seq(
      (10L, 30, 5, 1, 20L),
      (20L, 24, 1, 1, 16L),
      (30L, 62, 6, 2, 36L)), got.mkString(", "))
  }
}
