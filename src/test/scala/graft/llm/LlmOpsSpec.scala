package graft.llm

import java.nio.file.Files
import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Behavioral tests for the dedup/similarity/multimodal ops on crafted
  * inputs (the fixture corpus is all-distinct, so dup detection needs
  * synthetic dups to prove itself).
  */
class LlmOpsSpec extends SparkSpec {

  /** Writes a synthetic documents table with known duplicate structure
    * and returns its sfDir.
    */
  private lazy val synthDir: String = {
    val dir = Files.createTempDirectory("llmtest").toString
    val base = "the quick brown fox jumps over the lazy dog near the old river bank today"
    val near = "the quick brown fox jumps over the lazy cat near the old river bank today"
    val texts = Seq(
      0L -> base,                   // exact dup of 1
      1L -> base,
      2L -> near,                   // near dup of 0/1 (1 token changed)
      3L -> "completely different words about spark query engines and columnar formats",
      4L -> "yet another unrelated document mentioning joins shuffles and partitions only")
    val rows = texts.map { case (id, t) =>
      Row(id, t, "en", s"src$id", t.length.toLong)
    }
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q35 exact dedup finds the identical pair and only it") {
    val out = Dedup.queries("q35_exact_dedup")(spark, synthDir)
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    assert(out(0L) == 2 && out(1L) == 2)
    assert(Seq(2L, 3L, 4L).forall(out(_) == 1))
  }

  test("q31 minhash LSH flags exact and near dups as candidates, " +
    "not the unrelated docs") {
    val out = Dedup.queries("q31_minhash_dedup")(spark, synthDir)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out(0L) >= 1 && out(1L) >= 1, s"exact dups must collide: $out")
    assert(out(2L) >= 1, s"near dup (14/15 shingles shared) must collide: $out")
    assert(out(3L) == 0 && out(4L) == 0, s"unrelated docs must not: $out")
  }

  test("q124 incremental dedup screens the incoming batch against the " +
    "existing corpus: the staged exact dup is caught, novelty is real") {
    // synthetic split: doc 0 (≡0 mod 5) is the incoming batch; docs
    // 1-4 are the corpus. Doc 0 is an exact dup of corpus doc 1.
    val out = Dedup.queries("q124_incremental_dedup")(spark, synthDir)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getBoolean(2))).toMap
    assert(out.keySet == Set(0L), s"only incoming docs in the output: $out")
    val (nDups, isNovel) = out(0L)
    assert(nDups >= 1 && !isNovel,
      s"exact dup of a corpus doc must not screen as novel: $out")
  }

  test("q127 passage dedup flags the shared leading passage and " +
    "nothing else") {
    // docs 0/1/2 share their first 8 tokens ("the quick brown fox
    // jumps over the lazy" — the near-dup edit is at token 9), docs
    // 3/4 share nothing; each doc is one chunk long
    val out = Dedup.queries("q127_passage_dedup")(spark, synthDir)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(Seq(0L, 1L, 2L).forall(out(_) == (1, 1)),
      s"shared passage not flagged: $out")
    assert(Seq(3L, 4L).forall(out(_) == (1, 0)),
      s"unique passages misflagged: $out")
  }

  test("q130 contamination scores the benchmark's exact twin 1.0, the " +
    "near dup high, unrelated docs 0.0") {
    // doc 0 (id % 50 == 0) is the benchmark; docs 1-4 are the corpus
    val out = Dedup.queries("q130_contamination")(spark, synthDir)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(out(1L) == 1.0, s"exact twin of the benchmark doc: $out")
    assert(out(2L) > 0.5, s"near dup should overlap heavily: $out")
    assert(out(3L) == 0.0 && out(4L) == 0.0, s"unrelated docs: $out")
  }

  test("q132 estimator agrees with exact Jaccard on the degenerate " +
    "cases: identical docs 1.0/1.0, near dups close, disjoint absent") {
    val rows = Dedup.queries("q132_minhash_estimate")(spark, synthDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val (j01, e01, err01) = rows((0L, 1L))
    assert(j01 == 1.0 && e01 == 1.0 && err01 == 0.0,
      s"identical pair must estimate exactly: ${rows((0L, 1L))}")
    // disjoint docs share no shingle, so the pair never forms
    assert(!rows.contains((3L, 4L)), "disjoint pair should be absent")
  }

  test("q37 ngram jaccard: exact pair scores 1.0, near pair high, " +
    "unrelated pairs share nothing") {
    val rows = Dedup.queries("q37_ngram_jaccard")(spark, synthDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(rows((0L, 1L)) == 1.0)
    assert(rows((0L, 2L)) > 0.6 && rows((0L, 2L)) < 1.0)
    // join guarantees a < b, so excluding the unrelated docs means no
    // pair may have b ∈ {3, 4} (parenthesization matters: && binds
    // tighter than ||)
    assert(!rows.keySet.exists { case (_, b) => b == 3L || b == 4L })
  }

  test("q36 simhash: identical docs get identical signatures; near dup " +
    "is within small hamming distance") {
    val sig = Dedup.queries("q36_simhash_dedup")(spark, synthDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sig(0L) == sig(1L))
    val hamming = java.lang.Long.bitCount(sig(0L) ^ sig(2L))
    assert(hamming <= 16, s"near-dup hamming was $hamming")
    val hammingFar = java.lang.Long.bitCount(sig(0L) ^ sig(3L))
    assert(hammingFar > hamming, "unrelated doc should be farther")
  }

  test("q43 LSH ANN is structurally valid, deterministic, and overlaps " +
    "the brute-force top-3 meaningfully") {
    val q = Similarity.queries("q43_ann_lsh")
    val a = q(spark, sf001).collect()
    val b = q(spark, sf001).collect()
    assert(a.nonEmpty)
    assert(a.sameElements(b), "seeded LSH must be run-to-run deterministic")
    val byQ = a.groupBy(_.getLong(0))
    byQ.foreach { case (_, rows) =>
      assert(rows.map(_.getInt(3)).sorted.sameElements(1 to rows.length))
      assert(rows.forall(r => math.abs(r.getDouble(2)) <= 1.0))
    }
    // Recall gate vs the exact brute-force baseline — same contract as
    // q62's: the 8-table × 6-plane OR-amplified candidate set must
    // recover a meaningful share of the true top-3 neighborhood.
    val lshPairs = a.map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Similarity.queries("q32_knn_similarity")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = lshPairs.intersect(brute).size.toDouble / brute.size
    info(s"LSH recall@3 vs brute force = $recall")
    // measured 0.53 on the fixture; the gate sits just below so a
    // silent quality regression (e.g. a plane-seeding change) fails
    // while fixture-level jitter does not
    assert(recall > 0.45,
      s"8-table OR-amplified LSH should recover a meaningful share " +
        s"of true neighbors: $recall")
  }

  test("q62 IVF ANN is deterministic, structurally valid, and overlaps " +
    "the brute-force top-3 meaningfully") {
    val ivf = Similarity.queries("q62_ann_ivf")
    val a = ivf(spark, sf001).collect()
    val b = ivf(spark, sf001).collect()
    assert(a.nonEmpty && a.sameElements(b), "IVF must be deterministic")
    val ivfPairs = a.map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Similarity.queries("q32_knn_similarity")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = ivfPairs.intersect(brute).size.toDouble / brute.size
    info(s"IVF recall@3 vs brute force = $recall")
    // gate just below the measured fixture recall (same rationale as
    // q43's): catches quality regressions, not fixture jitter
    assert(recall > 0.3,
      s"nprobe=2 over 8 cells should recover some true neighbors: $recall")
  }

  test("PGM codec round-trips pixels exactly and rejects malformed input") {
    val px = Array.tabulate(12 * 7)(i => (i * 37) % 256)
    val img = PgmCodec.decode(PgmCodec.encode(12, 7, px))
    assert(img.width == 12 && img.height == 7 && img.maxVal == 255)
    assert(img.pixels.sameElements(px))
    // whitespace/comment tolerance per the netpbm spec
    val commented = ("P5 # a comment\n# another\n 3\t2\n255\n".getBytes("US-ASCII")
      ++ Array[Byte](0, 64, -128, -1, 10, 20))
    val c = PgmCodec.decode(commented)
    assert(c.width == 3 && c.height == 2)
    assert(c.pixels.sameElements(Array(0, 64, 128, 255, 10, 20)))
    for (bad <- Seq(
        "P6\n2 2\n255\n....".getBytes("US-ASCII"), // wrong magic
        "P5\n2 2\n65535\n....".getBytes("US-ASCII"), // 16-bit unsupported
        "P5\n2 2\n255\nab".getBytes("US-ASCII"), // truncated payload
        "P5\n2 x\n255\nabcd".getBytes("US-ASCII"))) // non-digit dim
      intercept[IllegalArgumentException](PgmCodec.decode(bad))
  }

  test("q45 decodes real P5 blobs: stats match a driver-side decode") {
    val rows = Multimodal.queries("q45_multimodal_features")(spark, sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getLong(0)
      val img = PgmCodec.decode(Multimodal.fixtureImage(id))
      assert(r.getInt(1) == Multimodal.fixtureImage(id).length, "n_bytes")
      assert(r.getInt(2) == img.width && r.getInt(3) == img.height, "dims")
      assert(r.getInt(5) == img.pixels.min && r.getInt(6) == img.pixels.max)
      assert(math.abs(r.getDouble(4) -
        img.pixels.map(_.toLong).sum.toDouble / img.pixels.length) < 1e-12)
    }
  }

  test("q137's char count is computed below the explode — a sibling " +
    "computed column in the generate select would re-split the text " +
    "once per exploded CHAR (O(chars²)/doc, measured 37s vs 0.4s at " +
    "sf0.1)") {
    val plan = graft.SparkEntry.queries("q137_char_entropy")(spark, sf001)
      .queryExecution.executedPlan.toString()
    val aboveGenerate = plan.split("Generate", 2)(0)
    assert(!aboveGenerate.contains("split("),
      s"text re-split downstream of the explode:\n$plan")
  }

  test("q147 evaluates the deployed band stage sanely and its repeated " +
    "shingle subtrees dedupe at runtime (PlanBudgetSpec override proof)") {
    val df = graft.SparkEntry.queries("q147_lsh_pr_eval")(spark, sf001)
    val r = df.collect()
    assert(r.length == 1)
    // LSH banding can only lose true pairs probabilistically; on the
    // fixture every >=0.5-Jaccard pair survives banding (fn == 0) and
    // candidates exist (the planted dup structure is in-range)
    assert(r(0).getInt(0) > 0, "no true-positive candidates found")
    assert(r(0).getInt(2) == 0, s"banding missed ${r(0).getInt(2)} true pairs")
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage"),
      s"no runtime exchange reuse in the final adaptive plan:\n$plan")
  }

  test("q183 semantic dedup: every vector lands in exactly one cluster, " +
    "pair counts are the within-cluster C(n,2), dup counts are " +
    "non-vacuous, and the repeated assigned-vectors subtree dedupes at " +
    "runtime (PlanBudgetSpec override proof)") {
    val df = graft.SparkEntry.queries("q183_semantic_dedup")(spark, sf001)
    val rows = df.collect()
    val nVecs = graft.Tables.embeddings(spark, sf001).count()
    assert(rows.map(_.getInt(1).toLong).sum == nVecs,
      "cluster populations must partition the table")
    rows.foreach { r =>
      val n = r.getInt(1).toLong
      assert(r.getLong(2) == n * (n - 1) / 2,
        s"cluster ${r.getInt(0)}: pair count != C($n,2)")
      assert(r.getLong(3) >= r.getLong(4),
        "dup pairs can never be fewer than dropped vectors")
    }
    assert(rows.map(_.getLong(3)).sum > 0,
      "tau=0.35 found no duplicate pairs — the threshold is vacuous " +
        "on this fixture")
    // Adaptive-k population bound: with k = max(8, ceil(sqrt(N))) the
    // expected cluster population is N/k ~ sqrt(N); require the LARGEST
    // cluster to stay within a constant factor of that, i.e. the
    // within-cluster pair stage is O(N) total work, not O(N^2). The
    // factor absorbs the fixture's label-structured skew.
    val k = math.max(8, math.ceil(math.sqrt(nVecs.toDouble)).toInt)
    assert(rows.length <= k, s"more clusters (${rows.length}) than k=$k")
    val maxPop = rows.map(_.getInt(1)).max
    assert(maxPop <= 8.0 * nVecs / k,
      s"largest cluster $maxPop exceeds 8x the expected population " +
        s"${nVecs / k} (N=$nVecs, k=$k) — adaptive k is not bounding " +
        "the pair stage")
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage"),
      s"no runtime exchange reuse in the final adaptive plan:\n$plan")
  }

  test("q153 conserves total rank (PageRank invariant on a graph with " +
    "no dangling nodes) and is deterministic across runs") {
    val run1 = graft.SparkEntry.queries("q153_pagerank")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(run1.nonEmpty, "candidate graph is empty")
    // every node of the undirected candidate graph has deg >= 1, so no
    // rank leaks to dangling nodes and the total stays 1 (up to the
    // per-node round(6))
    val total = run1.map(_._3).sum
    assert(math.abs(total - 1.0) < 1e-3, s"rank total drifted: $total")
    val run2 = graft.SparkEntry.queries("q153_pagerank")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(run1.toSeq == run2.toSeq, "nondeterministic ranks")
  }

  test("q148's (doc,lang,tg) rollup feeds both the profile and the vote " +
    "branches through ONE reused exchange (PlanBudgetSpec override proof)") {
    val df = graft.SparkEntry.queries("q148_trigram_langid")(spark, sf001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.contains("ReusedExchange") || plan.contains("ReusedQueryStage"),
      s"no runtime exchange reuse in the final adaptive plan:\n$plan")
  }
}
