package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}
import graft.functions.exprs.graft_vec_dot

/** Similarity search over the embedding column.
  *
  * q32 is the exact baseline: brute-force cosine top-k as a cross join
  * + per-query window top-k. q43 is the scale path: random-hyperplane
  * LSH buckets turn the O(Q×N) cross join into an equi-join on bucket
  * id — at 100 TB the candidate set per query is ~N/2^planes and the
  * join is an ordinary shuffled hash join on a dense integer key.
  */
object Similarity extends QueryModule {

  /** Exact double-precision cosine between two float-array columns,
    * via the fused codegen dot kernel (bit-identical to the
    * zip_with+aggregate form it replaced — same ascending-index
    * double accumulation — minus the per-pair array allocation).
    */
  private def cosine(ea: Column, eb: Column, na: Column, nb: Column): Column =
    round(graft_vec_dot(ea, eb) / (na * nb), 6)

  private def withNorm(df: DataFrame): DataFrame =
    df.select(col("vec_id"), col("embedding"),
      sqrt(graft_vec_dot(col("embedding"), col("embedding"))).as("nrm"))

  private val LshTables = 8
  private val LshPlanes = 6

  /** q43's seeded random hyperplanes, shared by the query and its
    * oracle twin (which ships them as a literal VALUES table — the
    * q15 W0 technique; Double.toString round-trips bit-exactly
    * through DuckDB's decimal parser).
    */
  private lazy val lshPlaneVals: Array[Array[Array[Double]]] = {
    val rnd = new java.util.Random(7L)
    Array.fill(LshTables, LshPlanes, 64)(rnd.nextGaussian())
  }

  private def lshPlanesValuesSql: String =
    (for (t <- 0 until LshTables; p <- 0 until LshPlanes; i <- 0 until 64)
      yield s"($t,$p,$i,${lshPlaneVals(t)(p)(i)})").mkString(",")

  private val JlK = 16

  /** q200's seeded JL projection matrix (k×64, entries N(0,1)/√k so
    * E‖Rx‖² = ‖x‖²), shared with the oracle twin as literal VALUES —
    * the q43 planes technique.
    */
  private lazy val jlPlanes: Array[Array[Double]] = {
    val rnd = new java.util.Random(13L)
    Array.fill(JlK, 64)(rnd.nextGaussian() / math.sqrt(JlK.toDouble))
  }

  private def jlPlanesValuesSql: String =
    (for (j <- 0 until JlK; i <- 0 until 64)
      yield s"($j,$i,${jlPlanes(j)(i)})").mkString(",")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Maximal-marginal-relevance diversified re-ranking (Carbonell &
    // Goldstein 1998) — the diversity-aware selection every RAG
    // retriever runs AFTER first-stage recall: greedily pick the
    // candidate maximizing λ·rel(q,c) − (1−λ)·max_{s∈S} sim(c,s)
    // (λ=0.7, k=5). The candidate POOL is a constant of the operator
    // (the 60-vector shortlist a first-stage ANN already paid for —
    // q43/q197's output), so the rel (3×60) and pairwise-sim (60×59)
    // cosine tables are pool-bounded at ANY corpus scale: both come
    // from the broadcast exact kernel, are 6dp-rounded ONCE, and the
    // k-step greedy runs on the driver over those settled decimals
    // (A13's driver-iteration argument: model-sized state, ≤64-row
    // result) with score = round6(0.7·rc − 0.3·maxsim) and cid
    // tiebreak — bit-matched by the oracle's 5 unrolled step-CTEs.
    "q301_mmr_rerank" -> ((s, d) => {
      import s.implicits._
      val emb = Tables.embeddings(s, d)
      val cand = emb.filter(col("vec_id") < 70 &&
        (col("vec_id") < 3 || col("vec_id") >= 10))
      val rel = CosineKernel.pairCosines(s, cand, col("vec_id") < 3,
          antisymmetric = false)
        .filter(col("cid") >= 10)
        .select(col("qid"), col("cid"), round(col("cosine"), 6).as("rc"))
        .as[(Long, Long, Double)].collect()
      val pool = emb.filter(col("vec_id") >= 10 && col("vec_id") < 70)
      val sim = CosineKernel.pairCosines(s, pool, lit(true),
          antisymmetric = false)
        .select(col("qid"), col("cid"), round(col("cosine"), 6).as("sc"))
        .as[(Long, Long, Double)].collect()
        .map { case (a, b, c) => ((a, b), c) }.toMap
      // EXACT tenth-micro integer score: 0.7·rc − 0.3·ms over 6dp
      // operands is a 7dp decimal that REALLY lands on .5-microunit
      // midpoints (a 1-in-10 event, observed at sf0.001), where
      // double-round engines disagree — so the greedy ranks on
      // s10 = 7·rc_micro − 3·ms_micro and rounds half-away in pure
      // integer arithmetic, bit-matched by the oracle's CASE/DIV
      def micro(x: Double): Long = math.round(x * 1e6)
      def halfAway(s10: Long): Long =
        if (s10 >= 0) (s10 + 5) / 10 else -((-s10 + 5) / 10)
      val rows = rel.groupBy(_._1).toSeq.flatMap { case (qid, rs) =>
        val rc = rs.map(r => r._2 -> r._3).toMap
        var selected = Vector.empty[(Int, Long, Double, Double)]
        for (step <- 1 to 5) {
          val picked = selected.map(_._2)
          val best = rc.keysIterator.filterNot(picked.contains).map { c =>
            val msm = if (picked.isEmpty) 0L
              else picked.map(sx => micro(sim((sx, c)))).max
            (halfAway(7L * micro(rc(c)) - 3L * msm), c)
          }.maxBy { case (sm, c) => (sm, -c) } // score desc, cid asc
          selected :+= ((step, best._2, rc(best._2),
            best._1.toDouble / 1000000.0))
        }
        selected.map { case (st, c, r, sc) => (qid, st, c, r, sc) }
      }.sortBy(r => (r._1, r._2))
      s.createDataFrame(rows)
        .toDF("qid", "step", "cid", "relevance", "mmr_score")
        .orderBy(col("qid"), col("step"))
    }),

    // Mutual nearest neighbors: pairs where each vector is the OTHER's
    // top-1 — the reciprocal-best-match filter alignment and semantic-
    // dedup pipelines use because one-directional top-1 is hub-polluted
    // (a centroid-ish vector is "nearest" to thousands that are not
    // nearest to it; mutuality kills exactly those). Computed over a
    // 40-vector pool with the broadcast exact kernel so the DuckDB twin
    // is exact; at corpus scale the top-1 comes from an ANN shortlist
    // (q43/q62/q197) + exact re-rank, and the mutuality test is the
    // same self-equi-join on (qid,cid)=(cid,qid) — candidate-list-
    // sized, never all-pairs. Round-before-rank (6dp, cid tiebreak) so
    // both engines pick identical argmaxes.
    "q249_mutual_nn" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val pool = Tables.embeddings(s, d).filter(col("vec_id") < 40)
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("cosine").desc, col("cid"))
      val top1 = CosineKernel.pairCosines(s, pool, lit(true),
          antisymmetric = false)
        .select(col("qid"), col("cid"), round(col("cosine"), 6).as("cosine"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("qid"), col("cid"), col("cosine"))
      top1.as("x").join(top1.as("y"),
          col("x.qid") === col("y.cid") && col("x.cid") === col("y.qid"))
        .filter(col("x.qid") < col("x.cid"))
        .select(col("x.qid").as("vec_a"), col("x.cid").as("vec_b"),
          col("x.cosine").as("cosine"))
        .orderBy(col("vec_a"))
    }),

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

    // Hard-negative mining (round 11) — the contrastive-training data
    // op: for each anchor, the top-5 most-SIMILAR vectors whose label
    // DIFFERS (high-cosine wrong-class examples are exactly what a
    // contrastive/metric-learning batch wants; easy random negatives
    // teach nothing). Rides q32's broadcast kernel for the pair
    // cosines; candidate labels join by cid (at corpus scale the
    // label rides with the candidate row through the kernel), anchor
    // labels broadcast (|anchors| rows). Per-anchor ranking is a
    // qid-partitioned window over the anchors' candidate lists —
    // parallel across anchors, bounded per anchor.
    "q221_hard_negatives" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val labels = Tables.embeddings(s, d).select(col("vec_id"), col("label"))
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("cosine").desc, col("cid"))
      CosineKernel.pairCosines(s, Tables.embeddings(s, d),
          col("vec_id") < 10, antisymmetric = false)
        .join(labels.select(col("vec_id").as("cid"),
          col("label").as("c_label")), "cid")
        .join(broadcast(labels.filter(col("vec_id") < 10)
          .select(col("vec_id").as("qid"), col("label").as("q_label"))), "qid")
        .filter(col("c_label") =!= col("q_label"))
        .select(col("qid"), col("q_label"), col("cid"), col("c_label"),
          round(col("cosine"), 6).as("cosine"))
        .withColumn("rank", row_number().over(w).cast("int"))
        .filter(col("rank") <= 5)
        .orderBy(col("qid"), col("rank"))
    }),

    // LSH-bucketed ANN with OR-amplification: L=8 hash tables of b=6
    // seeded random hyperplanes each. A pair is a candidate if it
    // collides in ANY table — for near neighbors (cosine ~0.9) the
    // per-table collision prob is ~(1−θ/π)^6 ≈ 0.4, so the miss prob
    // across 8 tables is (1−0.4)^8 ≈ 2%, while random pairs collide at
    // (1/2)^6 per table → expected candidate set ≈ L·N/64 = N/8 per
    // query. Deterministic (seeded planes) AND oracle-checked since
    // round 8 — the planes ship into the DuckDB twin as a literal
    // VALUES table; recall vs q32 is asserted in LlmOpsSpec. The
    // bucketing is pure expressions (planes inlined as array literals)
    // exploded over the table index, so the whole query stays one lazy
    // codegen'd plan — no typed map, no eager materialization; the
    // candidate join is an ordinary shuffled equi-join on
    // (table, bucket), and distinct (qid,cid) dedups cross-table
    // collisions before the cosine kernel runs.
    "q43_ann_lsh" -> ((s, d) =>
      lshTopK(s, d, 3).orderBy(col("qid"), col("rank"))),
    // ANN-recall evaluation — the index-quality audit a pipeline runs
    // before trusting q43's LSH index as its retrieval path: the LSH
    // top-10 (the SYSTEM) against the exact brute-force cosine top-10
    // (the TRUTH, q32's kernel) per query — recall@10, hits, and the
    // reciprocal rank of the TRUE nearest neighbor in the system list
    // (0 when LSH missed it entirely), plus global mean recall and
    // MRR. Both lists rank on the 6dp-rounded cosine with cid
    // tiebreak (q183's rule), so membership and ranks are
    // deterministic cross-engine; recall/rr are exact ≤6dp decimals
    // and the global means fold in DECIMAL. Scale shape: truth is the
    // brute-force pass one ALWAYS pays to evaluate an ANN index
    // (bounded by the query sample, never the corpus); the rest rides
    // q43's own candidate join.
    "q283_ann_recall_eval" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("qid"))
        .orderBy(col("cosine").desc, col("cid"))
      val truth = CosineKernel.pairCosines(s, Tables.embeddings(s, d),
          col("vec_id") < 10, antisymmetric = false)
        .select(col("qid"), col("cid"), round(col("cosine"), 6).as("cosine"))
        .withColumn("trank", row_number().over(w))
        .filter(col("trank") <= 10)
      val sys = lshTopK(s, d, 10)
        .select(col("qid"), col("cid"), col("rank").as("srank"))
      val per = truth.select(col("qid"), col("cid"), col("trank"))
        .join(sys, Seq("qid", "cid"), "left")
        .groupBy(col("qid"))
        .agg(sum(when(col("srank").isNotNull, 1).otherwise(0))
            .cast("int").as("hits"),
          min(when(col("trank") === 1, col("srank"))).as("nn_rank"))
        .withColumn("recall",
          (col("hits") * lit(new java.math.BigDecimal("0.1")))
            .cast("decimal(12,6)"))
        .withColumn("rr", coalesce(
          round(lit(1.0) / col("nn_rank").cast("double"), 6), lit(0.0))
          .cast("decimal(12,6)"))
      val g = per.agg(
        round(sum(col("recall")).cast("double") /
          count(lit(1)).cast("double"), 6).as("mean_recall"),
        round(sum(col("rr")).cast("double") /
          count(lit(1)).cast("double"), 6).as("mrr"))
      per.select(col("qid"), col("hits"),
          col("nn_rank").cast("int").as("nn_rank"),
          col("recall").cast("double").as("recall"),
          col("rr").cast("double").as("rr"))
        .crossJoin(broadcast(g))
        .orderBy(col("qid"))
    }),

    // IVF ANN (data-adaptive cells, nprobe=2) — deterministic end to
    // end (fixed sample, seeded Lloyd, (d2,cell) tiebreaks), so since
    // round 9 it is ALSO oracle-checked: the DuckDB twin recomputes the
    // sample + 3 unrolled Lloyd iterations in matched fold order (see
    // the oracle entry). LlmOpsSpec keeps the recall-vs-q32 gate.
    "q62_ann_ivf" -> ((s, d) => ivfQuery(s, d)),

    // Johnson–Lindenstrauss random projection — the third compression
    // op beside q129 (int8) and q197 (PQ): 64-dim embeddings drop to
    // k=16 dims through a seeded Gaussian matrix scaled 1/√k, so
    // pairwise geometry survives in expectation (‖Rx‖ ≈ ‖x‖) at a 4×
    // dimension cut — the cheap pre-ANN compression a pipeline runs
    // before LSH/PQ when the raw width is the bottleneck. Pure codegen:
    // 16 fused dots per row against literal plane arrays, no shuffle at
    // all except the output sort. Each projected coordinate is rounded
    // to 9dp BEFORE the norms (q43's round-before-derive rule: the
    // twin's grouped SUM folds differently), making the distortion
    // column bit-stable cross-engine; JlSpec gates the JL property
    // (norm-ratio concentration) the oracle can't express.
    "q200_jl_projection" -> ((s, d) => {
      val y = (0 until JlK).map { j =>
        round(graft_vec_dot(col("embedding"),
          array(jlPlanes(j).map(lit(_)): _*)), 9).as(s"y$j")
      }
      val e = Tables.embeddings(s, d)
        .select(col("vec_id") +: sqrt(graft_vec_dot(col("embedding"),
          col("embedding"))).as("nrm") +: y: _*)
      val ynorm2 = (0 until JlK).map(j => col(s"y$j") * col(s"y$j"))
        .reduce(_ + _)
      // y is emitted at its native 9dp quantization: re-rounding a
      // 9dp-quantized value to 6dp lands EXACTLY on decimal midpoints
      // for ~1/1000 values, where Spark's BigDecimal HALF_UP and
      // DuckDB's multiply-based round diverge even on identical
      // doubles (the q164 class; caught by the exact-mode sweep at
      // sf0.001). A single round of a generic double never sits
      // within an ulp of a midpoint, so 9dp-once is safe; norm_ratio
      // rounds a generic double, equally safe.
      e.select(col("vec_id"),
          col("y0"), col("y1"), col("y2"), col("y3"),
          round(sqrt(ynorm2) / col("nrm"), 6).as("norm_ratio"))
        .orderBy(col("vec_id"))
    }),

    // Product quantization + ADC scoring — THE embedding-compression
    // path at 100 TB: 64-dim float vectors become PqM bytes (M=8
    // subspaces × K=16 codes, Lloyd codebooks from q62's
    // deterministic sample pipeline), and each query scores the WHOLE
    // code table through an 8×16-entry dot-product lookup table — the
    // scan reads 8 bytes + 8 array lookups + 7 adds per vector, never
    // the vector itself, then only the PqShortlist survivors fetch
    // their full vectors for the exact cosine re-rank. Fully
    // deterministic (fixed sample, seeded Lloyd, (d2,code) tiebreaks,
    // driver LUT folded in index order = DuckDB's list order), so the
    // twin recomputes all 8 codebook pipelines and the same LUT join.
    // PqSpec keeps the recall-vs-exact gate the oracle can't express.
    "q197_ann_pq" -> ((s, d) => pqQuery(s, d)),

    // Reciprocal-rank fusion of two retrievers — the standard way a
    // hybrid search stack combines rankings without calibrating their
    // incomparable scores: fused = Σ 1/(60 + rank_r). Fuses the EXACT
    // dense ranking (q32's brute-force kernel) with the cheap
    // 16-dim JL-PROJECTED ranking (q200's view — the 4×-narrower scan
    // a first-pass retriever actually runs), top-5 per query. Ranks
    // use 6dp-rounded cosines with cid tiebreaks so both engines
    // order identically; the RRF arithmetic is exact rationals in
    // double. Per-query windows — state is |candidates| per query,
    // parallel across queries; at scale the candidate lists are the
    // retrievers' top-k, not the corpus.
    "q212_rrf_fusion" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val emb = Tables.embeddings(s, d)
      val exact = CosineKernel.pairCosines(s, emb, col("vec_id") < 10,
          antisymmetric = false)
        .filter(col("cid") >= 10)
        .select(col("qid"), col("cid"), round(col("cosine"), 6).as("c6"))
      val wE = Window.partitionBy(col("qid"))
        .orderBy(col("c6").desc, col("cid"))
      val rankE = exact.select(col("qid"), col("cid"),
        row_number().over(wE).cast("int").as("rank_exact"))
      val yarr = array((0 until JlK).map(j =>
        round(graft_vec_dot(col("embedding"),
          array(jlPlanes(j).map(lit(_)): _*)), 9)): _*)
      val proj = emb.select(col("vec_id"), yarr.as("y"))
        .withColumn("nrm", sqrt(graft_vec_dot(col("y"), col("y"))))
      val qp = proj.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("y").as("qy"),
          col("nrm").as("qn"))
      val pcos = proj.filter(col("vec_id") >= 10)
        .crossJoin(broadcast(qp))
        .select(col("qid"), col("vec_id").as("cid"),
          round(graft_vec_dot(col("qy"), col("y")) /
            (col("qn") * col("nrm")), 6).as("p6"))
      val wP = Window.partitionBy(col("qid"))
        .orderBy(col("p6").desc, col("cid"))
      val rankP = pcos.select(col("qid"), col("cid"),
        row_number().over(wP).cast("int").as("rank_proj"))
      val wF = Window.partitionBy(col("qid"))
        .orderBy(col("rrf").desc, col("cid"))
      rankE.join(rankP, Seq("qid", "cid"))
        .withColumn("rrf", round(
          lit(1.0) / (lit(60) + col("rank_exact")) +
          lit(1.0) / (lit(60) + col("rank_proj")), 6))
        .withColumn("fused_rank", row_number().over(wF).cast("int"))
        .filter(col("fused_rank") <= 5)
        .select(col("qid"), col("fused_rank"), col("cid"),
          col("rank_exact"), col("rank_proj"), col("rrf"))
        .orderBy(col("qid"), col("fused_rank"))
    }),

    // Int8 scalar quantization of the embedding column — the 4×
    // storage/bandwidth compression an ANN index at scale actually
    // ships. Pass 1: per-dimension [min,max] — an aggregate whose
    // cardinality is the embedding width, so its result broadcasts.
    // Pass 2: code = round-half-up of the affine map into [-127,127]
    // (floor(x+0.5): exact and engine-independent, unlike the two
    // engines' round()s). Output per vector: the code checksum and
    // the worst-dimension reconstruction error. All arithmetic is
    // pinned to double on both engines so the codes are bit-identical.
    "q129_embedding_quantize" -> ((s, d) => {
      val ex = Tables.embeddings(s, d)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .withColumn("v", col("v").cast("double"))
      val stats = ex.groupBy(col("dim"))
        .agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
      val q = ex.join(broadcast(stats), "dim")
        .withColumn("code",
          when(col("mx") === col("mn"), lit(0L))
            .otherwise(floor((col("v") - col("mn")) / (col("mx") - col("mn"))
              * 254 - 127 + 0.5))
            .cast("int"))
        .withColumn("deq",
          when(col("mx") === col("mn"), col("mn"))
            .otherwise((col("code") + lit(127.0)) / 254.0
              * (col("mx") - col("mn")) + col("mn")))
      q.groupBy(col("vec_id"))
        .agg(sum(col("code")).cast("long").as("code_sum"),
          round(max(abs(col("deq") - col("v"))), 6).as("max_err"))
        .orderBy(col("vec_id"))
    }),

    // Embedding-space class diagnostics: per-label centroid cohesion —
    // member count, mean norm, and mean cosine-to-centroid — the
    // separation report an embedding-quality eval runs before trusting
    // labels (or clusters) for curation. The centroid table is
    // labels×dims (tiny → broadcast); corpus shuffles are keyed by
    // (label,dim) and vec_id, never pairwise.
    "q155_embedding_class_stats" -> ((s, d) => {
      val ex = Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"),
          posexplode(col("embedding")).as(Seq("dim", "v")))
        .withColumn("v", col("v").cast("double"))
      val cent = ex.groupBy(col("label"), col("dim")).agg(avg(col("v")).as("c"))
      ex.join(broadcast(cent), Seq("label", "dim"))
        .groupBy(col("vec_id"), col("label"))
        .agg(sum(col("v") * col("c")).as("dot"),
          sum(col("v") * col("v")).as("n2v"),
          sum(col("c") * col("c")).as("n2c"))
        .groupBy(col("label"))
        .agg(count(lit(1)).cast("int").as("n_vecs"),
          round(avg(sqrt(col("n2v"))), 6).as("avg_norm"),
          round(avg(col("dot") / sqrt(col("n2v") * col("n2c"))), 6)
            .as("avg_cos_to_centroid"))
        .orderBy(col("label"))
    }),

    // One distributed k-means refinement step over the embedding table
    // — the building block of corpus topic clustering (cluster-balanced
    // training mixes) and of q62's IVF cell training, here in its
    // at-scale shape: centroids broadcast (k×dims, tiny), assignment is
    // a narrow map pass (zip_with/aggregate fold, codegen'd — no UDF),
    // and the centroid update shuffles only (cid, dim) partial means,
    // never vectors. Deterministic seeding (centroids = vec_id < 4) and
    // a (d2, cid) tiebreak make the step fully oracle-checkable, unlike
    // q62's sampled Lloyd loop.
    // SemDeDup-style semantic dedup (Abbas et al. 2023): coarse-cluster
    // the embedding space, then look for near-duplicate pairs ONLY
    // within a cluster — the trick that turns O(N²) embedding dedup
    // into k independent O((N/k)²) problems. k is ADAPTIVE:
    // max(8, ceil(√N)) — so the expected cluster population N/k grows
    // only as √N and the within-cluster pair join stays sub-quadratic
    // at any corpus size (k is derived from a parquet-metadata count,
    // one driver long; the oracle recomputes the identical k from
    // COUNT(*)). Centroids are the first k seed vectors (q145's
    // convention); assignment is one broadcast map pass maximizing
    // cosine (graft_vec_dot codegen, tie → lowest cid); the pair stage
    // is an equi-join ON THE CLUSTER ID. Cosines are
    // rounded BEFORE the duplicate threshold (τ=0.35 — sized to this
    // synthetic embedding distribution; real corpora use ~0.99+) so the
    // flag can't flip on a ulp. n_dup_vecs counts the higher-id member
    // of each dup pair — the vectors the keep-lowest-id rule drops.
    "q183_semantic_dedup" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val k = math.max(8,
        math.ceil(math.sqrt(
          Tables.parquetRowCount(s, d, "embeddings").toDouble)).toInt)
      val cents = withNorm(Tables.embeddings(s, d).filter(col("vec_id") < k))
        .select(col("vec_id").cast("int").as("cid"),
          col("embedding").as("cvec"), col("nrm").as("cnrm"))
      val scored = withNorm(Tables.embeddings(s, d))
        .join(broadcast(cents))
        .select(col("vec_id"), col("embedding"), col("nrm"), col("cid"),
          (graft_vec_dot(col("embedding"), col("cvec")) /
            (col("nrm") * col("cnrm"))).as("ccos"))
      val wa = Window.partitionBy(col("vec_id"))
        .orderBy(col("ccos").desc, col("cid"))
      val assigned = scored
        .withColumn("rn", row_number().over(wa)).filter(col("rn") === 1)
        .select(col("vec_id"), col("embedding"), col("nrm"), col("cid"))
      val pairs = assigned.as("a").join(assigned.as("b"),
          col("a.cid") === col("b.cid") &&
            col("a.vec_id") < col("b.vec_id"))
        .select(col("a.cid").as("cid"), col("b.vec_id").as("hi_id"),
          round(graft_vec_dot(col("a.embedding"), col("b.embedding")) /
            (col("a.nrm") * col("b.nrm")), 6).as("pcos"))
      val stats = pairs.groupBy(col("cid"))
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("pcos") >= 0.35, 1L).otherwise(0L)).as("n_dup_pairs"),
          countDistinct(when(col("pcos") >= 0.35, col("hi_id")))
            .as("n_dup_vecs"),
          max(col("pcos")).as("max_cosine"))
      assigned.groupBy(col("cid"))
        .agg(count(lit(1)).cast("int").as("n_vectors"))
        .join(stats, Seq("cid"), "left")
        .select(col("cid"), col("n_vectors"),
          coalesce(col("n_pairs"), lit(0L)).as("n_pairs"),
          coalesce(col("n_dup_pairs"), lit(0L)).as("n_dup_pairs"),
          coalesce(col("n_dup_vecs"), lit(0L)).cast("long").as("n_dup_vecs"),
          col("max_cosine"))
        .orderBy(col("cid"))
    }),

    "q145_kmeans_step" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val k = 4
      val cents = Tables.embeddings(s, d).filter(col("vec_id") < k)
        .select(col("vec_id").cast("int").as("cid"),
          col("embedding").as("cvec"))
      val sq = zip_with(col("embedding"), col("cvec"), (x, y) => {
        val dd = x.cast("double") - y.cast("double"); dd * dd
      })
      val dist = Tables.embeddings(s, d)
        .join(broadcast(cents))
        .select(col("vec_id"), col("cid"), col("embedding"),
          aggregate(sq, lit(0.0), (acc, v) => acc + v).as("d2"))
      val w = Window.partitionBy(col("vec_id")).orderBy(col("d2"), col("cid"))
      dist.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("cid"), posexplode(col("embedding")).as(Seq("dim", "v")))
        .groupBy(col("cid"), col("dim"))
        .agg(count(lit(1)).cast("int").as("n_members"),
          round(avg(col("v").cast("double")), 6).as("centroid"))
        .select(col("cid"), col("dim").cast("int").as("dim"),
          col("n_members"), col("centroid"))
        .orderBy(col("cid"), col("dim"))
    }),

    // NDCG@10 retrieval-quality evaluation — the graded-relevance IR
    // metric (Järvelin & Kekäläinen 2002) that closes the eval loop
    // the ANN family opened: q147 scores LSH candidate RECALL, q229
    // scores a binary classifier's AUC; this scores an approximate
    // RANKING against the exact one. System = sign-quantized cosine
    // (the 1-bit/dim compression every large-scale ANN stack fields);
    // truth = exact cosine top-10 with graded relevance rel = 11 −
    // rank. The sign-dot is a pure INTEGER agreement count (64 −
    // 2·hamming) so the system ranking has zero float parity surface;
    // the only doubles are the exact-cosine truth ranks (q32's rounded
    // kernel) and the DCG fold, which runs left-to-right over the
    // rank-sorted array with the 1/log₂(i+1) discounts inlined as
    // shared decimal literals (no transcendental eval at runtime, no
    // cross-engine libm drift). Per-query top-10 is a qid-partitioned
    // window — parallel across queries; at corpus scale the scale path
    // is q213's collect_top_k heap aggregate.
    "q256_ndcg_eval" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val wLits = "array(cast(1.0 as double), 0.6309297536D, 0.5D, " +
        "0.4306765581D, 0.3868528072D, 0.3562071871D, 0.3333333333D, " +
        "0.3154648768D, 0.3010299957D, 0.2890648263D)"
      val emb = Tables.embeddings(s, d)
      val wT = Window.partitionBy(col("qid"))
        .orderBy(col("cosine").desc, col("cid"))
      val truth = CosineKernel.pairCosines(s, emb, col("vec_id") < 10,
          antisymmetric = false)
        .select(col("qid"), col("cid"), round(col("cosine"), 6).as("cosine"))
        .withColumn("trank", row_number().over(wT))
        .filter(col("trank") <= 10)
        .select(col("qid"), col("cid"),
          (lit(11) - col("trank")).cast("int").as("rel"))
      val q = emb.filter(col("vec_id") < 10)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      val wS = Window.partitionBy(col("qid"))
        .orderBy(col("sdot").desc, col("cid"))
      val sys = emb.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("cid"),
          expr("""aggregate(zip_with(qe, embedding,
            |  (x, y) -> IF((x >= cast(0 as float)) = (y >= cast(0 as float)),
            |            1, -1)), 0, (acc, v) -> acc + v)""".stripMargin)
            .as("sdot"))
        .withColumn("srank", row_number().over(wS))
        .filter(col("srank") <= 10)
      sys.join(truth, Seq("qid", "cid"), "left")
        .select(col("qid"), col("srank"),
          coalesce(col("rel"), lit(0)).as("rel"))
        .groupBy(col("qid"))
        .agg(array_sort(collect_list(struct(col("srank"), col("rel"))))
          .as("arr"))
        .withColumn("dcg", expr(
          s"""aggregate(arr, cast(0.0 as double),
             |  (acc, x) -> acc + x.rel * element_at($wLits, x.srank))"""
            .stripMargin))
        .withColumn("idcg", expr(
          s"""aggregate(sequence(1, 10), cast(0.0 as double),
             |  (acc, i) -> acc + (11 - i) * element_at($wLits, i))"""
            .stripMargin))
        .withColumn("hits", expr(
          "aggregate(arr, 0, (acc, x) -> acc + IF(x.rel > 0, 1, 0))"))
        .select(col("qid"), col("hits").cast("int").as("hits"),
          round(col("dcg"), 6).as("dcg"),
          round(col("dcg") / col("idcg"), 6).as("ndcg"))
        .orderBy(col("qid"))
    }),

    // Embedding-distribution drift between two corpus carves (vec_id
    // parity = reference vs current snapshot) — the encoder-version /
    // ingest-shift audit an embedding pipeline runs before trusting
    // similarity joins across snapshots (q165/q239/q276 watch scalar
    // and term distributions; this watches the VECTOR space): per-dim
    // centroid means + |shift|, and two global verdict scalars — the
    // centroids' L2 distance and their cosine. One corpus pass to the
    // (dim × carve) mean grid (64 rows — dimension-bounded, never
    // row-bounded); the global scalars are folds over the grid in
    // EXACT DECIMAL on the 6dp-ROUNDED means (q276's order-free
    // totalization: products of DECIMAL(12,6) summed as decimal are
    // association-free, so both engines feed identical doubles to the
    // final sqrt/divide).
    "q280_embedding_drift" -> ((s, d) => {
      val ex = Tables.embeddings(s, d)
        .select((col("vec_id") % 2 === 0).as("is_ref"),
          posexplode(col("embedding")).as(Seq("dim", "v")))
        .withColumn("v", col("v").cast("double"))
      val dims = ex.groupBy(col("dim"))
        .agg(round(avg(when(col("is_ref"), col("v"))), 6)
            .cast("decimal(12,6)").as("mr"),
          round(avg(when(!col("is_ref"), col("v"))), 6)
            .cast("decimal(12,6)").as("mc"))
      val g = dims.agg(
          sum((col("mc") - col("mr")) * (col("mc") - col("mr"))).as("l2sq"),
          sum(col("mr") * col("mc")).as("dotc"),
          sum(col("mr") * col("mr")).as("n2r"),
          sum(col("mc") * col("mc")).as("n2c"))
        .select(round(sqrt(col("l2sq").cast("double")), 6)
            .as("centroid_shift_l2"),
          round(col("dotc").cast("double") /
            sqrt(col("n2r").cast("double") * col("n2c").cast("double")), 6)
            .as("centroid_cos"))
      dims.select(col("dim").cast("int").as("dim"),
          col("mr").cast("double").as("mean_ref"),
          col("mc").cast("double").as("mean_cur"),
          abs(col("mc") - col("mr")).cast("double").as("abs_shift"))
        .crossJoin(broadcast(g))
        .orderBy(col("dim"))
    })
  )

  /** q43's seeded-LSH ANN pipeline, parameterized by the per-query
    * result depth: L=8 tables × b=6 hyperplanes bucket every vector,
    * candidates equi-join on (table, bucket) and dedup across tables,
    * and the exact cosine re-rank keeps the top `k` per query. Shared
    * by q43 (k=3, the index itself) and q283 (k=10, the recall audit).
    */
  private def lshTopK(s: SparkSession, d: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nTables = LshTables
    val nPlanes = LshPlanes
    val planes = lshPlaneVals
    def bucketCol(t: Int): Column = (0 until nPlanes).map { p =>
      val plane = array(planes(t)(p).map(lit(_)): _*)
      // fused codegen dot: 48 plane projections per row allocate no
      // intermediate arrays (the zip_with form did). The projection
      // is rounded to 9dp BEFORE the sign test on both engines
      // (q183's round-before-threshold rule): the twin's grouped SUM
      // folds in a different order than this index-ordered kernel,
      // and an unrounded `> 0` was the one cross-engine decision
      // boundary a ~1e-15 fold difference could flip.
      val dot = round(graft_vec_dot(col("embedding"), plane), 9)
      when(dot > 0, lit(1 << p)).otherwise(lit(0))
    }.reduce(_ + _)
    // one row per (vector, table): tbl tags which table the bucket
    // belongs to so buckets from different tables never join
    val buckets = array((0 until nTables).map(t =>
      struct(lit(t).as("tbl"), bucketCol(t).as("bucket"))): _*)
    val e = withNorm(Tables.embeddings(s, d))
      .select(col("vec_id"), col("embedding"), col("nrm"),
        explode(buckets).as("tb"))
      .select(col("vec_id"), col("embedding"), col("nrm"),
        col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("tbl"), col("bucket"))
    val c = e.select(col("vec_id").as("cid"), col("tbl"), col("bucket"))
    // candidate pairs (deduped across tables), then fetch embeddings
    // once per side for the exact re-rank
    val pairs = q.join(c, Seq("tbl", "bucket"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid")).distinct()
    val vq = withNorm(Tables.embeddings(s, d))
      .select(col("vec_id").as("qid"), col("embedding").as("eq"),
        col("nrm").as("nq"))
    val vc = withNorm(Tables.embeddings(s, d))
      .select(col("vec_id").as("cid"), col("embedding").as("ec"),
        col("nrm").as("nc"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("cid"))
    // cosine() rounds to 6dp BEFORE the rank window (q183's rule): a
    // cross-engine ulp difference can flip the ordering only at an
    // exact 6dp tie, where the cid tiebreak decides identically —
    // which (with the planes shipped as literals) makes the
    // seeded-LSH pipeline oracle-checkable
    pairs.join(vq, "qid").join(vc, "cid")
      .select(col("qid"), col("cid"),
        cosine(col("eq"), col("ec"), col("nq"), col("nc")).as("cosine"))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= k)
  }

  /** IVF-style ANN: coarse-quantize vectors into k cells (centroids
    * from a deterministic bounded sample + driver-side Lloyd
    * iterations — the sample stays driver-sized no matter the table
    * size), then search only the query's `nprobe` nearest cells. The
    * scale shape: centroid assignment is one broadcast map pass, the
    * search an equi-join on cell id — same join skeleton as the LSH
    * variant with data-adaptive cells instead of random planes.
    */
  private def ivfQuery(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    val k = 8
    val nprobe = 2
    val sample = Tables.embeddings(s, d)
      .filter(col("vec_id") % 37 === 0).orderBy(col("vec_id")).limit(256)
      .select(col("embedding")).as[Array[Float]].collect()
      .map(_.map(_.toDouble))
    require(sample.length >= k, s"sample too small for $k cells")
    var centroids = sample.take(k)
    for (_ <- 0 until 3) { // Lloyd iterations on the driver-side sample
      val assign = sample.map { v =>
        centroids.indices.minBy(c => l2(v, centroids(c)))
      }
      centroids = centroids.indices.map { c =>
        val members = sample.zip(assign).collect { case (v, a) if a == c => v }
        if (members.isEmpty) centroids(c)
        else members.transpose.map(xs => xs.sum / xs.length).toArray
      }.toArray
    }
    val bc = s.sparkContext.broadcast(centroids)
    val e = withNorm(Tables.embeddings(s, d))
      .select(col("vec_id"), col("embedding"), col("nrm"))
      .as[(Long, Array[Float], Double)]
    val cands = e.mapPartitions { it =>
      val cs = bc.value
      it.map { case (id, emb, nrm) =>
        val v = emb.map(_.toDouble)
        (id, emb, nrm, cs.indices.minBy(c => l2(v, cs(c))))
      }
    }.toDF("cid", "ec", "nc", "cell")
    val queries = e.filter(_._1 < 10).mapPartitions { it =>
      val cs = bc.value
      it.flatMap { case (id, emb, nrm) =>
        val v = emb.map(_.toDouble)
        cs.indices.sortBy(c => l2(v, cs(c))).take(nprobe)
          .map(cell => (id, emb, nrm, cell))
      }
    }.toDF("qid", "eq", "nq", "cell")
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("cid"))
    queries.join(cands, Seq("cell")).filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"),
        cosine(col("eq"), col("ec"), col("nq"), col("nc")).as("cosine"))
      .withColumn("rank", row_number().over(w).cast("int"))
      .filter(col("rank") <= 3)
      .orderBy(col("qid"), col("rank"))
  }

  /** q197: PQ codebooks (M subspaces × K centroids) from the q62
    * sample, 3 Lloyd iterations per subspace — member means fold in
    * sample order so the oracle's ORDER BY sid sums match bit-for-bit.
    */
  private def pqCodebooks(sample: Array[Array[Double]], m: Int, sub: Int,
      k: Int): Array[Array[Array[Double]]] =
    Array.tabulate(m) { mi =>
      val svecs = sample.map(v => v.slice(mi * sub, (mi + 1) * sub))
      var cents = svecs.take(k)
      for (_ <- 0 until 3) {
        val assign = svecs.map(v => cents.indices.minBy(c => l2(v, cents(c))))
        cents = cents.indices.map { c =>
          val members = svecs.zip(assign).collect { case (v, a) if a == c => v }
          if (members.isEmpty) cents(c)
          else members.transpose.map(xs => xs.sum / xs.length).toArray
        }.toArray
      }
      cents
    }

  private val PqM = 8
  private val PqSub = 8
  private val PqK = 16

  /** Index-order L2 norm — matches DuckDB's SUM-over-unnest fold, so
    * normalized vectors are bit-identical across engines.
    */
  private def nrm(v: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    math.sqrt(s)
  }

  private val PqShortlist = 50

  private def pqQuery(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import s.implicits._
    // vectors are NORMALIZED before encoding: ADC then approximates
    // cosine, the metric the exact re-rank (and q32) uses — quantized
    // raw dots would rank by magnitude·cosine and the shortlist would
    // chase long vectors, not near ones.
    // %7, not q62's %37: K=16 codebooks need a bigger deterministic
    // sample than 8 cells do (72 vectors at the smallest fixture)
    val sample = Tables.embeddings(s, d)
      .filter(col("vec_id") % 7 === 0).orderBy(col("vec_id")).limit(256)
      .select(col("embedding")).as[Array[Float]].collect()
      .map(_.map(_.toDouble))
      .map(v => { val n = nrm(v); v.map(_ / n) })
    require(sample.length >= PqK, s"sample too small for $PqK codes")
    val codebooks = pqCodebooks(sample, PqM, PqSub, PqK)
    val bcCb = s.sparkContext.broadcast(codebooks)
    // encode: every vector → M argmin codes (tie → lowest code id);
    // at scale this map pass is the one-time index build
    val encoded = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .mapPartitions { it =>
        val cb = bcCb.value
        it.map { case (id, emb) =>
          val v = emb.map(_.toDouble)
          val n = nrm(v)
          val nv = v.map(_ / n)
          val codes = Array.tabulate(PqM) { mi =>
            val sv = nv.slice(mi * PqSub, (mi + 1) * PqSub)
            cb(mi).indices.minBy(c => l2(sv, cb(mi)(c)))
          }
          (id, codes)
        }
      }.toDF("cid", "codes")
    // 10 queries → driver LUT: lut(m)(c) = dot(q̂_sub_m, centroid_c),
    // folded in index order (= the oracle's unnest list order)
    val qvecs = Tables.embeddings(s, d).filter(col("vec_id") < 10)
      .orderBy(col("vec_id"))
      .select(col("vec_id"), col("embedding")).as[(Long, Array[Float])]
      .collect()
    val lutRows = qvecs.toSeq.map { case (qid, emb) =>
      val v = emb.map(_.toDouble)
      val n = nrm(v)
      val nv = v.map(_ / n)
      val lut = Seq.tabulate(PqM, PqK) { (mi, c) =>
        var acc = 0.0
        var i = 0
        while (i < PqSub) { acc += nv(mi * PqSub + i) * codebooks(mi)(c)(i); i += 1 }
        acc
      }
      (qid, lut.map(_.toSeq))
    }
    val luts = lutRows.toDF("qid", "lut")
    // ADC: PqM lookups + PqM−1 adds per (query, vector) — left-assoc,
    // the oracle adds its dot columns in the same order
    val adc = (0 until PqM).map(mi =>
      element_at(element_at(col("lut"), mi + 1),
        element_at(col("codes"), mi + 1) + 1))
      .reduce(_ + _)
    val wShort = Window.partitionBy(col("qid")).orderBy(col("adc").desc, col("cid"))
    // the production two-phase shape: the 4-byte ADC scan shortlists,
    // then ONLY the shortlist's full vectors are fetched for the exact
    // re-rank — at 100 TB phase 1 reads the code table, phase 2 reads
    // |queries|·shortlist vectors
    val shortlist = encoded.join(broadcast(luts))
      .filter(col("qid") =!= col("cid"))
      .withColumn("adc", adc)
      .withColumn("srank", row_number().over(wShort))
      .filter(col("srank") <= PqShortlist)
      .select(col("qid"), col("cid"))
    val vq = withNorm(Tables.embeddings(s, d))
      .select(col("vec_id").as("qid"), col("embedding").as("eq"),
        col("nrm").as("nq"))
    val vc = withNorm(Tables.embeddings(s, d))
      .select(col("vec_id").as("cid"), col("embedding").as("ec"),
        col("nrm").as("nc"))
    val wFinal = Window.partitionBy(col("qid"))
      .orderBy(col("cosine").desc, col("cid"))
    shortlist.join(vq, "qid").join(vc, "cid")
      .select(col("qid"), col("cid"),
        cosine(col("eq"), col("ec"), col("nq"), col("nc")).as("cosine"))
      .withColumn("rank", row_number().over(wFinal).cast("int"))
      .filter(col("rank") <= 3)
      .orderBy(col("qid"), col("rank"))
  }

  /** q197's DuckDB twin, generated: the normalized q62-style sample +
    * unrolled-Lloyd pipeline instantiated once per subspace on the
    * 16-dim slice, the same encode (argmin over codes, (d2,c)
    * tiebreak), the same query LUT (dot folds in list order = the
    * driver's index order), the same left-assoc PqM-term ADC sum and
    * top-PqShortlist shortlist, and q32's exact-cosine re-rank
    * expression.
    */
  private def pqOracleSql: String = {
    val perSub = (0 until PqM).map { mi =>
      val lo = mi * PqSub + 1
      val hi = (mi + 1) * PqSub
      val iters = (1 to 3).map { it =>
        s"""d${it}_$mi AS MATERIALIZED (SELECT s.sid, s.v, c.c,
           |    (SELECT SUM((z.a - z.b) * (z.a - z.b))
           |     FROM (SELECT unnest(s.v) AS a, unnest(c.v) AS b) z) AS d2
           |  FROM s$mi s, c${it - 1}_$mi c),
           |a${it}_$mi AS MATERIALIZED (SELECT sid, v, c FROM
           |  (SELECT *, ROW_NUMBER() OVER (PARTITION BY sid ORDER BY d2, c) AS rn
           |   FROM d${it}_$mi) t WHERE rn = 1),
           |u${it}_$mi AS MATERIALIZED (SELECT a.c, dm.i AS dim,
           |    SUM(a.v[dm.i + 1] ORDER BY a.sid) / COUNT(*) AS m
           |  FROM a${it}_$mi a, dimss dm GROUP BY a.c, dm.i),
           |c${it}_$mi AS MATERIALIZED (SELECT p.c,
           |    COALESCE((SELECT list(u.m ORDER BY u.dim) FROM u${it}_$mi u
           |              WHERE u.c = p.c), p.v) AS v
           |  FROM c${it - 1}_$mi p)""".stripMargin
      }.mkString(",\n")
      s"""s$mi AS MATERIALIZED (SELECT sid, v[$lo:$hi] AS v FROM samp),
         |c0_$mi AS MATERIALIZED (SELECT sid AS c, v FROM s$mi WHERE sid < $PqK),
         |$iters,
         |enc_$mi AS MATERIALIZED (SELECT vec_id, c AS code FROM
         |  (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, c) AS rn
         |   FROM (SELECT e.vec_id, c.c,
         |           (SELECT SUM((z.a - z.b) * (z.a - z.b))
         |            FROM (SELECT unnest(e.v[$lo:$hi]) AS a,
         |                         unnest(c.v) AS b) z) AS d2
         |         FROM nn e, c3_$mi c) t0) t WHERE rn = 1),
         |lut_$mi AS MATERIALIZED (SELECT q.vec_id AS qid, c.c,
         |    (SELECT SUM(z.a * z.b)
         |     FROM (SELECT unnest(q.v[$lo:$hi]) AS a, unnest(c.v) AS b) z) AS dot
         |  FROM nn q, c3_$mi c WHERE q.vec_id < 10)""".stripMargin
    }.mkString(",\n")
    val adcSumSql = (0 until PqM).map(mi => s"l$mi.dot").mkString(" + ")
    val encJoinsSql = (1 until PqM)
      .map(mi => s"  JOIN enc_$mi e$mi USING (vec_id)").mkString("\n")
    val lutJoinsSql = (1 until PqM)
      .map(mi => s"  JOIN lut_$mi l$mi ON l$mi.qid = l0.qid AND l$mi.c = e$mi.code")
      .mkString("\n")
    s"""WITH samp AS MATERIALIZED (
       |  SELECT sid, list_transform(v, x -> x / nrm) AS v FROM (
       |    SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS sid,
       |           list_transform(embedding, u -> CAST(u AS DOUBLE)) AS v,
       |           sqrt((SELECT SUM(CAST(u AS DOUBLE) * CAST(u AS DOUBLE))
       |                 FROM (SELECT unnest(embedding) AS u) z)) AS nrm
       |    FROM (SELECT vec_id, embedding FROM embeddings
       |          WHERE vec_id % 7 = 0 ORDER BY vec_id LIMIT 256))),
       |dimss AS MATERIALIZED (SELECT CAST(unnest(range($PqSub)) AS INT) AS i),
       |nn AS MATERIALIZED (
       |  SELECT vec_id, embedding, nrm, list_transform(dv, x -> x / nrm) AS v
       |  FROM (SELECT vec_id, embedding,
       |          list_transform(embedding, u -> CAST(u AS DOUBLE)) AS dv,
       |          sqrt((SELECT SUM(CAST(u AS DOUBLE) * CAST(u AS DOUBLE))
       |                FROM (SELECT unnest(embedding) AS u) z)) AS nrm
       |        FROM embeddings)),
       |$perSub,
       |scored AS MATERIALIZED (
       |  SELECT l0.qid, e0.vec_id AS cid, $adcSumSql AS adc
       |  FROM enc_0 e0
       |$encJoinsSql
       |  JOIN lut_0 l0 ON l0.c = e0.code
       |$lutJoinsSql
       |  WHERE l0.qid <> e0.vec_id),
       |short AS MATERIALIZED (SELECT qid, cid FROM
       |  (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
       |     ORDER BY adc DESC, cid) AS rn FROM scored) t
       |  WHERE rn <= $PqShortlist),
       |rer AS MATERIALIZED (
       |  SELECT sh.qid, sh.cid,
       |    ROUND((SELECT SUM(CAST(ua AS DOUBLE) * CAST(ub AS DOUBLE))
       |           FROM (SELECT unnest(a.embedding) AS ua,
       |                        unnest(b.embedding) AS ub) z)
       |      / (a.nrm * b.nrm), 6) AS cosine
       |  FROM short sh
       |  JOIN nn a ON a.vec_id = sh.qid
       |  JOIN nn b ON b.vec_id = sh.cid)
       |SELECT qid, cid, cosine, CAST(rn AS INT) AS rank FROM
       |  (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
       |     ORDER BY cosine DESC, cid) AS rn FROM rer) t
       |WHERE rn <= 3 ORDER BY qid, rank""".stripMargin
  }

  private def l2(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { val t = a(i) - b(i); s += t * t; i += 1 }
    s
  }

  /** q301's twin: the greedy MMR unrolled as 5 generated step-CTEs
    * (q288's generated-oracle convention) — each step ranks
    * round6(0.7·rc − 0.3·greatest(sim to picks)) with cid tiebreak.
    */
  private def mmrOracleSql: String = {
    val steps = (1 to 5).map { i =>
      val prior = (1 until i).map(j => s"c$j")
      val carry = (1 until i)
        .flatMap(j => Seq(s"c$j", s"r$j", s"s$j")).mkString(", ")
      // exact tenth-micro score, half-away integer rounding (see the
      // engine-side rationale: 7dp midpoints are real here)
      def scoreExpr(msm: String) =
        s"""CASE WHEN 7 * r.rcm - 3 * $msm >= 0
           |      THEN (7 * r.rcm - 3 * $msm + 5) // 10
           |      ELSE -((-(7 * r.rcm - 3 * $msm) + 5) // 10) END""".stripMargin
      val sc =
        if (i == 1)
          s"""sc1 AS (
             |  SELECT r.qid, r.cid, r.rc,
             |    ${scoreExpr("0").replace("r.rcm", "r.rcm")} AS score
             |  FROM rel r)""".stripMargin
        else {
          val joins = prior.map(c =>
            s"JOIN sim j$c ON j$c.sa = r.cid AND j$c.sb = p.$c").mkString("\n  ")
          val ms =
            if (prior.size == 1) s"jc1.scm"
            else s"GREATEST(${prior.map(c => s"j$c.scm").mkString(", ")})"
          val notIn = prior.map(c => s"r.cid <> p.$c").mkString(" AND ")
          s"""sc$i AS (
             |  SELECT r.qid, r.cid, r.rc, $carry,
             |    ${scoreExpr(ms)} AS score
             |  FROM rel r JOIN p${i - 1} p ON p.qid = r.qid
             |  $joins
             |  WHERE $notIn)""".stripMargin
        }
      val carryOut = if (carry.isEmpty) "" else s"$carry, "
      val p =
        s"""p$i AS (
           |  SELECT qid, ${carryOut}cid AS c$i, rc AS r$i, score AS s$i
           |  FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
           |          ORDER BY score DESC, cid ASC) AS rn FROM sc$i)
           |  WHERE rn = 1)""".stripMargin
      s"$sc,\n$p"
    }.mkString(",\n")
    val out = (1 to 5).map(i =>
      s"""SELECT qid, CAST($i AS INT) AS step, c$i AS cid,
         |  r$i AS relevance,
         |  CAST(s$i AS DOUBLE) / 1000000.0 AS mmr_score FROM p5""".stripMargin)
      .mkString("\nUNION ALL\n")
    s"""WITH n AS (
       |  SELECT vec_id, embedding,
       |    sqrt((SELECT SUM(CAST(u AS DOUBLE) * CAST(u AS DOUBLE))
       |          FROM (SELECT unnest(embedding) AS u) z)) AS nrm
       |  FROM embeddings
       |  WHERE vec_id < 70 AND (vec_id < 3 OR vec_id >= 10)),
       |rel0 AS (
       |  SELECT a.vec_id AS qid, b.vec_id AS cid,
       |    ROUND((SELECT SUM(CAST(ua AS DOUBLE) * CAST(ub AS DOUBLE))
       |           FROM (SELECT unnest(a.embedding) AS ua,
       |                        unnest(b.embedding) AS ub) z)
       |      / (a.nrm * b.nrm), 6) AS rc
       |  FROM n a, n b WHERE a.vec_id < 3 AND b.vec_id >= 10),
       |rel AS (
       |  SELECT qid, cid, rc,
       |    CAST(ROUND(rc * 1000000, 0) AS BIGINT) AS rcm FROM rel0),
       |sim0 AS (
       |  SELECT a.vec_id AS sa, b.vec_id AS sb,
       |    ROUND((SELECT SUM(CAST(ua AS DOUBLE) * CAST(ub AS DOUBLE))
       |           FROM (SELECT unnest(a.embedding) AS ua,
       |                        unnest(b.embedding) AS ub) z)
       |      / (a.nrm * b.nrm), 6) AS sc
       |  FROM n a, n b
       |  WHERE a.vec_id >= 10 AND b.vec_id >= 10
       |    AND a.vec_id <> b.vec_id),
       |sim AS (
       |  SELECT sa, sb,
       |    CAST(ROUND(sc * 1000000, 0) AS BIGINT) AS scm FROM sim0),
       |$steps
       |$out
       |ORDER BY qid, step""".stripMargin
  }

  def oracle: Map[String, String] = Map(
    "q301_mmr_rerank" -> mmrOracleSql,

    // q249: q32's pairwise-cosine CTE over the 40-vector pool, top-1
    // per qid with the same round-before-rank rule, then the mutual
    // self-join
    "q249_mutual_nn" ->
      """WITH n AS (
        |  SELECT vec_id, embedding,
        |    sqrt((SELECT SUM(CAST(u AS DOUBLE) * CAST(u AS DOUBLE))
        |          FROM (SELECT unnest(embedding) AS u) z)) AS nrm
        |  FROM embeddings WHERE vec_id < 40),
        |p AS (
        |  SELECT a.vec_id AS qid, b.vec_id AS cid,
        |    ROUND((SELECT SUM(CAST(ua AS DOUBLE) * CAST(ub AS DOUBLE))
        |           FROM (SELECT unnest(a.embedding) AS ua,
        |                        unnest(b.embedding) AS ub) z)
        |      / (a.nrm * b.nrm), 6) AS cosine
        |  FROM n a, n b WHERE a.vec_id <> b.vec_id),
        |r AS (
        |  SELECT qid, cid, cosine,
        |    ROW_NUMBER() OVER (PARTITION BY qid
        |      ORDER BY cosine DESC, cid) AS rn
        |  FROM p),
        |t1 AS (SELECT qid, cid, cosine FROM r WHERE rn = 1)
        |SELECT x.qid AS vec_a, x.cid AS vec_b, x.cosine
        |FROM t1 x JOIN t1 y ON x.qid = y.cid AND x.cid = y.qid
        |WHERE x.qid < x.cid
        |ORDER BY vec_a""".stripMargin,
    // same centroid assignment (argmax cosine, tie -> lowest cid) and
    // same within-cluster pair scan; cosines rounded 6dp before the
    // tau=0.35 threshold on both engines
    "q183_semantic_dedup" ->
      """WITH n AS (
        |  SELECT vec_id, embedding,
        |    sqrt((SELECT SUM(CAST(u AS DOUBLE) * CAST(u AS DOUBLE))
        |          FROM (SELECT unnest(embedding) AS u) z)) AS nrm
        |  FROM embeddings),
        |k AS (SELECT GREATEST(8, CAST(CEIL(SQRT(COUNT(*))) AS INT)) AS k
        |      FROM embeddings),
        |c AS (SELECT CAST(vec_id AS INT) AS cid, embedding AS cvec,
        |             nrm AS cnrm FROM n WHERE vec_id < (SELECT k FROM k)),
        |sc AS (
        |  SELECT n.vec_id, n.embedding, n.nrm, c.cid,
        |    (SELECT SUM(CAST(ua AS DOUBLE) * CAST(ub AS DOUBLE))
        |     FROM (SELECT unnest(n.embedding) AS ua,
        |                  unnest(c.cvec) AS ub) z)
        |      / (n.nrm * c.cnrm) AS ccos
        |  FROM n, c),
        |asg AS (
        |  SELECT vec_id, embedding, nrm, cid FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
        |      ORDER BY ccos DESC, cid) AS rn FROM sc)
        |  WHERE rn = 1),
        |p AS (
        |  SELECT a.cid, b.vec_id AS hi_id,
        |    ROUND((SELECT SUM(CAST(ua AS DOUBLE) * CAST(ub AS DOUBLE))
        |           FROM (SELECT unnest(a.embedding) AS ua,
        |                        unnest(b.embedding) AS ub) z)
        |      / (a.nrm * b.nrm), 6) AS pcos
        |  FROM asg a JOIN asg b ON a.cid = b.cid AND a.vec_id < b.vec_id),
        |st AS (
        |  SELECT cid, COUNT(*) AS n_pairs,
        |    CAST(SUM(CASE WHEN pcos >= 0.35 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS n_dup_pairs,
        |    COUNT(DISTINCT CASE WHEN pcos >= 0.35 THEN hi_id END)
        |      AS n_dup_vecs,
        |    MAX(pcos) AS max_cosine
        |  FROM p GROUP BY cid),
        |v AS (SELECT cid, CAST(COUNT(*) AS INT) AS n_vectors
        |      FROM asg GROUP BY cid)
        |SELECT v.cid, v.n_vectors,
        |  CAST(COALESCE(st.n_pairs, 0) AS BIGINT) AS n_pairs,
        |  CAST(COALESCE(st.n_dup_pairs, 0) AS BIGINT) AS n_dup_pairs,
        |  CAST(COALESCE(st.n_dup_vecs, 0) AS BIGINT) AS n_dup_vecs,
        |  st.max_cosine
        |FROM v LEFT JOIN st ON v.cid = st.cid ORDER BY v.cid""".stripMargin,

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
        |WHERE rank <= 3 ORDER BY qid, rank""".stripMargin,

    // q221: q32's pairwise-cosine CTE with the label-mismatch filter
    // and the same 6dp round-before-rank rule
    "q221_hard_negatives" ->
      """WITH n AS (
        |  SELECT vec_id, label, embedding,
        |    sqrt((SELECT SUM(CAST(u AS DOUBLE) * CAST(u AS DOUBLE))
        |          FROM (SELECT unnest(embedding) AS u) z)) AS nrm
        |  FROM embeddings),
        |p AS (
        |  SELECT a.vec_id AS qid, a.label AS q_label,
        |    b.vec_id AS cid, b.label AS c_label,
        |    ROUND((SELECT SUM(CAST(ua AS DOUBLE) * CAST(ub AS DOUBLE))
        |           FROM (SELECT unnest(a.embedding) AS ua,
        |                        unnest(b.embedding) AS ub) z)
        |      / (a.nrm * b.nrm), 6) AS cosine
        |  FROM n a, n b
        |  WHERE a.vec_id < 10 AND a.vec_id <> b.vec_id
        |    AND a.label <> b.label),
        |r AS (
        |  SELECT qid, q_label, cid, c_label, cosine,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY qid
        |      ORDER BY cosine DESC, cid) AS INT) AS rank
        |  FROM p)
        |SELECT qid, q_label, cid, c_label, cosine, rank FROM r
        |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,

    // q43: the seeded hyperplanes ship as a literal VALUES table (the
    // q15 W0 technique), the sign-bit buckets are a conditional
    // bit-shift sum per (vector, table), candidates equi-join on
    // (tbl, bucket), and the re-rank is q32's rounded-cosine window
    // same seeded matrix as VALUES, same 9dp round-before-derive, same
    // left-to-right 16-term norm fold
    // both rankings rebuilt verbatim — q32's pairwise-cosine CTE and
    // q200's ys projection (ordered aggregation twins the kernel's
    // ascending fold); the RRF arithmetic is CAST to DOUBLE so both
    // engines divide the same exact integers
    "q212_rrf_fusion" ->
      s"""WITH pl(j, i, w) AS (VALUES $jlPlanesValuesSql),
         |n AS (
         |  SELECT vec_id, embedding,
         |    sqrt((SELECT SUM(CAST(u AS DOUBLE) * CAST(u AS DOUBLE))
         |          FROM (SELECT unnest(embedding) AS u) z)) AS nrm
         |  FROM embeddings),
         |p AS (
         |  SELECT a.vec_id AS qid, b.vec_id AS cid,
         |    ROUND((SELECT SUM(CAST(ua AS DOUBLE) * CAST(ub AS DOUBLE))
         |           FROM (SELECT unnest(a.embedding) AS ua,
         |                        unnest(b.embedding) AS ub) z)
         |      / (a.nrm * b.nrm), 6) AS c6
         |  FROM n a, n b WHERE a.vec_id < 10 AND b.vec_id >= 10),
         |re AS (
         |  SELECT qid, cid, CAST(ROW_NUMBER() OVER (PARTITION BY qid
         |    ORDER BY c6 DESC, cid) AS INT) AS rank_exact
         |  FROM p),
         |ex AS (
         |  SELECT vec_id,
         |    CAST(unnest(range(len(embedding))) AS INT) AS i,
         |    CAST(unnest(embedding) AS DOUBLE) AS x
         |  FROM embeddings),
         |ys AS (
         |  SELECT e.vec_id, pl.j, ROUND(SUM(e.x * pl.w), 9) AS y
         |  FROM ex e JOIN pl ON e.i = pl.i GROUP BY 1, 2),
         |yn AS (
         |  SELECT vec_id, sqrt(SUM(y * y ORDER BY j)) AS ynorm
         |  FROM ys GROUP BY vec_id),
         |pp AS (
         |  SELECT a.vec_id AS qid, b.vec_id AS cid,
         |    ROUND(SUM(a.y * b.y ORDER BY a.j) /
         |      (an.ynorm * bn.ynorm), 6) AS p6
         |  FROM ys a JOIN ys b ON a.j = b.j
         |    JOIN yn an ON an.vec_id = a.vec_id
         |    JOIN yn bn ON bn.vec_id = b.vec_id
         |  WHERE a.vec_id < 10 AND b.vec_id >= 10
         |  GROUP BY a.vec_id, b.vec_id, an.ynorm, bn.ynorm),
         |rp AS (
         |  SELECT qid, cid, CAST(ROW_NUMBER() OVER (PARTITION BY qid
         |    ORDER BY p6 DESC, cid) AS INT) AS rank_proj
         |  FROM pp),
         |f AS (
         |  SELECT re.qid, re.cid, rank_exact, rank_proj,
         |    ROUND(CAST(1.0 AS DOUBLE) / (60 + rank_exact) +
         |          CAST(1.0 AS DOUBLE) / (60 + rank_proj), 6) AS rrf
         |  FROM re JOIN rp ON re.qid = rp.qid AND re.cid = rp.cid)
         |SELECT qid, CAST(ROW_NUMBER() OVER (PARTITION BY qid
         |    ORDER BY rrf DESC, cid) AS INT) AS fused_rank,
         |  cid, rank_exact, rank_proj, rrf
         |FROM f
         |QUALIFY fused_rank <= 5
         |ORDER BY qid, fused_rank""".stripMargin,

    "q200_jl_projection" ->
      s"""WITH pl(j, i, w) AS (VALUES $jlPlanesValuesSql),
         |ex AS (
         |  SELECT vec_id,
         |    CAST(unnest(range(len(embedding))) AS INT) AS i,
         |    CAST(unnest(embedding) AS DOUBLE) AS x
         |  FROM embeddings),
         |n AS (
         |  SELECT vec_id,
         |    sqrt((SELECT SUM(CAST(u AS DOUBLE) * CAST(u AS DOUBLE))
         |          FROM (SELECT unnest(embedding) AS u) z)) AS nrm
         |  FROM embeddings),
         |ys AS (
         |  SELECT e.vec_id, pl.j, ROUND(SUM(e.x * pl.w), 9) AS y
         |  FROM ex e JOIN pl ON e.i = pl.i GROUP BY 1, 2),
         |yn AS (
         |  SELECT vec_id, sqrt(SUM(y * y ORDER BY j)) AS ynorm
         |  FROM ys GROUP BY vec_id)
         |SELECT y0.vec_id,
         |  y0.y AS y0, y1.y AS y1, y2.y AS y2, y3.y AS y3,
         |  ROUND(yn.ynorm / n.nrm, 6) AS norm_ratio
         |FROM (SELECT * FROM ys WHERE j = 0) y0
         |JOIN (SELECT * FROM ys WHERE j = 1) y1 USING (vec_id)
         |JOIN (SELECT * FROM ys WHERE j = 2) y2 USING (vec_id)
         |JOIN (SELECT * FROM ys WHERE j = 3) y3 USING (vec_id)
         |JOIN yn USING (vec_id) JOIN n USING (vec_id)
         |ORDER BY vec_id""".stripMargin,

    "q43_ann_lsh" ->
      s"""WITH pl(tbl, p, i, w) AS (VALUES $lshPlanesValuesSql),
         |ex AS (
         |  SELECT vec_id,
         |    CAST(unnest(range(len(embedding))) AS INT) AS i,
         |    CAST(unnest(embedding) AS DOUBLE) AS x
         |  FROM embeddings),
         |dots AS (
         |  SELECT e.vec_id, pl.tbl, pl.p,
         |    ROUND(SUM(e.x * pl.w), 9) AS dot
         |  FROM ex e JOIN pl ON e.i = pl.i GROUP BY 1, 2, 3),
         |bk AS (
         |  SELECT vec_id, tbl,
         |    SUM(CASE WHEN dot > 0 THEN 1 << p ELSE 0 END) AS bucket
         |  FROM dots GROUP BY 1, 2),
         |cand AS (
         |  SELECT DISTINCT q.vec_id AS qid, c.vec_id AS cid
         |  FROM bk q JOIN bk c ON q.tbl = c.tbl AND q.bucket = c.bucket
         |  WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id),
         |n AS (
         |  SELECT vec_id, embedding,
         |    sqrt((SELECT SUM(CAST(u AS DOUBLE) * CAST(u AS DOUBLE))
         |          FROM (SELECT unnest(embedding) AS u) z)) AS nrm
         |  FROM embeddings),
         |p AS (
         |  SELECT cand.qid, cand.cid,
         |    ROUND((SELECT SUM(CAST(ua AS DOUBLE) * CAST(ub AS DOUBLE))
         |           FROM (SELECT unnest(a.embedding) AS ua,
         |                        unnest(b.embedding) AS ub) z)
         |      / (a.nrm * b.nrm), 6) AS cosine
         |  FROM cand JOIN n a ON cand.qid = a.vec_id
         |            JOIN n b ON cand.cid = b.vec_id),
         |r AS (
         |  SELECT qid, cid, cosine,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY qid
         |      ORDER BY cosine DESC, cid) AS INT) AS rank
         |  FROM p)
         |SELECT qid, cid, cosine, rank FROM r
         |WHERE rank <= 3 ORDER BY qid, rank""".stripMargin,

    // q283: q43's plane/bucket/candidate CTEs at depth 10 (the
    // SYSTEM) + q32's brute-force pair CTE at depth 10 (the TRUTH),
    // identical 6dp-round-before-rank and cid tiebreaks, metrics in
    // exact DECIMAL (recall = hits·0.1; rr rounds the 1/rank division
    // once), global means folded in DECIMAL then divided once
    "q283_ann_recall_eval" ->
      s"""WITH pl(tbl, p, i, w) AS (VALUES $lshPlanesValuesSql),
         |ex AS (
         |  SELECT vec_id,
         |    CAST(unnest(range(len(embedding))) AS INT) AS i,
         |    CAST(unnest(embedding) AS DOUBLE) AS x
         |  FROM embeddings),
         |dots AS (
         |  SELECT e.vec_id, pl.tbl, pl.p,
         |    ROUND(SUM(e.x * pl.w), 9) AS dot
         |  FROM ex e JOIN pl ON e.i = pl.i GROUP BY 1, 2, 3),
         |bk AS (
         |  SELECT vec_id, tbl,
         |    SUM(CASE WHEN dot > 0 THEN 1 << p ELSE 0 END) AS bucket
         |  FROM dots GROUP BY 1, 2),
         |cand AS (
         |  SELECT DISTINCT q.vec_id AS qid, c.vec_id AS cid
         |  FROM bk q JOIN bk c ON q.tbl = c.tbl AND q.bucket = c.bucket
         |  WHERE q.vec_id < 10 AND q.vec_id <> c.vec_id),
         |n AS (
         |  SELECT vec_id, embedding,
         |    sqrt((SELECT SUM(CAST(u AS DOUBLE) * CAST(u AS DOUBLE))
         |          FROM (SELECT unnest(embedding) AS u) z)) AS nrm
         |  FROM embeddings),
         |sp AS (
         |  SELECT cand.qid, cand.cid,
         |    ROUND((SELECT SUM(CAST(ua AS DOUBLE) * CAST(ub AS DOUBLE))
         |           FROM (SELECT unnest(a.embedding) AS ua,
         |                        unnest(b.embedding) AS ub) z)
         |      / (a.nrm * b.nrm), 6) AS cosine
         |  FROM cand JOIN n a ON cand.qid = a.vec_id
         |            JOIN n b ON cand.cid = b.vec_id),
         |sys AS (
         |  SELECT qid, cid,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY qid
         |      ORDER BY cosine DESC, cid) AS INT) AS srank
         |  FROM sp QUALIFY srank <= 10),
         |tp AS (
         |  SELECT a.vec_id AS qid, b.vec_id AS cid,
         |    ROUND((SELECT SUM(CAST(ua AS DOUBLE) * CAST(ub AS DOUBLE))
         |           FROM (SELECT unnest(a.embedding) AS ua,
         |                        unnest(b.embedding) AS ub) z)
         |      / (a.nrm * b.nrm), 6) AS cosine
         |  FROM n a, n b
         |  WHERE a.vec_id < 10 AND a.vec_id <> b.vec_id),
         |tr AS (
         |  SELECT qid, cid,
         |    CAST(ROW_NUMBER() OVER (PARTITION BY qid
         |      ORDER BY cosine DESC, cid) AS INT) AS trank
         |  FROM tp QUALIFY trank <= 10),
         |j AS (
         |  SELECT tr.qid, tr.trank, sys.srank
         |  FROM tr LEFT JOIN sys ON sys.qid = tr.qid AND sys.cid = tr.cid),
         |per AS (
         |  SELECT qid,
         |    CAST(SUM(CASE WHEN srank IS NOT NULL THEN 1 ELSE 0 END)
         |      AS INT) AS hits,
         |    MIN(CASE WHEN trank = 1 THEN srank END) AS nn_rank
         |  FROM j GROUP BY qid),
         |per2 AS (
         |  SELECT qid, hits, nn_rank,
         |    CAST(hits * 0.1 AS DECIMAL(12,6)) AS recall,
         |    CAST(COALESCE(ROUND(1.0 / nn_rank, 6), 0.0)
         |      AS DECIMAL(12,6)) AS rr
         |  FROM per),
         |g AS (
         |  SELECT ROUND(CAST(SUM(recall) AS DOUBLE) /
         |      CAST(COUNT(*) AS DOUBLE), 6) AS mean_recall,
         |    ROUND(CAST(SUM(rr) AS DOUBLE) /
         |      CAST(COUNT(*) AS DOUBLE), 6) AS mrr
         |  FROM per2)
         |SELECT qid, hits, CAST(nn_rank AS INT) AS nn_rank,
         |  CAST(recall AS DOUBLE) AS recall, CAST(rr AS DOUBLE) AS rr,
         |  g.mean_recall, g.mrr
         |FROM per2, g ORDER BY qid""".stripMargin,

    // paired unnests expand in lockstep, so (dim, v) mirrors Spark's
    // posexplode; the 1- vs 0-based dim offset is invisible (dim is a
    // join key only, never output)
    "q129_embedding_quantize" ->
      """WITH ex AS (
        |  SELECT vec_id,
        |    unnest(range(1, len(embedding) + 1)) AS dim,
        |    CAST(unnest(embedding) AS DOUBLE) AS v
        |  FROM embeddings),
        |stats AS (SELECT dim, MIN(v) AS mn, MAX(v) AS mx FROM ex GROUP BY dim),
        |q AS (
        |  SELECT vec_id, v, mn, mx,
        |    CASE WHEN mx = mn THEN 0
        |         ELSE CAST(FLOOR((v - mn) / (mx - mn) * 254 - 127 + 0.5)
        |              AS INT) END AS code
        |  FROM ex JOIN stats USING (dim))
        |SELECT vec_id, CAST(SUM(code) AS BIGINT) AS code_sum,
        |  ROUND(MAX(ABS(CASE WHEN mx = mn THEN mn
        |    ELSE (code + 127.0) / 254.0 * (mx - mn) + mn END - v)), 6)
        |    AS max_err
        |FROM q GROUP BY vec_id ORDER BY vec_id""".stripMargin,


    // IVF ANN twin: unlike q15/q43 the "literals" here are DATA-derived
    // (centroids come from the table), so instead of shipping VALUES the
    // twin RECOMPUTES the engine's whole deterministic pipeline — the
    // vec_id%37/ORDER BY/LIMIT 256 sample, the first-8 seeds, and THREE
    // unrolled Lloyd iterations — with every double-float fold in the
    // same order the Scala driver loop uses (ordered SUM(x ORDER BY sid)
    // = members in ascending-vec_id sample order; zip-unnest subquery
    // sums = ascending dim), so argmin comparisons are bit-identical
    // cross-engine. Assignment/probe tiebreaks (d2, then cell) mirror
    // minBy/stable-sortBy; the final re-rank is q32's rounded-cosine
    // window.
    // generated per-subspace Lloyd + encode + LUT twin (pqOracleSql)
    "q197_ann_pq" -> pqOracleSql,

    "q62_ann_ivf" ->
      """WITH n AS (
        |  SELECT vec_id, embedding,
        |    sqrt((SELECT SUM(CAST(u AS DOUBLE) * CAST(u AS DOUBLE))
        |          FROM (SELECT unnest(embedding) AS u) z)) AS nrm
        |  FROM embeddings),
        |samp AS (
        |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS sid,
        |         list_transform(embedding, u -> CAST(u AS DOUBLE)) AS v
        |  FROM (SELECT vec_id, embedding FROM embeddings
        |        WHERE vec_id % 37 = 0 ORDER BY vec_id LIMIT 256)),
        |dims AS (SELECT CAST(unnest(range(64)) AS INT) AS i),
        |c0 AS (SELECT sid AS c, v FROM samp WHERE sid < 8),
        |d1 AS (SELECT s.sid, s.v, c.c,
        |        (SELECT SUM((z.a - z.b) * (z.a - z.b))
        |         FROM (SELECT unnest(s.v) AS a, unnest(c.v) AS b) z) AS d2
        |       FROM samp s, c0 c),
        |a1 AS (SELECT sid, v, c FROM
        |        (SELECT *, ROW_NUMBER() OVER (PARTITION BY sid ORDER BY d2, c) AS rn
        |         FROM d1) t WHERE rn = 1),
        |u1 AS (SELECT a.c, d.i AS dim, SUM(a.v[d.i + 1] ORDER BY a.sid) / COUNT(*) AS m
        |       FROM a1 a, dims d GROUP BY a.c, d.i),
        |c1 AS (SELECT p.c,
        |         COALESCE((SELECT list(u.m ORDER BY u.dim) FROM u1 u WHERE u.c = p.c),
        |                  p.v) AS v
        |       FROM c0 p),
        |d2_ AS (SELECT s.sid, s.v, c.c,
        |        (SELECT SUM((z.a - z.b) * (z.a - z.b))
        |         FROM (SELECT unnest(s.v) AS a, unnest(c.v) AS b) z) AS d2
        |       FROM samp s, c1 c),
        |a2 AS (SELECT sid, v, c FROM
        |        (SELECT *, ROW_NUMBER() OVER (PARTITION BY sid ORDER BY d2, c) AS rn
        |         FROM d2_) t WHERE rn = 1),
        |u2 AS (SELECT a.c, d.i AS dim, SUM(a.v[d.i + 1] ORDER BY a.sid) / COUNT(*) AS m
        |       FROM a2 a, dims d GROUP BY a.c, d.i),
        |c2 AS (SELECT p.c,
        |         COALESCE((SELECT list(u.m ORDER BY u.dim) FROM u2 u WHERE u.c = p.c),
        |                  p.v) AS v
        |       FROM c1 p),
        |d3_ AS (SELECT s.sid, s.v, c.c,
        |        (SELECT SUM((z.a - z.b) * (z.a - z.b))
        |         FROM (SELECT unnest(s.v) AS a, unnest(c.v) AS b) z) AS d2
        |       FROM samp s, c2 c),
        |a3 AS (SELECT sid, v, c FROM
        |        (SELECT *, ROW_NUMBER() OVER (PARTITION BY sid ORDER BY d2, c) AS rn
        |         FROM d3_) t WHERE rn = 1),
        |u3 AS (SELECT a.c, d.i AS dim, SUM(a.v[d.i + 1] ORDER BY a.sid) / COUNT(*) AS m
        |       FROM a3 a, dims d GROUP BY a.c, d.i),
        |c3 AS (SELECT p.c,
        |         COALESCE((SELECT list(u.m ORDER BY u.dim) FROM u3 u WHERE u.c = p.c),
        |                  p.v) AS v
        |       FROM c2 p),
        |dall AS (SELECT n.vec_id, n.embedding, n.nrm, c.c,
        |          (SELECT SUM((CAST(z.a AS DOUBLE) - z.b) * (CAST(z.a AS DOUBLE) - z.b))
        |           FROM (SELECT unnest(n.embedding) AS a, unnest(c.v) AS b) z) AS d2
        |         FROM n, c3 c),
        |cands AS (SELECT vec_id AS cid, embedding AS ec, nrm AS nc, c AS cell FROM
        |           (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
        |              ORDER BY d2, c) AS rn FROM dall) t WHERE rn = 1),
        |probes AS (SELECT vec_id AS qid, embedding AS eq, nrm AS nq, c AS cell FROM
        |            (SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
        |               ORDER BY d2, c) AS rn FROM dall WHERE vec_id < 10) t
        |           WHERE rn <= 2),
        |p AS (
        |  SELECT q.qid, c.cid,
        |    ROUND((SELECT SUM(CAST(z.a AS DOUBLE) * CAST(z.b AS DOUBLE))
        |           FROM (SELECT unnest(q.eq) AS a, unnest(c.ec) AS b) z)
        |      / (q.nq * c.nc), 6) AS cosine
        |  FROM probes q JOIN cands c ON q.cell = c.cell AND q.qid <> c.cid),
        |r AS (SELECT qid, cid, cosine,
        |        CAST(ROW_NUMBER() OVER (PARTITION BY qid
        |          ORDER BY cosine DESC, cid) AS INT) AS rank
        |      FROM p)
        |SELECT qid, cid, cosine, rank FROM r WHERE rank <= 3 ORDER BY qid, rank""".stripMargin,

    // paired-unnest twin of the posexplode; centroid AVG merge order
    // differs ~1e-13 across engines, absorbed by the round(6)
    "q155_embedding_class_stats" ->
      """WITH ex AS (
        |  SELECT vec_id, label,
        |    unnest(range(1, len(embedding) + 1)) AS dim,
        |    CAST(unnest(embedding) AS DOUBLE) AS v
        |  FROM embeddings),
        |cent AS (SELECT label, dim, AVG(v) AS c FROM ex GROUP BY 1, 2),
        |per AS (
        |  SELECT vec_id, ex.label AS label,
        |    SUM(v * c) AS dot, SUM(v * v) AS n2v, SUM(c * c) AS n2c
        |  FROM ex JOIN cent USING (label, dim) GROUP BY 1, 2)
        |SELECT label, CAST(COUNT(*) AS INT) AS n_vecs,
        |  ROUND(AVG(sqrt(n2v)), 6) AS avg_norm,
        |  ROUND(AVG(dot / sqrt(n2v * n2c)), 6) AS avg_cos_to_centroid
        |FROM per GROUP BY label ORDER BY label""".stripMargin,

    // same seeding/tiebreak; the d2 fold's merge order differs by
    // ~1e-13 relative across engines — an assignment flip would need
    // two centroids equidistant to that precision
    "q145_kmeans_step" ->
      """WITH cents AS (
        |  SELECT CAST(vec_id AS INT) AS cid, embedding AS cvec
        |  FROM embeddings WHERE vec_id < 4),
        |dist AS (
        |  SELECT e.vec_id, c.cid, e.embedding,
        |    (SELECT SUM(dd * dd) FROM (
        |       SELECT CAST(ua AS DOUBLE) - CAST(ub AS DOUBLE) AS dd
        |       FROM (SELECT unnest(e.embedding) AS ua,
        |                    unnest(c.cvec) AS ub) z0) z) AS d2
        |  FROM embeddings e CROSS JOIN cents c),
        |asg AS (
        |  SELECT vec_id, cid, embedding FROM dist
        |  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id
        |    ORDER BY d2, cid) = 1),
        |ex AS (
        |  SELECT cid, unnest(range(0, len(embedding))) AS dim,
        |    CAST(unnest(embedding) AS DOUBLE) AS v
        |  FROM asg)
        |SELECT cid, CAST(dim AS INT) AS dim,
        |  CAST(COUNT(*) AS INT) AS n_members,
        |  ROUND(AVG(v), 6) AS centroid
        |FROM ex GROUP BY cid, dim ORDER BY cid, dim""".stripMargin,

    // q256: same integer sign-dot, same rounded-cosine truth ranking,
    // same literal discount table — the DCG sum runs in srank order on
    // both engines (Spark: left fold over the rank-sorted array;
    // DuckDB: SUM(... ORDER BY srank))
    "q256_ndcg_eval" ->
      """WITH w(i, wt) AS (VALUES
        |  (1, CAST(1.0 AS DOUBLE)), (2, 0.6309297536), (3, 0.5),
        |  (4, 0.4306765581), (5, 0.3868528072), (6, 0.3562071871),
        |  (7, 0.3333333333), (8, 0.3154648768), (9, 0.3010299957),
        |  (10, 0.2890648263)),
        |n AS (
        |  SELECT vec_id, embedding,
        |    sqrt((SELECT SUM(CAST(u AS DOUBLE) * CAST(u AS DOUBLE))
        |          FROM (SELECT unnest(embedding) AS u) z)) AS nrm
        |  FROM embeddings),
        |q AS (SELECT vec_id AS qid, embedding AS qe, nrm AS qnrm
        |      FROM n WHERE vec_id < 10),
        |tp AS (
        |  SELECT q.qid, e.vec_id AS cid,
        |    ROUND((SELECT SUM(CAST(ua AS DOUBLE) * CAST(ub AS DOUBLE))
        |           FROM (SELECT unnest(q.qe) AS ua,
        |                        unnest(e.embedding) AS ub) z)
        |      / (q.qnrm * e.nrm), 6) AS cosine
        |  FROM q, n e WHERE e.vec_id <> q.qid),
        |truth AS (
        |  SELECT qid, cid, CAST(11 - trank AS INT) AS rel FROM (
        |    SELECT qid, cid, ROW_NUMBER() OVER (PARTITION BY qid
        |      ORDER BY cosine DESC, cid) AS trank FROM tp)
        |  WHERE trank <= 10),
        |sd AS (
        |  SELECT q.qid, e.vec_id AS cid,
        |    (SELECT SUM(CASE WHEN (ua >= 0) = (ub >= 0) THEN 1 ELSE -1 END)
        |     FROM (SELECT unnest(q.qe) AS ua,
        |                  unnest(e.embedding) AS ub) z) AS sdot
        |  FROM q, n e WHERE e.vec_id <> q.qid),
        |sys AS (
        |  SELECT qid, cid, srank FROM (
        |    SELECT qid, cid, ROW_NUMBER() OVER (PARTITION BY qid
        |      ORDER BY sdot DESC, cid) AS srank FROM sd)
        |  WHERE srank <= 10),
        |j AS (
        |  SELECT s.qid, s.srank, COALESCE(t.rel, 0) AS rel
        |  FROM sys s LEFT JOIN truth t
        |    ON t.qid = s.qid AND t.cid = s.cid),
        |idcg AS (SELECT SUM((11 - i) * wt ORDER BY i) AS v FROM w)
        |SELECT j.qid,
        |  CAST(SUM(CASE WHEN j.rel > 0 THEN 1 ELSE 0 END) AS INT) AS hits,
        |  ROUND(SUM(j.rel * w.wt ORDER BY j.srank), 6) AS dcg,
        |  ROUND(SUM(j.rel * w.wt ORDER BY j.srank)
        |        / (SELECT v FROM idcg), 6) AS ndcg
        |FROM j JOIN w ON w.i = j.srank
        |GROUP BY j.qid ORDER BY j.qid""".stripMargin,

    // q280: identical (dim × carve) mean grid (0-based dims, q145's
    // unnest convention), identical 6dp-round-then-DECIMAL global
    // folds — both engines feed the same doubles to sqrt/divide
    "q280_embedding_drift" ->
      """WITH ex AS (
        |  SELECT (vec_id % 2 = 0) AS is_ref,
        |    unnest(range(0, len(embedding))) AS dim,
        |    CAST(unnest(embedding) AS DOUBLE) AS v
        |  FROM embeddings),
        |dims AS (
        |  SELECT dim,
        |    CAST(ROUND(AVG(CASE WHEN is_ref THEN v END), 6)
        |      AS DECIMAL(12,6)) AS mr,
        |    CAST(ROUND(AVG(CASE WHEN NOT is_ref THEN v END), 6)
        |      AS DECIMAL(12,6)) AS mc
        |  FROM ex GROUP BY dim),
        |g AS (
        |  SELECT SUM((mc - mr) * (mc - mr)) AS l2sq,
        |    SUM(mr * mc) AS dotc, SUM(mr * mr) AS n2r,
        |    SUM(mc * mc) AS n2c
        |  FROM dims)
        |SELECT CAST(dims.dim AS INT) AS dim,
        |  CAST(dims.mr AS DOUBLE) AS mean_ref,
        |  CAST(dims.mc AS DOUBLE) AS mean_cur,
        |  CAST(ABS(dims.mc - dims.mr) AS DOUBLE) AS abs_shift,
        |  ROUND(sqrt(CAST(g.l2sq AS DOUBLE)), 6) AS centroid_shift_l2,
        |  ROUND(CAST(g.dotc AS DOUBLE) /
        |    sqrt(CAST(g.n2r AS DOUBLE) * CAST(g.n2c AS DOUBLE)), 6)
        |    AS centroid_cos
        |FROM dims, g ORDER BY dim""".stripMargin
  )
}
