package graft.rbm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}

/** SURVEY §2.B q15/q16 — the reference's computational heart
  * transplanted onto the `embeddings` fixture table.
  */
object RbmQueries extends QueryModule {

  private val NumHid = 16

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Full CD-1 epoch (A5–A10 fused). Deterministic via per-example
    // seeded sampling, but RNG-dependent → no DuckDB oracle (SURVEY
    // §2.B marks q15 no-oracle); correctness is pinned by the golden
    // trajectory test in RbmGoldenSpec.
    "q15_rbm_cd1_epoch" -> ((s, d) => {
      val cfg = RBM.Config(numdims = 64, numhid = NumHid, seed = 42L)
      val data = Tables.embeddings(s, d)
        .select(col("vec_id").as("id"),
          transform(col("embedding"), x => x.cast("double")).as("x"))
      val w0 = RBM.initWeights(cfg)
      val w1 = RBM.cd1Epoch(s, data, w0, cfg)
      RBM.weightsToDf(s, w1).orderBy(col("i"), col("j"))
    }),

    // Back-propagation fine-tuning over a pre-trained layer — the
    // reference's named-but-never-implemented capability (README.md:2;
    // SURVEY §7.1 S6). One seeded CD-1 pre-training epoch initializes
    // W1, then full-batch backprop SGD updates both W1 and the softmax
    // head through the treeAggregate gradient shape. Output: the
    // per-epoch loss/accuracy trajectory (epoch 0 = pre-trained stack
    // before any supervised step — the trajectory IS the proof the
    // fine-tune moves the stack). Deterministic but float-merge-order
    // sensitive → no DuckDB oracle; BackpropSpec pins a sequential
    // golden trajectory and the accuracy-improves gate.
    "q111_backprop_finetune" -> ((s, d) => {
      val cfg = Backprop.Config(d = 64, h = NumHid, k = 10,
        epsilon = 2.0, momentum = 0.9, epochs = 80, seed = 42L)
      val data = Tables.embeddings(s, d)
        .select(col("vec_id").as("id"),
          transform(col("embedding"), x => x.cast("double")).as("x"),
          col("label"))
      val rbmCfg = RBM.Config(numdims = 64, numhid = NumHid, seed = 42L)
      val w1 = RBM.cd1Epoch(s, data, RBM.initWeights(rbmCfg), rbmCfg)
      val (_, _, stats) = Backprop.finetune(s, data, w1, cfg)
      import s.implicits._
      stats.map(t => (t.epoch, BigDecimal(t.loss).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble,
          BigDecimal(t.accuracy).setScale(4,
            BigDecimal.RoundingMode.HALF_UP).toDouble, t.n))
        .toDF("epoch", "loss", "accuracy", "n")
        .orderBy(col("epoch"))
    }),

    // Deterministic forward propagation (A11) with a fixed rational
    // weight matrix W(i,j) = ((i*16+j) mod 17 − 8)/10 — exactly
    // representable, so both engines compute identical doubles. The
    // whole layer is ONE narrow projection built from higher-order
    // array functions (transform + aggregate): zero shuffles, vs the
    // reference's full identity-reduce shuffle per layer (SURVEY §3.3).
    "q16_forward_prop" -> ((s, d) => {
      val dDims = 64
      Tables.embeddings(s, d)
        .select(col("vec_id"),
          posexplode(
            transform(sequence(lit(0), lit(NumHid - 1)), j => {
              val dot = aggregate(
                sequence(lit(0), lit(dDims - 1)),
                lit(0.0),
                (acc, i) => acc +
                  element_at(col("embedding"), i + 1).cast("double") *
                    (((i * NumHid + j) % 17 - 8).cast("double") / lit(10.0)))
              floor(lit(255.0) / (lit(1.0) + exp(-dot))).cast("int")
            })
          ).as(Seq("j", "v")))
        .orderBy(col("vec_id"), col("j"))
    })
  )

  def oracle: Map[String, String] = Map(
    // q15 intentionally absent (no-oracle).
    "q16_forward_prop" ->
      """WITH ex AS (
        |  SELECT vec_id,
        |    CAST(unnest(range(len(embedding))) AS INT) AS i,
        |    CAST(unnest(embedding) AS DOUBLE) AS x
        |  FROM embeddings),
        |js AS (SELECT CAST(i AS INT) AS j FROM range(16) t(i))
        |SELECT ex.vec_id, js.j,
        |  CAST(FLOOR(255.0 / (1.0 + EXP(-(
        |    SUM(ex.x * (CAST(((ex.i * 16 + js.j) % 17) - 8 AS DOUBLE) / 10.0))
        |  )))) AS INT) AS v
        |FROM ex CROSS JOIN js
        |GROUP BY ex.vec_id, js.j
        |ORDER BY vec_id, j""".stripMargin
  )
}
