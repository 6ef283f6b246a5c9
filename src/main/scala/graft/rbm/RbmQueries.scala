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
    // Full CD-1 epoch (A5–A10 fused). The hidden-state Bernoulli draw
    // is a pure hash of (seed, exampleId, unit) — RBM.HashDraw — so
    // the epoch is deterministic, partitioning-invariant AND has a
    // closed-form DuckDB twin (the Gaussian W0 ships as a literal
    // VALUES table generated from RBM.initWeights itself). Weights
    // rounded to 6dp on both engines; the gradient sum's merge-order
    // noise is ~1e-12 — far inside the oracle's 2e-6 float tolerance.
    // The golden trajectory test in RbmGoldenSpec additionally pins
    // the kernel against an independent scalar implementation.
    "q15_rbm_cd1_epoch" -> ((s, d) => {
      val cfg = RBM.Config(numdims = 64, numhid = NumHid, seed = 42L)
      val data = Tables.embeddings(s, d)
        .select(col("vec_id").as("id"),
          transform(col("embedding"), x => x.cast("double")).as("x"))
      val w0 = RBM.initWeights(cfg)
      val w1 = RBM.cd1Epoch(s, data, w0, cfg)
      RBM.weightsToDf(s, w1)
        .select(col("i"), col("j"), round(col("w"), 6).as("w"))
        .orderBy(col("i"), col("j"))
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

  /** DuckDB literal rows `(i,j,w)` for a layer's Gaussian W0,
    * generated from [[RBM.initWeights]] itself so the oracle and the
    * engine share one init by construction. `Double.toString` emits
    * the shortest decimal that round-trips to the same IEEE double,
    * and DuckDB's parser is also nearest-double — the literal table
    * is bit-exact on both engines.
    */
  private[graft] def w0ValuesSql(cfg: RBM.Config): String = {
    val w = RBM.initWeights(cfg)
    (for (i <- 0 until cfg.numdims; j <- 0 until cfg.numhid)
      yield s"($i,$j,${w(i, j)})").mkString(",")
  }

  /** One CD-1 epoch as a chain of CTE definitions (no WITH keyword,
    * no trailing comma): from example table `ex(id,i,x)` and weight
    * table `w0(i,j,w)` to `<p>w1(i,j,w)`. `nExpr` is a scalar SQL
    * expression for numCase. Mirrors [[RBM.accumulateGradient]] +
    * the ε/numCase update of [[RBM.cd1Epoch]]; the Bernoulli draw is
    * the same md5-millionths threshold as [[RBM.HashDraw]].
    */
  private[graft] def cd1ChainSql(
      p: String, ex: String, w0: String, nExpr: String, seed: Long): String = {
    val drawSql = s"CAST(CAST('0x' || substr(md5('cd1:$seed:' || " +
      s"CAST(id AS VARCHAR) || ':' || CAST(j AS VARCHAR)), 1, 15) " +
      s"AS BIGINT) % 1000000 AS DOUBLE)/1000000.0"
    s"""${p}pos AS (SELECT e.id, w.j, 1.0/(1.0+EXP(-SUM(e.x*w.w))) AS php
       |  FROM $ex e JOIN $w0 w ON e.i = w.i GROUP BY e.id, w.j),
       |${p}st AS (SELECT id, j,
       |  CASE WHEN php > $drawSql THEN 1.0 ELSE 0.0 END AS s
       |  FROM ${p}pos),
       |${p}neg AS (SELECT t.id, w.i, 1.0/(1.0+EXP(-SUM(t.s*w.w))) AS nd
       |  FROM ${p}st t JOIN $w0 w ON t.j = w.j GROUP BY t.id, w.i),
       |${p}nh AS (SELECT g.id, w.j, 1.0/(1.0+EXP(-SUM(g.nd*w.w))) AS nhp
       |  FROM ${p}neg g JOIN $w0 w ON g.i = w.i GROUP BY g.id, w.j),
       |${p}pp AS (SELECT e.i, q.j, SUM(e.x*q.php) AS v
       |  FROM $ex e JOIN ${p}pos q ON e.id = q.id GROUP BY e.i, q.j),
       |${p}np AS (SELECT g.i, q.j, SUM(g.nd*q.nhp) AS v
       |  FROM ${p}neg g JOIN ${p}nh q ON g.id = q.id GROUP BY g.i, q.j),
       |${p}w1 AS (SELECT w.i, w.j, w.w + 0.1/($nExpr)*(pp.v - np.v) AS w
       |  FROM $w0 w
       |  JOIN ${p}pp pp ON pp.i = w.i AND pp.j = w.j
       |  JOIN ${p}np np ON np.i = w.i AND np.j = w.j)""".stripMargin
  }

  /** `ex(id,i,x)` CTE body over the embeddings fixture. */
  private[graft] val exSql: String =
    """SELECT vec_id AS id,
      |  CAST(unnest(range(len(embedding))) AS INT) AS i,
      |  CAST(unnest(embedding) AS DOUBLE) AS x
      |FROM embeddings""".stripMargin

  def oracle: Map[String, String] = Map(
    // Full CD-1 epoch: W0 as a literal table from the engine's own
    // init, hash-draw Bernoulli sample, ε/numCase mean update.
    "q15_rbm_cd1_epoch" ->
      s"""WITH w0(i, j, w) AS (VALUES ${w0ValuesSql(
           RBM.Config(numdims = 64, numhid = NumHid, seed = 42L))}),
         |ex AS ($exSql),
         |${cd1ChainSql("", "ex", "w0", "(SELECT COUNT(*) FROM embeddings)", 42L)}
         |SELECT i, j, ROUND(w, 6) AS w FROM w1 ORDER BY i, j""".stripMargin,

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
