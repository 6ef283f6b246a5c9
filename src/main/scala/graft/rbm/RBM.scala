package graft.rbm

import breeze.linalg.{DenseMatrix, DenseVector}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Restricted Boltzmann Machine trained with 1-step contrastive
  * divergence — the Spark-native re-expression of the reference's RBM
  * MapReduce job (reference `rbmmapper.java:144-238`,
  * `rbmreducer.java:20-30`, `driver.java:90-219`).
  *
  * Semantics implemented are the *corrected* ones per SURVEY §0:
  * learning rate ε=0.1, weight cost 0, biases fixed at zero
  * (hyper-parameters at reference `propmapper.java:70-75`), one
  * consistent row-major weight layout `W[visible][hidden]` (the
  * reference's column-packed re-read, `matrix.java:40-53`, scrambles
  * the matrix between iterations — a bug we do not replicate).
  *
  * Execution shape (SURVEY §3.2 Spark translation): broadcast the
  * weight matrix down, compute the per-example CD-1 gradient inside
  * `treeAggregate`, and merge partial gradient matrices pairwise —
  * this *fuses* the reference's explode-to-(weightId,delta) flatMap
  * (A8) with its per-key SUM (A9), so no `numCase×d×h`-row shuffle
  * ever materializes. The reference shipped that volume as text KV
  * pairs with no combiner (`driver.java:152-162`); here the shuffled
  * bytes are `numPartitions × d×h` doubles, independent of row count —
  * the property that makes the job viable at 100 TB.
  *
  * Determinism: the reference samples hidden states with an unseeded
  * per-record `new Random()` (`rbmmapper.java:169`). We seed per
  * example from `(seed, rowId)`, so results are reproducible under ANY
  * partitioning or executor count.
  */
object RBM {

  case class Config(
      numdims: Int,
      numhid: Int,
      epsilon: Double = 0.1,    // reference propmapper.java:70
      weightcost: Double = 0.0, // reference propmapper.java:72
      seed: Long = 42L)

  @inline private def sigmoid(x: Double): Double = 1.0 / (1.0 + math.exp(-x))

  /** Deterministic per-example RNG: SplitMix64 stream keyed by
    * (globalSeed, exampleId). One draw per hidden unit, in unit order —
    * the reference's sampling loop shape (`rbmmapper.java:166-182`).
    */
  private[graft] final class ExampleRng(seed: Long, id: Long) {
    private var state: Long = seed ^ (id * 0x9E3779B97F4A7C15L)
    def nextDouble(): Double = {
      state += 0x9E3779B97F4A7C15L
      var z = state
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z = z ^ (z >>> 31)
      (z >>> 11).toDouble * 1.1102230246251565e-16 // 2^-53
    }
  }

  /** CD-1 gradient contribution of one example: posprods − negprods
    * (reference positive phase `rbmmapper.java:144-183`, negative phase
    * `rbmmapper.java:185-220`, assembly `propmapper.java:242-256`).
    * Accumulates into the flat row-major `acc[i*h + j]` in place —
    * shared by the treeAggregate path ([[cd1Epoch]]) and the typed
    * [[CD1GradientAggregator]], so both are one source of truth.
    */
  private[graft] def accumulateGradient(
      acc: Array[Double],
      x: Array[Double],
      w: Array[Double], // row-major [d*h]
      d: Int,
      h: Int,
      rng: ExampleRng): Array[Double] = {
    // positive phase: poshidprobs = σ(xᵀW) (biases fixed 0)
    val poshidprobs = new Array[Double](h)
    var j = 0
    while (j < h) {
      var s = 0.0
      var i = 0
      while (i < d) { s += x(i) * w(i * h + j); i += 1 }
      poshidprobs(j) = sigmoid(s)
      j += 1
    }
    // Bernoulli sample hidden states, one draw per unit in order
    val states = new Array[Double](h)
    j = 0
    while (j < h) {
      states(j) = if (poshidprobs(j) > rng.nextDouble()) 1.0 else 0.0
      j += 1
    }
    // negative phase: negdata = σ(states·Wᵀ); neghidprobs = σ(negdata·W)
    val negdata = new Array[Double](d)
    var i = 0
    while (i < d) {
      var s = 0.0
      j = 0
      while (j < h) { s += states(j) * w(i * h + j); j += 1 }
      negdata(i) = sigmoid(s)
      i += 1
    }
    val neghidprobs = new Array[Double](h)
    j = 0
    while (j < h) {
      var s = 0.0
      i = 0
      while (i < d) { s += negdata(i) * w(i * h + j); i += 1 }
      neghidprobs(j) = sigmoid(s)
      j += 1
    }
    // grad += x·poshidprobsᵀ − negdata·neghidprobsᵀ
    i = 0
    while (i < d) {
      j = 0
      while (j < h) {
        acc(i * h + j) += x(i) * poshidprobs(j) - negdata(i) * neghidprobs(j)
        j += 1
      }
      i += 1
    }
    acc
  }

  /** Row-major flattening helpers for the broadcast/API boundary. */
  private[rbm] def toFlat(w: DenseMatrix[Double]): Array[Double] =
    Array.tabulate(w.rows * w.cols)(k => w(k / w.cols, k % w.cols))
  private[rbm] def fromFlat(a: Array[Double], d: Int, h: Int): DenseMatrix[Double] =
    DenseMatrix.tabulate(d, h)((i, j) => a(i * h + j))

  /** Gaussian 0.1·N(0,1) weight init, deterministic (reference
    * `driver.java:76-83`).
    */
  def initWeights(cfg: Config): DenseMatrix[Double] = {
    val rnd = new java.util.Random(cfg.seed)
    DenseMatrix.fill(cfg.numdims, cfg.numhid)(0.1 * rnd.nextGaussian())
  }

  /** One CD-1 epoch: returns the updated weight matrix
    * `W + ε/numCase · Σ_examples grad` (reference `driver.java:204`).
    *
    * `data` must have columns (`id` long, `x` array&lt;double&gt;).
    * The weight matrix is broadcast (A3); gradients merge through a
    * depth-2 treeAggregate so the driver receives `O(d×h)` doubles no
    * matter how many executors contributed.
    */
  def cd1Epoch(
      spark: SparkSession,
      data: DataFrame,
      w: DenseMatrix[Double],
      cfg: Config): DenseMatrix[Double] = {
    import spark.implicits._
    val d = cfg.numdims
    val h = cfg.numhid
    val bw = spark.sparkContext.broadcast(toFlat(w))
    val seed = cfg.seed
    val rows = data.select(col("id").cast("long"), col("x")).as[(Long, Array[Double])]
    // Buffer slot d*h carries the example count, fusing numCase into
    // the same single pass (the reference needed a separate driver-side
    // count; a naive port would call rows.count() first — one full
    // extra scan of the data per epoch).
    val gradFlat = rows.rdd.treeAggregate(new Array[Double](d * h + 1))(
      seqOp = { case (acc, (id, x)) =>
        require(x.length == d,
          s"arity ${x.length} != numdims $d") // rbmmapper.java:108-114
        acc(d * h) += 1.0
        accumulateGradient(acc, x, bw.value, d, h, new ExampleRng(seed, id))
      },
      combOp = (a, b) => { var k = 0; while (k < a.length) { a(k) += b(k); k += 1 }; a },
      depth = 2)
    bw.destroy()
    val numCase = gradFlat(d * h).toLong
    require(numCase > 0,
      "cd1Epoch on empty input (scale = ε/0 would silently produce NaN weights)")
    val grad = fromFlat(gradFlat, d, h)
    val scale = cfg.epsilon / numCase.toDouble
    // W += ε/numCase · Σgrad − ε·weightcost·W (weightcost = 0 here)
    w + (grad *:* scale) - (w *:* (cfg.epsilon * cfg.weightcost))
  }

  /** Weight matrix → (i, j, w) DataFrame for inspection/oracle dumps. */
  def weightsToDf(spark: SparkSession, w: DenseMatrix[Double]): DataFrame = {
    import spark.implicits._
    val rows = for (i <- 0 until w.rows; j <- 0 until w.cols)
      yield (i, j, w(i, j))
    rows.toDF("i", "j", "w")
  }
}
