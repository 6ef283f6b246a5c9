package graft.rbm

import graft.SparkSpec

/** Gates for the bitwise-reproducible aggregation mode behind q111's
  * golden-pinned oracle row: the result must be a pure function of the
  * DATA — independent of the source RDD's partition count, row order,
  * and run — or the pinned VALUES literals would flake.
  */
class ReproducibleSpec extends SparkSpec {

  private def vecs(seed: Int): Seq[(Long, Array[Double])] =
    (0L until 97L).map { id =>
      val r = new java.util.Random(id * 7919 + seed)
      (id, Array.fill(8)(r.nextGaussian()))
    }

  private def fold(data: Seq[(Long, Array[Double])], slices: Int,
      shuffleSeed: Int): Seq[Double] = {
    val shuffled = new scala.util.Random(shuffleSeed).shuffle(data)
    val rdd = spark.sparkContext.parallelize(shuffled, slices)
    Reproducible.aggregate(Reproducible.canonicalize(rdd, 5), 9) {
      (acc, id, x) =>
        var i = 0
        // a deliberately order-SENSITIVE float fold (multiplies by a
        // per-row factor before adding) so any ordering freedom would
        // actually show up in the low bits
        while (i < 8) { acc(i) += x(i) * math.sin(id.toDouble + i); i += 1 }
        acc(8) += 1.0
    }.toSeq
  }

  test("aggregate is bit-identical across source partitionings, row " +
    "orders, and runs") {
    val data = vecs(42)
    val ref = fold(data, 3, 1)
    assert(fold(data, 3, 1) == ref, "re-run diverged")
    assert(fold(data, 7, 2) == ref, "partition-count/order sensitivity")
    assert(fold(data, 1, 3) == ref, "single-slice layout diverged")
    assert(ref.last == 97.0)
  }

  test("a single value change DOES change the result (the gate is " +
    "not vacuously constant)") {
    val data = vecs(42)
    val bumped = data.map { case (id, x) =>
      if (id == 50L) (id, x.updated(3, x(3) + 1e-9)) else (id, x)
    }
    assert(fold(bumped, 3, 1) != fold(data, 3, 1))
  }

  test("q111's trajectory is run-to-run identical at the fixture SF " +
    "(the property the golden VALUES oracle stands on)") {
    val q = graft.SparkEntry.queries("q111_backprop_finetune")
    val a = q(spark, sf001).collect().map(_.toSeq).toSeq
    val b = q(spark, sf001).collect().map(_.toSeq).toSeq
    assert(a == b, "q111 trajectory not reproducible")
    assert(a.size == 81)
  }
}
