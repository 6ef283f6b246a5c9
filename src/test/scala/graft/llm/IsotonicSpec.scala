package graft.llm

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** q263's math gate — what the DuckDB oracle can't say (it runs the
  * SAME minimax formula): that the greatest-convex-minorant minimax
  * fitted_i = max_{j≤i} min_{k≥i} rate(j..k) actually EQUALS isotonic
  * regression, i.e. the classic sequential pool-adjacent-violators
  * stack. Pinned on randomized weighted bins (deterministic seed), so
  * a broken index bound in the O(B³) closed form goes red here even
  * though both engines would agree on the broken value.
  */
class IsotonicSpec extends SparkSpec {

  /** Classic PAV: merge adjacent pools while a violator exists. */
  private def pavStack(bins: Seq[(Long, Long)]): Seq[Double] = {
    // pool = (n, pos, width)
    val st = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Int)]
    bins.foreach { case (n, np) =>
      st += ((n, np, 1))
      while (st.length >= 2 && {
        val a = st(st.length - 2); val b = st.last
        a._2.toDouble / a._1 > b._2.toDouble / b._1
      }) {
        val b = st.remove(st.length - 1); val a = st.remove(st.length - 1)
        st += ((a._1 + b._1, a._2 + b._2, a._3 + b._3))
      }
    }
    st.toSeq.flatMap { case (n, np, w) =>
      Seq.fill(w)(np.toDouble / n)
    }
  }

  private def minimax(bins: Seq[(Long, Long)]): Seq[Double] = {
    val m = bins.length
    val cn = bins.map(_._1).scanLeft(0L)(_ + _)
    val cp = bins.map(_._2).scanLeft(0L)(_ + _)
    (1 to m).map { i =>
      (1 to i).map { j =>
        (i to m).map { k =>
          (cp(k) - cp(j - 1)).toDouble / (cn(k) - cn(j - 1))
        }.min
      }.max
    }
  }

  test("minimax GCM formula equals the sequential PAV stack on " +
    "randomized weighted bins") {
    val rnd = new scala.util.Random(263)
    (1 to 200).foreach { _ =>
      val m = 1 + rnd.nextInt(11)
      val bins = Seq.fill(m) {
        val n = 1L + rnd.nextInt(50)
        (n, rnd.nextLong(n + 1))
      }
      val a = pavStack(bins); val b = minimax(bins)
      assert(a.zip(b).forall { case (x, y) => math.abs(x - y) < 1e-12 },
        s"bins=$bins pav=$a minimax=$b")
    }
  }

  test("q263 output is monotone non-decreasing and conserves mass " +
    "per pooled block") {
    val rows = CorpusOps.queries("q263_isotonic_calibration")(spark, sf001)
      .orderBy(col("bin")).collect()
    assert(rows.length >= 3)
    val iso = rows.map(_.getAs[Double]("iso_rate"))
    assert(iso.zip(iso.tail).forall { case (a, b) => a <= b },
      s"not monotone: ${iso.mkString(",")}")
    // isotonic fit preserves the n-weighted total positive mass
    val fitMass = rows.map(r =>
      r.getAs[Double]("iso_rate") * r.getAs[Int]("n")).sum
    val rawMass = rows.map(r =>
      r.getAs[Double]("pos_rate") * r.getAs[Int]("n")).sum
    assert(math.abs(fitMass - rawMass) < 1e-2,
      s"mass not conserved: fit=$fitMass raw=$rawMass")
  }
}
