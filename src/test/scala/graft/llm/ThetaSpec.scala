package graft.llm

import graft.SparkSpec
import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketches, UpdateSketch}
import org.scalatest.funsuite.AnyFunSuite

/** Audits the theta-sketch algebra q215 leans on, at a scale where the
  * sketches are PROVABLY in estimation mode (the fixture at small SFs
  * is below k, where every theta result is exact and the bounds check
  * is vacuous). Ground truth is constructed set algebra on synthetic
  * ids, so each property is checked against a known answer:
  * distributed merge losslessness (union of per-partition sketches ≡
  * one-pass sketch — the q215 build shape), and 3-σ interval coverage
  * for union / intersection / a-not-b in estimation mode.
  */
class ThetaSpec extends AnyFunSuite {

  private val nom = 4096

  // A = [0, 60000), B = [40000, 110000): |A∪B| = 110000,
  // |A∩B| = 20000, |A\B| = 40000 — all well above k = 4096.
  private def sketchOf(lo: Long, hi: Long) = {
    val sk = UpdateSketch.builder().setNominalEntries(nom).build()
    (lo until hi).foreach(sk.update)
    sk.compact()
  }

  test("per-partition build + union is partitioning-independent and " +
    "covers the exact count (the q215 distributed shape), in estimation mode") {
    // Unlike HLL, a theta UNION is not bit-identical to a one-pass
    // sketch (the one-pass QuickSelect gadget walks a different theta
    // trajectory), so the distributed-build contract is the one that
    // matters for q215: the merged result must not depend on HOW the
    // data was partitioned — Spark never guarantees a partitioning —
    // and its own interval must cover the truth.
    def mergedOver(assign: Long => Int) = {
      val parts = (0 until 8).map { p =>
        val sk = UpdateSketch.builder().setNominalEntries(nom).build()
        (0L until 60000L).filter(assign(_) == p).foreach(sk.update)
        sk.compact().toByteArray
      }
      val u = SetOperation.builder().setNominalEntries(nom).buildUnion()
      parts.foreach(bs => u.union(Sketches.wrapSketch(Memory.wrap(bs))))
      u.getResult
    }
    val byMod = mergedOver(id => (id % 8).toInt)
    val byRange = mergedOver(id => (id / 7500L).toInt)
    assert(byMod.isEstimationMode, "test scale must exceed k")
    assert(byMod.getEstimate == byRange.getEstimate &&
      byMod.getRetainedEntries(true) == byRange.getRetainedEntries(true),
      s"merge depends on partitioning: ${byMod.getEstimate} (mod) vs " +
        s"${byRange.getEstimate} (range)")
    assert(byMod.getLowerBound(3) <= 60000.0 &&
      60000.0 <= byMod.getUpperBound(3),
      s"exact 60000 outside [${byMod.getLowerBound(3)}, " +
        s"${byMod.getUpperBound(3)}]")
  }

  test("union/intersection/a-not-b 3-sigma intervals cover the exact " +
    "cardinalities in estimation mode") {
    val a = sketchOf(0L, 60000L)
    val b = sketchOf(40000L, 110000L)
    val union = {
      val u = SetOperation.builder().setNominalEntries(nom).buildUnion()
      u.union(a); u.union(b); u.getResult
    }
    val inter = {
      val i = SetOperation.builder().setNominalEntries(nom).buildIntersection()
      i.intersect(a); i.intersect(b); i.getResult
    }
    val diff = SetOperation.builder().buildANotB().aNotB(a, b)
    for ((name, sk, exact) <- Seq(
        ("union", union, 110000.0),
        ("intersection", inter, 20000.0),
        ("a_not_b", diff, 40000.0))) {
      assert(sk.isEstimationMode, s"$name fell out of estimation mode")
      assert(sk.getLowerBound(3) <= exact && exact <= sk.getUpperBound(3),
        s"$name: exact $exact outside " +
          s"[${sk.getLowerBound(3)}, ${sk.getUpperBound(3)}] " +
          s"(est ${sk.getEstimate})")
      // and the interval is informative, not vacuously wide: 3σ on a
      // k=4096 theta union is ~5% relative; 25% catches a degenerate
      // bound without flaking on the derived-op error inflation
      assert((sk.getUpperBound(3) - sk.getLowerBound(3)) / exact < 0.25,
        s"$name: interval degenerately wide")
    }
  }
}
