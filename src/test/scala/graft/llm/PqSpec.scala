package graft.llm

import graft.SparkSpec

/** q197's quality gate — the property the exact-match oracle cannot
  * express: the 8-byte PQ codes plus a 50-item ADC shortlist must
  * still recover most true neighbors after the exact re-rank.
  */
class PqSpec extends SparkSpec {

  test("PQ+ADC is deterministic and recovers most brute-force top-3") {
    val pq = Similarity.queries("q197_ann_pq")
    val a = pq(spark, sf001).collect()
    val b = pq(spark, sf001).collect()
    assert(a.nonEmpty && a.sameElements(b), "PQ must be deterministic")
    val pqPairs = a.map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Similarity.queries("q32_knn_similarity")(spark, sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = pqPairs.intersect(brute).size.toDouble / brute.size
    info(s"PQ recall@3 vs brute force = $recall")
    // measured 0.73 on the fixture (0.57 at sf0.1); gate just below so
    // a quality regression (codebook damage, shortlist mis-rank) fails
    // while fixture jitter does not — q43/q62's gate rationale
    assert(recall > 0.6,
      s"8-byte PQ + 50-item shortlist should recover most true " +
        s"neighbors: $recall")
  }
}
