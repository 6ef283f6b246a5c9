package graft.llm

import scala.collection.mutable
import graft.SparkSpec

/** q264's semantic gate — what the DuckDB oracle can't say: the oracle
  * unrolls a FIXED 16 peel rounds, so if the true 2-core fixpoint ever
  * needed more rounds, engine and oracle would AGREE on the same
  * not-yet-converged edge set and the sweep would stay green on a
  * wrong answer. This spec peels to the true fixpoint with an
  * independent in-memory implementation (mutable adjacency peel + BFS
  * components) and requires the query's per-component (n_docs, n_core)
  * to match exactly — at sf0.001, sf0.01 AND the bench SF (resolved
  * via SPARK_GRAFT_SF_DIR, the FixtureContractSpec convention).
  */
class KCoreSpec extends SparkSpec {

  /** True 2-core + components, driver-side: comp label = min doc_id
    * reachable (the propagateLabels contract).
    */
  private def reference(edges: Seq[(Long, Long)])
      : Map[Long, (Int, Int)] = {
    val adj = mutable.Map.empty[Long, mutable.Set[Long]]
    edges.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, mutable.Set.empty) += b
      adj.getOrElseUpdate(b, mutable.Set.empty) += a
    }
    val full = adj.map { case (k, v) => k -> v.toSet }.toMap
    var changed = true
    while (changed) {
      changed = false
      adj.keys.toSeq.foreach { n =>
        if (adj.contains(n) && adj(n).size < 2) {
          adj(n).foreach(m => adj(m) -= n)
          adj -= n
          changed = true
        }
      }
    }
    val core = adj.keySet.toSet
    val seen = mutable.Set.empty[Long]
    val out = mutable.Map.empty[Long, (Int, Int)]
    full.keys.toSeq.sorted.foreach { start =>
      if (!seen(start)) {
        val q = mutable.Queue(start)
        val compNodes = mutable.Set(start)
        seen += start
        while (q.nonEmpty) {
          val n = q.dequeue()
          full(n).foreach { m =>
            if (!seen(m)) { seen += m; compNodes += m; q += m }
          }
        }
        out(compNodes.min) = (compNodes.size, compNodes.count(core))
      }
    }
    out.toMap
  }

  test("q264 equals an independent peel-to-fixpoint + BFS reference " +
    "at sf0.001, sf0.01 and the bench SF") {
    val benchSf =
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    Seq(sf001, "/root/testdata/sf0.01", benchSf).distinct.foreach { sf =>
      val edges = Dedup.prefixJaccardPairs(spark, sf, "0.7")
        .collect()
        .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
        .toSeq
      val ref = reference(edges)
      val got = Dedup.queries("q264_core_periphery")(spark, sf)
        .collect()
        .map(r => r.getAs[Long]("comp") ->
          ((r.getAs[Int]("n_docs"), r.getAs[Int]("n_core"))))
        .toMap
      assert(got == ref, s"$sf: engine=$got ref=$ref")
    }
  }
}
