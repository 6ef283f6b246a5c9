package graft.operators

import graft.SparkSpec

/** Pins q213's two claims: (a) the grouped top-k plans as a bounded-
  * heap AGGREGATE with a map-side partial — no Window operator, so no
  * per-group full sort and the shuffle carries ≤k rows per group —
  * and (b) the heap path returns exactly what q24's window top-k
  * returns (same ranking rule), row for row.
  */
class TopKAggSpec extends SparkSpec {

  test("q213 plans collect_top_k with a partial, and no Window") {
    val df = graft.SparkEntry.queries("q213_grouped_topk_agg")(spark, sf001)
    val optimized = df.queryExecution.optimizedPlan
    val windows = optimized.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.isEmpty, s"q213 planned a Window:\n$optimized")
    val physical = df.queryExecution.executedPlan.toString()
    assert(physical.contains("collect_top_k"),
      s"no collect_top_k aggregate in the plan:\n$physical")
    assert(physical.contains("partial_collect_top_k"),
      s"top-k aggregate lost its map-side partial (shuffle would carry " +
        s"whole groups):\n$physical")
  }

  test("the heap path equals the window path row for row") {
    val heap = graft.SparkEntry.queries("q213_grouped_topk_agg")(spark, sf001)
      .collect().map(_.toSeq)
    val window = graft.SparkEntry.queries("q24_topk_per_group")(spark, sf001)
      .collect().map(_.toSeq)
    assert(heap.nonEmpty)
    assert(heap.toSeq == window.toSeq,
      s"heap/window top-k diverged: ${heap.length} vs ${window.length} rows")
  }

  test("q223's posting lists build through the same bounded heap — " +
    "no Window, partial aggregation present") {
    val df = graft.SparkEntry.queries("q223_inverted_index")(spark, sf001)
    val optimized = df.queryExecution.optimizedPlan
    val windows = optimized.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.isEmpty, s"q223 planned a Window:\n$optimized")
    val physical = df.queryExecution.executedPlan.toString()
    assert(physical.contains("collect_top_k"),
      s"posting cap lost the heap aggregate:\n$physical")
    assert(physical.contains("partial_collect_top_k") ||
      physical.contains("Partial"),
      s"posting heap lost its map-side partial:\n$physical")
    // and the final 10-term cut is a TakeOrdered, not a global sort
    assert(physical.contains("TakeOrderedAndProject"),
      s"top-10-by-df fell back to a global sort:\n$physical")
  }
}
