package graft.rbm

import org.apache.spark.HashPartitioner
import org.apache.spark.rdd.RDD

import scala.reflect.ClassTag

/** Bitwise-reproducible full-batch aggregation — the eval mode a
  * training-audit pipeline needs when a metric trajectory must be
  * EXACTLY rerunnable (golden-pinned CI gates, cross-run regression
  * hashes, the q111 CORRECTNESS row).
  *
  * `treeAggregate` (the throughput path of [[RBM.cd1Epoch]] /
  * [[Backprop.finetune]]) merges partition partials in task-COMPLETION
  * order, so float sums carry ~1e-16-relative run-to-run noise; one
  * epoch rounds that away, but an 80-epoch momentum loop amplifies it
  * chaotically (why q111 was declared no-oracle through round 12).
  * This path removes every ordering freedom instead of tolerating it:
  *
  *  1. `canonicalize` hash-partitions by the LONG example id
  *     (`HashPartitioner` — a pure function of the id, independent of
  *     file layout, split count, or scale factor) and sorts each
  *     partition by id, so each partition's fold ORDER is a function
  *     of the data alone;
  *  2. [[aggregate]] folds each partition sequentially, collects the
  *     (pid, partial) pairs — model-sized × nParts, the same driver
  *     budget as treeAggregate's root — and merges them in PARTITION
  *     INDEX order on the driver.
  *
  * Cost vs treeAggregate: one extra shuffle+sort ONCE before the epoch
  * loop (the canonical RDD is persisted and reused by every epoch),
  * and a driver merge of nParts partials per epoch instead of a tree —
  * at 1000 executors you'd cap nParts (partials are O(model), not
  * O(rows), so even 4096 × a 10 KB model is driver-trivial). The
  * determinism/throughput trade is the caller's: default paths keep
  * treeAggregate; reproducible-eval opts in.
  */
object Reproducible {

  /** Canonical layout: partition = hash(id) % nParts, rows sorted by
    * id within each partition. Persist the result if it feeds a loop.
    */
  def canonicalize[V: ClassTag](rdd: RDD[(Long, V)],
      nParts: Int): RDD[(Long, V)] =
    rdd.repartitionAndSortWithinPartitions(new HashPartitioner(nParts))

  /** Fold `seqOp` over every partition of a [[canonicalize]]d RDD in
    * its sorted order, then sum the flat partials in partition-index
    * order. Every float add has a data-determined position — the
    * result is bit-identical across runs, JVMs, and input file
    * layouts.
    */
  def aggregate[V](canon: RDD[(Long, V)], size: Int)(
      seqOp: (Array[Double], Long, V) => Unit): Array[Double] = {
    val partials = canon.mapPartitionsWithIndex { (pid, it) =>
      val acc = new Array[Double](size)
      it.foreach { case (id, v) => seqOp(acc, id, v) }
      Iterator((pid, acc))
    }.collect().sortBy(_._1)
    val g = new Array[Double](size)
    partials.foreach { case (_, p) =>
      var i = 0
      while (i < size) { g(i) += p(i); i += 1 }
    }
    g
  }
}
