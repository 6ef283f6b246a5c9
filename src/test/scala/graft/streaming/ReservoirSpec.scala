package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec

/** Pins q196's two state-machine claims directly on the processor
  * (the replay oracle sees only the final result): the reservoir is
  * micro-batch-chunking-invariant (min-k of a set does not depend on
  * arrival order), and redelivery-idempotent (a duplicate event_id
  * never occupies a second slot).
  */
class ReservoirSpec extends SparkSpec {

  import spark.implicits._
  implicit private lazy val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  // Every 8th event carries weight 0 — q196's explicit zero-weight rule
  // (Efraimidis–Spirakis: w=0 ⇒ zero inclusion probability) filters
  // these OUT of the race before the key is computed, and this spec
  // applies the identical `v > 0` filter below, so the reservoir's
  // winners are the min-k over positive-weight events only.
  private val raw = (1L to 40L).map { i =>
    StreamingOps.ResEvent("t", i, 100 + i,
      if (i % 8 == 0) 0.0 else 1.0 + i, ((i * 37) % 41).toDouble)
  }
  private val events = raw.filter(_.v > 0.0)

  private def finalReservoir(chunks: Seq[Seq[StreamingOps.ResEvent]],
      sink: String): Set[Long] = {
    val ms = MemoryStream[StreamingOps.ResEvent]
    val q = StreamingOps.streamingReservoir(ms.toDS(), 5).toDF()
      .writeStream.outputMode("update").format("memory").queryName(sink).start()
    try {
      chunks.foreach { c => ms.addData(c); q.processAllAvailable() }
    } finally q.stop()
    val rows = spark.table(sink)
      .filter(org.apache.spark.sql.functions.col("gen") === chunks.size)
      .collect()
    assert(rows.length == 5, s"expected a full reservoir, got ${rows.length}")
    rows.map(_.getAs[Long]("event_id")).toSet
  }

  test("reservoir is chunking-invariant and redelivery-idempotent") {
    val oneBatch = finalReservoir(Seq(events), "res_a")
    // same events, three uneven chunks, reversed order within chunks
    val chunked = finalReservoir(
      Seq(events.drop(25).reverse, events.slice(3, 25), events.take(3)), "res_b")
    assert(oneBatch == chunked,
      s"chunking changed the reservoir: $oneBatch vs $chunked")
    // full redelivery as an extra batch changes nothing
    val redelivered = finalReservoir(Seq(events, events), "res_c")
    assert(redelivered == oneBatch,
      s"redelivery changed the reservoir: $redelivered vs $oneBatch")
    // and the winners are exactly the batch min-k
    val expect = events.sortBy(e => (e.k, e.event_id)).take(5).map(_.event_id).toSet
    assert(oneBatch == expect, s"not the min-k: $oneBatch vs $expect")
  }
}
