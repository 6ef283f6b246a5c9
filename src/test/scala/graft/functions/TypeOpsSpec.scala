package graft.functions

import graft.{SparkSpec, Tables}
import graft.sources.SourceQueries
import graft.streaming.StreamQueries

/** Invariant tests for the round-2 type/source/streaming widening —
  * the DuckDB oracle proves engine parity; these pin internal
  * relationships parity can't see.
  */
class TypeOpsSpec extends SparkSpec {

  test("q72 map access: missing key is NULL, cardinality exact") {
    val rows = TypeOps.queries("q72_map_functions")(spark, sf001).collect()
    assert(rows.forall(_.isNullAt(3)), "absent key must be NULL")
    assert(rows.forall(_.getInt(4) == 2))
  }

  test("q75 dot-with-reverse matches the closed form sum i*(n+1-i)") {
    val rows = TypeOps.queries("q75_sequence_zip")(spark, sf001).collect()
    rows.foreach { r =>
      val n = r.getInt(2).toLong
      val expected = (1L to n).map(i => i * (n + 1 - i)).sum
      assert(r.getLong(1) == expected, s"n=$n")
    }
  }

  test("q78 decimal money: gross = net + discount_total exactly") {
    val rows = TypeOps.queries("q78_decimal_money")(spark, sf001).collect()
    rows.foreach { r =>
      // each is one exact Decimal→double conversion of cents, so the
      // identity survives the double projection bit-for-bit
      assert(r.getDouble(1) == r.getDouble(2) + r.getDouble(3) ||
        math.abs(r.getDouble(1) - r.getDouble(2) - r.getDouble(3)) < 1e-6)
    }
  }

  test("q77 csv round-trip conserves row count and leaves no staging") {
    val before = System.getProperty("java.io.tmpdir")
    val rows = SourceQueries.queries("q77_csv_roundtrip")(spark, sf001).collect()
    val total = rows.map(_.getLong(1)).sum
    assert(total == Tables.lineitem(spark, sf001).count())
    val leftover = new java.io.File(before).listFiles()
      .filter(_.getName.startsWith("q77_csv"))
    assert(leftover.isEmpty, s"staging dirs left: ${leftover.mkString(",")}")
  }

  test("q79 sliding windows hold each event exactly twice; q46 once") {
    val nEvents = Tables.events(spark, sf001).count()
    val sliding = StreamQueries.queries("q79_stream_sliding_replay")(spark, sf001)
      .collect().map(_.getLong(2)).sum
    assert(sliding == 2 * nEvents,
      s"2h/1h windows must double-count: $sliding vs ${2 * nEvents}")
    val tumbling = StreamQueries.queries("q46_stream_tumbling_replay")(spark, sf001)
      .collect().map(_.getLong(2)).sum
    assert(tumbling == nEvents)
  }
}
