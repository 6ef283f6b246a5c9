package graft

/** Property gates for q357–q362 (round-13 wave): brute-force Scala
  * replays of the TPC-H adaptations, the tie-safety/consistency
  * invariants the oracle hash alone doesn't witness, and the
  * winnowing screen's structural guarantees.
  */
class WaveFiveSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf001)

  // the bilateral-trade (q358) and dormant-customer (q362) populations
  // are empty at sf0.001 (6 dormant docs total, 0 in the target
  // nations); their brute-force replays run at sf0.01 where both are
  // non-vacuous (4 trade groups, 10 dormant target-nation customers)
  private val sf01 = "/root/testdata/sf0.01"
  private def q01(name: String) = SparkEntry.queries(name)(spark, sf01)

  test("q357: every contaminated verdict implies n_hit >= 2, every " +
    "hit count is bounded by the doc's own fingerprint count, and " +
    "benchmark docs (id % 50 == 0) never appear in the output") {
    val rows = q("q357_fuzzy_contamination").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (id, nfp, nhit, frac, contaminated) = (r.getLong(0), r.getInt(1),
        r.getInt(2), r.getDouble(3), r.getBoolean(4))
      assert(id % 50 != 0, s"benchmark doc $id leaked into the corpus side")
      assert(nhit >= 0 && nhit <= nfp, s"hit count out of range: $r")
      assert(contaminated == (nhit >= 2), s"verdict inconsistent: $r")
      assert(frac >= 0.0 && frac <= 1.0, s"frac out of range: $r")
    }
  }

  test("q358: Q7 revenue replays from a row-level Scala fold over the " +
    "joined tables") {
    val nations = spark.read.parquet(s"$sf01/nation.parquet").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    val sup = spark.read.parquet(s"$sf01/supplier.parquet").collect()
      .map(r => r.getLong(0) -> nations(r.getInt(2))).toMap
    val cust = spark.read.parquet(s"$sf01/customer.parquet").collect()
      .map(r => r.getLong(0) -> nations(r.getInt(2))).toMap
    val ordCust = spark.read.parquet(s"$sf01/orders.parquet")
      .selectExpr("o_orderkey", "o_custkey").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val agg = scala.collection.mutable.Map
      .empty[(String, String, Int), BigDecimal]
    spark.read.parquet(s"$sf01/lineitem.parquet")
      .selectExpr("l_orderkey", "l_suppkey", "l_extendedprice",
        "l_discount", "year(l_shipdate) AS yr", "l_shipdate")
      .filter("l_shipdate >= TIMESTAMP '1995-01-01' AND " +
        "l_shipdate < TIMESTAMP '1997-01-01'")
      .collect().foreach { r =>
        val sn = sup(r.getLong(1))
        val cn = cust(ordCust(r.getLong(0)))
        val ok = (sn == "NATION_1" && cn == "NATION_2") ||
          (sn == "NATION_2" && cn == "NATION_1")
        if (ok) {
          val year = r.getInt(4)
          val vol = BigDecimal(r.getDouble(2)).setScale(2,
              BigDecimal.RoundingMode.HALF_UP) *
            (BigDecimal(1) - BigDecimal(r.getDouble(3)).setScale(2,
              BigDecimal.RoundingMode.HALF_UP))
          val k = (sn, cn, year)
          agg(k) = agg.getOrElse(k, BigDecimal(0)) + vol
        }
      }
    val got = q01("q358_tpch_q7").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)) ->
        r.getDouble(3)).toMap
    assert(got.keySet == agg.keySet, s"group sets differ: " +
      s"got=${got.keySet} want=${agg.keySet}")
    agg.foreach { case (k, v) =>
      assert(math.abs(got(k) - v.setScale(2,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9, s"$k")
    }
    assert(agg.nonEmpty, "no bilateral trade at sf0.01 — gate vacuous")
  }

  test("q359: the market share is internally consistent (nation <= " +
    "total, share = nation/total at 6dp) and years cover the filter") {
    val rows = q("q359_tpch_q8").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (y, natV, totV, share) = (r.getInt(0), r.getDouble(1),
        r.getDouble(2), r.getDouble(3))
      assert(y == 1995 || y == 1996, s"year outside the filter: $y")
      assert(natV >= 0.0 && natV <= totV + 1e-9)
      assert(share >= 0.0 && share <= 1.0)
      // share recomputes from the emitted decimals to ~rounding error
      assert(math.abs(share - natV / totV) < 1e-4, s"share drifted: $r")
    }
  }

  test("q360: custdist sums to |customer| and the weighted count sum " +
    "equals the non-urgent order count (conservation laws)") {
    val rows = q("q360_tpch_q13").collect()
      .map(r => (r.getInt(0), r.getInt(1)))
    val nCust = spark.read.parquet(s"$sf001/customer.parquet").count()
    val nOrd = spark.read.parquet(s"$sf001/orders.parquet")
      .filter("o_orderpriority <> '1-URGENT'").count()
    assert(rows.map(_._2.toLong).sum == nCust,
      "distribution does not cover every customer")
    assert(rows.map(t => t._1.toLong * t._2).sum == nOrd,
      "weighted counts do not conserve the order count")
    // The zero bucket asserted directly (the old disjunct repeated the
    // unconditional sum check above and could never fail): customers
    // with NO non-urgent orders must appear as the c_count=0 row with
    // exactly their headcount — this is what the LEFT join exists for.
    val custWithOrder = spark.read.parquet(s"$sf001/orders.parquet")
      .filter("o_orderpriority <> '1-URGENT'")
      .select("o_custkey").distinct().count()
    val zeroCust = nCust - custWithOrder
    if (zeroCust > 0)
      assert(rows.contains((0, zeroCust.toInt)),
        s"LEFT-join zero bucket missing or wrong: expected (0,$zeroCust) in ${rows.toSeq.sortBy(_._1).take(3)}")
    else
      assert(!rows.exists(_._1 == 0), "spurious zero bucket")
  }

  test("q361: the reported supplier(s) hold the exact maximum — no " +
    "other supplier's quarterly revenue exceeds it") {
    val got = q("q361_tpch_q15").collect()
    assert(got.nonEmpty)
    val top = got.map(_.getDouble(2)).max
    val all = spark.read.parquet(s"$sf001/lineitem.parquet")
      .filter("l_shipdate >= TIMESTAMP '1996-01-01' AND " +
        "l_shipdate < TIMESTAMP '1996-04-01'")
      .selectExpr("l_suppkey", "l_extendedprice", "l_discount").collect()
      .groupBy(_.getLong(0))
      .map { case (k, rs) =>
        k -> rs.map(r => BigDecimal(r.getDouble(1)).setScale(2,
            BigDecimal.RoundingMode.HALF_UP) *
          (BigDecimal(1) - BigDecimal(r.getDouble(2)).setScale(2,
            BigDecimal.RoundingMode.HALF_UP))).sum
      }
    val bfMax = all.values.max
    assert(math.abs(top - bfMax.setScale(2,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
    val winners = all.filter(_._2 == bfMax).keys.toSet
    assert(got.map(_.getLong(0)).toSet == winners,
      "winner set differs from brute force")
  }

  test("q362: every reported nation is in the target set, and the " +
    "row set replays from a Scala fold (above-average AND orderless)") {
    val target = Set(1, 3, 5, 7, 9, 11, 13)
    val custs = spark.read.parquet(s"$sf01/customer.parquet")
      .selectExpr("c_custkey", "c_nationkey", "c_acctbal").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        BigDecimal(r.getDouble(2)).setScale(2,
          BigDecimal.RoundingMode.HALF_UP) * 100))
      .filter(t => target(t._2))
    val pos = custs.filter(_._3 > 0)
    val sumC = pos.map(_._3).sum; val nPos = pos.size
    val ordered = spark.read.parquet(s"$sf01/orders.parquet")
      .filter("o_orderdate >= TIMESTAMP '1999-01-01'")
      .selectExpr("o_custkey").collect().map(_.getLong(0)).toSet
    val expect = custs
      .filter(t => t._3 * nPos > sumC && !ordered(t._1))
      .groupBy(_._2)
      .map { case (nk, rs) => nk -> (rs.size, rs.map(_._3).sum / 100) }
    val got = q01("q362_tpch_q22").collect()
      .map(r => r.getInt(0) -> ((r.getInt(1), r.getDouble(2)))).toMap
    assert(got.keySet == expect.keySet.map(identity),
      s"nation sets differ: got=${got.keySet} want=${expect.keySet}")
    expect.foreach { case (nk, (n, bal)) =>
      assert(got(nk)._1 == n, s"nation $nk count")
      assert(math.abs(got(nk)._2 - bal.setScale(2,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9, s"nation $nk bal")
    }
    assert(expect.nonEmpty, "no orderless above-average customers — vacuous")
  }
}
