package graft

/** Property gates for q347–q356 (round-12 fourth wave): brute-force
  * Scala replays of the TPC-H adaptations and the JT ledger, internal
  * consistency of the planning/diagnostic tables, and the smoothing /
  * overlap inequalities that must hold on any corpus.
  */
class WaveFourSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf001)

  test("q347: the disjunctive-clause revenue replays from a row-level " +
    "Scala filter") {
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
      .selectExpr("l_partkey", "l_quantity", "l_extendedprice",
        "l_discount").collect()
    val parts = spark.read.parquet(s"$sf001/part.parquet")
      .selectExpr("p_partkey", "p_brand", "p_size").collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    var rev = BigDecimal(0); var n = 0L
    li.foreach { r =>
      val qty = r.getDouble(1)
      val (brand, size) = parts(r.getLong(0))
      val hit = qty >= 1.0 && qty <= 30.0 && (
        (brand == "Brand#1" && size >= 1 && size <= 5 &&
          qty >= 1.0 && qty <= 11.0) ||
        (brand == "Brand#2" && size >= 1 && size <= 10 &&
          qty >= 10.0 && qty <= 20.0) ||
        (brand == "Brand#3" && size >= 1 && size <= 15 &&
          qty >= 20.0 && qty <= 30.0))
      if (hit) {
        n += 1
        rev += BigDecimal(r.getDouble(2)).setScale(2,
            BigDecimal.RoundingMode.HALF_UP) *
          (BigDecimal(1) - BigDecimal(r.getDouble(3)).setScale(2,
            BigDecimal.RoundingMode.HALF_UP))
      }
    }
    val row = q("q347_tpch_q19").collect().head
    assert(row.getLong(1) == n)
    assert(math.abs(row.getDouble(0) -
      rev.setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("q348: promo share is the exact ratio of its own emitted " +
    "decimal parts and lies in [0, 1]") {
    val r = q("q348_tpch_q14").collect().head
    val pct = r.getDouble(0)
    assert(pct >= 0.0 && pct <= 100.0)
    assert(r.getDouble(1) <= r.getDouble(2) + 1e-9,
      "promo revenue cannot exceed total")
  }

  test("q350: Q6 replays from a row-level Scala filter") {
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
      .selectExpr("l_shipdate", "l_discount", "l_quantity",
        "l_extendedprice")
      .filter("l_shipdate >= TIMESTAMP '1996-01-01' AND " +
        "l_shipdate < TIMESTAMP '1997-01-01' AND " +
        "l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24.0")
      .collect()
    val rev = li.map(r =>
      BigDecimal(r.getDouble(3)).setScale(2,
        BigDecimal.RoundingMode.HALF_UP) *
      BigDecimal(r.getDouble(1)).setScale(2,
        BigDecimal.RoundingMode.HALF_UP)).sum
    val row = q("q350_tpch_q6").collect().head
    assert(row.getLong(1) == li.length)
    assert(math.abs(row.getDouble(0) -
      rev.setScale(2, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("q351: quantiles are monotone in p within each cohort and the " +
    "median matches a direct order-statistic replay") {
    val rows = q("q351_qq_drift").collect().sortBy(_.getInt(0))
    assert(rows.length == 19)
    val qe = rows.map(_.getLong(1)); val qo = rows.map(_.getLong(2))
    assert(qe.zip(qe.tail).forall { case (a, b) => a <= b })
    assert(qo.zip(qo.tail).forall { case (a, b) => a <= b })
    val pu = spark.read.parquet(s"$sf001/events.parquet")
      .selectExpr("user_id",
        "CAST(round(value * 100, 0) AS BIGINT) AS cents")
      .collect().groupBy(_.getLong(0))
      .map { case (u, rs) => (u, rs.map(_.getLong(1)).sum) }
    def orderStat(vs: Seq[Long], p: Int): Long = {
      val sorted = vs.sorted
      sorted(((p * vs.length + 99) / 100 - 1).toInt)
    }
    val evens = pu.collect { case (u, v) if u % 2 == 0 => v }.toSeq
    val odds = pu.collect { case (u, v) if u % 2 != 0 => v }.toSeq
    val mid = rows(9) // p = 50
    assert(mid.getInt(0) == 50)
    assert(mid.getLong(1) == orderStat(evens, 50))
    assert(mid.getLong(2) == orderStat(odds, 50))
  }

  test("q352: pooled cells are the column sums of the strata and the " +
    "reversed flag is the XOR of the emitted directions") {
    val rows = q("q352_simpsons_paradox").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(6) ==
        (r.getBoolean(3) != r.getBoolean(5)))
    }
    // pooled direction identical on every row (it is a global)
    assert(rows.map(_.getBoolean(5)).distinct.length == 1)
    val n = rows.map(_.getLong(1)).sum
    val total = spark.read.parquet(s"$sf001/orders.parquet").count()
    assert(n == total, "strata must partition the orders table")
  }

  test("q353: n_required is the ceiling of the settled n_raw and the " +
    "powered flag compares against it") {
    val r = q("q353_power_analysis").collect().head
    if (!r.isNullAt(4)) {
      val nRaw = r.getDouble(4)
      assert(r.getLong(5) == math.ceil(nRaw).toLong)
      assert(r.getBoolean(6) ==
        (math.min(r.getLong(0), r.getLong(1)).toDouble >= nRaw))
    } else {
      assert(r.isNullAt(5), "undefined plan must stay NULL throughout")
    }
  }

  test("q354: the doubled JT ledger replays from the brute-force " +
    "cross-group pair loop") {
    val daily = spark.read.parquet(s"$sf001/events.parquet")
      .selectExpr("unix_micros(CAST(ts AS TIMESTAMP)) " +
        "div 86400000000 AS day",
        "CAST(round(value * 100, 0) AS BIGINT) AS cents")
      .groupBy("day")
      .agg(org.apache.spark.sql.functions.sum("cents").as("x"))
      .collect().map(r => (r.getLong(0) % 7, r.getLong(1)))
    var jt2 = 0L
    for ((w1, x1) <- daily; (w2, x2) <- daily if w1 < w2) {
      if (x2 > x1) jt2 += 2 else if (x2 == x1) jt2 += 1
    }
    val sizes = daily.groupBy(_._1).view.mapValues(_.length.toLong)
    val n = daily.length.toLong
    val sq = sizes.values.map(g => g * g).sum
    val r = q("q354_jonckheere").collect().head
    assert(r.getInt(0) == n)
    assert(r.getLong(1) == jt2, s"jt2 ${r.getLong(1)} expected $jt2")
    assert(r.getLong(2) == (n * n - sq) / 2)
  }

  test("q355: overlap coefficient dominates Jaccard and intersections " +
    "never exceed the smaller vocabulary") {
    val rows = q("q355_source_overlap").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val inter = r.getLong(2); val na = r.getLong(3)
      val nb = r.getLong(4)
      assert(inter <= math.min(na, nb))
      assert(r.getDouble(6) >= r.getDouble(5) - 1e-9,
        "overlap_coef >= jaccard must hold")
      assert(r.getDouble(6) <= 1.0 + 1e-9)
    }
    val ocs = rows.map(_.getDouble(6))
    assert(ocs.zip(ocs.tail).forall { case (a, b) => a >= b })
  }

  test("q356: the three correlations and the partial lie in [-1, 1] " +
    "and the partial replays from the emitted r's") {
    val r = q("q356_partial_correlation").collect().head
    val (rxy, rxt, ryt, part) =
      (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))
    Seq(rxy, rxt, ryt, part).foreach(v =>
      assert(v >= -1.0 - 1e-9 && v <= 1.0 + 1e-9))
    val expected = BigDecimal((rxy - rxt * ryt) /
      (math.sqrt(1.0 - rxt * rxt) * math.sqrt(1.0 - ryt * ryt)))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(part - expected) < 1e-9)
  }

  test("q349: smoothed shares sum to ~1, flatten the natural mix, and " +
    "upweight exactly the below-average sources") {
    val rows = q("q349_temperature_mix").collect()
    val nat = rows.map(_.getDouble(3)); val tmp = rows.map(_.getDouble(4))
    assert(math.abs(tmp.sum - 1.0) < 1e-3)
    assert(tmp.max <= nat.max + 1e-9, "smoothing cannot sharpen the top")
    assert(tmp.min >= nat.min - 1e-9, "smoothing cannot starve the tail")
    rows.foreach { r =>
      // effective epochs = temp_share / natural_share: > 1 iff the
      // source is upweighted, which under sqrt smoothing happens
      // exactly for below-average-share sources
      val up = r.getDouble(5) > 1.0
      val below = r.getDouble(4) > r.getDouble(3)
      assert(up == below,
        s"${r.getString(0)}: epochs ${r.getDouble(5)} vs shares")
    }
  }
}
