package graft

/** Property gates for the analytics family (q311–q315): independent
  * sweep/attribution replays, credit-conservation identities, and the
  * multiset-Jaccard bound.
  */
class AnalyticsOpsSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf001)

  private def eventsUs = spark.read.parquet(s"$sf001/events.parquet")
    .selectExpr("event_id", "event_type", "user_id",
      "CAST(ts AS TIMESTAMP) AS tts")
    .selectExpr("event_id", "event_type", "user_id",
      "unix_micros(tts) AS t")

  test("q311: the two-phase bucketed sweep equals a single-pass " +
    "global sweep replayed in Scala") {
    val ev = eventsUs.select("event_type", "t").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val expected = ev.groupBy(_._1).map { case (tpe, rows) =>
      val bounds = rows.flatMap(r =>
        Seq((r._2, 1L), (r._2 + 1800000000L, -1L)))
        .sortBy(identity)
      var run = 0L; var peak = 0L; var peakT = Long.MaxValue
      bounds.foreach { case (t, d) =>
        run += d
        if (run > peak) { peak = run; peakT = t }
      }
      tpe -> ((rows.length.toLong, peak, peakT))
    }
    val got = q("q311_peak_concurrency").collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got == expected, s"got $got expected $expected")
  }

  test("q312: multiset Jaccard is in (0, 1] and never exceeds 1; " +
    "identical docs would score 1") {
    val rows = q("q312_weighted_jaccard").collect()
    assert(rows.nonEmpty, "the θ=0.7 stage must yield candidates")
    rows.foreach { r =>
      val wj = r.getDouble(3)
      assert(wj > 0.0 && wj <= 1.0, s"wjac $wj out of range")
    }
  }

  test("q313: skipgram pairs are count-ranked, PMI is finite, and " +
    "counts bound the unigram margins") {
    val rows = q("q313_skipgram_cooc").collect()
    assert(rows.length == 30)
    val cnts = rows.map(_.getLong(3))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b })
    rows.foreach(r => assert(!r.getDouble(4).isNaN &&
      !r.getDouble(4).isInfinite))
  }

  test("q314: the PU prior estimate is a valid probability and c_hat " +
    "exceeds the unlabeled mean score (positives score higher)") {
    val r = q("q314_pu_prior").collect().head
    val c = r.getDouble(4); val e = r.getDouble(5); val pi = r.getDouble(6)
    assert(c > 0 && c <= 1 && e > 0 && e <= 1)
    assert(pi >= 0 && pi <= 1)
    assert(math.abs(pi - math.min(e / c, 1.0)) < 2e-6)
  }

  test("q316: the bootstrap CI brackets both the point AUC and the " +
    "bootstrap mean, with lo ≤ hi from exact order statistics") {
    val r = q("q316_auc_bootstrap").collect().head
    val (pt, mean, lo, hi) =
      (r.getDouble(0), r.getDouble(2), r.getDouble(3), r.getDouble(4))
    assert(lo <= hi)
    assert(mean >= lo - 1e-9 && mean <= hi + 1e-9,
      s"boot mean $mean outside CI [$lo, $hi]")
    assert(pt >= lo - 0.05 && pt <= hi + 0.05,
      s"point AUC $pt implausibly far from CI [$lo, $hi]")
    assert(r.getInt(1) == 100)
  }

  test("q317: per-state entropies and the rate match an independent " +
    "Scala replay of the transition counts") {
    val ev = eventsUs.collect()
      .map(r => (r.getLong(2), r.getLong(0), r.getLong(3), r.getString(1)))
    def r6(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val trans = ev.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val s = es.sortBy(e => (e._3, e._2)).map(_._4)
      s.zip(s.tail)
    }.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ni = trans.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val nn = trans.values.sum.toDouble
    val rate = BigDecimal(0) - trans.map { case ((i, _), c) =>
      BigDecimal(r6((c / nn) * math.log(c.toDouble / ni(i))))
    }.sum
    val got = q("q317_entropy_rate").collect()
    assert(math.abs(got.head.getDouble(3) - rate.toDouble) < 1e-9,
      s"rate ${got.head.getDouble(3)} vs replay $rate")
    got.foreach { r =>
      assert(r.getDouble(2) >= 0, "row entropy must be non-negative")
      assert(r.getLong(1) == ni(r.getString(0)))
    }
  }

  test("q318: deciles are monotone within each variant and the QTE " +
    "is their exact integer difference") {
    val rows = q("q318_qte").collect()
    assert(rows.length == 9)
    val qa = rows.map(_.getLong(1)); val qb = rows.map(_.getLong(2))
    assert(qa.zip(qa.tail).forall { case (a, b) => a <= b })
    assert(qb.zip(qb.tail).forall { case (a, b) => a <= b })
    rows.foreach(r => assert(r.getLong(3) == r.getLong(2) - r.getLong(1)))
  }

  test("q319: the cascade is referentially consistent — deleted " +
    "lineitems exactly cover the tombstoned orders' lines") {
    val rows = q("q319_deletion_cascade").collect()
      .map(r => r.getString(0) -> r).toMap
    val cust = spark.read.parquet(s"$sf001/customer.parquet")
    val orders = spark.read.parquet(s"$sf001/orders.parquet")
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
    val tomb = cust.filter("c_custkey % 97 = 0").select("c_custkey")
    val delO = orders.join(tomb,
      orders("o_custkey") === tomb("c_custkey")).select("o_orderkey")
    val expectLi = li.join(delO, li("l_orderkey") === delO("o_orderkey"))
      .count()
    assert(rows("lineitem").getLong(2) == expectLi)
    assert(rows("orders").getLong(2) == delO.count())
    assert(rows("customer").getLong(2) == tomb.count())
  }

  test("q320: Fano factors come from exact sufficient statistics — " +
    "a token appearing once per doc has Fano < 1 (underdispersed)") {
    val rows = q("q320_burstiness").collect()
    assert(rows.length == 20)
    val totals = rows.map(_.getLong(2))
    assert(totals.zip(totals.tail).forall { case (a, b) => a >= b })
    rows.foreach { r =>
      assert(r.getDouble(4) >= 0, "Fano is a variance ratio")
      assert(r.getBoolean(5) == (r.getDouble(4) > 1.0))
      assert(r.getLong(3) <= r.getLong(2), "doc count ≤ occurrences")
    }
  }

  test("q321: DiD equals the plain 2×2 rate algebra and cells " +
    "partition the events") {
    val rows = q("q321_did").collect()
    assert(rows.length == 4)
    val total = spark.read.parquet(s"$sf001/events.parquet").count()
    assert(rows.map(_.getLong(2)).sum == total)
    val rate = rows.map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(4))
      .toMap
    val did = (rate((1, 1)) - rate((1, 0))) - (rate((0, 1)) - rate((0, 0)))
    assert(math.abs(rows.head.getDouble(5) - did) < 1e-9)
  }

  test("q322: S-curves are monotone in θ, the signature budget is " +
    "respected, and exactly one config is chosen") {
    val rows = q("q322_lsh_planner").collect()
    rows.foreach { r =>
      assert(r.getInt(2) == r.getInt(0) * r.getInt(1))
      assert(r.getDouble(3) <= r.getDouble(4) + 1e-9 &&
        r.getDouble(4) <= r.getDouble(5) + 1e-9,
        "collision probability must rise with θ")
      assert(r.getDouble(6) >= 0 && r.getDouble(6) <= 1)
    }
    assert(rows.count(_.getBoolean(8)) == 1, "exactly one chosen config")
    val chosen = rows.filter(_.getBoolean(8)).head
    assert(rows.forall(r => r.getLong(7) <= chosen.getLong(7)))
  }

  test("q323: skew stats are internally consistent (p50 ≤ p99 ≤ max, " +
    "Σ freq = rows) and the salt is ≥ 1 only under real skew") {
    val rows = q("q323_skew_profiler").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      assert(r.getLong(4) <= r.getLong(5) && r.getLong(5) <= r.getLong(3),
        s"${r.getString(0)}: p50 ≤ p99 ≤ max violated")
      assert(r.getLong(7) >= 1, "salt is a positive partition count")
      assert(r.getDouble(6) >= 1.0 - 1e-9,
        "max/avg skew ratio is at least 1")
    }
  }

  test("q324: absorption probabilities are monotone in horizon and " +
    "bounded by 1; purchase itself absorbs at every horizon") {
    val rows = q("q324_markov_absorption").collect()
    rows.foreach { r =>
      val ps = (1 to 4).map(r.getDouble)
      assert(ps.zip(ps.tail).forall { case (a, b) => b >= a - 1e-9 },
        s"${r.getString(0)}: horizons must be monotone ${ps}")
      assert(ps.forall(p => p >= 0 && p <= 1 + 1e-9))
    }
  }

  test("q325: quartiles are ordered, fences classify exactly the " +
    "integer-arithmetic outliers, counts are bounded by n") {
    val rows = q("q325_boxplot_profile").collect()
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(3) && r.getLong(3) <= r.getLong(4))
      assert(r.getLong(5) == r.getLong(4) - r.getLong(2))
      assert(r.getLong(6) + r.getLong(7) <= r.getLong(1))
    }
  }

  test("q326/q327: TPC-H revenue ranks on the exact decimal sum — " +
    "rows arrive revenue-descending and Q5 nations are ASIA-only") {
    val q3 = q("q326_tpch_q3").collect()
    assert(q3.length <= 10 && q3.nonEmpty)
    val revs3 = q3.map(_.getDouble(1))
    assert(revs3.zip(revs3.tail).forall { case (a, b) => a >= b })
    val q5 = q("q327_tpch_q5").collect()
    assert(q5.nonEmpty)
    val revs5 = q5.map(_.getDouble(1))
    assert(revs5.zip(revs5.tail).forall { case (a, b) => a >= b })
    val asia = spark.read.parquet(s"$sf001/nation.parquet")
      .join(spark.read.parquet(s"$sf001/region.parquet")
        .filter("r_name = 'ASIA'"),
        org.apache.spark.sql.functions.expr("n_regionkey = r_regionkey"))
      .select("n_name").collect().map(_.getString(0)).toSet
    assert(q5.map(_.getString(0)).toSet.subsetOf(asia))
  }

  test("q328: tightening the threshold is monotone in survivors and " +
    "the loosest rung keeps at most everything") {
    val rows = q("q328_filter_whatif").collect() // threshold asc
    val docs = rows.map(_.getLong(1)); val toks = rows.map(_.getLong(2))
    assert(docs.zip(docs.tail).forall { case (a, b) => a <= b })
    assert(toks.zip(toks.tail).forall { case (a, b) => a <= b })
    rows.foreach { r =>
      assert(r.getDouble(3) >= 0 && r.getDouble(3) <= 1)
      assert(r.getDouble(4) >= -1e-9 && r.getDouble(4) <= 2 + 1e-9,
        "L1 between two distributions is in [0, 2]")
    }
  }

  test("q329: CUPED preserves the raw post-period means and its " +
    "variance-reduction factor is a squared correlation") {
    val rows = q("q329_cuped").collect()
    assert(rows.length == 2)
    val rho2 = rows.head.getDouble(6)
    assert(rho2 >= 0 && rho2 <= 1, s"rho² $rho2 outside [0,1]")
    rows.foreach { r =>
      // adjustment shifts the mean by θ·(x̄_v − x̄): bounded by the
      // raw means' scale
      assert(r.getDouble(4) > 0, "adjusted spend stays positive here")
    }
  }

  test("q330: the overdispersion verdict matches the exact integer " +
    "inequality and NB parameters exist exactly when overdispersed") {
    val rows = q("q330_negbin_fit").collect()
    rows.foreach { r =>
      val over = r.getBoolean(5)
      assert(over == (r.getDouble(3) > r.getDouble(2)) ||
        math.abs(r.getDouble(3) - r.getDouble(2)) < 1e-5,
        "verdict must match var > mean (up to display rounding)")
      assert(over == !r.isNullAt(6) && over == !r.isNullAt(7))
      if (over) assert(r.getDouble(6) > 0 &&
        r.getDouble(7) > 0 && r.getDouble(7) <= 1)
    }
  }

  test("q315: every rule's credits sum to exactly 10⁶ per conversion " +
    "path, so the rule totals are equal and shares sum to 1") {
    val rows = q("q315_multitouch_attribution").collect()
    val byRule = rows.groupBy(_.getString(0))
      .view.mapValues(_.map(_.getLong(2)).sum).toMap
    assert(byRule.values.toSet.size == 1,
      s"rules disagree on total credit: $byRule")
    val nPaths = eventsUs.collect()
      .groupBy(_.getLong(2))
      .count { case (_, es) =>
        val purch = es.filter(_.getString(1) == "purchase")
        purch.nonEmpty && es.exists(e => e.getString(1) != "purchase" &&
          e.getLong(3) < purch.map(_.getLong(3)).min)
      }
    assert(byRule.values.head == 1000000L * nPaths,
      s"total credit ${byRule.values.head} ≠ 1e6 × $nPaths paths")
    rows.groupBy(_.getString(0)).foreach { case (rule, rs) =>
      val shareSum = rs.map(_.getDouble(3)).sum
      assert(math.abs(shareSum - 1.0) < 1e-4, s"$rule shares sum $shareSum")
    }
  }
}
