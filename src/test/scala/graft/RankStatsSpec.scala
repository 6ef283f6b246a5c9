package graft

/** Property gates for the round-12 third wave (q334–q346): independent
  * in-Scala replays of the rank statistics, graph invariants for the
  * link-prediction/spectral consumers, the BH ladder replay, and the
  * layout-audit dominance bounds.
  */
class RankStatsSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf001)

  private def perUserCents: Map[Long, (Long, Long)] =
    spark.read.parquet(s"$sf001/events.parquet")
      .selectExpr("user_id",
        "CAST(round(value * 100, 0) AS BIGINT) AS cents")
      .collect()
      .groupBy(_.getLong(0))
      .map { case (u, rows) =>
        u -> ((rows.length.toLong, rows.map(_.getLong(1)).sum))
      }

  test("q334: Spearman rho equals an independent midrank replay") {
    val pu = perUserCents.values.toSeq
    def midranks(vs: Seq[Long]): Map[Long, Double] = {
      val sorted = vs.sorted
      vs.distinct.map { v =>
        val below = sorted.count(_ < v); val eq = sorted.count(_ == v)
        v -> (below + (eq + 1) / 2.0)
      }.toMap
    }
    val rx = midranks(pu.map(_._1)); val ry = midranks(pu.map(_._2))
    val pts = pu.map { case (x, y) => (rx(x), ry(y)) }
    val n = pts.length.toDouble
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val syy = pts.map(p => p._2 * p._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val expected = (n * sxy - sx * sy) /
      (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    val got = q("q334_spearman").collect().head.getDouble(1)
    assert(math.abs(got - expected) < 1e-6, s"got $got expected $expected")
  }

  test("q335: tau-b equals the brute-force pair replay per type") {
    val daily = spark.read.parquet(s"$sf001/events.parquet")
      .selectExpr("event_type",
        "unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000 AS day",
        "CAST(round(value * 100, 0) AS BIGINT) AS cents")
      .groupBy("event_type", "day")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("x"),
        org.apache.spark.sql.functions.sum("cents").as("y"))
      .collect()
      .groupBy(_.getString(0))
    val expected = daily.map { case (tpe, rows) =>
      val pts = rows.map(r => (r.getLong(2), r.getLong(3))).toSeq
      var c = 0L; var dd = 0L; var nx = 0L; var ny = 0L; var n0 = 0L
      for (i <- pts.indices; j <- (i + 1) until pts.length) {
        n0 += 1
        val s = (pts(j)._1 - pts(i)._1).sign * (pts(j)._2 - pts(i)._2).sign
        if (s > 0) c += 1 else if (s < 0) dd += 1
        if (pts(i)._1 == pts(j)._1) nx += 1
        if (pts(i)._2 == pts(j)._2) ny += 1
      }
      tpe -> (c - dd).toDouble /
        (math.sqrt((n0 - nx).toDouble) * math.sqrt((n0 - ny).toDouble))
    }
    q("q335_kendall_daily").collect().foreach { r =>
      val tpe = r.getString(0); val got = r.getDouble(4)
      assert(math.abs(got - expected(tpe)) < 1e-6,
        s"$tpe got $got expected ${expected(tpe)}")
    }
  }

  test("q336: the exact-rational F and eta^2 match a float ANOVA") {
    val cells = spark.read.parquet(s"$sf001/events.parquet")
      .selectExpr("event_type",
        "unix_micros(CAST(ts AS TIMESTAMP)) div 86400000000 AS day")
      .groupBy("event_type", "day").count().collect()
      .map(r => (r.getString(0), r.getLong(2).toDouble))
    val n = cells.length; val k = cells.map(_._1).distinct.length
    val gm = cells.map(_._2).sum / n
    val byG = cells.groupBy(_._1).values
    val ssb = byG.map(g =>
      g.length * math.pow(g.map(_._2).sum / g.length - gm, 2)).sum
    val ssw = byG.map { g =>
      val m = g.map(_._2).sum / g.length
      g.map(x => (x._2 - m) * (x._2 - m)).sum
    }.sum
    val r = q("q336_anova_f").collect().head
    assert(r.getInt(0) == k && r.getInt(1) == n)
    assert(math.abs(r.getDouble(2) - (ssb / (k - 1)) / (ssw / (n - k)))
      < 1e-6)
    assert(math.abs(r.getDouble(3) - ssb / (ssb + ssw)) < 1e-6)
  }

  test("q337: every queue entry carries direct sub-strict evidence " +
    "or indirect wedge evidence, never a strict-tier pair, and the " +
    "(direct, RA) priority descends") {
    val rows = q("q337_link_prediction").collect()
    assert(rows.nonEmpty, "the direct tier keeps the queue non-empty")
    rows.foreach { r =>
      if (r.isNullAt(2)) {
        // indirect-only: must have wedge evidence
        assert(r.getLong(3) >= 1 && r.getDouble(4) > 0.0,
          s"(${r.getLong(0)},${r.getLong(1)}) has no evidence at all")
      } else {
        val jac = r.getDouble(2)
        assert(jac >= 0.7 && jac < 0.95,
          s"direct jac $jac outside the review band")
      }
    }
    val prio = rows.map(r =>
      (if (r.isNullAt(2)) 0.0 else r.getDouble(2), r.getDouble(4)))
    assert(prio.zip(prio.tail).forall { case (a, b) =>
      a._1 > b._1 || (a._1 == b._1 && a._2 >= b._2)
    }, "queue priority must descend")
  }

  test("q338: per-class TVD equals a direct replay and verdicts " +
    "ride the settled values") {
    val cust = spark.read.parquet(s"$sf001/customer.parquet")
      .selectExpr("c_nationkey AS nat",
        "CAST(round((c_acctbal + 1000.0) * 100, 0) AS BIGINT) " +
          "DIV 100000 AS bb", "c_mktsegment AS seg").collect()
      .map(r => (r.getInt(0).toLong, r.getLong(1), r.getString(2)))
    val nn = cust.length.toLong
    val global = cust.groupBy(_._3).view.mapValues(_.length.toLong).toMap
    val byClass = cust.groupBy(c => (c._1, c._2))
    q("q338_t_closeness").collect().foreach { r =>
      val key = (r.getInt(0).toLong, r.getLong(1))
      val members = byClass(key)
      val nC = members.length.toLong
      val ts = global.map { case (seg, gs) =>
        math.abs(members.count(_._3 == seg) * nn - gs * nC)
      }.sum
      val expected = BigDecimal(ts.toDouble / (2.0 * nC * nn))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getLong(2) == nC)
      assert(math.abs(r.getDouble(3) - expected) < 1e-9,
        s"class $key t ${r.getDouble(3)} expected $expected")
    }
  }

  test("q339: the shipdate layout never reads more files than the " +
    "natural layout, and always reads at least one") {
    val rows = q("q339_zonemap_skip").collect()
    assert(rows.length == 8)
    rows.foreach { r =>
      val nat = r.getLong(1); val byd = r.getLong(2)
      assert(byd >= 1 && nat >= 1 && nat <= 32 && byd <= 32)
      assert(byd <= nat, s"${r.getString(0)}: bydate $byd > natural $nat")
    }
    assert(rows.map(_.getLong(2)).sum < rows.map(_.getLong(1)).sum,
      "sorting on the filter column must skip strictly more overall")
  }

  test("q340: the OLS replays exactly from the shard points (the " +
    "saturated sf0.001 vocab makes beta an honest 0.0 — also pinned)") {
    val r = q("q340_heaps_fit").collect().head
    assert(r.getInt(0) == 16)
    // vocab == number of distinct alpha tokens overall
    val vocab = spark.read.parquet(s"$sf001/documents.parquet")
      .selectExpr("explode(array_remove(split(lower(text), " +
        "'[^a-z]+'), '')) AS t").distinct().count()
    assert(r.getLong(2) == vocab)
    // exact replay: shard by md5, first-occurrence vocab, settled-ln OLS
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .selectExpr("CAST(conv(substring(md5(CAST(concat('h:', doc_id) " +
        "AS STRING)), 1, 15), 16, 10) AS LONG) % 16 AS shard",
        "array_remove(split(lower(text), '[^a-z]+'), '') AS ts")
      .collect().map(row => (row.getLong(0).toInt,
        row.getSeq[String](1)))
    val ntok = Array.fill(16)(0L); val firstSeen =
      scala.collection.mutable.Map.empty[String, Int]
    docs.foreach { case (sh, ts) =>
      ntok(sh) += ts.length
      ts.foreach(t => firstSeen.updateWith(t) {
        case Some(old) => Some(math.min(old, sh)); case None => Some(sh)
      })
    }
    val nv = Array.fill(16)(0L)
    firstSeen.values.foreach(sh => nv(sh) += 1)
    def settled(x: Double) = BigDecimal(math.log(x))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP)
    var cn = 0L; var cv = 0L
    val pts = (0 until 16).map { i =>
      cn += ntok(i); cv += nv(i)
      (settled(cn.toDouble), settled(cv.toDouble))
    }
    val n = pts.length.toDouble
    val sx = pts.map(_._1).sum.toDouble; val sy = pts.map(_._2).sum.toDouble
    val sxx = pts.map(p => p._1 * p._1).sum.toDouble
    val sxy = pts.map(p => p._1 * p._2).sum.toDouble
    val beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    val expected = BigDecimal(beta)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
    assert(math.abs(r.getDouble(3) - expected) < 1e-9,
      s"beta ${r.getDouble(3)} expected $expected")
  }

  test("q341: Cliff's delta equals the O(n^2) brute force on the " +
    "per-user cents cohorts") {
    val pu = perUserCents
    val a = pu.collect { case (u, (_, s)) if u % 2 == 0 => s }.toSeq
    val b = pu.collect { case (u, (_, s)) if u % 2 != 0 => s }.toSeq
    var gt = 0L; var lt = 0L
    for (x <- a; y <- b) {
      if (x > y) gt += 1 else if (x < y) lt += 1
    }
    val expected = BigDecimal((gt - lt).toDouble / (a.length.toLong *
      b.length)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val r = q("q341_cliffs_delta").collect().head
    assert(r.getInt(0) == a.length && r.getInt(1) == b.length)
    assert(math.abs(r.getDouble(3) - expected) < 1e-9,
      s"delta ${r.getDouble(3)} expected $expected")
  }

  test("q342: the rejection set is exactly ranks 1..i* of the BH " +
    "ladder replayed from the emitted p-ledger") {
    val rows = q("q342_bh_fdr").collect()
    val m = rows.length
    assert(m >= 2)
    val byRank = rows.sortBy(_.getInt(5))
    // p monotone in rank (ties broken by source — p non-decreasing)
    val ks = byRank.map(_.getInt(3))
    assert(ks.zip(ks.tail).forall { case (a, b) => a <= b })
    val iStar = (1 to m).filter(i =>
      (1L + ks(i - 1)) * 10 * m <= 201L * i).lastOption.getOrElse(0)
    byRank.zipWithIndex.foreach { case (r, idx) =>
      assert(r.getBoolean(6) == (idx + 1 <= iStar),
        s"rank ${idx + 1}: rejected=${r.getBoolean(6)} iStar=$iStar")
    }
  }

  test("q343: the Rayleigh sequence brackets the spectral radius " +
    "(avg degree <= rayleigh_2 <= max degree)") {
    val r = q("q343_spectral_radius").collect().head
    val avg = r.getDouble(3); val ray = r.getDouble(4)
    val maxDeg = r.getLong(2)
    assert(ray >= avg - 1e-9, s"rayleigh $ray below avg degree $avg")
    assert(ray <= maxDeg + 1e-9, s"rayleigh $ray above max degree $maxDeg")
  }

  test("q344: rules replay from the q244 pair table (confidence, " +
    "lift, symmetry)") {
    val pairs = q("q244_frequent_pairs").collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    assert(pairs.nonEmpty)
    val rules = q("q344_assoc_rules").collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getInt(2), r.getDouble(3), r.getDouble(4)))).toMap
    // every emitted rule's support matches its q244 pair and lift is
    // direction-symmetric whenever both directions made the cut
    rules.foreach { case ((a, b), (sup, conf, _)) =>
      val pairSup = pairs.collectFirst {
        case (t1, t2, s) if (t1 == a && t2 == b) || (t1 == b && t2 == a)
          => s
      }
      assert(pairSup.contains(sup), s"rule $a->$b support $sup")
      assert(conf > 0.0 && conf <= 1.0)
      rules.get((b, a)).foreach { case (_, _, liftBa) =>
        assert(math.abs(rules((a, b))._3 - liftBa) < 1e-9,
          s"lift asymmetry for $a<->$b")
      }
    }
  }

  test("q345: ideal file counts are exact ceilings and amplification " +
    "is files/ideal") {
    q("q345_compaction_plan").collect().foreach { r =>
      val files = r.getLong(1); val bytes = r.getLong(2)
      val ideal = r.getLong(4)
      assert(ideal == (bytes + 65535L) / 65536L)
      val expAmp = BigDecimal(files.toDouble / ideal)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getDouble(5) - expAmp) < 1e-9)
    }
  }

  test("q346: Spiegelhalter z replays from the cleared-denominator " +
    "integer sums per language") {
    // scoredDocs tokenizes raw text on whitespace (NO lowercasing)
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .selectExpr("lang",
        "array_remove(split(text, '\\\\s+'), '') AS ts")
      .selectExpr("lang", "size(ts) AS n_tok",
        "size(filter(ts, t -> t IN ('the','a','of','and','to','in','is')))" +
          " AS stop_cnt",
        "CASE WHEN array_contains(ts, 'dup') THEN 1L ELSE 0L END AS lab")
      .where("n_tok > 0")
      .selectExpr("lang", "CAST((1000 * stop_cnt) DIV n_tok AS LONG) AS sm",
        "lab")
      .collect().groupBy(_.getString(0))
    val expected = docs.map { case (lang, rows) =>
      val num = rows.map(r =>
        (1000L * r.getLong(2) - r.getLong(1)) *
          (1000L - 2L * r.getLong(1))).sum
      val den = rows.map { r =>
        val m = 1000L - 2L * r.getLong(1)
        m * m * r.getLong(1) * (1000L - r.getLong(1))
      }.sum
      lang -> num.toDouble / math.sqrt(den.toDouble)
    }
    q("q346_calibration_z").collect().foreach { r =>
      val lang = r.getString(0)
      assert(math.abs(r.getDouble(2) - expected(lang)) < 1e-6,
        s"$lang z ${r.getDouble(2)} expected ${expected(lang)}")
    }
  }
}
