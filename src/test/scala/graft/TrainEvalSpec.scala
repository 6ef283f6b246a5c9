package graft

import org.apache.spark.sql.Row

/** Property gates for the supervised train/eval family (q291–q295):
  * the NB confusion matrix must equal an independent double-arithmetic
  * reference NB, the stump's integer-surrogate argmax must equal the
  * double-Gini argmax, and the PR/IG outputs must satisfy their
  * defining inequalities.
  */
class TrainEvalSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf001)

  test("q292: integer micro-unit NB scoring reproduces an independent " +
    "double-log-prob reference classifier's confusion matrix") {
    // Reference NB computed with plain Scala doubles over the same
    // carves — an INDEPENDENT construction (per-token Laplace smoothing
    // in double log space, no micro-quantization). The micro-unit
    // engine may only diverge where two classes' double scores sit
    // within quantization distance (~1e-6·tokens) — the fixture has no
    // such near-tie, so the matrices must match exactly.
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select("doc_id", "lang", "text")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def toks(text: String): Seq[String] =
      text.toLowerCase.split("[^a-z]+").filter(_.nonEmpty).toSeq
    val train = docs.filter(_._1 % 2 == 0)
    val test = docs.filter(_._1 % 2 != 0)
    val cell = train.flatMap(d => toks(d._3).map(t => (d._2, t)))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val tl = cell.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val vocab = cell.keySet.map(_._2).size
    val dl = train.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val dd = train.size.toDouble
    val langs = dl.keys.toSeq.sorted
    val expected = test
      .filter(d => toks(d._3).nonEmpty)
      .map { d =>
        val counts = toks(d._3).groupBy(identity).view.mapValues(_.size).toMap
        val pred = langs.maxBy { l =>
          val prior = math.log(dl(l) / dd)
          val s = counts.map { case (t, c) =>
            c * math.log((cell.getOrElse((l, t), 0L) + 1.0) / (tl(l) + vocab))
          }.sum
          (prior + s, l) // tie-break mirrors the engine's (score, lang) max
        }
        (d._2, pred)
      }
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = q("q292_nb_confusion").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == expected,
      s"micro-unit NB != double reference NB: got=$got expected=$expected")
  }

  test("q295: the integer cross-multiplied surrogate picks the same " +
    "threshold as the double Gini gain") {
    val rows = q("q295_decision_stump").collect()
    val bestBySurrogate = rows.filter(_.getBoolean(6)).map(_.getInt(0))
    assert(bestBySurrogate.length == 1, "exactly one is_best row")
    val bestByGain = rows.maxBy(r => (r.getDouble(5), -r.getInt(0))).getInt(0)
    assert(bestBySurrogate.head == bestByGain,
      s"surrogate argmax ${bestBySurrogate.head} != gain argmax $bestByGain")
  }

  test("q293: PR curve is a valid threshold sweep — recall " +
    "non-decreasing as the threshold drops, AP in (0, 1], final recall 1") {
    val rows = q("q293_pr_curve").collect() // ordered thr DESC
    val recalls = rows.map(_.getDouble(5))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => b >= a },
      "recall must be non-decreasing while the threshold drops")
    assert(math.abs(recalls.last - 1.0) < 1e-9, "last threshold recalls all")
    val ap = rows.head.getDouble(6)
    assert(ap > 0.0 && ap <= 1.0, s"ap=$ap out of range")
    rows.foreach { r =>
      assert(r.getLong(1) + r.getLong(3) == rows.last.getLong(1),
        "tp + fn must equal total positives on every row")
    }
  }

  test("q294: information gain is bounded by the label entropy and " +
    "non-negative up to the 6dp term rounding") {
    val rows = q("q294_info_gain").collect()
    assert(rows.length == 20)
    val igs = rows.map(_.getDouble(4))
    assert(igs.zip(igs.tail).forall { case (a, b) => a >= b }, "ranked desc")
    // H(lab) ≤ ln 2; each of the 6 summed terms carries ≤ 5e-7 rounding
    assert(igs.forall(ig => ig >= -3e-6 && ig <= math.log(2) + 3e-6),
      s"IG out of [0, H(lab)] beyond rounding slack: ${igs.toSeq}")
  }

  test("q291: per-lang model rows are count-ranked and Laplace mass " +
    "decreases with rank") {
    val rows = q("q291_nb_train").collect()
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getInt(1))
      assert(byRank.length == 10)
      val cnts = byRank.map(_.getLong(3))
      assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b },
        "cnt must be non-increasing in rank")
      val lps = byRank.map(_.getDouble(4))
      assert(lps.zip(lps.tail).forall { case (a, b) => a >= b },
        "log-likelihood must be non-increasing in rank")
    }
  }
}
