package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._
import graft.functions.exprs.graft_nfc_normalize

/** Behavioral guarantees for the CleanOps module (q168–q172): the
  * NfcNormalize expression's semantics and edges, the content-defined
  * chunking stability property (the reason CDC exists), and the
  * q169 single-scan profiler claim.
  */
class CleanOpsSpec extends SparkSpec {

  import spark.implicits._

  private def run(name: String) =
    graft.SparkEntry.queries(name)(spark, sf001)

  test("graft_nfc_normalize composes combining sequences, is the " +
    "identity on NFC input, idempotent, and null-safe") {
    val aAcuteDeco = "a\u0301"    // a + combining acute
    val aAcute = "\u00e1"         // precomposed
    val etreDeco = "e\u0302tre"   // e + combining circumflex
    val etre = "\u00eatre"
    val alreadyNfc = s"${aAcute}lready nfc"
    val rows = Seq(aAcuteDeco, etreDeco, alreadyNfc, "plain ascii", "")
      .toDF("s").select(
        col("s"),
        graft_nfc_normalize(col("s")).as("nfc"),
        graft_nfc_normalize(graft_nfc_normalize(col("s"))).as("nfc2"),
        length(col("s")).as("n"),
        length(graft_nfc_normalize(col("s"))).as("nn")).collect()

    val byIn = rows.map(r => r.getString(0) -> r).toMap
    assert(byIn(aAcuteDeco).getString(1) == aAcute)
    assert(byIn(etreDeco).getString(1) == etre)
    assert(byIn(alreadyNfc).getString(1) == alreadyNfc)
    assert(byIn("plain ascii").getString(1) == "plain ascii")
    assert(byIn("").getString(1) == "")
    // idempotence: NFC(NFC(x)) == NFC(x), and composition shortens
    rows.foreach(r => assert(r.getString(1) == r.getString(2)))
    assert(byIn(aAcuteDeco).getInt(3) == 2 && byIn(aAcuteDeco).getInt(4) == 1)
    // null-safe
    val n = Seq[Option[String]](None).toDF("s")
      .select(graft_nfc_normalize(col("s"))).collect()
    assert(n.head.isNullAt(0))
  }

  test("graft_nfc_normalize agrees with the JDK Normalizer on corpus " +
    "text with injected combining accents (interpreted == codegen path)") {
    val deco = Tables_decoDocs()
    val got = deco.select(col("doc_id"),
      graft_nfc_normalize(col("s")).as("nfc")).collect()
    val want = deco.collect().map { r =>
      r.getLong(0) -> java.text.Normalizer.normalize(
        r.getString(1), java.text.Normalizer.Form.NFC)
    }.toMap
    got.foreach(r => assert(r.getString(1) == want(r.getLong(0))))
  }

  private def Tables_decoDocs() =
    graft.Tables.documents(spark, sf001)
      .select(col("doc_id"),
        regexp_replace(col("text"), "a", "a\u0301").as("s"))

  test("CDC chunking is content-stable: inserting words at the head " +
    "re-chunks only the prefix — every chunk after the first boundary " +
    "is hash-identical, unlike fixed-width chunking") {
    val base = graft.Tables.documents(spark, sf001)
      .select(col("doc_id"), col("text")).limit(50)
    val edited = base.select(col("doc_id"),
      concat(lit("inserted preamble words "), col("text")).as("text"))

    def chunkSets(df: org.apache.spark.sql.DataFrame) =
      CleanOps.cdcChunks(df)
        .groupBy(col("doc_id"))
        .agg(collect_list(md5(col("chunk_text"))).as("hashes"),
          max(col("chunk_id")).as("n"))
        .collect()
        .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap

    val a = chunkSets(base); val b = chunkSets(edited)
    assert(a.keySet == b.keySet)
    var stable = 0; var total = 0
    a.foreach { case (id, ha) =>
      val hb = b(id)
      // all original chunks except (at most) the head chunk survive
      // the edit: the boundary rule never re-chunks past the first
      // boundary after the insertion point
      val surviving = ha.intersect(hb).size
      total += ha.size
      stable += surviving
      assert(surviving >= ha.size - 1,
        s"doc $id lost ${ha.size - surviving} chunks to a head edit")
    }
    assert(total > 0 && stable > 0)
  }

  test("CDC chunks reconstruct the exact token stream in order " +
    "(no token lost or duplicated by the boundary rule)") {
    val docs = graft.Tables.documents(spark, sf001).limit(50)
    val rebuilt = CleanOps.cdcChunks(docs)
      .groupBy(col("doc_id"))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("chunk_id"), col("chunk_text")))),
          x => x.getField("chunk_text")), " ").as("joined"))
    val direct = docs.select(col("doc_id"),
      array_join(filter(split(lower(col("text")), "[^a-z]+"),
        t => t =!= ""), " ").as("joined"))
    val got = rebuilt.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    direct.collect().foreach { r =>
      assert(got(r.getLong(0)) == r.getString(1),
        s"doc ${r.getLong(0)} does not reconstruct")
    }
  }

  test("cdcChunks plans exactly ONE data shuffle — the doc_id hash " +
    "partitioning serves both the boundary window and the chunk " +
    "grouping (no second exchange for the (doc_id, chunk_id) agg)") {
    val plan = CleanOps.cdcChunks(
        graft.Tables.documents(spark, sf001))
      .queryExecution.executedPlan.toString()
      .split("== Initial Plan ==").head
    val exchanges = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning")).toList
    assert(exchanges.length == 1,
      s"expected 1 hash exchange, found ${exchanges.length}:\n$plan")
    assert(exchanges.head.contains("doc_id"),
      s"the single exchange is not doc_id-keyed: ${exchanges.head}")
  }

  test("q169 profiles all four columns in ONE scan of orders " +
    "(no scan-per-column fan-out)") {
    val df = run("q169_profile_report")
    df.collect()
    // AQE's toString prints the initial plan too — audit the final only
    val plan = df.queryExecution.executedPlan.toString()
      .split("== Initial Plan ==").head
    val scans = Seq("FileScan", "Scan parquet")
      .map(p => p.r.findAllIn(plan).length).max
    assert(scans == 1, s"expected 1 parquet scan, found $scans:\n$plan")
  }

  test("q175 detects the carved orphans (nonzero rates on the pruned " +
    "parents) and stays clean on the intact ones — the audit is " +
    "load-bearing, not vacuous") {
    val rows = run("q175_fk_integrity").collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(rows.size == 4)
    val (_, okOrph, okFrac) = rows("lineitem.l_orderkey->orders")
    val (_, cOrph, _) = rows("orders.o_custkey->customer")
    assert(okOrph > 0, "carved orders parent produced no orphans")
    assert(cOrph > 0, "carved customer parent produced no orphans")
    assert(rows("lineitem.l_partkey->part")._2 == 0L)
    assert(rows("lineitem.l_suppkey->supplier")._2 == 0L)
    rows.values.foreach { case (n, orph, frac) =>
      assert(math.abs(frac - orph.toDouble / n) < 1e-6)
    }
    assert(okFrac > 0.0 && okFrac < 1.0)
  }

  test("q174 flags exactly the minutes whose rounded z exceeds 3 sigma, " +
    "and the minute histogram covers every event exactly once") {
    val rows = run("q174_volume_anomaly").collect()
    rows.foreach { r =>
      assert(r.getBoolean(3) == (math.abs(r.getDouble(2)) > 3.0))
    }
    val totalEvents = rows.map(_.getInt(1).toLong).sum
    val nEvents = graft.Tables.events(spark, sf001).count()
    assert(totalEvents == nEvents,
      s"histogram covers $totalEvents of $nEvents events")
  }

  test("q170 classifies every injected doc consistently: dominant " +
    "follows the max count, and only doc_id % 5 == 0 docs carry " +
    "cyrillic characters") {
    val rows = run("q170_script_detect").collect()
    rows.foreach { r =>
      val (id, nl, nc) = (r.getLong(0), r.getInt(2), r.getInt(3))
      if (id % 5 != 0) assert(nc == 0, s"doc $id: unexpected cyrillic")
      val dom = r.getString(5)
      if (nc > nl) assert(dom == "cyrillic")
      else if (nl > 0) assert(dom == "latin")
    }
    assert(rows.exists(_.getString(5) == "cyrillic"),
      "injection produced no cyrillic-dominant docs")
  }
}
