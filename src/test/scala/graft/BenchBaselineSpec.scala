package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins Bench's BASELINE.md parser on the REAL committed bytes.
  *
  * Round 8's retime silently no-op'd for a whole round because the
  * C-locale JVM default charset (US-ASCII) made the default-charset
  * read throw on BASELINE.md's em-dashes and a broad catch turned the
  * exception into an empty baseline map — "no query is ever retimed"
  * with zero evidence anything was wrong. This spec fails if the parser
  * ever again returns an empty/short map on the real file, regardless
  * of what charset the JVM booted with.
  */
class BenchBaselineSpec extends AnyFunSuite {

  private val path = java.nio.file.Paths.get("BASELINE.md")

  test("parseBaseline decodes the committed BASELINE.md regardless of JVM default charset") {
    // Tripwire for the exact failure mode: the file must still contain
    // multibyte UTF-8 (em-dashes etc.) so this spec keeps exercising
    // the non-ASCII decode path; if BASELINE.md ever goes pure-ASCII
    // this assert tells us the spec lost its teeth rather than letting
    // it green-wash a regression to a default-charset read.
    val bytes = java.nio.file.Files.readAllBytes(path)
    assert(bytes.exists(b => (b & 0x80) != 0),
      "BASELINE.md is pure ASCII; this spec no longer exercises the multibyte decode path")

    val m = Bench.parseBaseline(path)
    assert(m.size >= 204, s"expected >=204 baseline rows, parsed ${m.size}")
    // Spot-check a known row and the registry linkage: every baseline
    // key should name a registered query (drift = a renamed query whose
    // retime threshold silently stops applying).
    assert(m.get("q13_mean_update").exists(v => v > 0.0 && v < 60.0))
    val unknown = m.keySet -- SparkEntry.queries.keySet
    assert(unknown.isEmpty, s"baseline rows naming no registered query: $unknown")
  }

  test("retime threshold schedule: 2x for light queries, 1.5x past a 2.5s median") {
    // Round 11 blind spot: q237 measured 1.97x its 15.4s median — 12%
    // of the bench total — and was never re-run while 15 light queries
    // were. Round 12 repeated the shape a notch down: q153 at 1.97x of
    // a 4.91s median sat below the old 5s heavy leg. The heavy leg now
    // starts at 2.5s.
    assert(!Bench.retimeTriggered(1.9, 1.0))   // light, under 2x
    assert(Bench.retimeTriggered(2.1, 1.0))    // light, over 2x
    assert(!Bench.retimeTriggered(4.9, 2.5))   // 2.5s median is still light
    assert(Bench.retimeTriggered(5.1, 2.5))
    assert(Bench.retimeTriggered(9.69, 4.91))  // the q153 case: 1.97x heavy
    assert(!Bench.retimeTriggered(3.8, 2.6))   // heavy, under 1.5x
    assert(Bench.retimeTriggered(4.0, 2.6))    // heavy, over 1.5x
    assert(Bench.retimeTriggered(30.2, 15.4))  // the q237 case still trips
  }

  test("the slot-drift probe row exists in BASELINE.md and surfaces " +
    "in the artifact beside its ratio") {
    // VERDICT r12: the 1.31x machine-profile spread between bench slots
    // consumed most of the 2x headroom and had to be diagnosed by
    // per-query diffing. The probe (q01+q07+q350 triple, timed after
    // warmup) turns that into one mechanical ratio in the artifact.
    val base = Bench.parseProbeBaseline(path)
    assert(base.exists(v => v > 0.0 && v < 60.0),
      s"BASELINE.md lacks a parseable | probe | sec | row: $base")
    // the probe row must NOT leak into the per-query retime map
    assert(!Bench.parseBaseline(path).contains("probe"))
    val line = Bench.artifactJson(Seq("q01_scan_project" -> 1.0),
      Nil, Nil, 204, "sf", probeSec = Some(1.3), probeBaseline = Some(1.0))
    assert(line.contains("\"probe_sec\":1.30"), line)
    assert(line.contains("\"probe_baseline\":1.00"), line)
    assert(line.contains("\"probe_ratio\":1.30"), line)
    // probe failure degrades to absence, never a broken artifact line
    val noProbe = Bench.artifactJson(Seq("q01_scan_project" -> 1.0),
      Nil, Nil, 204, "sf")
    assert(!noProbe.contains("probe_sec"), noProbe)
  }

  test("partial-total line: <200 bytes, carries the partial marker, " +
    "and the artifact's partial flag round-trips") {
    // BENCH_r13 arrived rc:124/parsed:null because the single parseable
    // stdout line printed only after all 363 queries. The survivability
    // contract: every ~20 queries (and from the shutdown hook) Bench
    // prints a partial running-total line small enough that the
    // freshest always sits inside the harness's ~2.4KB stdout tail, and
    // bench_queries.json is rewritten after every query with
    // "partial":true until the final post-loop write drops it.
    val pl = Bench.partialLine(123.45, 340, 363, "/root/testdata/sf0.1")
    assert(pl.getBytes("UTF-8").length < 200, s"partial line too long: $pl")
    assert(pl.contains("\"metric\":\"total\""), pl)
    assert(pl.contains("\"value\":123.45"), pl)
    assert(pl.contains("\"partial\":true"), pl)
    assert(pl.contains("\"done\":340"), pl)
    assert(pl.contains("\"of\":363"), pl)
    val art = Bench.artifactJson(Seq("q01_scan_project" -> 1.0),
      Nil, Nil, 204, "sf", partial = true)
    assert(art.contains("\"partial\":true"), art)
    val fin = Bench.artifactJson(Seq("q01_scan_project" -> 1.0),
      Nil, Nil, 204, "sf", partial = false)
    assert(!fin.contains("partial"), fin)
  }

  test("probe-aware retime budget: slowness retimes disabled past " +
    "probe_ratio 1.3; probe_ratio never emitted for a zero baseline") {
    // VERDICT r13 #8: on a uniformly drifted slot every slowness retime
    // re-measures ambient noise (~30s of wall budget across 33 retimes
    // on the 391s run). The gate is pure so the rule is pinned here.
    assert(Bench.retimeEnabled(None))            // no probe → retime as usual
    assert(Bench.retimeEnabled(Some(1.0)))
    assert(Bench.retimeEnabled(Some(1.3)))       // boundary stays enabled
    assert(!Bench.retimeEnabled(Some(1.31)))
    assert(!Bench.retimeEnabled(Some(3.9)))      // the observed startup spike
    // ADVICE r13: a 0.00 probe row in BASELINE.md must not emit
    // "probe_ratio":Infinity (invalid JSON) — the baseline is gated b>0.
    val line = Bench.artifactJson(Seq("q01_scan_project" -> 1.0),
      Nil, Nil, 204, "sf", probeSec = Some(1.3), probeBaseline = Some(0.0))
    assert(line.contains("\"probe_sec\":1.30"), line)
    assert(!line.contains("probe_ratio"), line)
    assert(!line.contains("Infinity"), line)
  }

  test("parseBaseline returns empty for an absent file") {
    assert(Bench.parseBaseline(java.nio.file.Paths.get("no_such_baseline.md")).isEmpty)
  }

  test("a failed query surfaces in the artifact's failed list") {
    // Round 9: q196 crashed DIVIDE_BY_ZERO at the bench SF and the
    // catch-all recorded it as a quiet 0.63s pass in two independent
    // runs. The artifact line is now a pure function, so the contract
    // — every failed name appears under "failed", short-keyed like the
    // other lists — is pinned here instead of trusted.
    val line = Bench.artifactJson(
      results = Seq("q01_scan_project" -> 1.0, "q196_stream_reservoir" -> 0.5),
      retimed = Seq("q196_stream_reservoir"),
      failed = Seq("q196_stream_reservoir"),
      baselineRows = 204, sfDir = "/root/testdata/sf0.1")
    assert(line.contains("\"failed\":[\"q196\"]"), line)
    assert(line.contains("\"retimed\":[\"q196\"]"), line)
    // total = Σ(successful query times) ONLY: the crashed query's
    // time-to-throw (usually milliseconds) must not deflate the total —
    // here q196's 0.5s is excluded and the total is q01's 1.0s alone.
    // The failed query still appears in the per-query map (diagnostic).
    assert(line.contains("\"value\":1.00"), line)
    assert(line.contains("\"q196\":0.50"), line)
    // and a clean run emits the empty list, not a missing key
    val clean = Bench.artifactJson(Seq("q01_scan_project" -> 1.0),
      Nil, Nil, 204, "sf")
    assert(clean.contains("\"failed\":[]"), clean)
    assert(clean.contains("\"value\":1.00"), clean)
  }
}
