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

  test("retime threshold schedule: 2x for light queries, 1.5x past a 5s median") {
    // Round 11 blind spot: q237 measured 1.97x its 15.4s median — 12%
    // of the bench total — and was never re-run while 15 light queries
    // were. Heavy queries (median > 5s) now retime at 1.5x.
    assert(!Bench.retimeTriggered(1.9, 1.0))   // light, under 2x
    assert(Bench.retimeTriggered(2.1, 1.0))    // light, over 2x
    assert(!Bench.retimeTriggered(9.9, 5.0))   // 5s median is still light
    assert(Bench.retimeTriggered(10.1, 5.0))
    assert(Bench.retimeTriggered(30.2, 15.4))  // the q237 case: 1.97x heavy
    assert(!Bench.retimeTriggered(22.0, 15.4)) // heavy, under 1.5x
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
