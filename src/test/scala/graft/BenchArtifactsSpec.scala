package graft

import org.scalatest.funsuite.AnyFunSuite

/** The previous-artifact parser behind Bench's estimate seeding, CV/gate
  * adjudication, skip rotation, and loaded-box estimate decay — pinned
  * against the three shapes it meets in the wild, including the r14
  * failure shape (front-truncated wrapped tail) that the regex fallback
  * exists for. Runs with no Spark session.
  */
class BenchArtifactsSpec extends AnyFunSuite {

  private val sf = "/root/testdata/sf0.1"

  private val detailLine =
    s"""{"metric":"detail","sf":"$sf","runs_per_query":3,""" +
      """"probe_secs":{"cv_ingest":3.1,"gate_scale_exact":74.4}}"""
  private val summaryLine =
    s"""{"metric":"summary","value":24.7,"unit":"sec","n_queries":118,""" +
      s""""sf":"$sf","loaded_box":true,""" +
      """"probes_skipped":"gate_sharded_cosine","cv_ingest_events_per_sec":72231,""" +
      """"gate_pushdown_100k_ev_s":107016,""" +
      """"cv_large_state_sec":1.384,"cv_soak_events_per_sec":93617}"""

  test("raw two-line artifact: last detail+summary pair merged, summary wins") {
    val raw = Seq(
      """{"metric":"summary","value":99.0,"sf":"/wrong/sf"}""", // stale emission
      detailLine, summaryLine).mkString("\n")
    val p = BenchArtifacts.parseArtifact(raw, sf)
    assert(p.probeSecs === Map("cv_ingest" -> 3.1, "gate_scale_exact" -> 74.4))
    assert(p.bench === Map("cv_ingest_events_per_sec" -> 72231.0,
      "cv_large_state_sec" -> 1.384, "cv_soak_events_per_sec" -> 93617.0,
      "gate_pushdown_100k_ev_s" -> 107016.0))
    assert(p.skipped === Set("gate_sharded_cosine"),
      "last round's budget victims must surface for priority ordering")
    assert(p.loadedBox, "the contamination flag must carry over")
  }

  test("a quiet run with no skips parses to empty skip set, loadedBox false") {
    val quiet = summaryLine
      .replace(""""loaded_box":true""", """"loaded_box":false""")
      .replace(""""probes_skipped":"gate_sharded_cosine"""",
        """"probes_skipped":""""")
    val p = BenchArtifacts.parseArtifact(detailLine + "\n" + quiet, sf)
    assert(p.skipped.isEmpty && !p.loadedBox)
  }

  test("driver-wrapped artifact: parse runs on the DECODED tail") {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val tail = "...front noise...\n" + detailLine + "\n" + summaryLine
    val wrapped = s"""{"n":15,"rc":0,"tail":${om.writeValueAsString(tail)}}"""
    val p = BenchArtifacts.parseArtifact(wrapped, sf)
    assert(p.probeSecs("gate_scale_exact") === 74.4)
    assert(p.bench("cv_soak_events_per_sec") === 93617.0)
    assert(p.skipped === Set("gate_sharded_cosine") && p.loadedBox)
  }

  test("front-truncated wrapped tail (the r14 shape): regex fallback recovers probe_secs") {
    // the summary line's START fell outside the tail window — no line
    // begins with {"metric", but the probe_secs object is intact
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val tail = s""""sf":"$sf","loaded_box":true,""" +
      """"probes_skipped":"gate_soak_ttl,neardup_batch_10x",""" +
      """"probe_secs":{"cv_ingest":3.908,"gate_scale_simhash":322.823},""" +
      """"cv_ingest_events_per_sec":43679,"quiet_recheck":{"skipped_budget":true}}"""
    val wrapped = s"""{"n":14,"rc":0,"tail":${om.writeValueAsString(tail)}}"""
    val p = BenchArtifacts.parseArtifact(wrapped, sf)
    assert(p.probeSecs === Map("cv_ingest" -> 3.908, "gate_scale_simhash" -> 322.823))
    assert(p.bench === Map("cv_ingest_events_per_sec" -> 43679.0))
    assert(p.skipped === Set("gate_soak_ttl", "neardup_batch_10x"))
    assert(p.loadedBox)
  }

  test("an artifact at a DIFFERENT scale factor is ignored entirely") {
    val raw = detailLine + "\n" + summaryLine
    val p = BenchArtifacts.parseArtifact(raw, "/root/testdata/sf0.001")
    assert(p === BenchArtifacts.Empty,
      "an sf0.1 artifact must not seed an sf0.001 run")
  }

  test("garbage and empty content yield the Empty parse, never a throw") {
    assert(BenchArtifacts.parseArtifact("", sf) === BenchArtifacts.Empty)
    assert(BenchArtifacts.parseArtifact("not json at all", sf)
      === BenchArtifacts.Empty)
    assert(BenchArtifacts.parseArtifact("""{"n":1,"rc":124,"tail":""}""", sf)
      === BenchArtifacts.Empty)
  }

  test("parsePrev picks the NEWEST BENCH_r file in the directory") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bart").toFile
    java.nio.file.Files.writeString(dir.toPath.resolve("BENCH_r9.json"),
      s"""{"metric":"summary","sf":"$sf","probe_secs":{"old":1.0}}""")
    java.nio.file.Files.writeString(dir.toPath.resolve("BENCH_r10.json"),
      s"""{"metric":"summary","sf":"$sf","probe_secs":{"new":2.0}}""")
    assert(BenchArtifacts.parsePrev(dir, sf).probeSecs === Map("new" -> 2.0),
      "r10 must shadow r9")
  }
}
