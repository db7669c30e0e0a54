package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench artifact format the DRIVER depends on (VERDICT r03
  * task 1): the JSON line must parse, and `gate_summary` — carrying the
  * headline and the scaling-gate verdict — must be the LAST top-level
  * key, because the driver captures only a 2,000-char TAIL of the line
  * (r03's artifact lost its headline to exactly this: `value` was
  * emitted first and truncated away).
  */
class BenchFormatSpec extends AnyFunSuite {

  /** Renders with fixture State, restoring every touched field afterwards
    * so later suites in the same JVM never observe the fixture values
    * (ADVICE r04: the shared singleton is cross-test-contamination bait).
    */
  private def render(partial: Boolean): String = {
    val st = Bench.State
    val (sfDir0, headline0, queries0, runs0, legs0, errs0) =
      (st.sfDir, st.headline, st.queries, st.queryRuns, st.headlineLegSecs,
        st.headlineErroredLegs)
    try {
      st.sfDir = "/root/testdata/sf0.1"
      st.headline = Some((20000L, 1.25, 360000000L))
      st.headlineLegSecs = Vector(1.40, 1.25, 1.31)
      st.headlineErroredLegs = 2 // capped-out resample retries leave a trace
      st.queries = Seq("q_ok" -> Right(0.5), "q_bad" -> Left("boom: \"quoted\"\nline"))
      st.queryRuns = Seq(
        "t13_dedup_pipeline" -> Vector(5.1, 4.9, 5.6),
        "t6_minhash_lsh" -> Vector(1.5, 1.7, 1.6),
        "t8_ngram_jaccard" -> Vector()) // errored sampled query (ADVICE r05)
      st.toJson(partial)
    } finally {
      st.sfDir = sfDir0; st.headline = headline0
      st.queries = queries0; st.queryRuns = runs0; st.headlineLegSecs = legs0
      st.headlineErroredLegs = errs0
    }
  }

  test("bench JSON line parses and escapes control chars in errors") {
    val json = render(partial = true)
    val parsed = org.json4s.jackson.JsonMethods.parse(json) // throws on bad JSON
    val fields = parsed.asInstanceOf[org.json4s.JObject].obj.map(_._1)
    assert(fields.contains("gate_summary") && fields.contains("extract") &&
      fields.contains("scaling_executors"))
    assert(!json.contains("\n"), "the artifact must be ONE line")
  }

  test("gate_summary is the LAST key — the 2,000-char tail carries the gate") {
    for (partial <- Seq(true, false)) {
      val json = render(partial)
      val fields = org.json4s.jackson.JsonMethods.parse(json)
        .asInstanceOf[org.json4s.JObject].obj.map(_._1)
      assert(fields.last == "gate_summary",
        s"gate_summary must be the final top-level key, got ${fields.last}")
      val tail = json.takeRight(2000)
      assert(tail.contains("\"headline_docs_per_sec\""), "headline lost from tail")
      assert(tail.contains("\"exec_gate_pass\""), "gate verdict lost from tail")
      assert(tail.contains("\"thread_best_eff\""), "thread evidence lost from tail")
      assert(tail.contains("\"thread_role\""), "thread role label lost from tail")
      assert(tail.contains("\"headline_window\""), "headline window label lost from tail")
      assert(tail.contains("\"headline_attempts\":5"),
        "headline attempts must count errored resample legs too (3 ok + 2 errored)")
    }
  }

  test("headline window label: no exec reference in fixture -> no_reference") {
    val parsed = org.json4s.jackson.JsonMethods.parse(render(partial = false))
    assert((parsed \ "gate_summary" \ "headline_window") ==
      org.json4s.JString("no_reference"))
    // every headline leg is reported, not just the best
    assert((parsed \ "extract" \ "leg_secs") ==
      org.json4s.JArray(List(1.40, 1.25, 1.31).map(org.json4s.JDouble)))
  }

  test("an errored sampled query (empty runs) never breaks the artifact (ADVICE r05)") {
    val parsed = org.json4s.jackson.JsonMethods.parse(render(partial = false))
    val stats = (parsed \ "query_stats").asInstanceOf[org.json4s.JObject].obj.map(_._1)
    assert(!stats.contains("t8_ngram_jaccard"), "empty runs vector must be filtered")
    assert(stats.contains("t13_dedup_pipeline"))
  }

  test("query_stats blocks: median/min/max per sampled query") {
    val parsed = org.json4s.jackson.JsonMethods.parse(render(partial = false))
    val t13 = (parsed \ "query_stats" \ "t13_dedup_pipeline")
      .asInstanceOf[org.json4s.JObject].obj.toMap
    assert(t13.keySet == Set("runs", "median", "min", "max"))
    assert(t13("median") == org.json4s.JDouble(5.1))
    assert(t13("min") == org.json4s.JDouble(4.9))
    assert(t13("max") == org.json4s.JDouble(5.6))
    val t6 = (parsed \ "query_stats" \ "t6_minhash_lsh")
      .asInstanceOf[org.json4s.JObject].obj.toMap
    assert(t6("median") == org.json4s.JDouble(1.6))
  }

  test("thread_role labels a sub-gate thread median as calibration_only") {
    // the fixture State has no thread pairs at all → median -1 → the
    // artifact must carry the calibration label, never a bare sub-gate
    // number (VERDICT r04 task 5)
    val parsed = org.json4s.jackson.JsonMethods.parse(render(partial = false))
    val role = (parsed \ "gate_summary" \ "thread_role")
    assert(role == org.json4s.JString("calibration_only"))
  }
}
