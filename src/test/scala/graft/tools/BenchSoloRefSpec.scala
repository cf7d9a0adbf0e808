package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** The bench's contamination check is only as good as its ref parse:
  * r6's literal `"sf":"..."` match silently no-opped against the
  * python-json.dump-written ref (spaces after colons), so no bench run
  * ever flagged anything. Pin the parser against BOTH spellings and
  * the per-SF candidate discovery. */
class BenchSoloRefSpec extends AnyFunSuite {
  import graft.Bench.{parseSoloRef, soloRefCandidates}

  private val compact =
    """{"metric":"solo_ref","value":3.5,"unit":"sec","queries":{"q1_agg":0.5,"x_tfidf":3.0},"failed":0,"sf":"/root/testdata/sf0.1"}"""
  private val spaced = // exactly what python json.dump(default) writes
    """{"metric": "solo_ref", "value": 3.5, "unit": "sec", "queries": {"q1_agg": 0.5, "x_tfidf": 3.0}, "failed": 0, "sf": "/root/testdata/sf0.1"}"""

  test("parses both compact (Bench-written) and spaced (json.dump-written) refs") {
    for (txt <- Seq(compact, spaced)) {
      val ref = parseSoloRef(txt, "/root/testdata/sf0.1")
      assert(ref == Map("q1_agg" -> 0.5, "x_tfidf" -> 3.0), txt)
    }
  }

  test("a ref for another scale factor contributes nothing") {
    assert(parseSoloRef(compact, "testdata/sf1") == Map.empty)
    assert(parseSoloRef(spaced, "testdata/sf1") == Map.empty)
  }

  test("relative and absolute spellings of the same sf dir match") {
    // refs record the sbt-cwd-relative path; callers may pass absolute
    val rel = compact.replace("/root/testdata/sf0.1", "testdata/sf1")
    val abs = new java.io.File("testdata/sf1").getCanonicalPath
    assert(parseSoloRef(rel, abs) == Map("q1_agg" -> 0.5, "x_tfidf" -> 3.0))
    assert(parseSoloRef(compact, "/root/testdata/sf0.1").nonEmpty)
  }

  test("malformed / empty refs parse to empty, never throw") {
    for (txt <- Seq("", "{}", """{"sf": "/root/testdata/sf0.1"}""",
        """{"sf": "/root/testdata/sf0.1", "queries": 3}""",
        """not json at all"""))
      assert(parseSoloRef(txt, "/root/testdata/sf0.1") == Map.empty, txt)
  }

  test("scientific-notation and negative times parse") {
    val txt = """{"queries": {"a": 1.5e-2, "b": -1.0}, "sf": "x"}"""
    assert(parseSoloRef(txt, "x") == Map("a" -> 0.015, "b" -> -1.0))
  }

  test("explicit SPARK_GRAFT_SOLO_REF wins; default scans BENCH_SOLO_REF*.json") {
    assert(soloRefCandidates(Some("/tmp/custom.json")) == Seq("/tmp/custom.json"))
    // run from the repo root, where BENCH_SOLO_REF.json is committed
    val defaults = soloRefCandidates(None)
    assert(defaults.contains("BENCH_SOLO_REF.json"), defaults.toString)
    assert(defaults.forall(n => n.startsWith("BENCH_SOLO_REF") && n.endsWith(".json")))
  }

  test("boxCoefficient: median of canary ratios, clamped at 1.0, 1.0 when empty") {
    import graft.Bench.boxCoefficient
    assert(boxCoefficient(Seq.empty) == 1.0)
    assert(boxCoefficient(Seq(1.3)) == 1.3)
    // even count -> mean of middle two (order-insensitive)
    assert(math.abs(boxCoefficient(Seq(2.0, 1.0, 1.4, 1.8)) - 1.6) < 1e-12)
    // odd count -> middle
    assert(boxCoefficient(Seq(2.6, 1.2, 1.9)) == 1.9)
    // sub-floor canaries (ratio < 1) never deflate: clamp at 1.0
    assert(boxCoefficient(Seq(0.8, 0.9, 0.95)) == 1.0)
  }

  test("end-to-end: a tool-written ref file round-trips through the parser") {
    // simulate tools/update_solo_ref.py output (compact separators)
    val f = java.nio.file.Files.createTempFile("solo_ref", ".json")
    java.nio.file.Files.writeString(f, compact)
    val ref = parseSoloRef(java.nio.file.Files.readString(f), "/root/testdata/sf0.1")
    assert(ref.nonEmpty && ref("x_tfidf") == 3.0)
    java.nio.file.Files.delete(f)
  }
}
