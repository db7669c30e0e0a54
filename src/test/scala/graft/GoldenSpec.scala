package graft

import java.nio.file.{Files, Path, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.kernel.Clean
import graft.spark.GoldenCases

/** The byte-identity gate (BASELINE.md correctness gate): every committed
  * fixture page must extract to byte-identical output vs its frozen golden
  * (`src/test/resources/golden/expected/`, regenerated only via
  * GoldenCasesGenCli after reviewed semantic changes). Registry cases
  * (GoldenCases) additionally assert their semantic intent markers, so a
  * regenerated-but-wrong golden cannot silently pass.
  */
class GoldenSpec extends AnyFunSuite {

  private val dir = Paths.get("src/test/resources/golden")

  private def inputFileFor(name: String): Path =
    Seq(s"$name.html", s"$name.txt", s"$name.bin")
      .map(dir.resolve("cases").resolve(_))
      .find(Files.exists(_))
      .getOrElse(fail(s"no case input file for $name"))

  private val cases: Seq[(String, String)] = {
    val index = new String(Files.readAllBytes(dir.resolve("index.tsv")), "UTF-8")
    index.linesIterator.filter(_.nonEmpty).toSeq.map { line =>
      val Array(name, url) = line.split("\t")
      (name, url)
    }
  }

  test("golden corpus is wide: ≥40 committed cases across all suites") {
    assert(cases.size >= 40, s"only ${cases.size} golden cases")
    val names = cases.map(_._1)
    for (suite <- Seq("points_", "strip_", "munge_", "route_", "degen_"))
      assert(names.exists(_.startsWith(suite)), s"no $suite cases")
  }

  test("registry cases are all materialized in the corpus") {
    val names = cases.map(_._1).toSet
    val missing = GoldenCases.all.map(_.name).filterNot(names.contains)
    assert(missing.isEmpty, s"registry cases not in index.tsv: $missing")
  }

  cases.foreach { case (name, url) =>
    test(s"golden byte-identity: $name") {
      val bytes = Files.readAllBytes(inputFileFor(name))
      val expected = new String(
        Files.readAllBytes(dir.resolve("expected").resolve(s"$name.out")), "UTF-8")
      val c = Clean.clean(url, bytes)
      val actual = s"note=${c.note}\nerror=${Option(c.error).getOrElse("")}\n---\n${c.content}"
      assert(actual == expected, s"golden mismatch for $name ($url)")
      GoldenCases.byName.get(name).foreach { g =>
        g.mustContain.foreach(m =>
          assert(actual.contains(m), s"$name missing marker '$m'"))
        g.mustNotContain.foreach(m =>
          assert(!actual.contains(m), s"$name leaked marker '$m'"))
      }
    }
  }
}
