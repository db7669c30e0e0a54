package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.kernel.Clean

/** The byte-identity gate (BASELINE.md correctness gate): every committed
  * fixture page must extract to byte-identical output vs its frozen golden
  * (`src/test/resources/golden/expected/`, regenerated only via
  * GoldenGenCli after reviewed semantic changes).
  */
class GoldenSpec extends AnyFunSuite {

  private val dir = Paths.get("src/test/resources/golden")

  private val cases: Seq[(String, String)] = {
    val index = new String(Files.readAllBytes(dir.resolve("index.tsv")), "UTF-8")
    index.linesIterator.filter(_.nonEmpty).toSeq.map { line =>
      val Array(name, url) = line.split("\t")
      (name, url)
    }
  }

  test("golden corpus covers all fixture cases") {
    assert(cases.size >= 7)
  }

  cases.foreach { case (name, url) =>
    test(s"golden byte-identity: $name") {
      val inputName = if (name == "notes") "notes.txt" else s"$name.html"
      val bytes = Files.readAllBytes(dir.resolve("cases").resolve(inputName))
      val expected = new String(
        Files.readAllBytes(dir.resolve("expected").resolve(s"$name.out")), "UTF-8")
      val c = Clean.clean(url, bytes)
      val actual = s"note=${c.note}\nerror=${Option(c.error).getOrElse("")}\n---\n${c.content}"
      assert(actual == expected, s"golden mismatch for $name ($url)")
    }
  }
}
