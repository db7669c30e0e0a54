package graft.spark

import java.nio.file.{Files, Paths}

import graft.kernel.Clean

/** Materializes the authored GoldenCases registry into the golden corpus:
  * writes `cases/<name>.html` (or .bin for binary fixtures), merges
  * `index.tsv` (hand-authored legacy entries are preserved), regenerates
  * `expected/<name>.out` for EVERY index entry via the kernel, and checks
  * each registry case's mustContain/mustNotContain markers, printing a
  * PASS/FAIL report.
  *
  *   GoldenCasesGenCli <goldenDir>   # src/test/resources/golden
  *
  * Run deliberately after a reviewed semantic change; diff before commit.
  */
object GoldenCasesGenCli {

  def inputFileFor(dir: java.nio.file.Path, name: String): java.nio.file.Path =
    Seq(s"$name.html", s"$name.txt", s"$name.bin")
      .map(dir.resolve("cases").resolve(_))
      .find(Files.exists(_))
      .getOrElse(sys.error(s"no case input file for $name"))

  def main(args: Array[String]): Unit = {
    val dir = Paths.get(args(0))

    // 1. write case files from the registry
    GoldenCases.all.foreach { g =>
      val ext = if (g.name == "degen_garbage") "bin" else "html"
      Files.write(dir.resolve("cases").resolve(s"${g.name}.$ext"), g.bytes)
    }

    // 2. merge index.tsv: keep non-registry entries, append registry
    val indexPath = dir.resolve("index.tsv")
    val legacy = new String(Files.readAllBytes(indexPath), "UTF-8")
      .linesIterator.filter(_.nonEmpty)
      .map { l => val Array(n, u) = l.split("\t"); (n, u) }
      .filterNot { case (n, _) => GoldenCases.byName.contains(n) }
      .toSeq
    val merged = legacy ++ GoldenCases.all.map(g => (g.name, g.url))
    Files.write(indexPath,
      merged.map { case (n, u) => s"$n\t$u" }.mkString("", "\n", "\n").getBytes("UTF-8"))

    // 3. regenerate expected outputs + check markers
    var fails = 0
    merged.foreach { case (name, url) =>
      val bytes = Files.readAllBytes(inputFileFor(dir, name))
      val c = Clean.clean(url, bytes)
      val out = s"note=${c.note}\nerror=${Option(c.error).getOrElse("")}\n---\n${c.content}"
      Files.write(dir.resolve("expected").resolve(s"$name.out"), out.getBytes("UTF-8"))
      val g = GoldenCases.byName.get(name)
      val missing = g.toSeq.flatMap(_.mustContain).filterNot(out.contains)
      val leaked = g.toSeq.flatMap(_.mustNotContain).filter(out.contains)
      if (missing.nonEmpty || leaked.nonEmpty) {
        fails += 1
        println(s"FAIL $name: missing=${missing.mkString("[", "|", "]")} leaked=${leaked.mkString("[", "|", "]")}")
      } else {
        println(s"ok   $name (${Option(c.content).map(_.length).getOrElse(0)} chars, note=${c.note})")
      }
    }
    println(s"cases=${merged.size} failures=$fails")
    if (fails > 0) sys.exit(1)
  }
}
