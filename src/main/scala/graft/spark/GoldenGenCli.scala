package graft.spark

import java.nio.file.{Files, Paths}

import graft.kernel.Clean

/** Regenerates the golden expected outputs from the committed fixture
  * inputs (SURVEY.md §5.2.1: the reference ships no fixtures, so goldens
  * are frozen outputs of the reviewed kernel; GoldenSpec gates
  * byte-identity against them thereafter).
  *
  *   GoldenGenCli <goldenDir>   # e.g. src/test/resources/golden
  *
  * Only run deliberately, after a reviewed semantic change; diff the
  * result before committing.
  */
object GoldenGenCli {
  def main(args: Array[String]): Unit = {
    val dir = Paths.get(args(0))
    val index = new String(Files.readAllBytes(dir.resolve("index.tsv")), "UTF-8")
    index.linesIterator.filter(_.nonEmpty).foreach { line =>
      val Array(name, url) = line.split("\t")
      val bytes = Files.readAllBytes(GoldenCasesGenCli.inputFileFor(dir, name))
      val c = Clean.clean(url, bytes)
      val out = s"note=${c.note}\nerror=${Option(c.error).getOrElse("")}\n---\n${c.content}"
      Files.write(dir.resolve("expected").resolve(s"$name.out"),
        out.getBytes("UTF-8"))
      println(s"wrote $name.out (${Option(c.content).map(_.length).getOrElse(0)} chars, note=${c.note})")
    }
  }
}
