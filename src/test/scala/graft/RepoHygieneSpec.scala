package graft

import java.io.File

import org.scalatest.funsuite.AnyFunSuite

/** Guards against sbt build-cache droppings under the test resources
  * (VERDICT r05 task 6): an accidental `sbt` launch from a fixture
  * directory leaves `target/` + `project/` caches (with resolver URLs)
  * that pollute working-tree scans even when gitignored.
  */
class RepoHygieneSpec extends AnyFunSuite {

  private def offenders(root: File): Seq[String] = {
    def walk(f: File): Seq[File] =
      if (!f.isDirectory) Nil
      else f.listFiles().toSeq.flatMap(c => c +: walk(c))
    walk(root)
      .filter(f => f.isDirectory && (f.getName == "target" || f.getName == "project"))
      .map(_.getPath)
  }

  test("no sbt target/project directories under src/test/resources") {
    val root = new File("src/test/resources")
    assert(root.isDirectory)
    assert(offenders(root).isEmpty,
      s"sbt droppings present: ${offenders(root).mkString(", ")}")
  }
}
