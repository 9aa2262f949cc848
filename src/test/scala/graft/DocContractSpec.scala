package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Documentation-contract gate: every `qNNN` a scaladoc or comment in
  * src/main names must be a REGISTERED query. Round 9 shipped scaladocs
  * asserting "the q152/q153/q154 oracle gates this unit" while the
  * registry stopped at q151 — a reader auditing correctness claims from
  * the docs was actively misled. This spec makes that class of dangling
  * contract a compile-adjacent failure.
  */
class DocContractSpec extends AnyFunSuite {

  test("every qNNN referenced in src/main names a registered query") {
    val registered = SparkEntry.registry
      .map(_.name.takeWhile(_ != '_')).toSet
    val re = "\\bq(\\d{2,3})\\b".r
    val root = java.nio.file.Paths.get("src/main/scala")
    assert(java.nio.file.Files.isDirectory(root),
      s"expected to run from the repo root, cwd=${System.getProperty("user.dir")}")
    val dangling = scala.util.Using.resource(
        java.nio.file.Files.walk(root)) { stream =>
      stream.iterator().asScala
        .filter(_.toString.endsWith(".scala"))
        .flatMap { p =>
          val lines = java.nio.file.Files.readAllLines(p).asScala
          lines.zipWithIndex.flatMap { case (line, i) =>
            re.findAllMatchIn(line).map(m => (s"$p:${i + 1}", m.matched))
          }
        }
        .filterNot { case (_, tok) => registered.contains(tok) }
        .toVector
    }
    assert(dangling.isEmpty,
      "docs reference unregistered queries:\n" +
        dangling.map { case (loc, tok) => s"  $tok at $loc" }
          .mkString("\n"))
  }

  test("registry names are unique and every query has a distinct prefix") {
    val names = SparkEntry.registry.map(_.name)
    assert(names.distinct.size == names.size, "duplicate query names")
    val prefixes = names.map(_.takeWhile(_ != '_'))
    assert(prefixes.distinct.size == prefixes.size,
      "two queries share a qNNN prefix — oracle rows would collide")
  }
}
