package graft

import org.scalatest.funsuite.AnyFunSuite

/** CATALOG.md is generated — this gate makes it impossible to land a new
  * declared query (or drop one) without the index following. */
class CatalogDocSpec extends AnyFunSuite {
  test("checked-in CATALOG.md matches a fresh regeneration (no drift)") {
    val path = java.nio.file.Paths.get("CATALOG.md")
    assert(java.nio.file.Files.exists(path), "CATALOG.md missing — run `sbt \"runMain graft.CatalogDoc\"`")
    val onDisk = java.nio.file.Files.readString(path)
    assert(
      onDisk == CatalogDoc.render,
      "CATALOG.md is stale — regenerate with `sbt \"runMain graft.CatalogDoc\"`"
    )
  }

  test("every declared query appears exactly once in the index") {
    val rendered = CatalogDoc.render
    SparkEntry.queries.keys.foreach { name =>
      val hits = s"\\| $name \\|".r.findAllIn(rendered).size
      assert(hits == 1, s"$name appears $hits times in CATALOG.md")
    }
  }
}
