package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** The committed INDEX.md must be exactly what IndexGen generates
  * from the current code — the regeneration test that keeps the
  * one-page query index from drifting (round-11 verdict task 8). */
class IndexSpec extends AnyFunSuite {

  private val repo = Paths.get(".").toAbsolutePath.normalize

  test("INDEX.md matches a fresh regeneration") {
    val committed = Files.readString(repo.resolve("INDEX.md"))
    val fresh = IndexGen.render(repo)
    assert(committed == fresh,
      "INDEX.md is stale — run `sbt \"runMain graft.IndexGen\"` and commit")
  }

  test("every query resolves to a real declaration site") {
    val lines = Files.readString(repo.resolve("INDEX.md")).linesIterator.toSeq
    val rows = lines.filter(_.matches("\\| q\\d.*")) // not the "| query |" header
    assert(rows.size == SparkEntry.queries.size)
    assert(!rows.exists(_.contains("| ?:0 |")), "unlocated query in index")
  }
}
