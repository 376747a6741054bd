package graft.queries

import org.scalatest.funsuite.AnyFunSuite

/** Keeps the human-facing docs in lockstep with the real query registry —
  * the README's count is effectively GENERATED: this test derives the true
  * number from `SparkEntry.queries.size` and fails the build on drift
  * (round 8 shipped a hand-maintained "153" against 154 actual). */
class DocsSpec extends AnyFunSuite {

  test("README query count matches SparkEntry.queries") {
    val n = graft.SparkEntry.queries.size
    val readme = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")), "UTF-8")
    assert(readme.contains(s"the $n driver-checked queries"),
      s"README.md's stated query count drifted from the actual $n — " +
        "fix the graft.queries line")
  }

  test("every registered query has an oracle") {
    assert(graft.SparkEntry.oracleSql.keySet == graft.SparkEntry.queries.keySet,
      "queries without oracleSql entries: " +
        (graft.SparkEntry.queries.keySet -- graft.SparkEntry.oracleSql.keySet)
          .mkString(", "))
  }
}
