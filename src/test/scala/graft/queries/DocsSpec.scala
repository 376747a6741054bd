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

  private def xRows(file: String): Map[Int, String] = {
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(file)), "UTF-8")
    """(?m)^\| X(\d+) \|(.*)$""".r.findAllMatchIn(text)
      .map(m => m.group(1).toInt -> m.group(2)).toMap
  }

  test("X-operator inventory: SURVEY §2.9, COVERAGE, and the query registry agree") {
    val survey = xRows("SURVEY.md")
    val coverage = xRows("COVERAGE.md")
    // one row per operator in BOTH docs, same id set, contiguous from X1 —
    // a new operator must land in SURVEY, COVERAGE, and (below) a real
    // registered query atomically, or this fails
    assert(survey.keySet == coverage.keySet,
      s"SURVEY §2.9 vs COVERAGE X-row drift: only-SURVEY=" +
        s"${(survey.keySet -- coverage.keySet).toSeq.sorted.mkString(",")} " +
        s"only-COVERAGE=${(coverage.keySet -- survey.keySet).toSeq.sorted.mkString(",")}")
    val n = survey.keySet.max
    assert(survey.keySet == (1 to n).toSet,
      s"X-operator ids not contiguous 1..$n: missing " +
        s"${((1 to n).toSet -- survey.keySet).toSeq.sorted.mkString(",")}")
    // every query id a COVERAGE X-row cites must exist in the registry —
    // docs cannot claim coverage through a query that was renamed or removed
    val registered = graft.SparkEntry.queries.keySet.map(_.takeWhile(_ != '_'))
    coverage.foreach { case (x, row) =>
      """q\d+""".r.findAllIn(row).toSeq.distinct.foreach { q =>
        assert(registered.contains(q),
          s"COVERAGE X$x cites $q, which is not a registered query")
      }
    }
  }
}
