package graft

import org.scalatest.funsuite.AnyFunSuite

/** Documentation pins — drift between the docs and the code is a test
  * failure, not a round-close chore (the round-8 README counted 153 of 154
  * queries; this makes that class of drift structurally impossible). */
class DocsSpec extends AnyFunSuite {

  test("README's query count is SparkEntry.queries.size") {
    val readme = scala.io.Source.fromFile("README.md", "UTF-8").mkString
    val m = """the (\d+) driver-checked queries""".r.findFirstMatchIn(readme)
    assert(m.nonEmpty, "README.md no longer contains the query-count line")
    assert(m.get.group(1).toInt == SparkEntry.queries.size,
      s"README says ${m.get.group(1)} queries; SparkEntry has " +
        s"${SparkEntry.queries.size} — update README.md")
  }
}
