package graft

import org.scalatest.funsuite.AnyFunSuite

/** The coverage ledger (SURVEY.md §2/§5) is the document the whole
  * review process keys on — its query counts must never drift from
  * the shipped registry again (r10 shipped "190 of 201" next to a
  * 239-query registry). This spec greps every "N of M registered"
  * and "M registered queries" claim out of SURVEY.md and pins it to
  * `SparkEntry.queries` / `SparkEntry.oracleSql`: add a query, and
  * this test forces the ledger update in the same commit.
  */
class SurveyConsistencySpec extends AnyFunSuite {

  private lazy val survey =
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("SURVEY.md")),
      java.nio.charset.StandardCharsets.UTF_8)

  test("every 'N of M registered' claim in SURVEY.md matches the registry") {
    val claims = """(\d+) of (\d+) registered""".r.findAllMatchIn(survey).toList
    assert(claims.nonEmpty, "SURVEY.md no longer states its oracle-coverage ratio")
    claims.foreach { m =>
      assert(m.group(1).toInt == SparkEntry.oracleSql.size,
        s"SURVEY.md says '${m.matched}' but oracleSql has ${SparkEntry.oracleSql.size} entries")
      assert(m.group(2).toInt == SparkEntry.queries.size,
        s"SURVEY.md says '${m.matched}' but queries has ${SparkEntry.queries.size} entries")
    }
  }

  test("every 'M registered queries' count in SURVEY.md matches the registry") {
    val claims = """(\d+)\s*\n?registered queries""".r.findAllMatchIn(survey).toList
    claims.foreach { m =>
      assert(m.group(1).toInt == SparkEntry.queries.size,
        s"SURVEY.md says '${m.group(1)} registered queries' but the registry ships " +
          s"${SparkEntry.queries.size}")
    }
  }

  test("every oracle key names a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql keys with no query: $orphans")
  }
}
