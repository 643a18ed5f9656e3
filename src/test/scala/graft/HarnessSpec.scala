package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the driver-contract surface consistent: every oracle names a
  * real query, and every query without an oracle is EXPLICITLY
  * declared rows-only-by-design with a pointer to its actual
  * verification — "no oracle" must never be an accident. */
class HarnessSpec extends AnyFunSuite {

  test("every oracleSql key is a queries key") {
    val dangling = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracles without a query: $dangling")
  }

  test("rowsOnlyByDesign is exactly the queries minus the oracled set") {
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(SparkEntry.rowsOnlyByDesign.keySet === noOracle,
      "a query lost its oracle without a by-design declaration (or a " +
        "declaration outlived its query): " +
        s"undeclared=${noOracle -- SparkEntry.rowsOnlyByDesign.keySet} " +
        s"stale=${SparkEntry.rowsOnlyByDesign.keySet -- noOracle}")
  }

  test("by-design reasons are substantive (name their verification site)") {
    SparkEntry.rowsOnlyByDesign.foreach { case (k, reason) =>
      assert(reason.length > 40,
        s"$k: reason must point at the spec that verifies it")
    }
  }

  /** The round-12 incident: a multi-statement SET prologue in every
    * oracle coincided with the driver's checker recording ZERO rows
    * (CORRECTNESS_r12.json = {}). The delivery contract is now: one
    * statement per oracle, full stop — robust to a checker that
    * execute()s, sql()s, statement-splits, or wraps the text. A
    * semicolon is only legal inside a quoted literal. */
  test("every oracle is exactly ONE statement (no semicolon outside " +
      "string literals)") {
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      var inS = false
      var i = 0
      while (i < sql.length) {
        sql(i) match {
          case '\'' => inS = !inS
          case ';' if !inS =>
            fail(s"$k: top-level ';' at offset $i — oracle must be a " +
              s"single statement:\n...${sql.slice(math.max(0, i - 80), i + 20)}...")
          case _ =>
        }
        i += 1
      }
      assert(!inS, s"$k: unbalanced single quotes in oracle SQL")
      val head = sql.trim.takeWhile(!_.isWhitespace).toUpperCase
      assert(head == "SELECT" || head == "WITH",
        s"$k: oracle must start with SELECT or WITH, got '$head'")
    }
  }
}
