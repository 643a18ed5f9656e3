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
}
