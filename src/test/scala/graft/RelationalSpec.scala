package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import graft.functions.Exact._

/** Hand-checkable unit tests on the reference's own micro-datasets
  * (FIXTURES.md §1: employees/transactions,
  * examples/create_deltalake_hdfs.py:35-82) — the flagship left-join
  * semantics, null-path counting, and CASE banding verified against
  * values computed by hand. */
class RelationalSpec extends SparkSpec {
  import spark.implicits._

  // reference employees (examples/create_deltalake_hdfs.py:35-46)
  private lazy val employees = Seq(
    (1, "Alice Johnson", 28, "Engineering", 85000.0, "New York"),
    (2, "Bob Smith", 34, "Marketing", 72000.0, "San Francisco"),
    (3, "Carol Davis", 29, "Engineering", 92000.0, "Seattle"),
    (4, "David Wilson", 41, "Sales", 68000.0, "Chicago"),
    (5, "Eva Brown", 26, "Engineering", 78000.0, "Austin"),
    (6, "Frank Miller", 38, "Marketing", 75000.0, "Boston"),
    (7, "Grace Lee", 31, "Sales", 71000.0, "Denver"),
    (8, "Henry Taylor", 45, "HR", 65000.0, "Miami"),
    (9, "Ivy Chen", 27, "Engineering", 88000.0, "Portland"),
    (10, "Jack Anderson", 33, "HR", 69000.0, "Phoenix"),
  ).toDF("id", "name", "age", "department", "salary", "city")

  // reference transactions (examples/create_deltalake_hdfs.py:63-73):
  // employee ids 8, 9, 10 have NO transactions — the left-join null path
  private lazy val transactions = Seq(
    (1, 1, 1200.50, "2024-01-15", "expense"),
    (2, 1, 2500.00, "2024-01-20", "bonus"),
    (3, 2, 800.75, "2024-01-18", "expense"),
    (4, 3, 3200.00, "2024-01-22", "bonus"),
    (5, 4, 950.25, "2024-01-19", "expense"),
    (6, 5, 1800.00, "2024-01-25", "bonus"),
    (7, 6, 675.50, "2024-01-21", "expense"),
    (8, 7, 1100.00, "2024-01-23", "expense"),
    (9, 2, 2100.00, "2024-01-26", "bonus"),
    (10, 3, 775.25, "2024-01-24", "expense"),
  ).toDF("transaction_id", "employee_id", "amount", "date", "type")

  test("flagship left join preserves employees with no transactions") {
    val out = employees.as("e")
      .join(transactions.as("t"), $"e.id" === $"t.employee_id", "left_outer")
      .groupBy($"e.id", $"e.name")
      .agg(count($"t.transaction_id").as("tx_count"),
        moneySum0($"t.amount").as("total"))
      .orderBy($"e.id")
      .collect()
    assert(out.length === 10) // all 10 employees survive
    val byId = out.map(r => r.getInt(0) -> r).toMap
    assert(byId(1).getLong(2) === 2 && byId(1).getDouble(3) === 3700.50)
    assert(byId(8).getLong(2) === 0 && byId(8).getDouble(3) === 0.0) // null path
    assert(byId(3).getDouble(3) === 3975.25)
  }

  test("COUNT(col) skips nulls while COUNT(*) does not") {
    val joined = employees.as("e")
      .join(transactions.as("t"), $"e.id" === $"t.employee_id", "left_outer")
    val r = joined.agg(
      count(lit(1)).as("rows"),
      count($"t.transaction_id").as("txs")).head()
    assert(r.getLong(0) === 13) // 7 employees with 10 txs + 3 null rows
    assert(r.getLong(1) === 10)
  }

  test("department aggregate matches hand computation") {
    val r = employees.groupBy("department")
      .agg(count(lit(1)).as("n"), moneyAvg($"salary").as("avg_salary"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(r("Engineering") === ((4L, (85000.0 + 92000.0 + 78000.0 + 88000.0) / 4)))
    assert(r("HR") === ((2L, 67000.0)))
  }

  test("CASE WHEN salary banding (test_hdfs_inside_container.py:71-75)") {
    val bands = employees.select($"name",
      when($"salary" > 80000, "High").otherwise("Standard").as("band"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(bands("Alice Johnson") === "High")
    assert(bands("Eva Brown") === "Standard")
    assert(bands.values.count(_ == "High") === 3)
  }

  test("HAVING-equivalent post-agg filter") {
    val depts = employees.groupBy("department").agg(count(lit(1)).as("n"))
      .filter($"n" > 2).collect()
    assert(depts.map(_.getString(0)).toSet === Set("Engineering"))
  }

  test("percentile_approx tracks the exact percentile (q92 bound)") {
    // The approx sketch must land within the data's spread of the
    // exact percentile — the operator is wired correctly if so (the
    // reference uses PERCENTILE_APPROX(salary, 0.5),
    // examples/example_lakesail_kerberos.py:223).
    Tables.registerAll(spark, sf)
    val rows = spark.sql(
      """SELECT c_mktsegment,
        |  PERCENTILE_APPROX(c_acctbal, 0.5) AS approx,
        |  PERCENTILE(c_acctbal, 0.5) AS exact,
        |  STDDEV(c_acctbal) AS sd, COUNT(*) AS n
        |FROM customer GROUP BY c_mktsegment""".stripMargin).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (approx, exact, sd) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(math.abs(approx - exact) <= sd,
        s"${r.getString(0)}: approx=$approx exact=$exact sd=$sd")
    }
    // default accuracy on small groups is in fact exact-or-adjacent:
    // approx must be an actual data value
    val vals = Tables.load(spark, sf, "customer")
      .select("c_acctbal").collect().map(_.getDouble(0)).toSet
    rows.foreach(r => assert(vals.contains(r.getDouble(1))))
  }

  test("all three native functions register and compute in a fresh session") {
    // the extension hook itself must wire without throwing (the same
    // builders Bench's spark.sql.extensions session runs through)…
    new graft.GraftExtensions()(new org.apache.spark.sql.SparkSessionExtensions)
    // …and a brand-new session registry serves all three functions
    // with correct results through SQL
    val s2 = spark.newSession()
    graft.functions.GraftFunctions.register(s2)
    val r = s2.sql(
      """SELECT graft_cosine(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS c,
        |       size(graft_shingles('a b c d', 3)) AS n""".stripMargin).head()
    assert(r.getDouble(0) === 1.0)
    assert(r.getInt(1) === 2)
    val sh = s2.sql(
      "SELECT graft_simhash_agg(h) AS f FROM (SELECT 5L AS h UNION ALL SELECT 5L)")
      .head().getLong(0)
    assert(sh === 5L, "simhash of identical single-bit tokens is that value")
  }

  test("left join NOT rewritten to inner despite COUNT over right column") {
    val joined = employees.as("e")
      .join(transactions.as("t"), $"e.id" === $"t.employee_id", "left_outer")
      .groupBy($"e.id").agg(count($"t.transaction_id").as("c"))
    val planStr = joined.queryExecution.optimizedPlan.toString
    assert(planStr.contains("LeftOuter"), s"left join was rewritten:\n$planStr")
  }
}
