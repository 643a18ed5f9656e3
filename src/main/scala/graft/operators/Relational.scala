package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables
import graft.functions.Exact._

/** The reference's full relational parity surface (SURVEY.md §2.2-§2.6),
  * re-expressed Spark-first on the driver fixtures. Mapping
  * (FIXTURES.md §2): employees→customer, transactions→orders
  * (c_custkey = o_custkey), department→c_mktsegment, salary→c_acctbal,
  * amount→o_totalprice.
  *
  * Every query is a declarative DataFrame/SQL plan: Catalyst handles
  * predicate pushdown, column pruning, partial aggregation and join
  * strategy selection. Scale posture per query is noted inline; the
  * common rules:
  *   - dimension tables (region/nation/customer at small SF of a join)
  *     are broadcast; fact-fact joins shuffle on the join key;
  *   - aggregates are hash aggregates with map-side partial combine;
  *   - every ORDER BY carries a unique tie-break key so output order is
  *     deterministic for the oracle diff (SURVEY.md §5.2).
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  /** q01 — flagship: the reference's employee-transaction analysis
    * (examples/read_deltalake_hdfs.py:100-118): LEFT JOIN preserving
    * customers with no orders, per-customer COUNT + COALESCE'd SUM, and
    * a guarded CASE-WHEN ratio. Scale: customer×orders equi-join
    * shuffles on custkey (both sides large at 100 TB); AQE picks
    * broadcast if the build side turns out small. Catalyst must NOT
    * rewrite left→inner (COUNT/COALESCE absorb the nulls) — SURVEY §4.
    */
  val q01Flagship: Q = (spark, dir) => {
    val c = Tables.load(spark, dir, "customer")
    val o = Tables.load(spark, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy(c("c_custkey"), c("c_name"), c("c_mktsegment"), c("c_acctbal"))
      .agg(
        count(o("o_orderkey")).as("order_count"),
        moneySum0(o("o_totalprice")).as("total_spent"))
      .withColumn("spend_ratio",
        when(col("order_count") > 0 && col("c_acctbal") > 0,
          round(col("total_spent") / col("c_acctbal") * 100, 2))
          .otherwise(lit(0.0)))
      .orderBy(col("total_spent").desc, col("c_custkey"))
  }

  val q01Oracle: String =
    """SELECT c.c_custkey, c.c_name, c.c_mktsegment, c.c_acctbal,
      |  COUNT(o.o_orderkey) AS order_count,
      |  CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_spent,
      |  CASE WHEN COUNT(o.o_orderkey) > 0 AND c.c_acctbal > 0
      |    THEN ROUND(CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) / c.c_acctbal * 100, 2)
      |    ELSE 0.0 END AS spend_ratio
      |FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
      |GROUP BY c.c_custkey, c.c_name, c.c_mktsegment, c.c_acctbal
      |ORDER BY total_spent DESC, c.c_custkey""".stripMargin

  /** q02 — literal arithmetic SELECT (constant folding), reference
    * `SELECT 1 + 1 as result` examples/create_deltalake_hdfs.py:30. */
  val q02LitArith: Q = (spark, _) =>
    spark.sql("SELECT 1 + 1 AS result, 'Graft engine OK' AS message")

  val q02Oracle: String = "SELECT 1 + 1 AS result, 'Graft engine OK' AS message"

  /** q03 — expression projection: id, id*2, concat/cast
    * (examples/verify_sail_connection.py:46-50). Narrow, no shuffle
    * except the final deterministic sort. */
  val q03ProjectExpr: Q = (spark, dir) =>
    Tables.load(spark, dir, "orders")
      .selectExpr(
        "o_orderkey",
        "o_orderkey * 2 AS doubled",
        "concat('order_', cast(o_orderkey AS string)) AS tag")
      .orderBy("o_orderkey")

  val q03Oracle: String =
    """SELECT o_orderkey, o_orderkey * 2 AS doubled,
      |  concat('order_', CAST(o_orderkey AS VARCHAR)) AS tag
      |FROM orders ORDER BY o_orderkey""".stripMargin

  /** q04 — DataFrame equality filter, the partition-pruning demo shape
    * (examples/read_deltalake_hdfs.py:83). The predicate reaches the
    * parquet scan (PushedFilters); on a mktsegment-partitioned layout it
    * prunes directories (verified in PartitionedWriteSpec). */
  val q04FilterEq: Q = (spark, dir) =>
    Tables.load(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey", "c_name", "c_acctbal")
      .orderBy("c_custkey")

  val q04Oracle: String =
    """SELECT c_custkey, c_name, c_acctbal FROM customer
      |WHERE c_mktsegment = 'BUILDING' ORDER BY c_custkey""".stripMargin

  /** q05 — SQL WHERE comparison (`WHERE salary > 80000`,
    * examples/example_lakesail_kerberos.py:135-140). */
  val q05WhereGt: Q = (spark, dir) => {
    Tables.registerAll(spark, dir)
    spark.sql(
      """SELECT c_custkey, c_name, c_mktsegment, c_acctbal FROM customer
        |WHERE c_acctbal > 8000 ORDER BY c_acctbal DESC, c_custkey""".stripMargin)
  }

  val q05Oracle: String =
    """SELECT c_custkey, c_name, c_mktsegment, c_acctbal FROM customer
      |WHERE c_acctbal > 8000 ORDER BY c_acctbal DESC, c_custkey""".stripMargin

  /** q06 — CASE WHEN banding (salary bands,
    * examples/test_hdfs_inside_container.py:71-75). */
  val q06CaseBand: Q = (spark, dir) =>
    Tables.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
        when(col("c_acctbal") > 8000, "High")
          .when(col("c_acctbal") > 3000, "Medium")
          .otherwise("Standard").as("bal_band"))
      .orderBy("c_custkey")

  val q06Oracle: String =
    """SELECT c_custkey, c_name, c_acctbal,
      |  CASE WHEN c_acctbal > 8000 THEN 'High'
      |       WHEN c_acctbal > 3000 THEN 'Medium'
      |       ELSE 'Standard' END AS bal_band
      |FROM customer ORDER BY c_custkey""".stripMargin

  /** q07 — single-key GROUP BY summary (department summary,
    * examples/read_deltalake_hdfs.py:129-143): COUNT/SUM/AVG/MAX/MIN.
    * Hash aggregate with map-side partial combine; output cardinality =
    * |segments| (tiny), so the shuffle moves only partial states. */
  val q07SegmentSummary: Q = (spark, dir) =>
    Tables.load(spark, dir, "customer")
      .groupBy("c_mktsegment")
      .agg(
        count(lit(1)).as("n_customers"),
        moneySum(col("c_acctbal")).as("total_bal"),
        moneyAvg(col("c_acctbal")).as("avg_bal"),
        max("c_acctbal").as("max_bal"),
        min("c_acctbal").as("min_bal"))
      .orderBy("c_mktsegment")

  val q07Oracle: String =
    """SELECT c_mktsegment, COUNT(*) AS n_customers,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(c_acctbal) AS avg_bal,
      |  MAX(c_acctbal) AS max_bal, MIN(c_acctbal) AS min_bal
      |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** q08 — transaction-type summary ordered by aggregate
    * (examples/read_deltalake_hdfs.py:146-161). */
  val q08StatusSummary: Q = (spark, dir) =>
    Tables.load(spark, dir, "orders")
      .groupBy("o_orderstatus")
      .agg(
        count(lit(1)).as("n_orders"),
        moneySum(col("o_totalprice")).as("total_amount"),
        moneyAvg(col("o_totalprice")).as("avg_amount"),
        max("o_totalprice").as("max_amount"),
        min("o_totalprice").as("min_amount"))
      .orderBy(col("total_amount").desc, col("o_orderstatus"))

  val q08Oracle: String =
    """SELECT o_orderstatus, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_amount,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(o_totalprice) AS avg_amount,
      |  MAX(o_totalprice) AS max_amount, MIN(o_totalprice) AS min_amount
      |FROM orders GROUP BY o_orderstatus
      |ORDER BY total_amount DESC, o_orderstatus""".stripMargin

  /** q09 — INNER join + multi-key GROUP BY + two-key ORDER BY
    * (cross-department pattern, examples/read_deltalake_hdfs.py:164-178).
    * Scale: equi-join shuffles on custkey; the group-by keys have tiny
    * cardinality (5 segments × 3 statuses) so the final agg is cheap. */
  val q09CrossAgg: Q = (spark, dir) => {
    val c = Tables.load(spark, dir, "customer")
    val o = Tables.load(spark, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"))
      .groupBy("c_mktsegment", "o_orderstatus")
      .agg(
        count(lit(1)).as("n_orders"),
        moneyAvg(o("o_totalprice")).as("avg_amount"))
      .orderBy(col("c_mktsegment"), col("avg_amount").desc, col("o_orderstatus"))
  }

  val q09Oracle: String =
    """SELECT c.c_mktsegment, o.o_orderstatus, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(o.o_totalprice) AS avg_amount
      |FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
      |GROUP BY c.c_mktsegment, o.o_orderstatus
      |ORDER BY c.c_mktsegment, avg_amount DESC, o.o_orderstatus""".stripMargin

  /** q10 — global (no-key) aggregate: `SELECT AVG(salary)`
    * (verify_complete_setup.py:256). Partial agg per partition → single
    * final merge; no wide shuffle. */
  val q10GlobalAvg: Q = (spark, dir) =>
    Tables.load(spark, dir, "customer")
      .agg(
        moneyAvg(col("c_acctbal")).as("avg_bal"),
        count(lit(1)).as("n"))

  val q10Oracle: String =
    """SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(c_acctbal) AS avg_bal,
      |  COUNT(*) AS n FROM customer""".stripMargin

  /** q11 — STDDEV + exact median + HAVING (analytics query,
    * examples/example_lakesail_kerberos.py:215-228). stddev/percentile
    * are rounded to 2dp: their float low-bits are merge-order dependent,
    * and 2dp is far coarser than the ~1e-10 relative wobble. */
  val q11HavingStats: Q = (spark, dir) => {
    Tables.registerAll(spark, dir)
    // median interpolates in exact integer CENTS and is emitted
    // UNROUNDED: an even group's median is the midpoint of two money
    // values — in .xx5 dollars whenever their sum is odd in cents —
    // and near that non-representable value the engines disagree
    // twice over: PERCENTILE vs QUANTILE_CONT can produce different
    // doubles from raw-double inputs, and even on the SAME double
    // ROUND(x, 2) itself diverges (Spark HALF_UPs the double's exact
    // decimal expansion; DuckDB multiplies back by 100 and rounds —
    // observed one-cent flips at sf0.001 in BOTH directions). On
    // bigint cents the interpolation is exact (k or k+0.5) in both
    // engines, and halfcent/100.0 is one identical IEEE division —
    // bit-equal with no rounding step to disagree in.
    spark.sql(
      """SELECT c_nationkey, COUNT(*) AS n_customers,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(c_acctbal) AS avg_bal,
        |  ROUND(STDDEV(c_acctbal), 2) AS stddev_bal,
        |  PERCENTILE(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT), 0.5) / 100.0 AS median_bal
        |FROM customer GROUP BY c_nationkey HAVING COUNT(*) > 3
        |ORDER BY c_nationkey""".stripMargin)
  }

  val q11Oracle: String =
    """SELECT c_nationkey, COUNT(*) AS n_customers,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(c_acctbal) AS avg_bal,
      |  ROUND(STDDEV_SAMP(c_acctbal), 2) AS stddev_bal,
      |  QUANTILE_CONT(CAST(ROUND(c_acctbal * 100) AS BIGINT), 0.5) / 100.0 AS median_bal
      |FROM customer GROUP BY c_nationkey HAVING COUNT(*) > 3
      |ORDER BY c_nationkey""".stripMargin

  /** q12 — aggregates inside arithmetic (projected payroll,
    * examples/read_deltalake_hdfs.py:183-195): COUNT(*)*1000,
    * SUM(salary)*12, AVG(salary)*1.1. */
  val q12AggArith: Q = (spark, dir) =>
    Tables.load(spark, dir, "customer")
      .groupBy("c_mktsegment")
      .agg(
        (count(lit(1)) * 1000).as("headcount_scaled"),
        (moneySum(col("c_acctbal")) * 12).as("annual_total"),
        (moneyAvg(col("c_acctbal")) * 1.1).as("raised_avg"))
      .orderBy("c_mktsegment")

  val q12Oracle: String =
    """SELECT c_mktsegment, COUNT(*) * 1000 AS headcount_scaled,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) * 12 AS annual_total,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(c_acctbal) * 1.1 AS raised_avg
      |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** q13 — top-k: ORDER BY … DESC LIMIT k. Spark plans
    * TakeOrderedAndProject: per-partition heaps, no global sort —
    * exactly what you want at 100 TB (the reference only previews via
    * show(n), examples/read_deltalake_hdfs.py:122). */
  val q13TopK: Q = (spark, dir) =>
    Tables.load(spark, dir, "customer")
      .select("c_custkey", "c_name", "c_acctbal")
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
      .limit(10)

  val q13Oracle: String =
    """SELECT c_custkey, c_name, c_acctbal FROM customer
      |ORDER BY c_acctbal DESC, c_custkey LIMIT 10""".stripMargin

  /** q14 — filtered COUNT(*) (the partition-prune + count demo,
    * examples/read_deltalake_hdfs.py:77-84). */
  val q14CountFilter: Q = (spark, dir) =>
    Tables.load(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
      .agg(count(lit(1)).as("n_building"))

  val q14Oracle: String =
    "SELECT COUNT(*) AS n_building FROM customer WHERE c_mktsegment = 'BUILDING'"

  /** q15 — TPC-H Q1-shaped pricing summary over the fact table: the
    * heavy-agg benchmark anchor. Scans lineitem once; predicate + column
    * pruning reach the parquet scan; 6 aggregates in one hash-agg pass.
    */
  val q15Pricing: Q = (spark, dir) =>
    Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        moneySum(col("l_quantity")).as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        productSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("sum_disc_price"),
        moneyAvg(col("l_quantity")).as("avg_qty"),
        moneyAvg(col("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  val q15Oracle: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
      |  COUNT(*) AS count_order
      |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** q16 — TPC-H Q3-shaped 3-way join (the benchmark join anchor):
    * customer ⋈ orders ⋈ lineitem with selective filters, revenue agg,
    * top-10. Scale: customer side is filtered then broadcast-joined by
    * AQE when small enough; orders⋈lineitem shuffles on orderkey. The
    * limit avoids a global sort (TakeOrderedAndProject). */
  val q16ShippingPriority: Q = (spark, dir) => {
    val c = Tables.load(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.load(spark, dir, "orders")
      .filter(col("o_orderdate") < lit("1995-03-15").cast("timestamp"))
    val l = Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") > lit("1995-03-15").cast("timestamp"))
    broadcast(c).join(o, c("c_custkey") === o("o_custkey"))
      .join(l, o("o_orderkey") === l("l_orderkey"))
      .groupBy(l("l_orderkey"), o("o_orderdate"), o("o_orderpriority"))
      .agg(productSum(l("l_extendedprice") * (lit(1.0) - l("l_discount")))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q16Oracle: String =
    """SELECT l.l_orderkey, o.o_orderdate, o.o_orderpriority,
      |  CAST(SUM(CAST(l.l_extendedprice * (1.0 - l.l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
      |FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
      |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
      |WHERE c.c_mktsegment = 'BUILDING'
      |  AND o.o_orderdate < TIMESTAMP '1995-03-15'
      |  AND l.l_shipdate > TIMESTAMP '1995-03-15'
      |GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
      |ORDER BY revenue DESC, l.l_orderkey LIMIT 10""".stripMargin

  /** q17 — dimension chain join with broadcast: region ⋈ nation ⋈
    * customer. Both dims are tiny → explicit broadcast() keeps the big
    * side shuffle-free: the canonical star-schema pattern at scale. */
  val q17NationRollup: Q = (spark, dir) => {
    val r = Tables.load(spark, dir, "region")
    val n = Tables.load(spark, dir, "nation")
    val c = Tables.load(spark, dir, "customer")
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(r("r_name"), n("n_name"))
      .agg(
        count(lit(1)).as("n_customers"),
        moneySum(col("c_acctbal")).as("total_bal"))
      .orderBy("r_name", "n_name")
  }

  val q17Oracle: String =
    """SELECT r.r_name, n.n_name, COUNT(*) AS n_customers,
      |  CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
      |FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
      |JOIN region r ON n.n_regionkey = r.r_regionkey
      |GROUP BY r.r_name, n.n_name ORDER BY r.r_name, n.n_name""".stripMargin

  /** q18 — ROLLUP hierarchy totals (segment → nation → grand total):
    * the multi-level aggregate shape (SURVEY §2.4 listed grouping sets
    * as available-if-needed; this exercises them). One pass, Spark
    * expands grouping sets inside the hash aggregate. NULLS FIRST is
    * pinned explicitly — Spark defaults ASC to nulls-first, DuckDB to
    * nulls-last, and rollup subtotal rows are NULL-keyed. */
  val q18Rollup: Q = (spark, dir) =>
    Tables.load(spark, dir, "customer")
      .rollup("c_mktsegment", "c_nationkey")
      .agg(count(lit(1)).as("n_customers"),
        moneySum(col("c_acctbal")).as("total_bal"))
      .orderBy(col("c_mktsegment").asc_nulls_first,
        col("c_nationkey").asc_nulls_first)

  val q18Oracle: String =
    """SELECT c_mktsegment, c_nationkey, COUNT(*) AS n_customers,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
      |FROM customer GROUP BY ROLLUP(c_mktsegment, c_nationkey)
      |ORDER BY c_mktsegment NULLS FIRST, c_nationkey NULLS FIRST""".stripMargin

  /** q19 — sliding-frame window aggregate: per-customer running order
    * total and a 3-row moving average over order history. The frame
    * (`ROWS BETWEEN 2 PRECEDING AND CURRENT ROW`) is the shape
    * time-series features at scale are built from; one shuffle on the
    * partition key. */
  val q19RunningWindow: Q = (spark, dir) => {
    import org.apache.spark.sql.expressions.Window
    val byCust = Window.partitionBy("o_custkey")
      .orderBy("o_orderdate", "o_orderkey")
    Tables.load(spark, dir, "orders")
      .filter(col("o_custkey") <= 50)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice").cast(DecimalType(18, 2)).as("price"))
      .withColumn("running_total",
        sum(col("price")).over(
          byCust.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double"))
      .withColumn("avg3",
        sum(col("price")).over(byCust.rowsBetween(-2, 0)).cast("double")
          / count(lit(1)).over(byCust.rowsBetween(-2, 0)))
      .select(col("o_custkey"), col("o_orderkey"),
        col("price").cast("double").as("price"),
        col("running_total"), col("avg3"))
      .orderBy("o_custkey", "o_orderkey")
  }

  val q19Oracle: String =
    """SELECT o_custkey, o_orderkey,
      |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS price,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS DOUBLE) AS running_total,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w3 AS DOUBLE)
      |    / (COUNT(*) OVER w3) AS avg3
      |FROM orders WHERE o_custkey <= 50
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |             ROWS UNBOUNDED PRECEDING),
      |       w3 AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** q90 — range source (S4): `spark.range(n)` + arithmetic + agg, the
    * shape of verify_sail_connection.py:46 / verify_complete_setup.py:
    * 201-212. The driver-side oracle proves the generated sequence and
    * its fold, not just a row count. */
  val q90RangeSource: Q = (spark, dir) =>
    spark.range(1, 1001)
      .select(col("id"), (col("id") % 7).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), sum(col("id")).as("total"))
      .orderBy("bucket")

  val q90Oracle: String =
    """SELECT id % 7 AS bucket, COUNT(*) AS n, CAST(SUM(id) AS BIGINT) AS total
      |FROM (SELECT UNNEST(range(1, 1001)) AS id)
      |GROUP BY bucket ORDER BY bucket""".stripMargin

  /** q91 — in-memory source (S3): createDataFrame/toDF from local rows
    * (verify_complete_setup.py:201's spark.createDataFrame shape),
    * then a filter+projection so the oracle checks values, not just
    * arrival. */
  val q91InMemorySource: Q = (spark, dir) => {
    import spark.implicits._
    Seq((1, "alpha", 10.5), (2, "beta", 20.25), (3, "gamma", 30.75),
      (4, "delta", 40.0))
      .toDF("k", "name", "score")
      .filter(col("k") >= 2)
      .select(col("k"), upper(col("name")).as("name_uc"),
        (col("score") * 2).as("doubled"))
      .orderBy("k")
  }

  val q91Oracle: String =
    """SELECT k, UPPER(name) AS name_uc, CAST(score AS DOUBLE) * 2 AS doubled
      |FROM (VALUES (1, 'alpha', 10.5), (2, 'beta', 20.25),
      |             (3, 'gamma', 30.75), (4, 'delta', 40.0)) t(k, name, score)
      |WHERE k >= 2 ORDER BY k""".stripMargin

  /** q92 — the reference's literal PERCENTILE_APPROX call
    * (examples/example_lakesail_kerberos.py:223), HASH-VERIFIED since
    * round 17 via the q53 pattern: a GK-sketch value is engine-internal
    * (merge-order sensitive — no other engine can replay it), so
    * instead of faking cross-engine sketch equality the query emits the
    * EXACT nearest-rank percentiles (the k-th smallest element —
    * ceil(p·n) via pure integer arithmetic, an actual data value, so no
    * interpolation float path for engines to disagree in) alongside
    * booleans asserting each approx value landed within its DOCUMENTED
    * rank bound: an element whose rank interval [|{v<x}|+1, |{v<=x}|]
    * intersects p·n ± (n/accuracy + 1), accuracy = 10000 (Spark's
    * default; 1/accuracy is the documented relative rank error), the
    * ±1 absorbing the ceil-vs-floor target convention and the floor at
    * 1 covering tiny groups exactly like q53's. The oracle recomputes
    * n and both exact percentiles and asserts the flags TRUE by
    * construction — an out-of-bound sketch flips Spark's flag and
    * hash-fails. The PRODUCTION call is still the one-pass approx agg
    * (the whole point at 100 TB — the sketch merges in the same single
    * exchange as COUNT); the rank-audit join is the verification
    * scaffold, itself scale-shaped (one window + one grouped join, no
    * collects). RelationalSpec additionally bounds the raw approx
    * values against the exact percentile. */
  val q92PercentileApprox: Q = (spark, dir) => {
    Tables.registerAll(spark, dir)
    spark.sql(
      """WITH seg AS (
        |  SELECT c_mktsegment, COUNT(*) AS n,
        |    PERCENTILE_APPROX(c_acctbal, 0.5) AS am,
        |    PERCENTILE_APPROX(c_acctbal, 0.95) AS ap
        |  FROM customer GROUP BY c_mktsegment),
        |rnk AS (
        |  SELECT c_mktsegment, c_acctbal,
        |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment
        |      ORDER BY c_acctbal) AS rn
        |  FROM customer)
        |SELECT r.c_mktsegment, s.n,
        |  MAX(CASE WHEN r.rn = (s.n + 1) DIV 2 THEN r.c_acctbal END) AS exact_median,
        |  MAX(CASE WHEN r.rn = (19 * s.n + 19) DIV 20 THEN r.c_acctbal END) AS exact_p95,
        |  (SUM(CASE WHEN r.c_acctbal < s.am THEN 1 ELSE 0 END) + 1
        |     <= 0.5 * s.n + GREATEST(1.0, s.n / 10000.0) + 1
        |   AND SUM(CASE WHEN r.c_acctbal <= s.am THEN 1 ELSE 0 END)
        |     >= 0.5 * s.n - GREATEST(1.0, s.n / 10000.0) - 1) AS median_in_bound,
        |  (SUM(CASE WHEN r.c_acctbal < s.ap THEN 1 ELSE 0 END) + 1
        |     <= 0.95 * s.n + GREATEST(1.0, s.n / 10000.0) + 1
        |   AND SUM(CASE WHEN r.c_acctbal <= s.ap THEN 1 ELSE 0 END)
        |     >= 0.95 * s.n - GREATEST(1.0, s.n / 10000.0) - 1) AS p95_in_bound
        |FROM rnk r JOIN seg s ON r.c_mktsegment = s.c_mktsegment
        |GROUP BY r.c_mktsegment, s.n, s.am, s.ap
        |ORDER BY r.c_mktsegment""".stripMargin)
  }

  // Exact nearest-rank selection replayed with identical integer rank
  // arithmetic; the bound flags are TRUE by construction (q53 pattern).
  val q92Oracle: String =
    """WITH seg AS (SELECT c_mktsegment, COUNT(*) AS n
      |  FROM customer GROUP BY 1),
      |rnk AS (SELECT c_mktsegment, c_acctbal,
      |  ROW_NUMBER() OVER (PARTITION BY c_mktsegment
      |    ORDER BY c_acctbal) AS rn
      |  FROM customer)
      |SELECT r.c_mktsegment, s.n,
      |  MAX(CASE WHEN r.rn = (s.n + 1) // 2 THEN r.c_acctbal END) AS exact_median,
      |  MAX(CASE WHEN r.rn = (19 * s.n + 19) // 20 THEN r.c_acctbal END) AS exact_p95,
      |  TRUE AS median_in_bound, TRUE AS p95_in_bound
      |FROM rnk r JOIN seg s ON r.c_mktsegment = s.c_mktsegment
      |GROUP BY 1, 2 ORDER BY 1""".stripMargin

  /** q28 — correlated SCALAR subquery (TPC-H Q17 shape, [EXT]):
    * small-quantity lineitems — below 0.2× their own part's average
    * quantity — rolled up per brand. Written as SQL TEXT deliberately:
    * the point is Catalyst's subquery decorrelation
    * (RewriteCorrelatedScalarSubquery), which turns the per-row
    * correlated aggregate into ONE grouped aggregate over lineitem
    * joined back on l_partkey — the naive reading re-scans lineitem per
    * outer row, which is quadratic and cluster-fatal at 100 TB.
    * PlanSpec asserts the decorrelated shape (no subquery node survives
    * in the physical plan). Sums go through DECIMAL before the final
    * double cast (fold-order-exact across partitionings and engines —
    * same trick as moneySum); the 0.2× threshold derives from an exact
    * decimal sum for the identical reason. */
  val q28CorrelatedSubquery: Q = (spark, dir) => {
    Tables.registerAll(spark, dir)
    spark.sql(
      """SELECT p.p_brand, COUNT(*) AS n_small,
        |  ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 2) AS avg_yearly
        |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE l.l_quantity < (
        |  SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |                / COUNT(l2.l_quantity))
        |  FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)
        |GROUP BY p.p_brand ORDER BY p.p_brand""".stripMargin)
  }

  val q28Oracle: String =
    """SELECT p.p_brand, COUNT(*) AS n_small,
      |  ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 2) AS avg_yearly
      |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      |WHERE l.l_quantity < (
      |  SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
      |                / COUNT(l2.l_quantity))
      |  FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)
      |GROUP BY p.p_brand ORDER BY p.p_brand""".stripMargin

  /** q29 — NESTED correlated subqueries (TPC-H Q20 shape, [EXT]):
    * per nation, the suppliers who dominate some part's volume —
    * supplier-in-part share above 10% of the part's total. Two
    * decorrelation layers in one SQL text: the outer `IN` (quantified
    * predicate → RewritePredicateSubquery plans a LEFT SEMI join) and,
    * INSIDE the IN-subquery's HAVING, a correlated scalar aggregate
    * over the same fact table (→ RewriteCorrelatedScalarSubquery joins
    * the per-part totals back on l_partkey). Complements q28's plain
    * scalar case; together they cover Catalyst's two subquery rewrite
    * families. Same DECIMAL-exact-sum discipline for engine parity. */
  val q29NestedSubquery: Q = (spark, dir) => {
    Tables.registerAll(spark, dir)
    spark.sql(
      """SELECT n.n_name, COUNT(*) AS n_heavy
        |FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
        |WHERE s.s_suppkey IN (
        |  SELECT l.l_suppkey FROM lineitem l
        |  GROUP BY l.l_partkey, l.l_suppkey
        |  HAVING CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) > (
        |    SELECT 0.1 * CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
        |    FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey))
        |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin)
  }

  val q29Oracle: String =
    """SELECT n.n_name, COUNT(*) AS n_heavy
      |FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
      |WHERE s.s_suppkey IN (
      |  SELECT l.l_suppkey FROM lineitem l
      |  GROUP BY l.l_partkey, l.l_suppkey
      |  HAVING CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) > (
      |    SELECT 0.1 * CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
      |    FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey))
      |GROUP BY n.n_name ORDER BY n.n_name""".stripMargin

  /** q142 — EXISTS + NOT EXISTS + multi-join in ONE query (TPC-H Q21
    * shape, [EXT], round 15): the classic "suppliers who kept orders
    * waiting" pattern, the one subquery composition q28/q29 don't
    * cover — BOTH polarities of RewritePredicateSubquery (EXISTS →
    * LEFT SEMI, NOT EXISTS → LEFT ANTI) inside a 4-table join. The
    * fixture lacks receipt/commit dates, so the per-lineitem "fault"
    * flag is l_returnflag = 'R': per finished order, the supplier
    * whose item came back while EVERY other supplier on the same
    * multi-supplier order went un-returned — exactly Q21's
    * correlation structure (l2: same order, different supplier; l3:
    * same order, different supplier AND also faulty).
    *
    * 100 TB shape: both subqueries correlate ONLY on l_orderkey, so
    * Catalyst plans each as one hash semi/anti join of lineitem
    * against itself keyed by the order — two shuffles over the fact
    * table, zero per-row re-scans (the naive reading is quadratic).
    * PlanSpec asserts no subquery node survives and both a LeftSemi
    * and a LeftAnti join appear in the physical plan. */
  val q142ExistsNotExists: Q = (spark, dir) => {
    Tables.registerAll(spark, dir)
    spark.sql(
      """SELECT n.n_name, s.s_name, COUNT(*) AS numwait
        |FROM lineitem l1
        |JOIN supplier s ON s.s_suppkey = l1.l_suppkey
        |JOIN orders o ON o.o_orderkey = l1.l_orderkey
        |JOIN nation n ON n.n_nationkey = s.s_nationkey
        |WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY n.n_name, s.s_name
        |ORDER BY numwait DESC, s.s_name""".stripMargin)
  }

  // The oracle replays the EXISTS / NOT EXISTS semantics through one
  // per-order distinct-supplier aggregate — equivalent by definition
  // (EXISTS other-supplier ⟺ n_supp > 1; NOT EXISTS other-faulty ⟺
  // the order's faulty-supplier set is exactly {l1's}, i.e.
  // n_faulty_supp = 1 since l1 itself is faulty; replayed equal to
  // the literal-subquery form at sf0.01) — because DuckDB plans the
  // literal form as two extra lineitem self-joins, which breaches the
  // checker's 64 MB per-operator reservation floor (capwalk_r15.txt).
  val q142Oracle: String =
    """WITH l AS MATERIALIZED (
      |  SELECT l_orderkey, l_suppkey, l_returnflag = 'R' AS faulty
      |  FROM lineitem),
      |ok AS MATERIALIZED (
      |  SELECT l_orderkey,
      |    COUNT(DISTINCT l_suppkey) AS n_supp,
      |    COUNT(DISTINCT l_suppkey) FILTER (faulty) AS n_faulty_supp
      |  FROM l GROUP BY 1)
      |SELECT n.n_name, s.s_name, COUNT(*) AS numwait
      |FROM l l1
      |JOIN ok o2 ON o2.l_orderkey = l1.l_orderkey
      |JOIN supplier s ON s.s_suppkey = l1.l_suppkey
      |JOIN orders o ON o.o_orderkey = l1.l_orderkey
      |JOIN nation n ON n.n_nationkey = s.s_nationkey
      |WHERE o.o_orderstatus = 'F' AND l1.faulty
      |  AND o2.n_supp > 1
      |  AND o2.n_faulty_supp = 1
      |GROUP BY n.n_name, s.s_name
      |ORDER BY numwait DESC, s.s_name""".stripMargin

  /** q93 — semi/anti join ([EXT] beyond the reference's inner/left
    * surface): per segment, how many customers have at least one order
    * (LEFT SEMI = EXISTS) vs none (LEFT ANTI = NOT EXISTS). Both plan
    * as hash joins that ship only the join key of the build side and
    * never duplicate probe rows — the right shapes for an
    * existence-filter at scale (a naive inner-join + distinct
    * duplicates every customer by their order count first). */
  val q93SemiAntiJoin: Q = (spark, dir) => {
    val cust = graft.Tables.load(spark, dir, "customer")
    val orders = graft.Tables.load(spark, dir, "orders")
      .select(col("o_custkey"))
    val withOrders = cust
      .join(orders, cust("c_custkey") === orders("o_custkey"), "left_semi")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n_active"))
    val withoutOrders = cust
      .join(orders, cust("c_custkey") === orders("o_custkey"), "left_anti")
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n_inactive"))
    withOrders.join(withoutOrders, Seq("c_mktsegment"), "full_outer")
      .select(col("c_mktsegment"),
        coalesce(col("n_active"), lit(0L)).as("n_active"),
        coalesce(col("n_inactive"), lit(0L)).as("n_inactive"))
      .orderBy("c_mktsegment")
  }

  val q93Oracle: String =
    """SELECT c_mktsegment,
      |  CAST(SUM(CASE WHEN EXISTS (SELECT 1 FROM orders o
      |    WHERE o.o_custkey = c.c_custkey) THEN 1 ELSE 0 END) AS BIGINT) AS n_active,
      |  CAST(SUM(CASE WHEN NOT EXISTS (SELECT 1 FROM orders o
      |    WHERE o.o_custkey = c.c_custkey) THEN 1 ELSE 0 END) AS BIGINT) AS n_inactive
      |FROM customer c GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** q95 — window-function breadth ([EXT]): quartile bucketing
    * (ntile), distribution position (cume_dist), and neighbor delta
    * (lag) over per-segment balance order — the analytic trio every
    * BI-style consumer reaches for. One segment-partitioned window
    * shuffle serves all three (same spec → one Window node). */
  val q95WindowSuite: Q = (spark, dir) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("c_mktsegment")
      .orderBy(col("c_acctbal"), col("c_custkey"))
    graft.Tables.load(spark, dir, "customer")
      .filter(col("c_custkey") <= 200)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("cume", round(cume_dist().over(w), 4))
      .withColumn("gap_to_prev",
        round(col("c_acctbal") - lag(col("c_acctbal"), 1, 0.0).over(w), 2))
      .orderBy("c_custkey")
  }

  val q95Oracle: String =
    """SELECT c_custkey, c_mktsegment, c_acctbal,
      |  NTILE(4) OVER w AS quartile,
      |  ROUND(CUME_DIST() OVER w, 4) AS cume,
      |  ROUND(c_acctbal - LAG(c_acctbal, 1, 0.0) OVER w, 2) AS gap_to_prev
      |FROM customer WHERE c_custkey <= 200
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
      |ORDER BY c_custkey""".stripMargin

  /** q96 — CUBE ([EXT]; q18 covers ROLLUP): all 2^2 grouping
    * combinations of (segment, nation-of-order-status…) — here
    * (c_mktsegment, nation via c_nationkey band) with GROUPING() to
    * disambiguate the null of "all" from a null value. */
  val q96Cube: Q = (spark, dir) =>
    graft.Tables.load(spark, dir, "customer")
      .select(col("c_mktsegment"),
        (col("c_nationkey") % 5).cast("long").as("nation_band"),
        col("c_acctbal"))
      .cube("c_mktsegment", "nation_band")
      .agg(count(lit(1)).as("n"),
        grouping(col("c_mktsegment")).cast("int").as("g_seg"),
        grouping(col("nation_band")).cast("int").as("g_band"))
      // Grouping flags FIRST: they are non-null and partition the rows
      // into null classes (a key is null for a whole class iff its flag
      // is 1), so Spark's NULLS FIRST vs DuckDB's NULLS LAST can never
      // reorder — keys-first ordering was engine-fragile (round-14
      // verdict §wrong #2).
      .orderBy("g_seg", "g_band", "c_mktsegment", "nation_band")

  val q96Oracle: String =
    """SELECT c_mktsegment, nation_band, COUNT(*) AS n,
      |  CAST(GROUPING(c_mktsegment) AS INT) AS g_seg,
      |  CAST(GROUPING(nation_band) AS INT) AS g_band
      |FROM (SELECT c_mktsegment, c_nationkey % 5 AS nation_band, c_acctbal
      |      FROM customer)
      |GROUP BY CUBE (c_mktsegment, nation_band)
      |ORDER BY g_seg, g_band, c_mktsegment, nation_band""".stripMargin

  /** q151 — explicit GROUPING SETS ([EXT], round 16): completes the
    * grouping-variants trio (q18 ROLLUP = the hierarchical prefix
    * chain, q96 CUBE = the full lattice) with the one shape only
    * GROUPING SETS can express — a NON-hierarchical selection: two
    * independent one-dimensional summaries (per returnflag, per
    * linestatus) out of ONE pass over the fact table, the classic
    * report-page pattern that would otherwise cost two scans + a
    * union. Plans as a single Expand (×2) into one partial+final hash
    * aggregate — same shuffle count as either summary alone. Grouping
    * flags lead the ORDER BY (q96's NULLS FIRST/LAST lesson: the
    * flags partition the null classes, so key nullability can never
    * reorder across engines); the quantity sum is the exact-decimal
    * moneySum. */
  val q151GroupingSets: Q = (spark, dir) =>
    graft.Tables.load(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity"))
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
        col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        moneySum(col("l_quantity")).as("sum_qty"),
        grouping(col("l_returnflag")).cast("int").as("g_rf"),
        grouping(col("l_linestatus")).cast("int").as("g_ls"))
      .orderBy("g_rf", "g_ls", "l_returnflag", "l_linestatus")

  val q151Oracle: String =
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(GROUPING(l_returnflag) AS INT) AS g_rf,
      |  CAST(GROUPING(l_linestatus) AS INT) AS g_ls
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
      |ORDER BY g_rf, g_ls, l_returnflag, l_linestatus""".stripMargin

  /** q97 — pivot ([EXT]): order counts per (month-of-year, status)
    * with statuses as columns — `groupBy.pivot` compiles to the same
    * conditional-aggregation hash agg the SQL CASE formulation uses
    * (the oracle spells it out), so the plan is one shuffle. Pivot
    * values are pinned explicitly: an unpinned pivot runs an extra
    * distinct-collect job and its column order is data-dependent. */
  val q97Pivot: Q = (spark, dir) =>
    graft.Tables.load(spark, dir, "orders")
      .select(month(col("o_orderdate")).as("order_month"),
        col("o_orderstatus"))
      .groupBy("order_month")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .select(col("order_month"), col("F").as("n_f"),
        col("O").as("n_o"), col("P").as("n_p"))
      .orderBy("order_month")

  val q97Oracle: String =
    """SELECT MONTH(o_orderdate) AS order_month,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
      |  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
      |FROM orders GROUP BY 1 ORDER BY order_month""".stripMargin

  /** q98 — set operations ([EXT]): customers with orders in BOTH
    * halves of the date range (INTERSECT), in the first but not the
    * second (EXCEPT), and the distinct union — the three shapes plan
    * as hash aggregates over semi/anti joins, never materializing
    * duplicates. */
  val q98SetOps: Q = (spark, dir) => {
    val o = graft.Tables.load(spark, dir, "orders")
    val first = o.filter(col("o_orderdate") < "1996-01-01")
      .select(col("o_custkey"))
    val second = o.filter(col("o_orderdate") >= "1996-01-01")
      .select(col("o_custkey"))
    // one distributed plan: each set-op branch reduces to a 1-row
    // aggregate and the literal cross joins just glue the scalars —
    // no driver-side actions inside the operator
    first.intersect(second).agg(count(lit(1)).as("n_both"))
      .crossJoin(first.except(second).agg(count(lit(1)).as("n_only_first")))
      .crossJoin(first.union(second).distinct()
        .agg(count(lit(1)).as("n_either")))
  }

  val q98Oracle: String =
    """WITH f AS (SELECT o_custkey FROM orders WHERE o_orderdate < '1996-01-01'),
      |s AS (SELECT o_custkey FROM orders WHERE o_orderdate >= '1996-01-01')
      |SELECT
      |  (SELECT COUNT(*) FROM (SELECT o_custkey FROM f INTERSECT SELECT o_custkey FROM s) t) AS n_both,
      |  (SELECT COUNT(*) FROM (SELECT o_custkey FROM f EXCEPT SELECT o_custkey FROM s) t) AS n_only_first,
      |  (SELECT COUNT(DISTINCT o_custkey) FROM (SELECT o_custkey FROM f UNION ALL SELECT o_custkey FROM s) t) AS n_either""".stripMargin

  /** q99 — date/time function breadth ([EXT]; the reference's dates
    * are inert strings): calendar decomposition (year/quarter),
    * arithmetic (datediff to epoch anchor, add_months), and boundary
    * snapping (last_day) over order dates — narrow codegen'd exprs,
    * one hash agg. */
  val q99DateTime: Q = (spark, dir) =>
    graft.Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderdate"))
      .withColumn("o_year", year(col("o_orderdate")))
      .withColumn("o_quarter", quarter(col("o_orderdate")))
      .withColumn("days_since_90",
        datediff(col("o_orderdate"), lit("1990-01-01")).cast("long"))
      .withColumn("due",
        date_format(add_months(col("o_orderdate"), 3), "yyyy-MM-dd"))
      .withColumn("month_end",
        date_format(last_day(col("o_orderdate")), "yyyy-MM-dd"))
      .groupBy("o_year", "o_quarter")
      .agg(count(lit(1)).as("n"),
        min(col("days_since_90")).as("min_days"),
        max(col("due")).as("max_due"),
        max(col("month_end")).as("max_month_end"))
      .orderBy("o_year", "o_quarter")

  val q99Oracle: String =
    """SELECT YEAR(o_orderdate) AS o_year, QUARTER(o_orderdate) AS o_quarter,
      |  COUNT(*) AS n,
      |  MIN(date_diff('day', DATE '1990-01-01', o_orderdate)) AS min_days,
      |  MAX(strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d')) AS max_due,
      |  MAX(strftime(last_day(o_orderdate), '%Y-%m-%d')) AS max_month_end
      |FROM orders GROUP BY 1, 2 ORDER BY o_year, o_quarter""".stripMargin

  /** All parity queries + oracles, keyed for SparkEntry. */
  /** q86 — TPC-H Q5 shape (local supplier volume): the classic 6-table
    * join-reorder benchmark — region → nation → (customer ⋈ orders ⋈
    * lineitem ⋈ supplier) with a same-nation constraint between the
    * customer and supplier sides and a one-year date window. Declared
    * as plain joins; Catalyst + AQE pick the order, broadcast the
    * three dimension tables (region/nation/supplier fit), and push the
    * date filter into the orders scan. Revenue through the exact
    * decimal [[graft.functions.Exact.productSum]], so the descending
    * order is deterministic without rounding (q16's precedent). */
  val q86TpchQ5: Q = (spark, dir) => {
    val r = Tables.load(spark, dir, "region").filter(col("r_name") === "ASIA")
    val n = Tables.load(spark, dir, "nation")
    val c = Tables.load(spark, dir, "customer")
    val s = Tables.load(spark, dir, "supplier")
    val o = Tables.load(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val l = Tables.load(spark, dir, "lineitem")
    c.join(o, c("c_custkey") === o("o_custkey"))
      .join(l, o("o_orderkey") === l("l_orderkey"))
      .join(broadcast(s), l("l_suppkey") === s("s_suppkey") &&
        c("c_nationkey") === s("s_nationkey"))
      .join(broadcast(n), s("s_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(n("n_name"))
      .agg(productSum(l("l_extendedprice") * (lit(1.0) - l("l_discount")))
        .as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q86Oracle: String =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
      |FROM customer JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  /** q149 — TPC-H Q8 shape (national market share, [EXT], round 16):
    * the widest classic join-reorder stress in the surface — EIGHT
    * tables (part, supplier, lineitem, orders, customer, nation ×2,
    * region) with the nation dimension joined TWICE under different
    * roles (customer's nation routes through region for the market
    * filter; supplier's nation labels the share numerator), two
    * date-bounded fact filters, and a conditional-sum-over-sum ratio
    * per order year. Exercises Catalyst's reorder + AQE broadcast
    * planning two tables beyond q86's 6-way shape: both nation scans
    * must independently broadcast (PlanSpec asserts it, plus
    * no-cartesian), the filtered part side broadcasts against the
    * fact, and the date filter reaches the orders scan.
    *
    * Exactness: per-row volume casts to DECIMAL(28,6) BEFORE both
    * sums (associative decimal addition — bit-identical across
    * partitionings and engines, q86/q16's productSum discipline); the
    * share is ONE double division of two exact decimals, rounded to 6
    * — deterministic end to end, so the ratio is hash-verified, not
    * tolerance-checked. Fixture params: region AMERICA, supplier
    * nation NATION_6, p_type ECONOMY, order years 1995-1996. */
  val q149TpchQ8: Q = (spark, dir) => {
    val dec = org.apache.spark.sql.types.DecimalType(28, 6)
    val r = Tables.load(spark, dir, "region")
      .filter(col("r_name") === "AMERICA")
    val n1 = Tables.load(spark, dir, "nation").as("n1")
    val n2 = Tables.load(spark, dir, "nation").as("n2")
    val c = Tables.load(spark, dir, "customer")
    val s = Tables.load(spark, dir, "supplier")
    val p = Tables.load(spark, dir, "part")
      .filter(col("p_type") === "ECONOMY")
    val o = Tables.load(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val l = Tables.load(spark, dir, "lineitem")
    val vol = l("l_extendedprice") * (lit(1.0) - l("l_discount"))
    l.join(broadcast(p), l("l_partkey") === p("p_partkey"))
      .join(o, l("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(s), l("l_suppkey") === s("s_suppkey"))
      .join(broadcast(n1), c("c_nationkey") === col("n1.n_nationkey"))
      .join(broadcast(r), col("n1.n_regionkey") === r("r_regionkey"))
      .join(broadcast(n2), s("s_nationkey") === col("n2.n_nationkey"))
      .groupBy(year(o("o_orderdate")).as("o_year"))
      .agg(
        sum(when(col("n2.n_name") === "NATION_6", vol).otherwise(lit(0.0))
          .cast(dec)).as("nat"),
        sum(vol.cast(dec)).as("tot"))
      .select(col("o_year"),
        col("nat").cast("double").as("nation_volume"),
        col("tot").cast("double").as("total_volume"),
        round(col("nat").cast("double") / col("tot").cast("double"), 6)
          .as("mkt_share"))
      .orderBy("o_year")
  }

  val q149Oracle: String =
    """SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS o_year,
      |  CAST(SUM(CAST(CASE WHEN n2.n_name = 'NATION_6'
      |        THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END
      |      AS DECIMAL(28,6))) AS DOUBLE) AS nation_volume,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
      |      AS DECIMAL(28,6))) AS DOUBLE) AS total_volume,
      |  ROUND(CAST(SUM(CAST(CASE WHEN n2.n_name = 'NATION_6'
      |        THEN l_extendedprice * (1.0 - l_discount) ELSE 0.0 END
      |      AS DECIMAL(28,6))) AS DOUBLE)
      |    / CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount)
      |      AS DECIMAL(28,6))) AS DOUBLE), 6) AS mkt_share
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation n1 ON c_nationkey = n1.n_nationkey
      |JOIN region ON n1.n_regionkey = r_regionkey
      |JOIN nation n2 ON s_nationkey = n2.n_nationkey
      |WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
      |  AND o_orderdate >= TIMESTAMP '1995-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, Q] = Map(
    "q86_tpch_q5" -> q86TpchQ5,
    "q149_tpch_q8" -> q149TpchQ8,
    "q99_datetime" -> q99DateTime,
    "q95_window_suite" -> q95WindowSuite,
    "q96_cube" -> q96Cube,
    "q151_grouping_sets" -> q151GroupingSets,
    "q97_pivot" -> q97Pivot,
    "q98_set_ops" -> q98SetOps,
    "q93_semi_anti_join" -> q93SemiAntiJoin,
    "q28_corr_subquery" -> q28CorrelatedSubquery,
    "q29_nested_subquery" -> q29NestedSubquery,
    "q142_exists_not_exists" -> q142ExistsNotExists,
    "q90_range_source" -> q90RangeSource,
    "q91_inmem_source" -> q91InMemorySource,
    "q92_percentile_approx" -> q92PercentileApprox,
    "q18_rollup" -> q18Rollup,
    "q19_running_window" -> q19RunningWindow,
    "q01_flagship_left_join" -> q01Flagship,
    "q02_lit_arith" -> q02LitArith,
    "q03_project_expr" -> q03ProjectExpr,
    "q04_filter_eq" -> q04FilterEq,
    "q05_where_gt" -> q05WhereGt,
    "q06_case_band" -> q06CaseBand,
    "q07_segment_summary" -> q07SegmentSummary,
    "q08_status_summary" -> q08StatusSummary,
    "q09_cross_agg" -> q09CrossAgg,
    "q10_global_avg" -> q10GlobalAvg,
    "q11_having_stats" -> q11HavingStats,
    "q12_agg_arith" -> q12AggArith,
    "q13_topk" -> q13TopK,
    "q14_count_filter" -> q14CountFilter,
    "q15_pricing_summary" -> q15Pricing,
    "q16_shipping_priority" -> q16ShippingPriority,
    "q17_nation_rollup" -> q17NationRollup)

  val oracles: Map[String, String] = Map(
    "q86_tpch_q5" -> q86Oracle,
    "q149_tpch_q8" -> q149Oracle,
    "q99_datetime" -> q99Oracle,
    "q95_window_suite" -> q95Oracle,
    "q96_cube" -> q96Oracle,
    "q151_grouping_sets" -> q151Oracle,
    "q97_pivot" -> q97Oracle,
    "q98_set_ops" -> q98Oracle,
    "q93_semi_anti_join" -> q93Oracle,
    "q28_corr_subquery" -> q28Oracle,
    "q29_nested_subquery" -> q29Oracle,
    "q142_exists_not_exists" -> q142Oracle,
    "q90_range_source" -> q90Oracle,
    "q91_inmem_source" -> q91Oracle,
    "q92_percentile_approx" -> q92Oracle,
    "q18_rollup" -> q18Oracle,
    "q19_running_window" -> q19Oracle,
    "q01_flagship_left_join" -> q01Oracle,
    "q02_lit_arith" -> q02Oracle,
    "q03_project_expr" -> q03Oracle,
    "q04_filter_eq" -> q04Oracle,
    "q05_where_gt" -> q05Oracle,
    "q06_case_band" -> q06Oracle,
    "q07_segment_summary" -> q07Oracle,
    "q08_status_summary" -> q08Oracle,
    "q09_cross_agg" -> q09Oracle,
    "q10_global_avg" -> q10Oracle,
    "q11_having_stats" -> q11Oracle,
    "q12_agg_arith" -> q12Oracle,
    "q13_topk" -> q13Oracle,
    "q14_count_filter" -> q14Oracle,
    "q15_pricing_summary" -> q15Oracle,
    "q16_shipping_priority" -> q16Oracle,
    "q17_nation_rollup" -> q17Oracle)
}
