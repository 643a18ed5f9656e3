package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic numeric aggregation helpers.
  *
  * Problem: `SUM(double)` is order-dependent (IEEE addition is not
  * associative), and Spark sums partition-parallel while the DuckDB
  * oracle sums in scan order — the low bits of the result differ, which
  * breaks hash-equality correctness checks AND makes results
  * non-reproducible run-to-run on a real cluster.
  *
  * Fix: accumulate money-typed doubles as exact decimals, then convert
  * the final exact decimal to double. Decimal addition is associative,
  * so the result is bit-identical regardless of partitioning / executor
  * count — the property you want at 1000 executors, not just in tests.
  *
  * Note on double→decimal casts: a tie (exactly .5 at the rounding
  * digit) is impossible for scale ≥ 1 because 5·10^-k (k≥1) is not a
  * binary fraction, so no double lands on it — HALF_UP (Spark) and
  * HALF_EVEN (DuckDB) agree on every representable input.
  */
object Exact {
  private val money = DecimalType(18, 2)
  /** exact sum of a 2-decimal money column, returned as double */
  def moneySum(c: Column): Column = sum(c.cast(money)).cast("double")
  /** moneySum with COALESCE(…, 0) null-group defaulting
    * (reference: COALESCE over left-join output,
    * examples/read_deltalake_hdfs.py:107-108) */
  def moneySum0(c: Column): Column =
    coalesce(sum(c.cast(money)), lit(0).cast(money)).cast("double")
  /** exact mean of a 2-decimal money column (sum exact, one final
    * double division — deterministic) */
  def moneyAvg(c: Column): Column = moneySum(c) / count(c)
  /** exact sum of a derived product like extendedprice*(1-discount):
    * each per-row product is computed identically everywhere; the cast
    * to decimal(28,6) is deterministic; the sum is associative. */
  def productSum(c: Column): Column =
    sum(c.cast(DecimalType(28, 6))).cast("double")
}
