package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's full declared operator surface: the
  * reference-parity relational set (SURVEY.md §2.1-§2.6) plus the
  * [EXT] LLM-data-pipeline operators (§2.10). Each entry has matching
  * DuckDB oracle SQL in `oracleSql` unless the operator is not
  * SQL-expressible (noted per module).
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's employee-transaction analysis recast onto the
    * fixtures (examples/read_deltalake_hdfs.py:100-118). */
  def entry(spark: SparkSession): DataFrame =
    Relational.q01Flagship(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ TextOps.queries ++ DedupOps.queries ++
      SimilarityOps.queries ++ EventOps.queries ++ StorageOps.queries ++
      MultimodalOps.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ TextOps.oracles ++ DedupOps.oracles ++
      SimilarityOps.oracles ++ EventOps.oracles ++ StorageOps.oracles ++
      MultimodalOps.oracles
}
