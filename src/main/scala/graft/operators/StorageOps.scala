package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.sources.DeltaTable

/** Storage-semantics operators (SURVEY.md §2.1 S5-S8, §7-C/D): the
  * reference's write-path surface — parquet overwrite, Hive-style
  * partitioned layout, Delta overwrite/append/time-travel — exercised
  * end-to-end and checked through the oracle gate. Each query writes to
  * a fresh temp dir (self-contained; order-independent), reads its own
  * output back, and reduces it to an oracle-checkable result.
  */
object StorageOps {
  type Q = (SparkSession, String) => DataFrame

  private def freshDir(prefix: String): String =
    graft.Scratch.dir(prefix).resolve("t").toString

  /** q60 — Delta overwrite + append + read-back (the reference's
    * canonical sequence, examples/example_lakesail_kerberos.py:166-184:
    * count 3 → 4). Here: overwrite customer, append the c_custkey<=10
    * slice, read latest → per-segment counts reflect the appended rows.
    */
  val q60DeltaRoundtrip: Q = (spark, dir) => {
    val c = Tables.load(spark, dir, "customer")
    val t = freshDir("graft-delta-rt")
    DeltaTable.write(c, t, "overwrite")
    DeltaTable.write(c.filter(col("c_custkey") <= 10), t, "append")
    DeltaTable.read(spark, t)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_rows"),
        graft.functions.Exact.moneySum(col("c_acctbal")).as("total_bal"))
      .orderBy("c_mktsegment")
  }

  val q60Oracle: String =
    """SELECT c_mktsegment, COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
      |FROM (SELECT * FROM customer
      |      UNION ALL SELECT * FROM customer WHERE c_custkey <= 10)
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** q61 — Delta time travel (README.md:302's claimed capability):
    * after overwrite(v0) + append(v1), `versionAsOf = 0` must see
    * exactly the original table — the appended rows are invisible. */
  val q61DeltaTimeTravel: Q = (spark, dir) => {
    val c = Tables.load(spark, dir, "customer")
    val t = freshDir("graft-delta-tt")
    DeltaTable.write(c, t, "overwrite")
    DeltaTable.write(c.filter(col("c_custkey") <= 10), t, "append")
    DeltaTable.read(spark, t, versionAsOf = Some(0L))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_rows"),
        graft.functions.Exact.moneySum(col("c_acctbal")).as("total_bal"))
      .orderBy("c_mktsegment")
  }

  val q61Oracle: String =
    """SELECT c_mktsegment, COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
      |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** q58 — DESCRIBE HISTORY equivalent over a freshly built table with
    * a known op sequence (overwrite → append → DML delete): the audit
    * surface every lakehouse user expects. Output keeps only the
    * DETERMINISTIC columns — version, operation, whether files were
    * removed — because timestamps are wall-clock and add-counts follow
    * the writer's partitioning; the full DataFrame (with timestamps
    * and counts) is what [[graft.sources.DeltaTable.history]] returns.
    * Oracle = the VALUES literal the op sequence dictates. */
  val q58DeltaHistory: Q = (spark, dir) => {
    val c = Tables.load(spark, dir, "customer")
    val t = freshDir("graft-hist")
    DeltaTable.write(c, t, "overwrite")
    DeltaTable.write(c.filter(col("c_custkey") <= 10), t, "append")
    DeltaTable.delete(spark, t, col("c_custkey") <= 5)
    DeltaTable.history(spark, t)
      .select(col("version"), col("operation"),
        (col("num_removes") > 0).as("any_removes"))
      .orderBy("version")
  }

  val q58Oracle: String =
    """SELECT CAST(version AS BIGINT) AS version, operation, any_removes
      |FROM (VALUES (0, 'OVERWRITE', false), (1, 'APPEND', false),
      |             (2, 'DELETE', true)) t(version, operation, any_removes)
      |ORDER BY version""".stripMargin

  /** q59 — RESTORE TO VERSION AS OF: overwrite(v0) → append(v1) →
    * restore(0) must read back exactly the original table, with
    * history preserved (the restore is v2; v1 still time-travels —
    * DeltaSpec asserts both). Same oracle as q61: the restored state
    * IS the v0 state. */
  val q59DeltaRestore: Q = (spark, dir) => {
    val c = Tables.load(spark, dir, "customer")
    val t = freshDir("graft-restore")
    DeltaTable.write(c, t, "overwrite")
    DeltaTable.write(c.filter(col("c_custkey") <= 10), t, "append")
    DeltaTable.restore(t, 0L)
    DeltaTable.read(spark, t)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_rows"),
        graft.functions.Exact.moneySum(col("c_acctbal")).as("total_bal"))
      .orderBy("c_mktsegment")
  }

  val q59Oracle: String =
    """SELECT c_mktsegment, COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
      |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** q62 — Hive-partitioned parquet write + pruned read (the
    * reference's partition demo, examples/create_deltalake_hdfs.py:
    * 137-148 + read_deltalake_hdfs.py:74-84): write customer
    * partitionBy(c_mktsegment), read back filtered to one segment.
    * Catalyst prunes to the one `c_mktsegment=BUILDING/` directory —
    * asserted on the physical plan in StorageSpec; here the oracle
    * checks the data came back intact through the partitioned layout.
    */
  val q62PartitionedWrite: Q = (spark, dir) => {
    val c = Tables.load(spark, dir, "customer")
    val t = freshDir("graft-part")
    c.write.partitionBy("c_mktsegment").parquet(t)
    spark.read.parquet(t)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
      .orderBy("c_custkey")
  }

  val q62Oracle: String =
    """SELECT c_custkey, c_name, c_acctbal, c_mktsegment FROM customer
      |WHERE c_mktsegment = 'BUILDING' ORDER BY c_custkey""".stripMargin

  /** q63 — parquet overwrite roundtrip (S5): overwrite twice (second
    * write wins — the mode's defining property), read back. */
  val q63ParquetOverwrite: Q = (spark, dir) => {
    val c = Tables.load(spark, dir, "customer")
    val t = freshDir("graft-ovw")
    c.filter(col("c_custkey") <= 10).write.mode("overwrite").parquet(t)
    c.write.mode("overwrite").parquet(t) // replaces, not merges
    spark.read.parquet(t)
      .agg(count(lit(1)).as("n_rows"),
        graft.functions.Exact.moneySum(col("c_acctbal")).as("total_bal"))
  }

  val q63Oracle: String =
    """SELECT COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
      |FROM customer""".stripMargin

  /** q64 — the reference's exact format("delta") call shapes through
    * our registered graft-delta source (write overwrite → write append
    * → read → time-travel read), reduced to an oracle-checkable
    * aggregate. Uses the public DataFrameReader/Writer API end-to-end
    * — nothing calls DeltaTable directly. */
  val q64DeltaFormatApi: Q = (spark, dir) => {
    val c = Tables.load(spark, dir, "customer")
    val t = freshDir("graft-delta-fmt")
    c.write.format("graft-delta").mode("overwrite").save(t)
    c.filter(col("c_custkey") <= 10)
      .write.format("graft-delta").mode("append").save(t)
    val latest = spark.read.format("graft-delta").load(t)
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n_latest"))
    val v0 = spark.read.format("graft-delta").option("versionAsOf", 0).load(t)
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n_v0"))
    latest.join(v0, "c_mktsegment")
      .select("c_mktsegment", "n_latest", "n_v0")
      .orderBy("c_mktsegment")
  }

  val q64Oracle: String =
    """SELECT c_mktsegment,
      |  CAST(COUNT(*) + SUM(CASE WHEN c_custkey <= 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_latest,
      |  COUNT(*) AS n_v0
      |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** q65 — the reference's literal `format("delta")` spelling
    * (examples/example_lakesail_kerberos.py:166-184) through the
    * registered short-name alias: overwrite, append, read back. */
  val q65DeltaShortName: Q = (spark, dir) => {
    val n = Tables.load(spark, dir, "nation")
    val t = freshDir("graft-delta-name")
    n.write.format("delta").mode("overwrite").save(t)
    n.filter(col("n_regionkey") === 0)
      .write.format("delta").mode("append").save(t)
    spark.read.format("delta").load(t)
      .groupBy("n_regionkey")
      .agg(count(lit(1)).as("n_rows"), countDistinct(col("n_name")).as("n_names"))
      .orderBy("n_regionkey")
  }

  val q65Oracle: String =
    """SELECT n_regionkey, COUNT(*) AS n_rows,
      |  COUNT(DISTINCT n_name) AS n_names
      |FROM (SELECT * FROM nation
      |      UNION ALL SELECT * FROM nation WHERE n_regionkey = 0)
      |GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin

  /** q66 — compaction roundtrip: three appends accrete small files,
    * compact() rewrites them into one, and the post-compaction read
    * must be byte-identical in content to the logical union. The
    * count(DISTINCT) guards against double-reads of both old and new
    * files (the failure mode if the swap commit weren't atomic). */
  val q66DeltaCompact: Q = (spark, dir) => {
    val n = Tables.load(spark, dir, "nation")
    val t = freshDir("graft-delta-compact")
    DeltaTable.write(n, t, "overwrite")
    DeltaTable.write(n.filter(col("n_regionkey") === 0), t, "append")
    DeltaTable.write(n.filter(col("n_regionkey") === 1), t, "append")
    DeltaTable.compact(spark, t)
    DeltaTable.read(spark, t)
      .groupBy("n_regionkey")
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("n_nationkey")).as("n_distinct"))
      .orderBy("n_regionkey")
  }

  val q66Oracle: String =
    """SELECT n_regionkey, COUNT(*) AS n_rows,
      |  COUNT(DISTINCT n_nationkey) AS n_distinct
      |FROM (SELECT * FROM nation
      |      UNION ALL SELECT * FROM nation WHERE n_regionkey = 0
      |      UNION ALL SELECT * FROM nation WHERE n_regionkey = 1)
      |GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin

  /** q67 — PARTITIONED graft-delta roundtrip: the reference's
    * partitioned-layout demo (examples/create_deltalake_hdfs.py:137-148)
    * composed with its Delta write shapes (:119-131). Write customer
    * partitioned by segment through the public writer API (overwrite
    * then a same-layout append), read back filtered to one segment.
    * The read must prune to the one segment's files via the log's
    * partitionValues — DeltaSpec asserts numFiles on the executed scan;
    * the oracle checks the data survived the partitioned layout. */
  val q67PartitionedDelta: Q = (spark, dir) => {
    val c = Tables.load(spark, dir, "customer")
    val t = freshDir("graft-delta-part")
    c.write.format("graft-delta").partitionBy("c_mktsegment")
      .mode("overwrite").save(t)
    c.filter(col("c_custkey") <= 10)
      .write.format("graft-delta").mode("append").save(t)
    spark.read.format("graft-delta").load(t)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey", "c_name", "c_acctbal", "c_mktsegment")
      .orderBy("c_custkey", "c_name")
  }

  val q67Oracle: String =
    """SELECT c_custkey, c_name, c_acctbal, c_mktsegment
      |FROM (SELECT * FROM customer
      |      UNION ALL SELECT * FROM customer WHERE c_custkey <= 10)
      |WHERE c_mktsegment = 'BUILDING' ORDER BY c_custkey, c_name""".stripMargin

  /** q68 — Delta DML DELETE ([EXT]): partitioned table, predicate
    * spanning a whole partition plus rows scattered through others —
    * the BUILDING partition's files drop wholesale (partition-pruned,
    * never scanned for rewrite output) while other partitions rewrite
    * only the files containing negative balances. */
  val q68DeltaDelete: Q = (spark, dir) => {
    val c = Tables.load(spark, dir, "customer")
    val t = freshDir("graft-delta-del")
    c.write.format("graft-delta").partitionBy("c_mktsegment")
      .mode("overwrite").save(t)
    DeltaTable.delete(spark, t,
      col("c_mktsegment") === "BUILDING" || col("c_acctbal") < 0)
    spark.read.format("graft-delta").load(t)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_rows"),
        graft.functions.Exact.moneySum(col("c_acctbal")).as("total_bal"))
      .orderBy("c_mktsegment")
  }

  val q68Oracle: String =
    """SELECT c_mktsegment, COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
      |FROM customer
      |WHERE NOT (c_mktsegment = 'BUILDING' OR c_acctbal < 0)
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** q69 — Delta DML MERGE ([EXT]): upsert into nation — every
    * region-0 nation gets a renamed source row (matched → replaced),
    * plus two brand-new keys (unmatched → inserted). Touched-file
    * rewrite keyed on n_nationkey. */
  val q69DeltaMerge: Q = (spark, dir) => {
    val spark2 = spark; import spark2.implicits._
    val n = Tables.load(spark, dir, "nation")
    val t = freshDir("graft-delta-merge")
    n.write.format("graft-delta").mode("overwrite").save(t)
    val updates = n.filter(col("n_regionkey") === 0)
      .select(col("n_nationkey"),
        concat(col("n_name"), lit("_X")).as("n_name"), col("n_regionkey"))
    val inserts = Seq((100, "NEWLAND", 0), (101, "OTHERLAND", 1))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    DeltaTable.merge(spark, t, updates.unionByName(inserts),
      Seq("n_nationkey"))
    spark.read.format("graft-delta").load(t)
      .select("n_nationkey", "n_name", "n_regionkey")
      .orderBy("n_nationkey")
  }

  val q69Oracle: String =
    """SELECT n_nationkey,
      |  CASE WHEN n_regionkey = 0 THEN n_name || '_X' ELSE n_name END AS n_name,
      |  n_regionkey
      |FROM nation
      |UNION ALL SELECT 100, 'NEWLAND', 0
      |UNION ALL SELECT 101, 'OTHERLAND', 1
      |ORDER BY n_nationkey""".stripMargin

  /** q94 — Delta DML UPDATE ([EXT]): conditional SET — negative
    * balances zeroed and re-segmented; only files containing matches
    * rewrite. */
  val q94DeltaUpdate: Q = (spark, dir) => {
    val c = Tables.load(spark, dir, "customer")
    val t = freshDir("graft-delta-upd")
    c.write.format("graft-delta").mode("overwrite").save(t)
    DeltaTable.update(spark, t, col("c_acctbal") < 0,
      Map("c_acctbal" -> lit(0.0), "c_mktsegment" -> lit("RESCUED")))
    spark.read.format("graft-delta").load(t)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_rows"),
        graft.functions.Exact.moneySum(col("c_acctbal")).as("total_bal"))
      .orderBy("c_mktsegment")
  }

  val q94Oracle: String =
    """SELECT
      |  CASE WHEN c_acctbal < 0 THEN 'RESCUED' ELSE c_mktsegment END AS c_mktsegment,
      |  COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(CASE WHEN c_acctbal < 0 THEN 0.0 ELSE c_acctbal END
      |    AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
      |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin

  /** q80 — batch CHANGE DATA FEED over the delta log, ACROSS DML:
    * table_changes between two versions, the incremental-consumer read
    * (refresh a downstream aggregate from exactly the changed rows,
    * not a rescan). Build overwrite(v0) → enable CDF(v1) → append(v2:
    * region 0) → DELETE region 2 (v3) → UPDATE region 3's names (v4),
    * then read changes [2,4]: the appended rows come back as `insert`s
    * tagged v2 (derived from add actions — no sidecar needed for an
    * append), the deleted rows as `delete` rows tagged v3 and the
    * updated rows as `update_preimage`/`update_postimage` pairs tagged
    * v4 (both served from the `_change_data/` sidecars the DML commits
    * staged). The oracle is the four slices with literal tags; the
    * region-0 appends cannot collide with the region-2/3 DML, so each
    * source row appears in exactly one slice. */
  val q80DeltaChanges: Q = (spark, dir) => {
    val n = Tables.load(spark, dir, "nation")
    val t = freshDir("graft-delta-cdf")
    DeltaTable.write(n, t, "overwrite")                               // v0
    DeltaTable.setTableProperty(t, "delta.enableChangeDataFeed", "true") // v1
    DeltaTable.write(n.filter(col("n_regionkey") === 0), t, "append") // v2
    DeltaTable.delete(spark, t, col("n_regionkey") === 2)             // v3
    DeltaTable.update(spark, t, col("n_regionkey") === 3,
      Map("n_name" -> concat(col("n_name"), lit("!"))))               // v4
    DeltaTable.changes(spark, t, 2L, 4L)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"),
        col("_change_type").as("change_type"),
        col("_commit_version").as("commit_version"))
      .orderBy("commit_version", "change_type", "n_nationkey")
  }

  val q80Oracle: String =
    """SELECT n_nationkey, n_name, n_regionkey,
      |  'insert' AS change_type, CAST(2 AS BIGINT) AS commit_version
      |FROM nation WHERE n_regionkey = 0
      |UNION ALL
      |SELECT n_nationkey, n_name, n_regionkey,
      |  'delete' AS change_type, CAST(3 AS BIGINT) AS commit_version
      |FROM nation WHERE n_regionkey = 2
      |UNION ALL
      |SELECT n_nationkey, n_name, n_regionkey,
      |  'update_preimage' AS change_type, CAST(4 AS BIGINT) AS commit_version
      |FROM nation WHERE n_regionkey = 3
      |UNION ALL
      |SELECT n_nationkey, n_name || '!' AS n_name, n_regionkey,
      |  'update_postimage' AS change_type, CAST(4 AS BIGINT) AS commit_version
      |FROM nation WHERE n_regionkey = 3
      |ORDER BY commit_version, change_type, n_nationkey""".stripMargin

  /** q83 — INCREMENTAL AGGREGATE MAINTENANCE: the materialized-view
    * refresh pattern the change feed (q80) exists for. A source delta
    * table takes two appends after its base load; the downstream
    * per-segment aggregate is built ONCE from v0, then refreshed by
    * aggregating ONLY the changed rows (changes 1..2) and MERGE-ing
    * the combined totals — the full source is never rescanned. The
    * final read must equal a from-scratch recompute (the oracle).
    *
    * Totals stay DECIMAL end-to-end: decimal addition is associative
    * and parquet-exact, so old+delta is bit-identical to the full
    * recompute — summing doubles incrementally would drift an ulp and
    * fail the hash gate (the 1000-executor reproducibility argument of
    * graft.functions.Exact, applied across COMMITS instead of
    * partitions). Segments untouched by the appends keep their
    * downstream rows byte-stable (merge only rewrites matched files);
    * a segment born in the appends would arrive via the right-join's
    * null arm. */
  val q83IncrementalAgg: Q = (spark, dir) => {
    val money = org.apache.spark.sql.types.DecimalType(18, 2)
    val sumT = org.apache.spark.sql.types.DecimalType(28, 2)
    val c = Tables.load(spark, dir, "customer")
    val src = freshDir("graft-inc-src")
    DeltaTable.write(c, src, "overwrite")                              // v0
    DeltaTable.write(c.filter(col("c_custkey") <= 10), src, "append") // v1
    DeltaTable.write(c.filter(col("c_custkey").between(11, 20)),
      src, "append")                                                   // v2
    def agg(df: DataFrame): DataFrame = df
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_rows"),
        sum(col("c_acctbal").cast(money)).as("total_bal"))
    val down = freshDir("graft-inc-down")
    DeltaTable.write(agg(DeltaTable.read(spark, src,
      versionAsOf = Some(0L))), down, "overwrite")
    val deltaAgg = agg(DeltaTable.changes(spark, src, 1L, 2L)
      .select(c.columns.map(col).toIndexedSeq: _*))
    val cur = DeltaTable.read(spark, down)
    val upserts = cur.as("o")
      .join(deltaAgg.as("d"), Seq("c_mktsegment"), "right")
      .select(col("c_mktsegment"),
        (coalesce(col("o.n_rows"), lit(0L)) + col("d.n_rows")).as("n_rows"),
        (coalesce(col("o.total_bal"), lit(0).cast(sumT)) + col("d.total_bal"))
          .cast(sumT).as("total_bal"))
    DeltaTable.merge(spark, down, upserts, Seq("c_mktsegment"))
    DeltaTable.read(spark, down)
      .select(col("c_mktsegment"), col("n_rows"),
        col("total_bal").cast("double").as("total_bal"))
      .orderBy("c_mktsegment")
  }

  val q83Oracle: String =
    """SELECT c_mktsegment, COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
      |FROM (SELECT * FROM customer
      |      UNION ALL SELECT * FROM customer WHERE c_custkey <= 10
      |      UNION ALL SELECT * FROM customer WHERE c_custkey BETWEEN 11 AND 20)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q85 — OPTIMIZE ZORDER BY: rewrite customer clustered on the
    * (c_custkey, c_acctbal) Z-curve, then read back a two-dimension
    * filtered aggregate. The oracle proves the rewrite changed LAYOUT
    * only (content identical to plain SQL over the source); the
    * skipping payoff — per-file min/max tight on BOTH columns, so a
    * filter on either scans a fraction of the files — is asserted
    * file-by-file in DeltaSpec via liveFilesAfterSkipping. */
  val q85DeltaZorder: Q = (spark, dir) => {
    val c = Tables.load(spark, dir, "customer")
    val t = freshDir("graft-delta-z")
    // scatter first (round-robin over 8 files) so the rewrite has a
    // genuinely unclustered layout to fix
    c.repartition(8).write.format("graft-delta").mode("overwrite").save(t)
    DeltaTable.zorder(spark, t, Seq("c_custkey", "c_acctbal"), 8)
    spark.read.format("graft-delta").load(t)
      .filter(col("c_custkey") <= 400 && col("c_acctbal") >= 0)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_rows"),
        graft.functions.Exact.moneySum(col("c_acctbal")).as("total_bal"))
      .orderBy("c_mktsegment")
  }

  val q85Oracle: String =
    """SELECT c_mktsegment, COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
      |FROM customer WHERE c_custkey <= 400 AND c_acctbal >= 0
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** q87 — CHECK constraints as a first-class table contract: add
    * `positive_key` to a fresh nation table, append a clean slice
    * (enforced — a violating write aborts pre-commit, DeltaSpec), and
    * read back DESCRIBE HISTORY: the ADD CONSTRAINT commit is a
    * visible, versioned operation like any other, and the constraint
    * itself rides the metaData configuration every later writer
    * carries forward. Oracle = the VALUES literal the op sequence
    * dictates (q58's pattern). */
  val q87DeltaConstraint: Q = (spark, dir) => {
    val n = Tables.load(spark, dir, "nation")
    val t = freshDir("graft-delta-ck")
    DeltaTable.write(n, t, "overwrite")
    DeltaTable.addCheckConstraint(spark, t, "positive_key", "n_nationkey >= 0")
    DeltaTable.write(n.filter(col("n_regionkey") === 0), t, "append")
    DeltaTable.history(spark, t)
      .select(col("version"), col("operation"),
        (col("num_adds") > 0).as("any_adds"))
      .orderBy("version")
  }

  val q87Oracle: String =
    """SELECT CAST(version AS BIGINT) AS version, operation, any_adds
      |FROM (VALUES (0, 'OVERWRITE', true), (1, 'ADD CONSTRAINT', false),
      |             (2, 'APPEND', true)) t(version, operation, any_adds)
      |ORDER BY version""".stripMargin

  /** q88 — DESCRIBE DETAIL: current-snapshot facts off the log. The
    * fixture sequence pins every deterministic field: a partitioned
    * overwrite of nation (5 region values → exactly 5 files, one per
    * partition from the pre-stage shuffle), one constraint, one
    * single-partition append (+1 file), so (version, num_files,
    * partition_columns, num_constraints) are all literals; size_bytes
    * varies with parquet encoding and is projected out. */
  val q88DeltaDetail: Q = (spark, dir) => {
    val n = Tables.load(spark, dir, "nation")
    val t = freshDir("graft-delta-detail")
    n.write.format("graft-delta").partitionBy("n_regionkey")
      .mode("overwrite").save(t)
    DeltaTable.addCheckConstraint(spark, t, "named", "n_name IS NOT NULL")
    n.filter(col("n_regionkey") === 0)
      .write.format("graft-delta").mode("append").save(t)
    DeltaTable.detail(spark, t)
      .select("version", "num_files", "partition_columns", "num_constraints")
  }

  val q88Oracle: String =
    """SELECT CAST(2 AS BIGINT) AS version, CAST(6 AS BIGINT) AS num_files,
      |  'n_regionkey' AS partition_columns, 1 AS num_constraints""".stripMargin

  /** q84 — Delta COLUMN MAPPING end-to-end ([EXT]): the metadata-only
    * schema-evolution path a 100 TB table actually needs — rename and
    * drop that move ZERO data bytes (DeltaSpec proves the file set is
    * untouched; here the oracle proves the SEMANTICS). Build: nation →
    * delta (v0), enable mapping (v1: ids + physical names frozen,
    * protocol → reader 2/writer 5), RENAME n_name → nation_name (v2,
    * metadata-only), DROP n_comment (v3, metadata-only), append five
    * derived rows speaking the NEW logical schema (v4 — their bytes
    * land under the frozen PHYSICAL name `n_name`), then read back
    * through the DSv1 path (MappedParquetFileFormat: logical plan
    * names, physical reader schema, positional rows) and aggregate.
    * The oracle replays rename-as-alias + drop-as-projection + the
    * append in plain SQL — mapping metadata is deterministic, so the
    * whole lifecycle is DuckDB hash-verified. */
  val q84ColumnMapping: Q = (spark, dir) => {
    val s = Tables.load(spark, dir, "supplier")
    val t = freshDir("graft-delta-colmap")
    DeltaTable.write(s, t, "overwrite")
    DeltaTable.enableColumnMapping(t)
    DeltaTable.renameColumn(t, "s_name", "supplier_name")
    DeltaTable.dropColumn(t, "s_acctbal")
    val extra = s.filter(col("s_suppkey") < 5)
      .select((col("s_suppkey") + 1000L).as("s_suppkey"),
        concat(col("s_name"), lit("_X")).as("supplier_name"),
        col("s_nationkey"))
    DeltaTable.write(extra, t, "append")
    spark.read.format("graft-delta").load(t)
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n_rows"),
        min(col("supplier_name")).as("first_name"),
        sum(col("s_suppkey")).as("key_sum"))
      .orderBy("s_nationkey")
  }

  val q84Oracle: String =
    """WITH t AS (
      |  SELECT s_suppkey, s_name AS supplier_name, s_nationkey FROM supplier
      |  UNION ALL
      |  SELECT s_suppkey + 1000, s_name || '_X', s_nationkey
      |  FROM supplier WHERE s_suppkey < 5)
      |SELECT s_nationkey, COUNT(*) AS n_rows,
      |  MIN(supplier_name) AS first_name,
      |  CAST(SUM(s_suppkey) AS BIGINT) AS key_sum
      |FROM t GROUP BY 1 ORDER BY 1""".stripMargin

  /** q100 — DELETION VECTORS end-to-end: enable the feature, point-
    * delete a slice (the commit re-adds the same data files carrying
    * sidecar bitmaps — DeltaSpec proves zero data files move), then
    * read the table back through the `format("graft-delta")` relation,
    * whose DV-aware reader subtracts the dead rows per file. The
    * oracle is simply the surviving rows. */
  val q100DvDelete: Q = (spark, dir) => {
    val n = Tables.load(spark, dir, "nation")
    val t = freshDir("graft-delta-dv")
    DeltaTable.write(n, t, "overwrite")                   // v0
    DeltaTable.enableDeletionVectors(t)                   // v1
    DeltaTable.delete(spark, t, col("n_regionkey") === 2) // v2 (vectored)
    spark.read.format("graft-delta").load(t)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .orderBy("n_nationkey")
  }

  val q100Oracle: String =
    """SELECT n_nationkey, n_name, n_regionkey FROM nation
      |WHERE n_regionkey <> 2 ORDER BY n_nationkey""".stripMargin

  /** q101 — GENERATED COLUMNS end-to-end ([EXT], the protocol's
    * `delta.generationExpression`): events land in a delta table whose
    * `event_date` partition column the TABLE derives (`CAST(ts AS
    * DATE)`) — the frame never computes it. An UPDATE then shifts one
    * day's purchases two days forward: the engine recomputes the
    * generated column and MIGRATES the rows across partition
    * directories (DeltaSpec proves the mechanics; the oracle proves
    * the semantics by replaying the shift in SQL). The read filters a
    * one-week `ts` range — the monotone-shape derivation turns that
    * into `event_date` partition pruning in the log, the 100 TB reason
    * this feature exists (DeltaSpec asserts the file-level pruning;
    * at 30 daily partitions the scan touches 7). */
  val q101GeneratedPartition: Q = (spark, dir) => {
    val e = Tables.loadEvents(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
    val t = freshDir("graft-delta-gen")
    DeltaTable.write(e, t, "overwrite", partitionBy = Seq("event_date"),
      generatedColumns = Map("event_date" -> "CAST(ts AS DATE)"))
    DeltaTable.update(spark, t,
      col("event_type") === "purchase" &&
        col("ts") >= lit("2024-01-10 00:00:00").cast("timestamp") &&
        col("ts") < lit("2024-01-11 00:00:00").cast("timestamp"),
      Map("ts" -> (col("ts") + expr("INTERVAL 2 DAYS"))))
    spark.read.format("graft-delta").load(t)
      .filter(col("ts") >= lit("2024-01-08 00:00:00").cast("timestamp") &&
        col("ts") < lit("2024-01-15 00:00:00").cast("timestamp"))
      .groupBy(col("event_date"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        max(col("event_id")).as("max_event"))
      .orderBy("event_date")
  }

  val q101Oracle: String =
    """WITH t AS (
      |  SELECT event_id, user_id,
      |    CASE WHEN event_type = 'purchase'
      |              AND ts >= TIMESTAMP '2024-01-10 00:00:00'
      |              AND ts < TIMESTAMP '2024-01-11 00:00:00'
      |         THEN ts + INTERVAL 2 DAY ELSE ts END AS ts
      |  FROM events)
      |SELECT CAST(ts AS DATE) AS event_date, COUNT(*) AS n_events,
      |  COUNT(DISTINCT user_id) AS n_users, MAX(event_id) AS max_event
      |FROM t
      |WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'
      |  AND ts < TIMESTAMP '2024-01-15 00:00:00'
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q102 — SHALLOW CLONE end-to-end ([EXT], the protocol's zero-copy
    * branching): nation → delta, clone (one metadata commit, zero data
    * bytes — DeltaSpec proves the target dir holds no parquet), then
    * DIVERGE the clone only: delete region 0's rows (copy-on-write —
    * the source-referenced file is dereferenced, survivors re-stage
    * locally) and append a derived slice. Reading BOTH tables
    * side-tagged proves the source is byte-untouched while the clone
    * serves its own lineage — the oracle replays both states in SQL. */
  val q102ShallowClone: Q = (spark, dir) => {
    val n = Tables.load(spark, dir, "nation")
    val src = freshDir("graft-delta-clsrc")
    DeltaTable.write(n, src, "overwrite")
    val tgt = freshDir("graft-delta-cltgt")
    DeltaTable.shallowClone(src, tgt)
    DeltaTable.delete(spark, tgt, col("n_regionkey") === 0)
    DeltaTable.write(n.filter(col("n_regionkey") === 1)
      .withColumn("n_nationkey", col("n_nationkey") + 100), tgt, "append")
    val s = spark.read.format("graft-delta").load(src)
      .withColumn("side", lit("source"))
    val t = spark.read.format("graft-delta").load(tgt)
      .withColumn("side", lit("clone"))
    s.unionByName(t).groupBy("side", "n_regionkey")
      .agg(count(lit(1)).as("n_rows"), sum("n_nationkey").as("key_sum"))
      .orderBy("side", "n_regionkey")
  }

  val q102Oracle: String =
    """WITH clone AS (
      |  SELECT n_nationkey, n_regionkey FROM nation WHERE n_regionkey <> 0
      |  UNION ALL
      |  SELECT n_nationkey + 100, n_regionkey FROM nation WHERE n_regionkey = 1),
      |sides AS (
      |  SELECT 'source' AS side, n_nationkey, n_regionkey FROM nation
      |  UNION ALL
      |  SELECT 'clone' AS side, n_nationkey, n_regionkey FROM clone)
      |SELECT side, n_regionkey, COUNT(*) AS n_rows,
      |  CAST(SUM(n_nationkey) AS BIGINT) AS key_sum
      |FROM sides GROUP BY side, n_regionkey
      |ORDER BY side, n_regionkey""".stripMargin

  /** q103 — IDENTITY COLUMNS end-to-end ([EXT], the protocol's
    * engine-assigned surrogate keys, legacy writer 6 / the
    * `identityColumns` feature): nation lands WITHOUT the key; the
    * table assigns `sk` (START WITH 1000 INCREMENT BY 10) in input
    * order — deterministic here because the fixture is sorted into one
    * partition, so the oracle can replay the numbering as ROW_NUMBER.
    * A MERGE then proves the two hard guarantees: the matched row
    * KEEPS its surrogate key while its payload updates, and the insert
    * draws the next value beyond the committed high-water mark. */
  val q103Identity: Q = (spark, dir) => {
    val n = Tables.load(spark, dir, "nation")
      .select(col("n_nationkey").cast("int").as("n_nationkey"),
        col("n_name"))
      .orderBy("n_nationkey").coalesce(1)
    val t = freshDir("graft-delta-id")
    DeltaTable.write(n, t, "overwrite",
      identityColumns = Map("sk" -> ((1000L, 10L))))
    DeltaTable.merge(spark, t,
      spark.createDataFrame(Seq((0, "ALGERIA_RENAMED"), (900, "ATLANTIS")))
        .toDF("n_nationkey", "n_name").coalesce(1),
      Seq("n_nationkey"))
    // nation is 25 rows at every SF, so the pre-merge mark is the
    // literal 1240; the insert's key is beyond it but (by the identity
    // contract) not a specific value — gaps are protocol-legal — so
    // the projection tags post-mark keys instead of printing them
    spark.read.format("graft-delta").load(t)
      .select(col("n_nationkey"), col("n_name"),
        when(col("sk") <= 1240L, col("sk")).otherwise(lit(-1L)).as("sk_tag"))
      .orderBy("n_nationkey")
  }

  val q103Oracle: String =
    """WITH base AS (
      |  SELECT 1000 + 10*(ROW_NUMBER() OVER (ORDER BY n_nationkey) - 1)
      |    AS sk_tag, n_nationkey, n_name FROM nation),
      |merged AS (
      |  SELECT sk_tag, n_nationkey,
      |    CASE WHEN n_nationkey = 0 THEN 'ALGERIA_RENAMED' ELSE n_name END
      |      AS n_name
      |  FROM base
      |  UNION ALL SELECT -1, 900, 'ATLANTIS')
      |SELECT n_nationkey, n_name, CAST(sk_tag AS BIGINT) AS sk_tag
      |FROM merged ORDER BY n_nationkey""".stripMargin

  /** q104 — OPTIMIZE WHERE ([EXT], partition-scoped compaction): 4
    * single-file-per-partition writes scatter nation into 4 files per
    * region directory; `compactWhere(n_regionkey = 2)` rewrites ONLY
    * that partition down to one file. The result reads the LOG's
    * per-partition file counts alongside the data's row counts, so the
    * oracle literal pins both the rewrite (region 2 → 1 file) and the
    * non-rewrite (others keep 4) plus row conservation. */
  val q104CompactWhere: Q = (spark, dir) => {
    import org.apache.spark.sql.sources.EqualTo
    val n = Tables.load(spark, dir, "nation").coalesce(1)
    val t = freshDir("graft-delta-cw")
    n.write.format("graft-delta").partitionBy("n_regionkey")
      .mode("overwrite").save(t)
    for (_ <- 1 to 3)
      n.write.format("graft-delta").mode("append").save(t)
    DeltaTable.compactWhere(spark, t, Seq(EqualTo("n_regionkey", 2)))
    val snap = graft.sources.DeltaLog.snapshot(t)
    val fileCounts = spark.createDataFrame(
      snap.files.groupBy(_.partitionValues("n_regionkey")).toSeq
        .map { case (r, fs) => (r.toInt, fs.length) })
      .toDF("n_regionkey", "n_files")
    val rowCounts = spark.read.format("graft-delta").load(t)
      .groupBy("n_regionkey").agg(count(lit(1)).as("n_rows"))
    fileCounts.join(rowCounts, "n_regionkey")
      .select("n_regionkey", "n_files", "n_rows")
      .orderBy("n_regionkey")
  }

  val q104Oracle: String =
    """SELECT n_regionkey, n_files, CAST(n_rows AS BIGINT) AS n_rows
      |FROM (VALUES (0, 4, 20), (1, 4, 20), (2, 1, 20),
      |             (3, 4, 20), (4, 4, 20))
      |  t(n_regionkey, n_files, n_rows)
      |ORDER BY n_regionkey""".stripMargin

  /** q105 — METADATA-ONLY COUNT ([EXT], stock Delta's
    * OptimizeMetadataOnlyDeltaQuery capability): `COUNT(*)` on a
    * graft-delta table folds the log's per-file `stats.n` minus
    * deletion-vector cardinalities — zero data I/O (the
    * MetadataOnlyCount optimizer rule replaces the whole aggregate
    * with a LocalRelation; DeltaSpec asserts the plan is scan-free).
    * The query exercises the full lifecycle the count must stay exact
    * through: overwrite, append, then a VECTORED delete (the dead rows
    * are subtracted from a file nobody rewrote), plus a time-travel
    * count pinned at the pre-delete version. At 100 TB this is the
    * difference between answering `SELECT COUNT(*)` from the driver's
    * snapshot in milliseconds and scheduling a cluster pass over every
    * file footer. */
  val q105MetadataCount: Q = (spark, dir) => {
    val o = Tables.load(spark, dir, "orders")
    val t = freshDir("graft-delta-mc")
    DeltaTable.write(o, t, "overwrite")                        // v0
    DeltaTable.write(o.filter(col("o_custkey") <= 100), t, "append") // v1
    DeltaTable.enableDeletionVectors(t)                        // v2
    DeltaTable.delete(spark, t, col("o_orderstatus") === "P")  // v3
    val cur = spark.read.format("graft-delta").load(t)
      .groupBy().count()
      .select(lit("cur").as("state"), col("count").as("n_rows"))
    val v1 = spark.read.format("graft-delta")
      .option("versionAsOf", 1).load(t).groupBy().count()
      .select(lit("v1").as("state"), col("count").as("n_rows"))
    cur.unionByName(v1).orderBy("state")
  }

  val q105Oracle: String =
    """WITH v1 AS (
      |  SELECT * FROM orders
      |  UNION ALL SELECT * FROM orders WHERE o_custkey <= 100)
      |SELECT 'cur' AS state,
      |  (SELECT COUNT(*) FROM v1 WHERE o_orderstatus <> 'P') AS n_rows
      |UNION ALL
      |SELECT 'v1', (SELECT COUNT(*) FROM v1)
      |ORDER BY state""".stripMargin

  /** q106 — TYPE WIDENING end-to-end ([EXT], the protocol's
    * `typeWidening` feature): supplier lands with INT keys and FLOAT
    * balances; two metadata-only commits widen them to BIGINT / DOUBLE
    * (zero data files move — DeltaSpec proves it); an append then
    * lands keys beyond the INT range, which is the production story —
    * "ids outgrew int32" as one log commit instead of a 100 TB
    * rewrite. The read aggregates across BOTH encodings (old files
    * up-convert in the reader, still vectorized), using only
    * order-independent aggregates on the double column (float→double
    * is exact per value; a double SUM would be order-sensitive). */
  val q106TypeWidening: Q = (spark, dir) => {
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val s = Tables.load(spark, dir, "supplier")
      .select(col("s_suppkey").cast("int").as("sk"),
        col("s_nationkey"),
        col("s_acctbal").cast("float").as("bal"))
    val t = freshDir("graft-delta-tw")
    DeltaTable.write(s, t, "overwrite")               // v0 (int, float)
    DeltaTable.alterColumnType(t, "sk", LongType)     // v1 (metadata)
    DeltaTable.alterColumnType(t, "bal", DoubleType)  // v2 (metadata)
    val extra = Tables.load(spark, dir, "supplier")
      .filter(col("s_suppkey") <= 5)
      .select((col("s_suppkey") + 4_000_000_000L).as("sk"),
        col("s_nationkey"),
        col("s_acctbal").cast("double").as("bal"))
    DeltaTable.write(extra, t, "append")              // v3 (wide)
    spark.read.format("graft-delta").load(t)
      .groupBy("s_nationkey")
      .agg(count(lit(1)).as("n_rows"), sum(col("sk")).as("sk_sum"),
        min(col("bal")).as("min_bal"), max(col("bal")).as("max_bal"))
      .orderBy("s_nationkey")
  }

  val q106Oracle: String =
    """WITH t AS (
      |  SELECT CAST(s_suppkey AS BIGINT) AS sk, s_nationkey,
      |    CAST(CAST(s_acctbal AS REAL) AS DOUBLE) AS bal FROM supplier
      |  UNION ALL
      |  SELECT s_suppkey + 4000000000, s_nationkey,
      |    CAST(s_acctbal AS DOUBLE)
      |  FROM supplier WHERE s_suppkey <= 5)
      |SELECT s_nationkey, COUNT(*) AS n_rows,
      |  CAST(SUM(sk) AS BIGINT) AS sk_sum,
      |  MIN(bal) AS min_bal, MAX(bal) AS max_bal
      |FROM t GROUP BY 1 ORDER BY 1""".stripMargin

  /** q107 — IN-COMMIT TIMESTAMPS end-to-end ([EXT], the protocol's
    * `inCommitTimestamp` writer feature): after enablement every
    * commit's commitInfo carries an engine-assigned strictly-monotone
    * timestamp, and `timestampAsOf` resolves against THAT — not file
    * mtimes (which a backup/restore scrambles) or writer wall clocks
    * (which skew). The query time-travels to the ICT of the middle
    * append and must see exactly versions ≤ it (DeltaSpec additionally
    * proves resolution survives scrambled mtimes and forged skew). */
  val q107IctTimeTravel: Q = (spark, dir) => {
    val n = Tables.load(spark, dir, "nation")
    val t = freshDir("graft-delta-ict")
    DeltaTable.write(n, t, "overwrite")                 // v0
    DeltaTable.enableInCommitTimestamps(t)              // v1
    DeltaTable.write(n.filter(col("n_regionkey") === 0)
      .withColumn("n_nationkey", col("n_nationkey") + 50), t, "append") // v2
    DeltaTable.write(n.filter(col("n_regionkey") === 1)
      .withColumn("n_nationkey", col("n_nationkey") + 100), t, "append") // v3
    val at2 = graft.sources.DeltaLog.inCommitTimestamp(t, 2L).get
    spark.read.format("graft-delta")
      .option("timestampAsOf", at2.toString).load(t)
      .groupBy("n_regionkey")
      .agg(count(lit(1)).as("n_rows"), sum("n_nationkey").as("key_sum"))
      .orderBy("n_regionkey")
  }

  val q107Oracle: String =
    """WITH v2 AS (
      |  SELECT n_nationkey, n_regionkey FROM nation
      |  UNION ALL
      |  SELECT n_nationkey + 50, n_regionkey FROM nation
      |  WHERE n_regionkey = 0)
      |SELECT n_regionkey, COUNT(*) AS n_rows,
      |  CAST(SUM(n_nationkey) AS BIGINT) AS key_sum
      |FROM v2 GROUP BY 1 ORDER BY 1""".stripMargin

  /** q108 — ROW TRACKING end-to-end ([EXT], the protocol's stable row
    * identity, writer feature `rowTracking` + `domainMetadata`):
    * nation lands single-file in key order, enablement BACKFILLS ids
    * 0..24 (deterministic, so the oracle replays them as
    * ROW_NUMBER-1), a vectored DELETE kills region 3 (survivors keep
    * their ids — no rows move), COMPACT absorbs the vector while
    * MATERIALIZING the survivors' original ids into the rewritten
    * file (the feature's core promise: layout maintenance never
    * invalidates id-keyed consumers), and an append draws fresh ids
    * beyond the high-water mark. The read surfaces `_row_id` next to
    * the business key — hash-verified end to end. */
  val q108RowTracking: Q = (spark, dir) => {
    val n = Tables.load(spark, dir, "nation")
      .select(col("n_nationkey").cast("int").as("n_nationkey"),
        col("n_name"), col("n_regionkey"))
      .orderBy("n_nationkey").coalesce(1)
    val t = freshDir("graft-delta-rowtrack")
    DeltaTable.write(n, t, "overwrite")                   // v0
    DeltaTable.enableRowTracking(t)                       // v1: ids 0..24
    DeltaTable.enableDeletionVectors(t)                   // v2
    DeltaTable.delete(spark, t, col("n_regionkey") === 3) // v3 (vectored)
    DeltaTable.compact(spark, t)                          // v4 (materialize)
    DeltaTable.write(n.filter(col("n_regionkey") === 0)
      .withColumn("n_nationkey", col("n_nationkey") + 100)
      .orderBy("n_nationkey").coalesce(1), t, "append")   // v5: ids 25..29
    DeltaTable.readWithRowIds(spark, t)
      .select(col("n_nationkey"), col("n_name"), col("_row_id"))
      .orderBy("n_nationkey")
  }

  val q108Oracle: String =
    """WITH base AS (
      |  SELECT n_nationkey, n_name, n_regionkey,
      |    ROW_NUMBER() OVER (ORDER BY n_nationkey) - 1 AS rid
      |  FROM nation),
      |app AS (
      |  SELECT n_nationkey + 100 AS n_nationkey, n_name,
      |    24 + ROW_NUMBER() OVER (ORDER BY n_nationkey) AS rid
      |  FROM nation WHERE n_regionkey = 0)
      |SELECT n_nationkey, n_name, CAST(rid AS BIGINT) AS _row_id
      |FROM (SELECT n_nationkey, n_name, rid FROM base WHERE n_regionkey <> 3
      |      UNION ALL SELECT * FROM app)
      |ORDER BY n_nationkey""".stripMargin

  /** q110 — SQL DDL surface end-to-end ([EXT], round 10: the
    * reference's users speak SQL strings,
    * examples/read_deltalake_hdfs.py:100-118): the full maintenance
    * lifecycle driven through `spark.sql` and the injected
    * [[graft.sources.GraftSqlParser]] — ALTER TABLE ADD CONSTRAINT,
    * SET TBLPROPERTIES, OPTIMIZE, DESCRIBE HISTORY, DESCRIBE DETAIL,
    * and a `delta.`path`` SELECT. The result is the table's history
    * (operation + file movement per version) plus a summary row
    * (row count, final file count), all literal-pinned by the oracle:
    * the constraint/property commits move zero files, OPTIMIZE swaps
    * 4-for-1, and the data survives untouched. */
  val q110SqlDdl: Q = (spark, dir) => {
    val n = Tables.load(spark, dir, "nation").coalesce(1)
    val t = freshDir("graft-delta-sqlddl")
    n.write.format("graft-delta").mode("overwrite").save(t)        // v0
    for (_ <- 1 to 3)
      n.write.format("graft-delta").mode("append").save(t)         // v1-v3
    spark.sql(s"ALTER TABLE delta.`$t` ADD CONSTRAINT valid_region " +
      "CHECK (n_regionkey >= 0)")                                  // v4
    spark.sql(s"ALTER TABLE delta.`$t` SET TBLPROPERTIES " +
      "('graft.pipeline' = 'ddl-demo')")                           // v5
    spark.sql(s"OPTIMIZE delta.`$t`").collect()                    // v6
    val hist = spark.sql(s"DESCRIBE HISTORY delta.`$t`")
      .select(col("version"), col("operation"),
        col("num_adds"), col("num_removes"))
    val nFiles = spark.sql(s"DESCRIBE DETAIL delta.`$t`")
      .select("num_files").head.getLong(0)
    val summary = spark.sql(s"SELECT COUNT(*) AS c FROM delta.`$t`")
      .select(lit(100L).as("version"), lit("SUMMARY").as("operation"),
        col("c").as("num_adds"), lit(nFiles).as("num_removes"))
    hist.unionByName(summary).orderBy("version")
  }

  val q110Oracle: String =
    """SELECT version, operation, num_adds, num_removes FROM (
      |  SELECT * FROM (
      |    VALUES (0, 'OVERWRITE', 1, 0), (1, 'APPEND', 1, 0),
      |           (2, 'APPEND', 1, 0), (3, 'APPEND', 1, 0),
      |           (4, 'ADD CONSTRAINT', 0, 0),
      |           (5, 'SET TBLPROPERTIES', 0, 0), (6, 'COMPACT', 1, 4))
      |    t(version, operation, num_adds, num_removes)
      |  UNION ALL
      |  SELECT 100, 'SUMMARY', (SELECT COUNT(*) * 4 FROM nation), 1)
      |ORDER BY version""".stripMargin

  /** q111 — V2 CHECKPOINTS end-to-end ([EXT], the protocol's
    * `v2Checkpoint` feature, round 10): enable the policy, append,
    * vacuum (which snapshots the horizon as a MANIFEST + SIDECARS and
    * prunes the prefix), then append past the checkpoint and read the
    * table back — the replay crosses the v2 checkpoint through its
    * sidecar references plus the tail version file. The oracle derives
    * the per-region counts from the same append arithmetic, so a
    * half-replayed snapshot (manifest without sidecars, or vice versa)
    * hash-fails. DeltaSpec pins the file shapes; validator invariant
    * 21 guards the wire format. */
  val q111V2Checkpoint: Q = (spark, dir) => {
    val n = Tables.load(spark, dir, "nation").coalesce(1)
    val t = freshDir("graft-delta-v2c")
    DeltaTable.write(n, t, "overwrite")                         // v0
    DeltaTable.enableV2Checkpoints(t)                           // v1
    n.filter(col("n_regionkey") === 2)
      .write.format("graft-delta").mode("append").save(t)      // v2
    DeltaTable.vacuum(t, 1) // v2-shape checkpoint at v2, prefix pruned
    n.filter(col("n_regionkey") === 0)
      .write.format("graft-delta").mode("append").save(t)      // v3
    spark.read.format("graft-delta").load(t)
      .groupBy("n_regionkey").agg(count(lit(1)).as("n_rows"))
      .orderBy("n_regionkey")
  }

  val q111Oracle: String =
    """SELECT n_regionkey,
      |  CAST(COUNT(*) + CASE WHEN n_regionkey IN (0, 2)
      |                  THEN COUNT(*) ELSE 0 END AS BIGINT) AS n_rows
      |FROM nation GROUP BY 1 ORDER BY 1""".stripMargin

  /** q112 — SQL DML surface end-to-end ([EXT], round 11, completing
    * q110's DDL arc): DELETE FROM / UPDATE … SET / MERGE INTO on a
    * `delta.`path`` table, driven purely through `spark.sql` and the
    * injected [[graft.sources.GraftSqlParser]]. The fixture is the
    * nation table; the statements delete region 3, give region 0 a
    * derived comment-length column bump, and MERGE-upsert a source
    * that updates 5 existing keys and inserts 5 new ones — then the
    * final table reads back through a `delta.`path`` SELECT with the
    * per-region aggregate the oracle replays over the same DML
    * algebra. Every statement's committed version is also asserted
    * (the history length pins that each DML was exactly one commit). */
  val q112SqlDml: Q = (spark, dir) => {
    val n = Tables.load(spark, dir, "nation")
      .select(col("n_nationkey").cast("long").as("n_nationkey"),
        col("n_name"), col("n_regionkey").cast("long").as("n_regionkey"),
        org.apache.spark.sql.functions.length(col("n_name"))
          .cast("long").as("clen"))
      .coalesce(1)
    val t = freshDir("graft-delta-sqldml")
    n.write.format("graft-delta").mode("overwrite").save(t)      // v0
    spark.sql(s"DELETE FROM delta.`$t` WHERE n_regionkey = 3")   // v1
    spark.sql(s"UPDATE delta.`$t` SET clen = clen + 1000 " +
      "WHERE n_regionkey = 0")                                   // v2
    // merge source: 5 updated keys (0..4 with clen = -1) and 5 fresh
    // keys (100..104), derived deterministically from the fixture
    spark.sql(
      s"""SELECT n_nationkey, n_name, n_regionkey, CAST(-1 AS BIGINT) AS clen
         |FROM delta.`$t` WHERE n_nationkey < 5
         |UNION ALL
         |SELECT n_nationkey + 100, concat(n_name, '_NEW'), n_regionkey,
         |  CAST(7 AS BIGINT) AS clen
         |FROM delta.`$t` WHERE n_nationkey < 5""".stripMargin)
      .createOrReplaceTempView("q112_src")
    spark.sql(s"MERGE INTO delta.`$t` AS tgt USING q112_src AS src " +
      "ON tgt.n_nationkey = src.n_nationkey " +
      "WHEN MATCHED THEN UPDATE SET * " +
      "WHEN NOT MATCHED THEN INSERT *")                          // v3
    val nVersions = spark.sql(s"DESCRIBE HISTORY delta.`$t`").count()
    spark.sql(
      s"""SELECT n_regionkey, COUNT(*) AS n_rows,
         |  CAST(SUM(clen) AS BIGINT) AS clen_sum,
         |  CAST($nVersions AS BIGINT) AS n_versions
         |FROM delta.`$t` GROUP BY n_regionkey
         |ORDER BY n_regionkey""".stripMargin)
  }

  val q112Oracle: String =
    """WITH base AS (
      |  SELECT CAST(n_nationkey AS BIGINT) AS n_nationkey, n_name,
      |    CAST(n_regionkey AS BIGINT) AS n_regionkey,
      |    CAST(LENGTH(n_name) AS BIGINT) AS clen
      |  FROM nation),
      |deleted AS (SELECT * FROM base WHERE n_regionkey <> 3),
      |updated AS (
      |  SELECT n_nationkey, n_name, n_regionkey,
      |    CASE WHEN n_regionkey = 0 THEN clen + 1000 ELSE clen END AS clen
      |  FROM deleted),
      |merged AS (
      |  SELECT n_nationkey, n_name, n_regionkey,
      |    CASE WHEN n_nationkey < 5 THEN -1 ELSE clen END AS clen
      |  FROM updated
      |  UNION ALL
      |  SELECT n_nationkey + 100, n_name || '_NEW', n_regionkey, 7
      |  FROM updated WHERE n_nationkey < 5)
      |SELECT n_regionkey, COUNT(*) AS n_rows,
      |  CAST(SUM(clen) AS BIGINT) AS clen_sum,
      |  CAST(4 AS BIGINT) AS n_versions
      |FROM merged GROUP BY 1 ORDER BY 1""".stripMargin

  /** q113 — SQL TIME TRAVEL ([EXT], round 11): `VERSION AS OF n` and
    * `TIMESTAMP AS OF ts` on `delta.`path`` relations, resolved at
    * parse time against the same version/timestamp index the options
    * API uses. The fixture commits three versions (overwrite, append,
    * vectored delete); the query reads v0, v1 and the latest PLUS a
    * `TIMESTAMP AS OF` read pinned to v1's recorded commit timestamp
    * — all four through pure SQL — and emits one count row per read.
    * v2 is a DV delete, so the latest read also proves time travel
    * composes with deletion vectors. */
  val q113SqlTimeTravel: Q = (spark, dir) => {
    val n = Tables.load(spark, dir, "nation").coalesce(1)
    val t = freshDir("graft-delta-sqltt")
    DeltaTable.write(n, t, "overwrite")                          // v0
    DeltaTable.write(n.filter(col("n_regionkey") === 1).coalesce(1),
      t, "append")                                               // v1
    DeltaTable.enableDeletionVectors(t)                          // v2
    DeltaTable.delete(spark, t, col("n_regionkey") === 2)        // v3
    val v1Ts = new java.sql.Timestamp(
      graft.sources.DeltaLog.commitTimestamps(t)
        .find(_._1 == 1L).get._2)
    spark.sql(
      s"""SELECT 'v0' AS at, COUNT(*) AS n_rows
         |FROM delta.`$t` VERSION AS OF 0
         |UNION ALL
         |SELECT 'v1', COUNT(*) FROM delta.`$t` VERSION AS OF 1
         |UNION ALL
         |SELECT 'v1_ts', COUNT(*) FROM delta.`$t`
         |  TIMESTAMP AS OF '$v1Ts'
         |UNION ALL
         |SELECT 'latest', COUNT(*) FROM delta.`$t`
         |ORDER BY at""".stripMargin)
  }

  val q113Oracle: String =
    """SELECT at, CAST(n_rows AS BIGINT) AS n_rows FROM (
      |  SELECT 'v0' AS at, COUNT(*) AS n_rows FROM nation
      |  UNION ALL
      |  SELECT 'v1', COUNT(*) + SUM(CASE WHEN n_regionkey = 1 THEN 1
      |    ELSE 0 END) FROM nation
      |  UNION ALL
      |  SELECT 'v1_ts', COUNT(*) + SUM(CASE WHEN n_regionkey = 1 THEN 1
      |    ELSE 0 END) FROM nation
      |  UNION ALL
      |  SELECT 'latest', COUNT(*) + SUM(CASE WHEN n_regionkey = 1 THEN 1
      |    WHEN n_regionkey = 2 THEN -1 ELSE 0 END) FROM nation)
      |ORDER BY at""".stripMargin

  /** q123 — CONVERT TO DELTA ([EXT], round 11, stock Delta's in-place
    * parquet adoption): a pre-existing Hive-partitioned plain-parquet
    * dataset becomes a delta table with ONE metadata commit — no byte
    * of data moves (at 100 TB the difference between a day-long
    * rewrite and a listing walk). The converted table is then proven a
    * full citizen: SQL DELETE rewrites one partition's files, the read
    * back prunes on the partition column, and the final aggregate
    * replays the convert + DML algebra against the source table. The
    * PARTITIONED BY clause cross-checks the declared layout against
    * the directories (a mismatch refuses loudly — StorageSpec). */
  val q123ConvertToDelta: Q = (spark, dir) => {
    val c = Tables.load(spark, dir, "customer")
    val t = freshDir("graft-convert")
    c.write.partitionBy("c_mktsegment").parquet(t) // NOT a delta table
    spark.sql(s"CONVERT TO DELTA parquet.`$t` " +
      "PARTITIONED BY (c_mktsegment STRING)").collect()          // v0
    spark.sql(s"DELETE FROM delta.`$t` WHERE c_custkey <= 100")
      .collect()                                                 // v1
    DeltaTable.read(spark, t)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_rows"),
        graft.functions.Exact.moneySum(col("c_acctbal")).as("total_bal"))
      .orderBy("c_mktsegment")
  }

  val q123Oracle: String =
    """SELECT c_mktsegment, COUNT(*) AS n_rows,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal
      |FROM customer WHERE c_custkey > 100
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** q124 — SQL CTAS + SHALLOW CLONE ([EXT], round 11, completing the
    * SQL DDL arc): `CREATE TABLE delta.`path` … AS SELECT` routes a
    * full Spark SELECT into a partitioned delta sink, `CREATE OR
    * REPLACE` overwrites it (the replaced version stays
    * time-travelable), and `CREATE TABLE … SHALLOW CLONE … VERSION AS
    * OF 0` snapshots the pre-replace state as a zero-copy metadata
    * table. The result reads the clone per-region plus the replaced
    * table's count — so a clone that resolved the wrong version, or a
    * replace that merged instead of overwrote, hash-fails. */
  val q124SqlCtas: Q = (spark, dir) => {
    Tables.load(spark, dir, "nation").createOrReplaceTempView("q124_nation")
    val t = freshDir("graft-ctas")
    val t2 = freshDir("graft-ctas-clone")
    spark.sql(s"CREATE TABLE delta.`$t` USING DELTA " +
      "PARTITIONED BY (n_regionkey) AS " +
      "SELECT n_nationkey, n_name, n_regionkey FROM q124_nation")
      .collect()                                                 // v0
    spark.sql(s"CREATE OR REPLACE TABLE delta.`$t` AS " +
      "SELECT n_nationkey, n_name, n_regionkey FROM q124_nation " +
      "WHERE n_regionkey <= 2").collect()                        // v1
    spark.sql(s"CREATE TABLE delta.`$t2` SHALLOW CLONE delta.`$t` " +
      "VERSION AS OF 0").collect()
    spark.sql(
      s"""SELECT CONCAT('clone_r', n_regionkey) AS at,
         |  COUNT(*) AS n_rows
         |FROM delta.`$t2` GROUP BY n_regionkey
         |UNION ALL
         |SELECT 'replaced', COUNT(*) FROM delta.`$t`
         |ORDER BY at""".stripMargin)
  }

  val q124Oracle: String =
    """SELECT CONCAT('clone_r', n_regionkey) AS at,
      |  COUNT(*) AS n_rows
      |FROM nation GROUP BY n_regionkey
      |UNION ALL
      |SELECT 'replaced', COUNT(*) FROM nation WHERE n_regionkey <= 2
      |ORDER BY at""".stripMargin

  /** q125 — COPY INTO ([EXT], round 11, the SQL ingestion idiom): a
    * growing landing zone loads into a delta table exactly once per
    * source file, the ledger riding the table's own log (per-file
    * domainMetadata committed atomically with the data). The fixture
    * loads batch 1, RE-RUNS the same statement (must be a 0-file
    * no-op — that row is part of the oracle), drops batch 2 into the
    * zone and runs again (must load ONLY the gain). The per-region
    * counts then match the source exactly: any double-load or skip
    * hash-fails. */
  val q125CopyInto: Q = (spark, dir) => {
    val n = Tables.load(spark, dir, "nation")
    val t = freshDir("graft-copyinto")
    val src = freshDir("graft-copyinto-src")
    DeltaTable.write(n.limit(0).coalesce(1), t, "overwrite") // empty shell
    n.filter(col("n_regionkey") <= 1).coalesce(1)
      .write.parquet(s"$src/batch1")
    spark.sql(s"COPY INTO delta.`$t` FROM '$src'").collect()
    val rerun = spark.sql(
      s"COPY INTO delta.`$t` FROM '$src' FILEFORMAT = PARQUET")
      .head.getLong(1) // idempotent re-run: 0 files
    n.filter(col("n_regionkey") >= 2).coalesce(1)
      .write.parquet(s"$src/batch2")
    spark.sql(s"COPY INTO delta.`$t` FROM '$src'").collect()
    DeltaTable.read(spark, t)
      .groupBy("n_regionkey").agg(count(lit(1)).as("n_rows"))
      .withColumn("rerun_files", lit(rerun))
      .orderBy("n_regionkey")
  }

  val q125Oracle: String =
    """SELECT n_regionkey, COUNT(*) AS n_rows,
      |  CAST(0 AS BIGINT) AS rerun_files
      |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin

  /** q128 — table_changes TVF ([EXT], round 11): the public CDF SQL
    * idiom — `SELECT … FROM table_changes('/path', from, to)` —
    * resolved by the injected table function to the SAME plan
    * `DeltaTable.changes` builds, so the SQL and Scala feeds cannot
    * diverge. Fixture: CDF-enabled nation table, append (v2) + DELETE
    * (v3); the query aggregates the feed per (change type, region) —
    * inserts from the append's add actions, deletes from the DML's
    * `_change_data` sidecar — and the oracle replays the same algebra
    * over the source table. */
  val q128TableChangesSql: Q = (spark, dir) => {
    val n = Tables.load(spark, dir, "nation").coalesce(1)
    val t = freshDir("graft-tvf-cdf")
    DeltaTable.write(n, t, "overwrite")                            // v0
    DeltaTable.setTableProperty(t, "delta.enableChangeDataFeed", "true") // v1
    DeltaTable.write(n.filter(col("n_regionkey") <= 1).coalesce(1),
      t, "append")                                                 // v2
    DeltaTable.delete(spark, t, col("n_regionkey") === 3)          // v3
    spark.sql(
      s"""SELECT _change_type, n_regionkey, COUNT(*) AS n
         |FROM table_changes('$t', 2, 3)
         |GROUP BY _change_type, n_regionkey
         |ORDER BY _change_type, n_regionkey""".stripMargin)
  }

  val q128Oracle: String =
    """SELECT _change_type, n_regionkey, COUNT(*) AS n FROM (
      |  SELECT 'insert' AS _change_type, n_regionkey FROM nation
      |  WHERE n_regionkey <= 1
      |  UNION ALL
      |  SELECT 'delete', n_regionkey FROM nation WHERE n_regionkey = 3)
      |GROUP BY _change_type, n_regionkey
      |ORDER BY _change_type, n_regionkey""".stripMargin

  /** q130 — SQL INSERT ([EXT], round 11, the standard write idiom):
    * `INSERT INTO delta.`path`` with a VALUES list and with a SELECT,
    * then `INSERT OVERWRITE` on a PARTITIONED table — which must
    * replace the data while KEEPING the committed partition layout,
    * and the pre-overwrite state stays time-travelable. The final
    * result unions the overwritten table's per-region counts with the
    * v-before-overwrite count, so a positional-cast bug, a dropped
    * partition layout, or an overwrite that merged instead of
    * replaced all hash-fail. */
  val q130SqlInsert: Q = (spark, dir) => {
    val n = Tables.load(spark, dir, "nation")
    n.createOrReplaceTempView("q130_nation")
    val t = freshDir("graft-sql-insert")
    spark.sql(s"CREATE TABLE delta.`$t` PARTITIONED BY (n_regionkey) AS " +
      "SELECT n_nationkey, n_name, n_regionkey FROM q130_nation " +
      "WHERE n_regionkey = 0").collect()                          // v0
    spark.sql(s"INSERT INTO delta.`$t` VALUES " +
      "(900, 'ATLANTIS', 9), (901, 'ELDORADO', 9)").collect()    // v1
    spark.sql(s"INSERT INTO delta.`$t` SELECT n_nationkey, n_name, " +
      "n_regionkey FROM q130_nation WHERE n_regionkey = 1").collect() // v2
    val nBefore = spark.sql(s"SELECT COUNT(*) FROM delta.`$t`")
      .head.getLong(0)
    spark.sql(s"INSERT OVERWRITE delta.`$t` SELECT n_nationkey, " +
      "n_name, n_regionkey FROM q130_nation WHERE n_regionkey >= 3")
      .collect()                                                  // v3
    val perRegion = spark.sql(
      s"""SELECT CONCAT('r', n_regionkey) AS at, COUNT(*) AS n_rows
         |FROM delta.`$t` GROUP BY n_regionkey""".stripMargin)
    perRegion.unionByName(spark.sql(
        s"SELECT 'pre_overwrite' AS at, COUNT(*) AS n_rows " +
          s"FROM delta.`$t` VERSION AS OF 2"))
      .withColumn("check_pre", lit(nBefore))
      .orderBy("at")
  }

  val q130Oracle: String =
    """WITH pre AS (
      |  SELECT CAST(COUNT(*) + 2 AS BIGINT) AS n FROM nation
      |  WHERE n_regionkey <= 1)
      |SELECT at, n_rows, (SELECT n FROM pre) AS check_pre FROM (
      |  SELECT CONCAT('r', n_regionkey) AS at, COUNT(*) AS n_rows
      |  FROM nation WHERE n_regionkey >= 3 GROUP BY n_regionkey
      |  UNION ALL
      |  SELECT 'pre_overwrite', (SELECT n FROM pre))
      |ORDER BY at""".stripMargin

  val queries: Map[String, Q] = Map(
    "q130_sql_insert" -> q130SqlInsert,
    "q128_table_changes_sql" -> q128TableChangesSql,
    "q125_copy_into" -> q125CopyInto,
    "q124_sql_ctas" -> q124SqlCtas,
    "q123_convert_to_delta" -> q123ConvertToDelta,
    "q113_sql_timetravel" -> q113SqlTimeTravel,
    "q112_sql_dml" -> q112SqlDml,
    "q111_v2_checkpoint" -> q111V2Checkpoint,
    "q110_sql_ddl" -> q110SqlDdl,
    "q108_row_tracking" -> q108RowTracking,
    "q107_ict_timetravel" -> q107IctTimeTravel,
    "q106_type_widening" -> q106TypeWidening,
    "q105_metadata_count" -> q105MetadataCount,
    "q104_compact_where" -> q104CompactWhere,
    "q103_identity" -> q103Identity,
    "q102_shallow_clone" -> q102ShallowClone,
    "q101_generated_partition" -> q101GeneratedPartition,
    "q100_dv_delete" -> q100DvDelete,
    "q84_column_mapping" -> q84ColumnMapping,
    "q88_delta_detail" -> q88DeltaDetail,
    "q87_delta_constraint" -> q87DeltaConstraint,
    "q85_delta_zorder" -> q85DeltaZorder,
    "q83_incremental_agg" -> q83IncrementalAgg,
    "q80_delta_changes" -> q80DeltaChanges,
    "q94_delta_update" -> q94DeltaUpdate,
    "q68_delta_delete" -> q68DeltaDelete,
    "q69_delta_merge" -> q69DeltaMerge,
    "q67_partitioned_delta" -> q67PartitionedDelta,
    "q64_delta_format_api" -> q64DeltaFormatApi,
    "q65_delta_short_name" -> q65DeltaShortName,
    "q66_delta_compact" -> q66DeltaCompact,
    "q58_delta_history" -> q58DeltaHistory,
    "q59_delta_restore" -> q59DeltaRestore,
    "q60_delta_roundtrip" -> q60DeltaRoundtrip,
    "q61_delta_timetravel" -> q61DeltaTimeTravel,
    "q62_partitioned_write" -> q62PartitionedWrite,
    "q63_parquet_overwrite" -> q63ParquetOverwrite)

  val oracles: Map[String, String] = Map(
    "q130_sql_insert" -> q130Oracle,
    "q128_table_changes_sql" -> q128Oracle,
    "q125_copy_into" -> q125Oracle,
    "q124_sql_ctas" -> q124Oracle,
    "q123_convert_to_delta" -> q123Oracle,
    "q113_sql_timetravel" -> q113Oracle,
    "q112_sql_dml" -> q112Oracle,
    "q111_v2_checkpoint" -> q111Oracle,
    "q110_sql_ddl" -> q110Oracle,
    "q108_row_tracking" -> q108Oracle,
    "q107_ict_timetravel" -> q107Oracle,
    "q106_type_widening" -> q106Oracle,
    "q105_metadata_count" -> q105Oracle,
    "q104_compact_where" -> q104Oracle,
    "q103_identity" -> q103Oracle,
    "q102_shallow_clone" -> q102Oracle,
    "q101_generated_partition" -> q101Oracle,
    "q100_dv_delete" -> q100Oracle,
    "q84_column_mapping" -> q84Oracle,
    "q88_delta_detail" -> q88Oracle,
    "q87_delta_constraint" -> q87Oracle,
    "q85_delta_zorder" -> q85Oracle,
    "q83_incremental_agg" -> q83Oracle,
    "q80_delta_changes" -> q80Oracle,
    "q94_delta_update" -> q94Oracle,
    "q68_delta_delete" -> q68Oracle,
    "q69_delta_merge" -> q69Oracle,
    "q67_partitioned_delta" -> q67Oracle,
    "q64_delta_format_api" -> q64Oracle,
    "q65_delta_short_name" -> q65Oracle,
    "q66_delta_compact" -> q66Oracle,
    "q58_delta_history" -> q58Oracle,
    "q59_delta_restore" -> q59Oracle,
    "q60_delta_roundtrip" -> q60Oracle,
    "q61_delta_timetravel" -> q61Oracle,
    "q62_partitioned_write" -> q62Oracle,
    "q63_parquet_overwrite" -> q63Oracle)
}
