package graft

import org.apache.spark.sql.functions.{col, lit}
import graft.sources.{DeltaLog, DeltaTable}

/** The round-10 SQL DDL surface (GraftSqlParser via GraftExtensions):
  * every path-addressed maintenance statement must hit the same
  * DeltaTable API the Scala surface uses, and everything else must
  * delegate to Spark's parser untouched. */
class GraftSqlSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): String = java.nio.file.Files
    .createTempDirectory("graft-sql-spec").resolve("t").toString

  private def threeRows = Seq(
    (1, "Alice", 75000L), (2, "Bob", 65000L), (3, "Carol", 80000L))
    .toDF("id", "name", "salary")

  test("OPTIMIZE compacts; the statement returns the committed version") {
    val t = freshTable()
    DeltaTable.write(threeRows.repartition(3), t, "overwrite")
    assert(DeltaLog.snapshot(t).files.length === 3)
    val out = spark.sql(s"OPTIMIZE delta.`$t`").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L))
    assert(DeltaLog.snapshot(t).files.length === 1)
    // content unchanged
    assert(spark.read.format("graft-delta").load(t).count() === 3)
  }

  test("OPTIMIZE WHERE compacts only the matching partition") {
    val t = freshTable()
    // two appends of one file per partition value -> 2 files per seg
    val df = Seq((1, "a"), (3, "b")).toDF("id", "seg").coalesce(1)
    DeltaTable.write(df, t, "overwrite", partitionBy = Seq("seg"))
    DeltaTable.write(Seq((2, "a"), (4, "b")).toDF("id", "seg").coalesce(1),
      t, "append")
    val before = DeltaLog.snapshot(t).files
      .groupBy(_.partitionValues("seg")).view.mapValues(_.length).toMap
    assert(before("a") === 2 && before("b") === 2)
    spark.sql(s"OPTIMIZE '$t' WHERE seg = 'a'").collect()
    val after = DeltaLog.snapshot(t).files
      .groupBy(_.partitionValues("seg")).view.mapValues(_.length).toMap
    assert(after("a") === 1, s"partition a must compact: $after")
    assert(after("b") === 2, s"partition b must be untouched: $after")
  }

  test("OPTIMIZE ZORDER BY clusters; WHERE+ZORDER refuses") {
    val t = freshTable()
    DeltaTable.write((0 until 64).map(i => (i, i % 8, i / 8))
      .toDF("id", "x", "y").repartition(8), t, "overwrite")
    spark.sql(s"OPTIMIZE delta.`$t` ZORDER BY (x, y)").collect()
    assert(spark.read.format("graft-delta").load(t).count() === 64)
    // commitInfo records the zorder operation
    val ops = DeltaTable.history(spark, t).select("operation")
      .as[String].collect()
    assert(ops.contains("ZORDER"), s"history: ${ops.toSeq}")
    intercept[IllegalArgumentException] {
      spark.sql(s"OPTIMIZE delta.`$t` WHERE x = 1 ZORDER BY (x, y)")
    }
  }

  test("VACUUM collects unreferenced files; RETAIN n HOURS keeps " +
      "recent versions") {
    val t = freshTable()
    DeltaTable.write(threeRows.coalesce(1), t, "overwrite")      // v0
    DeltaTable.write(threeRows.coalesce(1), t, "overwrite")      // v1
    // everything is recent: a 168-hour retention deletes nothing
    assert(spark.sql(s"VACUUM delta.`$t` RETAIN 168 HOURS").collect()
      .isEmpty)
    // default vacuum keeps only the latest version
    val deleted = spark.sql(s"VACUUM delta.`$t`").collect()
      .map(_.getString(0))
    assert(deleted.nonEmpty, "v0's file must be collected")
    assert(spark.read.format("graft-delta").load(t).count() === 3)
  }

  test("DESCRIBE HISTORY / DETAIL match the Scala DataFrames exactly") {
    val t = freshTable()
    DeltaTable.write(threeRows.coalesce(1), t, "overwrite")
    DeltaTable.write(threeRows.coalesce(1), t, "append")
    val viaSql = spark.sql(s"DESCRIBE HISTORY delta.`$t`").collect().toSeq
    val viaApi = DeltaTable.history(spark, t).collect().toSeq
    assert(viaSql === viaApi)
    assert(viaSql.map(_.getLong(0)) === Seq(1L, 0L))
    val dSql = spark.sql(s"DESCRIBE DETAIL delta.`$t`").collect().toSeq
    val dApi = DeltaTable.detail(spark, t).collect().toSeq
    assert(dSql === dApi)
    assert(dSql.head.getLong(1) === 2L) // num_files
  }

  test("RESTORE TO VERSION AS OF rolls the table back") {
    val t = freshTable()
    DeltaTable.write(threeRows.coalesce(1), t, "overwrite")      // v0
    DeltaTable.delete(spark, t, col("id") === 2)                 // v1
    assert(spark.read.format("graft-delta").load(t).count() === 2)
    spark.sql(s"RESTORE delta.`$t` TO VERSION AS OF 0").collect()
    assert(spark.read.format("graft-delta").load(t).count() === 3)
  }

  test("ALTER TABLE ADD CONSTRAINT enforces on later appends; SET " +
      "TBLPROPERTIES lands in the configuration") {
    val t = freshTable()
    DeltaTable.write(threeRows, t, "overwrite")
    spark.sql(s"ALTER TABLE delta.`$t` ADD CONSTRAINT pos_salary " +
      "CHECK (salary > 0)").collect()
    intercept[IllegalArgumentException] {
      DeltaTable.write(Seq((9, "Z", -5L)).toDF("id", "name", "salary"),
        t, "append")
    }
    spark.sql(s"ALTER TABLE delta.`$t` SET TBLPROPERTIES " +
      "('delta.enableChangeDataFeed' = 'true')").collect()
    assert(DeltaLog.snapshot(t).configuration
      .get("delta.enableChangeDataFeed").contains("true"))
  }

  test("ALTER TABLE RENAME/DROP/ALTER COLUMN map onto mapping and " +
      "type widening") {
    val t = freshTable()
    DeltaTable.write(threeRows, t, "overwrite")
    DeltaTable.enableColumnMapping(t)
    spark.sql(s"ALTER TABLE delta.`$t` RENAME COLUMN salary TO base_pay")
      .collect()
    assert(spark.read.format("graft-delta").load(t).columns
      .contains("base_pay"))
    spark.sql(s"ALTER TABLE delta.`$t` DROP COLUMN name").collect()
    assert(!spark.read.format("graft-delta").load(t).columns
      .contains("name"))
    val t2 = freshTable()
    DeltaTable.write(threeRows, t2, "overwrite")
    spark.sql(s"ALTER TABLE delta.`$t2` ALTER COLUMN id TYPE bigint")
      .collect()
    assert(spark.read.format("graft-delta").load(t2).schema("id").dataType
      === org.apache.spark.sql.types.LongType)
  }

  test("SELECT FROM delta.`path` resolves the graft-delta relation — " +
      "including joins, subqueries, and time-travel-free reads") {
    val t = freshTable()
    DeltaTable.write(threeRows, t, "overwrite")
    assert(spark.sql(s"SELECT COUNT(*) AS n FROM delta.`$t`")
      .as[Long].head() === 3L)
    assert(spark.sql(
      s"SELECT name FROM delta.`$t` WHERE salary > 70000 ORDER BY name")
      .as[String].collect().toSeq === Seq("Alice", "Carol"))
    // a self-join through the path idiom
    assert(spark.sql(
      s"SELECT COUNT(*) AS n FROM delta.`$t` a JOIN graft.`$t` b " +
        "ON a.id = b.id").as[Long].head() === 3L)
    // subquery position
    assert(spark.sql(
      s"SELECT id FROM delta.`$t` WHERE salary > " +
        s"(SELECT AVG(salary) FROM delta.`$t`) ORDER BY id")
      .as[Int].collect().toSeq === Seq(1, 3))
  }

  test("everything else delegates: plain SQL and catalog-identifier " +
      "DDL reach Spark's parser untouched") {
    threeRows.createOrReplaceTempView("sqlspec_emp")
    assert(spark.sql(
      "SELECT COUNT(*) AS n FROM sqlspec_emp WHERE salary > 70000")
      .as[Long].head() === 2L)
    // a catalog-identifier ALTER TABLE is NOT ours: Spark must raise
    // its own error (table not found), not our unrecognized-clause one
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE no_such_table ADD CONSTRAINT c CHECK (1=1)")
    }
    assert(!e.getMessage.contains("unrecognized clause"),
      s"catalog identifiers must delegate: ${e.getMessage}")
  }
}
