package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.UUID
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

/** Spark-facing Delta-equivalent table API (SURVEY.md §7-D): versioned
  * ACID overwrite/append/read + time travel over local/HDFS-style
  * paths, matching the reference's observable Delta behavior —
  * overwrite (examples/example_lakesail_kerberos.py:166), append
  * (`:178`, count 3→4), re-read (examples/read_deltalake_hdfs.py:57-67)
  * and the README's time-travel claim (README.md:302).
  *
  * Scale notes:
  *   - Data files are written by Spark's normal distributed parquet
  *     writer (every executor writes its partitions) into a staging
  *     dir, then *moved* (rename, not copy) into the table — cheap on
  *     any real filesystem.
  *   - Reads hand Catalyst the exact live-file list; pruning/pushdown
  *     work as with any parquet scan. The log itself stays tiny (one
  *     JSON line per file per commit) and is read driver-side only —
  *     no driver-side data movement, matching Delta's design.
  */
object DeltaTable {

  /** Write `df` to `table` with the given mode ("overwrite"|"append"). */
  def write(df: DataFrame, table: String, mode: String): Long = {
    require(mode == "overwrite" || mode == "append", s"bad mode: $mode")
    val spark = df.sparkSession
    val tableDir = Paths.get(table)
    Files.createDirectories(tableDir)
    // 1. stage: distributed parquet write to a scratch dir
    val staging = tableDir.resolve(s".staging-${UUID.randomUUID()}")
    df.write.parquet(staging.toString)
    // 2. move data files in under commit-unique names
    val commitTag = UUID.randomUUID().toString.take(8)
    val staged = Files.list(staging).iterator.asScala
      .filter(_.getFileName.toString.endsWith(".parquet")).toSeq.sortBy(_.toString)
    val added = staged.zipWithIndex.map { case (p, i) =>
      val name = f"part-$i%05d-$commitTag.parquet"
      val dest = tableDir.resolve(name)
      Files.move(p, dest, StandardCopyOption.ATOMIC_MOVE)
      DeltaLog.AddFile(name, Files.size(dest))
    }
    deleteRecursively(staging)
    // 3. atomic log commit
    val prior =
      if (DeltaLog.versions(table).isEmpty) None else Some(DeltaLog.snapshot(table))
    val readVersion = prior.map(_.version).getOrElse(-1L)
    val removes =
      if (mode == "overwrite")
        prior.toSeq.flatMap(_.files).map(f => DeltaLog.removeAction(f.path))
      else Seq.empty
    val actions =
      Seq(DeltaLog.commitInfoAction(mode.toUpperCase)) ++
        Seq(DeltaLog.metaDataAction(df.schema.json)) ++
        removes ++
        added.map(f => DeltaLog.addAction(f.path, f.size))
    val v = DeltaLog.commit(table, readVersion, actions)
    // overwrite leaves removed files on disk (old versions still need
    // them for time travel — same as real Delta until VACUUM)
    v
  }

  /** Read the table at the latest (or a past) version. An empty live
    * set yields an empty DataFrame with the committed schema. */
  def read(spark: SparkSession, table: String,
      versionAsOf: Option[Long] = None): DataFrame = {
    val snap = DeltaLog.snapshot(table, versionAsOf)
    val schema = snap.schemaJson.map(j =>
      DataType.fromJson(j).asInstanceOf[StructType])
    val paths = snap.files.map(f => Paths.get(table).resolve(f.path).toString)
    (schema, paths) match {
      case (Some(s), Nil) => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
      case (Some(s), ps) => spark.read.schema(s).parquet(ps: _*)
      case (None, ps) => spark.read.parquet(ps: _*)
    }
  }

  def latestVersion(table: String): Long = DeltaLog.snapshot(table).version

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).iterator.asScala.toSeq.reverse.foreach(Files.delete)
}
