package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev-only stage profiler for the dedup trio (not part of the driver
  * contract; safe to ignore). */
object DevProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warmup: full write-path once
    val wtmp = java.nio.file.Files.createTempDirectory("prof").resolve("w").toString
    t("warmup-docs-write") {
      Tables.load(spark, sfDir, "documents").write.parquet(wtmp)
    }
    // variant A: noop-materialize the lambda shingle compute (no parquet)
    t("shingle-lambda-noop") {
      val docs = Tables.load(spark, sfDir, "documents")
      docs.select(col("doc_id"), split(lower(trim(col("text"))), "\\s+").as("t"))
        .select(col("doc_id"), expr(
          """array_distinct(
            |  CASE WHEN size(t) >= 3
            |    THEN transform(sequence(0, size(t)-3),
            |                   i -> concat_ws(' ', t[i], t[i+1], t[i+2]))
            |    ELSE array() END)""".stripMargin).as("sarr"))
        .select(col("doc_id"), size(col("sarr")).as("n"),
          explode(col("sarr")).as("shingle"))
        .write.format("noop").mode("overwrite").save()
    }
    // variant B: window-based shingles (codegen'd, parallel after shuffle)
    val tmpB = java.nio.file.Files.createTempDirectory("prof").resolve("shB").toString
    t("shingle-window-write") {
      val docs = Tables.load(spark, sfDir, "documents")
      val toks = docs.select(col("doc_id"),
        posexplode(split(lower(trim(col("text"))), "\\s+")).as(Seq("pos", "tok")))
      val w = Window.partitionBy("doc_id").orderBy("pos")
      val tri = toks
        .withColumn("t1", lead("tok", 1).over(w))
        .withColumn("t2", lead("tok", 2).over(w))
        .filter(col("t2").isNotNull)
        .select(col("doc_id"), concat_ws(" ", col("tok"), col("t1"), col("t2")).as("shingle"))
        .distinct()
      tri.withColumn("n", count(lit(1)).over(Window.partitionBy("doc_id")))
        .select("doc_id", "n", "shingle")
        .write.parquet(tmpB)
    }
    println(s"[profile] window shingle rows: ${spark.read.parquet(tmpB).count()}")
    // stage 1: shingle staging write
    val tmp = java.nio.file.Files.createTempDirectory("prof").resolve("sh").toString
    t("shingle-write") {
      val docs = Tables.load(spark, sfDir, "documents")
      docs.select(col("doc_id"), split(lower(trim(col("text"))), "\\s+").as("t"))
        .select(col("doc_id"), expr(
          """array_distinct(
            |  CASE WHEN size(t) >= 3
            |    THEN transform(sequence(0, size(t)-3),
            |                   i -> concat_ws(' ', t[i], t[i+1], t[i+2]))
            |    ELSE array() END)""".stripMargin).as("sarr"))
        .select(col("doc_id"), size(col("sarr")).as("n"),
          explode(col("sarr")).as("shingle"))
        .write.parquet(tmp)
    }
    val sh = spark.read.parquet(tmp)
    println(s"[profile] shingle rows: ${sh.count()}")
    val freq = t("freq-count-only") {
      val f = sh.groupBy("shingle").agg(count(lit(1)).as("df")); f.count(); f
    }
    val prefix = t("prefix-materialize") {
      val tau = 0.5
      val byRarity = Window.partitionBy("doc_id").orderBy(col("df"), col("shingle"))
      val p = sh.join(freq, "shingle")
        .withColumn("pos", row_number().over(byRarity))
        .filter(col("pos") <= col("n") - ceil(col("n") * tau) + 1)
        .select("doc_id", "shingle")
      p.write.format("noop").mode("overwrite").save(); p
    }
    val cand = t("cand-selfjoin") {
      val c = prefix.as("a").join(prefix.as("b"),
          col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      println(s"[profile] cand rows: ${c.count()}"); c
    }
    t("jaccard-join") {
      cand
        .join(sh.as("x"), col("doc_a") === col("x.doc_id"))
        .join(sh.as("y"),
          col("doc_b") === col("y.doc_id") && col("x.shingle") === col("y.shingle"))
        .groupBy("doc_a", "doc_b")
        .agg(count(lit(1)).as("inter"),
          max(col("x.n")).as("n_a"), max(col("y.n")).as("n_b"))
        .select(col("doc_a"), col("doc_b"), col("inter"), col("n_a"), col("n_b"),
          round(col("inter") / (col("n_a") + col("n_b") - col("inter")), 4).as("jaccard"))
        .filter(col("jaccard") >= 0.5)
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
