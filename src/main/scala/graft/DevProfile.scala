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
    // warmup: all tables + write paths
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).count())
    val wtmp = graft.Scratch.dir("prof-warm")
    Tables.load(spark, sfDir, "region").write.mode("overwrite")
      .parquet(wtmp.resolve("w").toString)

    val tau = 0.5
    // mirrors the SHIPPED q31 exactly, each stage materialized
    graft.functions.GraftFunctions.register(spark)
    val tmp = graft.Scratch.dir("prof").resolve("sh").toString
    t("arrays-write (native shingler)") {
      Tables.load(spark, sfDir, "documents")
        .repartition(spark.sparkContext.defaultParallelism)
        .select(col("doc_id"), expr("graft_shingles(text, 3)").as("sarr"))
        .filter(size(col("sarr")) > 0)
        .select(col("doc_id"), size(col("sarr")).as("n"), col("sarr"))
        .write.parquet(tmp)
    }
    val arrays = spark.read.parquet(tmp)
    val sh = arrays.select(col("doc_id"), col("n"),
      explode(col("sarr")).as("shingle"))
    val prefixDir = graft.Scratch.dir("prof").resolve("p").toString
    t("prefix-write") {
      val freq = sh.groupBy("shingle").agg(count(lit(1)).as("df"))
      val byRarity = Window.partitionBy("doc_id").orderBy(col("df"), col("shingle"))
      sh.join(freq, "shingle")
        .withColumn("pos", row_number().over(byRarity))
        .filter(col("pos") <= col("n") - ceil(col("n") * tau) + 1)
        .select("doc_id", "n", "shingle")
        .write.parquet(prefixDir)
    }
    val prefix = spark.read.parquet(prefixDir)
    val cand = t("cand") {
      val c = prefix.as("a").join(prefix.as("b"),
          col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id") &&
            least(col("a.n"), col("b.n")) >= ceil(greatest(col("a.n"), col("b.n")) * tau))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      println(s"[profile] cand rows: ${c.count()}"); c
    }
    val candDir = graft.Scratch.dir("prof").resolve("c").toString
    cand.write.parquet(candDir)
    val candM = spark.read.parquet(candDir)
    t("verify-long-intersect") {
      candM
        .join(broadcast(arrays.as("x")), col("doc_a") === col("x.doc_id"))
        .join(broadcast(arrays.as("y")), col("doc_b") === col("y.doc_id"))
        .select(col("doc_a"), col("doc_b"),
          size(array_intersect(col("x.sarr"), col("y.sarr"))).as("inter"),
          col("x.n").as("n_a"), col("y.n").as("n_b"))
        .select(col("doc_a"), col("doc_b"), col("inter"), col("n_a"), col("n_b"),
          round(col("inter") / (col("n_a") + col("n_b") - col("inter")), 4).as("jaccard"))
        .filter(col("jaccard") >= 0.5)
        .orderBy("doc_a", "doc_b")
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
    Scratch.purge()
  }
}
