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
    val tmp = graft.Scratch.dir("prof").resolve("sh").toString
    t("arrays-write") {
      val docs = Tables.load(spark, sfDir, "documents")
      val w = Window.partitionBy("doc_id").orderBy("pos")
      docs.select(col("doc_id"),
          posexplode(split(lower(trim(col("text"))), "\\s+")).as(Seq("pos", "tok")))
        .withColumn("t1", lead("tok", 1).over(w))
        .withColumn("t2", lead("tok", 2).over(w))
        .filter(col("t2").isNotNull)
        .select(col("doc_id"),
          concat_ws(" ", col("tok"), col("t1"), col("t2")).as("shingle"))
        .distinct()
        .withColumn("n", count(lit(1)).over(Window.partitionBy("doc_id")))
        .select("doc_id", "n", "shingle")
        .groupBy("doc_id")
        .agg(max(col("n")).as("n"), collect_list(col("shingle")).as("sarr"))
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
    t("verify-string-intersect") {
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
    val harr = arrays.select(col("doc_id"), col("n"),
      expr("transform(sarr, s -> cast(conv(substring(md5(s), 1, 15), 16, 10) AS bigint))")
        .as("sarr"))
    val harrDir = graft.Scratch.dir("prof").resolve("h").toString
    harr.write.parquet(harrDir)
    val harrM = spark.read.parquet(harrDir)
    t("verify-long-intersect") {
      candM
        .join(broadcast(harrM.as("x")), col("doc_a") === col("x.doc_id"))
        .join(broadcast(harrM.as("y")), col("doc_b") === col("y.doc_id"))
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
