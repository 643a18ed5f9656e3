package graft
import org.apache.spark.sql.SparkSession
object Diag109 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    Tables.names.foreach(n => Tables.load(spark, dir, n).count())
    def t(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[diag109] $tag ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    // fresh plan each time (new DataFrame instance)
    t("run1") { graft.operators.TextOps.queries("q109_json_metadata")(spark, dir).write.format("noop").mode("overwrite").save() }
    t("run2") { graft.operators.TextOps.queries("q109_json_metadata")(spark, dir).write.format("noop").mode("overwrite").save() }
    // isolate: does a DIFFERENT variant-using plan now run fast?
    t("variant-only") { spark.sql(
      "SELECT lang, count(try_variant_get(parse_json(concat('{\"c\":', n_chars, '}')), '$.c', 'long')) FROM parquet.`/root/testdata/sf0.1/documents.parquet` GROUP BY lang").collect() }
    spark.stop()
  }
}
