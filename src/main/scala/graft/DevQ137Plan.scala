package graft
object DevQ137Plan {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.sql.adaptive.enabled","true")
      .config("spark.sql.extensions","graft.GraftExtensions")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("===== q137_labeled =====")
    graft.operators.DedupOps.q137Labeled(spark, "/root/testdata/sf0.01")
      .groupBy("verdict").count().explain("formatted")
    spark.stop(); Scratch.purge()
  }
}
