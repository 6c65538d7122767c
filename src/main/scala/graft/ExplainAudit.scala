package graft
import org.apache.spark.sql.SparkSession
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    for (name <- Seq("q1_agg", "q3_topk_join", "q5_multijoin", "recommend_knn",
        "cooccurrence_edges", "ann_bruteforce_topk", "text_stats")) {
      println(s"========== $name ==========")
      SparkEntry.queries(name)(spark, d).explain("formatted")
    }
    spark.stop()
  }
}
