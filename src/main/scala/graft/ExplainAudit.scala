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
    // scale tooling drives: salted join equivalence + bucketed no-Exchange
    import org.apache.spark.sql.functions._
    val ratings = graph.RatingsGraph.ratings(spark, d)
    val books = graph.RatingsGraph.ratedBooks(spark, d).select("book_id", "title")
    val plainCount = ratings.join(books, Seq("book_id")).count()
    val saltedCount = olap.Skew.saltedJoin(ratings, books, "book_id").count()
    println(s"========== skew ==========")
    println(s"[audit] plain=$plainCount salted=$saltedCount equal=${plainCount == saltedCount}")
    olap.Skew.hotKeys(ratings, "book_id", 3).show(3, truncate = false)
    println(s"========== bucketed ==========")
    val t = sources.GraphStore.saveBucketed(spark, d, "graft_audit_bucketed", 4)
    val agg = t.groupBy("user_id").agg(count(lit(1)).as("degree"))
    val exchanges = agg.queryExecution.executedPlan.toString.split("\n").count(_.contains("Exchange"))
    println(s"[audit] bucketed-agg exchanges=$exchanges (expect 0)")
    spark.sql("DROP TABLE IF EXISTS graft_audit_bucketed")
    spark.stop()
  }
}
