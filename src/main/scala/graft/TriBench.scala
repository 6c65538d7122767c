package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object TriBench {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val edges = graph.RatingsGraph.cooccurrenceEdges(spark, d)
      .select(col("u1").as("src"), col("u2").as("dst"))
    edges.count() // warm cache so we time the triangle step alone
    val t0 = System.nanoTime()
    val n = graph.Algorithms.triangleCount(edges).head().getLong(0)
    println(f"[tri-bench] triangles=$n time=${(System.nanoTime()-t0)/1e9}%.1fs")
    spark.stop()
  }
}
