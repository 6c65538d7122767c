package graft
import org.apache.spark.sql.SparkSession

/** Dev micro-bench: time named SparkEntry queries one by one.
  * Usage: runMain graft.QBench <sfDir> <query> [<query> ...] */
object QBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.head
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.tail.foreach { name =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      println(f"[qbench] $name rows=$n time=${(System.nanoTime() - t0) / 1e9}%.1fs")
    }
    spark.stop()
  }
}
