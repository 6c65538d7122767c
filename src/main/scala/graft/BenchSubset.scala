package graft

import org.apache.spark.sql.SparkSession

/** Dev-only targeted timing: run a comma-separated subset of
  * [[SparkEntry.queries]] against a sf dir, printing cold and warm
  * wall times per entry. The driver's per-round sweep is [[Bench]];
  * this exists so a perf iteration doesn't pay the full 188-entry
  * sweep to see one number.
  *
  * Usage: BenchSubset <sfDir> <k1,k2,...> [reps=2]
  */
object BenchSubset {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val keys = args(1).split(",").map(_.trim).filter(_.nonEmpty)
    val reps = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    keys.foreach { k =>
      val fn = SparkEntry.queries.getOrElse(k,
        sys.error(s"unknown entry: $k"))
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9 -> n
      }
      val ts = times.map(_._1).map(t => f"$t%.2f").mkString(" ")
      println(f"$k%-28s rows=${times.head._2}%-8d $ts")
    }
    spark.stop()
  }
}
