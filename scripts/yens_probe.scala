// Dev probe: time the DISTRIBUTED Yen's leg (driverLimit = 0 forces it)
// on the sf0.1 co-occurrence graph — the r7 batched multi-source
// relaxation vs r6's ~k·|path| sequential dijkstra dataflows.
// Run: scala -cp "target/scala-2.13/classes:/opt/spark/jars/*" scripts/yens_probe.scala
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object yens_probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val lengths = graft.graph.RatingsGraph.cooccurrenceEdges(spark, dir)
      .select(col("u1").as("src"), col("u2").as("dst"),
        (lit(1.0) / col("weight")).as("len"))
    lengths.count() // warm the cooc silver
    val t0 = System.nanoTime()
    val rows = graft.graph.Algorithms.yensPaths(lengths, 1L, 42L, k = 3,
      driverLimit = 0L).collect()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"DISTRIBUTED yens: ${rows.length} rows in $sec%.1f s")
    val t1 = System.nanoTime()
    val drv = graft.graph.Algorithms.yensPaths(lengths, 1L, 42L, k = 3).collect()
    println(f"driver yens: ${drv.length} rows in ${(System.nanoTime() - t1) / 1e9}%.1f s")
    println(s"legs equal: ${rows.map(_.toString).sorted.sameElements(drv.map(_.toString).sorted)}")
    spark.stop()
  }
}
