package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every SparkEntry query at the given SF,
  * prints ONE JSON line. `queries` keeps the documented name→seconds
  * map; `ok` / `failed` record per-query success so a broken query can
  * never hide behind a wall-time (a failure times as -1 AND lists in
  * `failed`, and the process exits non-zero). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { fn(spark, sfDir).count(); true }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
            false
        }
      val sec = if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      (name, sec, ok)
    }
    val qs = results.map { case (k, sec, _) => s"\"$k\":$sec" }.mkString("{", ",", "}")
    val oks = results.map { case (k, _, ok) => s"\"$k\":$ok" }.mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => s"\"$k\"" }.mkString("[", ",", "]")
    val total = results.collect { case (_, sec, true) => sec }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"ok":$oks,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
    if (results.exists(!_._3)) sys.exit(1)
  }
}
