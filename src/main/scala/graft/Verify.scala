package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare.
  *
  * The full sweep costs ~9 min at sf0.01/8cpus and only grows with the
  * surface — if a harness timeout is what keeps zeroing the driver's
  * CORRECTNESS artifact (empty since r08), the shard form lets it be
  * produced in bounded slices with the SAME output layout:
  *   runMain graft.Verify <sfDir> <outDir>                 # full sweep
  *   runMain graft.Verify <sfDir> <outDir> k1,k2           # key filter
  *   runMain graft.Verify <sfDir> <outDir> shard=2/5       # slice 2 of 5
  * Shards partition the SORTED key list round-robin, so every slice
  * carries a similar mix of heavy and light entries; oracle_sql.json is
  * written whole by every invocation (it is cheap and idempotent).
  * Every key logs its wall time to stderr so a driver-side timeout is
  * attributable to a specific entry rather than "the sweep". */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    val keep: String => Boolean =
      if (args.length <= 2) _ => true
      else args(2) match {
        case s if s.startsWith("shard=") =>
          val Array(i, n) = s.stripPrefix("shard=").split("/").map(_.toInt)
          require(n > 0 && i >= 0 && i < n, s"bad shard spec $s (want shard=i/n, 0 <= i < n)")
          val mine = SparkEntry.queries.keys.toSeq.sorted.zipWithIndex
            .collect { case (k, j) if j % n == i => k }.toSet
          mine
        case s => s.split(",").toSet
      }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val t00 = System.nanoTime()
    SparkEntry.queries.toSeq.sortBy(_._1).filter(kv => keep(kv._1))
      .foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).coalesce(1).write.mode("overwrite")
            .parquet(s"$outDir/$name")
          System.err.println(f"[verify] $name ok ${(System.nanoTime() - t0) / 1e9}%.1fs (total ${(System.nanoTime() - t00) / 1e9}%.0fs)")
        } catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
