package graft
import org.apache.spark.sql.SparkSession
/** Mimics the driver's t1 smoke: bare session, entry(), rows>0. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = SparkEntry.entry(spark).count()
    println(s"[entry-smoke] rows=$n schema=${SparkEntry.entry(spark).schema.simpleString}")
    spark.stop()
  }
}
