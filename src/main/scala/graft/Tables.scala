package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed readers for the driver-generated testdata tables (TESTDATA.md).
  *
  * All operators take an `sfDir` and read parquet lazily so Catalyst can
  * push filters/projections into the scan; nothing is cached here —
  * callers decide materialisation.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = table(s, d, "lineitem")
  /** The events table carries TIMESTAMP(NANOS) parquet timestamps, which
    * Spark refuses by default; read them as raw nano longs and convert to
    * microsecond TIMESTAMP (floor — matches DuckDB's µs comparisons to
    * within 1 µs, and all oracle queries truncate coarser than that). */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeEvents(rawEvents(s, d))

  /** Raw events read: ts stays a nano-epoch long. */
  def rawEvents(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
  }

  /** nano-long ts → microsecond TIMESTAMP; shared by batch and
    * readStream paths. */
  def normalizeEvents(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    // exact integral FLOOR division: `/` on longs is a double Divide and
    // nano-epoch longs (~1.7e18) exceed double's 2^53 exact range, while
    // `div` alone truncates toward zero — wrong by 1 µs for pre-epoch
    // (negative) nanos. The parity target is DuckDB's TIMESTAMP_NS →
    // TIMESTAMP cast, which FLOORS (note: DuckDB's integer `//` does
    // NOT — it truncates toward zero; don't use it in oracles on raw
    // nano longs).
    raw.withColumn("ts", timestamp_micros(
      expr("CASE WHEN ts >= 0 THEN ts div 1000 ELSE ((ts + 1) div 1000) - 1 END")))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
