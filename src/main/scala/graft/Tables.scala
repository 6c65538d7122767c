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
  /** Events reader tolerant of both testdata vintages: TIMESTAMP(NANOS)
    * files (read as raw nano longs, floored to µs) and µs-timestamp
    * files (isAdjustedToUTC=false → TIMESTAMP_NTZ, cast to TIMESTAMP —
    * instant-preserving because every entry point pins the session TZ
    * to UTC). The driver regenerated the tables with µs annotations in
    * round 5; the nano leg stays for older fixtures and the C3 source
    * component. */
  def events(s: SparkSession, d: String): DataFrame =
    normalizeEvents(rawEvents(s, d))

  /** Raw events read: nano-era files surface ts as a nano-epoch long
    * (the conf is a no-op for µs files, which arrive TIMESTAMP_NTZ). */
  def rawEvents(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    table(s, d, "events")
  }

  /** ts → microsecond TIMESTAMP whatever the on-disk flavor; shared by
    * batch and readStream paths (type dispatch is on the STATIC schema,
    * so it composes with streaming frames too). */
  def normalizeEvents(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    raw.schema("ts").dataType match {
      case LongType =>
        // exact integral FLOOR division: `/` on longs is a double Divide
        // and nano-epoch longs (~1.7e18) exceed double's 2^53 exact
        // range, while `div` alone truncates toward zero — wrong by 1 µs
        // for pre-epoch (negative) nanos. The parity target is DuckDB's
        // TIMESTAMP_NS → TIMESTAMP cast, which FLOORS (note: DuckDB's
        // integer `//` does NOT — it truncates toward zero; don't use it
        // in oracles on raw nano longs).
        raw.withColumn("ts", timestamp_micros(
          expr("CASE WHEN ts >= 0 THEN ts div 1000 ELSE ((ts + 1) div 1000) - 1 END")))
      case TimestampNTZType =>
        // µs wall-clock with no zone: DuckDB reads these as plain
        // TIMESTAMP; under the pinned UTC session the cast yields the
        // identical instants, so oracle parity is exact
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => raw
      case other =>
        throw new IllegalArgumentException(s"unexpected events.ts type: $other")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
