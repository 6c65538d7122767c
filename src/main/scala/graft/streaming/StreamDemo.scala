package graft.streaming

import org.apache.spark.sql.SparkSession

/** Runnable streaming surface: file-source readStream over the events
  * parquet → watermarked windowed aggregation → memory sink.
  * Usage: runMain graft.streaming.StreamDemo [sfDir]
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // raw schema (ts = nano-long; the NANOS quirk), normalised post-load
    val schema = graft.Tables.rawEvents(spark, sfDir).schema
    // file stream sources need a directory; stage the single parquet file
    val stage = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      stage.resolve("events.parquet"))
    val stream = graft.Tables.normalizeEvents(
      spark.readStream
        .schema(schema)
        .format("parquet")
        .load(stage.toString))
    val q = EventStreams.windowedCounts(stream)
      .writeStream.format("memory").queryName("wc").outputMode("complete").start()
    q.processAllAvailable()
    val out = spark.table("wc")
    println(s"[stream-demo] windows=${out.count()}")
    out.orderBy("window_start", "event_type").show(5, truncate = false)
    q.stop()
    spark.stop()
  }
}
