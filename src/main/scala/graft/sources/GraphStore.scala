package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Sources & sinks mirroring the reference's ingest surface.
  *
  * The reference loads latin-1 CSVs with pandas (`data/load_data.py:5-7`:
  * `read_csv(..., encoding="latin-1").fillna("")`) and MERGEs them into
  * Neo4j as a property graph. Here: CSV → DataFrame with the same
  * encoding/null semantics, and the property graph persists as
  * partitioned parquet node/edge tables (the warehouse-native graph
  * store).
  */
object GraphStore {

  /** CSV reader with the reference's semantics: header row, latin-1
    * encoding, empty string for missing values. */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("encoding", "ISO-8859-1")
      .option("nullValue", "")
      .csv(path)
      .na.fill("")

  /** Persist the bipartite ratings graph as parquet node/edge tables.
    * Edges are bucketed-by-key at scale (here: repartitioned on the join
    * key so downstream co-located joins avoid a shuffle). */
  def saveGraph(spark: SparkSession, dir: String, outDir: String): DataFrame = {
    import graft.graph.RatingsGraph
    val users = RatingsGraph.activeUsers(spark, dir)
    val books = RatingsGraph.ratedBooks(spark, dir)
    val edges = RatingsGraph.ratings(spark, dir)
    // user nodes partitioned by community: per-community reads prune
    // whole directories (PartitionFilters), the storage-level analog of
    // predicate pushdown
    users.write.mode(SaveMode.Overwrite)
      .partitionBy("community").parquet(s"$outDir/nodes_user")
    books.write.mode(SaveMode.Overwrite).parquet(s"$outDir/nodes_book")
    edges.repartition(col("user_id"))
      .write.mode(SaveMode.Overwrite).parquet(s"$outDir/edges_rated")
    loadGraphStats(spark, outDir)
  }

  /** Persist the ratings edges as a BUCKETED table: co-located by
    * user_id so downstream per-user joins/aggregations read
    * pre-partitioned data with no Exchange. This is the 100 TB layout
    * for the graph edge table (bucket count scales with cluster size;
    * 8 here for local verification). Returns the reopened table. */
  def saveBucketed(spark: SparkSession, dir: String, table: String = "graft_edges_bucketed",
      buckets: Int = 8): DataFrame = {
    import graft.graph.RatingsGraph
    spark.sql(s"DROP TABLE IF EXISTS $table")
    RatingsGraph.ratings(spark, dir)
      .write.bucketBy(buckets, "user_id").sortBy("user_id")
      .format("parquet").saveAsTable(table)
    spark.table(table)
  }

  /** Re-open a stored graph and report its cardinalities (the MERGE
    * constraint sanity check of `data/load_data.py:95-101`). */
  def loadGraphStats(spark: SparkSession, outDir: String): DataFrame = {
    val users = spark.read.parquet(s"$outDir/nodes_user")
    val books = spark.read.parquet(s"$outDir/nodes_book")
    val edges = spark.read.parquet(s"$outDir/edges_rated")
    users.agg(count(lit(1)).as("n_users"))
      .crossJoin(books.agg(count(lit(1)).as("n_books")))
      .crossJoin(edges.agg(count(lit(1)).as("n_edges")))
  }
}
