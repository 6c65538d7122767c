package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Session-scoped memoization of shared derived tables (ratings edges,
  * co-occurrence projection, FastRP embeddings…). ~20 of the engine's
  * queries derive from the same handful of intermediates; without this,
  * a full query sweep rebuilds the ratings ETL dozens of times.
  *
  * At 100 TB the equivalent is a materialised/bucketed silver table;
  * in-session `persist(MEMORY_AND_DISK)` is the local analog. Keyed by
  * (session, sfDir, name) so concurrent sessions/dirs don't collide.
  */
object Cache {
  private val store = new ConcurrentHashMap[String, DataFrame]()

  def cached(spark: org.apache.spark.sql.SparkSession, dir: String, name: String)
      (build: => DataFrame): DataFrame = {
    val key = s"${System.identityHashCode(spark)}|$dir|$name"
    var df = store.get(key)
    if (df == null) {
      df = build.persist(StorageLevel.MEMORY_AND_DISK)
      val prev = store.putIfAbsent(key, df)
      if (prev != null) { df.unpersist(); df = prev }
    }
    df
  }
}
