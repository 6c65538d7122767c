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
  * (sessionUUID, sfDir, name) so concurrent sessions/dirs don't collide
  * — sessionUUID is stable and never reused, unlike identity hashes,
  * which can recur after a dead session is GC'd.
  */
object Cache {
  private val store = new ConcurrentHashMap[String, DataFrame]()

  /** Per-session-OBJECT id: a UUID held in a weak-keyed map on the
    * SparkSession itself (SparkSession doesn't override equals, so
    * WeakHashMap keys by identity). NOT stamped into the session conf:
    * conf-cloning sessions (cloneSession — structured streaming does
    * this internally) would inherit the stamp and share cache keys with
    * a different live session, the same hazard class raw identity
    * hashes had. Weak keys also mean a dead session's id — and with it
    * the reachability of its map entry — goes away with the session. */
  private val ids = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession, String]())

  def sessionId(spark: org.apache.spark.sql.SparkSession): String =
    ids.computeIfAbsent(spark, _ => java.util.UUID.randomUUID().toString)

  def cached(spark: org.apache.spark.sql.SparkSession, dir: String, name: String)
      (build: => DataFrame): DataFrame = {
    // every key carries the resolved ratings silver source: nearly all
    // cached intermediates (cooccurrence, FastRP, communities, KNN
    // pairs …) derive from the ratings ETL, so flipping the silver conf
    // mid-session must cold-start them rather than serve intermediates
    // built from the other source
    val silverTag = spark.conf
      .getOption(graft.graph.RatingsGraph.SilverTableConf).getOrElse("-")
    val key = s"${sessionId(spark)}|$dir|$silverTag|$name"
    var df = store.get(key)
    if (df == null) {
      df = build.persist(StorageLevel.MEMORY_AND_DISK)
      val prev = store.putIfAbsent(key, df)
      if (prev != null) { df.unpersist(); df = prev }
    }
    df
  }

  /** Drop and unpersist every entry of one session. Entries are NOT
    * evicted automatically (there is no public session-close hook), so a
    * long-lived JVM that cycles through many sessions — a service, or
    * repeated suites in one test JVM — should call this when it stops a
    * session, or the map pins each dead session's plans and storage for
    * the JVM lifetime. */
  def clear(spark: org.apache.spark.sql.SparkSession): Unit = {
    val prefix = s"${sessionId(spark)}|"
    val it = store.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getKey.startsWith(prefix)) {
        try e.getValue.unpersist(blocking = false) catch { case _: Throwable => () }
        it.remove()
      }
    }
  }
}
