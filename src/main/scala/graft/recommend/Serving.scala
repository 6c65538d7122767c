package graft.recommend

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.graph.RatingsGraph

/** The reference app's INTERACTIVE serving path. `streamlit_app.py:33-46`
  * (get_user_rated_books) and `recommender_knn.py:11-28` (recommend_books)
  * answer per-user queries from Neo4j's native store in milliseconds;
  * graft's warm per-user queries are Spark jobs. The warehouse-native
  * equivalent of the native store is a PRECOMPUTED serving silver
  * bucketed on user_id (the T2/T4 layout): a point lookup then
  *
  *  - prunes to ONE bucket at the scan (`SelectedBucketsCount: 1 out
  *    of N` — the other N−1 buckets are never opened), and
  *  - plans ZERO Exchange: scan → filter → project → in-partition sort.
  *
  * Both properties are spec-pinned (ScaleToolsSpec). At 100 TB the same
  * layout holds — bucket count scales with the cluster, and a lookup
  * still touches a single bucket's row groups; this is the engine's
  * answer to the reference's interactive story without an OLTP store.
  *
  * The per-user ORDER BY is done with sortWithinPartitions, not
  * orderBy: a global sort would plan a range Exchange, while the
  * pruned scan delivers the whole user in one partition (asserted),
  * where an in-partition sort IS a total order.
  */
object Serving {

  /** Warehouse tables are per-JVM (in-memory catalog) but their files
    * persist in spark-warehouse/ — tag the name with the source dir so
    * two SFs in one suite never read each other's buckets. */
  private def tag(dir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString

  /** A previous JVM's warehouse files can survive without catalog
    * metadata (in-memory catalog dies with the session); CTAS then
    * refuses the orphaned location — clear it before building. */
  private def dropOrphanedLocation(spark: SparkSession, table: String): Unit = {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val path = new org.apache.hadoop.fs.Path(s"$wh/$table")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) fs.delete(path, true): Unit
  }

  /** The user-books serving payload from any (ratings, books) pair —
    * shared by the full table build and the incremental merge. */
  private[graft] def userBooksPayload(ratings: DataFrame, books: DataFrame): DataFrame =
    ratings
      .join(books.select(col("book_id"), col("title")), Seq("book_id"))
      .select(col("user_id"), col("book_id"), col("title"), col("rating"))

  /** Serving silver #1: every user's rated books with the UI payload
    * (title, rating), bucketed+sorted by user_id. Built once per
    * session; SaveMode.Overwrite clears any stale files a previous JVM
    * left in the warehouse dir. */
  def userBooksTable(spark: SparkSession, dir: String, buckets: Int = 8): String = {
    // parameters live in the name: a same-session call with different
    // buckets must build its own table, not silently serve the old one
    val t = s"graft_serve_books_${tag(dir)}_$buckets"
    if (!spark.catalog.tableExists(t)) {
      dropOrphanedLocation(spark, t)
      userBooksPayload(RatingsGraph.ratings(spark, dir),
          RatingsGraph.ratedBooks(spark, dir))
        .write.bucketBy(buckets, "user_id").sortBy("user_id")
        .format("parquet").mode(SaveMode.Overwrite).saveAsTable(t)
    }
    t
  }

  /** The planner's DisableUnnecessaryBucketedScan rule turns the
    * bucketed scan OFF for filter-only queries (no join/agg needs the
    * partitioning) — but bucket PRUNING is exactly what a point lookup
    * is for. Lookups therefore plan on their OWN session (shared
    * SparkContext + catalog, independent runtime conf) with
    * auto-bucketed-scan pinned off, so the pruned read
    * (`SelectedBucketsCount: 1 out of N`) survives WITHOUT mutating
    * the caller's planner config — plans of unrelated queries must not
    * depend on whether a serving lookup ran first.
    *
    * ONE pinned session per SparkContext, reused across lookups: a
    * serving tier holds its session open between requests, and building
    * a fresh session per call pays session-state + analyzer warm-up on
    * every lookup (BENCH_r06 measured the per-call variant at 4.6–5.2×
    * the warm pin under load). The pinned session strongly references
    * its context, so weak keying alone could never collect an entry —
    * instead each context gets an application-end listener that evicts
    * its entry when it stops (the graft.Cache eviction pattern), so a
    * JVM cycling Spark applications doesn't accumulate dead sessions. */
  private val servingSessions = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[org.apache.spark.SparkContext, SparkSession]())

  private def servingSession(spark: SparkSession): SparkSession =
    servingSessions.synchronized {
      val sc = spark.sparkContext
      var s = servingSessions.get(sc)
      if (s == null) {
        s = spark.newSession()
        s.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
        servingSessions.put(sc, s)
        sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
          override def onApplicationEnd(
              e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit =
            servingSessions.remove(sc): Unit
        })
      }
      s
    }

  /** Point lookup against [[userBooksTable]]: the get_user_rated_books
    * serving story. One bucket read, zero Exchange. */
  def userBooksLookup(spark: SparkSession, dir: String,
      user: Long = Recommend.TargetUser): DataFrame = {
    val t = userBooksTable(spark, dir) // build (if needed) on the caller's session
    servingSession(spark).table(t)
      .filter(col("user_id") === user)
      .select(col("book_id"), col("title"), col("rating"))
      .sortWithinPartitions(col("rating").desc, col("book_id"))
  }

  /** The all-user recommendation payload from any (ratings, cooc,
    * books) state — the batch precompute behind interactive
    * recommend_books: per-user top-simK similar users (TopKPerKey,
    * never a global sort), the per-(target, book) avg/votes candidate
    * aggregate, anti-join of each target's own books, per-user top-k —
    * all shuffle-keyed, no driver loops. Shared by the full table
    * build and the incremental merge (which passes a target-restricted
    * cooc frame). */
  private[graft] def recommendationsPayload(ratings: DataFrame, cooc: DataFrame,
      books: DataFrame, simK: Int = 20, k: Int = 3): DataFrame = {
    val sims = graft.plans.TopKPerKey.topKPerKey(cooc,
        Seq("u1"), Seq(("weight", false), ("u2", true)), simK)
      .select(col("u1").as("target"), col("u2").as("user_id"))
    val cand = ratings
      .join(sims, Seq("user_id"))
      .join(ratings.select(col("user_id").as("target"), col("book_id")),
        Seq("target", "book_id"), "left_anti")
      .groupBy(col("target"), col("book_id"))
      .agg((sum(col("rating")).cast("double") / count(lit(1))).as("avg_rating"),
        count(lit(1)).as("votes"))
    graft.plans.TopKPerKey.topKPerKey(cand, Seq("target"),
        Seq(("avg_rating", false), ("votes", false), ("book_id", true)), k)
      .join(books.select(col("book_id"), col("title")), Seq("book_id"))
      .select(col("target").as("user_id"), col("book_id"), col("title"),
        col("avg_rating"), col("votes"))
  }

  def recommendationsTable(spark: SparkSession, dir: String, simK: Int = 20,
      k: Int = 3, buckets: Int = 8): String = {
    // parameters live in the name (see userBooksTable)
    val t = s"graft_serve_recs_${tag(dir)}_${simK}_${k}_$buckets"
    if (!spark.catalog.tableExists(t)) {
      dropOrphanedLocation(spark, t)
      recommendationsPayload(RatingsGraph.ratings(spark, dir),
          RatingsGraph.cooccurrenceEdges(spark, dir),
          RatingsGraph.ratedBooks(spark, dir), simK, k)
        .write.bucketBy(buckets, "user_id").sortBy("user_id")
        .format("parquet").mode(SaveMode.Overwrite).saveAsTable(t)
    }
    t
  }

  /** Incremental maintenance of the user-books serving payload (T8's
    * ratings MERGE carried through to the serving layer): only the
    * delta's users' rows can change, so the fold is one anti-join on
    * the touched-user set plus a payload rebuild RESTRICTED to it —
    * every join keyed on the delta, never a full recompute. At 100 TB
    * this is a keyed MERGE into the bucketed table (the delta's user
    * ids prune to their buckets); locally the dataflow is spec-proved
    * ≡ the full rebuild on the merged ratings. */
  def mergeUserBooksServing(base: DataFrame, oldRatings: DataFrame,
      deltaEvents: DataFrame, books: DataFrame): DataFrame = {
    val newRatings = RatingsGraph.mergeRatings(oldRatings, deltaEvents)
    val touched = deltaEvents.filter(col("rating") =!= 0)
      .select(col("user_id")).distinct()
    val rebuilt = userBooksPayload(
      newRatings.join(touched, Seq("user_id"), "left_semi"), books)
    base.join(touched, Seq("user_id"), "left_anti").unionAll(rebuilt)
  }

  /** Incremental maintenance of the recommendation serving payload —
    * the serving-freshness story composed with T9's incremental
    * co-occurrence MERGE. A target's top-k can change only if
    *  (a) its own rated set changed (the anti-join and its seed), or
    *  (b) an incident co-occurrence edge changed — every changed edge
    *      touches a user whose delta crossed the liked threshold, or
    *  (c) a current top-simK sim's ratings changed (the avg/votes) —
    *      that sim IS a delta user and shares an edge with the target.
    * All three put the target inside deltaUsers ∪ N_newCooc(deltaUsers)
    * (edges only grow under the monotone MERGE, so the NEW adjacency
    * covers the old), so the payload rebuild is restricted to that
    * blast radius and every join stays keyed on it. Returns
    * (mergedServing, newCooc, newRatings); spec-proved ≡ the full
    * rebuild. */
  def mergeRecommendationsServing(base: DataFrame, oldCooc: DataFrame,
      oldRatings: DataFrame, deltaEvents: DataFrame, books: DataFrame,
      simK: Int = 20, k: Int = 3): (DataFrame, DataFrame, DataFrame) = {
    val (newCooc, newRatings) =
      RatingsGraph.mergeCooccurrence(oldCooc, oldRatings, deltaEvents)
    val deltaUsers = deltaEvents.filter(col("rating") =!= 0)
      .select(col("user_id")).distinct()
    val affected = deltaUsers
      .unionAll(newCooc
        .join(deltaUsers.select(col("user_id").as("u2")), Seq("u2"), "left_semi")
        .select(col("u1").as("user_id")))
      .distinct().localCheckpoint()
    val rebuilt = recommendationsPayload(newRatings,
      newCooc.join(affected.select(col("user_id").as("u1")), Seq("u1"), "left_semi"),
      books, simK, k)
    (base.join(affected, Seq("user_id"), "left_anti").unionAll(rebuilt),
      newCooc, newRatings)
  }

  /** Point lookup against [[recommendationsTable]]: the recommend_books
    * serving story. Same plan shape as [[userBooksLookup]]. */
  def recommendationsLookup(spark: SparkSession, dir: String,
      user: Long = Recommend.TargetUser): DataFrame = {
    val t = recommendationsTable(spark, dir)
    servingSession(spark).table(t)
      .filter(col("user_id") === user)
      .select(col("book_id"), col("title"), col("avg_rating"), col("votes"))
      .sortWithinPartitions(col("avg_rating").desc, col("votes").desc, col("book_id"))
  }
}
