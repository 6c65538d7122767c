package graft
import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: times every SparkEntry query at the given SF,
  * prints ONE JSON line. `queries` keeps the documented name→seconds
  * map; `ok` / `failed` record per-query success so a broken query can
  * never hide behind a wall-time (a failure times as -1 AND lists in
  * `failed`, and the process exits non-zero).
  *
  * Shared silver intermediates (ratings ETL, co-occurrence projection,
  * FastRP embeddings, KNN scored pairs, LPA + Louvain communities) are
  * pre-warmed in a timed `silver` phase so no query's number silently
  * carries another family's build — per-query times are WARM times, and
  * a regression in a shared stage surfaces in the silver section, not
  * in whichever consumer happened to iterate first. */
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

    // the silver phase: each build materialised (count) and timed. A
    // failed build times as -1 and reports in `failed` like a query.
    val silverBuilds: Seq[(String, () => Unit)] = Seq(
      "ratings" -> (() => graph.RatingsGraph.ratings(spark, sfDir).count(): Unit),
      "cooccurrence" -> (() => graph.RatingsGraph.cooccurrenceEdges(spark, sfDir).count(): Unit),
      "fastrp" -> (() => graph.FastRP.userEmbeddings(spark, sfDir).count(): Unit),
      "knn_scored_pairs" -> (() => graph.Algorithms.userScoredPairs(spark, sfDir).count(): Unit),
      "lpa_communities" -> (() => graph.Algorithms.userCommunities(spark, sfDir).count(): Unit),
      "louvain_communities" -> (() => graph.Louvain.userCommunities(spark, sfDir).count(): Unit),
      "pagerank" -> (() => graph.Algorithms.userPageRank(spark, sfDir).count(): Unit),
      "ngram_pairs" -> (() => dedup.Dedup.ngramJaccardPairs(spark, sfDir).count(): Unit),
      "oriented_adj" -> (() => graph.Algorithms.userOrientedAdj(spark, sfDir).count(): Unit),
      "edge_support" -> (() => graph.Algorithms.userEdgeSupport(spark, sfDir).count(): Unit),
      "kcore" -> (() => graph.Algorithms.userKcore(spark, sfDir).count(): Unit),
      "bipartite_cc" -> (() => graph.Algorithms.userBipartiteCC(spark, sfDir).count(): Unit),
      "msbfs" -> (() => graph.Algorithms.userCoocDistances(spark, sfDir).count(): Unit),
      "grams_split" -> (() => text.TextOps.gramSplitFrame(spark, sfDir, 8).count(): Unit))
    val silverResults = silverBuilds.map { case (name, build) =>
      val t0 = System.nanoTime()
      val ok =
        try { build(); true }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] silver $name FAILED: ${e.getClass.getName}: ${e.getMessage}")
            false
        }
      val sec = if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      (name, sec, ok)
    }

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
    def timesJson(rs: Iterable[(String, Double, Boolean)]) =
      rs.map { case (k, sec, _) => s"\"$k\":$sec" }.mkString("{", ",", "}")
    val silverTotal = silverResults.collect { case (_, sec, true) => sec }.sum
    val queriesTotal = results.collect { case (_, sec, true) => sec }.sum
    val oks = results.map { case (k, _, ok) => s"\"$k\":$ok" }.mkString("{", ",", "}")
    val failed = (silverResults.collect { case (k, _, false) => s"\"silver:$k\"" } ++
      results.collect { case (k, _, false) => s"\"$k\"" }).mkString("[", ",", "]")
    // "value" = query-only total: comparable across rounds (and equal to
    // the sum of the "queries" map); the silver pre-warm cost is reported
    // separately as silver_total, never folded into value
    println(s"""{"metric":"total","value":$queriesTotal,"unit":"sec","silver":${timesJson(silverResults)},"silver_total":$silverTotal,"queries_total":$queriesTotal,"queries":${timesJson(results)},"ok":$oks,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
    if (silverResults.exists(!_._3) || results.exists(!_._3)) sys.exit(1)
  }
}
