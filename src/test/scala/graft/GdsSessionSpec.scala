package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cypher.ReferenceQueries
import graft.gds.GdsSession

/** The reference's full GDS workflow (`Alg_KNN_FastRP.py`,
  * `Alg_Community_Detection.py`) driven through the catalog twin:
  * project → fastRP.write → knn.write / project.cypher →
  * louvain.write, each write proved frame-identical to the engine's
  * session-cached path. */
class GdsSessionSpec extends AnyFunSuite {
  import TestSpark._

  private val sf = "/root/testdata/sf0.001"
  private def fresh = new GdsSession(ReferenceQueries.graph(spark, sf))

  test("catalog lifecycle: project / exists / list / drop / dropIfExists") {
    val g = fresh
    assert(!g.graphExists("userGraph").head().getBoolean(0))
    val meta = g.graphProject("userGraph", Seq("User", "Book"), "RATED",
      relProperties = Seq("rating")).head()
    assert(meta.getString(0) == "userGraph")
    val nUsers = graph.RatingsGraph.activeUsers(spark, sf).count()
    val nBooks = graph.RatingsGraph.ratedBooks(spark, sf).count()
    val nRated = graph.RatingsGraph.ratings(spark, sf).count()
    assert(meta.getLong(1) == nUsers + nBooks)
    assert(meta.getLong(2) == 2 * nRated, "UNDIRECTED stores both directions")
    assert(g.graphExists("userGraph").head().getBoolean(0))
    intercept[IllegalArgumentException] {
      g.graphProject("userGraph", Seq("User"), "RATED")
    }
    assert(g.graphList().collect().map(_.getString(0)).toSeq == Seq("userGraph"))
    assert(g.graphDrop("userGraph").head().getString(0) == "userGraph")
    intercept[IllegalArgumentException] { g.graphDrop("userGraph") }
    // the reference's exists → apoc.do.when cascade
    assert(g.graphDropIfExists("userGraph").head().getString(0)
      == "Graph was not present")
  }

  test("fastRP.write over the reference projection equals FastRP.userEmbeddings") {
    val g = fresh
    g.graphProject("userGraph", Seq("User", "Book"), "RATED",
      relProperties = Seq("rating"))
    val written = g.fastRpWrite("userGraph").head().getLong(0)
    val nUsers = graph.RatingsGraph.activeUsers(spark, sf).count()
    val nBooks = graph.RatingsGraph.ratedBooks(spark, sf).count()
    assert(written == nUsers + nBooks)
    val viaGds = g.db.nodes("User")
      .select(col("id").as("user_id"), col("embedding"))
    val cached = graph.FastRP.userEmbeddings(spark, sf)
    assert(viaGds.exceptAll(cached).isEmpty && cached.exceptAll(viaGds).isEmpty,
      "gds fastRP.write diverged from the cached userEmbeddings path")
  }

  test("knn.write at the reference operating point equals userKnnEdgesRef") {
    val g = fresh
    g.graphProject("userGraph", Seq("User", "Book"), "RATED",
      relProperties = Seq("rating"))
    g.fastRpWrite("userGraph")
    // the reference re-projects ['User'] with the embedding property
    // and DUMMY relations (`Alg_KNN_FastRP.py:83-97`)
    g.graphProject("knnGraph", Seq("User"), "DUMMY",
      nodeProperties = Seq("embedding"))
    val meta = g.knnWrite("knnGraph", topK = 20, similarityCutoff = 0.8).head()
    assert(meta.getLong(0) == graph.RatingsGraph.activeUsers(spark, sf).count())
    val viaGds = g.db.edges("SIMILAR_TO")
    val cached = graph.Algorithms.userKnnEdgesRef(spark, sf)
    assert(meta.getLong(1) == cached.count())
    assert(viaGds.exceptAll(cached).isEmpty && cached.exceptAll(viaGds).isEmpty,
      "gds knn.write diverged from userKnnEdgesRef")
  }

  test("project.cypher VERBATIM + louvain.write equals Louvain.userCommunities") {
    val g = fresh
    // Alg_Community_Detection.py:21-30, verbatim modulo whitespace
    g.graphProjectCypher("userSimilarityGraph",
      "MATCH (u:User) RETURN id(u) AS id",
      """MATCH (u1:User)-[r1:RATED]->(b:Book)<-[r2:RATED]-(u2:User)
        |WHERE u1 <> u2 AND r1.rating >= 6 AND r2.rating >= 6
        |RETURN id(u1) AS source, id(u2) AS target, COUNT(*) AS weight""".stripMargin)
    val meta = g.louvainWrite("userSimilarityGraph").head()
    val cached = graph.Louvain.userCommunities(spark, sf)
    val viaGds = g.db.nodes("User")
      .filter(col("community").isNotNull)
      .select(col("id").as("node_id"), col("community"))
    assert(viaGds.exceptAll(cached).isEmpty && cached.exceptAll(viaGds).isEmpty,
      "gds louvain.write diverged from the cached Louvain path")
    assert(meta.getLong(0) ==
      cached.select(col("community")).distinct().count())
    assert(meta.getDouble(1) > 0.0, "cooc-graph Louvain modularity must be positive")
  }

  test("stream/stats modes ≡ the write path's read-back (fastRP / knn / louvain)") {
    val g = fresh
    g.graphProject("userGraph", Seq("User", "Book"), "RATED",
      relProperties = Seq("rating"))
    val pre = Some(graph.FastRP.bipartiteEmbeddings(spark, sf))

    // fastRP.stream yields the ENCODED projection ids; the write path
    // decodes per label — re-encode the read-back and compare
    val streamed = g.fastRpStream("userGraph", precomputed = pre)
    assert(g.fastRpStats("userGraph", precomputed = pre)
      .head().getLong(0) == streamed.count())
    g.fastRpWrite("userGraph", precomputed = pre)
    val readBack = g.db.nodes("User")
      .select((col("id") * 2).as("nodeId"), col("embedding"))
      .unionByName(g.db.nodes("Book")
        .select((col("id") * 2 + 1).as("nodeId"), col("embedding")))
      .filter(col("embedding").isNotNull)
    assert(streamed.exceptAll(readBack).isEmpty &&
      readBack.exceptAll(streamed).isEmpty,
      "fastRP.stream diverged from the write path's read-back")

    g.graphProject("knnGraph", Seq("User"), "DUMMY",
      nodeProperties = Seq("embedding"))
    val scored = Some(graph.Algorithms.userScoredPairs(spark, sf))
    val knnStreamed = g.knnStream("knnGraph", topK = 20,
      similarityCutoff = 0.8, precomputedScored = scored)
    val knnStat = g.knnStats("knnGraph", topK = 20, similarityCutoff = 0.8,
      precomputedScored = scored).head()
    g.knnWrite("knnGraph", topK = 20, similarityCutoff = 0.8,
      precomputedScored = scored)
    val simBack = g.db.edges("SIMILAR_TO")
      .select(col("src").as("node1"), col("dst").as("node2"),
        col("similarity"))
    assert(knnStreamed.exceptAll(simBack).isEmpty &&
      simBack.exceptAll(knnStreamed).isEmpty,
      "knn.stream diverged from the installed SIMILAR_TO frame")
    assert(knnStat.getLong(0) ==
      graph.RatingsGraph.activeUsers(spark, sf).count() &&
      knnStat.getLong(1) == simBack.count(),
      "knn.stats YIELD diverged from the write path's counts")

    g.graphProjectCypher("userSimilarityGraph",
      ReferenceQueries.ProjectUserNodes,
      ReferenceQueries.ProjectUserSimilarityRels)
    val labels = Some(graph.Louvain.userCommunities(spark, sf))
    val louvStreamed = g.louvainStream("userSimilarityGraph",
      precomputedLabels = labels)
    val louvStat = g.louvainStats("userSimilarityGraph",
      precomputedLabels = labels).head()
    val louvWrite = g.louvainWrite("userSimilarityGraph",
      precomputedLabels = labels).head()
    val commBack = g.db.nodes("User").filter(col("community").isNotNull)
      .select(col("id").as("nodeId"), col("community").as("communityId"))
    assert(louvStreamed.exceptAll(commBack).isEmpty &&
      commBack.exceptAll(louvStreamed).isEmpty,
      "louvain.stream diverged from the write path's read-back")
    assert(louvStat.getLong(0) == louvWrite.getLong(0) &&
      math.abs(louvStat.getDouble(1) - louvWrite.getDouble(1)) < 1e-9,
      s"louvain.stats YIELD diverged from write: $louvStat vs $louvWrite")
  }

  test("silver reuse seams: seeded writes ≡ unseeded writes (fastRP / knn / louvain)") {
    // the SparkEntry workflow entries hand the engine's session-cached
    // silvers into the write procedures; this pins that the seam frames
    // really are the in-workflow builds — written db state identical
    def knnState(seed: Boolean) = {
      val g = fresh
      g.graphProject("userGraph", Seq("User", "Book"), "RATED",
        relProperties = Seq("rating"))
      g.fastRpWrite("userGraph", precomputed =
        if (seed) Some(graph.FastRP.bipartiteEmbeddings(spark, sf)) else None)
      g.graphProject("knnGraph", Seq("User"), "DUMMY",
        nodeProperties = Seq("embedding"))
      g.knnWrite("knnGraph", topK = 20, similarityCutoff = 0.8,
        precomputedScored =
          if (seed) Some(graph.Algorithms.userScoredPairs(spark, sf)) else None)
      g.db.edges("SIMILAR_TO")
    }
    val (seeded, unseeded) = (knnState(true), knnState(false))
    assert(seeded.exceptAll(unseeded).isEmpty && unseeded.exceptAll(seeded).isEmpty,
      "seeded knn workflow diverged from the unseeded build")

    def louvainState(seed: Boolean) = {
      val g = fresh
      g.graphProjectCypher("userSimilarityGraph",
        "MATCH (u:User) RETURN id(u) AS id",
        """MATCH (u1:User)-[r1:RATED]->(b:Book)<-[r2:RATED]-(u2:User)
          |WHERE u1 <> u2 AND r1.rating >= 6 AND r2.rating >= 6
          |RETURN id(u1) AS source, id(u2) AS target, COUNT(*) AS weight""".stripMargin)
      val meta = g.louvainWrite("userSimilarityGraph", precomputedLabels =
        if (seed) Some(graph.Louvain.userCommunities(spark, sf)) else None).head()
      (g.db.nodes("User").filter(col("community").isNotNull)
        .select(col("id"), col("community")), meta)
    }
    val (ls, lu) = (louvainState(true), louvainState(false))
    assert(ls._1.exceptAll(lu._1).isEmpty && lu._1.exceptAll(ls._1).isEmpty,
      "seeded louvain workflow diverged from the unseeded build")
    // modularity is a double aggregate — the seeded labels frame has a
    // different physical partitioning, so the sum association order
    // differs by an ULP; ≡ means same value, not same float bits
    assert(ls._2.getLong(0) == lu._2.getLong(0) &&
      math.abs(ls._2.getDouble(1) - lu._2.getDouble(1)) < 1e-9,
      s"YIELD rows diverged: ${ls._2} vs ${lu._2}")
  }
}
