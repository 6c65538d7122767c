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

  test("breadth wcc/degree/triangleCount over the bipartite projection") {
    val g = fresh
    g.graphProject("userGraph", Seq("User", "Book"), "RATED",
      relProperties = Seq("rating"))
    // independent edge build in the projection's encoding (user → 2·id,
    // book → 2·id + 1) straight from the ratings table — no catalog code
    val ratings = graph.RatingsGraph.ratings(spark, sf)
    val encEdges = ratings.select((col("user_id") * 2).as("src"),
      (col("book_id") * 2 + 1).as("dst"))

    val cc = graph.Algorithms.connectedComponentsAdaptive(encEdges)
      .select(col("node_id").as("nodeId"), col("component").as("componentId"))
    val streamed = g.wccStream("userGraph")
    assert(streamed.exceptAll(cc).isEmpty && cc.exceptAll(streamed).isEmpty,
      "wcc.stream diverged from components of the independently-built edges")
    val wroteMeta = g.wccWrite("userGraph").head()
    assert(wroteMeta.getLong(0) ==
      cc.select(col("componentId")).distinct().count())
    val userBack = g.db.nodes("User").filter(col("componentId").isNotNull)
      .select((col("id") * 2).as("nodeId"), col("componentId"))
    val userStream = streamed.filter(col("nodeId") % 2 === 0)
    assert(userBack.exceptAll(userStream).isEmpty &&
      userStream.exceptAll(userBack).isEmpty,
      "wcc.write read-back diverged from the stream frame")

    // degree of the UNDIRECTED bipartite graph = per-side rating counts
    val degOracle = ratings.groupBy(col("user_id"))
      .agg(count(lit(1)).cast("double").as("score"))
      .select((col("user_id") * 2).as("nodeId"), col("score"))
      .unionByName(ratings.groupBy(col("book_id"))
        .agg(count(lit(1)).cast("double").as("score"))
        .select((col("book_id") * 2 + 1).as("nodeId"), col("score")))
    val degStream = g.degreeStream("userGraph")
    assert(degStream.exceptAll(degOracle).isEmpty &&
      degOracle.exceptAll(degStream).isEmpty,
      "degree.stream diverged from per-side rating counts")
    assert(g.degreeStats("userGraph").head().getLong(0) == degOracle.count())

    // a bipartite graph has no triangles — closed-form zero
    val triMeta = g.triangleCountStats("userGraph").head()
    assert(triMeta.getLong(0) == 0L, "bipartite graph must have 0 triangles")
    assert(g.triangleCountStream("userGraph")
      .agg(sum(col("triangleCount"))).head().getLong(0) == 0L)
  }

  test("breadth pageRank/labelPropagation + mutate over the cypher projection") {
    val g = fresh
    g.graphProjectCypher("userSimilarityGraph",
      ReferenceQueries.ProjectUserNodes,
      ReferenceQueries.ProjectUserSimilarityRels)
    // kernel cross-check over the SAME rel query run directly — proves
    // the catalog routing (weight binding, isolated-node completion)
    val rels = cypher.CypherLite.run(g.db,
        ReferenceQueries.ProjectUserSimilarityRels)
      .select(col("source").as("src"), col("target").as("dst"),
        col("weight").cast("double"))
    val prKernel = graph.Algorithms.pageRank(rels
        .select(col("src"), col("dst"), col("weight")))
      .select(col("node_id").as("nodeId"), col("rank").as("score"))
    val prStream = g.pageRankStream("userSimilarityGraph",
      relationshipWeightProperty = Some("weight"))
    // on the kernel's (edge-touched) node set the frames must be
    // identical; users with no qualifying co-rating partner are the
    // catalog's isolated-node completion — exactly the (1−d) base rank
    // double aggregates: the projection frames have a different physical
    // partitioning than the fresh kernel run, so the rank sums associate
    // in a different order — ≡ means same value within the convergence
    // drift bound (tol·d/(1−d) per run ≈ 6e-6), not same float bits
    val prJoined = prStream.join(prKernel
      .withColumnRenamed("score", "kernel_score"), Seq("nodeId"))
    assert(prJoined.count() == prKernel.count(),
      "pageRank.stream must cover the kernel's node set")
    assert(prJoined
      .filter(abs(col("score") - col("kernel_score")) > 1e-4).isEmpty,
      "pageRank.stream diverged from the kernel over the same projection")
    val prIsolated = prStream.join(prKernel.select("nodeId"),
      Seq("nodeId"), "left_anti")
    assert(prIsolated.filter(abs(col("score") - 0.15) > 1e-12).isEmpty,
      "isolated nodes must carry the (1-d) base rank")
    val prStats = g.pageRankStats("userSimilarityGraph",
      relationshipWeightProperty = Some("weight")).head()
    assert(prStats.getLong(1) == prStream.count())

    val lpaKernel = graph.Algorithms.labelPropagation(rels)
      .select(col("node_id").as("nodeId"), col("label").as("communityId"))
    val lpaStream = g.labelPropagationStream("userSimilarityGraph")
    val lpaOnKernel = lpaStream.join(lpaKernel.select("nodeId"),
      Seq("nodeId"), "left_semi")
    assert(lpaOnKernel.exceptAll(lpaKernel).isEmpty &&
      lpaKernel.exceptAll(lpaOnKernel).isEmpty,
      "labelPropagation.stream diverged from the kernel")
    val lpaIsolated = lpaStream.join(lpaKernel.select("nodeId"),
      Seq("nodeId"), "left_anti")
    assert(lpaIsolated.filter(col("communityId") =!= col("nodeId")).isEmpty,
      "isolated nodes must keep their own label")
    assert(g.labelPropagationStats("userSimilarityGraph").head().getLong(0) ==
      lpaStream.select(col("communityId")).distinct().count())
    val lpaMut = g.labelPropagationMutate("userSimilarityGraph").head()
    assert(lpaMut.getLong(1) == lpaStream.count())
    val mutBack = g.graphNodePropertiesStream("userSimilarityGraph",
      "communityId")
      .select(col("nodeId"), col("propertyValue").as("communityId"))
    assert(mutBack.exceptAll(lpaStream).isEmpty &&
      lpaStream.exceptAll(mutBack).isEmpty,
      "labelPropagation.mutate read-back diverged from the stream frame")
    // mutate touches the PROJECTION only — the db never sees the column
    assert(!g.db.nodes("User").columns.contains("communityId"))

    // louvain.mutate: projection property ≡ louvain.stream, db untouched
    // (the base db User frame already carries a `community` column from
    // the loader, so "untouched" = the same frame by reference)
    val userFrameBefore = g.db.nodes("User")
    val labels = Some(graph.Louvain.userCommunities(spark, sf))
    val louvStream = g.louvainStream("userSimilarityGraph",
      precomputedLabels = labels)
    g.louvainMutate("userSimilarityGraph", precomputedLabels = labels)
    val louvBack = g.graphNodePropertiesStream("userSimilarityGraph",
        "community")
      .select(col("nodeId"), col("propertyValue").as("communityId"))
    assert(louvBack.exceptAll(louvStream).isEmpty &&
      louvStream.exceptAll(louvBack).isEmpty,
      "louvain.mutate read-back diverged from louvain.stream")
    assert(g.db.nodes("User") eq userFrameBefore,
      "louvain.mutate must not touch the db")
  }

  test("fastRP.mutate + knn.mutate: in-memory chain, db untouched") {
    val g = fresh
    g.graphProject("userGraph", Seq("User", "Book"), "RATED",
      relProperties = Seq("rating"))
    val pre = Some(graph.FastRP.bipartiteEmbeddings(spark, sf))
    val streamed = g.fastRpStream("userGraph", precomputed = pre)
    val mutMeta = g.fastRpMutate("userGraph", precomputed = pre).head()
    assert(mutMeta.getLong(0) == streamed.count())
    val back = g.graphNodePropertiesStream("userGraph", "embedding")
      .select(col("nodeId"), col("propertyValue").as("embedding"))
    assert(back.exceptAll(streamed).isEmpty && streamed.exceptAll(back).isEmpty,
      "fastRP.mutate read-back diverged from fastRP.stream")
    assert(!g.db.nodes("User").columns.contains("embedding"),
      "fastRP.mutate must not touch the db")

    // knn.mutate over a projection carrying the embedding property:
    // edges land on the projection's relationship set, not the db
    g.fastRpWrite("userGraph", precomputed = pre)
    g.graphProject("knnGraph", Seq("User"), "DUMMY",
      nodeProperties = Seq("embedding"))
    val scored = Some(graph.Algorithms.userScoredPairs(spark, sf))
    val knnStreamed = g.knnStream("knnGraph", topK = 20,
      similarityCutoff = 0.8, precomputedScored = scored)
    // the loader's base db already carries a SIMILAR_TO frame, so
    // "untouched" = same frame by reference after the mutate
    val simBefore = g.db.edges.get("SIMILAR_TO")
    val knnMut = g.knnMutate("knnGraph", topK = 20, similarityCutoff = 0.8,
      precomputedScored = scored).head()
    assert(knnMut.getLong(1) == knnStreamed.count())
    assert(g.db.edges.get("SIMILAR_TO").zip(simBefore).forall(p => p._1 eq p._2)
      && g.db.edges.contains("SIMILAR_TO") == simBefore.isDefined,
      "knn.mutate must not install or replace the db edge frame")
    val relBack = g.graphRelationshipsStream("knnGraph", Some("SIMILAR_TO"))
      .select(col("sourceNodeId").as("node1"), col("targetNodeId").as("node2"))
    val expected = knnStreamed.select(col("node1"), col("node2"))
    assert(relBack.exceptAll(expected).isEmpty &&
      expected.exceptAll(relBack).isEmpty,
      "relationships.stream diverged from the mutated knn edge frame")
    intercept[RuntimeException] {
      g.graphRelationshipsStream("knnGraph", Some("NO_SUCH_TYPE")).collect()
    }
  }

  test("nodeSimilarity: closed-form fixture, all four modes") {
    import spark.implicits._
    // u1 likes {b10,b11}, u2 {b10,b11,b12}, u3 {b12} — Jaccards by hand:
    // u1·u2 = 2/3, u2·u3 = 1/3, b10·b11 = 1, b10·b12 = b11·b12 = 1/3
    val users = Seq((1L, "u1"), (2L, "u2"), (3L, "u3")).toDF("id", "name")
    val books = Seq((10L, "t"), (11L, "t"), (12L, "t")).toDF("id", "title")
    val rated = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L), (2L, 12L),
      (3L, 12L)).toDF("src", "dst")
    def fresh2 = {
      val g = new GdsSession(graft.cypher.CypherLite.Graph(
        nodes = Map("User" -> users, "Book" -> books),
        edges = Map("RATED" -> rated)))
      g.graphProject("fix", Seq("User", "Book"), "RATED")
      g
    }
    // encoded ids: user → 2·id, book → 2·id + 1
    val expected = Set(
      (2L, 4L, 0.666667), (4L, 2L, 0.666667), (4L, 6L, 0.333333),
      (6L, 4L, 0.333333), (21L, 23L, 1.0), (21L, 25L, 0.333333),
      (23L, 21L, 1.0), (23L, 25L, 0.333333), (25L, 21L, 0.333333),
      (25L, 23L, 0.333333))
    val g = fresh2
    val streamed = g.nodeSimilarityStream("fix").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(streamed == expected, "stream diverged from hand Jaccards")

    // topK=1 keeps the per-node1 argmax; node1=25's tie (21 vs 23 at
    // 1/3) breaks on the node2 ascending tiebreak
    val top1 = g.nodeSimilarityStream("fix", topK = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(top1 == Set((2L, 4L), (4L, 2L), (6L, 4L), (21L, 23L),
      (23L, 21L), (25L, 21L)))

    val stats = g.nodeSimilarityStats("fix").head()
    assert(stats.getLong(0) == 6L && stats.getLong(1) == 10L)

    // upperDegreeCutoff=2 excludes u2 (degree 3) from comparison; its
    // id stays a set ELEMENT (b10·b12 still share it) — GDS semantics
    val capped = g.nodeSimilarityStream("fix", upperDegreeCutoff = Some(2L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(capped == expected.filter(t => t._1 % 2 == 1 && t._2 % 2 == 1),
      "cutoff must drop every pair touching u2 as an endpoint")
    assert(g.nodeSimilarityStats("fix", upperDegreeCutoff = Some(2L))
      .head().getLong(0) == 5L)

    // mutate lands on the projection, db untouched; write installs SIMILAR
    val mutMeta = g.nodeSimilarityMutate("fix").head()
    assert(mutMeta.getLong(1) == 10L)
    assert(!g.db.edges.contains("SIMILAR"), "mutate must not touch the db")
    val viaProj = g.graphRelationshipsStream("fix", Some("SIMILAR")).count()
    assert(viaProj == 10L)
    val wroteMeta = g.nodeSimilarityWrite("fix").head()
    assert(wroteMeta.getLong(0) == 6L && wroteMeta.getLong(1) == 10L)
    // GDS writes back in ORIGINAL ids: the multi-label projection's
    // encoded endpoints decode to raw per-label ids + label columns,
    // so the installed frame joins back to the User/Book node frames
    assert(g.db.edges("SIMILAR").columns.toSeq ==
      Seq("src", "srcLabel", "dst", "dstLabel", "similarity"))
    val back = g.db.edges("SIMILAR").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3),
        r.getDouble(4))).toSet
    val decode = (enc: Long) =>
      (enc / 2, if (enc % 2 == 0) "User" else "Book")
    assert(back == expected.map { case (n1, n2, s) =>
      val (i1, l1) = decode(n1); val (i2, l2) = decode(n2)
      (i1, l1, i2, l2, s)
    }, "write read-back diverged from the decoded stream frame")
    // decoded ids must join back to the db node frames per label
    val simUsers = g.db.edges("SIMILAR").filter(col("srcLabel") === "User")
    assert(simUsers.join(g.db.nodes("User").select(col("id").as("src")),
      Seq("src"), "left_anti").isEmpty,
      "decoded User endpoints must exist in the User frame")

    // estimate model covers the new procedure
    assert(g.writeEstimate("fix", "nodeSimilarity", topK = 10)
      .head().getLong(0) == 6L)

    // NATURAL orientation (the oracle entry's shape): only out-rel
    // sources (users) are compared — book pairs disappear
    val gn = new GdsSession(graft.cypher.CypherLite.Graph(
      nodes = Map("User" -> users, "Book" -> books),
      edges = Map("RATED" -> rated)))
    gn.graphProject("fixN", Seq("User", "Book"), "RATED",
      orientation = "NATURAL")
    val natural = gn.nodeSimilarityStream("fixN").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(natural == expected.filter(t => t._1 % 2 == 0 && t._2 % 2 == 0))
    assert(gn.nodeSimilarityStats("fixN").head().getLong(0) == 3L)
  }

  test("nodeSimilarity: similarityMetric OVERLAP/COSINE + postingWidthCap exclusion semantics") {
    import spark.implicits._
    // same fixture as the Jaccard test: u1={b10,b11}, u2={b10,b11,b12},
    // u3={b12}; UNDIRECTED also gives b10={u1,u2}, b11={u1,u2},
    // b12={u2,u3} — encoded user→2·id, book→2·id+1
    val users = Seq((1L, "u1"), (2L, "u2"), (3L, "u3")).toDF("id", "name")
    val books = Seq((10L, "t"), (11L, "t"), (12L, "t")).toDF("id", "title")
    val rated = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L), (2L, 12L),
      (3L, 12L)).toDF("src", "dst")
    val g = new GdsSession(graft.cypher.CypherLite.Graph(
      nodes = Map("User" -> users, "Book" -> books),
      edges = Map("RATED" -> rated)))
    g.graphProject("fix", Seq("User", "Book"), "RATED")
    def streamed(metric: String, cap: Option[Long] = None) =
      g.nodeSimilarityStream("fix", similarityMetric = metric,
          postingWidthCap = cap).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

    // OVERLAP = n/min(|A|,|B|): containment-style — u2⊇u3 scores 1.0
    assert(streamed("OVERLAP") == Set(
      (2L, 4L, 1.0), (4L, 2L, 1.0), (4L, 6L, 1.0), (6L, 4L, 1.0),
      (21L, 23L, 1.0), (23L, 21L, 1.0),
      (21L, 25L, 0.5), (23L, 25L, 0.5), (25L, 21L, 0.5), (25L, 23L, 0.5)),
      "OVERLAP diverged from hand values")
    // COSINE = n/√(|A|·|B|) over the unweighted sets
    assert(streamed("cosine") == Set(
      (2L, 4L, 0.816497), (4L, 2L, 0.816497),
      (4L, 6L, 0.57735), (6L, 4L, 0.57735),
      (21L, 23L, 1.0), (23L, 21L, 1.0),
      (21L, 25L, 0.5), (23L, 25L, 0.5), (25L, 21L, 0.5), (25L, 23L, 0.5)),
      "COSINE diverged from hand values (case-insensitive metric name)")
    intercept[RuntimeException] { streamed("EUCLID") }

    // postingWidthCap=2: shared neighbour u2's posting list {b10,b11,
    // b12} has width 3 → excluded from PAIR GENERATION. Its set
    // MEMBERSHIP stays: b10·b11 share {u1,u2} but count only u1 →
    // 1/(2+2−1) = 1/3 (underestimate, never invention); b10·b12 and
    // b11·b12 shared ONLY u2 → the pairs disappear; user pairs ride on
    // width-2 book postings → unchanged
    assert(streamed("JACCARD", cap = Some(2L)) == Set(
      (2L, 4L, 0.666667), (4L, 2L, 0.666667),
      (4L, 6L, 0.333333), (6L, 4L, 0.333333),
      (21L, 23L, 0.333333), (23L, 21L, 0.333333)),
      "postingWidthCap exclusion semantics diverged")
    // a cap wide enough to keep every posting is exactly GDS semantics
    assert(streamed("JACCARD", cap = Some(3L)) == streamed("JACCARD"),
      "a non-binding cap must not change the result")
    intercept[IllegalArgumentException] {
      streamed("JACCARD", cap = Some(0L))
    }
    // stats under the cap: nodesCompared counts candidate nodes (the
    // cutoff semantics), pairs reflect the capped generation
    val capStats = g.nodeSimilarityStats("fix",
      postingWidthCap = Some(2L)).head()
    assert(capStats.getLong(0) == 6L && capStats.getLong(1) == 6L)
    // r11 observability: exactly ONE posting list (hub u2, width 3)
    // was excluded from pair generation; uncapped runs report 0
    assert(capStats.getLong(2) == 1L, "postingsDropped must count the hub")
    assert(g.nodeSimilarityStats("fix").head().getLong(2) == 0L,
      "no cap ⇒ postingsDropped 0")
  }

  test("pageRank sourceNodes (personalized) mode matrix + weight fail-fast") {
    import spark.implicits._
    // weighted digraph: 1→2 (1.0), 2→3 (1.0), 1→3 (5.0), 3→4 (1.0),
    // isolated node 9; UNDIRECTED projection stores both directions
    val nodes = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (9L, "iso"))
      .toDF("id", "name")
    val rels = Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (1L, 3L, 5.0), (3L, 4L, 1.0))
      .toDF("src", "dst", "cost")
    val g = new GdsSession(graft.cypher.CypherLite.Graph(
      nodes = Map("N" -> nodes), edges = Map("E" -> rels)))
    g.graphProject("pr", Seq("N"), "E", relProperties = Seq("cost"))

    // stream ≡ the PPR kernel over the same (weighted) edge frame
    val both = rels.select(col("src"), col("dst"), col("cost").as("weight"))
      .unionAll(rels.select(col("dst").as("src"), col("src").as("dst"),
        col("cost").as("weight")))
    val kernel = graph.Algorithms.personalizedPageRank(both,
      sources = Seq(1L), iterations = 5)
    val streamed = g.pageRankStream("pr", maxIterations = 5,
      relationshipWeightProperty = Some("cost"), sourceNodes = Seq(1L))
    val joined = streamed.join(kernel
      .select(col("node_id").as("nodeId"), col("rank")), Seq("nodeId"))
    assert(joined.count() == kernel.count() &&
      joined.filter(abs(col("score") - col("rank")) > 1e-12).isEmpty,
      "sourceNodes stream diverged from the PPR kernel")
    // isolated node: 0.0 for a non-source, (1−d)/|S| for a source
    assert(streamed.filter(col("nodeId") === 9L).head().getDouble(1) == 0.0)
    val srcIso = g.pageRankStream("pr", maxIterations = 5,
      sourceNodes = Seq(9L, 1L))
    assert(math.abs(srcIso.filter(col("nodeId") === 9L).head().getDouble(1)
      - 0.075) < 1e-12, "an edgeless source keeps its (1-d)/|S| teleport")
    // stats/write/mutate route through the same frame
    val st = g.pageRankStats("pr", maxIterations = 5,
      sourceNodes = Seq(1L)).head()
    assert(st.getLong(0) == 5L && st.getLong(1) == 5L)
    g.pageRankMutate("pr", mutateProperty = "ppr", maxIterations = 5,
      relationshipWeightProperty = Some("cost"), sourceNodes = Seq(1L))
    // tolerance-join, not exceptAll: the two invocations re-run the
    // PPR fixpoint and distributed double sums may differ in the last
    // bits between runs
    val mutBack = g.graphNodePropertiesStream("pr", "ppr")
      .select(col("nodeId"), col("propertyValue").as("mscore"))
    val mj = mutBack.join(streamed, Seq("nodeId"))
    assert(mj.count() == streamed.count() &&
      mj.filter(abs(col("mscore") - col("score")) > 1e-12).isEmpty,
      "sourceNodes mutate read-back diverged from the stream")

    // fail-fast: a typo'd EXPLICIT weight property must error, not
    // silently run unweighted (GDS fails fast) — pageRank + both
    // dijkstra entry points
    intercept[IllegalArgumentException] {
      g.pageRankStream("pr", relationshipWeightProperty = Some("cst"))
    }
    intercept[IllegalArgumentException] {
      g.shortestPathDijkstraStream("pr", 1L, 4L,
        relationshipWeightProperty = Some("cst"))
    }
    intercept[IllegalArgumentException] {
      g.allShortestPathsDijkstraStream("pr", 1L,
        relationshipWeightProperty = Some("cst"))
    }
  }

  test("pathfinding: shortestPath.dijkstra + bfs stream over a closed-form fixture") {
    import spark.implicits._
    // weighted digraph on one label: 1→2 (1.0), 2→3 (1.0), 1→3 (5.0),
    // 3→4 (1.0); UNDIRECTED projection stores both directions.
    // Shortest 1⇝4 = 1-2-3-4 at cost 3.0 (beats 1-3-4 at 6.0).
    val nodes = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (9L, "iso"))
      .toDF("id", "name")
    val rels = Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (1L, 3L, 5.0), (3L, 4L, 1.0))
      .toDF("src", "dst", "cost")
    val g = new GdsSession(graft.cypher.CypherLite.Graph(
      nodes = Map("N" -> nodes), edges = Map("E" -> rels)))
    g.graphProject("paths", Seq("N"), "E", relProperties = Seq("cost"))

    val sp = g.shortestPathDijkstraStream("paths", 1L, 4L,
      relationshipWeightProperty = Some("cost")).collect()
    assert(sp.length == 1)
    val r = sp(0)
    assert(r.getLong(0) == 0L && r.getLong(1) == 1L && r.getLong(2) == 4L)
    assert(math.abs(r.getDouble(3) - 3.0) < 1e-9)
    assert(r.getSeq[Long](4) == Seq(1L, 2L, 3L, 4L))
    assert(r.getSeq[Double](5) == Seq(0.0, 1.0, 2.0, 3.0))

    // unweighted fallback: every hop costs 1.0 — 1⇝4 now prefers the
    // 2-hop 1-3-4 (tie-broken deterministically by the kernel's
    // (dist, parent) struct-min)
    val spU = g.shortestPathDijkstraStream("paths", 1L, 4L).head()
    assert(math.abs(spU.getDouble(3) - 2.0) < 1e-9)
    assert(spU.getSeq[Long](4) == Seq(1L, 3L, 4L))

    // unreachable (isolated node 9) ⇒ zero rows
    assert(g.shortestPathDijkstraStream("paths", 1L, 9L,
      relationshipWeightProperty = Some("cost")).isEmpty)

    // allShortestPaths: single-source distances (source reports 0.0;
    // isolated node 9 absent)
    val asp = g.allShortestPathsDijkstraStream("paths", 1L,
      relationshipWeightProperty = Some("cost")).collect()
      .map(r => r.getLong(1) -> r.getDouble(2)).toMap
    assert(asp == Map(1L -> 0.0, 2L -> 1.0, 3L -> 2.0, 4L -> 3.0))

    // bfs: deterministic (hop, node_id) visit order from node 1
    val bfs = g.bfsStream("paths", 1L).head()
    assert(bfs.getLong(0) == 1L)
    assert(bfs.getSeq[Long](1) == Seq(1L, 2L, 3L, 4L),
      "hop-0 source, hop-1 {2,3} ascending, hop-2 {4}")
    assert(g.bfsStream("paths", 1L, maxDepth = 1).head().getSeq[Long](1)
      == Seq(1L, 2L, 3L))
  }

  test("centrality/structure breadth: closed-form fixture, all families") {
    import spark.implicits._
    // kite + tail: triangle 1-2-3, edge 3-4, isolated 9 (the paths
    // fixture minus weights — hops only)
    val nodes = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (9L, "iso"))
      .toDF("id", "name")
    val rels = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
      .toDF("src", "dst")
    val g = new GdsSession(graft.cypher.CypherLite.Graph(
      nodes = Map("N" -> nodes), edges = Map("E" -> rels)))
    g.graphProject("kite", Seq("N"), "E")
    def asMap(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
      df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

    // scc: UNDIRECTED stores both directions, so the weak component
    // {1,2,3,4} is strongly connected; isolated 9 is its own singleton
    val scc = g.sccStream("kite").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 9L -> 9L))
    val sccStats = g.sccStats("kite").head()
    assert(sccStats.getLong(0) == 2L && sccStats.getLong(1) == 5L)

    // localClusteringCoefficient: deg 1:2 2:2 3:3 4:1, one triangle
    val lcc = asMap(g.localClusteringCoefficientStream("kite"))
    assert(lcc(1L) == 1.0 && lcc(2L) == 1.0 && lcc(4L) == 0.0 && lcc(9L) == 0.0)
    assert(math.abs(lcc(3L) - 1.0 / 3) < 1e-9)

    // betweenness (all 5 nodes sampled ⇒ exact): only node 3 is
    // interior — on 1⇝4 and 2⇝4, so 4 directed dependencies / 2 = 2.0
    val btw = asMap(g.betweennessStream("kite", samplingSize = 5))
    assert(btw == Map(1L -> 0.0, 2L -> 0.0, 3L -> 2.0, 4L -> 0.0, 9L -> 0.0))

    // harmonic (all sources): Σ 1/d — 1: 1+1+1/2, 2: same, 3: 3,
    // 4: 1/2+1/2+1, 9 unreached: 0
    val harm = asMap(g.harmonicStream("kite", samplingSize = 5))
    assert(harm == Map(1L -> 2.5, 2L -> 2.5, 3L -> 3.0, 4L -> 2.0, 9L -> 0.0))

    // eigenvector: unit-L2 over the connected part, hub 3 on top,
    // isolated 9 exactly 0
    val eig = asMap(g.eigenvectorStream("kite"))
    assert(eig(9L) == 0.0)
    assert(eig(3L) == eig.values.max)
    val l2 = math.sqrt(eig.values.map(v => v * v).sum)
    assert(math.abs(l2 - 1.0) < 1e-9)

    // articleRank: isolated 9 sits exactly at the (1−d) base term,
    // hub 3 on top
    val ar = asMap(g.articleRankStream("kite"))
    assert(math.abs(ar(9L) - 0.15) < 1e-12)
    assert(ar(3L) == ar.values.max)

    // write + mutate round-trips through the shared mode driver
    assert(g.betweennessWrite("kite", samplingSize = 5,
      writeLabel = "N").head().getLong(0) == 5L)
    val back = g.db.nodes("N").filter(col("betweenness").isNotNull).count()
    assert(back == 5L)
    assert(g.harmonicMutate("kite").head().getLong(0) == 5L)
    assert(g.graphNodePropertiesStream("kite", "harmonic").count() == 5L)

    // estimate model covers the new procedures
    Seq("articleRank", "eigenvector", "betweenness", "harmonic", "scc",
      "localClusteringCoefficient").foreach { proc =>
      assert(g.writeEstimate("kite", proc).head().getLong(0) == 5L)
    }
  }

  test("write.estimate: exact counts, documented memory model") {
    val g = fresh
    val meta = g.graphProject("userGraph", Seq("User", "Book"), "RATED",
      relProperties = Seq("rating")).head()
    val est = g.writeEstimate("userGraph", "fastRP",
      embeddingDimension = 64).head()
    assert(est.getLong(0) == meta.getLong(1) &&
      est.getLong(1) == meta.getLong(2),
      "estimate counts must equal the projection's exact counts")
    assert(est.getLong(2) <= est.getLong(3))
    val est128 = g.writeEstimate("userGraph", "fastRP",
      embeddingDimension = 128).head()
    assert(est128.getLong(2) > est.getLong(2),
      "fastRP estimate must grow with the embedding dimension")
    assert(est.getString(4).contains("Bytes"))
    intercept[RuntimeException] { g.writeEstimate("userGraph", "nope") }
  }

  test("gds.graph.export: parquet round-trip of topology + mutated state") {
    import spark.implicits._
    val users = Seq((1L, "u1"), (2L, "u2"), (3L, "u3")).toDF("id", "name")
    val books = Seq((10L, "t"), (11L, "t"), (12L, "t")).toDF("id", "title")
    val rated = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L), (2L, 12L),
      (3L, 12L)).toDF("src", "dst")
    val g = new GdsSession(graft.cypher.CypherLite.Graph(
      nodes = Map("User" -> users, "Book" -> books),
      edges = Map("RATED" -> rated)))
    g.graphProject("fix", Seq("User", "Book"), "RATED")
    // export must carry MUTATED state: a node property (wcc components)
    // and a mutate-added relationship type (nodeSimilarity SIMILAR)
    g.wccMutate("fix")
    g.nodeSimilarityMutate("fix")
    val out = java.nio.file.Files
      .createTempDirectory("graft_export_spec").toString
    val meta = g.graphExport("fix", out).head()
    assert(meta.getString(0) == "fix")
    assert(meta.getLong(1) == 6L, "6 projected nodes")
    assert(meta.getLong(2) == 12L + 10L,
      "12 undirected RATED rows + 10 SIMILAR rows")
    assert(meta.getLong(3) == 2L, "two relationship types")
    assert(meta.getLong(4) == 1L, "one node property (componentId)")

    val nodes = spark.read.parquet(s"$out/nodes")
    assert(nodes.count() == 6L)
    assert(nodes.columns.toSeq == Seq("id", "componentId"))
    assert(nodes.select("componentId").distinct().count() == 1L,
      "the fixture is one connected component")

    val rels = spark.read.parquet(s"$out/relationships")
    assert(rels.columns.toSet ==
      Set("relationshipType", "src", "dst", "similarity"))
    assert(rels.groupBy("relationshipType").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("RATED" -> 12L, "SIMILAR" -> 10L))
    // base-type rows null-fill the mutate property; SIMILAR rows carry
    // the similarity values nodeSimilarityStream computes
    assert(rels.filter(col("relationshipType") === "RATED" &&
      col("similarity").isNotNull).count() == 0L)
    val exported = rels.filter(col("relationshipType") === "SIMILAR")
      .select(col("src").as("node1"), col("dst").as("node2"),
        col("similarity"))
    val streamed = g.nodeSimilarityStream("fix")
    assert(exported.exceptAll(streamed).isEmpty &&
      streamed.exceptAll(exported).isEmpty,
      "exported SIMILAR edges diverged from the stream mode")
    // a missing graph fails fast, like GDS
    intercept[RuntimeException] { g.graphExport("nope", out) }
  }

  test("mutate → nodeProperties.write / relationships.write: persist once") {
    import spark.implicits._
    val users = Seq((1L, "u1"), (2L, "u2"), (3L, "u3")).toDF("id", "name")
    val books = Seq((10L, "t"), (11L, "t"), (12L, "t")).toDF("id", "title")
    val rated = Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L), (2L, 12L),
      (3L, 12L)).toDF("src", "dst")
    val g = new GdsSession(graft.cypher.CypherLite.Graph(
      nodes = Map("User" -> users, "Book" -> books),
      edges = Map("RATED" -> rated)))
    g.graphProject("fix", Seq("User", "Book"), "RATED")
    // the GDS compute-in-memory idiom: two mutates, then one persist each
    g.wccMutate("fix")
    g.nodeSimilarityMutate("fix")
    val nProps = g.graphNodePropertiesWrite("fix", Seq("componentId"))
      .head().getLong(0)
    assert(nProps == 6L, "componentId written for all 6 nodes")
    // decoded back to RAW per-label ids: every user and book row carries
    // the property, and the fixture is one component
    assert(g.db.nodes("User").filter(col("componentId").isNotNull)
      .count() == 3L)
    assert(g.db.nodes("Book").filter(col("componentId").isNotNull)
      .count() == 3L)
    assert(g.db.nodes("User").select("componentId")
      .unionAll(g.db.nodes("Book").select("componentId"))
      .distinct().count() == 1L)

    val nRels = g.graphRelationshipsWrite("fix", "SIMILAR").head().getLong(0)
    assert(nRels == 10L)
    val written = g.db.edges("SIMILAR")
    assert(written.columns.toSeq ==
      Seq("src", "srcLabel", "dst", "dstLabel", "similarity"))
    // endpoints decoded: user–user pairs (1,2) at 2/3 and book–book
    // (10,11) at 1.0 from the hand Jaccards
    val m = written.collect().map(r => (r.getString(1), r.getLong(0),
      r.getString(3), r.getLong(2)) -> r.getDouble(4)).toMap
    assert(m(("User", 1L, "User", 2L)) == 0.666667)
    assert(m(("Book", 10L, "Book", 11L)) == 1.0)
    // unknown property / type fail fast
    intercept[RuntimeException] {
      g.graphNodePropertiesWrite("fix", Seq("nope"))
    }
    intercept[RuntimeException] { g.graphRelationshipsWrite("fix", "nope") }
  }

  // ————— r11: the remaining oracled kernels through the front door —————

  /** The cypher cooc projection every hand-built community twin runs on
    * — same edge frame, so route ≡ session-cached silver is the exact
    * claim the driver-gate entries lean on. */
  private def coocProjected: GdsSession = {
    val g = fresh
    g.graphProjectCypher("cooc", ReferenceQueries.ProjectUserNodes,
      ReferenceQueries.ProjectUserSimilarityRels)
    g
  }

  test("r11 leiden: route ≡ userCommunitiesLeiden, all four modes") {
    val g = coocProjected
    val cached = graph.Louvain.userCommunitiesLeiden(spark, sf)
    // the UNSEEDED route (kernel through the catalog) must equal the
    // session-cached silver the driver-gate entry hands in as
    // precomputedLabels — the seam is the identity
    val streamed = g.leidenStream("cooc")
      .select(col("nodeId").as("node_id"), col("communityId").as("community"))
    assert(streamed.exceptAll(cached).isEmpty &&
      cached.exceptAll(streamed).isEmpty,
      "gds.leiden route diverged from the cached Leiden silver")
    val stats = g.leidenStats("cooc",
      precomputedLabels = Some(cached)).head()
    assert(stats.getLong(0) ==
      cached.select(col("community")).distinct().count())
    assert(stats.getDouble(1) > 0.0, "cooc Leiden modularity must be positive")
    // mutate lands on the projection only; write lands on the db
    g.leidenMutate("cooc", precomputedLabels = Some(cached))
    assert(g.graphNodePropertiesStream("cooc", "community").count() ==
      cached.count())
    g.leidenWrite("cooc", precomputedLabels = Some(cached))
    val back = g.db.nodes("User").filter(col("community").isNotNull)
      .select(col("id").as("node_id"), col("community"))
    assert(back.exceptAll(cached).isEmpty && cached.exceptAll(back).isEmpty,
      "leiden.write read-back diverged")
  }

  test("r11 modularityOptimization + sllpa: routes ≡ hand-built twins") {
    val g = coocProjected
    val modopt = graph.Algorithms.userModOptCommunities(spark, sf)
      .withColumnRenamed("label", "community")
    val routed = g.modularityOptimizationStream("cooc")
      .select(col("nodeId").as("node_id"), col("communityId").as("community"))
    assert(routed.exceptAll(modopt).isEmpty && modopt.exceptAll(routed).isEmpty,
      "gds.beta.modularityOptimization route diverged from the twin")
    val stats = g.modularityOptimizationStats("cooc",
      precomputedLabels = Some(modopt)).head()
    assert(stats.getLong(0) ==
      modopt.select(col("community")).distinct().count())

    val sllpa = graph.Sllpa.userSllpa(spark, sf)
    val sRouted = g.sllpaStream("cooc")
      .select(col("nodeId").as("node_id"), col("communityId").as("community"),
        col("strength"))
    assert(sRouted.exceptAll(sllpa).isEmpty && sllpa.exceptAll(sRouted).isEmpty,
      "gds.alpha.sllpa route diverged from the twin")
    // write: sorted membership ARRAY per node (overlapping detector)
    val wrote = g.sllpaWrite("cooc").head().getLong(0)
    assert(wrote == sllpa.select(col("node_id")).distinct().count())
    val arr = g.db.nodes("User").filter(col("pendingCommunities").isNotNull)
    assert(arr.count() == wrote)
    val one = arr.select(col("pendingCommunities")).head().getSeq[Long](0)
    assert(one == one.sorted, "membership array must be sorted")
    val sStats = g.sllpaStats("cooc").head()
    assert(sStats.getLong(0) == wrote)
  }

  test("r11 kcore: fixed-k membership modes over a closed-form fixture") {
    import spark.implicits._
    // K4 {1,2,3,4} with a pendant 5—1: the 3-core is exactly the K4
    // (each member has in-core degree 3); 5 peels out
    val nodes = (1L to 5L).map(Tuple1(_)).toDF("id")
    val edges = (for { a <- 1L to 4L; b <- 1L to 4L if a != b }
      yield (a, b)).toDF("src", "dst")
      .unionByName(Seq((5L, 1L), (1L, 5L)).toDF("src", "dst"))
    val g = new GdsSession(graft.cypher.CypherLite.Graph(
      nodes = Map("N" -> nodes), edges = Map("E" -> edges)))
    g.graphProject("fix", Seq("N"), "E", orientation = "NATURAL")
    val streamed = g.kcoreStream("fix", k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(streamed == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L, 5L -> 0L),
      "3-core must be the K4 with pendant excluded at coreValue 0")
    val stats = g.kcoreStats("fix", k = 3).head()
    assert(stats.getLong(0) == 4L && stats.getLong(1) == 5L)
    g.kcoreMutate("fix", k = 3)
    assert(g.graphNodePropertiesStream("fix", "coreValue").count() == 5L)
    g.kcoreWrite("fix", k = 3, writeLabel = "N")
    assert(g.db.nodes("N").filter(col("coreValue") > 0).count() == 4L)
    // route ≡ the oracled twin on the cooc projection
    val gc = coocProjected
    val viaGds = gc.kcoreStream("cooc", k = 10)
      .filter(col("coreValue") > 0)
      .select(col("nodeId").as("node_id"), col("coreValue").as("core_degree"))
    val twin = graph.Algorithms.userKcore(spark, sf, 10)
    assert(viaGds.exceptAll(twin).isEmpty && twin.exceptAll(viaGds).isEmpty,
      "gds.kcore route diverged from userKcore")
  }

  test("r12 kCoreDecomposition: full core numbers over a 4-value fixture") {
    import spark.implicits._
    // K5 {1..5} (core 4) — bridge 5—6 — triangle {6,7,8} (core 2) —
    // pendant 8—9 (core 1) — isolated 10 (core 0): four DISTINCT
    // coreValue levels, covering both the h-index fixpoint and the
    // overAllNodes 0-completion for edgeless projection nodes
    val nodes = (1L to 10L).map(Tuple1(_)).toDF("id")
    def undirected(ps: Seq[(Long, Long)]) =
      (ps ++ ps.map(_.swap)).toDF("src", "dst")
    val edges = undirected(
      (for { a <- 1L to 5L; b <- 1L to 5L if a < b } yield (a, b)) ++
        Seq((5L, 6L), (6L, 7L), (6L, 8L), (7L, 8L), (8L, 9L)))
    val g = new GdsSession(graft.cypher.CypherLite.Graph(
      nodes = Map("N" -> nodes), edges = Map("E" -> edges)))
    g.graphProject("fix", Seq("N"), "E", orientation = "NATURAL")
    val got = g.kcoreDecompositionStream("fix").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = Map(1L -> 4L, 2L -> 4L, 3L -> 4L, 4L -> 4L, 5L -> 4L,
      6L -> 2L, 7L -> 2L, 8L -> 2L, 9L -> 1L, 10L -> 0L)
    assert(got == want, s"core numbers diverged: $got")
    val stats = g.kcoreDecompositionStats("fix").head()
    assert(stats.getLong(0) == 4L, "degeneracy = max core number")
    assert(stats.getLong(1) == 10L, "stats covers every node")
    g.kcoreDecompositionMutate("fix")
    assert(g.graphNodePropertiesStream("fix", "coreValue").count() == 10L)
    g.kcoreDecompositionWrite("fix", writeLabel = "N")
    assert(g.db.nodes("N").filter(col("coreValue") === 4L).count() == 5L)
    // route ≡ the oracled kernel twin on the cooc projection
    val gc = coocProjected
    val viaGds = gc.kcoreDecompositionStream("cooc")
      .filter(col("coreValue") > 0)
      .select(col("nodeId").as("node_id"), col("coreValue").as("core_value"))
    val twin = graph.Algorithms.userCoreNumbers(spark, sf)
    assert(viaGds.exceptAll(twin).isEmpty && twin.exceptAll(viaGds).isEmpty,
      "gds.kCoreDecomposition route diverged from userCoreNumbers")
    // consistency with the fixed-k extension: a node survives k-peeling
    // iff its core number is ≥ k
    val members = graph.Algorithms.userKcore(spark, sf, 10)
      .select(col("node_id"))
    val byCore = twin.filter(col("core_value") >= 10).select(col("node_id"))
    assert(members.exceptAll(byCore).isEmpty && byCore.exceptAll(members).isEmpty,
      "10-core membership must equal {core_value >= 10}")
  }

  test("r11 kmeans: node-property clustering, fixture + route ≡ assign") {
    import spark.implicits._
    // two well-separated 2-D clusters; Array[Float] like the
    // embeddings table's column
    val vecs = Seq(
      (1L, Array(0.0f, 0.1f)), (2L, Array(0.1f, 0.0f)),
      (3L, Array(0.0f, 0.0f)),
      (11L, Array(9.0f, 9.1f)), (12L, Array(9.1f, 9.0f)),
      (13L, Array(9.0f, 9.0f))).toDF("id", "embedding")
    val g = new GdsSession(graft.cypher.CypherLite.Graph(
      nodes = Map("Vec" -> vecs), edges = Map.empty))
    g.graphProject("fix", Seq("Vec"), "NONE",
      nodeProperties = Seq("embedding"))
    val assigned = g.kmeansStream("fix", k = 2, maxIterations = 2, dim = 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(assigned.keySet == Set(1L, 2L, 3L, 11L, 12L, 13L))
    assert(Set(1L, 2L, 3L).map(assigned).size == 1 &&
      Set(11L, 12L, 13L).map(assigned).size == 1 &&
      assigned(1L) != assigned(11L),
      s"separated clusters must split cleanly: $assigned")
    val stats = g.kmeansStats("fix", k = 2, maxIterations = 2, dim = 2).head()
    assert(stats.getLong(0) == 6L && stats.getLong(1) == 2L)
    g.kmeansMutate("fix", k = 2, maxIterations = 2, dim = 2)
    assert(g.graphNodePropertiesStream("fix", "communityId").count() == 6L)
    g.kmeansWrite("fix", k = 2, maxIterations = 2, dim = 2,
      writeLabel = "Vec")
    assert(g.db.nodes("Vec").filter(col("communityId").isNotNull)
      .count() == 6L)
    // the driver-gate route: embeddings table as a node-property graph;
    // UNSEEDED route ≡ the session-cached KMeans.assign silver
    val emb = Tables.embeddings(spark, sf)
    val ge = new GdsSession(graft.cypher.CypherLite.Graph(
      nodes = Map("Vec" ->
        emb.select(col("vec_id").as("id"), col("embedding"))),
      edges = Map.empty))
    ge.graphProject("vecGraph", Seq("Vec"), "NONE",
      nodeProperties = Seq("embedding"))
    val routed = ge.kmeansStream("vecGraph")
      .select(col("nodeId").as("vec_id"), col("communityId").as("cluster"))
    val twin = ann.KMeans.assign(spark, sf)
    assert(routed.exceptAll(twin).isEmpty && twin.exceptAll(routed).isEmpty,
      "gds.kmeans route diverged from KMeans.assign")
  }

  test("r11 node2vec: route ≡ userEmbeddings; write decodes to the db") {
    val g = coocProjected
    val cached = graph.Node2Vec.userEmbeddings(spark, sf)
      .withColumnRenamed("user_id", "node_id")
    // UNSEEDED route over the projection's weight column ≡ the silver
    val routed = g.node2vecStream("cooc")
      .select(col("nodeId").as("node_id"), col("embedding"))
    assert(routed.exceptAll(cached).isEmpty && cached.exceptAll(routed).isEmpty,
      "gds.beta.node2vec route diverged from userEmbeddings")
    assert(g.node2vecStats("cooc", precomputed = Some(cached))
      .head().getLong(0) == cached.count())
    g.node2vecWrite("cooc", precomputed = Some(cached))
    assert(g.db.nodes("User").filter(col("node2vec").isNotNull).count() ==
      cached.count())
    g.node2vecMutate("cooc", precomputed = Some(cached))
    assert(g.graphNodePropertiesStream("cooc", "node2vec").count() ==
      cached.count())
  }

  test("r11 shortestPath.yens: GDS YIELD shape over a closed-form fixture") {
    import spark.implicits._
    // diamond + long tail: 1→4 has exactly three loopless routes —
    // 1-2-4 (cost 2), 1-3-4 (cost 3), 1-5-6-4 (cost 6)
    val nodes = (1L to 6L).map(Tuple1(_)).toDF("id")
    val edges = Seq(
      (1L, 2L, 1.0), (2L, 4L, 1.0), (1L, 3L, 1.0), (3L, 4L, 2.0),
      (1L, 5L, 2.0), (5L, 6L, 2.0), (6L, 4L, 2.0)).toDF("src", "dst", "w")
    val g = new GdsSession(graft.cypher.CypherLite.Graph(
      nodes = Map("N" -> nodes), edges = Map("E" -> edges)))
    g.graphProject("fix", Seq("N"), "E", orientation = "NATURAL",
      relProperties = Seq("w"))
    val rows = g.shortestPathYensStream("fix", sourceNode = 1L,
      targetNode = 4L, k = 3, relationshipWeightProperty = Some("w"))
      .collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L),
      "index must be 0-based ascending")
    assert(rows.map(_.getDouble(3)).toSeq == Seq(2.0, 3.0, 6.0),
      "totalCost must be nondecreasing and exact")
    assert(rows.map(_.getSeq[Long](4)).toSeq == Seq(
      Seq(1L, 2L, 4L), Seq(1L, 3L, 4L), Seq(1L, 5L, 6L, 4L)),
      "nodeIds must trace the three loopless routes")
    assert(rows.forall(r => r.getLong(1) == 1L && r.getLong(2) == 4L))
    // r12: per-step `costs` (cumulative, aligned with nodeIds) — exact
    // values on the fixture, and the GDS invariants: starts at 0, step
    // deltas sum to totalCost (costs.last == totalCost), nondecreasing
    val costs = rows.map(_.getSeq[Double](5)).toSeq
    assert(costs == Seq(Seq(0.0, 1.0, 2.0), Seq(0.0, 1.0, 3.0),
      Seq(0.0, 2.0, 4.0, 6.0)), s"cumulative costs diverged: $costs")
    rows.zip(costs).foreach { case (r, cs) =>
      assert(cs.length == r.getSeq[Long](4).length,
        "costs must align with nodeIds")
      assert(cs.head == 0.0 && cs.last == r.getDouble(3),
        "costs must start at 0 and end at totalCost")
      assert(cs.sliding(2).forall(p => p.length < 2 || p(0) <= p(1)),
        "cumulative costs must be nondecreasing")
    }
    // weight-property typo fails fast (requireWeightProp contract)
    intercept[IllegalArgumentException] {
      g.shortestPathYensStream("fix", 1L, 4L,
        relationshipWeightProperty = Some("wieght"))
    }
  }

  test("r11 graphImport: export → import round-trip incl. mutated state") {
    val g = fresh
    g.graphProject("userGraph", Seq("User", "Book"), "RATED",
      relProperties = Seq("rating"))
    val pre = Some(graph.FastRP.bipartiteEmbeddings(spark, sf))
    g.fastRpMutate("userGraph", precomputed = pre)
    g.nodeSimilarityMutate("userGraph")
    val out = java.nio.file.Files
      .createTempDirectory("graft_gds_roundtrip").toString
    g.graphExport("userGraph", out)
    // r12: NOTHING restated — labels and the base relationshipType come
    // from the export's manifest sidecar (multi-type export: RATED base
    // + mutated SIMILAR must NOT resolve alphabetically)
    val meta = g.graphImport("imported", out).head()
    assert(meta.getString(0) == "imported")
    // topology: base + mutated relationship types, row-identical
    for (t <- Seq(None, Some("RATED"), Some("SIMILAR"))) {
      val a = g.graphRelationshipsStream("userGraph", t)
      val b = g.graphRelationshipsStream("imported", t)
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"relationship stream diverged after round-trip ($t)")
    }
    // mutated node property rides the nodes frame
    val a = g.graphNodePropertiesStream("userGraph", "embedding")
    val b = g.graphNodePropertiesStream("imported", "embedding")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "mutated node property diverged after round-trip")
    // downstream procedures run on the imported projection
    assert(g.degreeStream("imported").count() ==
      g.degreeStream("userGraph").count())
    // labels round-trip through the manifest: the write mode's encoded
    // id decode (label-striped) must behave identically on the import
    g.wccWrite("userGraph", writeProperty = "ccA")
    g.wccWrite("imported", writeProperty = "ccB")
    assert(g.db.nodes("User")
      .filter(not(col("ccA") <=> col("ccB"))).isEmpty,
      "label-decoded write diverged — manifest labels did not round-trip")
    // explicit arguments still override the manifest; unknown relType /
    // dup name fail fast
    intercept[IllegalArgumentException] {
      g.graphImport("imported2", out, relType = Some("NOPE"))
    }
    intercept[IllegalArgumentException] { g.graphImport("imported", out) }
  }

  test("r11 wave 2: maxkcut / influence / hashgnn routes ≡ hand-built twins") {
    val g = coocProjected
    val maxkcut = graph.Algorithms.userMaxKCut(spark, sf)
    val mk = g.maxKCutStream("cooc")
      .select(col("nodeId").as("node_id"), col("communityId").as("cls"))
    assert(mk.exceptAll(maxkcut).isEmpty && maxkcut.exceptAll(mk).isEmpty,
      "gds.alpha.maxkcut route diverged from userMaxKCut")
    val mkStats = g.maxKCutStats("cooc",
      precomputed = Some(maxkcut)).head()
    assert(mkStats.getLong(0) == maxkcut.count() &&
      mkStats.getLong(1) <= 4L && mkStats.getLong(1) >= 2L)

    val inf = graph.Influence.userInfluenceSeeds(spark, sf)
    val celf = g.influenceMaximizationStream("cooc")
      .select(col("rank").as("seed_rank"), col("nodeId").as("node_id"),
        col("spread").as("gain"))
    assert(celf.exceptAll(inf).isEmpty && inf.exceptAll(celf).isEmpty,
      "gds.beta.influenceMaximization route diverged from the twin")
    val infStats = g.influenceMaximizationStats("cooc",
      precomputed = Some(inf)).head()
    assert(infStats.getLong(0) == 5L && infStats.getLong(1) > 0L)
    g.influenceMaximizationWrite("cooc", precomputed = Some(inf))
    assert(g.db.nodes("User").filter(col("spread").isNotNull).count() == 5L,
      "write must land spread on the seed set only")

    val hg = graph.HashGnn.userHashGnn(spark, sf)
    val routed = g.hashGnnStream("cooc")
      .select(col("nodeId").as("node_id"), col("bit"))
    assert(routed.exceptAll(hg).isEmpty && hg.exceptAll(routed).isEmpty,
      "gds.hashgnn route diverged from userHashGnn")
    g.hashGnnMutate("cooc", precomputed = Some(hg))
    val arr = g.graphNodePropertiesStream("cooc", "hashgnn")
    assert(arr.count() == hg.select(col("node_id")).distinct().count())
    val bits = arr.select(col("propertyValue")).head().getSeq[Int](0)
    assert(bits == bits.sorted && bits.forall(b => b >= 0 && b < 32))
  }

  test("r11 wave 2: scaleProperties route ≡ userScaledProperties") {
    import spark.implicits._
    // projection carries the node property the Mean scaler consumes
    // (each user's mean rating) + the cooc rels for deg/wdeg — the
    // exact frames userScaledProperties derives inline
    val users = graph.RatingsGraph.ratings(spark, sf)
      .groupBy(col("user_id").as("id"))
      .agg((sum(col("rating")).cast("double") / count(lit(1))).as("a"))
    val cooc = graph.RatingsGraph.cooccurrenceEdges(spark, sf)
      .select(col("u1").as("src"), col("u2").as("dst"), col("weight"))
    val g = new GdsSession(graft.cypher.CypherLite.Graph(
      nodes = Map("User" -> users), edges = Map("COOC" -> cooc)))
    g.graphProject("scaleGraph", Seq("User"), "COOC",
      orientation = "NATURAL", relProperties = Seq("weight"),
      nodeProperties = Seq("a"))
    val routed = g.scalePropertiesStream("scaleGraph")
      .withColumnRenamed("nodeId", "node_id")
    val twin = graph.Algorithms.userScaledProperties(spark, sf)
    assert(routed.exceptAll(twin).isEmpty && twin.exceptAll(routed).isEmpty,
      "gds.scaleProperties route diverged from userScaledProperties")
    // a typo'd property fails fast
    intercept[IllegalArgumentException] {
      g.scalePropertiesStream("scaleGraph", nodeProperty = "nope")
    }
  }

  test("r11 wave 2: gds.graph.filter — induced subgraph projection") {
    import spark.implicits._
    // path 1—2—3—4 with weights 1,5,5; node filter drops 4, rel filter
    // drops the weight-1 edge; induction drops 3—4 (endpoint 4 gone)
    val nodes = Seq((1L, 10L), (2L, 20L), (3L, 20L), (4L, 20L))
      .toDF("id", "grp")
    val rels = Seq((1L, 2L, 1.0), (2L, 1L, 1.0), (2L, 3L, 5.0),
      (3L, 2L, 5.0), (3L, 4L, 5.0), (4L, 3L, 5.0)).toDF("src", "dst", "w")
    val g = new GdsSession(graft.cypher.CypherLite.Graph(
      nodes = Map("N" -> nodes), edges = Map("E" -> rels)))
    g.graphProject("full", Seq("N"), "E", orientation = "NATURAL",
      relProperties = Seq("w"))
    val meta = g.graphFilter("sub", "full",
      nodeFilter = "id <= 3", relationshipFilter = "w >= 2.0").head()
    assert(meta.getString(0) == "sub" && meta.getString(1) == "full")
    assert(meta.getLong(2) == 3L, "node filter keeps 1,2,3")
    assert(meta.getLong(3) == 2L,
      "rel filter keeps the weight-5 edges, induction drops 3—4")
    val kept = g.graphRelationshipsStream("sub")
      .select(col("sourceNodeId"), col("targetNodeId")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(kept == Set((2L, 3L), (3L, 2L)))
    // downstream procedure over the filtered projection
    assert(g.degreeStream("sub").count() == 3L)
    // '*' keeps everything; dup name fails fast
    val all = g.graphFilter("copy", "full").head()
    assert(all.getLong(2) == 4L && all.getLong(3) == 6L)
    intercept[IllegalArgumentException] { g.graphFilter("sub", "full") }
  }

  test("r11 wave 2: gds.beta.graph.generate registers a deterministic projection") {
    val g = fresh
    val meta = g.graphGenerate("rmat", scale = 8, edgeCount = 500L).head()
    assert(meta.getString(0) == "rmat")
    val kernel = graph.Algorithms.rmatEdges(spark, 8, 500L)
    assert(meta.getLong(2) == kernel.count(), "relationshipCount = E")
    // the FULL requested universe, like GDS — not just src ∪ dst
    assert(meta.getLong(1) == 256L, "nodeCount = 2^scale")
    // the registered projection IS the kernel's edge set
    val rels = g.graphRelationshipsStream("rmat")
      .select(col("sourceNodeId").as("src"), col("targetNodeId").as("dst"))
    val twin = kernel.select(col("src"), col("dst"))
    assert(rels.exceptAll(twin).isEmpty && twin.exceptAll(rels).isEmpty)
    // downstream procedures run on the generated graph
    assert(g.degreeStream("rmat").count() == meta.getLong(1))
    // deterministic: a second registration reproduces the counts
    val meta2 = g.graphGenerate("rmat2", scale = 8, edgeCount = 500L).head()
    assert(meta2.getLong(1) == meta.getLong(1) &&
      meta2.getLong(2) == meta.getLong(2))
    intercept[IllegalArgumentException] { g.graphGenerate("rmat") }
  }

  test("gds.graph.sample.rwr: deterministic community-local subgraph") {
    import spark.implicits._
    // two 4-cliques bridged by one edge: a walk budget from node 1
    // stays community-local, so the half-ratio sample is clique A
    val cliqueA = Seq(1L, 2L, 3L, 4L)
    val cliqueB = Seq(11L, 12L, 13L, 14L)
    def cliqueEdges(ns: Seq[Long]) =
      for { a <- ns; b <- ns if a != b } yield (a, b)
    val edges = (cliqueEdges(cliqueA) ++ cliqueEdges(cliqueB) ++
      Seq((4L, 11L), (11L, 4L))).toDF("src", "dst")
    val nodes = (cliqueA ++ cliqueB).map(Tuple1(_)).toDF("id")
    val g = new GdsSession(graft.cypher.CypherLite.Graph(
      nodes = Map("N" -> nodes), edges = Map("E" -> edges)))
    g.graphProject("full", Seq("N"), "E", orientation = "NATURAL")
    val meta = g.graphSampleRwr("sampled", "full", startNode = 1L,
      samplingRatio = 0.5, walkers = 8, steps = 12).head()
    assert(meta.getString(0) == "sampled" && meta.getString(1) == "full")
    assert(meta.getLong(2) == 4L, "half-ratio sample = 4 of 8 nodes")
    assert(g.graphExists("sampled").head().getBoolean(0))
    val sampledIds = g.graphNodePropertiesStream("sampled", "id")
      .select("nodeId").collect().map(_.getLong(0)).toSet
    // the most-visited 4 from a clique-A start must be clique-A-heavy:
    // every sampled node reachable, bridge nodes allowed, clique B's
    // far side is not
    assert(sampledIds.contains(1L))
    assert(sampledIds.intersect(Set(12L, 13L, 14L)).size <= 1,
      s"sample leaked deep into clique B: $sampledIds")
    // induced edges: both endpoints sampled
    val rels = g.graphRelationshipsStream("sampled")
    val ids = sampledIds
    assert(rels.collect().forall(r =>
      ids(r.getLong(0)) && ids(r.getLong(1))))
    // r11 YIELD carries the requested target next to the achieved
    // count so undersampling is visible at the call site
    assert(meta.getLong(3) == 4L, "targetNodeCount = ceil(0.5 * 8)")
    assert(meta.getLong(4) == rels.count())
    // the downstream procedure chain runs on the sample
    assert(g.degreeStream("sampled").count() == 4L)
    // deterministic: the same draw replays identically
    g.graphDrop("sampled")
    val meta2 = g.graphSampleRwr("sampled", "full", startNode = 1L,
      samplingRatio = 0.5, walkers = 8, steps = 12).head()
    assert(meta2.getLong(2) == meta.getLong(2) &&
      meta2.getLong(4) == meta.getLong(4))
    // dup name / bad ratio fail fast
    intercept[IllegalArgumentException] {
      g.graphSampleRwr("sampled", "full", startNode = 1L)
    }
    intercept[IllegalArgumentException] {
      g.graphSampleRwr("s2", "full", startNode = 1L, samplingRatio = 0.0)
    }
  }

  test("r12b hits: Fibonacci fixture, all four modes, route ≡ hitsTopK") {
    import spark.implicits._
    // hubs {1, 2} → auths {10, 11}: 1→10, 1→11, 2→10 (unit weights).
    // The mutual power recurrence walks the Fibonacci numbers: after
    // iteration k, h ∝ (F(2k+2), F(2k+1)) and a ∝ (F(2k+1), F(2k)) —
    // at k = 5 that is h = (144, 89)/√28657, a = (89, 55)/√10946.
    // Node 12 is edgeless: both sides complete to 0.0.
    val nodes = Seq(1L, 2L, 10L, 11L, 12L).map(Tuple1(_)).toDF("id")
    val edges = Seq((1L, 10L), (1L, 11L), (2L, 10L)).toDF("src", "dst")
    val g = new GdsSession(graft.cypher.CypherLite.Graph(
      nodes = Map("N" -> nodes), edges = Map("E" -> edges)))
    g.graphProject("fix", Seq("N"), "E", orientation = "NATURAL")
    val got = g.hitsStream("fix").collect()
      .map(r => (r.getLong(0), (r.getDouble(1), r.getDouble(2)))).toMap
    val (hn, an) = (math.sqrt(28657.0), math.sqrt(10946.0))
    val want = Map(
      1L -> (144.0 / hn, 0.0), 2L -> (89.0 / hn, 0.0),
      10L -> (0.0, 89.0 / an), 11L -> (0.0, 55.0 / an),
      12L -> (0.0, 0.0))
    assert(got.keySet == want.keySet)
    want.foreach { case (id, (h, a)) =>
      assert(math.abs(got(id)._1 - h) < 1e-9, s"hub($id)")
      assert(math.abs(got(id)._2 - a) < 1e-9, s"auth($id)")
    }
    val stats = g.hitsStats("fix").head()
    assert(stats.getLong(0) == 5L && stats.getLong(1) == 5L)
    g.hitsMutate("fix")
    assert(g.graphNodePropertiesStream("fix", "hitsHub").count() == 5L)
    g.hitsWrite("fix", writeLabel = "N")
    assert(g.db.nodes("N").filter(col("hitsAuth") > 0.8).count() == 1L,
      "only auth 10 (89/√10946 ≈ 0.851) clears 0.8")
    // route over the NATURAL bipartite reference projection, decoded
    // to top-10 per side, ≡ the oracled hitsTopK kernel
    val gr = fresh
    gr.graphProject("hitsGraph", Seq("User", "Book"), "RATED",
      orientation = "NATURAL", relProperties = Seq("rating"))
    val f = gr.hitsStream("hitsGraph", hitsIterations = 5,
      relationshipWeightProperty = Some("rating")).localCheckpoint()
    def side(parity: Long, role: String, score: String) = f
      .filter(pmod(col("nodeId"), lit(2L)) === parity)
      .select(lit(role).as("role"),
        ((col("nodeId") - parity) / 2L).cast("bigint").as("node_id"),
        round(col(score), 6).as("score"))
      .orderBy(col("score").desc, col("node_id")).limit(10)
    val viaGds = side(0L, "hub", "hub").unionAll(side(1L, "authority", "auth"))
    val twin = graph.Algorithms.hitsTopK(spark, sf)
    assert(viaGds.exceptAll(twin).isEmpty && twin.exceptAll(viaGds).isEmpty,
      "gds.alpha.hits route diverged from hitsTopK")
  }

  test("r12b closeness: path fixture + route ≡ userClosenessSample") {
    import spark.implicits._
    // path 1—2—3—4—5, samplingSize 2 → sources {1, 2}, horizon 3:
    // closeness(1) = 3 reached / (1+2+3) = 0.5,
    // closeness(2) = 4 reached / (1+1+2+3) = 4/7; non-sources 0.0
    val nodes = (1L to 5L).map(Tuple1(_)).toDF("id")
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val edges = (path ++ path.map(_.swap)).toDF("src", "dst")
    val g = new GdsSession(graft.cypher.CypherLite.Graph(
      nodes = Map("N" -> nodes), edges = Map("E" -> edges)))
    g.graphProject("fix", Seq("N"), "E", orientation = "NATURAL")
    val got = g.closenessStream("fix", samplingSize = 2).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(got(1L) == 0.5 && got(2L) == 0.571429, s"sources: $got")
    assert(Seq(3L, 4L, 5L).forall(got(_) == 0.0), "non-sample completes 0.0")
    assert(g.closenessStats("fix", samplingSize = 2).head().getLong(0) == 5L)
    g.closenessMutate("fix", samplingSize = 2)
    assert(g.graphNodePropertiesStream("fix", "closeness").count() == 5L)
    // route over the cooc projection with sourceNodes pinning the
    // kernel's fixed sample (user ids are 0-based, so the lowest-4
    // default would drift to {0,1,2,3}) ≡ the oracled kernel
    val gc = coocProjected
    val viaGds = gc.closenessStream("cooc",
        sourceNodes = Seq(1L, 2L, 3L, 4L))
      .filter(col("score") > 0.0)
      .select(col("nodeId").as("source"), col("score").as("closeness"))
    val twin = graph.Algorithms.userClosenessSample(spark, sf)
      .select(col("source"), col("closeness"))
    assert(viaGds.exceptAll(twin).isEmpty && twin.exceptAll(viaGds).isEmpty,
      "gds.closeness route diverged from userClosenessSample")
  }

  test("r12b randomWalk.stream: walk-shape invariants + route ≡ randomWalks") {
    import spark.implicits._
    val nodes = (1L to 3L).map(Tuple1(_)).toDF("id")
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L))
    val edges = (tri ++ tri.map(_.swap)).toDF("src", "dst")
    val g = new GdsSession(graft.cypher.CypherLite.Graph(
      nodes = Map("N" -> nodes), edges = Map("E" -> edges)))
    g.graphProject("fix", Seq("N"), "E", orientation = "NATURAL")
    val walks = g.randomWalkStream("fix", sourceNodes = Seq(1L),
      walkLength = 4, walksPerNode = 2).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
    assert(walks.keySet == Set(2L, 3L), "walk ids = source * walksPerNode + w")
    val edgeSet = (tri ++ tri.map(_.swap)).toSet
    walks.values.foreach { w =>
      assert(w.length == 4 && w.head == 1L, s"walk shape: $w")
      w.sliding(2).foreach { p =>
        assert(edgeSet.contains((p(0), p(1))), s"non-edge step in $w") }
    }
    // deterministic: the seeded hash draw replays identically
    val again = g.randomWalkStream("fix", sourceNodes = Seq(1L),
      walkLength = 4, walksPerNode = 2).collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1))).toMap
    assert(again == walks)
    // route over the cooc projection, unrolled ≡ the oracled kernel
    val gc = coocProjected
    val viaGds = gc.randomWalkStream("cooc",
        sourceNodes = Seq(1L, 2L, 3L, 4L), walkLength = 5, walksPerNode = 2)
      .select(col("walkId").as("walk_id"), posexplode(col("nodeIds")))
      .select(col("walk_id"), col("pos").cast("bigint").as("step"),
        col("col").as("node_id"))
    val twin = graph.Algorithms.randomWalks(
      graph.RatingsGraph.cooccurrenceEdges(spark, sf)
        .select(col("u1").as("src"), col("u2").as("dst")),
      sources = Seq(1L, 2L, 3L, 4L), steps = 4, walksPerSource = 2,
      symmetric = true)
    assert(viaGds.exceptAll(twin).isEmpty && twin.exceptAll(viaGds).isEmpty,
      "gds.randomWalk route diverged from the randomWalks kernel")
  }

  test("r12b spanningTree: rooted fixture, both objectives, all modes") {
    import spark.implicits._
    // triangle 1—2 (3), 2—3 (2), 1—3 (1) + pendant 3—4 (5), plus a
    // disconnected pair 5—6 (1): MAXIMUM keeps {1-2, 2-3, 3-4} in
    // source 1's component, MINIMUM keeps {1-3, 2-3, 3-4}; the pair
    // never enters the rooted answer (effectiveNodeCount pins it)
    val nodes = (1L to 6L).map(Tuple1(_)).toDF("id")
    val pairs = Seq((1L, 2L, 3.0), (2L, 3L, 2.0), (1L, 3L, 1.0),
      (3L, 4L, 5.0), (5L, 6L, 1.0))
    val edges = (pairs ++ pairs.map(p => (p._2, p._1, p._3)))
      .toDF("src", "dst", "w")
    val g = new GdsSession(graft.cypher.CypherLite.Graph(
      nodes = Map("N" -> nodes), edges = Map("E" -> edges)))
    g.graphProject("fix", Seq("N"), "E", orientation = "NATURAL",
      relProperties = Seq("w"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val maxT = rows(g.spanningTreeStream("fix", sourceNode = 1L,
      objective = "MAXIMUM", relationshipWeightProperty = Some("w")))
    assert(maxT == Set((1L, 1L, 0.0), (2L, 1L, 3.0), (3L, 2L, 2.0),
      (4L, 3L, 5.0)), s"max tree: $maxT")
    val minT = rows(g.spanningTreeStream("fix", sourceNode = 1L,
      objective = "MINIMUM", relationshipWeightProperty = Some("w")))
    assert(minT == Set((1L, 1L, 0.0), (3L, 1L, 1.0), (2L, 3L, 2.0),
      (4L, 3L, 5.0)), s"min tree: $minT")
    val stats = g.spanningTreeStats("fix", sourceNode = 1L,
      objective = "MAXIMUM", relationshipWeightProperty = Some("w")).head()
    assert(stats.getLong(0) == 4L && stats.getDouble(1) == 10.0)
    val wr = g.spanningTreeWrite("fix", sourceNode = 1L,
      objective = "MAXIMUM", relationshipWeightProperty = Some("w")).head()
    assert(wr.getLong(0) == 4L && wr.getLong(1) == 3L && wr.getDouble(2) == 10.0)
    assert(g.db.edges("MST").count() == 3L, "write installs the rel type")
    g.spanningTreeMutate("fix", sourceNode = 1L, objective = "MAXIMUM",
      relationshipWeightProperty = Some("w"))
    assert(g.graphRelationshipsStream("fix", Some("MST")).count() == 3L)
    // route (precomputedForest = the session silver) stays inside the
    // oracled mst_edges forest and spans source 1's component
    val gc = coocProjected
    val forest = graph.Algorithms.userSpanningForest(spark, sf)
    val rooted = gc.spanningTreeStream("cooc", sourceNode = 1L,
      objective = "MAXIMUM", relationshipWeightProperty = Some("weight"),
      precomputedForest = Some(forest))
      .filter(col("nodeId") =!= col("parentId"))
      .select(least(col("nodeId"), col("parentId")).as("src"),
        greatest(col("nodeId"), col("parentId")).as("dst"), col("weight"))
    assert(rooted.exceptAll(forest.select(col("src"), col("dst"),
      col("weight"))).isEmpty, "rooted rows must be forest edges")
  }

  test("r12b kSpanningTree: cut fixture + route ≡ kSpanningClusters") {
    import spark.implicits._
    // MAXIMUM forest of the spanningTree fixture graph is {1-2 (3),
    // 2-3 (2), 3-4 (5), 5-6 (1)}; k=2 cuts the weakest forest edge
    // (5-6) → {1,2,3,4} + singletons {5}, {6}; k=3 also cuts 2-3 →
    // {1,2}, {3,4}, {5}, {6}
    val nodes = (1L to 6L).map(Tuple1(_)).toDF("id")
    val pairs = Seq((1L, 2L, 3.0), (2L, 3L, 2.0), (1L, 3L, 1.0),
      (3L, 4L, 5.0), (5L, 6L, 1.0))
    val edges = (pairs ++ pairs.map(p => (p._2, p._1, p._3)))
      .toDF("src", "dst", "w")
    val g = new GdsSession(graft.cypher.CypherLite.Graph(
      nodes = Map("N" -> nodes), edges = Map("E" -> edges)))
    g.graphProject("fix", Seq("N"), "E", orientation = "NATURAL",
      relProperties = Seq("w"))
    def labels(k: Int) = g.kSpanningTreeStream("fix", k = k,
      relationshipWeightProperty = Some("w")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(labels(2) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 6L))
    assert(labels(3) == Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L,
      5L -> 5L, 6L -> 6L))
    val stats = g.kSpanningTreeStats("fix", k = 3,
      relationshipWeightProperty = Some("w")).head()
    assert(stats.getLong(0) == 4L && stats.getLong(1) == 6L)
    // route (precomputed silver) ≡ the oracled kernel, completed over
    // the projection node set
    val gc = coocProjected
    val viaGds = gc.kSpanningTreeStream("cooc", k = 5,
        precomputed = Some(graph.Algorithms.kSpanningClusters(spark, sf, 5)))
      .select(col("nodeId").as("node_id"), col("communityId").as("cluster"))
    val twin = graph.Algorithms.kSpanningClusters(spark, sf, 5)
    // projection nodes without cooc edges complete to their own id
    val completed = graph.RatingsGraph.activeUsers(spark, sf)
      .select(col("user_id").as("node_id"))
      .join(twin, Seq("node_id"), "left")
      .select(col("node_id"),
        coalesce(col("cluster"), col("node_id")).as("cluster"))
    assert(viaGds.exceptAll(completed).isEmpty &&
      completed.exceptAll(viaGds).isEmpty,
      "gds.kSpanningTree route diverged from kSpanningClusters")
  }
}
