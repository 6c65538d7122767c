package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.{Algorithms, FastRP}
import graft.ann.Lsh
import graft.recommend.Recommend

/** The learned-label query surface: community recommendations driven by
  * planted/learned assignments, and the reference's exact KNN operating
  * point (GDS-normalised cosine, topK=20, cutoff=0.8). */
class LearnedSurfaceSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("recommendCommunityWith: planted two-user community recommends exactly the peer's unseen liked books") {
    val ratings = graph.RatingsGraph.ratings(spark, sf)
    // pick a peer of user 1 that actually has >=6-rated books
    val peer = ratings.filter(col("user_id") =!= 1L && col("rating") >= 6)
      .select(col("user_id")).orderBy("user_id").head().getLong(0)
    val labels = ratings.select(col("user_id")).distinct()
      .select(col("user_id"),
        when(col("user_id").isin(1L, peer), lit(-1L)).otherwise(col("user_id")).as("community"))
    val got = Recommend.recommendCommunityWith(spark, sf, labels, 1L, 1000)
      .collect().map(_.getLong(0)).toSet
    // independent truth: peer's >=6 books minus user 1's books
    val peerBooks = ratings.filter(col("user_id") === peer && col("rating") >= 6)
      .collect().map(_.getLong(1)).toSet
    val myBooks = ratings.filter(col("user_id") === 1L)
      .collect().map(_.getLong(1)).toSet
    assert(got == (peerBooks -- myBooks), s"got $got want ${peerBooks -- myBooks}")
  }

  test("usersInLargeGroupsLouvain matches the Louvain label histogram, unlabelled users grouped as ONE null community") {
    // reference parity (`streamlit_app.py:15-30`): ALL users are
    // grouped by the community property; users Louvain never labelled
    // carry null and form one group in Neo4j — pinned here
    val labelMap = graph.Louvain.userCommunities(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val active = graph.RatingsGraph.activeUsers(spark, sf).select("user_id")
      .collect().map(_.getLong(0)).toSet
    val sizes = labelMap.toSeq.groupBy(_._2).map { case (c, xs) => c -> xs.size.toLong }
    val unlabelled = active -- labelMap.keySet
    val got = Recommend.usersInLargeGroupsLouvain(spark, sf).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getLong(3)))
    val expectLabelled = labelMap.filter { case (_, c) => sizes(c) > 1 }.keySet
    val expectNull = if (unlabelled.size > 1) unlabelled else Set.empty[Long]
    assert(got.map(_._1).toSet == (expectLabelled ++ expectNull))
    got.foreach {
      case (u, Some(c), sz) => assert(labelMap(u) == c && sz == sizes(c) && sz > 1)
      case (u, None, sz) => assert(unlabelled.contains(u) && sz == unlabelled.size && sz > 1)
    }
  }

  test("graphNeighborhoodWith: exact typed edge list on a planted fixture") {
    val ratings = Seq((1L, 10L, 7L), (1L, 11L, 5L), (2L, 10L, 9L), (3L, 12L, 8L), (4L, 13L, 6L))
      .toDF("user_id", "book_id", "rating")
    val sims = Seq((2L, 0.9), (3L, 0.8)).toDF("user_id", "weight")
    val got = Recommend.graphNeighborhoodWith(ratings, sims, 1L).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    // target's books, SIMILAR_TO with carried weight, similar users'
    // books — and NOT user 4 (not similar) or its book
    val want = Set(
      ("RATED", 1L, 10L, 7.0), ("RATED", 1L, 11L, 5.0),
      ("RATED", 2L, 10L, 9.0), ("RATED", 3L, 12L, 8.0),
      ("SIMILAR_TO", 1L, 2L, 0.9), ("SIMILAR_TO", 1L, 3L, 0.8))
    assert(got == want, s"got $got")
  }

  test("graphNeighborhoodKnn returns the target's RATED edges (plus KNN hops where edges exist)") {
    val got = Recommend.graphNeighborhoodKnn(spark, sf).collect()
    assert(got.nonEmpty)
    // SIMILAR_TO weights, where present, are on the GDS [0,1] scale
    got.filter(_.getString(0) == "SIMILAR_TO").foreach { r =>
      assert(r.getDouble(3) >= 0.8 && r.getDouble(3) <= 1.0) }
  }

  test("recommend_community_louvain returns rows on testdata") {
    assert(Recommend.recommendCommunityLouvain(spark, sf).count() > 0)
  }

  test("KNN at the reference operating point: identical raters pair at GDS sim >= 0.8, disjoint raters don't") {
    // users 1 and 2 rate the same 10 books identically; user 3 rates 10
    // disjoint books — identical neighbourhoods give identical FastRP
    // states (iteration weight 0 on the random initial state), so
    // cos(1,2)=1 → GDS sim 1; disjoint raters stay far below 0.8
    val ratings =
      (1 to 10).flatMap(b => Seq((1L, 100L + b, 5.0 + (b % 5)), (2L, 100L + b, 5.0 + (b % 5)))) ++
      (1 to 10).map(b => (3L, 200L + b, 7.0))
    val fwd = ratings.toDF("u", "b", "w")
      .select((col("u") * 2).cast("bigint").as("src"),
        (col("b") * 2 + 1).cast("bigint").as("dst"), col("w").as("weight"))
    val edges = fwd.unionAll(fwd.select(col("dst").as("src"), col("src").as("dst"), col("weight")))
    val emb = FastRP.embed(edges)
      .filter(pmod(col("node_id"), lit(2)) === 0)
      .select((col("node_id") / 2).cast("bigint").as("user_id"), col("embedding"))
    val gds = Lsh.knnEdges(emb, "user_id", "embedding", 64, topK = 20, cutoff = 2 * 0.8 - 1)
      .withColumn("gds_sim", (col("similarity") + 1) / 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(gds.contains((1L, 2L)) && gds((1L, 2L)) >= 0.8, s"identical raters missing: $gds")
    assert(!gds.keys.exists { case (a, b) => a == 3L || b == 3L },
      s"disjoint rater passed the 0.8 cutoff: $gds")
  }

  test("recommendFromSimilar: planted fixture yields exact avg/votes ranking") {
    // sims = {2, 3}; user 1 already rated book 10.
    // book 11: rated 8 by u2, 6 by u3 → avg 7.0, votes 2
    // book 12: rated 9 by u2 → avg 9.0, votes 1
    // book 10: anti-joined away despite u3's rating
    val ratings = Seq(
      (1L, 10L, 5L), (2L, 11L, 8L), (3L, 11L, 6L), (2L, 12L, 9L), (3L, 10L, 7L))
      .toDF("user_id", "book_id", "rating")
    val sims = Seq(2L, 3L).toDF("user_id")
    val books = Seq((10L, "ten"), (11L, "eleven"), (12L, "twelve")).toDF("book_id", "title")
    val got = Recommend.recommendFromSimilar(ratings, sims, books, user = 1L, k = 3)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    assert(got.toSeq == Seq((12L, "twelve", 9.0, 1L), (11L, "eleven", 7.0, 2L)), got.mkString(","))
  }

  test("knn_similar_edges_ref is non-empty at sf0.001 with similarity in [0.8, 1]") {
    val df = Algorithms.userKnnEdgesRef(spark, sf).cache()
    val n = df.count()
    assert(n > 0, "no SIMILAR_TO edges at the reference cutoff")
    val mm = df.agg(min("similarity"), max("similarity")).head()
    assert(mm.getDouble(0) >= 0.8 && mm.getDouble(1) <= 1.0 + 1e-9, mm.toString)
  }
}
