package graft.cypher

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.graph.RatingsGraph
import graft.recommend.Recommend

/** The reference app's Cypher read queries, compiled by [[CypherLite]]
  * against the engine's property frames.
  *
  * Property mapping (the same one every hand-built twin documents:
  * `recommender_knn.py:40` returns u2.location/u2.age — name/community/
  * segment are THIS data model's user properties):
  * User(id ← user_id, name, community, segment),
  * Book(id ← book_id, title, brand, book_type),
  * RATED(src ← user_id, dst ← book_id, rating),
  * SIMILAR_TO(src, dst) — parameterised, like the reference's choice of
  * KNN- or co-occurrence-derived similarity.
  *
  * Each compiled query is spec-proved ROW-IDENTICAL to its hand-built
  * twin (`CypherLiteSpec`), and three are registered as driver-gate
  * entries reusing the twin's DuckDB oracle verbatim — the compiler
  * output hash-matches the SQL the twin already matches. */
object ReferenceQueries {

  /** The standard property-graph binding over a data dir. `sims` can be
    * any (src, dst) SIMILAR_TO edge set; default = the co-occurrence
    * top-20 of the target user (what `recommend_knn` uses). */
  def graph(spark: SparkSession, dir: String,
      sims: Option[DataFrame] = None,
      user: Long = Recommend.TargetUser): CypherLite.Graph = {
    val simEdges = sims.getOrElse(
      Recommend.similarUsersCooc(spark, dir, user, 20)
        .select(lit(user).as("src"), col("user_id").as("dst"),
          col("weight").cast("double").as("similarity")))
    CypherLite.Graph(
      nodes = Map(
        "User" -> RatingsGraph.activeUsers(spark, dir)
          .select(col("user_id").as("id"), col("name"), col("community"),
            col("segment")),
        "Book" -> RatingsGraph.ratedBooks(spark, dir)
          .select(col("book_id").as("id"), col("title"), col("brand"),
            col("book_type"))),
      edges = Map(
        "RATED" -> RatingsGraph.ratings(spark, dir)
          .select(col("user_id").as("src"), col("book_id").as("dst"),
            col("rating")),
        "SIMILAR_TO" -> simEdges))
  }

  /** `streamlit_app.py:33-46` get_user_rated_books. */
  val UserBooks: String =
    """MATCH (u:User {id: $userId})-[r:RATED]->(b:Book)
      |RETURN b.id AS book_id, b.title AS title, r.rating AS rating
      |ORDER BY rating DESC, book_id""".stripMargin

  /** `recommender_knn.py:11-28` recommend_books (avg + votes top-3 with
    * the NOT-rated anti-join pattern predicate). */
  val RecommendKnn: String =
    """MATCH (target:User {id: $userId})
      |MATCH (target)-[:SIMILAR_TO]->(sim:User)-[r:RATED]->(book:Book)
      |WHERE NOT (target)-[:RATED]->(book)
      |WITH book, avg(r.rating) AS avg_rating, count(*) AS votes
      |ORDER BY avg_rating DESC, votes DESC, book.id
      |LIMIT 3
      |RETURN book.id AS book_id, book.title AS title, avg_rating, votes
      |ORDER BY avg_rating DESC, votes DESC, book_id""".stripMargin

  /** `streamlit_app.py:15-30` get_users_in_large_communities
    * (COLLECT + size filter + UNWIND). */
  val LargeGroups: String =
    """MATCH (u:User)
      |WITH u.community AS community, COLLECT(u) AS users,
      |  count(*) AS community_size
      |WHERE community_size > 1
      |UNWIND users AS user
      |RETURN user.id AS user_id, user.name AS name, community, community_size
      |ORDER BY community, user_id""".stripMargin

  /** `recommender_knn.py:31-45` get_similar_users (DISTINCT over the
    * SIMILAR_TO expansion; ORDER added for determinism — the reference
    * LIMITs without ORDER, which Neo4j resolves arbitrarily). */
  val SimilarUsers: String =
    """MATCH (u1:User {id: $userId})-[:SIMILAR_TO]->(u2:User)
      |WHERE u1.id <> u2.id
      |RETURN DISTINCT u2.id AS user_id, u2.name AS name,
      |  u2.community AS community, u2.segment AS segment
      |ORDER BY user_id
      |LIMIT 3""".stripMargin

  /** `recommender_community.py:11-32` recommend_books_by_community
    * (bound-scalar property lookup + rating filter + anti-join). */
  val RecommendCommunity: String =
    """MATCH (targetUser:User {id: $userId})
      |WITH targetUser, targetUser.community AS communityId
      |MATCH (otherUser:User {community: communityId})
      |WHERE otherUser.id <> $userId
      |MATCH (otherUser)-[r:RATED]->(b:Book)
      |WHERE r.rating >= 6 AND NOT (targetUser)-[:RATED]->(b)
      |RETURN b.id AS book_id, b.title AS title, count(*) AS recommend_count
      |ORDER BY recommend_count DESC, book_id
      |LIMIT 3""".stripMargin

  /** `recommender_knn.py:48-79` get_graph_data VERBATIM — including the
    * `//` comments and the three OPTIONAL MATCH cascades (null sim →
    * null books, Cypher's optional null cascade). */
  val GraphData: String =
    """MATCH (target:User {id: $userId})
      |
      |// Bücher des Zielnutzers
      |OPTIONAL MATCH (target)-[r1:RATED]->(b1:Book)
      |
      |// Ähnliche Nutzer über Embedding-KNN
      |OPTIONAL MATCH (target)-[simRel:SIMILAR_TO]->(sim:User)
      |
      |// Bücher der ähnlichen Nutzer
      |OPTIONAL MATCH (sim)-[r2:RATED]->(b2:Book)
      |
      |RETURN
      |    target AS u1,
      |    sim AS u2,
      |    b1 AS book1,
      |    r1.rating AS rating1,
      |    b2 AS book2,
      |    r2.rating AS rating2,
      |    simRel.similarity AS similarityScore""".stripMargin

  /** `recommender_community.py:36-52` get_community_members — the
    * seventh and last reference read query: scalar WITH, bound-scalar
    * community lookup, WITH DISTINCT + LIMIT (the reference LIMITs
    * without ORDER, so WHICH 3 members is engine-arbitrary — in Neo4j
    * too), then a re-MATCH by the projected scalar id. */
  val CommunityMembers: String =
    """MATCH (u1:User {id: $userId})
      |WITH u1.community AS communityId
      |MATCH (u2:User {community: communityId})
      |WHERE u2.id <> $userId
      |WITH DISTINCT u2.id AS userId
      |LIMIT 3
      |MATCH (u:User {id: userId})
      |RETURN u.id AS user_id, u.name AS name, u.segment AS segment
      |ORDER BY u.id""".stripMargin

  /** The bipartite ratings graph as a single-label property graph:
    * node id = the engine's encoded bipartite id (user → 2·id, book →
    * 2·id + 1, `Algorithms.bipartiteEdges`), LINKED = the rated edges
    * (both directions already stored) — the binding the var-length
    * traversal idiom walks. */
  def bipartiteGraph(spark: SparkSession, dir: String): CypherLite.Graph = {
    val edges = graft.graph.Algorithms.bipartiteEdges(spark, dir)
      .select(col("src"), col("dst"))
    CypherLite.Graph(
      nodes = Map("BNode" -> edges.select(col("src").as("id")).distinct()),
      edges = Map("LINKED" -> edges))
  }

  /** The `(a)-[:T*min..max]-(b)` idiom (the first wall a Cypher-fluent
    * user hit in r8 — the reference app itself stays single-hop, so
    * this is the `recommender_knn.py:48-79` neighborhood-expansion
    * family written the Cypher-native way). Compiles onto the bounded
    * multi-source BFS; gated on the `bfs_hops` twin's own oracle. */
  val BfsHops: String =
    """MATCH (s:BNode {id: 2})-[h:LINKED*0..3]-(v:BNode)
      |RETURN v.id AS node_id, h.hops AS hops
      |ORDER BY node_id""".stripMargin

  def bfsHopsCompiled(spark: SparkSession, dir: String): DataFrame =
    CypherLite.run(bipartiteGraph(spark, dir), BfsHops)

  /** Per-PATH var-length matching (r12): every relationship-unique
    * 2-hop path user1—book—co-rater over the ENCODED bipartite graph
    * (the bfs_hops substrate — raw user/book ids collide, so
    * label-crossing traversal needs the 2u / 2b+1 encoding), ONE ROW
    * PER PATH — the row multiplicity (shared-book count per co-rater)
    * is exactly what the DISTINCT-endpoint segment form cannot
    * express. Gated on a plain ratings self-join oracle. */
  val VarPaths: String =
    """MATCH p = (a:BNode {id: 2})-[r:LINKED*2..2]-(b:BNode)
      |RETURN b.id AS node_id, length(p) AS hops
      |ORDER BY node_id""".stripMargin

  def varPathsCompiled(spark: SparkSession, dir: String): DataFrame =
    CypherLite.run(bipartiteGraph(spark, dir), VarPaths)

  /** The user co-occurrence graph binding for the shortestPath idiom —
    * COOC edges come from the session-cached bidirectional silver
    * (`Algorithms.userCoocBidir`), the same substrate the
    * `shortest_path_nodes` twin traverses. */
  def coocGraph(spark: SparkSession, dir: String): CypherLite.Graph = {
    val cooc = graft.graph.Algorithms.userCoocBidir(spark, dir)
    CypherLite.Graph(
      nodes = Map("User" -> cooc.select(col("src").as("id")).distinct()),
      edges = Map("COOC" -> cooc))
  }

  /** Cypher's `shortestPath()` syntax over the engine's deterministic
    * BFS (min-parent tie-break) — gated on the `shortest_path_nodes`
    * twin's own oracle. */
  val ShortestPathQuery: String =
    """MATCH p = shortestPath((a:User {id: $src})-[:COOC*..6]-(b:User {id: $dst}))
      |UNWIND nodes(p) AS n
      |RETURN n.step AS step, n.node_id AS node_id
      |ORDER BY step""".stripMargin

  def shortestPathCompiled(spark: SparkSession, dir: String,
      src: Long = 1L, dst: Long = 42L): DataFrame =
    CypherLite.run(coocGraph(spark, dir), ShortestPathQuery,
      Map("src" -> src, "dst" -> dst))

  /** r10 expression-language breadth: searched CASE inside an
    * aggregate, DISTINCT aggregation, and aggregate arithmetic
    * (`sum(x) * 1.0 / count(*)`) — the whitelist residue a
    * Cypher-fluent user hits once the r9 traversal walls are gone.
    * Gated on its own DuckDB oracle (not a twin reuse: no hand-built
    * operator computes this shape). */
  val CaseAgg: String =
    """MATCH (u:User)-[r:RATED]->(b:Book)
      |WITH b.book_type AS book_type,
      |  sum(CASE WHEN r.rating >= 8 THEN 1 ELSE 0 END) AS high_ratings,
      |  count(DISTINCT u.id) AS raters,
      |  count(*) AS n,
      |  sum(r.rating) * 1.0 / count(*) AS avg_rating
      |RETURN book_type, high_ratings, raters, n, avg_rating
      |ORDER BY book_type""".stripMargin

  def caseAggCompiled(spark: SparkSession, dir: String): DataFrame =
    CypherLite.run(graph(spark, dir), CaseAgg)

  /** r10: string predicates (`STARTS WITH`, `IN [list]`), scalar
    * string functions (toLower / substring / size), arithmetic with
    * precedence, and a scalar CASE — all row-level, so the whole RETURN
    * stays one whole-stage-codegen projection over the node scan. */
  val StringFuncs: String =
    """MATCH (u:User)
      |WHERE u.segment STARTS WITH 'BU' AND u.id % 10 IN [0, 3, 7]
      |RETURN u.id AS user_id, toLower(u.segment) AS seg,
      |  substring(u.name, 0, 8) AS name8, size(u.name) AS name_len,
      |  u.id * 2 + 1 AS odd_id,
      |  CASE WHEN u.community >= 12 THEN 'high' ELSE 'low' END AS tier
      |ORDER BY user_id""".stripMargin

  def stringFuncsCompiled(spark: SparkSession, dir: String): DataFrame =
    CypherLite.run(graph(spark, dir), StringFuncs)

  /** r10: the statistics aggregates — exact interpolated
    * `percentileCont` (one sort-based aggregate, mergeable) and
    * `stDevP`, 6dp-rounded through round()-arithmetic so the DuckDB
    * replay is boundary-stable. */
  val SegmentStats: String =
    """MATCH (u:User)-[r:RATED]->(b:Book)
      |WITH u.segment AS segment, count(DISTINCT b.id) AS distinct_books,
      |  percentileCont(r.rating, 0.5) AS median_rating,
      |  round(stDevP(r.rating) * 1000000) / 1000000.0 AS sd6
      |RETURN segment, distinct_books, median_rating, sd6
      |ORDER BY segment""".stripMargin

  def segmentStatsCompiled(spark: SparkSession, dir: String): DataFrame =
    CypherLite.run(graph(spark, dir), SegmentStats)

  /** r12b: `UNION` — Neo4j's distinct-rows combinator over two
    * same-shaped MATCH parts (fans vs critics of any book). Each part
    * compiles independently; the combinator is one positional unionAll
    * + the distinct Cypher's UNION requires. */
  val UnionFansCritics: String =
    """MATCH (u:User)-[r:RATED]->(b:Book) WHERE r.rating >= 9
      |RETURN u.id AS user_id, 'fan' AS kind
      |UNION
      |MATCH (u:User)-[r:RATED]->(b:Book) WHERE r.rating <= 2
      |RETURN u.id AS user_id, 'critic' AS kind""".stripMargin

  def unionCompiled(spark: SparkSession, dir: String): DataFrame =
    CypherLite.run(graph(spark, dir), UnionFansCritics)

  /** `data/load_data.py:23-28` load_users — VERBATIM (backticked CSV
    * header, empty-string → NULL age CASE). */
  val LoadUsers: String =
    """UNWIND $rows AS row
      |MERGE (u:User {id: toInteger(row.`User-ID`)})
      |SET u.location = row.Location, u.age = CASE row.Age WHEN '' THEN NULL ELSE toInteger(row.Age) END""".stripMargin

  /** `data/load_data.py:36-43` load_books. */
  val LoadBooks: String =
    """UNWIND $rows AS row
      |MERGE (b:Book {isbn: row.ISBN})
      |SET b.title = row.`Book-Title`,
      |    b.author = row.`Book-Author`,
      |    b.year = toInteger(row.`Year-Of-Publication`),
      |    b.publisher = row.Publisher""".stripMargin

  /** `data/load_data.py:53-59` load_ratings (MATCH + MATCH + MERGE
    * relationship + SET). */
  val LoadRatings: String =
    """UNWIND $rows AS row
      |MATCH (u:User {id: toInteger(row.`User-ID`)})
      |MATCH (b:Book {isbn: row.ISBN})
      |MERGE (u)-[r:RATED]->(b)
      |SET r.rating = toInteger(row.`Book-Rating`)""".stripMargin

  /** `Alg_Community_Detection.py:21-30` gds.graph.project.cypher's
    * node/rel queries, VERBATIM — compiled by CypherLite when
    * [[graft.gds.GdsSession.graphProjectCypher]] builds the
    * userSimilarityGraph projection. */
  val ProjectUserNodes: String = "MATCH (u:User) RETURN id(u) AS id"
  val ProjectUserSimilarityRels: String =
    """MATCH (u1:User)-[r1:RATED]->(b:Book)<-[r2:RATED]-(u2:User)
      |WHERE u1 <> u2 AND r1.rating >= 6 AND r2.rating >= 6
      |RETURN id(u1) AS source, id(u2) AS target, COUNT(*) AS weight""".stripMargin

  /** `data/load_data.py:96-104` create_graph uniqueness constraints. */
  val UserConstraint: String =
    "CREATE CONSTRAINT IF NOT EXISTS FOR (u:User) REQUIRE u.id IS UNIQUE"
  val BookConstraint: String =
    "CREATE CONSTRAINT IF NOT EXISTS FOR (b:Book) REQUIRE b.isbn IS UNIQUE"

  private def params(user: Long): Map[String, Any] = Map("userId" -> user)

  def userBooks(spark: SparkSession, dir: String,
      user: Long = Recommend.TargetUser): DataFrame =
    CypherLite.run(graph(spark, dir), UserBooks, params(user))

  def recommendKnn(spark: SparkSession, dir: String,
      user: Long = Recommend.TargetUser): DataFrame =
    CypherLite.run(graph(spark, dir), RecommendKnn, params(user))

  def largeGroups(spark: SparkSession, dir: String): DataFrame =
    CypherLite.run(graph(spark, dir), LargeGroups)

  def similarUsers(spark: SparkSession, dir: String,
      user: Long = Recommend.TargetUser): DataFrame =
    CypherLite.run(graph(spark, dir), SimilarUsers, params(user))

  def recommendCommunity(spark: SparkSession, dir: String,
      user: Long = Recommend.TargetUser): DataFrame =
    CypherLite.run(graph(spark, dir), RecommendCommunity, params(user))

  def graphData(spark: SparkSession, dir: String,
      user: Long = Recommend.TargetUser): DataFrame =
    CypherLite.run(graph(spark, dir), GraphData, params(user))

  def communityMembers(spark: SparkSession, dir: String,
      user: Long = Recommend.TargetUser): DataFrame =
    CypherLite.run(graph(spark, dir), CommunityMembers, params(user))
}
