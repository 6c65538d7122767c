package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cypher.{CypherLite, ReferenceQueries}
import graft.recommend.Recommend

/** The CypherLite contract: every reference Cypher query compiled by
  * the subset compiler must be ROW-IDENTICAL to its hand-built twin on
  * the real sf0.001 tables, plus fixture-level unit checks of the
  * individual constructs (anti-join pattern predicate, bound-scalar
  * property join, COLLECT/UNWIND, DISTINCT). */
class CypherLiteSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq

  test("compiled get_user_rated_books ≡ hand-built user_rated_books") {
    val got = rows(ReferenceQueries.userBooks(spark, sf))
    val want = rows(Recommend.userRatedBooks(spark, sf)
      .select(col("book_id"), col("title"), col("rating")))
    assert(got == want, s"compiled ${got.take(3)} vs twin ${want.take(3)}")
    assert(got.nonEmpty)
  }

  test("compiled recommend_books ≡ hand-built recommend_knn") {
    val got = rows(ReferenceQueries.recommendKnn(spark, sf))
    val want = rows(Recommend.recommendKnn(spark, sf))
    assert(got == want, s"compiled $got vs twin $want")
    assert(got.nonEmpty)
  }

  test("compiled users_in_large_communities ≡ hand-built users_in_large_groups") {
    val got = rows(ReferenceQueries.largeGroups(spark, sf))
    val want = rows(Recommend.usersInLargeGroups(spark, sf))
    assert(got == want, s"compiled ${got.take(3)} vs twin ${want.take(3)}")
    assert(got.nonEmpty)
  }

  test("compiled get_similar_users matches the SIMILAR_TO expansion") {
    val got = rows(ReferenceQueries.similarUsers(spark, sf))
    // the reference query is a 1-hop expansion with DISTINCT props; the
    // twin derivation: dst ids of the sims edge set, id-ordered top 3
    val want = rows(Recommend.similarUsersCooc(spark, sf, 1L, 20)
      .select(col("user_id"), col("name"), col("community"), col("segment"))
      .orderBy(col("user_id")).limit(3))
    assert(got == want, s"compiled $got vs twin $want")
    assert(got.nonEmpty)
  }

  test("compiled recommend_books_by_community ≡ hand-built recommend_community") {
    val got = rows(ReferenceQueries.recommendCommunity(spark, sf))
    val want = rows(Recommend.recommendCommunity(spark, sf))
    assert(got == want, s"compiled $got vs twin $want")
    assert(got.nonEmpty)
  }

  test("compiled get_community_members: <=3 same-community peers with true props") {
    val got = ReferenceQueries.communityMembers(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got.nonEmpty && got.length <= 3)
    val users = graft.graph.RatingsGraph.activeUsers(spark, sf)
      .select(col("user_id"), col("name"), col("community"), col("segment"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getString(3))).toMap
    val targetCommunity = users(1L)._2
    got.foreach { case (id, name, segment) =>
      assert(id != 1L)
      assert(users(id)._2 == targetCommunity, s"member $id in wrong community")
      assert(users(id)._1 == name && users(id)._3 == segment)
    }
  }

  // ---- construct-level fixtures ----------------------------------

  private def fixtureGraph: CypherLite.Graph = CypherLite.Graph(
    nodes = Map(
      "User" -> Seq((1L, "ann", 10L), (2L, "bob", 10L), (3L, "cat", 20L))
        .toDF("id", "name", "community"),
      "Book" -> Seq((100L, "dune"), (200L, "emma")).toDF("id", "title")),
    edges = Map(
      "RATED" -> Seq((1L, 100L, 9L), (2L, 100L, 7L), (2L, 200L, 8L),
        (3L, 200L, 5L)).toDF("src", "dst", "rating"),
      "SIMILAR_TO" -> Seq((1L, 2L), (1L, 3L)).toDF("src", "dst")))

  test("pattern predicate NOT (a)-[:T]->(b) compiles to an anti-join") {
    val out = CypherLite.run(fixtureGraph,
      """MATCH (a:User {id: $u})-[:SIMILAR_TO]->(s:User)-[r:RATED]->(b:Book)
        |WHERE NOT (a)-[:RATED]->(b)
        |RETURN b.id AS book_id, s.id AS via
        |ORDER BY book_id, via""".stripMargin, Map("u" -> 1L))
    // user 1 rated 100, so only 200 (via 2 and 3) survives
    assert(rows(out) == Seq(Seq(200L, 2L), Seq(200L, 3L)))
  }

  test("r11 EXISTS { pattern }: the Neo4j-5 spelling of the pattern predicate") {
    // NOT EXISTS { } ≡ the bare NOT (a)-[:T]->(b) anti-join
    val out = CypherLite.run(fixtureGraph,
      """MATCH (a:User {id: $u})-[:SIMILAR_TO]->(s:User)-[r:RATED]->(b:Book)
        |WHERE NOT EXISTS { (a)-[:RATED]->(b) }
        |RETURN b.id AS book_id, s.id AS via
        |ORDER BY book_id, via""".stripMargin, Map("u" -> 1L))
    assert(rows(out) == Seq(Seq(200L, 2L), Seq(200L, 3L)))
    // positive form ≡ the left_semi
    val pos = CypherLite.run(fixtureGraph,
      """MATCH (a:User {id: $u})-[:SIMILAR_TO]->(s:User)-[r:RATED]->(b:Book)
        |WHERE EXISTS { (a)-[:RATED]->(b) }
        |RETURN b.id AS book_id, s.id AS via
        |ORDER BY book_id, via""".stripMargin, Map("u" -> 1L))
    assert(rows(pos) == Seq(Seq(100L, 2L)))
    // same bound-variable contract as the bare form
    intercept[IllegalArgumentException] {
      CypherLite.run(fixtureGraph,
        """MATCH (a:User {id: 1})
          |WHERE EXISTS { (a)-[:RATED]->(:Book) }
          |RETURN a.id AS id""".stripMargin)
    }
  }

  test("bound-scalar property map compiles to an equi-join") {
    val out = CypherLite.run(fixtureGraph,
      """MATCH (t:User {id: $u})
        |WITH t, t.community AS c
        |MATCH (o:User {community: c})
        |WHERE o.id <> $u
        |RETURN o.id AS peer ORDER BY peer""".stripMargin, Map("u" -> 1L))
    assert(rows(out) == Seq(Seq(2L)))
  }

  test("COLLECT + WHERE size + UNWIND round-trips membership") {
    val out = CypherLite.run(fixtureGraph,
      """MATCH (u:User)
        |WITH u.community AS c, COLLECT(u) AS us, count(*) AS n
        |WHERE n > 1
        |UNWIND us AS m
        |RETURN m.id AS id, c, n ORDER BY id""".stripMargin)
    assert(rows(out) == Seq(Seq(1L, 10L, 2L), Seq(2L, 10L, 2L)))
  }

  test("RETURN DISTINCT dedups and aggregates group Cypher-style") {
    val dup = CypherLite.run(fixtureGraph,
      """MATCH (u:User)-[r:RATED]->(b:Book)
        |RETURN DISTINCT b.id AS book ORDER BY book""".stripMargin)
    assert(rows(dup) == Seq(Seq(100L), Seq(200L)))
    val agg = CypherLite.run(fixtureGraph,
      """MATCH (u:User)-[r:RATED]->(b:Book)
        |RETURN b.id AS book, avg(r.rating) AS a, count(*) AS n
        |ORDER BY book""".stripMargin)
    assert(rows(agg) == Seq(Seq(100L, 8.0, 2L), Seq(200L, 6.5, 2L)))
  }

  test("OPTIONAL MATCH: null cascade on the fixture, exact row algebra") {
    // user 3 ('cat') rated 200 but has no SIMILAR_TO edges: the b1 leg
    // binds, the sim and b2 legs null-fill — one row, half null
    val out = CypherLite.run(fixtureGraph,
      """MATCH (target:User {id: $u})
        |// book leg binds, similarity legs null out
        |OPTIONAL MATCH (target)-[r1:RATED]->(b1:Book)
        |OPTIONAL MATCH (target)-[s:SIMILAR_TO]->(sim:User)
        |OPTIONAL MATCH (sim)-[r2:RATED]->(b2:Book)
        |RETURN b1.id AS book1, r1.rating AS rating1, sim.id AS simId,
        |  b2.id AS book2, r2.rating AS rating2""".stripMargin,
      Map("u" -> 3L)).collect().map(_.toSeq)
    assert(out.toSeq == Seq(Seq(200L, 5L, null, null, null)))
    // user 1: 1 rated book × (sim 2 with 2 rated books + sim 3 with 1)
    // = 3 rows — Cypher's optional-match row multiplication
    val out1 = CypherLite.run(fixtureGraph,
      """MATCH (target:User {id: $u})
        |OPTIONAL MATCH (target)-[r1:RATED]->(b1:Book)
        |OPTIONAL MATCH (target)-[s:SIMILAR_TO]->(sim:User)
        |OPTIONAL MATCH (sim)-[r2:RATED]->(b2:Book)
        |RETURN b1.id AS book1, sim.id AS simId, b2.id AS book2
        |ORDER BY simId, book2""".stripMargin,
      Map("u" -> 1L)).collect().map(_.toSeq)
    assert(out1.toSeq == Seq(
      Seq(100L, 2L, 100L), Seq(100L, 2L, 200L), Seq(100L, 3L, 200L)))
  }

  test("compiled get_graph_data runs verbatim (comments included) on real data") {
    val out = ReferenceQueries.graphData(spark, sf)
    val cols = out.columns.toSeq
    assert(cols == Seq("u1", "u2", "book1", "rating1", "book2", "rating2",
      "similarityScore"))
    val n = out.count()
    assert(n > 0)
    // every row carries the target user struct; similarity legs resolve
    // for the cooc-sims binding (target has similar users on sf0.001)
    assert(out.filter(col("u1").getField("id") === 1L).count() == n)
    assert(out.filter(col("similarityScore").isNotNull).count() > 0)
  }

  test("unsupported constructs fail fast, never compile silently wrong") {
    intercept[RuntimeException] {
      CypherLite.run(fixtureGraph, "CREATE (n:User)")
    }
    intercept[RuntimeException] {
      CypherLite.run(fixtureGraph,
        "MATCH (u:Unknown) RETURN u.id AS id")
    }
    // unbounded transitive closure is refused, not silently planned
    intercept[RuntimeException] {
      CypherLite.run(fixtureGraph,
        "MATCH (a:User {id: 1})-[:SIMILAR_TO*]->(v:User) RETURN v.id AS id")
    }
    intercept[RuntimeException] { // re-binding inside OPTIONAL MATCH
      CypherLite.run(fixtureGraph,
        """MATCH (a:User {id: 1})-[:SIMILAR_TO]->(v:User)
          |OPTIONAL MATCH (a)-[:SIMILAR_TO]->(v:User)
          |RETURN v.id AS id""".stripMargin)
    }
  }

  test("var-length inside OPTIONAL MATCH: binds or null-fills per head") {
    // r10: the r9 fail-fast compiled onto the shared BFS —
    // DISTINCT-endpoint semantics (min hops per (head, target) pair)
    // inside the optional's internal chain, one left_outer on the head
    val out = CypherLite.run(fixtureGraph,
      """MATCH (a:User)
        |OPTIONAL MATCH (a)-[h:SIMILAR_TO*1..2]->(v:User)
        |RETURN a.id AS uid, v.id AS peer, h.hops AS hops
        |ORDER BY uid, peer""".stripMargin)
    // 1 fans to {2,3} at hop 1 (no deeper edges); 2 and 3 have no
    // outgoing SIMILAR_TO — they null-fill instead of dropping
    assert(rows(out) == Seq(
      Seq(1L, 2L, 1L), Seq(1L, 3L, 1L),
      Seq(2L, null, null), Seq(3L, null, null)))
    // mixed chain: var-length segment + plain hop INSIDE the optional —
    // the whole pattern binds or every new var is null
    val mixed = CypherLite.run(fixtureGraph,
      """MATCH (a:User)
        |OPTIONAL MATCH (a)-[h:SIMILAR_TO*1..2]->(v:User)-[r:RATED]->(b:Book)
        |RETURN a.id AS uid, v.id AS peer, b.id AS book
        |ORDER BY uid, peer, book""".stripMargin)
    assert(rows(mixed) == Seq(
      Seq(1L, 2L, 100L), Seq(1L, 2L, 200L), Seq(1L, 3L, 200L),
      Seq(2L, null, null), Seq(3L, null, null)))
    // undirected var-length inside OPTIONAL: user 3 reaches co-rater 2
    // over RATED in 2 hops; *2 band excludes itself (min-dist 0)
    val und = CypherLite.run(fixtureGraph,
      """MATCH (a:User {id: 3})
        |OPTIONAL MATCH (a)-[h:RATED*2]-(v:User)
        |RETURN v.id AS peer, h.hops AS hops ORDER BY peer""".stripMargin)
    assert(rows(und) == Seq(Seq(2L, 2L)))
  }

  test("relationships(p): the shortestPath's relationship sequence") {
    // undirected RATED path 1—100—2: two rels, zipped from consecutive
    // path nodes — exact, since the shortestPath binding IS one path
    val rels = CypherLite.run(fixtureGraph,
      """MATCH p = shortestPath((a:User {id: 1})-[:RATED*..4]-(b:User {id: 2}))
        |UNWIND relationships(p) AS r
        |RETURN r.src AS src, r.dst AS dst""".stripMargin)
    assert(rows(rels) == Seq(Seq(1L, 100L), Seq(100L, 2L)))
    // |relationships(p)| = length(p), here 1 for the direct edge
    val one = CypherLite.run(fixtureGraph,
      """MATCH p = shortestPath((a:User {id: 1})-[:SIMILAR_TO*..3]->(b:User {id: 2}))
        |UNWIND relationships(p) AS r
        |RETURN r.src AS src, r.dst AS dst""".stripMargin)
    assert(rows(one) == Seq(Seq(1L, 2L)))
  }

  test("r12 MATCH p = (a)-[r:T*..k]->(b): one row per path, rel-list binding") {
    // diamond 1→{2,3}→4: per-PATH multiplicity must yield TWO rows to
    // node 4 (the DISTINCT-endpoint segment form collapses them to one)
    val g = CypherLite.Graph(
      nodes = Map("N" -> Seq(1L, 2L, 3L, 4L).map(Tuple1(_)).toDF("id")),
      edges = Map("T" -> Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L))
        .toDF("src", "dst")))
    val out = CypherLite.run(g,
      """MATCH p = (a:N {id: 1})-[r:T*2..2]->(b:N)
        |RETURN b.id AS dst, length(p) AS hops, r AS rels, nodes(p) AS ns""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[org.apache.spark.sql.Row](2).map(x => (x.getLong(0), x.getLong(1))),
        r.getSeq[org.apache.spark.sql.Row](3).map(_.getLong(1))))
      .sortBy(_._3.head._2)
    assert(out.toSeq == Seq(
      (4L, 2, Seq((1L, 2L), (2L, 4L)), Seq(1L, 2L, 4L)),
      (4L, 2, Seq((1L, 3L), (3L, 4L)), Seq(1L, 3L, 4L))),
      s"hand-enumerated diamond paths diverged: ${out.toSeq}")
    // relationships(p) (zip of consecutive nodes) ≡ the bound rel list
    val eq = CypherLite.run(g,
      """MATCH p = (a:N {id: 1})-[r:T*1..2]->(b:N)
        |WHERE r = relationships(p)
        |RETURN b.id AS dst""".stripMargin)
    assert(eq.count() == 4L, "r must equal relationships(p) on every path")
    // relationship-uniqueness: 2-cycle {1→2, 2→1} stops after reusing
    // no edge — [1,2] and [1,2,1], never [1,2,1,2]
    val cyc = CypherLite.Graph(
      nodes = Map("N" -> Seq(1L, 2L).map(Tuple1(_)).toDF("id")),
      edges = Map("T" -> Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")))
    val cy = CypherLite.run(cyc,
      """MATCH p = (a:N {id: 1})-[r:T*1..3]->(b:N)
        |RETURN b.id AS dst, length(p) AS hops ORDER BY hops""".stripMargin)
    assert(rows(cy) == Seq(Seq(2L, 1), Seq(1L, 2)),
      "edge-uniqueness must stop the cycle at 2 hops")
    // UNDIRECTED canonical identity: a stored edge is ONE relationship
    // in both directions — no 1—2—1 backtrack over the same edge
    val und = CypherLite.run(cyc.copy(edges =
      Map("T" -> Seq((1L, 2L)).toDF("src", "dst"))),
      """MATCH p = (a:N {id: 1})-[r:T*1..2]-(b:N)
        |RETURN b.id AS dst""".stripMargin)
    assert(rows(und) == Seq(Seq(2L)))
    // *0..k includes the zero-hop path (empty rel list, b = a)
    val zero = CypherLite.run(g,
      """MATCH p = (a:N {id: 1})-[r:T*0..1]->(b:N)
        |RETURN b.id AS dst, size(r) AS n ORDER BY dst""".stripMargin)
    assert(rows(zero) == Seq(Seq(1L, 0), Seq(2L, 1), Seq(3L, 1)))
    // mixed chains fail fast (exactly one var-length segment)
    intercept[IllegalArgumentException] {
      CypherLite.run(g,
        """MATCH p = (a:N {id: 1})-[:T]->(m:N)-[r:T*1..2]->(b:N)
          |RETURN b.id AS dst""".stripMargin)
    }
    // r12b: rel-list elements carry the edge PROPERTIES — per-path
    // weight analytics via UNWIND; a reversed (undirected) traversal
    // keeps the stored edge's weight
    val gw = CypherLite.Graph(
      nodes = Map("N" -> Seq(1L, 2L, 3L).map(Tuple1(_)).toDF("id")),
      edges = Map("T" -> Seq((1L, 2L, 5L), (2L, 3L, 7L))
        .toDF("src", "dst", "w")))
    val wsum = CypherLite.run(gw,
      """MATCH p = (a:N {id: 1})-[r:T*2..2]->(b:N)
        |UNWIND r AS e
        |RETURN b.id AS dst, sum(e.w) AS total""".stripMargin)
    assert(rows(wsum) == Seq(Seq(3L, 12L)),
      "edge properties must ride the relationship list")
    val wrev = CypherLite.run(gw,
      """MATCH p = (a:N {id: 3})-[r:T*1..1]-(b:N)
        |UNWIND r AS e
        |RETURN e.src AS s, e.dst AS d, e.w AS w""".stripMargin)
    assert(rows(wrev) == Seq(Seq(3L, 2L, 7L)),
      "reversed undirected traversal must keep the stored weight")
  }

  // ---- var-length + shortestPath (r9) ----------------------------

  test("var-length: directed, undirected, exact-k hop algebra on the fixture") {
    // directed *1..2 from user 1: SIMILAR_TO fans 1→{2,3}, no deeper edges
    val directed = CypherLite.run(fixtureGraph,
      """MATCH (a:User {id: 1})-[h:SIMILAR_TO*1..2]->(v:User)
        |RETURN v.id AS peer, h.hops AS hops ORDER BY peer""".stripMargin)
    assert(rows(directed) == Seq(Seq(2L, 1L), Seq(3L, 1L)))
    // undirected *1..2 over RATED from user 1: hop 1 = book 100, hop 2 =
    // co-rater 2; the :User target label prunes to the co-rater; user 1
    // itself is min-dist 0, outside the *1.. band (and Cypher's
    // rel-uniqueness excludes the 1-100-1 backtrack too)
    val undirected = CypherLite.run(fixtureGraph,
      """MATCH (a:User {id: 1})-[h:RATED*1..2]-(v:User)
        |RETURN v.id AS peer, h.hops AS hops ORDER BY peer""".stripMargin)
    assert(rows(undirected) == Seq(Seq(2L, 2L)))
    // exact *2 band keeps only min-dist-2 nodes
    val exact = CypherLite.run(fixtureGraph,
      """MATCH (a:User {id: 1})-[h:RATED*2]-(v:User)
        |RETURN v.id AS peer ORDER BY peer""".stripMargin)
    assert(rows(exact) == Seq(Seq(2L)))
  }

  test("compiled [:LINKED*0..3] ≡ the bfs_hops twin on real data") {
    val got = rows(ReferenceQueries.bfsHopsCompiled(spark, sf))
    val want = rows(graft.graph.Algorithms.bfsHops(
      graft.graph.Algorithms.bipartiteEdges(spark, sf), source = 2L,
      maxHops = 3).orderBy("node_id"))
    assert(got == want, s"compiled ${got.take(3)} vs twin ${want.take(3)}")
    assert(got.contains(Seq(2L, 0L)),
      "*0.. must include the source at hops 0")
  }

  test("compiled shortestPath() ≡ the shortest_path_nodes twin on real data") {
    val got = rows(ReferenceQueries.shortestPathCompiled(spark, sf))
    val want = rows(graft.graph.Algorithms.shortestPathNodesOn(
      graft.graph.Algorithms.userCoocBidir(spark, sf),
      source = 1L, target = 42L))
    assert(got == want, s"compiled $got vs twin $want")
    assert(got.nonEmpty && got.head(1) == 1L && got.last(1) == 42L)
  }

  test("shortestPath: length(p), and an unreachable pair matches zero rows") {
    val len = CypherLite.run(fixtureGraph,
      """MATCH p = shortestPath((a:User {id: 1})-[:SIMILAR_TO*..3]->(b:User {id: 3}))
        |RETURN length(p) AS len""".stripMargin)
    assert(rows(len) == Seq(Seq(1)))
    // directed: user 2 has no outgoing SIMILAR_TO — Cypher's MATCH on an
    // unreachable shortestPath yields no rows
    val unreachable = CypherLite.run(fixtureGraph,
      """MATCH p = shortestPath((a:User {id: 2})-[:SIMILAR_TO*..3]->(b:User {id: 3}))
        |UNWIND nodes(p) AS n
        |RETURN n.node_id AS node_id""".stripMargin)
    assert(rows(unreachable).isEmpty)
  }

  // ---- r10 expression-language whitelist --------------------------

  test("arithmetic: precedence, unary minus, string concat, parens") {
    val out = CypherLite.run(fixtureGraph,
      """MATCH (u:User {id: 1})
        |RETURN u.id + 2 * 3 AS a, -u.id AS b, (u.id + 2) * 3 AS c,
        |  u.id % 2 AS m, u.id * 1.0 / 4 AS d, u.name + '!' AS s""".stripMargin)
    assert(rows(out) == Seq(Seq(7L, -1L, 9L, 1L, 0.25, "ann!")))
  }

  test("string predicates, IN, =~ whole-string anchor, IS NULL cascade") {
    val preds = CypherLite.run(fixtureGraph,
      """MATCH (u:User)
        |WHERE u.name STARTS WITH 'a' OR u.name ENDS WITH 't'
        |  OR u.name CONTAINS 'o'
        |RETURN u.id AS id ORDER BY id""".stripMargin)
    assert(rows(preds) == Seq(Seq(1L), Seq(2L), Seq(3L)))
    val inq = CypherLite.run(fixtureGraph,
      "MATCH (u:User) WHERE u.id IN [1, 3] RETURN u.id AS id ORDER BY id")
    assert(rows(inq) == Seq(Seq(1L), Seq(3L)))
    // Neo4j's =~ matches the WHOLE string: 'an' misses 'ann', 'an.' hits
    assert(rows(CypherLite.run(fixtureGraph,
      "MATCH (u:User) WHERE u.name =~ 'an' RETURN u.id AS id")).isEmpty)
    assert(rows(CypherLite.run(fixtureGraph,
      "MATCH (u:User) WHERE u.name =~ 'an.' RETURN u.id AS id")) ==
      Seq(Seq(1L)))
    // IS NULL composes with the OPTIONAL MATCH null cascade via the
    // Cypher find-unmatched idiom (WITH … WHERE — a WHERE directly on
    // the OPTIONAL MATCH belongs to the pattern, tested separately):
    // only users without outgoing SIMILAR_TO survive
    val nulls = CypherLite.run(fixtureGraph,
      """MATCH (u:User)
        |OPTIONAL MATCH (u)-[s:SIMILAR_TO]->(v:User)
        |WITH u, v
        |WHERE v.id IS NULL
        |RETURN u.id AS id ORDER BY id""".stripMargin)
    assert(rows(nulls) == Seq(Seq(2L), Seq(3L)))
    val notNulls = CypherLite.run(fixtureGraph,
      """MATCH (u:User)
        |OPTIONAL MATCH (u)-[s:SIMILAR_TO]->(v:User)
        |WITH u, v
        |WHERE v.id IS NOT NULL
        |RETURN DISTINCT u.id AS id ORDER BY id""".stripMargin)
    assert(rows(notNulls) == Seq(Seq(1L)))
  }

  test("OPTIONAL MATCH-attached WHERE: filtered heads survive null-extended") {
    // WHERE r.rating >= 8 belongs to the OPTIONAL pattern: user 3's only
    // rating (5) is filtered away but the row SURVIVES with nulls — the
    // semantics a post-filter parse would silently get wrong (it would
    // drop user 3 entirely)
    val out = CypherLite.run(fixtureGraph,
      """MATCH (u:User)
        |OPTIONAL MATCH (u)-[r:RATED]->(b:Book)
        |WHERE r.rating >= 8
        |RETURN u.id AS id, b.id AS book ORDER BY id, book""".stripMargin)
    assert(rows(out) ==
      Seq(Seq(1L, 100L), Seq(2L, 200L), Seq(3L, null)))
  }

  test("r11 OPTIONAL MATCH WHERE may reference the HEAD's properties") {
    // the common idiom the r10 verdict flagged: a cross-variable
    // predicate between the bound head and the chain extension. The
    // head struct travels into the extension, the predicate filters
    // BEFORE the left_outer, and heads whose matches all fail keep
    // their row null-extended.
    //   u1 (community 10): rating 9 >= 8 → (1, 100)
    //   u2 (community 10): 7 < 8, 8 >= 8 → (2, 200)
    //   u3 (community 20): 5 < 18 → (3, null)
    val out = CypherLite.run(fixtureGraph,
      """MATCH (u:User)
        |OPTIONAL MATCH (u)-[r:RATED]->(b:Book)
        |WHERE r.rating >= u.community - 2
        |RETURN u.id AS id, b.id AS book ORDER BY id, book""".stripMargin)
    assert(rows(out) == Seq(Seq(1L, 100L), Seq(2L, 200L), Seq(3L, null)))

    // string `+` dispatch resolves against the EXTENSION frame (r10
    // ADVICE: against the outer df the chain var b reads as NullType
    // and `+` would compile to numeric Add): head string + chain string
    val s = CypherLite.run(fixtureGraph,
      """MATCH (u:User)
        |OPTIONAL MATCH (u)-[r:RATED]->(b:Book)
        |WHERE u.name + ':' + b.title = 'ann:dune'
        |RETURN u.id AS id, b.id AS book ORDER BY id, book""".stripMargin)
    assert(rows(s) == Seq(Seq(1L, 100L), Seq(2L, null), Seq(3L, null)))

    // size() on a chain-local string var dispatches to length()
    val sz = CypherLite.run(fixtureGraph,
      """MATCH (u:User)
        |OPTIONAL MATCH (u)-[r:RATED]->(b:Book)
        |WHERE size(b.title) + u.community = 14
        |RETURN u.id AS id, b.id AS book ORDER BY id, book""".stripMargin)
    assert(rows(sz) == Seq(Seq(1L, 100L), Seq(2L, 100L), Seq(2L, 200L),
      Seq(3L, null)))

    // a pre-bound NON-head variable still fails fast: the extension
    // re-attaches on the head alone, so foreign context has no lane
    intercept[IllegalArgumentException] {
      CypherLite.run(fixtureGraph,
        """MATCH (a:User {id: 1})
          |MATCH (u:User)
          |OPTIONAL MATCH (u)-[r:RATED]->(b:Book)
          |WHERE r.rating > a.community
          |RETURN u.id AS id""".stripMargin).collect()
    }
  }

  test("r11 multi-chain OPTIONAL MATCH: one pattern, all-or-nothing binding") {
    // comma-joined chains in ONE OPTIONAL MATCH are a single Cypher
    // pattern: u2 has RATED edges but no SIMILAR_TO — the WHOLE pattern
    // fails, so BOTH sides null (separate OPTIONAL MATCH clauses would
    // have bound b for u2 independently)
    val out = CypherLite.run(fixtureGraph,
      """MATCH (u:User)
        |OPTIONAL MATCH (u)-[r:RATED]->(b:Book), (u)-[s:SIMILAR_TO]->(v:User)
        |RETURN u.id AS id, b.id AS book, v.id AS sim
        |ORDER BY id, book, sim""".stripMargin)
    assert(rows(out) == Seq(
      Seq(1L, 100L, 2L), Seq(1L, 100L, 3L),
      Seq(2L, null, null), Seq(3L, null, null)))
    // attached WHERE spans BOTH chains' variables (plus the head)
    val w = CypherLite.run(fixtureGraph,
      """MATCH (u:User)
        |OPTIONAL MATCH (u)-[r:RATED]->(b:Book), (u)-[s:SIMILAR_TO]->(v:User)
        |WHERE r.rating >= 8 AND v.id = u.id + 2
        |RETURN u.id AS id, b.id AS book, v.id AS sim
        |ORDER BY id, book""".stripMargin)
    assert(rows(w) == Seq(
      Seq(1L, 100L, 3L), Seq(2L, null, null), Seq(3L, null, null)))
    // chains with DIFFERENT heads have no single re-attach key
    intercept[IllegalArgumentException] {
      CypherLite.run(fixtureGraph,
        """MATCH (a:User {id: 1})
          |MATCH (u:User)
          |OPTIONAL MATCH (u)-[r:RATED]->(b:Book), (a)-[s:SIMILAR_TO]->(v:User)
          |RETURN u.id AS id""".stripMargin)
    }
  }

  test("r11 fail-fast modifiers: SKIP/LIMIT Int bound, agg DISTINCT/arity") {
    // Dataset.offset/limit take Int — a >2³¹ SKIP must error loudly,
    // not silently truncate to a wrong page
    intercept[IllegalArgumentException] {
      CypherLite.run(fixtureGraph,
        "MATCH (u:User) RETURN u.id AS id SKIP 3000000000")
    }
    intercept[IllegalArgumentException] {
      CypherLite.run(fixtureGraph,
        "MATCH (u:User) RETURN u.id AS id LIMIT 3000000000")
    }
    // DISTINCT on an aggregate that ignores it / a second argument on a
    // one-arg aggregate: plausible-but-unrun queries must error
    intercept[IllegalArgumentException] {
      CypherLite.run(fixtureGraph,
        """MATCH (u:User)-[r:RATED]->(b:Book)
          |RETURN stDev(DISTINCT r.rating) AS s""".stripMargin)
    }
    intercept[IllegalArgumentException] {
      CypherLite.run(fixtureGraph,
        """MATCH (u:User)-[r:RATED]->(b:Book)
          |RETURN count(u.id, r.rating) AS n""".stripMargin)
    }
  }

  test("r11 range(): two-arg descend is EMPTY (Cypher), explicit step descends") {
    val r = CypherLite.run(fixtureGraph,
      """MATCH (u:User {id: 1})
        |RETURN range(1, 3) AS up, range(3, 1) AS down,
        |  range(3, 1, -1) AS explicit, size(range(3, 1)) AS dlen""".stripMargin)
      .collect().head
    assert(r.getAs[scala.collection.Seq[Long]]("up").toSeq == Seq(1L, 2L, 3L))
    assert(r.getAs[scala.collection.Seq[Long]]("down").toSeq == Seq(),
      "Cypher range(3, 1) with the default +1 step is the empty list")
    assert(r.getAs[scala.collection.Seq[Long]]("explicit").toSeq ==
      Seq(3L, 2L, 1L))
    assert(r.getAs[Long]("dlen") == 0L)
  }

  test("scalar whitelist: strings, numerics, lists — exact values") {
    val r = CypherLite.run(fixtureGraph,
      """MATCH (u:User {id: 1})
        |RETURN toUpper(u.name) AS up, toLower('ABC') AS lo,
        |  substring(u.name, 1) AS sub1, substring(u.name, 0, 2) AS sub2,
        |  size(u.name) AS len, reverse(u.name) AS rev,
        |  replace(u.name, 'n', 'm') AS rep, split('a,b,c', ',') AS parts,
        |  head(split('a,b,c', ',')) AS h, last(split('a,b,c', ',')) AS l,
        |  left(u.name, 2) AS lf, right(u.name, 2) AS rt,
        |  coalesce(NULL, u.name) AS co, abs(-3) AS ab, sign(-2) AS sg,
        |  round(2.375, 2) AS r2, floor(2.7) AS fl, ceil(2.2) AS ce,
        |  toInteger('42') AS ti, toString(7) AS ts,
        |  range(1, 3) AS rng, size(range(1, 3)) AS rnglen""".stripMargin)
      .collect().head
    assert(r.getAs[String]("up") == "ANN")
    assert(r.getAs[String]("lo") == "abc")
    assert(r.getAs[String]("sub1") == "nn" && r.getAs[String]("sub2") == "an")
    assert(r.getAs[Long]("len") == 3L)
    assert(r.getAs[String]("rev") == "nna")
    assert(r.getAs[String]("rep") == "amm")
    assert(r.getAs[scala.collection.Seq[String]]("parts").toSeq ==
      Seq("a", "b", "c"))
    assert(r.getAs[String]("h") == "a" && r.getAs[String]("l") == "c")
    assert(r.getAs[String]("lf") == "an" && r.getAs[String]("rt") == "nn")
    assert(r.getAs[String]("co") == "ann")
    assert(r.getAs[Long]("ab") == 3L && r.getAs[Long]("sg") == -1L)
    assert(r.getAs[Double]("r2") == 2.38)
    assert(r.getAs[Long]("fl") == 2L && r.getAs[Long]("ce") == 3L)
    assert(r.getAs[Long]("ti") == 42L && r.getAs[String]("ts") == "7")
    assert(r.getAs[scala.collection.Seq[Long]]("rng").toSeq ==
      Seq(1L, 2L, 3L))
    assert(r.getAs[Long]("rnglen") == 3L)
  }

  test("CASE + DISTINCT aggregates + aggregate arithmetic group exactly") {
    val out = CypherLite.run(fixtureGraph,
      """MATCH (u:User)-[r:RATED]->(b:Book)
        |WITH b.id AS book,
        |  sum(CASE WHEN r.rating >= 8 THEN 1 ELSE 0 END) AS high,
        |  count(DISTINCT u.community) AS comms,
        |  collect(DISTINCT u.community) AS commList,
        |  sum(r.rating) * 1.0 / count(*) AS avg_r
        |RETURN book, high, comms, commList, avg_r
        |ORDER BY book""".stripMargin)
    assert(rows(out) == Seq(
      Seq(100L, 1L, 1L, Seq(10L), 8.0),
      Seq(200L, 1L, 2L, Seq(10L, 20L), 6.5)))
  }

  test("stDev / stDevP / percentileCont: exact closed-form values") {
    val r = CypherLite.run(fixtureGraph,
      """MATCH (u:User)-[r:RATED]->(b:Book)
        |RETURN count(*) AS n, stDevP(r.rating) AS sp, stDev(r.rating) AS ss,
        |  percentileCont(r.rating, 0.5) AS med""".stripMargin)
      .collect().head
    // ratings 9,7,8,5: mean 7.25, pop var 2.1875, samp var 8.75/3
    assert(r.getAs[Long]("n") == 4L)
    assert(math.abs(r.getAs[Double]("sp") - math.sqrt(2.1875)) < 1e-12)
    assert(math.abs(r.getAs[Double]("ss") - math.sqrt(8.75 / 3)) < 1e-12)
    // sorted 5,7,8,9 → (n-1)·0.5 = 1.5 → 7 + 0.5·(8−7)
    assert(r.getAs[Double]("med") == 7.5)
  }

  test("XOR, boolean literals, CASE ELSE default") {
    val out = CypherLite.run(fixtureGraph,
      """MATCH (u:User)
        |WHERE (u.id = 1) XOR (u.community = 10)
        |RETURN u.id AS id,
        |  CASE WHEN u.community >= 20 THEN 'x' ELSE 'y' END AS t
        |ORDER BY id""".stripMargin)
    // id=1: true XOR true = false; id=2: false XOR true = true; id=3:
    // false XOR false = false
    assert(rows(out) == Seq(Seq(2L, "y")))
    val bools = CypherLite.run(fixtureGraph,
      "MATCH (u:User {id: 1}) RETURN TRUE AS t, FALSE AS f")
    assert(rows(bools) == Seq(Seq(true, false)))
  }

  test("labels(v) / type(r): compile-time provenance, null under OPTIONAL") {
    val out = CypherLite.run(fixtureGraph,
      """MATCH (u:User {id: 1})-[r:RATED]->(b:Book)
        |RETURN labels(u) AS ul, labels(b) AS bl, type(r) AS rt
        |ORDER BY b.id LIMIT 1""".stripMargin)
    assert(rows(out) == Seq(Seq(Seq("User"), Seq("Book"), "RATED")))
    // provenance survives a WITH carry
    val carried = CypherLite.run(fixtureGraph,
      """MATCH (u:User {id: 1})
        |WITH u AS person
        |RETURN labels(person) AS l""".stripMargin)
    assert(rows(carried) == Seq(Seq(Seq("User"))))
    // Cypher's labels(null)/type(null) is null under the OPTIONAL cascade
    val opt = CypherLite.run(fixtureGraph,
      """MATCH (u:User {id: 3})
        |OPTIONAL MATCH (u)-[s:SIMILAR_TO]->(v:User)
        |RETURN labels(v) AS vl, type(s) AS st""".stripMargin)
    assert(rows(opt) == Seq(Seq(null, null)))
    // a non-node variable fails fast
    intercept[RuntimeException] {
      CypherLite.run(fixtureGraph,
        "MATCH (u:User) RETURN labels(nope) AS x")
    }
  }

  test("SKIP n LIMIT m: rows n+1..n+m after the sort") {
    val out = CypherLite.run(fixtureGraph,
      """MATCH (u:User)-[r:RATED]->(b:Book)
        |RETURN u.id AS uid, b.id AS book
        |ORDER BY uid, book SKIP 1 LIMIT 2""".stripMargin)
    // full order: (1,100),(2,100),(2,200),(3,200) → skip 1, take 2
    assert(rows(out) == Seq(Seq(2L, 100L), Seq(2L, 200L)))
    // SKIP alone, and SKIP past the end
    assert(rows(CypherLite.run(fixtureGraph,
      """MATCH (u:User) RETURN u.id AS id ORDER BY id SKIP 2""".stripMargin))
      == Seq(Seq(3L)))
    assert(rows(CypherLite.run(fixtureGraph,
      """MATCH (u:User) RETURN u.id AS id ORDER BY id SKIP 9""".stripMargin))
      .isEmpty)
    // WITH-level pagination feeds the next clause
    val via = CypherLite.run(fixtureGraph,
      """MATCH (u:User)
        |WITH u ORDER BY u.id SKIP 1 LIMIT 1
        |MATCH (u)-[r:RATED]->(b:Book)
        |RETURN b.id AS book ORDER BY book""".stripMargin)
    assert(rows(via) == Seq(Seq(100L), Seq(200L)))
  }

  test("unknown scalar functions still fail fast, with the arity") {
    val e = intercept[RuntimeException] {
      CypherLite.run(fixtureGraph, "MATCH (u:User) RETURN foo(u.id) AS x")
    }
    assert(e.getMessage.contains("unsupported function foo/1"))
  }

  test("compiled cypher_case_agg ≡ hand-built twin on real data") {
    val got = rows(ReferenceQueries.caseAggCompiled(spark, sf))
    val ratings = graft.graph.RatingsGraph.ratings(spark, sf)
    val books = graft.graph.RatingsGraph.ratedBooks(spark, sf)
    val want = rows(ratings.join(books, Seq("book_id"))
      .groupBy(col("book_type"))
      .agg(
        sum(when(col("rating") >= 8, 1L).otherwise(0L)).as("high_ratings"),
        countDistinct(col("user_id")).as("raters"),
        count(lit(1)).as("n"),
        (sum(col("rating")) * lit(1.0) / count(lit(1))).as("avg_rating"))
      .orderBy("book_type"))
    assert(got == want, s"compiled ${got.take(2)} vs twin ${want.take(2)}")
    assert(got.nonEmpty)
  }

  test("compiled cypher_string_funcs ≡ hand-built twin on real data") {
    val got = rows(ReferenceQueries.stringFuncsCompiled(spark, sf))
    val users = graft.graph.RatingsGraph.activeUsers(spark, sf)
    val want = rows(users
      .filter(col("segment").startsWith("BU") &&
        (col("user_id") % 10).isin(0, 3, 7))
      .select(col("user_id"),
        lower(col("segment")).as("seg"),
        col("name").substr(lit(1), lit(8)).as("name8"),
        length(col("name")).cast("bigint").as("name_len"),
        (col("user_id") * 2 + 1).as("odd_id"),
        when(col("community") >= 12, "high").otherwise("low").as("tier"))
      .orderBy("user_id"))
    assert(got == want, s"compiled ${got.take(2)} vs twin ${want.take(2)}")
    assert(got.nonEmpty)
  }

  test("compiled cypher_segment_stats ≡ hand-built twin on real data") {
    val got = rows(ReferenceQueries.segmentStatsCompiled(spark, sf))
    val ratings = graft.graph.RatingsGraph.ratings(spark, sf)
    val users = graft.graph.RatingsGraph.activeUsers(spark, sf)
    val want = rows(ratings
      .join(users.select(col("user_id"), col("segment")), Seq("user_id"))
      .groupBy(col("segment"))
      .agg(countDistinct(col("book_id")).as("distinct_books"),
        percentile(col("rating"), lit(0.5)).as("median_rating"),
        (round(stddev_pop(col("rating")) * lit(1000000L), 0) /
          lit(1000000.0)).as("sd6"))
      .orderBy("segment"))
    assert(got == want, s"compiled $got vs twin $want")
    assert(got.nonEmpty)
  }

  test("r12b UNION: distinct rows, UNION ALL multiplicity, fail-fasts") {
    // fixture: two users, one shared book — UNION dedups full rows,
    // UNION ALL keeps both parts' duplicates
    val nodes = Seq((1L, "a"), (2L, "b")).toDF("id", "name")
    val g = CypherLite.Graph(
      nodes = Map("User" -> nodes),
      edges = Map.empty)
    val union = CypherLite.run(g,
      """MATCH (u:User) RETURN u.id AS id
        |UNION
        |MATCH (u:User) WHERE u.id = 1 RETURN u.id AS id""".stripMargin)
    assert(union.columns.toSeq == Seq("id"))
    assert(rows(union.orderBy("id")) == Seq(Seq(1L), Seq(2L)),
      "UNION dedups the doubled row 1")
    val unionAll = CypherLite.run(g,
      """MATCH (u:User) RETURN u.id AS id
        |UNION ALL
        |MATCH (u:User) WHERE u.id = 1 RETURN u.id AS id""".stripMargin)
    assert(rows(unionAll.orderBy("id")) == Seq(Seq(1L), Seq(1L), Seq(2L)),
      "UNION ALL keeps both copies of row 1")
    // three-part chain composes
    val tri = CypherLite.run(g,
      """MATCH (u:User) WHERE u.id = 1 RETURN u.name AS n
        |UNION MATCH (u:User) WHERE u.id = 2 RETURN u.name AS n
        |UNION MATCH (u:User) WHERE u.id = 1 RETURN u.name AS n""".stripMargin)
    assert(rows(tri.orderBy("n")) == Seq(Seq("a"), Seq("b")))
    // column mismatch and mixed combinators fail fast with named errors
    val mismatch = intercept[IllegalArgumentException] {
      CypherLite.run(g,
        "MATCH (u:User) RETURN u.id AS id UNION " +
          "MATCH (u:User) RETURN u.name AS name")
    }
    assert(mismatch.getMessage.contains("same columns"))
    val mixed = intercept[IllegalArgumentException] {
      CypherLite.run(g,
        "MATCH (u:User) RETURN u.id AS id UNION " +
          "MATCH (u:User) RETURN u.id AS id UNION ALL " +
          "MATCH (u:User) RETURN u.id AS id")
    }
    assert(mixed.getMessage.contains("cannot mix"))
  }

  test("r12b simple CASE: subject desugars to = branches, null falls to ELSE") {
    val nodes = Seq((1L, "BU"), (2L, "AU"), (3L, null))
      .toDF("id", "seg")
    val g = CypherLite.Graph(nodes = Map("User" -> nodes), edges = Map.empty)
    val got = rows(CypherLite.run(g,
      """MATCH (u:User)
        |RETURN u.id AS id,
        |  CASE u.seg WHEN 'BU' THEN 'biz' WHEN 'AU' THEN 'auto'
        |    ELSE 'other' END AS kind
        |ORDER BY id""".stripMargin))
    assert(got == Seq(Seq(1L, "biz"), Seq(2L, "auto"), Seq(3L, "other")),
      s"simple CASE diverged: $got")
    // without ELSE, a missed (or null) subject yields NULL
    val noElse = rows(CypherLite.run(g,
      """MATCH (u:User)
        |RETURN u.id AS id, CASE u.seg WHEN 'BU' THEN 1 END AS hit
        |ORDER BY id""".stripMargin))
    assert(noElse == Seq(Seq(1L, 1L), Seq(2L, null), Seq(3L, null)))
  }

  test("r12b list expressions: comprehension, quantifiers, reduce") {
    val nodes = Seq(
      (1L, Seq(1L, 2L, 3L, 4L), Seq((1L, 2.0), (2L, 3.0))),
      (2L, Seq(10L), Seq((9L, 1.5))))
      .toDF("id", "xs", "es")
    val g = CypherLite.Graph(nodes = Map("U" -> nodes), edges = Map.empty)
    val got = rows(CypherLite.run(g,
      """MATCH (u:U)
        |RETURN u.id AS id,
        |  [x IN u.xs WHERE x % 2 = 0 | x * 10] AS evens10,
        |  [x IN u.xs WHERE x < 3] AS small,
        |  any(x IN u.xs WHERE x > 3) AS has_big,
        |  all(x IN u.xs WHERE x > 1) AS all_gt1,
        |  none(x IN u.xs WHERE x = 99) AS no99,
        |  single(x IN u.xs WHERE x = 2) AS one2,
        |  reduce(acc = 0, x IN u.xs | acc + x) AS total,
        |  reduce(s = 0.0, e IN u.es | s + e._2) AS wsum
        |ORDER BY id""".stripMargin))
    assert(got == Seq(
      Seq(1L, Seq(20L, 40L), Seq(1L, 2L), true, false, true, true, 10L, 5.0),
      Seq(2L, Seq(100L), Seq(), true, true, true, false, 10L, 1.5)),
      s"list expressions diverged: $got")
  }

  test("r12b compiled cypher_union ≡ hand-built fan/critic union") {
    val got = rows(ReferenceQueries.unionCompiled(spark, sf)
      .orderBy(col("user_id"), col("kind")))
    val ratings = graft.graph.RatingsGraph.ratings(spark, sf)
    val want = rows(ratings.filter(col("rating") >= 9)
      .select(col("user_id"), lit("fan").as("kind"))
      .unionAll(ratings.filter(col("rating") <= 2)
        .select(col("user_id"), lit("critic").as("kind")))
      .distinct().orderBy(col("user_id"), col("kind")))
    assert(got == want, s"compiled ${got.take(5)} vs twin ${want.take(5)}")
    assert(got.nonEmpty)
  }
}
