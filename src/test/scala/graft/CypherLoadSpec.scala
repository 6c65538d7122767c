package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.cypher.{CypherLite, CypherLoad, ReferenceQueries}

/** The write side of the Cypher front-end: the reference's VERBATIM
  * load statements (`data/load_data.py`) compiled onto functional graph
  * updates, ending in the row-parity proof against the ratings_edges
  * ETL the verdict asked for. */
class CypherLoadSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def empty = CypherLoad.LoadState(
    CypherLite.Graph(nodes = Map.empty, edges = Map.empty))

  test("load_users verbatim: MERGE upserts by id, SET applies, '' age becomes NULL") {
    val rows = Seq(
      ("7", "Hamburg", "41"),
      ("8", "Kiel", ""),
      ("7", "Hamburg", "42")) // same key twice: one node survives
      .toDF("User-ID", "Location", "Age")
    val st = CypherLoad.run(empty, ReferenceQueries.LoadUsers,
      Map("rows" -> rows))
    val users = st.graph.nodes("User").collect()
      .map(r => r.getLong(0) -> (r.getString(1), Option(r.get(2)))).toMap
    assert(users.keySet == Set(7L, 8L))
    assert(users(8L) == (("Kiel", None)), "'' must CASE to NULL age")
    // order-free batch dedup: the max of the (location, age) struct
    assert(users(7L) == (("Hamburg", Some(42L))))
  }

  test("load_ratings verbatim: MATCH drops unknown endpoints, MERGE dedupes (src,dst)") {
    val users = Seq(("1", "x", "")).toDF("User-ID", "Location", "Age")
    val books = Seq(("10", "t", "a", "1999", "p"), ("11", "t2", "a2", "2001", "p2"))
      .toDF("ISBN", "Book-Title", "Book-Author", "Year-Of-Publication", "Publisher")
    val ratings = Seq(
      ("1", "10", "5"), ("1", "10", "9"), // dup edge: max rating wins
      ("1", "11", "7"),
      ("1", "99", "8"), // unknown book: MATCH produces nothing
      ("2", "10", "6")) // unknown user: likewise
      .toDF("User-ID", "ISBN", "Book-Rating")
    var st = CypherLoad.run(empty, ReferenceQueries.UserConstraint)
    st = CypherLoad.run(st, ReferenceQueries.BookConstraint)
    st = CypherLoad.run(st, ReferenceQueries.LoadUsers, Map("rows" -> users))
    st = CypherLoad.run(st, ReferenceQueries.LoadBooks, Map("rows" -> books))
    st = CypherLoad.run(st, ReferenceQueries.LoadRatings, Map("rows" -> ratings))
    assert(st.constraints == Set(("User", "id"), ("Book", "isbn")))
    // dst is the Book key = isbn, a STRING (Neo4j ISBNs are strings)
    val rated = st.graph.edges("RATED").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(rated == Set((1L, "10", 9L), (1L, "11", 7L)))
    val books2 = st.graph.nodes("Book").collect()
    assert(books2.length == 2 &&
      books2.forall(r => Seq("t", "t2").contains(r.getString(1))))
  }

  test("re-MERGE preserves properties outside the SET list and overwrites inside it") {
    val first = Seq(("5", "Bonn", "30")).toDF("User-ID", "Location", "Age")
    val second = Seq(("5", "Mainz", "")).toDF("User-ID", "Location", "Age")
    var st = CypherLoad.run(empty, ReferenceQueries.LoadUsers, Map("rows" -> first))
    st = CypherLoad.run(st, ReferenceQueries.LoadUsers, Map("rows" -> second))
    val u = st.graph.nodes("User").collect()
    assert(u.length == 1)
    // both properties are IN the SET list, so both overwrite (age -> NULL)
    assert(u.head.getString(1) == "Mainz" && u.head.isNullAt(2))
  }

  test("StreamingLoader (S17): streamed load_ratings ≡ batch loads, last batch wins on re-MERGE") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val users = Seq(("1", "x", ""), ("2", "y", "30"))
      .toDF("User-ID", "Location", "Age")
    val books = Seq(("10", "t", "a", "1999", "p"), ("11", "t2", "a2", "2001", "p2"))
      .toDF("ISBN", "Book-Title", "Book-Author", "Year-Of-Publication", "Publisher")
    var st = CypherLoad.run(empty, ReferenceQueries.LoadUsers, Map("rows" -> users))
    st = CypherLoad.run(st, ReferenceQueries.LoadBooks, Map("rows" -> books))
    val loader = new CypherLoad.StreamingLoader(st, ReferenceQueries.LoadRatings)
    val input = MemoryStream[(String, String, String)]
    val q = loader.attach(input.toDF()
        .select(col("_1").as("User-ID"), col("_2").as("ISBN"),
          col("_3").as("Book-Rating")))
      .start()
    try {
      input.addData(("1", "10", "5"), ("1", "10", "9"), ("2", "99", "8"))
      q.processAllAvailable()
      // within a batch: order-free max dedup; unknown ISBN 99 drops
      val afterB1 = loader.current.graph.edges("RATED").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(afterB1 == Set((1L, "10", 9L)))
      // batch 2: re-MERGE of (1,10) with a LOWER rating — across
      // batches last batch wins (Neo4j re-run MERGE+SET), plus new edges
      input.addData(("1", "10", "4"), ("1", "11", "7"), ("2", "11", "6"))
      q.processAllAvailable()
      val afterB2 = loader.current.graph.edges("RATED").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
      assert(afterB2 == Set((1L, "10", 4L), (1L, "11", 7L), (2L, "11", 6L)))
      // nodes untouched by the ratings statement keep reference equality
      assert(loader.current.graph.nodes("User") eq st.graph.nodes("User"))
    } finally q.stop()
    // the same fold is directly callable for batch backfills
    val backfill = new CypherLoad.StreamingLoader(st, ReferenceQueries.LoadRatings)
    backfill.applyBatch(Seq(("1", "10", "5"), ("1", "10", "9"))
      .toDF("User-ID", "ISBN", "Book-Rating"))
    backfill.applyBatch(Seq(("1", "10", "4"), ("1", "11", "7"), ("2", "11", "6"))
      .toDF("User-ID", "ISBN", "Book-Rating"))
    val viaBackfill = backfill.current.graph.edges("RATED").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(viaBackfill == Set((1L, "10", 4L), (1L, "11", 7L), (2L, "11", 6L)))
  }

  test("StreamingQueryView (S19): compiled READ view over the streamed graph ≡ batch re-run") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val users = Seq(("1", "x", ""), ("2", "y", "30"))
      .toDF("User-ID", "Location", "Age")
    val books = Seq(("10", "t", "a", "1999", "p"), ("11", "t2", "a2", "2001", "p2"))
      .toDF("ISBN", "Book-Title", "Book-Author", "Year-Of-Publication", "Publisher")
    var st = CypherLoad.run(empty, ReferenceQueries.LoadUsers, Map("rows" -> users))
    st = CypherLoad.run(st, ReferenceQueries.LoadBooks, Map("rows" -> books))
    // seed the RATED frame empty: the read query must compile against
    // the initial graph (the documented StreamingQueryView contract)
    st = CypherLoad.run(st, ReferenceQueries.LoadRatings,
      Map("rows" -> Seq.empty[(String, String, String)]
        .toDF("User-ID", "ISBN", "Book-Rating")))
    val readQ =
      """MATCH (u:User)-[r:RATED]->(b:Book)
        |RETURN u.id AS user, count(*) AS n, max(r.rating) AS top
        |ORDER BY user""".stripMargin
    val view = new CypherLoad.StreamingQueryView(st,
      ReferenceQueries.LoadRatings, readQ)
    // pre-stream view: the compiled query over the initial graph (no
    // RATED edges yet — zero rows, not an error)
    assert(view.current.isEmpty)
    def viewRows = view.current.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val b1 = Seq(("1", "10", "5"), ("2", "11", "6"))
    val b2 = Seq(("1", "10", "9"), ("1", "11", "7")) // re-MERGE raises 1·10
    val input = MemoryStream[(String, String, String)]
    val q = view.attach(input.toDF()
        .select(col("_1").as("User-ID"), col("_2").as("ISBN"),
          col("_3").as("Book-Rating")))
      .start()
    try {
      input.addData(b1: _*); q.processAllAvailable()
      assert(viewRows == Seq((1L, 1L, 5L), (2L, 1L, 6L)))
      // batch 2 includes a MERGE that CHANGES the standing result:
      // (1,10) re-SET 5→9 plus a brand-new (1,11) edge
      input.addData(b2: _*); q.processAllAvailable()
      assert(viewRows == Seq((1L, 2L, 9L), (2L, 1L, 6L)))
    } finally q.stop()
    // stream ≡ batch re-run: the same two batches folded batch-side,
    // the same compiled query over the folded graph
    var bst = st
    Seq(b1, b2).foreach { b =>
      bst = CypherLoad.run(bst, ReferenceQueries.LoadRatings,
        Map("rows" -> b.toDF("User-ID", "ISBN", "Book-Rating")))
    }
    val batchRows = CypherLite.run(bst.graph, readQ).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(viewRows == batchRows,
      "streamed view diverged from the batch re-run")
  }

  test("IncrementalQueryView (S19b): delta-bound key patching ≡ batch re-run") {
    val users = Seq(("1", "x", ""), ("2", "y", "30"))
      .toDF("User-ID", "Location", "Age")
    val books = Seq(("10", "t", "a", "1999", "p"), ("11", "t2", "a2", "2001", "p2"))
      .toDF("ISBN", "Book-Title", "Book-Author", "Year-Of-Publication", "Publisher")
    var st = CypherLoad.run(empty, ReferenceQueries.LoadUsers, Map("rows" -> users))
    st = CypherLoad.run(st, ReferenceQueries.LoadBooks, Map("rows" -> books))
    st = CypherLoad.run(st, ReferenceQueries.LoadRatings,
      Map("rows" -> Seq.empty[(String, String, String)]
        .toDF("User-ID", "ISBN", "Book-Rating")))
    // KEY-LOCAL per-user aggregate (no ORDER BY — the incremental view
    // maintains a row SET; order on read)
    val readQ =
      """MATCH (u:User)-[r:RATED]->(b:Book)
        |RETURN u.id AS user, count(*) AS n, max(r.rating) AS top""".stripMargin
    val view = new CypherLoad.IncrementalQueryView(st,
      ReferenceQueries.LoadRatings, readQ, keyLabel = "User",
      viewKeyCol = "user", batchKeyCol = "User-ID")
    assert(view.current.isEmpty)
    def viewRows = view.current.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    val b1 = Seq(("1", "10", "5"), ("2", "11", "6"))
    val b2 = Seq(("1", "10", "9"), ("1", "11", "7")) // touches user 1 ONLY
    view.applyBatch(b1.toDF("User-ID", "ISBN", "Book-Rating"))
    assert(viewRows == Seq((1L, 1L, 5L), (2L, 1L, 6L)))
    assert(view.lastTouchedKeys == 2L && view.lastRecomputeRows == 2L)
    // batch 2: a re-MERGE that RAISES (1,10) plus a new (1,11) edge —
    // user 2's standing row is patched AROUND, never recomputed; the
    // exposed counters make the delta bound an assertion, not a claim
    view.applyBatch(b2.toDF("User-ID", "ISBN", "Book-Rating"))
    assert(viewRows == Seq((1L, 2L, 9L), (2L, 1L, 6L)))
    assert(view.lastTouchedKeys == 1L && view.lastRecomputeRows == 1L,
      s"one-key batch must recompute exactly one key's rows, got " +
        s"${view.lastRecomputeRows} over ${view.lastTouchedKeys} keys")
    // ≡ the full batch re-run of the same query over the same folds
    var bst = st
    Seq(b1, b2).foreach { b =>
      bst = CypherLoad.run(bst, ReferenceQueries.LoadRatings,
        Map("rows" -> b.toDF("User-ID", "ISBN", "Book-Rating")))
    }
    val batchRows = CypherLite.run(bst.graph, readQ).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1).toSeq
    assert(viewRows == batchRows,
      "incremental view diverged from the batch re-run")
    // the streaming wiring shares StreamingLoader/foreachBatch with the
    // S17/S19 attach paths already pinned above
  }

  test("DecomposableAggView (S20b): non-key-local aggregate patched from deltas ≡ re-run") {
    // three users at TWO locations: the view groups by u.location, so
    // its rows are NOT owned by one user — the shape S20 rejects and
    // this variant delta-folds (count/sum/avg decompose into sum+count)
    val users = Seq(("1", "x", ""), ("2", "x", "30"), ("3", "y", "25"))
      .toDF("User-ID", "Location", "Age")
    val books = Seq(("10", "t", "a", "1999", "p"), ("11", "t2", "a2", "2001", "p2"))
      .toDF("ISBN", "Book-Title", "Book-Author", "Year-Of-Publication", "Publisher")
    var st = CypherLoad.run(empty, ReferenceQueries.LoadUsers, Map("rows" -> users))
    st = CypherLoad.run(st, ReferenceQueries.LoadBooks, Map("rows" -> books))
    st = CypherLoad.run(st, ReferenceQueries.LoadRatings,
      Map("rows" -> Seq.empty[(String, String, String)]
        .toDF("User-ID", "ISBN", "Book-Rating")))
    val detailQ =
      """MATCH (u:User)-[r:RATED]->(b:Book)
        |RETURN u.location AS loc, r.rating AS rating""".stripMargin
    val view = new CypherLoad.DecomposableAggView(st,
      ReferenceQueries.LoadRatings, detailQ, keyLabel = "User",
      batchKeyCol = "User-ID", groupCols = Seq("loc"),
      aggs = Seq(("n", "count", ""), ("total", "sum", "rating"),
        ("mean", "avg", "rating")))
    assert(view.current.isEmpty)
    def viewRows = view.current.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3))).sortBy(_._1).toSeq
    val b1 = Seq(("1", "10", "5"), ("2", "11", "6"), ("3", "10", "4"))
    val b2 = Seq(("1", "10", "9"), ("1", "11", "7")) // touches user 1 ONLY
    view.applyBatch(b1.toDF("User-ID", "ISBN", "Book-Rating"))
    assert(viewRows == Seq(("x", 2L, 11.0, 5.5), ("y", 1L, 4.0, 4.0)))
    // batch 2: a re-MERGE raising (1,10) 5→9 plus a new (1,11) edge —
    // location y's group row is never recomputed (Δ hits 'x' only),
    // and the counters make the delta bound an assertion
    view.applyBatch(b2.toDF("User-ID", "ISBN", "Book-Rating"))
    assert(viewRows == Seq(("x", 3L, 22.0, 22.0 / 3.0), ("y", 1L, 4.0, 4.0)))
    assert(view.lastTouchedKeys == 1L && view.lastDeltaGroups == 1L,
      s"one-key batch must delta one group, got ${view.lastDeltaGroups} " +
        s"groups over ${view.lastTouchedKeys} keys")
    // ≡ the full re-derive (generic-view semantics) over the same folds
    var bst = st
    Seq(b1, b2).foreach { b =>
      bst = CypherLoad.run(bst, ReferenceQueries.LoadRatings,
        Map("rows" -> b.toDF("User-ID", "ISBN", "Book-Rating")))
    }
    val batchRows = CypherLite.run(bst.graph,
      """MATCH (u:User)-[r:RATED]->(b:Book)
        |RETURN u.location AS loc, count(*) AS n, sum(r.rating) AS total,
        |avg(r.rating) AS mean""".stripMargin).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2).toDouble,
        r.getDouble(3))).sortBy(_._1).toSeq
    assert(viewRows == batchRows,
      "delta-folded aggregate view diverged from the full re-run")
    // min/max are not delta-foldable — rejected at construction
    intercept[IllegalArgumentException] {
      new CypherLoad.DecomposableAggView(st, ReferenceQueries.LoadRatings,
        detailQ, "User", "User-ID", Seq("loc"),
        Seq(("m", "max", "rating")))
    }
  }

  test("unsupported write constructs fail fast, never compile silently wrong") {
    val rows = Seq(("1", "x", "")).toDF("User-ID", "Location", "Age")
    // DELETE is outside the write subset
    intercept[Exception] {
      CypherLoad.run(empty, "UNWIND $rows AS row DETACH DELETE row",
        Map("rows" -> rows))
    }
    // SET on a variable other than the MERGE target
    intercept[Exception] {
      CypherLoad.run(empty,
        "UNWIND $rows AS row MERGE (u:User {id: toInteger(row.`User-ID`)}) SET x.location = row.Location",
        Map("rows" -> rows))
    }
    // missing parameter
    intercept[Exception] {
      CypherLoad.run(empty, ReferenceQueries.LoadUsers)
    }
    // constraint violation on a pre-existing duplicate-key frame
    val dup = CypherLite.Graph(
      nodes = Map("User" -> Seq((1L, "a"), (1L, "b")).toDF("id", "name")),
      edges = Map.empty)
    intercept[IllegalArgumentException] {
      CypherLoad.run(CypherLoad.LoadState(dup), ReferenceQueries.UserConstraint)
    }
  }

  test("compiled load is row-identical to the ratings_edges ETL on sf0.001") {
    // the reference loads filtered_users/books/ratings.csv; the engine's
    // CSV-shaped twin of those files is the filtered event log projected
    // to the reference's headers (strings, as a CSV reader yields them)
    val events = graph.RatingsGraph.filteredEvents(spark, sf)
      .select(col("user_id").cast("string").as("User-ID"),
        col("book_id").cast("string").as("ISBN"),
        col("rating").cast("string").as("Book-Rating"))
      .localCheckpoint()
    val userRows = events.select(col("User-ID")).distinct()
      .select(col("User-ID"), lit("somewhere").as("Location"), lit("").as("Age"))
    val bookRows = events.select(col("ISBN")).distinct()
      .select(col("ISBN"), concat(lit("book "), col("ISBN")).as("Book-Title"),
        lit("anon").as("Book-Author"), lit("2000").as("Year-Of-Publication"),
        lit("pub").as("Publisher"))
    var st = CypherLoad.run(empty, ReferenceQueries.UserConstraint)
    st = CypherLoad.run(st, ReferenceQueries.LoadUsers, Map("rows" -> userRows))
    st = CypherLoad.run(st, ReferenceQueries.LoadBooks, Map("rows" -> bookRows))
    st = CypherLoad.run(st, ReferenceQueries.LoadRatings, Map("rows" -> events))
    val loaded = st.graph.edges("RATED")
      .select(col("src").as("user_id"), col("dst").as("book_id"),
        col("rating").cast("long").as("rating"))
    val etl = graph.RatingsGraph.ratings(spark, sf)
      .select(col("user_id"), col("book_id"), col("rating").cast("long").as("rating"))
    assert(loaded.count() == etl.count())
    assert(loaded.exceptAll(etl).isEmpty && etl.exceptAll(loaded).isEmpty,
      "compiled Cypher load diverged from the ratings ETL")
  }
}
