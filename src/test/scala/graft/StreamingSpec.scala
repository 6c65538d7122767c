package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event

class StreamingSpec extends AnyFunSuite {
  import TestSpark._

  // offset by a day so no event sits at the initial watermark (epoch 0),
  // which stateful ops treat as late
  private def ts(minutes: Long): Timestamp = new Timestamp(86400000L + minutes * 60000L)

  test("ratingsUpserts: streaming MERGE state equals the batch max-rating dedup, only improvements emitted") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import EventStreams.{RatingEvent, RatingUpsert}
    val input = MemoryStream[RatingEvent]
    val q = EventStreams.ratingsUpserts(input.toDS())
      .writeStream.format("memory").queryName("ru").outputMode("append").start()
    try {
      // batch 1: new pairs + a duplicate with lower rating + a zero (filtered)
      input.addData(RatingEvent(1, 10, 5), RatingEvent(1, 10, 3),
        RatingEvent(2, 10, 7), RatingEvent(1, 11, 0))
      q.processAllAvailable()
      // batch 2: improvement for (1,10), non-improvement for (2,10), new pair
      input.addData(RatingEvent(1, 10, 9), RatingEvent(2, 10, 6), RatingEvent(3, 12, 4))
      q.processAllAvailable()
      val ups = spark.table("ru").as[RatingUpsert].collect()
        .groupBy(u => (u.user_id, u.book_id)).view.mapValues(_.map(_.rating).toList).toMap
      // final applied state = last upsert per key == batch GROUP BY max
      assert(ups == Map((1L, 10L) -> List(5L, 9L), (2L, 10L) -> List(7L), (3L, 12L) -> List(4L)),
        s"got $ups")
    } finally q.stop()
  }

  test("funnelStages: change-log reaches the batch stage, late events can demote") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import EventStreams.{FunnelStage}
    val input = MemoryStream[Event]
    val q = EventStreams.funnelStages(input.toDS())
      .writeStream.format("memory").queryName("fs").outputMode("append").start()
    try {
      // user 1 progresses cleanly; user 2's click precedes its view
      input.addData(Event(1, ts(10), 1, "view", 0), Event(2, ts(5), 2, "click", 0))
      q.processAllAvailable()
      input.addData(Event(3, ts(20), 1, "click", 0), Event(4, ts(10), 2, "view", 0))
      q.processAllAvailable()
      input.addData(Event(5, ts(30), 1, "purchase", 0))
      q.processAllAvailable()
      // user 3: stage 2, then a LATE earlier click arrives → first click
      // now precedes the first view → demoted to 1 (batch formula parity)
      input.addData(Event(6, ts(100), 3, "view", 0), Event(7, ts(200), 3, "click", 0))
      q.processAllAvailable()
      input.addData(Event(8, ts(50), 3, "click", 0))
      q.processAllAvailable()
      val log = spark.table("fs").as[FunnelStage].collect()
      val finalStage = log.zipWithIndex.groupBy(_._1.user_id).view
        .mapValues(_.maxBy(_._2)._1.stage).toMap
      assert(finalStage == Map(1L -> 3, 2L -> 1, 3L -> 1), s"got $finalStage from ${log.toSeq}")
      // user 1's change-log shows the full progression
      assert(log.filter(_.user_id == 1L).map(_.stage).toSeq == Seq(1, 2, 3))
    } finally q.stop()
  }

  test("sessionWindowCounts: native session_window merges gaps like the hand-rolled sessionizer") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    // user 1: two sessions (gap 45 min > 30); user 2: one session
    input.addData(
      Event(1, ts(0), 1, "click", 1.0), Event(2, ts(10), 1, "click", 2.0),
      Event(3, ts(55), 1, "click", 4.0),
      Event(4, ts(5), 2, "view", 1.5))
    // advance the watermark far past every session end so they emit
    input.addData(Event(9, ts(600), 9, "click", 0.0))
    val q = EventStreams.sessionWindowCounts(input.toDF())
      .writeStream.format("memory").queryName("sw").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("sw")
        .filter(col("user_id") <= 2)
        .collect().map(r => (r.getLong(0),
          (r.getTimestamp(1).getTime - 86400000L) / 60000,
          (r.getTimestamp(2).getTime - 86400000L) / 60000,
          r.getLong(3), r.getDouble(4))).toSet
      // window end = last event + 30-min gap (native convention)
      assert(got == Set(
        (1L, 0L, 40L, 2L, 3.0),
        (1L, 55L, 85L, 1L, 4.0),
        (2L, 5L, 35L, 1L, 1.5)), s"got $got")
    } finally q.stop()
  }

  test("windowedCounts over a MemoryStream matches the batch analog") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val evs = Seq(
      Event(1, ts(5), 1, "click", 1.0), Event(2, ts(10), 2, "click", 2.0),
      Event(3, ts(65), 1, "buy", 5.0), Event(4, ts(70), 1, "click", 1.5),
      Event(5, ts(200), 3, "click", 0.5))
    input.addData(evs: _*)
    val q = EventStreams.windowedCounts(input.toDF())
      .writeStream.format("memory").queryName("wc").outputMode("complete").start()
    try {
      q.processAllAvailable()
      val got = spark.table("wc")
        .select("window_start", "event_type", "n_events", "sum_value")
        .collect().map(r => ((r.getTimestamp(0).getTime - 86400000L) / 60000, r.getString(1),
          r.getLong(2), r.getDouble(3))).toSet
      assert(got == Set(
        (0L, "click", 2L, 3.0), (60L, "buy", 1L, 5.0),
        (60L, "click", 1L, 1.5), (180L, "click", 1L, 0.5)))
      // batch path produces the same aggregation
      val batch = EventStreams.windowedCounts(evs.toDF())
        .select("window_start", "event_type", "n_events", "sum_value")
        .collect().map(r => ((r.getTimestamp(0).getTime - 86400000L) / 60000, r.getString(1),
          r.getLong(2), r.getDouble(3))).toSet
      assert(batch == got)
    } finally q.stop()
  }

  test("slidingCounts over a MemoryStream matches the batch analog") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val evs = Seq(
      Event(1, ts(5), 1, "click", 1.0), Event(2, ts(10), 2, "click", 2.0),
      Event(3, ts(65), 1, "buy", 5.0), Event(4, ts(70), 1, "click", 1.5),
      Event(5, ts(200), 3, "click", 0.5))
    input.addData(evs: _*)
    val q = EventStreams.slidingCounts(input.toDF())
      .writeStream.format("memory").queryName("slc").outputMode("complete").start()
    try {
      q.processAllAvailable()
      def canon(df: org.apache.spark.sql.DataFrame) = df
        .select("window_start", "event_type", "n_events", "sum_value")
        .collect().map(r => ((r.getTimestamp(0).getTime - 86400000L) / 60000,
          r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      val got = canon(spark.table("slc"))
      // the clicks at minutes 5 and 10 belong to the 4 hour-long windows
      // sliding by 15 min that contain them: starts -45, -30, -15, 0
      assert(got.contains((0L, "click", 2L, 3.0)))
      assert(got.contains((-45L, "click", 2L, 3.0)), s"missing early slide: $got")
      assert(got == canon(EventStreams.slidingCounts(evs.toDF())))
    } finally q.stop()
  }

  test("RatingsSilverMaintainer: stream-folded silver equals the one-shot MERGE build") {
    import spark.implicits._
    import EventStreams.RatingEvent
    implicit val sqlCtx = spark.sqlContext
    val init = Seq((1L, 10L, 5L), (2L, 20L, 7L))
      .toDF("user_id", "book_id", "rating")
    val input = MemoryStream[RatingEvent]
    val maintainer = new EventStreams.RatingsSilverMaintainer(init)
    val q = maintainer.attach(input.toDF()).start()
    try {
      // two micro-batches: an improvement, a no-op downgrade, a zero
      // (filtered), and a brand-new pair — split across batches
      input.addData(RatingEvent(1L, 10L, 9L), RatingEvent(2L, 20L, 3L))
      q.processAllAvailable()
      input.addData(RatingEvent(3L, 30L, 8L), RatingEvent(1L, 10L, 0L))
      q.processAllAvailable()
      val got = maintainer.current.collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      val oneShot = graft.graph.RatingsGraph.mergeRatings(init,
          Seq((1L, 10L, 9L), (2L, 20L, 3L), (3L, 30L, 8L), (1L, 10L, 0L))
            .toDF("user_id", "book_id", "rating")).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got == oneShot)
      assert(got == Map((1L, 10L) -> 9L, (2L, 20L) -> 7L, (3L, 30L) -> 8L))
    } finally q.stop()
  }

  test("KnnIndexMaintainer (S18): stream-folded embedding + pair silvers equal the batch recompute") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.IndexStreams
    import graft.streaming.IndexStreams.EdgeOp
    val dim = 16
    val dir = "/root/testdata/sf0.001"
    val edges0 = graph.Algorithms.bipartiteEdges(spark, dir).localCheckpoint()
    val m = new IndexStreams.KnnIndexMaintainer(edges0, dim)

    // the T15 delta triple, split across two micro-batches: batch 1
    // re-weights every edge of user-node 4 (+1) and adds a brand-new
    // user rating two books; batch 2 deletes user-node 6 outright
    val target = 4L
    val removed = 6L
    val newNode = 999998L
    val books = edges0.filter(col("src") % 2 === 1).select(col("src"))
      .distinct().limit(2).collect().map(_.getLong(0))
    def ops(df: org.apache.spark.sql.DataFrame): Seq[EdgeOp] =
      df.collect().map(r => EdgeOp(r.getLong(0), r.getLong(1),
        Option(r.get(2)).map(_.toString.toDouble))).toSeq
    val batch1 = ops(edges0
        .filter(col("src") === target || col("dst") === target)
        .select(col("src"), col("dst"), (col("weight") + 1.0).as("weight"))) ++
      books.toSeq.flatMap(b => Seq(EdgeOp(newNode, b, Some(7.0)),
        EdgeOp(b, newNode, Some(7.0))))
    val batch2 = ops(edges0
        .filter(col("src") === removed || col("dst") === removed)
        .select(col("src"), col("dst"), lit(null).cast("double").as("weight")))

    val input = MemoryStream[EdgeOp]
    val q = m.attach(input.toDF()).start()
    try {
      input.addData(batch1: _*); q.processAllAvailable()
      input.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()

    // batch-recompute truth over the final edge table
    val finalEdges = edges0
      .filter(col("src") =!= removed && col("dst") =!= removed)
      .filter(col("src") =!= target && col("dst") =!= target)
      .unionAll(edges0
        .filter(col("src") === target || col("dst") === target)
        .select(col("src"), col("dst"), (col("weight") + 1.0).as("weight")))
      .unionAll(books.toSeq.toDF("b")
        .select(lit(newNode).as("src"), col("b").as("dst"), lit(7.0).as("weight"))
        .unionAll(books.toSeq.toDF("b")
          .select(col("b").as("src"), lit(newNode).as("dst"), lit(7.0).as("weight"))))
      .localCheckpoint()
    val gotEdges = m.currentEdges.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val expEdges = finalEdges.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(gotEdges == expEdges, "maintained edge table diverged")

    val fullEmb = graph.FastRP.embed(finalEdges, dim)
    def embMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val (fm, mm) = (embMap(fullEmb), embMap(m.embedding))
    assert(mm.keySet == fm.keySet, "embedding node sets diverged")
    assert(!mm.contains(removed) && mm.contains(newNode))
    fm.foreach { case (id, v) =>
      v.zip(mm(id)).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-9, s"node $id: full $a vs folded $b") }
    }

    val fullScored = ann.Lsh.scoredPairs(fullEmb, "node_id", "embedding", dim)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val gotScored = m.scoredPairs
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(gotScored.keySet == fullScored.keySet,
      s"pair sets diverged: only-folded=${(gotScored.keySet -- fullScored.keySet).take(5)} " +
        s"only-full=${(fullScored.keySet -- gotScored.keySet).take(5)}")
    fullScored.foreach { case (k, c) =>
      assert(math.abs(c - gotScored(k)) < 1e-12, s"$k") }
  }

  test("KnnIndexMaintainer: _seq ordered batches + single-direction deltas stay ≡ batch recompute") {
    import spark.implicits._
    import graft.streaming.IndexStreams
    val dim = 16
    // tiny both-directions bipartite init
    val edges0 = Seq((1L, 11L, 5.0), (11L, 1L, 5.0), (2L, 11L, 4.0),
      (11L, 2L, 4.0), (2L, 12L, 3.0), (12L, 2L, 3.0))
      .toDF("src", "dst", "weight")

    // (a) ordered changelog: with _seq stamped, the max-_seq row wins —
    // a delete AFTER an upsert in the same micro-batch deletes (the
    // order-free rule would resurrect the edge: upsert beats delete)
    val m = new IndexStreams.KnnIndexMaintainer(edges0, dim)
    m.applyBatch(Seq(
      (1L, 11L, Some(9.0), 1L), // re-weight, single direction (contract
      //                           violation — 11→1 keeps weight 5)
      (1L, 12L, Some(7.0), 1L), (12L, 1L, Some(7.0), 2L), // new edge
      (2L, 12L, Some(8.0), 1L), (2L, 12L, None, 2L)) // upsert THEN delete
      .toDF("src", "dst", "w", "_seq")
      .select(col("src"), col("dst"), col("w").as("weight"), col("_seq")))
    val truth = Seq((1L, 11L, 9.0), (11L, 1L, 5.0), (2L, 11L, 4.0),
      (11L, 2L, 4.0), (12L, 2L, 3.0), (1L, 12L, 7.0), (12L, 1L, 7.0))
    assert(m.currentEdges.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet ==
      truth.toSet, "_seq fold diverged from the ordered-changelog truth")
    // the fold stays ≡ full recompute even though the delta was fed
    // single-direction: the affected closure symmetrises defensively
    val finalEdges = truth.toDF("src", "dst", "weight").localCheckpoint()
    val fullEmb = graph.FastRP.embed(finalEdges, dim)
    val mm = m.embedding.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val fm = fullEmb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(mm.keySet == fm.keySet)
    fm.foreach { case (id, v) => v.zip(mm(id)).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-9, s"node $id stale after 1-dir delta") } }
    val fullScored = ann.Lsh.scoredPairs(fullEmb, "node_id", "embedding", dim)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val gotScored = m.scoredPairs.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(gotScored.keySet == fullScored.keySet, "stale scored pairs")
    fullScored.foreach { case (k, c) =>
      assert(math.abs(c - gotScored(k)) < 1e-12, s"$k") }

    // (b) the same upsert+delete WITHOUT _seq: order-free rule —
    // upsert beats delete, greatest weight wins
    val m2 = new IndexStreams.KnnIndexMaintainer(edges0, dim)
    m2.applyBatch(Seq((2L, 12L, Some(8.0)), (2L, 12L, None),
      (2L, 12L, Some(6.0)))
      .toDF("src", "dst", "weight")
      .select(col("src"), col("dst"), col("weight").cast("double")))
    assert(m2.currentEdges
      .filter(col("src") === 2L && col("dst") === 12L)
      .head().getDouble(2) == 8.0,
      "order-free rule must keep the greatest upsert")
  }

  test("enrichEvents: stream-static join equals the batch join, unknown users pass with nulls") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val users = Seq((1L, "alice", 10L, "A"), (2L, "bob", 20L, "B"))
      .toDF("user_id", "name", "community", "segment")
    val input = MemoryStream[Event]
    val evs = Seq(
      Event(1, ts(5), 1, "click", 1.0), Event(2, ts(10), 2, "view", 2.0),
      Event(3, ts(15), 99, "click", 3.0)) // user 99 missing from the dim
    input.addData(evs: _*)
    val q = EventStreams.enrichEvents(input.toDF(), users)
      .writeStream.format("memory").queryName("enr").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("enr")
        .select("event_id", "name", "community", "segment")
        .collect().map(r => (r.getLong(0),
          Option(r.getString(1)), if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
      assert(got == Set(
        (1L, Some("alice"), 10L), (2L, Some("bob"), 20L), (3L, None, -1L)),
        s"got $got")
      // batch path: identical enrichment
      val batch = EventStreams.enrichEvents(evs.toDF(), users)
        .select("event_id", "name", "community", "segment")
        .collect().map(r => (r.getLong(0),
          Option(r.getString(1)), if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
      assert(batch == got)
    } finally q.stop()
  }

  test("sessionize emits closed sessions after the gap passes the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sess").outputMode("append").start()
    try {
      // user 1: two events 10 min apart (one session), then a 90-min gap
      input.addData(
        Event(1, ts(0), 1, "click", 1.0),
        Event(2, ts(10), 1, "click", 2.0))
      q.processAllAvailable()
      // advance event time far enough that watermark (1h) passes the
      // session timeout (last + 30min = 40min): need watermark > 40min,
      // so max event time > 100min... push to 300min.
      input.addData(Event(3, ts(300), 2, "click", 1.0))
      q.processAllAvailable()
      input.addData(Event(4, ts(400), 2, "click", 1.0))
      q.processAllAvailable()
      val sessions = spark.table("sess")
        .select("user_id", "n_events", "sum_value").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(sessions.contains((1L, 2L, 3.0)), s"got $sessions")
    } finally q.stop()
  }

  test("sessionize places in-watermark out-of-order events like the batch analog") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sess_ooo").outputMode("append").start()
    try {
      // batch 1: user 1 session at [200, 220]; watermark after = 220-60 = 160
      input.addData(Event(1, ts(200), 1, "click", 1.0), Event(2, ts(220), 1, "click", 2.0))
      q.processAllAvailable()
      // batch 2 — both INSIDE the watermark horizon (>= 160):
      //  - ts(195): merges into the session AND lowers its start
      //  - ts(162): 162 < 195-30 → a SEPARATE earlier session
      input.addData(Event(3, ts(195), 1, "click", 4.0), Event(4, ts(162), 1, "click", 8.0))
      q.processAllAvailable()
      // advance watermark far past everything → both sessions close
      input.addData(Event(5, ts(600), 2, "click", 0.0))
      q.processAllAvailable()
      input.addData(Event(6, ts(700), 2, "click", 0.0))
      q.processAllAvailable()
      val sessions = spark.table("sess_ooo").filter(col("user_id") === 1)
        .select("session_start", "session_end", "n_events", "sum_value").collect()
        .map(r => ((r.getTimestamp(0).getTime - 86400000L) / 60000,
          (r.getTimestamp(1).getTime - 86400000L) / 60000, r.getLong(2), r.getDouble(3)))
        .toSet
      // batch truth: [162,162] alone; [195,220] with 3 events
      assert(sessions == Set((162L, 162L, 1L, 8.0), (195L, 220L, 3L, 7.0)), s"got $sessions")
    } finally q.stop()
  }

  test("stream-stream attribution join matches the batch join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val evs = Seq(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(10), 1, "purchase", 9.0),   // click 1 within 30 min
      Event(3, ts(50), 1, "purchase", 5.0),   // click 1 is 50 min old → no match
      Event(4, ts(45), 2, "click", 1.0),
      Event(5, ts(60), 2, "purchase", 7.0),   // click 4 within 30 min
      Event(6, ts(400), 3, "click", 0.0))     // advance watermark
    input.addData(evs: _*)
    val q = EventStreams.attributionJoin(input.toDF())
      .writeStream.format("memory").queryName("attr").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.table("attr")
        .select("purchase_id", "click_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((2L, 1L), (5L, 4L)), s"got $got")
    } finally q.stop()
  }

  test("stream-stream LEFT OUTER attribution: unmatched purchase emits with null click") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val evs = Seq(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(10), 1, "purchase", 9.0),   // click 1 within 30 min
      Event(3, ts(50), 1, "purchase", 5.0),   // click 1 is 50 min old → null-extended
      Event(4, ts(45), 2, "click", 1.0),
      Event(5, ts(60), 2, "purchase", 7.0),   // click 4 within 30 min
      // advance the watermark far enough that the outer side can prove
      // purchase 3 will never match (wm = max ts - 1 h must pass pt)
      Event(6, ts(400), 3, "click", 0.0),
      Event(7, ts(800), 3, "click", 0.0))
    input.addData(evs: _*)
    val q = EventStreams.attributionJoinOuter(input.toDF())
      .writeStream.format("memory").queryName("attr_outer").outputMode("append").start()
    try {
      q.processAllAvailable()
      // the GLOBAL watermark is the MIN across both sides (default
      // multipleWatermarkPolicy), so BOTH the click and purchase legs
      // need late events before null-extended rows can flush; eviction
      // then runs one batch behind the advance
      val advance = Seq(Event(8, ts(1200), 9, "click", 0.0),
        Event(9, ts(1200), 9, "purchase", 0.0),
        Event(10, ts(1600), 9, "click", 0.0),
        Event(11, ts(1600), 9, "purchase", 0.0))
      advance.foreach { e => input.addData(e); q.processAllAvailable() }
      def canon(rows: Array[org.apache.spark.sql.Row]) = rows
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1)))
        .filter(_._1 <= 5L).toSet // the advance purchases stay pending
      val got = canon(spark.table("attr_outer")
        .select(col("purchase_id"), col("click_id")).collect())
      assert(got == Set((2L, 1L), (3L, -1L), (5L, 4L)), s"got $got")
      // batch run of the identical dataflow agrees (nulls included)
      val batch = canon(EventStreams.attributionJoinOuter(
          evs.toDF().unionAll(advance.toDF()))
        .select(col("purchase_id"), col("click_id")).collect())
      assert(batch == got, s"batch $batch != stream $got")
    } finally q.stop()
  }

  test("multimodal feature extraction is deterministic with stable schema") {
    val f1 = multimodal.Multimodal.mediaFeatures(spark, sf)
    assert(f1.columns.toSeq == Seq("doc_id", "modality", "byte_len",
      "width", "height", "n_frames", "feature"))
    val rows = f1.limit(5).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[scala.collection.Seq[Float]]("feature").size == 8)
      assert(r.getAs[Long]("byte_len") > 0)
    }
    val again = multimodal.Multimodal.mediaFeatures(spark, sf).limit(5).collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("multimodal REAL codec: ImageIO BMP bytes decode through the seam with exact histogram") {
    import multimodal.Multimodal
    import spark.implicits._
    // a real 4x2 BMP, encoded in-memory: left half black, right half white
    val img = new java.awt.image.BufferedImage(4, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 4)
      img.setRGB(x, y, if (x < 2) 0x000000 else 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "bmp", bos), "JRE lost its BMP writer")
    val payload = bos.toByteArray
    // mixed batch: one real image, one non-image payload (falls back to
    // the stub) — both through the ONE partition-batched pass
    val media = Seq(
      Multimodal.MediaRow(1L, "image", payload),
      Multimodal.MediaRow(2L, "text", "not an image".getBytes("UTF-8"))).toDS()
    val out = Multimodal.extractFeaturesImage(media).collect()
      .map(f => f.doc_id -> f).toMap
    val real = out(1L)
    assert(real.width == 4 && real.height == 2 && real.n_frames == 1)
    // luminance 0 → bin 0 for 4 px, luminance 255 → bin 7 for 4 px
    assert(real.feature.toSeq == Seq(0.5f, 0f, 0f, 0f, 0f, 0f, 0f, 0.5f),
      s"histogram off: ${real.feature.toSeq}")
    // non-image row survives via the stub with the stub's shape math
    val stub = out(2L)
    assert(stub.byte_len == 12L && stub.width == 16 + 12 % 64)
    // and the pure decoder refuses garbage rather than guessing —
    // both bytes no reader claims AND a claimed-but-truncated payload
    // (a reader that throws mid-decode must yield None, not kill the
    // task)
    assert(Multimodal.decodeImage("garbage".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.decodeImage(payload.take(payload.length / 2)).isEmpty)
  }

  test("nearDupStream: streaming MinHash linkage ≡ batch bucket-min, across trigger boundaries") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.DocStreams
    // docs 1/2/3 share a long common passage (near-dups, id-ordered
    // arrival); 4 is unrelated; 5 repeats doc 1 verbatim
    val base = "the quick brown fox jumps over the lazy dog again and " +
      "again until the sentence is long enough to shingle properly"
    val d1 = (1L, base)
    val d2 = (2L, base + " with a small suffix change")
    val d3 = (3L, "prefix tweak " + base)
    val d4 = (4L, "completely different text about spark catalyst plans " +
      "and whole stage codegen with nothing shared at all here")
    val d5 = (5L, base)
    val input = MemoryStream[(Long, String)]
    val q = DocStreams.nearDupStream(
        input.toDS().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("ndup").outputMode("append").start()
    try {
      input.addData(d1, d2)
      q.processAllAvailable()
      input.addData(d3, d4)
      q.processAllAvailable()
      input.addData(d5)
      q.processAllAvailable()
      val got = spark.table("ndup").as[DocStreams.DupMatch].collect()
        .map(m => (m.doc_id, m.dup_of, m.band_idx)).toSet
      val want = DocStreams.nearDupBatch(
          Seq(d1, d2, d3, d4, d5).toDF("doc_id", "text")).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(got == want, s"stream ${got.size} vs batch ${want.size}: " +
        s"missing=${want -- got} extra=${got -- want}")
      // the semantic content: near-dups link to doc 1, the stranger links nowhere
      assert(want.map(_._1).contains(5L) && want.forall(_._2 == 1L))
      assert(!want.exists(t => t._1 == 4L))
    } finally q.stop()
  }

  test("qualityFilterStream (S13): stateless quality gate ≡ batch filter, across trigger boundaries") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.DocStreams
    // one clean English doc (passes), one too-short (fails the token
    // band), one punctuation-soup (fails the punct ratio), one clean
    // non-English-looking doc (fails lang), one more passer in batch 2
    val d1 = (1L, "the catalyst optimizer rewrites the logical plan before " +
      "spark picks a physical strategy and generates java code for it")
    val d2 = (2L, "too short")
    val d3 = (3L, "what?!?! no;;; way... ?!?!;;;... ?!?!;;;... ?!?!;;;... " +
      "?!?!;;;... ?!?!;;;... ?!?!;;;...")
    val d4 = (4L, "der schnelle braune fuchs springt immer wieder ueber den " +
      "faulen hund bis der satz endlich lang genug ist")
    val d5 = (5L, "a second clean document about shuffle partitions and " +
      "broadcast joins that should also clear the quality threshold easily")
    val input = MemoryStream[(Long, String)]
    val q = DocStreams.qualityFilterStream(input.toDS().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("qfs").outputMode("append").start()
    try {
      input.addData(d1, d2, d3)
      q.processAllAvailable()
      input.addData(d4, d5)
      q.processAllAvailable()
      val got = spark.table("qfs").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      val want = graft.text.TextOps.qualityFilterOf(
          Seq(d1, d2, d3, d4, d5).toDF("doc_id", "text")).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      assert(got == want, s"stream $got vs batch $want")
      // semantic content: the clean English docs pass, the rest are gated
      assert(got.map(_._1) == Set(1L, 5L), s"got $got")
    } finally q.stop()
  }

  test("qualityClassifierStream (S15): stateless model scorer ≡ batch, across triggers") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.DocStreams
    val docs = Seq(
      (1L, "the catalyst optimizer rewrites the logical plan before " +
        "spark picks a physical strategy and generates java code for it"),
      (2L, "too short"),
      (3L, "numbers 123 456 789 000 111 222 333 444 555 666 777 888"))
    val input = MemoryStream[(Long, String)]
    val q = DocStreams.qualityClassifierStream(
        input.toDS().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("qcs").outputMode("append").start()
    try {
      input.addData(docs(0), docs(1))
      q.processAllAvailable()
      input.addData(docs(2))
      q.processAllAvailable()
      val got = spark.table("qcs").collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).toSet
      val want = graft.text.TextOps.qualityClassifierOf(
          docs.toDF("doc_id", "text")).collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).toSet
      assert(got == want, s"stream $got vs batch $want")
      assert(got.size == 3, "stateless scorer emits every doc with its score")
    } finally q.stop()
  }

  test("gopherRulesStream (S16): stateless named-rule report ≡ batch, across triggers") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import graft.streaming.DocStreams
    val docs = Seq(
      (1L, (1 to 58).map(i => s"word$i").mkString(" ") + " the of"),
      (2L, "tiny doc"),
      (3L, (1 to 60).map(i => s"$i").mkString(" ")))
    val input = MemoryStream[(Long, String)]
    val q = DocStreams.gopherRulesStream(input.toDS().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("gps").outputMode("append").start()
    try {
      input.addData(docs(0))
      q.processAllAvailable()
      input.addData(docs(1), docs(2))
      q.processAllAvailable()
      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getLong(1), r.getAs[Boolean]("keep"),
          r.getAs[Boolean]("rule_alpha"), r.getAs[Boolean]("rule_stops"))
      val got = spark.table("gps").collect().map(key).toSet
      val want = graft.text.TextOps.gopherRulesOf(
          docs.toDF("doc_id", "text")).collect().map(key).toSet
      assert(got == want, s"stream $got vs batch $want")
      assert(got.size == 3)
      // semantic content: doc 1 passes everything, doc 3 is all-digit
      assert(got.exists(t => t._1 == 1L && t._3), "doc 1 must keep")
      assert(got.exists(t => t._1 == 3L && !t._4), "doc 3 fails alpha")
    } finally q.stop()
  }
}
