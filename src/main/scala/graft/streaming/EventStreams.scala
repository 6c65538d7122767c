package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming shapes over the events stream. The same
  * transformations run on a batch DataFrame (tested against the batch
  * analogs in [[graft.olap.Olap]]) or a `readStream` source — Spark's
  * unified API keeps one code path for both.
  *
  * At scale: the windowed aggregate is a streaming stateful agg keyed on
  * (window, event_type) — state size bounded by watermark eviction; the
  * sessionizer keys state by user_id with event-time timeout, so state is
  * O(active users), not O(events).
  */
object EventStreams {

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  case class Session(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long, sum_value: Double)

  case class SessionState(start: Long, last: Long, n: Long, total: Double)

  /** State for [[sessionize]]: the user's OPEN session intervals,
    * disjoint and kept sorted by start. More than one can be open at
    * once when events arrive out of order across micro-batches. */
  case class SessionBuf(sessions: Seq[SessionState])

  /** Tumbling 1-hour windowed aggregation with a 10-minute watermark.
    * Works on either a static or streaming events DataFrame. */
  def windowedCounts(events: DataFrame, windowLen: String = "1 hour",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        approx_count_distinct(col("user_id")).as("n_users_approx"),
        sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("n_users_approx"), col("sum_value"))

  /** SLIDING-window aggregation (1-hour window every 15 minutes): each
    * event lands in windowLen/slide overlapping windows — Spark expands
    * the row per window, then the stateful agg is identical to the
    * tumbling case, with state bounded by watermark eviction the same
    * way. The batch run of this same dataflow is its own oracle
    * (StreamingSpec proves stream ≡ batch). */
  def slidingCounts(events: DataFrame, windowLen: String = "1 hour",
      slide: String = "15 minutes", watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen, slide), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Gap-based sessionization (30-minute inactivity) with
    * flatMapGroupsWithState + event-time timeout. State per user is the
    * set of OPEN session intervals (not just the latest): an event that
    * arrives out of order but inside the watermark horizon merges into
    * the interval it belongs to — or starts a separate earlier session —
    * exactly as the batch analog ([[graft.olap.Olap.eventsSessionize]])
    * would place it. A session is emitted once the watermark passes its
    * end + gap (no in-horizon event can extend it any more). */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapMs = gapMinutes * 60 * 1000L

    def merge(ivs: Vector[SessionState], t: Long, v: Double): Vector[SessionState] = {
      // insert the event, then coalesce any neighbours within the gap
      val joined = ivs.filter(s => t >= s.start - gapMs && t <= s.last + gapMs)
      val rest = ivs.filterNot(s => t >= s.start - gapMs && t <= s.last + gapMs)
      val merged = joined.foldLeft(SessionState(t, t, 1L, v)) { (a, s) =>
        SessionState(math.min(a.start, s.start), math.max(a.last, s.last),
          a.n + s.n, a.total + s.total)
      }
      (rest :+ merged).sortBy(_.start)
    }

    def fn(userId: Long, rows: Iterator[Event],
        state: GroupState[SessionBuf]): Iterator[Session] = {
      var ivs = state.getOption.map(_.sessions.toVector).getOrElse(Vector.empty)
      if (!state.hasTimedOut) {
        rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
          ivs = merge(ivs, e.ts.getTime, e.value)
        }
      }
      // final = the watermark has passed end + gap; no in-horizon event
      // can extend or prepend to it (any future event has ts >= wm)
      val wm = state.getCurrentWatermarkMs()
      val (closed, open) = ivs.partition(s => s.last + gapMs < wm)
      if (open.isEmpty) state.remove()
      else {
        state.update(SessionBuf(open))
        state.setTimeoutTimestamp(math.max(wm + 1, open.map(_.last + gapMs).min))
      }
      closed.sortBy(_.start).iterator.map(s =>
        Session(userId, new java.sql.Timestamp(s.start),
          new java.sql.Timestamp(s.last), s.n, s.total))
    }

    events
      .withWatermark("ts", "1 hour")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(fn)
  }

  /** Stream-stream interval join: purchases attributed to same-user
    * clicks in the preceding `windowMinutes`. Both sides carry
    * watermarks so Spark can bound the join state; the time-range
    * predicate gives the state eviction horizon. Batch analog (same
    * semantics, oracle-checked): [[graft.olap.Olap.eventsAttribution]]. */
  def attributionJoin(events: org.apache.spark.sql.DataFrame,
      windowMinutes: Int = 30): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("pt"))
      .withWatermark("pt", "1 hour")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("ct"))
      .withWatermark("ct", "1 hour")
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("ct") <= col("pt") &&
        col("ct") >= col("pt") - expr(s"INTERVAL $windowMinutes MINUTES"),
      "inner")
      .select(col("purchase_id"), col("p_user").as("user_id"), col("click_id"),
        col("pt"), col("ct"))
  }

  /** Stream-stream LEFT OUTER interval join: every purchase emits, with
    * click columns null when no same-user click preceded it in the
    * window. The outer side is the semantically hard part of streaming
    * joins — a null-extended row can only be emitted once the watermark
    * proves no matching click can still arrive, so results trail the
    * inner join by the watermark delay; state stays bounded by the same
    * horizon. Batch analog: run the identical dataflow on a static
    * frame (spec-proved equal). */
  def attributionJoinOuter(events: org.apache.spark.sql.DataFrame,
      windowMinutes: Int = 30): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("pt"))
      .withWatermark("pt", "1 hour")
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("ct"))
      .withWatermark("ct", "1 hour")
    purchases.join(clicks,
      col("p_user") === col("c_user") &&
        col("ct") <= col("pt") &&
        col("ct") >= col("pt") - expr(s"INTERVAL $windowMinutes MINUTES"),
      "left_outer")
      .select(col("purchase_id"), col("p_user").as("user_id"), col("click_id"),
        col("pt"), col("ct"))
  }

  /** Streaming exact-dedup: drop repeated event_ids inside the
    * watermark horizon (at-least-once source → exactly-once sink
    * semantics). State is bounded by the watermark — the streaming
    * member of the dedup suite. */
  def dedupStream(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  case class RatingEvent(user_id: Long, book_id: Long, rating: Long)
  case class RatingUpsert(user_id: Long, book_id: Long, rating: Long)

  /** Streaming MERGE of rating events — the streaming twin of the
    * reference's batch load (`data/load_data.py:48-61`: MERGE edge, SET
    * max rating) and of [[graft.graph.RatingsGraph.ratings]]: per
    * (user, book) keep the MAX rating seen, emitting an upsert row only
    * when the max improves (CDC-style append stream a sink can apply
    * idempotently). State per key is one long; at 100 TB state is
    * O(live user–book pairs) and would sit on a state store with
    * RocksDB + TTL for retired pairs. */
  def ratingsUpserts(ratingEvents: Dataset[RatingEvent]): Dataset[RatingUpsert] = {
    import ratingEvents.sparkSession.implicits._

    def fn(key: (Long, Long), rows: Iterator[RatingEvent],
        state: GroupState[Long]): Iterator[RatingUpsert] = {
      val incoming = rows.map(_.rating).filter(_ > 0).toSeq
      if (incoming.isEmpty) return Iterator.empty
      val newMax = incoming.max
      val cur = state.getOption.getOrElse(Long.MinValue)
      if (newMax > cur) {
        state.update(newMax)
        Iterator.single(RatingUpsert(key._1, key._2, newMax))
      } else Iterator.empty
    }

    ratingEvents
      .groupByKey(r => (r.user_id, r.book_id))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }

  /** Gap sessionization via Spark's NATIVE session_window aggregation —
    * the declarative twin of [[sessionize]]: built-in merging session
    * state (backed by the state store, watermark-evicted) instead of a
    * hand-rolled flatMapGroupsWithState buffer. Prefer this form when
    * per-session output only needs aggregates the engine can merge
    * (counts/sums/min/max); drop to [[sessionize]] only for custom
    * in-session logic. Window end = last event + gap (the native
    * convention; the batch analog's session_end = last event). */
  def sessionWindowCounts(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("window_end"),
        col("n_events"), col("sum_value"))

  case class FunnelState(view: Long, click: Long, purchase: Long)
  case class FunnelStage(user_id: Long, stage: Int)

  /** Streaming conversion funnel — the stateful twin of
    * [[graft.olap.Olap.eventsFunnel]]: per user, track the FIRST view /
    * click / purchase second and emit the user's funnel stage whenever
    * it changes (0 = none, 1 = viewed, 2 = clicked after first view,
    * 3 = purchased after that click — the batch operator's exact
    * sequencing rule, at the same epoch-second grain). The output is a
    * change-log: late events can move a first-seen time earlier and
    * legitimately DEMOTE a stage (an earlier click no longer follows
    * the first view), so consumers take the LAST stage per user, and
    * the final state equals the batch formula over the same events.
    * State is three longs per user — O(active users), no timeline. */
  def funnelStages(events: Dataset[Event]): Dataset[FunnelStage] = {
    import events.sparkSession.implicits._
    val none = Long.MaxValue

    def stageOf(s: FunnelState): Int =
      if (s.view == none) 0
      else if (s.click <= s.view || s.click == none) 1
      else if (s.purchase <= s.click || s.purchase == none) 2
      else 3

    def fn(user: Long, rows: Iterator[Event],
        state: GroupState[FunnelState]): Iterator[FunnelStage] = {
      var st = state.getOption.getOrElse(FunnelState(none, none, none))
      val before = stageOf(st)
      rows.foreach { e =>
        val sec = Math.floorDiv(e.ts.getTime, 1000L) // floor, not truncate: batch `cast(ts as long)` parity for pre-epoch ts
        st = e.event_type match {
          case "view"     => st.copy(view = math.min(st.view, sec))
          case "click"    => st.copy(click = math.min(st.click, sec))
          case "purchase" => st.copy(purchase = math.min(st.purchase, sec))
          case _          => st
        }
      }
      state.update(st)
      val after = stageOf(st)
      if (after != before) Iterator.single(FunnelStage(user, after)) else Iterator.empty
    }

    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }

  /** Stream-static enrichment join: attach user dimension attributes to
    * the event stream. The static side is a plain batch DataFrame —
    * Spark re-plans it per micro-batch (picking up slowly-changing-dim
    * updates between batches); size-based planning broadcasts a small
    * dim so the stream side never shuffles, and degrades to a shuffle
    * join for a dim too large to broadcast (no forced hint — a forced
    * broadcast would OOM exactly at the scale the operator targets).
    * With a LEFT join, events whose user is missing from the dim pass
    * through with nulls instead of silently dropping. The canonical
    * "events → enriched events" hop of every streaming warehouse
    * ingest. */
  def enrichEvents(events: DataFrame, users: DataFrame,
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .join(users.select(col("user_id"), col("name"),
        col("community"), col("segment")), Seq("user_id"), "left")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"), col("name"), col("community"), col("segment"))

  /** Streaming maintenance of the ratings SILVER table: every
    * micro-batch of rating events folds into the running table through
    * the associative batch MERGE
    * ([[graft.graph.RatingsGraph.mergeRatings]], T8) inside
    * foreachBatch — the operational loop that keeps a silver table
    * current without rebuilds, closing the ring between the streaming
    * upsert shape (S6) and the batch incremental maintenance (T8).
    * `localCheckpoint` truncates the fold's growing lineage each batch;
    * at 100 TB the analog is MERGE INTO a transactional bucketed table
    * — the fold and the associativity argument are identical.
    * `applyBatch` is the foreachBatch body and is also directly
    * callable for batch backfills. */
  final class RatingsSilverMaintainer(init: DataFrame) {
    @volatile private var table: DataFrame = init.localCheckpoint()
    def current: DataFrame = table
    def applyBatch(batch: DataFrame): Unit = synchronized {
      table = graft.graph.RatingsGraph.mergeRatings(table, batch).localCheckpoint()
    }
    /** Wire a rating-event stream into the maintainer; caller starts it. */
    def attach(stream: DataFrame)
        : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
      stream.writeStream
        .foreachBatch((batch: DataFrame, _: Long) => applyBatch(batch))
  }

  /** Convenience: the events table of a sf dir as a typed Dataset. */
  def eventsDataset(spark: SparkSession, dir: String): Dataset[Event] = {
    import spark.implicits._
    graft.Tables.events(spark, dir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event]
  }
}
