package graft.olap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables._

/** Core OLAP surface on the TPC-H-shaped testdata. These are the engine's
  * bread-and-butter relational operators (grouped aggregation, multi-way
  * joins, top-k, window functions, time bucketing, sessionization) — the
  * same shapes the reference's Cypher queries reduce to.
  *
  * Oracle-parity discipline: every monetary sum is accumulated as
  * DECIMAL (order-independent, exact) after a per-row double compute,
  * then surfaced as double, so shuffle order can never flip a hash
  * compare against DuckDB.
  */
object Olap {

  private def dec(c: org.apache.spark.sql.Column) = c.cast("decimal(24,4)")

  // Exact decimal money algebra: inputs have <=2 decimals, so casting the
  // raw columns (not derived doubles) to decimal is exact, and products /
  // sums of decimals are exact and order-independent — bit-identical to
  // DuckDB regardless of shuffle order or rounding mode.
  private def price  = col("l_extendedprice").cast("decimal(14,2)")
  private def disc1  = lit(1.0).cast("decimal(4,2)") - col("l_discount").cast("decimal(4,2)")
  private def tax1   = lit(1.0).cast("decimal(4,2)") + col("l_tax").cast("decimal(4,2)")

  /** TPC-H Q1 shape: pricing summary report. */
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(price * disc1).cast("double").as("sum_disc_price"),
        sum(price * disc1 * tax1).cast("double").as("sum_charge"),
        (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** TPC-H Q3 shape: top-10 unshipped orders by revenue for a segment. */
  def q3TopkJoin(spark: SparkSession, dir: String): DataFrame = {
    val cust = customer(spark, dir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val ord = orders(spark, dir)
      .filter(col("o_orderdate") < lit("1995-03-15").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
    val li = lineitem(spark, dir)
      .filter(col("l_shipdate") > lit("1995-03-15").cast("timestamp"))
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(sum(price * disc1).cast("double").as("revenue"))
      .select(col("l_orderkey"), col("revenue"), col("o_orderdate"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5 shape: revenue by nation for one region (6-way star join).
    * Dimensions (region, nation, supplier) broadcast; the fact join
    * orders⋈lineitem shuffles on orderkey.
    * Note: testdata has no s_suppkey↔customer nation alignment guarantee,
    * so the Q5 `c_nationkey = s_nationkey` clause is kept — it simply
    * filters. */
  def q5Multijoin(spark: SparkSession, dir: String): DataFrame = {
    val reg = region(spark, dir).filter(col("r_name") === "ASIA").select(col("r_regionkey"))
    val nat = nation(spark, dir).join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val cust = customer(spark, dir).select(col("c_custkey"), col("c_nationkey"))
    val sup = supplier(spark, dir).select(col("s_suppkey"), col("s_nationkey"))
    val ord = orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1994-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    val li = lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(price * disc1).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Window functions: top-3 orders per customer by total price, with the
    * gap to the previous order (rank + lag in one pass). */
  def windowRank(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rk", row_number().over(w))
      .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
      .filter(col("rk") <= 3)
      .orderBy(col("o_custkey"), col("rk"))
  }

  /** Tumbling-window (1 h) aggregation over the event stream — the batch
    * analog of [[graft.streaming.EventStreams.windowedCounts]]; same
    * grouping, same outputs. */
  def eventsWindowedAgg(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(dec(col("value"))).cast("double").as("sum_value"))
      .orderBy(col("hour"), col("event_type"))

  /** Per-type z-score anomaly scan: events whose value sits ≥ `z`
    * sample standard deviations from their event-type mean — the
    * telemetry outlier filter next to [[eventsWindowedAgg]].
    *
    * Float discipline (the reason this has an EXACT oracle despite
    * being statistics over doubles): mean and variance come from exact
    * DECIMAL sums (n, Σv, Σv² — values have ≤ 4 decimals so the casts
    * are exact; (18,4)² = (37,8) fits both engines' 38-digit cap), and
    * every double op after that is SCALAR math on identical operands in
    * identical order — deterministic IEEE, no reduction-order variance.
    * stddev_samp/avg would hash-flake on partial-aggregation order.
    *
    * Scale shape: one map-side-combining aggregate (|event_types| rows),
    * broadcast back over the stream — no event-row shuffle at all. */
  def eventsAnomaly(spark: SparkSession, dir: String, z: Double = 3.0): DataFrame =
    eventsAnomalyOf(events(spark, dir), z)

  /** [[eventsAnomaly]] over any (event_id, event_type, value) frame. */
  def eventsAnomalyOf(e: DataFrame, z: Double): DataFrame = {
    val d = col("value").cast("decimal(18,4)")
    val stats = e.groupBy(col("event_type")).agg(
        count(lit(1)).as("n"), sum(d).as("sv"), sum(d * d).as("svv"))
      // n > 1 guard: a singleton type gives (n-1)=0 → std NaN, and NaN
      // compares greater-than under Spark ordering, so both filters below
      // would pass and emit a NaN z_score DuckDB won't reproduce.
      .filter(col("n") > 1)
      .select(col("event_type"),
        (col("sv").cast("double") / col("n")).as("mean"),
        sqrt((col("svv").cast("double")
          - col("sv").cast("double") * col("sv").cast("double") / col("n"))
          / (col("n") - 1)).as("std"))
    e.join(broadcast(stats), Seq("event_type"))
      .filter(col("std") > 0 &&
        abs((col("value") - col("mean")) / col("std")) >= z)
      .select(col("event_id"), col("event_type"), col("value"),
        round((col("value") - col("mean")) / col("std"), 6).as("z_score"))
      .orderBy(col("event_id"))
  }

  /** Multi-level aggregation (ROLLUP): quantity/revenue totals at
    * (returnflag, linestatus), (returnflag), and grand-total levels in
    * one pass — Spark plans a single Expand + aggregate. */
  def q1Rollup(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(price * disc1).cast("double").as("sum_disc_price"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first)

  /** Pivot / reshape: one row per user with event-type counts as
    * columns (conditional aggregation — the scale-safe pivot with a
    * known column set; `DataFrame.pivot` would infer it at plan time). */
  def eventsPivot(spark: SparkSession, dir: String): DataFrame = {
    val types = Seq("click", "purchase", "signup", "error", "view")
    events(spark, dir)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_total"),
        types.map(t =>
          sum(when(col("event_type") === t, 1L).otherwise(0L)).as(s"n_$t")): _*)
      .orderBy(col("user_id"))
  }

  /** Sliding-frame window aggregation: per-user moving average of the
    * last 5 event values (ordered by time), plus the running total. */
  def eventsRolling(spark: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("moving_avg_5",
        round(avg(col("value")).over(byUser.rowsBetween(-4, Window.currentRow)), 4))
      .withColumn("running_total",
        sum(dec(col("value"))).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("double"))
      .select(col("user_id"), col("event_id"), col("moving_avg_5"), col("running_total"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Exponentially-weighted moving average per event_type — the
    * time-series smoothing staple (pandas `ewm(adjust=True)`), with the
    * unbounded history TRUNCATED at `lags` terms so the state is a
    * fixed register file instead of a recursion: at α=0.3 the dropped
    * tail weighs (0.7)^16 ≈ 0.3%. The 16-term LAG chain is one
    * partitioned window (single WindowExec, codegen'd scalar sum in
    * fixed syntactic order — deterministic and SQL-replayable; the
    * weights inline as round-trip-exact double literals in BOTH
    * engines). Partial windows normalize by the weights actually
    * present, exactly like pandas' adjust=True. */
  def eventsEwmaOf(ev: DataFrame, alpha: Double = 0.3,
      lags: Int = 16): DataFrame = {
    val byType = Window.partitionBy(col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    val w = (0 until lags).map(j => math.pow(1 - alpha, j))
    val terms = (0 until lags).map { j =>
      val l = lag(col("value"), j).over(byType)
      (when(l.isNotNull, l * lit(w(j))).otherwise(lit(0.0)),
        when(l.isNotNull, lit(w(j))).otherwise(lit(0.0)))
    }
    val num = terms.map(_._1).reduce(_ + _)
    val den = terms.map(_._2).reduce(_ + _)
    ev.select(col("event_id"), col("event_type"), col("ts"), col("value"))
      .withColumn("ewma", round(num / den, 6))
      .select(col("event_id"), col("event_type"), col("ewma"))
      .orderBy(col("event_id"))
  }

  def eventsEwma(spark: SparkSession, dir: String): DataFrame =
    eventsEwmaOf(events(spark, dir))

  /** Pearson correlation matrix over the lineitem measures — the
    * feature-correlation report every tabular pipeline starts with.
    * EXACT cross-engine: all sums (Σx, Σx², Σxy) accumulate in DECIMAL
    * (associative integer arithmetic — no float reduction anywhere),
    * then each correlation is one scalar double chain over the exact
    * sums, written in the same operation order as the oracle. One scan,
    * one aggregate row, the pair list is driver-side literals. */
  def lineitemCorr(spark: SparkSession, dir: String): DataFrame = {
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    // decimal(12,2) keeps the pairwise products inside decimal(38,·)
    // (a (24,4)² product would overflow 38 and trigger Spark's
    // precision-loss rounding — no longer exact); every source column
    // has ≤ 2 decimals, so the cast itself is exact
    val li = lineitem(spark, dir)
      .select(cols.map(c => col(c).cast("decimal(12,2)").as(c)): _*)
    val aggs = Seq(count(lit(1)).as("n")) ++
      cols.map(c => sum(col(c)).as(s"s_$c")) ++
      (for { a <- cols; b <- cols if a <= b }
        yield sum(col(a) * col(b)).as(s"p_${a}_$b"))
    val r = li.agg(aggs.head, aggs.tail: _*).head()
    val n = r.getLong(0).toDouble
    def s(c: String) = r.getDecimal(r.fieldIndex(s"s_$c")).doubleValue
    def p(a: String, b: String) = {
      val (x, y) = if (a <= b) (a, b) else (b, a)
      r.getDecimal(r.fieldIndex(s"p_${x}_$y")).doubleValue
    }
    val rows = for { a <- cols; b <- cols if a < b } yield {
      val cov = n * p(a, b) - s(a) * s(b)
      val va = n * p(a, a) - s(a) * s(a)
      val vb = n * p(b, b) - s(b) * s(b)
      val corr = cov / (math.sqrt(va) * math.sqrt(vb))
      (a, b, BigDecimal(corr).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)
    }
    import spark.implicits._
    rows.toDF("col_a", "col_b", "corr").orderBy(col("col_a"), col("col_b"))
  }

  /** Higher-moment profile per event_type: mean, variance, skewness,
    * excess kurtosis from the four power sums (one scan, one
    * aggregate). The double power sums carry ~1e-15 relative reduction
    * drift; every reported statistic is a RATIO of them (O(1)
    * magnitude), so the 1e-6 rounding absorbs it. */
  def eventsMoments(spark: SparkSession, dir: String): DataFrame = {
    val v = col("value").cast("double")
    events(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(v).as("s1"), sum(v * v).as("s2"),
        sum(v * v * v).as("s3"), sum(v * v * v * v).as("s4"))
      .select(col("event_type"), col("n"),
        round(col("s1") / col("n"), 6).as("mean"),
        round(col("s2") / col("n") - (col("s1") / col("n")) * (col("s1") / col("n")), 6)
          .as("variance"),
        round((col("s3") / col("n")
            - lit(3.0) * (col("s1") / col("n")) * (col("s2") / col("n"))
            + lit(2.0) * (col("s1") / col("n")) * (col("s1") / col("n"))
              * (col("s1") / col("n")))
          / pow(col("s2") / col("n") - (col("s1") / col("n")) * (col("s1") / col("n")),
            lit(1.5)), 6).as("skewness"),
        round((col("s4") / col("n")
            - lit(4.0) * (col("s1") / col("n")) * (col("s3") / col("n"))
            + lit(6.0) * (col("s1") / col("n")) * (col("s1") / col("n"))
              * (col("s2") / col("n"))
            - lit(3.0) * (col("s1") / col("n")) * (col("s1") / col("n"))
              * (col("s1") / col("n")) * (col("s1") / col("n")))
          / ((col("s2") / col("n") - (col("s1") / col("n")) * (col("s1") / col("n")))
            * (col("s2") / col("n") - (col("s1") / col("n")) * (col("s1") / col("n"))))
          - lit(3.0), 6).as("kurtosis"))
      .orderBy(col("event_type"))
  }

  /** Correlated-subquery filter (TPC-H Q17 shape): lineitems whose
    * quantity is below 20% of their part's average quantity —
    * decorrelated into a join against the per-part aggregate. */
  def q17Correlated(spark: SparkSession, dir: String): DataFrame = {
    val perPart = lineitem(spark, dir)
      .groupBy(col("l_partkey"))
      .agg((sum(dec(col("l_quantity"))).cast("double") / count(lit(1)) * 0.2)
        .as("qty_threshold"))
    lineitem(spark, dir)
      .select(col("l_partkey"), col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      .join(perPart, Seq("l_partkey"))
      .filter(col("l_quantity") < col("qty_threshold"))
      .select(col("l_partkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_quantity"), round(col("qty_threshold"), 6).as("qty_threshold"))
      .orderBy(col("l_partkey"), col("l_orderkey"), col("l_linenumber"))
  }

  /** Semi-structured extraction: parse the JSON `props` payload carried
    * by every event and aggregate a typed field out of it — the
    * schema-on-read path every telemetry pipeline needs. `get_json_object`
    * is codegen'd (Jackson under the hood); for a fixed schema at scale,
    * `from_json` with an explicit StructType lets Catalyst prune. */
  def eventsJsonExtract(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("bigint").as("k"))
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("event_type"))

  /** As-of join: for every event, the customer's most recent order at or
    * before the event time. Spark has no native ASOF JOIN; the scalable
    * composition is the union-of-streams trick — tag both inputs, sort
    * per user by (time, order-first), and carry the last seen order
    * forward with `last_value(ignoreNulls)`. One shuffle on user id, no
    * range explosion (vs the naive inequality join, which is O(n×m) per
    * user). DuckDB's native ASOF JOIN is the oracle. */
  def asofJoinEventsOrders(spark: SparkSession, dir: String): DataFrame = {
    // dedup orders to one per (customer, date) — max orderkey — so the
    // as-of pick at equal timestamps is well-defined in both engines
    val ord = orders(spark, dir)
      .groupBy(col("o_custkey"), col("o_orderdate"))
      .agg(max(col("o_orderkey")).as("o_orderkey"))
      .select(col("o_custkey").as("user_id"), col("o_orderdate").as("t"),
        col("o_orderkey"), lit(1).as("is_order"),
        lit(null).cast("bigint").as("event_id"))
    val ev = events(spark, dir)
      .select(col("user_id"), col("ts").as("t"),
        lit(null).cast("bigint").as("o_orderkey"), lit(0).as("is_order"),
        col("event_id"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("t"), col("is_order").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ord.unionAll(ev)
      .withColumn("last_order", last(col("o_orderkey"), ignoreNulls = true).over(w))
      .filter(col("is_order") === 0)
      .select(col("event_id"), col("user_id"), col("last_order").as("o_orderkey"))
      .orderBy(col("event_id"))
  }

  /** Argmin-per-group (TPC-H Q2 shape): for every part, the lineitem
    * achieving the minimum extended price (ties → smallest orderkey,
    * then linenumber). One hash aggregate on a lexicographic struct
    * min — the tie-break total order lives INSIDE the struct, so no
    * per-partition sort is ever paid (a window row_number() gets the
    * same answer at the price of a full sort shuffle; min gets
    * map-side partials for free). */
  def minPricePerPart(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir)
      .select(col("l_partkey"), col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .groupBy(col("l_partkey"))
      .agg(min(struct(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))).as("m"))
      .select(col("l_partkey").as("book_id"), col("m.l_orderkey").as("min_orderkey"),
        col("m.l_extendedprice").as("min_price"))
      .orderBy(col("book_id"))

  /** Click→purchase attribution: for every purchase, the number of
    * clicks by the same user in the preceding 30 minutes, and the most
    * recent such click. The batch analog of the stream-stream interval
    * join ([[graft.streaming.EventStreams.attributionJoin]]).
    * Timestamps are second-truncated before comparison so the µs-vs-ns
    * parquet precision difference can't flip boundary pairs. */
  def eventsAttribution(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        date_trunc("second", col("ts")).as("t"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("t").as("pt"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("t").as("ct"))
    purchases
      .join(clicks,
        purchases("user_id") === clicks("user_id") &&
          col("ct") <= col("pt") &&
          col("ct") >= col("pt") - expr("INTERVAL 30 MINUTES"),
        "left")
      .groupBy(col("purchase_id"), purchases("user_id").as("user_id"))
      .agg(count(col("click_id")).as("n_clicks"),
        // the LATEST click by time (tie → highest id), not max(id):
        // ids are not guaranteed to be timestamp-ordered
        max_by(col("click_id"), struct(col("ct"), col("click_id"))).as("last_click_id"))
      .orderBy(col("purchase_id"))
  }

  /** Gap-based sessionization (30-min inactivity) via lag + running sum —
    * the batch analog of the flatMapGroupsWithState streaming session
    * operator. Emits one row per (user, session). */
  def eventsSessionize(spark: SparkSession, dir: String, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          col("ts").cast("double") - col("prev_ts").cast("double") > gapMinutes * 60L, 1L)
          .otherwise(0L))
      .withColumn("session_idx", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(dec(col("value"))).cast("double").as("sum_value"),
        date_trunc("second", min(col("ts"))).as("session_start"),
        date_trunc("second", max(col("ts"))).as("session_end"))
      .orderBy(col("user_id"), col("session_idx"))
  }

  /** SCD2 (type-2 slowly-changing-dimension) build from the event log —
    * the warehouse-canonical versioned dimension: each user's
    * event_type stream collapses to its CHANGE rows (lag-detect), every
    * change opens a version valid [valid_from, valid_to) with the next
    * change's timestamp as its close, the open version carried at a
    * HIGH DATE (NULL-free — the high-date sentinel IS the warehouse
    * idiom, and it keeps the hash compare away from NULL-vs-NaT
    * canonicalisation). The sentinel is 2100-01-01, not the classic
    * 9999-12-31: a year-9999 µs timestamp overflows the nanosecond
    * int64 epoch (pandas/Arrow ns readers wrap it to year 1816), and
    * a dimension row nobody can read back is not a dimension row. Versions are numbered per user; deterministic
    * total order (ts, event_id) everywhere, timestamps truncated to
    * seconds like the sessionizer. Two keyed windows + one filter, one
    * shuffle on user_id — the MERGE-free, scan-once SCD2 build that
    * replaces per-row upserts at warehouse scale. */
  def eventsScd2(spark: SparkSession, dir: String): DataFrame =
    eventsScd2Of(events(spark, dir))

  /** [[eventsScd2]] over ANY (user_id, event_type, ts, event_id)
    * frame — the fixture/stream-composable form of the siblings.
    *
    * Validity boundaries are second-truncated, so several changes inside
    * one second would mint a ZERO-WIDTH version (valid_from == valid_to)
    * that no `valid_from <= t < valid_to` lookup can ever return. Change
    * rows are therefore coalesced per second: keep the LAST change in
    * each (user, second) — the state the second ends on — then drop
    * changes the coalescing made redundant (type equal to the surviving
    * predecessor's; ONE lag pass suffices because a dropped row's type
    * always equals its predecessor's, so equal runs collapse
    * transitively). All passes share one partitionBy(user_id) ordering,
    * so the whole build still rides a single user-keyed shuffle. */
  def eventsScd2Of(ev: DataFrame): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val changes = ev
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
      .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      .withColumn("sec", date_trunc("second", col("ts")))
    val lastInSecond = changes
      .withColumn("nsec", lead(col("sec"), 1).over(byUser))
      .filter(col("nsec").isNull || col("nsec") =!= col("sec"))
    val deduped = lastInSecond
      .withColumn("prev_kept", lag(col("event_type"), 1).over(byUser))
      .filter(col("prev_kept").isNull || col("prev_kept") =!= col("event_type"))
    deduped
      .withColumn("version", row_number().over(byUser).cast("bigint"))
      .withColumn("valid_from", col("sec"))
      .withColumn("valid_to",
        coalesce(lead(col("sec"), 1).over(byUser),
          to_timestamp(lit("2100-01-01 00:00:00"))))
      .withColumn("is_current", lead(col("sec"), 1).over(byUser).isNull)
      .select(col("user_id"), col("version"), col("event_type"),
        col("valid_from"), col("valid_to"), col("is_current"))
      .orderBy(col("user_id"), col("version"))
  }

  /** T14 — INCREMENTAL SCD2 maintenance: fold an APPEND-ONLY event
    * delta into an existing [[eventsScd2Of]] dimension without
    * rebuilding it. Blast radius = the delta's users only: untouched
    * users pass through by anti-join; for touched users the delta's
    * change rows are detected with the lag chain SEEDED by the user's
    * current version's type (the louvainWarmStart recipe — a synthetic
    * seed row that is dropped after the lag), coalesced per second like
    * the full rebuild, new versions continue the user's numbering, and
    * the previously-current row closes at the first new change's second.
    *
    * The append-only contract (require'd — ONE eager count job per call,
    * by design: a silent history rewrite is worse than a job):
    *  - with `watermark` = a (user_id, hwm) frame carrying the MAX BASE
    *    EVENT timestamp per user (untruncated), the contract is
    *    airtight: every delta event must land in a strictly LATER second
    *    than the user's last base event (a same-second delta would
    *    re-coalesce with it under a full rebuild), and merge ≡ rebuild.
    *  - without it, the fallback guard compares against the open
    *    version's second-truncated `valid_from` — it CANNOT see a delta
    *    landing between the open version's start and the user's last
    *    base event (base A@t1,A@t5 + delta B@t3 passes, yet diverges
    *    from the rebuild). Callers that can produce the watermark
    *    should; the dimension alone does not carry enough history.
    *
    * No broadcast hints: the delta-derived sides (`current`,
    * `firstChange`) are "delta users"-sized — at 100 TB with a day-scale
    * delta that is NOT provably broadcast-sized, so size-based auto
    * selection (AQE) picks the strategy (§4 rule: hint only provably
    * small sides). The spec pins the no-hint plan under
    * autoBroadcastJoinThreshold=-1. */
  def mergeScd2(dim: DataFrame, delta: DataFrame,
      watermark: Option[DataFrame] = None): DataFrame = {
    val highDate = to_timestamp(lit("2100-01-01 00:00:00"))
    val users = delta.select(col("user_id")).distinct()
    val untouched = dim.join(users, Seq("user_id"), "left_anti")
    val touched = dim.join(users, Seq("user_id"), "left_semi")
    val current = touched.filter(col("is_current"))
      .select(col("user_id"), col("event_type"), col("valid_from").as("cur_from"),
        col("version").as("cur_version"))
    val deltaSecs = delta.select(col("user_id"),
      date_trunc("second", col("ts")).as("dsec"))
    val tooEarly = (watermark match {
      case Some(wm) => deltaSecs.join(
        wm.select(col("user_id"), date_trunc("second", col("hwm")).as("bound")),
        Seq("user_id"))
      case None => deltaSecs.join(
        current.select(col("user_id"), col("cur_from").as("bound")), Seq("user_id"))
    }).filter(col("dsec") <= col("bound")).count()
    require(tooEarly == 0L,
      s"mergeScd2: $tooEarly delta events at or before the append-only bound " +
        "(watermark second, or the open version's start without one) " +
        "— the contract is broken; rebuild with eventsScd2Of instead")
    // seed row: the current type at cur_from with event_id -1 (sorts
    // first); it anchors BOTH dedup passes — change detection and the
    // post-coalesce type dedup — then drops before versioning
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val changes = delta
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .unionByName(current.select(col("user_id"), col("event_type"),
        col("cur_from").as("ts")).withColumn("event_id", lit(-1L)))
      .withColumn("prev_type", lag(col("event_type"), 1).over(byUser))
      .filter(col("event_id") === -1L ||
        col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      .withColumn("sec", date_trunc("second", col("ts")))
    // per-second coalescing + consecutive-type dedup, mirroring
    // eventsScd2Of: a delta run that lands back on the current type
    // inside one second must emit no redundant version. The guard above
    // keeps the seed alone in its second (no delta shares it).
    val lastInSecond = changes
      .withColumn("nsec", lead(col("sec"), 1).over(byUser))
      .filter(col("nsec").isNull || col("nsec") =!= col("sec"))
    val kept = lastInSecond
      .withColumn("prev_kept", lag(col("event_type"), 1).over(byUser))
      .filter(col("event_id") =!= -1L)
      .filter(col("prev_kept").isNull || col("prev_kept") =!= col("event_type"))
    val numbered = kept
      .join(current.select(col("user_id"), col("cur_version")), Seq("user_id"), "left")
      .withColumn("version",
        (row_number().over(byUser) + coalesce(col("cur_version"), lit(0L)))
          .cast("bigint"))
      .withColumn("valid_from", col("sec"))
      .withColumn("valid_to",
        coalesce(lead(col("sec"), 1).over(byUser), highDate))
      .withColumn("is_current", lead(col("sec"), 1).over(byUser).isNull)
      .select(col("user_id"), col("version"), col("event_type"),
        col("valid_from"), col("valid_to"), col("is_current"))
    // close the previously-current row at the user's FIRST kept change
    val firstChange = kept.groupBy(col("user_id"))
      .agg(min(col("sec")).as("close_at"))
    val adjusted = touched
      .join(firstChange, Seq("user_id"), "left")
      .withColumn("valid_to",
        when(col("is_current") && col("close_at").isNotNull, col("close_at"))
          .otherwise(col("valid_to")))
      .withColumn("is_current",
        col("is_current") && col("close_at").isNull)
      .drop("close_at")
    untouched.unionByName(adjusted).unionByName(numbered)
      .orderBy(col("user_id"), col("version"))
  }

  /** Time-based sliding frame (RANGE, not ROWS): per event, the count
    * and exact-decimal sum of the user's values in the trailing 30
    * minutes. The ROWS-frame sibling is [[eventsRolling]]; a RANGE
    * frame keys the window on event TIME, so co-timed events all join
    * the frame regardless of row order — the semantics a feature
    * pipeline actually wants for "activity in the last half hour". */
  def eventsRangeRolling(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("sec"))
      .rangeBetween(-1800L, 0L)
    events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ts").cast("long").as("sec"),
        col("value"))
      .withColumn("n_30min", count(lit(1)).over(w))
      .withColumn("sum_30min", sum(dec(col("value"))).over(w).cast("double"))
      .select(col("user_id"), col("event_id"), col("n_30min"), col("sum_30min"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Cohort retention matrix: users grouped by first-activity day, each
    * later active day counted at its offset — the activation/retention
    * report every event product runs. Two aggregations over one scan
    * (distinct user-days → per-user cohort via a min, then the matrix);
    * epoch-day integers end to end, so the oracle compare is exact. */
  def eventsRetention(spark: SparkSession, dir: String): DataFrame = {
    val day = (col("ts").cast("long") / lit(86400L)).cast("long").as("day")
    val userDays = events(spark, dir)
      .select(col("user_id"), day).distinct()
    val cohorts = userDays.groupBy(col("user_id"))
      .agg(min(col("day")).as("cohort_day"))
    userDays.join(cohorts, Seq("user_id"))
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  /** TPC-H Q4 shape: order-priority checking via EXISTS semi-join —
    * orders of one quarter that had at least one line shipped after the
    * order date, counted by priority. The semi-join never materialises
    * matching lineitem rows (no fan-out through the aggregate). */
  def q4Semi(spark: SparkSession, dir: String): DataFrame = {
    val ord = orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1995-04-01").cast("timestamp"))
    val li = lineitem(spark, dir).select(col("l_orderkey"), col("l_shipdate"))
    ord.join(li,
        col("o_orderkey") === col("l_orderkey") && col("l_shipdate") > col("o_orderdate"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  /** TPC-H Q13 shape: customer order-count distribution via a LEFT
    * OUTER join with an ON-side exclusion filter (zero-order customers
    * survive with count 0) and a second aggregation over the counts —
    * the outer-join + double-aggregate histogram pattern. The exclusion
    * is pushed below the join (filtering the orders side before a LEFT
    * join ≡ the ON-condition form, and lets the scan prune). */
  def q13Custdist(spark: SparkSession, dir: String): DataFrame = {
    val ord = orders(spark, dir)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select(col("o_orderkey"), col("o_custkey"))
    customer(spark, dir).select(col("c_custkey"))
      .join(ord, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** Conversion funnel view → click → purchase: per user, a stage counts
    * when its first event strictly follows the previous stage's first
    * event (epoch-second resolution — the coarsest grain both engines
    * agree on exactly). One scan, one per-user aggregate, one global
    * roll-up — no joins, no per-stage passes. */
  def eventsFunnel(spark: SparkSession, dir: String): DataFrame = {
    val sec = col("ts").cast("long")
    def firstOf(t: String) = min(when(col("event_type") === t, sec))
    events(spark, dir)
      .groupBy(col("user_id"))
      .agg(firstOf("view").as("t_view"), firstOf("click").as("t_click"),
        firstOf("purchase").as("t_purchase"))
      .agg(
        count(col("t_view")).as("n_view"),
        sum(when(col("t_click") > col("t_view"), 1L).otherwise(0L)).as("n_view_click"),
        sum(when(col("t_click") > col("t_view") && col("t_purchase") > col("t_click"), 1L)
          .otherwise(0L)).as("n_view_click_purchase"))
  }

  /** Per-user hour-grid gap fill with forward fill (the feature-table
    * densification step of a training pipeline): each user's observed
    * hourly max(value) is expanded to a continuous hour grid between the
    * user's first and last event, carrying the last observation forward.
    * `sequence` + explode generates the grid IN the engine (distributed,
    * keyed by user) — no driver-side calendar. Restricted to a pinned
    * user set: the output grid is O(users × hours) by design and the
    * operator's shape, not its fan-out, is what scales. */
  def eventsGapFill(spark: SparkSession, dir: String, maxUserId: Long = 3L): DataFrame = {
    val hr = (col("ts").cast("long") / lit(3600L)).cast("long").as("hr")
    val hourly = events(spark, dir)
      .filter(col("user_id") <= maxUserId)
      .select(col("user_id"), hr, col("value"))
      .groupBy(col("user_id"), col("hr"))
      .agg(max(col("value")).as("hour_value"))
    val grid = hourly.groupBy(col("user_id"))
      .agg(min(col("hr")).as("h0"), max(col("hr")).as("h1"))
      .select(col("user_id"), explode(sequence(col("h0"), col("h1"))).as("hr"))
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("hr"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(hourly, Seq("user_id", "hr"), "left")
      .withColumn("value", last(col("hour_value"), ignoreNulls = true).over(byUser))
      .select(col("user_id"), col("hr"), col("value"))
      .orderBy(col("user_id"), col("hr"))
  }

  /** TPC-H Q10 shape: top-20 customers by lost revenue from returned
    * items in a quarter — fact⋈fact shuffle join on orderkey, then a
    * grouped aggregate keyed on the customer dimension's attributes.
    * The returnflag and date filters reach the parquet scans. */
  def q10Returns(spark: SparkSession, dir: String): DataFrame = {
    val ord = orders(spark, dir)
      .filter(col("o_orderdate") >= lit("1995-10-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    val li = lineitem(spark, dir)
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(customer(spark, dir)
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("c_nationkey"))
      .agg(sum(price * disc1).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  /** TPC-H Q16 shape: distinct-supplier counts per part profile with a
    * NOT-IN exclusion — a grouped COUNT(DISTINCT) over a semi-structured
    * key plus an anti-join against a (broadcast-small) exclusion list.
    * lineitem stands in for partsupp (testdata has no partsupp table):
    * the (l_partkey, l_suppkey) pairs ARE the observed supplier-part
    * relationships. */
  def q16SupplierCount(spark: SparkSession, dir: String): DataFrame = {
    val excluded = supplier(spark, dir)
      .filter(col("s_acctbal") < 0)
      .select(col("s_suppkey"))
    val pt = part(spark, dir)
      .filter(col("p_brand") =!= "Brand#45" &&
        col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
    lineitem(spark, dir).select(col("l_partkey"), col("l_suppkey"))
      .join(broadcast(excluded), col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(pt, col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  /** TPC-H Q18 shape: large-volume orders — HAVING on an aggregated
    * subquery, joined back to the parent facts. The per-order quantity
    * sum is ONE map-side-combining aggregate on the fact's natural key;
    * the survivors (top ~1%) then drive the orders/customer joins, so
    * the expensive side is filtered before any wide row is formed. */
  def q18LargeOrders(spark: SparkSession, dir: String): DataFrame = {
    val bigOrders = lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(sum(dec(col("l_quantity"))).as("sum_qty_dec"))
      .filter(col("sum_qty_dec") > 250)
      .select(col("l_orderkey"), col("sum_qty_dec").cast("double").as("sum_qty"))
    orders(spark, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"), col("o_totalprice"))
      .join(bigOrders, col("o_orderkey") === col("l_orderkey"))
      .join(customer(spark, dir).select(col("c_custkey"), col("c_name")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** TPC-H Q19 shape: disjunctive multi-clause predicate revenue — an OR
    * of three (brand ∧ size-range ∧ quantity-range) conjunctions across
    * the lineitem⋈part join. The common `p_size >= 1` / quantity bounds
    * let Spark push a superset filter to both scans while the full
    * disjunction evaluates post-join in one codegen stage. */
  def q19Disjunctive(spark: SparkSession, dir: String): DataFrame = {
    val li = lineitem(spark, dir)
      .filter(col("l_quantity") >= 1 && col("l_quantity") <= 40)
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"), col("l_discount"))
    val pt = part(spark, dir).select(col("p_partkey"), col("p_brand"), col("p_size"))
    val clause = (col("p_brand") === "Brand#12" &&
        col("p_size").between(1, 10) && col("l_quantity").between(1, 20)) ||
      (col("p_brand") === "Brand#23" &&
        col("p_size").between(1, 20) && col("l_quantity").between(10, 30)) ||
      (col("p_brand") === "Brand#34" &&
        col("p_size").between(1, 30) && col("l_quantity").between(20, 40))
    li.join(pt, col("l_partkey") === col("p_partkey"))
      .filter(clause)
      .agg(sum(price * disc1).cast("double").as("revenue"),
        count(lit(1)).as("n_items"))
  }

  /** TPC-H Q14 shape: conditional-aggregate ratio — promo revenue share
    * for one month, both legs in ONE aggregate over one scan (a
    * two-query formulation would scan twice). */
  def q14PromoShare(spark: SparkSession, dir: String): DataFrame = {
    val li = lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1995-09-01").cast("timestamp") &&
        col("l_shipdate") < lit("1995-10-01").cast("timestamp"))
      .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
    li.join(part(spark, dir).select(col("p_partkey"), col("p_type")),
        col("l_partkey") === col("p_partkey"))
      .agg(
        sum(when(col("p_type") === "PROMO", price * disc1)
          .otherwise(lit(0).cast("decimal(24,4)"))).as("promo_dec"),
        sum(price * disc1).as("total_dec"))
      .select(
        (lit(100.0) * col("promo_dec").cast("double") / col("total_dec").cast("double"))
          .as("promo_revenue_pct"),
        col("total_dec").cast("double").as("total_revenue"))
  }

  /** TPC-H Q15 shape: top supplier by quarterly revenue — an aggregated
    * "view" joined back against its own MAX (scalar subquery): two
    * consumers of one aggregate, no window sort. */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val revenue = lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(price * disc1).as("total_dec"))
      .select(col("l_suppkey"), col("total_dec").cast("double").as("total_revenue"))
    val maxRev = revenue.agg(max(col("total_revenue")).as("max_revenue"))
    revenue.join(broadcast(maxRev))
      .filter(col("total_revenue") === col("max_revenue"))
      .join(supplier(spark, dir).select(col("s_suppkey"), col("s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  /** TPC-H Q21 shape: double correlation — EXISTS (another supplier in
    * the same order) AND NOT EXISTS (another supplier ALSO late in that
    * order), counting per-supplier "solely-responsible late" lines.
    * Late = shipped > 60 days after order date (the testdata has no
    * commit/receipt dates; the correlation structure — semi-join +
    * anti-join against the same fact at different predicates — is the
    * point). Distinct orderkeys per supplier are counted so parallel
    * late lines in one order don't double-count. */
  def q21WaitingSupplier(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val li = lineitem(spark, dir)
      .join(orders(spark, dir).select(col("o_orderkey"), col("o_orderdate")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS")).as("late"))
    val lateLines = li.filter(col("late"))
      .select(col("l_orderkey"), col("l_suppkey")).distinct()
    // EXISTS: some OTHER supplier appears in the order
    val multiSupp = lateLines.alias("l1")
      .join(li.select(col("l_orderkey"), col("l_suppkey").as("other")).distinct().alias("l2"),
        col("l1.l_orderkey") === col("l2.l_orderkey") &&
          col("l1.l_suppkey") =!= col("l2.other"), "left_semi")
    // NOT EXISTS: no OTHER supplier was late in the same order
    val solelyLate = multiSupp.alias("m")
      .join(lateLines.select(col("l_orderkey"), col("l_suppkey").as("other_late")).alias("o"),
        col("m.l_orderkey") === col("o.l_orderkey") &&
          col("m.l_suppkey") =!= col("o.other_late"), "left_anti")
    solelyLate
      .join(supplier(spark, dir).select(col("s_suppkey"), col("s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_suppkey"), col("s_name"))
      .agg(countDistinct(col("l_orderkey")).as("numwait"))
      .orderBy(col("numwait").desc, col("s_suppkey"))
      .limit(k)
  }

  /** TPC-H Q6 shape: the canonical scan-filter-aggregate — forecasting
    * revenue change from a quantity/discount band. Every predicate
    * reaches the parquet scan (PushedFilters); one exact decimal sum. */
  def q6Forecast(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24)
      .agg(sum(price * col("l_discount").cast("decimal(4,2)"))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_lines"))

  /** TPC-H Q20 shape: nested semi-join chain — suppliers (in a nation
    * band) who stocked an above-average volume of a part family. With
    * no partsupp table, per-(supplier, part) shipped volume stands in
    * for availqty: suppliers having some part where their shipped
    * volume > 1/6 of that part's total across suppliers (the synthetic
    * volumes are near-uniform, so a literal majority never occurs). semi ∘ semi —
    * each level a left_semi, nothing widens. */
  def q20ExcessStock(spark: SparkSession, dir: String): DataFrame = {
    val parts = part(spark, dir)
      .filter(col("p_name").startsWith("red"))
      .select(col("p_partkey"))
    val perSuppPart = lineitem(spark, dir)
      .join(parts, col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(dec(col("l_quantity"))).as("vol"))
    val perPart = perSuppPart.groupBy(col("l_partkey"))
      .agg(sum(col("vol")).as("total_vol"))
    val excess = perSuppPart.join(perPart, Seq("l_partkey"))
      .filter(col("vol") * 6 > col("total_vol"))
      .select(col("l_suppkey")).distinct()
    supplier(spark, dir)
      .filter(col("s_nationkey") < 10)
      .join(excess, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"))
      .orderBy(col("s_suppkey"))
  }

  /** TPC-H Q22 shape: global-filter anti-join — customers above the
    * positive-balance average (a broadcast scalar subquery) with no
    * RECENT order (left_anti against a date-filtered orders scan; the
    * testdata has no fully orderless customers, so the classic NOT
    * EXISTS would be vacuously empty). Country code is derived from
    * c_nationkey (testdata has no phone column). */
  def q22GlobalFilter(spark: SparkSession, dir: String): DataFrame = {
    val codes = Seq(0, 1, 2, 3)
    val cust = customer(spark, dir)
      .withColumn("cntrycode", (col("c_nationkey") % 5).cast("int"))
      .filter(col("cntrycode").isin(codes: _*))
      .select(col("c_custkey"), col("cntrycode"), col("c_acctbal"))
    // exact decimal sum, then ONE double division — bit-identical across
    // engines and shuffle orders (a double avg would accumulate in
    // partition order)
    val avgBal = cust.filter(col("c_acctbal") > 0)
      .agg((sum(dec(col("c_acctbal"))).cast("double") / count(lit(1))).as("avg_bal"))
    cust.join(broadcast(avgBal))
      .filter(col("c_acctbal") > col("avg_bal"))
      .join(orders(spark, dir)
          .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
          .select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("cntrycode"))
      .agg(count(lit(1)).as("numcust"),
        sum(dec(col("c_acctbal"))).cast("double").as("totacctbal"))
      .orderBy(col("cntrycode"))
  }

  /** TPC-H Q2 shape: minimum-cost supplier — a correlated-MIN scalar
    * subquery joined back to the rows achieving it. With no partsupp
    * table, the observed (part, supplier) supply cost is
    * MIN(l_extendedprice) over their lineitems. The per-part minimum is
    * computed ONCE over the region-eligible suppliers (a grouped agg,
    * not a per-row subquery — Catalyst would otherwise re-scan per
    * part) and joined back; supplier/nation/region dims broadcast. */
  def q2MinCostSupplier(spark: SparkSession, dir: String): DataFrame = {
    val eligSupp = supplier(spark, dir)
      .join(nation(spark, dir), col("s_nationkey") === col("n_nationkey"))
      .join(region(spark, dir).filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"), col("n_name"))
    val pt = part(spark, dir)
      .filter(col("p_type") === "LARGE" && col("p_size") <= 10)
      .select(col("p_partkey"), col("p_brand"))
    // per-part minimum as a window over the SAME aggregated frame — one
    // lineitem pass (a groupBy + join-back would re-derive the cost
    // aggregate on a second branch; Spark has no CTE materialization)
    val cost = lineitem(spark, dir)
      .join(broadcast(pt.select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .join(broadcast(eligSupp.select(col("s_suppkey"))),
        col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(price).as("cost_dec"))
      .withColumn("min_cost_dec",
        min(col("cost_dec")).over(Window.partitionBy(col("l_partkey"))))
    cost
      .filter(col("cost_dec") === col("min_cost_dec"))
      .join(broadcast(eligSupp), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(pt), col("l_partkey") === col("p_partkey"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("l_partkey").as("p_partkey"), col("p_brand"),
        col("cost_dec").cast("double").as("supply_cost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
      .limit(100)
  }

  /** TPC-H Q7 shape: volume shipping between two nations — a two-sided
    * dimension join (supplier nation × customer nation) with the pair
    * filter applied symmetrically, grouped by the pair and ship year.
    * Both nation legs broadcast; the fact shuffles once for the
    * group-by. */
  def q7VolumeShipping(spark: SparkSession, dir: String): DataFrame = {
    // the shipping pair is region-grained (Q7 uses a nation pair; a
    // single synthetic nation can have zero suppliers at tiny SFs, so
    // the region is the smallest always-populated analog)
    val suppRegion = supplier(spark, dir)
      .join(nation(spark, dir), col("s_nationkey") === col("n_nationkey"))
      .join(region(spark, dir), col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("r_name").as("supp_region"))
    val custRegion = customer(spark, dir)
      .join(nation(spark, dir), col("c_nationkey") === col("n_nationkey"))
      .join(region(spark, dir), col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("r_name").as("cust_region"))
    lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_suppkey"), col("l_extendedprice"),
        col("l_discount"), year(col("l_shipdate")).as("l_year"))
      .join(orders(spark, dir).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(suppRegion), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(custRegion), col("o_custkey") === col("c_custkey"))
      .filter((col("supp_region") === "EUROPE" && col("cust_region") === "ASIA") ||
        (col("supp_region") === "ASIA" && col("cust_region") === "EUROPE"))
      .groupBy(col("supp_region"), col("cust_region"), col("l_year"))
      .agg(sum(price * disc1).cast("double").as("revenue"))
      .orderBy(col("supp_region"), col("cust_region"), col("l_year"))
  }

  /** TPC-H Q8 shape: national market share — one nation's fraction of
    * regional revenue per year. Both legs (nation-restricted and total
    * volume) ride ONE aggregate as conditional decimal sums; the single
    * double division happens after, so the ratio is bit-stable. */
  def q8MarketShare(spark: SparkSession, dir: String): DataFrame = {
    val suppNation = supplier(spark, dir)
      .join(nation(spark, dir), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val custRegion = customer(spark, dir)
      .join(nation(spark, dir), col("c_nationkey") === col("n_nationkey"))
      .join(region(spark, dir).filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"))
    lineitem(spark, dir)
      .join(broadcast(part(spark, dir).filter(col("p_type") === "ECONOMY")
        .select(col("p_partkey"))), col("l_partkey") === col("p_partkey"), "left_semi")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
      .join(orders(spark, dir)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
          .select(col("o_orderkey"), col("o_custkey"),
            year(col("o_orderdate")).as("o_year")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(custRegion), col("o_custkey") === col("c_custkey"), "left_semi")
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("o_year"))
      .agg((sum(when(col("supp_nation") === "NATION_3", price * disc1)
          .otherwise(lit(0).cast("decimal(14,2)"))).cast("double") /
        sum(price * disc1).cast("double")).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  /** TPC-H Q9 shape: product-type profit by nation and year. Supply
    * cost stands in as 10% of the part's retail price per unit (no
    * partsupp table); profit = revenue − cost stays in exact decimal
    * until the final cast. */
  def q9ProductProfit(spark: SparkSession, dir: String): DataFrame = {
    val suppNation = supplier(spark, dir)
      .join(nation(spark, dir), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name"))
    val pt = part(spark, dir).filter(col("p_name").contains("red"))
      .select(col("p_partkey"), col("p_retailprice"))
    val amount = price * disc1 -
      col("p_retailprice").cast("decimal(6,2)") * lit(0.10).cast("decimal(4,2)") *
        col("l_quantity").cast("decimal(12,2)")
    lineitem(spark, dir)
      .join(broadcast(pt), col("l_partkey") === col("p_partkey"))
      .join(orders(spark, dir).select(col("o_orderkey"),
          year(col("o_orderdate")).as("o_year")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(suppNation), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("n_name"), col("o_year"))
      .agg(sum(amount).cast("double").as("sum_profit"))
      .orderBy(col("n_name"), col("o_year").desc)
  }

  /** TPC-H Q11 shape: important stock — per-part inventory value for
    * one nation's suppliers, kept only when above a fraction of the
    * grand total (a scalar-subquery HAVING). Both the per-part values
    * and the threshold come from the SAME aggregated frame (computed
    * once, the threshold side is a 1-row broadcast); the comparison
    * stays in exact decimal. */
  def q11ImportantStock(spark: SparkSession, dir: String): DataFrame = {
    // region-scoped supplier set (Q11 restricts to one country's
    // suppliers; a single synthetic nation can be empty at tiny SFs —
    // 10 suppliers spread over 25 nations — so the region is the
    // smallest always-populated analog)
    val natSupp = supplier(spark, dir)
      .join(nation(spark, dir), col("s_nationkey") === col("n_nationkey"))
      .join(region(spark, dir).filter(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"))
    // the HAVING threshold is 1.1× the MEAN per-part value (scale-free —
    // a fixed fraction of the grand total, Q11's literal form, degrades
    // to empty when the part count is below 1/frac), compared in exact
    // cross-multiplied decimal: value·n > 1.1·total. The threshold side
    // is a 1-row scalar aggregate of the SAME per-part frame broadcast
    // back (the q15_top_supplier shape) — NOT a keyless global window,
    // which would sort the whole part dimension (~2B rows at 100 TB) on
    // one partition. The per-part frame is checkpointed so both plan
    // branches (values + threshold) read ONE materialized build instead
    // of re-scanning lineitem — the "materialized temp" pattern the
    // q20/q21 pins document.
    val perPart = lineitem(spark, dir)
      .join(broadcast(natSupp), col("l_suppkey") === col("s_suppkey"), "left_semi")
      .groupBy(col("l_partkey"))
      .agg(sum(price * col("l_quantity").cast("decimal(12,2)")).as("value_dec"))
      .localCheckpoint()
    val totals = perPart.agg(
      sum(col("value_dec")).as("total_dec"), count(lit(1)).as("n_parts"))
    perPart.crossJoin(broadcast(totals))
      .filter(col("value_dec") * col("n_parts").cast("decimal(10,0)") >
        lit(1.1).cast("decimal(3,2)") * col("total_dec"))
      .select(col("l_partkey").as("p_partkey"),
        col("value_dec").cast("double").as("part_value"))
      .orderBy(col("part_value").desc, col("p_partkey"))
  }

  /** TPC-H Q12 shape: late-shipment priority counts — a join with a
    * date-arithmetic filter and two conditional counts per group.
    * l_returnflag stands in for shipmode and "late" is shipping >90
    * days after the order date (no commit/receipt dates in testdata).
    * One scan of each side, one aggregate. */
  def q12LatePriority(spark: SparkSession, dir: String): DataFrame =
    lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_returnflag"), col("l_shipdate"))
      .join(orders(spark, dir).select(col("o_orderkey"), col("o_orderdate"),
          col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
          .otherwise(0L)).as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L)
          .otherwise(1L)).as("low_line_count"))
      .orderBy(col("l_returnflag"))

  /** Exact distribution quantiles (p50/p90/p99 of event value per type)
    * via the sort-based `percentile` aggregate — the latency-report
    * shape every analytics engine needs. Exact, not approx: the driver
    * oracle compares against DuckDB's quantile_cont, so this entry pins
    * real interpolated quantiles (round(6) absorbs the two engines'
    * interpolation-algebra ULPs). At 100 TB swap in approx_percentile —
    * same plan shape, sketch-mergeable; here the per-group sort is the
    * point (it IS the semantics being tested). */
  def eventsQuantiles(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(expr("percentile(value, 0.5)"), 6).as("p50"),
        round(expr("percentile(value, 0.9)"), 6).as("p90"),
        round(expr("percentile(value, 0.99)"), 6).as("p99"))
      .orderBy(col("event_type"))

  /** Distinct-user counts per event type, exact AND HyperLogLog++:
    * the exact side is the oracle-compared truth; the sketch side is
    * asserted in-row to land within 5% (rsd is configured at 1% — a
    * miss means the sketch plumbing broke, not noise). At 100 TB the
    * approx column IS the operator (mergeable sketch, no distinct
    * shuffle) and the exact column becomes the spot-check. */
  def eventsApproxUsers(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users_exact"),
        approx_count_distinct(col("user_id"), rsd = 0.01).as("approx"))
      .select(col("event_type"), col("n_users_exact"),
        (abs(col("approx") - col("n_users_exact")).cast("double") <=
          col("n_users_exact").cast("double") * 0.05).as("approx_within_5pct"))
      .orderBy(col("event_type"))

  /** Partitioned HLL sketch MERGE — demonstrating the property that
    * makes the sketch THE 100 TB distinct-count operator: every shard
    * builds its own DataSketches HLL over its rows (`hll_sketch_agg`),
    * and the shard sketches union (`hll_union_agg`) into the global
    * estimate with no re-scan and no exact set union — exactly how a
    * 1000-executor count-distinct (or a day-partitioned incremental
    * one) composes. Gated in-row: the merged estimate must (a) sit
    * within 5% of the exact count and (b) agree with the single-pass
    * global sketch within max(2%, 1) — the union path re-estimates
    * without the HIP accumulator, so bit-equality is not the contract,
    * bounded drift is. Exact leg oracled. */
  def eventsSketchMerge(spark: SparkSession, dir: String, shards: Int = 8): DataFrame = {
    val ev = events(spark, dir).select(col("user_id"))
    val merged = ev
      .groupBy(pmod(col("user_id"), lit(shards)).as("shard"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("merged"))
    ev.agg(countDistinct(col("user_id")).as("n_users_exact"),
        hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("global"))
      .crossJoin(broadcast(merged))
      .select(col("n_users_exact"),
        (abs(col("merged") - col("n_users_exact")).cast("double") <=
          col("n_users_exact").cast("double") * 0.05).as("merged_within_5pct"),
        (abs(col("merged") - col("global")).cast("double") <=
          greatest(col("n_users_exact").cast("double") * 0.02, lit(1.0)))
          .as("merge_consistent"))
  }

  /** Sketch-algebra set intersection: |A ∩ B| of the distinct-user sets
    * of every event-type pair, estimated by inclusion–exclusion over
    * HLL sketches (est(A) + est(B) − est(A ∪ B), the union being an
    * hll_union of the two per-type sketches — the operation that makes
    * this the 100 TB shape: per-type sketches are built ONCE in one
    * scan, then every pairwise overlap is pure sketch algebra with no
    * second pass over the data). The exact legs (computed by the same
    * query, oracled in DuckDB) gate the estimate in-row. Tolerance is
    * wide (15% of the union, floor 50): inclusion–exclusion compounds
    * the error of three estimates, which is the documented reason
    * production systems reach for theta sketches when overlaps are
    * small — exactly the trade this entry demonstrates. */
  def eventsApproxOverlap(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir).select(col("event_type"), col("user_id"))
    val perType = ev.groupBy(col("event_type"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"),
        countDistinct(col("user_id")).as("n_exact"))
    val pairs = perType.select(col("event_type").as("type_a"),
        col("sk").as("sk_a"), col("n_exact").as("n_a"))
      .join(perType.select(col("event_type").as("type_b"),
        col("sk").as("sk_b"), col("n_exact").as("n_b")))
      .filter(col("type_a") < col("type_b"))
    val exact = ev.select(col("event_type").as("type_a"), col("user_id"))
      .join(ev.select(col("event_type").as("type_b"), col("user_id")), Seq("user_id"))
      .filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(countDistinct(col("user_id")).as("n_overlap_exact"))
    pairs.join(exact, Seq("type_a", "type_b"), "left")
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
        coalesce(col("n_overlap_exact"), lit(0L)).as("n_overlap_exact"),
        (hll_sketch_estimate(col("sk_a")) + hll_sketch_estimate(col("sk_b")) -
          hll_sketch_estimate(hll_union(col("sk_a"), col("sk_b")))).as("est"),
        hll_sketch_estimate(hll_union(col("sk_a"), col("sk_b"))).as("est_union"))
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
        col("n_overlap_exact"),
        (abs(col("est") - col("n_overlap_exact")) <=
          greatest(col("est_union") * 0.15, lit(50.0))).as("overlap_within_tol"))
      .orderBy(col("type_a"), col("type_b"))
  }

  /** The distribution-window family in one frame (ntile, percent_rank,
    * cume_dist, first/last_value over a running frame) — per-customer
    * order-price positioning. One window sort per customer partition;
    * the whole family shares it. */
  def windowDistribution(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    orders(spark, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("pct_rank", round(percent_rank().over(w), 6))
      .withColumn("cume", round(cume_dist().over(w), 6))
      .withColumn("cheapest", first_value(col("o_orderkey")).over(wRun))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Fixed-width value histogram per event type (width_bucket shape):
    * integer bucket arithmetic end to end — the profiling primitive
    * next to [[eventsQuantiles]]'s exact quantiles. */
  def eventsValueHistogram(spark: SparkSession, dir: String, width: Double = 10.0): DataFrame =
    events(spark, dir)
      .select(col("event_type"),
        floor(col("value") / lit(width)).cast("bigint").as("bucket"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n_events"))
      .orderBy(col("event_type"), col("bucket"))

  /** KLL/GK-style approximate quantiles next to [[eventsQuantiles]]'s
    * exact ones: approx_percentile at accuracy 1000, gated in-row
    * within 2% relative of the exact sort-based value (same pattern as
    * the HLL gate — at 100 TB the mergeable sketch IS the operator and
    * the exact sort becomes the spot check). */
  def eventsQuantilesApprox(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(expr("percentile(value, 0.5)"), 6).as("p50_exact"),
        expr("approx_percentile(value, 0.5, 1000)").as("p50_approx"),
        round(expr("percentile(value, 0.99)"), 6).as("p99_exact"),
        expr("approx_percentile(value, 0.99, 1000)").as("p99_approx"))
      .select(col("event_type"), col("n_events"), col("p50_exact"), col("p99_exact"),
        (abs(col("p50_approx") - col("p50_exact")) <=
          lit(0.02) * abs(col("p50_exact")) + lit(0.5)).as("p50_within_2pct"),
        (abs(col("p99_approx") - col("p99_exact")) <=
          lit(0.02) * abs(col("p99_exact")) + lit(0.5)).as("p99_within_2pct"))
      .orderBy(col("event_type"))

  /** CUBE over (event_type, month): all four grouping sets in one pass
    * (Spark expands the cube in the aggregate — one shuffle, not four
    * queries). Decimal-exact value sums; NULLS FIRST ordering matches
    * the oracle's. */
  def eventsCube(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(col("event_type"),
        date_trunc("month", col("ts")).as("month"),
        col("value"))
      .cube(col("event_type"), col("month"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(10,2)")).cast("double").as("sum_value"))
      .orderBy(asc_nulls_first("event_type"), asc_nulls_first("month"))
}
