package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** FastRP (Fast Random Projection) node embeddings, matrix-free and
  * columnar.
  *
  * Re-expresses the reference's GDS call
  * (`algorithms/Alg_KNN_FastRP.py:62-70`: fastRP.write with
  * embeddingDimension=64, relationshipWeightProperty=rating) as pure
  * dataflow, following the published FastRP construction (Chen et al.,
  * "Fast and Accurate Network Embeddings via Very Sparse Random
  * Projection", CIKM 2019):
  *
  *  1. base vectors R: very sparse random projection — entry ∈
  *     {+√3, 0, −√3} with prob {1/6, 2/3, 1/6}, derived DETERMINISTICALLY
  *     per (node, dim) from xxhash64 so executors never need a shared
  *     RNG state (rerun-stable, cluster-safe);
  *  2. k weighted-mean propagation steps over the (weighted) adjacency,
  *     L2-normalising after each step;
  *  3. final embedding = L2-normalised weighted sum of the per-iteration
  *     states (GDS default iterationWeights = [0.0, 1.0, 1.0, 1.0],
  *     which the reference uses implicitly by not overriding it).
  *
  * Embeddings are laid out as `dim` WIDE DOUBLE COLUMNS (e0…e63), not an
  * array: the propagation aggregate is then `dim` codegen'd `sum()`s with
  * map-side partial aggregation — no per-row boxing, no UDAF, and the
  * shuffle ships partial sums, not neighbour lists. Each step is one join
  * + one groupBy on node id — linear in |E|, no driver state, no collect.
  * The array form is materialised only in the final projection.
  */
object FastRP {

  private val Sqrt3 = math.sqrt(3.0)

  private def eCols(dim: Int): Seq[String] = (0 until dim).map(j => s"e$j")

  /** Deterministic sparse base entry for dimension j — md5-based (r7:
    * engine-replayable; xxhash64 is Spark-only): first 8 hex chars as a
    * uint32, mod 6. The md5 swap plus the [[normalized]] snap make the
    * WHOLE FastRP pipeline — and everything downstream of it (KNN
    * edges, both operating points) — exactly DuckDB-oracle-able. */
  private def baseEntry(nodeId: Column, j: Int, seed: Int): Column = {
    val h = conv(substring(
        md5(concat(nodeId.cast("string"), lit(s":$j:$seed"))), 1, 8), 16, 10)
      .cast("long") % 6
    when(h === 0, lit(Sqrt3)).when(h === 1, lit(-Sqrt3)).otherwise(lit(0.0))
  }

  /** Two-step L2 normalisation over wide columns (norm computed once),
    * with the output SNAPPED to 6 decimals (r7): the propagation means
    * feeding this carry ~1e-11 reduction-order noise, and the snap
    * makes each iteration's state bit-identical across engines and
    * runs — the IVF/PQ/kmeans precedent. Unit norms survive to the
    * fastrp_norms gate's 1e-4 rounding (coordinate error ≤ 5e-7 →
    * norm error ≤ ~4e-6). */
  private def normalized(df: DataFrame, dim: Int): DataFrame = {
    val normSq = eCols(dim).map(c => col(c) * col(c)).reduce(_ + _)
    df.withColumn("_norm", sqrt(normSq))
      .select(col("node_id") +: eCols(dim).map(c =>
        when(col("_norm") > 0, round(col(c) / col("_norm"), 6))
          .otherwise(lit(0.0)).as(c)): _*)
  }

  /** The normalised iteration-0 state on its own: one deterministic
    * unit-norm sparse base vector per node of `nodes` (node_id).
    * [[graft.graph.Node2Vec]] uses it as the fallback identity for
    * nodes whose every walk context has non-positive SPPMI. */
  def baseVectors(nodes: DataFrame, dim: Int = 64, seed: Int = 42): DataFrame =
    normalized(
      nodes.select(col("node_id") +: eCols(dim).zipWithIndex.map {
        case (c, j) => baseEntry(col("node_id"), j, seed).as(c)
      }: _*), dim)
      .select(col("node_id"), array(eCols(dim).map(col): _*).as("embedding"))

  /** The retained propagation states of one FastRP build: `states(k)`
    * is the k-th iteration state as WIDE columns (node_id, e0…e{d-1}),
    * `embedding` the final packed (node_id, embedding) frame. The
    * per-iteration states are what [[mergeEmbeddings]] (T15) folds
    * deltas into — at 100 TB they are the (|iterationWeights|)×
    * embedding-sized silver a maintained embedding table keeps next to
    * itself, the price of never re-embedding the unchanged 99.99 %. */
  final case class FastRpState(states: Seq[DataFrame], embedding: DataFrame)

  /** Compute embeddings for every node in `edges` (src, dst, weight).
    * Edges should already contain both directions for undirected
    * semantics. Returns (node_id, embedding: array<double>). */
  def embed(edges: DataFrame, dim: Int = 64,
      iterationWeights: Seq[Double] = Seq(0.0, 1.0, 1.0, 1.0), seed: Int = 42): DataFrame =
    embedStates(edges, dim, iterationWeights, seed).embedding

  /** [[embed]] with the per-iteration states retained (same
    * computation — embed IS this function's `.embedding`). */
  def embedStates(edges: DataFrame, dim: Int = 64,
      iterationWeights: Seq[Double] = Seq(0.0, 1.0, 1.0, 1.0),
      seed: Int = 42): FastRpState = {
    val e = edges.select(col("src"), col("dst"), col("weight").cast("double"))
    val nodes = e.select(col("src").as("node_id")).distinct().localCheckpoint()
    // r12 note: a broadcast pin of the per-iteration state side was
    // MEASURED as a net loss here (bipartite embed 11→21 s at sf0.1) —
    // the 64-wide build-side rows make the hashed-relation probe copies
    // cost more than the SMJ sort they save; the exchange shape stays.
    var state = normalized(
      nodes.select(col("node_id") +: eCols(dim).zipWithIndex.map {
        case (c, j) => baseEntry(col("node_id"), j, seed).as(c)
      }: _*), dim).localCheckpoint()
    val states = Seq.newBuilder[DataFrame]
    states += state

    var combined = state.select(col("node_id") +: eCols(dim).map(c =>
      (col(c) * iterationWeights.head).as(s"acc_$c")): _*)

    for (k <- 1 until iterationWeights.length) {
      val msgs = e.join(state.withColumnRenamed("node_id", "src"), Seq("src"))
      val agg = msgs
        .groupBy(col("dst").as("node_id"))
        .agg(sum(col("weight")).as("_w"),
          eCols(dim).map(c => sum(col(c) * col("weight")).as(c)): _*)
      val mean = agg.select(col("node_id") +: eCols(dim).map(c => (col(c) / col("_w")).as(c)): _*)
      state = normalized(mean, dim)
        .join(nodes, Seq("node_id"), "right")
        .na.fill(0.0, eCols(dim))
        .localCheckpoint()
      states += state
      val w = iterationWeights(k)
      combined = combined.join(state, Seq("node_id"))
        .select(col("node_id") +: eCols(dim).map(c =>
          (col(s"acc_$c") + col(c) * w).as(s"acc_$c")): _*)
    }

    FastRpState(states.result(), finishEmbedding(combined, dim))
  }

  /** Final L2 normalise + pack into an array column; coordinates
    * snapped at 6 like every iteration state (see normalized) so the
    * embedding CONSUMERS (cosines, LSH sign bits) are bit-replayable. */
  private def finishEmbedding(combined: DataFrame, dim: Int): DataFrame = {
    val accNormSq = eCols(dim).map(c => col(s"acc_$c") * col(s"acc_$c")).reduce(_ + _)
    combined.withColumn("_norm", sqrt(accNormSq))
      .select(col("node_id"),
        array(eCols(dim).map(c =>
          when(col("_norm") > 0, round(col(s"acc_$c") / col("_norm"), 6))
            .otherwise(lit(0.0))): _*)
          .as("embedding"))
  }

  /** Incremental FastRP maintenance (T15 — the embedding member of the
    * T8/T9/T11/T12/T13/T14 incremental family): fold an edge delta
    * into a retained [[FastRpState]] without re-embedding the graph.
    *
    * FastRP is LOCAL: state_k(v) depends only on v's in-neighbors'
    * state_{k-1}, so after a delta only nodes within k propagation
    * hops (along edge direction) of a changed edge's target can carry
    * different states — the blast radius is the forward closure of the
    * delta, provably, not heuristically. The fold:
    *
    *  1. `A₁` = target endpoints of `changedEdges` — the caller lists
    *     every ADDED, REMOVED, or RE-WEIGHTED edge, in the same
    *     both-directions form the edge frame uses (the T13
    *     `changedIds`-includes-deletes contract);
    *  2. per level k: grow `A` by one forward hop over the NEW edge
    *     set, re-aggregate state_k for A only (messages restricted by
    *     a left_semi on the target — the dominant join runs
    *     delta-neighborhood × edges, never all × all), and patch it
    *     into the old state frame (deleted nodes drop via a left_semi
    *     against the new node set);
    *  3. re-combine + re-normalise the final embedding for A only,
    *     patch into the old embedding.
    *
    * state_0 is a pure per-id hash projection (map-only, no shuffle)
    * and is recomputed wholesale rather than patched. Every recompute
    * runs the exact aggregation shape of [[embedStates]] restricted to
    * A, and every state is 6-decimal-snapped, so the merged frames are
    * bit-identical to the full re-embed (spec-proved on
    * add/re-weight/delete deltas — the `mergeScoredPairs` contract,
    * `ann/Lsh.scala`). Composes with T13: feed `.embedding` deltas to
    * `Lsh.mergeScoredPairs` to maintain the KNN substrate downstream. */
  def mergeEmbeddings(old: FastRpState, newEdges: DataFrame,
      changedEdges: DataFrame, dim: Int = 64,
      iterationWeights: Seq[Double] = Seq(0.0, 1.0, 1.0, 1.0),
      seed: Int = 42): FastRpState = {
    val levels = iterationWeights.length
    require(old.states.length == levels,
      s"retained ${old.states.length} states, need $levels (one per iteration weight)")
    val e = newEdges.select(col("src"), col("dst"),
      col("weight").cast("double").as("weight")).localCheckpoint()
    val nodes = e.select(col("src").as("node_id")).distinct().localCheckpoint()
    var affected = changedEdges.select(col("dst").as("node_id")).distinct()
      .join(nodes, Seq("node_id"), "left_semi").localCheckpoint()

    var state = normalized(
      nodes.select(col("node_id") +: eCols(dim).zipWithIndex.map {
        case (c, j) => baseEntry(col("node_id"), j, seed).as(c)
      }: _*), dim).localCheckpoint()
    val patched = scala.collection.mutable.ArrayBuffer[DataFrame](state)

    for (k <- 1 until levels) {
      if (k > 1) // state_k(v) also moves when an in-neighbor moved at k-1
        affected = affected.unionAll(
          e.select(col("src").as("node_id"), col("dst"))
            .join(affected, Seq("node_id"), "left_semi")
            .select(col("dst").as("node_id")))
          .distinct().localCheckpoint()
      val msgs = e
        .join(affected.select(col("node_id").as("dst")), Seq("dst"), "left_semi")
        .join(patched(k - 1).withColumnRenamed("node_id", "src"), Seq("src"))
      val agg = msgs
        .groupBy(col("dst").as("node_id"))
        .agg(sum(col("weight")).as("_w"),
          eCols(dim).map(c => sum(col(c) * col("weight")).as(c)): _*)
      val mean = agg.select(col("node_id") +: eCols(dim).map(c =>
        (col(c) / col("_w")).as(c)): _*)
      val recomputed = normalized(mean, dim)
        .join(affected, Seq("node_id"), "right")
        .na.fill(0.0, eCols(dim))
      state = old.states(k)
        .join(nodes, Seq("node_id"), "left_semi")
        .join(affected, Seq("node_id"), "left_anti")
        .select(col("node_id") +: eCols(dim).map(col): _*)
        .unionAll(recomputed.select(col("node_id") +: eCols(dim).map(col): _*))
        .localCheckpoint()
      patched += state
    }

    // re-combine the final embedding for the affected closure only —
    // the same left-to-right weight fold embedStates runs
    var combined = patched(0).join(affected, Seq("node_id"), "left_semi")
      .select(col("node_id") +: eCols(dim).map(c =>
        (col(c) * iterationWeights.head).as(s"acc_$c")): _*)
    for (k <- 1 until levels)
      combined = combined.join(patched(k), Seq("node_id"))
        .select(col("node_id") +: eCols(dim).map(c =>
          (col(s"acc_$c") + col(c) * iterationWeights(k)).as(s"acc_$c")): _*)
    val embedding = old.embedding
      .join(nodes, Seq("node_id"), "left_semi")
      .join(affected, Seq("node_id"), "left_anti")
      .unionAll(finishEmbedding(combined, dim))
    FastRpState(patched.toSeq, embedding)
  }

  /** Session-cached FULL bipartite embedding frame — ENCODED node ids
    * (user → 2·id, book → 2·id + 1), exactly the id space the GDS
    * `['User','Book']`/RATED projection uses (`GdsCatalog.graphProject`
    * encodes id·L + labelIndex with the same label order), so this ONE
    * build feeds both [[userEmbeddings]] and `GdsSession.fastRpWrite`
    * (build once, register twice — the r8 silver-creep lever). */
  def bipartiteEmbeddings(spark: org.apache.spark.sql.SparkSession, dir: String,
      dim: Int = 64): DataFrame =
    graft.Cache.cached(spark, dir, s"fastrp_bipartite_$dim") {
      embed(Algorithms.bipartiteEdges(spark, dir), dim)
    }

  /** FastRP embeddings for the USER side of the bipartite ratings graph
    * (the reference writes embeddings to all nodes, then runs KNN over
    * users only — `Alg_KNN_FastRP.py:83-97`). Session-cached; derives
    * from [[bipartiteEmbeddings]] (the decode is a map-only filter). */
  def userEmbeddings(spark: org.apache.spark.sql.SparkSession, dir: String,
      dim: Int = 64): DataFrame =
    graft.Cache.cached(spark, dir, s"fastrp_user_$dim") {
      bipartiteEmbeddings(spark, dir, dim)
        .filter(pmod(col("node_id"), lit(2)) === 0)
        .select((col("node_id") / 2).cast("bigint").as("user_id"), col("embedding"))
    }
}
