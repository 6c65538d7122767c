package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Louvain community detection (Blondel et al. 2008), DataFrame-native —
  * the faithful counterpart of the reference's `gds.louvain.write`
  * (`algorithms/Alg_Community_Detection.py:40-45`).
  *
  * Each level: synchronous modularity-gain local moving (every node
  * evaluates ΔQ of adopting each neighbour community, moves to the best
  * strictly-positive gain, smallest community id on ties), then the
  * graph is coarsened by community and the next level runs on the
  * community graph; final labels unfold through the levels.
  *
  * All steps are joins + aggregations keyed on node/community id —
  * linear in |E| per sweep, no driver-side graph state, deterministic
  * (no RNG, fixed sweep counts, total tie orders).
  */
object Louvain {

  /** One level of SEMI-synchronous local moving: per sweep only nodes of
    * one hash-parity class apply their best move (the standard fix for
    * the symmetric-oscillation pathology of fully synchronous moving —
    * two clique members would otherwise chase each other's labels
    * forever). Deterministic: parity from xxhash64, fixed sweep count,
    * total tie orders. Edges must be bidirectional with strictly
    * positive weights. Returns (node_id, comm). */
  private def localMoving(edges: DataFrame, sweeps: Int): DataFrame = {
    // pre-partition on dst: the per-sweep edge⋈labels join then only
    // shuffles the (tiny) labels side
    val e = edges.select(col("src"), col("dst"), col("weight").cast("double"))
      .repartition(col("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val m2Row = e.agg(sum(col("weight"))).head()
    if (m2Row.isNullAt(0)) { // empty edge list: nothing to label
      e.unpersist(blocking = false)
      return e.select(col("src").as("node_id"), col("src").as("comm"))
    }
    val m2 = m2Row.getDouble(0) // = 2m
    // labels CARRY the node degree k — saves a nodeDeg join per sweep
    var labels = e.groupBy(col("src").as("node_id"))
      .agg(sum(col("weight")).as("k"))
      .select(col("node_id"), col("node_id").as("comm"), col("k"))
      .localCheckpoint()
    var sweep = 1
    var zeroMoveSweeps = 0
    // early exit: two consecutive zero-move sweeps = both parity
    // classes are happy → a further sweep cannot change anything
    while (sweep <= sweeps && zeroMoveSweeps < 2) {
      val commDeg = labels.groupBy(col("comm")).agg(sum(col("k")).as("sigma_tot"))
      // weight from each node to each neighbouring community, plus a
      // zero self-vote row so "stay" is always a candidate — ONE
      // aggregation (the zero rows ride the same shuffle). SELF-LOOPS
      // are excluded from the votes: a supernode's internal weight moves
      // with it, so it contributes identically to every candidate and
      // must be counted for k/m2 but for NO w_nc (crediting it to "stay"
      // only would bias against merging at coarse levels).
      val toComm = e
        .filter(col("src") =!= col("dst"))
        .join(labels.select(col("node_id").as("dst"), col("comm").as("cand")), Seq("dst"))
        .select(col("src").as("node_id"), col("cand"), col("weight"))
        .unionAll(labels.select(col("node_id"), col("comm").as("cand"), lit(0.0).as("weight")))
        .groupBy(col("node_id"), col("cand"))
        .agg(sum(col("weight")).as("w_nc"))
      val scored = toComm
        .join(labels, Seq("node_id"))
        .join(commDeg.withColumnRenamed("comm", "cand"), Seq("cand"))
        // ΔQ ∝ w_nc − k · Σ_tot(cand \ node) / 2m ; remove the node's own
        // degree from its current community's total
        .withColumn("sigma_adj",
          when(col("cand") === col("comm"), col("sigma_tot") - col("k"))
            .otherwise(col("sigma_tot")))
        .withColumn("gain", col("w_nc") - col("k") * col("sigma_adj") / m2)
      // argmax via max_by on a totally-ordered struct (gain desc, cand
      // asc) — a hash aggregate with map-side partials, not a window
      // sort over every candidate row
      val best = scored.groupBy(col("node_id"))
        .agg(max_by(col("cand"),
          struct(col("gain"), (-col("cand")).as("nc"))).as("best_comm"))
        .localCheckpoint() // materialise once: probe + update both reuse
      val parityMoves = labels.join(best, Seq("node_id"))
        .filter(pmod(xxhash64(col("node_id")), lit(2)) === lit(sweep % 2) &&
          col("best_comm") =!= col("comm"))
      if (parityMoves.limit(1).isEmpty) {
        zeroMoveSweeps += 1 // labels unchanged — skip the rewrite
      } else {
        zeroMoveSweeps = 0
        labels = labels.join(best, Seq("node_id"))
          .withColumn("moves", pmod(xxhash64(col("node_id")), lit(2)))
          .select(col("node_id"),
            when(col("moves") === lit(sweep % 2), col("best_comm"))
              .otherwise(col("comm")).as("comm"),
            col("k"))
          .localCheckpoint()
      }
      sweep += 1
    }
    if (zeroMoveSweeps >= 2)
      System.err.println(s"[graft] louvain local moving converged after ${sweep - 1} sweeps")
    e.unpersist(blocking = false)
    labels.select(col("node_id"), col("comm"))
  }

  /** Full Louvain: `levels` rounds of local moving + coarsening.
    * Returns (node_id, community) with communities labelled by their
    * minimum member node id. */
  def louvain(edges: DataFrame, levels: Int = 2, sweeps: Int = 6): DataFrame = {
    var currentEdges = edges.select(col("src"), col("dst"), col("weight").cast("double"))
      .filter(col("weight") > 0.0)
    // (empty input needs no upfront action: localMoving's null-safe m2
    // probe returns the empty labels frame and everything composes)
    // mapping from original node to current-level node
    var mapping: DataFrame = null
    for (level <- 0 until levels) {
      val labels = localMoving(currentEdges, sweeps)
      mapping =
        if (mapping == null) labels.select(col("node_id"), col("comm"))
        else mapping.select(col("node_id"), col("comm").as("mid"))
          // LEFT join + coalesce: a level-0 community with no
          // inter-community edges never appears in the coarsened graph
          // and gets no higher-level label — it must keep its own label,
          // not vanish (GDS labels every projected node)
          .join(labels.select(col("node_id").as("mid"), col("comm")), Seq("mid"), "left")
          .select(col("node_id"), coalesce(col("comm"), col("mid")).as("comm"))
      mapping = mapping.localCheckpoint()
      if (level < levels - 1) {
        // coarsen: one node per community, aggregated weights — KEEPING
        // self-loops (intra-community weight): Blondel et al. carry them,
        // and dropping them shrinks a supernode's k and the global m
        // non-proportionally, which can flip higher-level move decisions
        currentEdges = currentEdges
          .join(labels.select(col("node_id").as("src"), col("comm").as("src_c")), Seq("src"))
          .join(labels.select(col("node_id").as("dst"), col("comm").as("dst_c")), Seq("dst"))
          .groupBy(col("src_c").as("src"), col("dst_c").as("dst"))
          .agg(sum(col("weight")).as("weight"))
          .localCheckpoint()
      }
    }
    finishLabels(mapping)
  }

  /** Canonicalise community labels to the minimum member node id. */
  private def finishLabels(mapping: DataFrame): DataFrame = {
    // canonical community label = min member node id
    val canon = mapping.groupBy(col("comm"))
      .agg(min(col("node_id")).as("community"))
    mapping.join(canon, Seq("comm"))
      .select(col("node_id"), col("community"))
  }

  /** Louvain communities of the user co-occurrence graph, session-cached. */
  def userCommunities(spark: SparkSession, dir: String): DataFrame =
    graft.Cache.cached(spark, dir, "louvain_communities") {
      louvain(RatingsGraph.cooccurrenceEdges(spark, dir)
        .select(col("u1").as("src"), col("u2").as("dst"), col("weight")))
    }
}
