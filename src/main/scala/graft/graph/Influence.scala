package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Influence maximization over the co-occurrence graph — the engine
  * twin of `gds.influenceMaximization.celf` (seed-set selection under
  * the independent-cascade model; the reference's GDS tier ships CELF
  * as a beta algorithm).
  *
  * CELF proper is lazy-greedy over Monte-Carlo cascade spreads —
  * sequential simulation state per candidate, the wrong shape for a
  * cluster. The published scale path is REVERSE INFLUENCE SAMPLING
  * (Borgs et al. 2014; Tang et al.'s TIM/IMM): sample R random
  * reverse-reachable (RR) sets, then greedy max-coverage over them —
  * the same (1−1/e)-style objective, but the sampling is a bounded
  * multi-source reverse BFS (pure dataflow) and the greedy is k tiny
  * argmax rounds. That is what this implements, with every random
  * choice an md5 draw so the whole operator replays bit-exactly in
  * SQL:
  *
  *  - cascade model: WEIGHTED CASCADE (Kempe–Kleinberg–Tardos 2003),
  *    p(u→v) = w(u,v)/indeg_w(v) — expected ONE live in-edge per node,
  *    so RR sets stay O(depth) and the wave joins never blow up at any
  *    graph size;
  *  - RR roots: per-simulation argmin of md5(r:root:node) over all
  *    nodes (one |V|·R scan, the rwr_sample idiom);
  *  - edge liveness in simulation r: 32-bit md5 fraction of
  *    (im:r:src:dst) compared against w/k — float division only,
  *    correctly rounded identically in both engines;
  *  - reverse BFS truncated at `depth` waves (a parameterized
  *    operating point — honest truncation, NOT the (ε,δ) sample-size
  *    guarantee of IMM, which needs R chosen from the graph);
  *  - greedy max-coverage: k rounds of (count distinct RR ids per
  *    node) → argmax (gain DESC, node ASC) → drop covered RR sets.
  *    Each round's argmax is a 1-row driver pull (the centroid-pull
  *    pattern); rounds after coverage is exhausted emit nothing, in
  *    both engines.
  *
  * Scale: the |V|·R root scan and the Σindeg(frontier) wave joins are
  * the only non-trivial legs; both shuffle on the simulation/node key
  * and R is a constant. No all-pairs, no global sort, no keyless
  * window. */
object Influence {

  /** Top-`seeds` influence seeds with their marginal RR-set coverage.
    * Expects the bidirectional weighted edge list; returns
    * (rank, node_id, gain) ordered by rank. */
  def influenceSeeds(weightedEdges: DataFrame, sims: Int = 64,
      depth: Int = 3, seeds: Int = 5): DataFrame = {
    val spark = weightedEdges.sparkSession
    import spark.implicits._
    val edges = weightedEdges
      .select(col("src"), col("dst"), col("weight").cast("long"))
      .filter(col("weight") > 0L)
      .persist(StorageLevel.MEMORY_AND_DISK)
    // weighted-degree by dst = indeg_w (bidir list ⇒ also covers all
    // nodes for the root scan)
    val deg = edges.groupBy(col("dst").as("node_id"))
      .agg(sum(col("weight")).as("k"))
      .localCheckpoint()
    // per-edge acceptance threshold w/k, built once and reused by all
    // waves of all simulations
    val edgeP = edges
      .join(deg.select(col("node_id").as("dst"), col("k")), Seq("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val roots = deg
      .select(col("node_id"), explode(sequence(lit(0), lit(sims - 1))).as("r"))
      .groupBy(col("r"))
      .agg(min_by(col("node_id"),
        md5(concat_ws(":", col("r"), lit("root"), col("node_id")))).as("node_id"))
    var frontier = roots.select(col("r"), col("node_id")).localCheckpoint()
    var members = frontier
    for (_ <- 1 to depth) {
      // node u joins RR set r when its OUT-edge u→y to a member y is
      // live: 32-bit md5 fraction of (im:r:u:y) under w/k(y)
      val u32 = (graft.plans.Md5Bits.md5Bits(concat_ws(":", lit("im"),
        col("r"), col("src"), col("dst")), 8).cast("double") + 0.5) /
        lit(4294967296.0)
      val cand = frontier.select(col("r"), col("node_id").as("dst"))
        .join(edgeP, Seq("dst"))
        .filter(u32 < col("weight").cast("double") / col("k").cast("double"))
        .select(col("r"), col("src").as("node_id"))
        .distinct()
      val fresh = cand.except(members).localCheckpoint()
      members = members.unionAll(fresh).localCheckpoint()
      frontier = fresh
    }
    edges.unpersist(blocking = false)
    edgeP.unpersist(blocking = false)
    // greedy max-coverage, k 1-row pulls; ranks stop early (in both
    // engines) once every RR set is covered
    var m = members
    val out = scala.collection.mutable.ArrayBuffer[(Int, Long, Long)]()
    for (j <- 1 to seeds) {
      val top = m.groupBy(col("node_id"))
        .agg(countDistinct(col("r")).as("gain"))
        .orderBy(col("gain").desc, col("node_id"))
        .limit(1).collect()
      if (top.nonEmpty) {
        val nid = top(0).getAs[Number]("node_id").longValue
        val gain = top(0).getAs[Number]("gain").longValue
        out += ((j, nid, gain))
        val covered = m.filter(col("node_id") === nid).select(col("r")).distinct()
        m = m.join(covered, Seq("r"), "left_anti").localCheckpoint()
      }
    }
    out.toSeq.toDF("seed_rank", "node_id", "gain").orderBy(col("seed_rank"))
  }

  /** Influence seeds of the user co-occurrence graph, session-cached. */
  def userInfluenceSeeds(spark: SparkSession, dir: String): DataFrame =
    graft.Cache.cached(spark, dir, "influence_seeds") {
      influenceSeeds(RatingsGraph.cooccurrenceEdges(spark, dir)
        .select(col("u1").as("src"), col("u2").as("dst"), col("weight")))
    }
}
