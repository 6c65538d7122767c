package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Bridges, articulation points, and 2-edge/biconnected structure —
  * `gds.bridges` / `gds.articulationPoints` re-expressed as dataflow.
  *
  * Sequential solvers are one Tarjan DFS, but a DFS is the one thing a
  * 1000-executor cluster cannot do; this is the Tarjan–Vishkin (1985)
  * equivalence instead, built from pieces the engine already has:
  *
  *  1. a rooted BFS spanning forest (min-id roots, min-id parents —
  *     deterministic, diameter-bounded rounds);
  *  2. every NON-tree edge's fundamental cycle, materialised as the
  *     tree-edge path between its endpoints by iterative LCA lifting
  *     (each round lifts the deeper endpoint one level; total work is
  *     Σ path lengths = O(E·diameter), the honest bound — on the
  *     small-world graphs this engine serves, diameter is O(log n).
  *     TV's O(E) Euler-tour shortcut is the upgrade path if a target
  *     graph ever has long chains);
  *  3. one distributed connected-components pass over the bipartite
  *     (fundamental-cycle ↔ tree-edge) incidence — TV Lemma 1: the
  *     transitive closure of "shares a fundamental cycle" partitions
  *     tree edges into exactly the biconnected blocks.
  *
  * Everything downstream is a lookup: a tree edge on NO fundamental
  * cycle is a bridge; a vertex incident to ≥ 2 blocks (bridge edges
  * count as singleton blocks) is an articulation point — the block–cut
  * tree characterisation.
  *
  * Runs as an exactly-oracled entry on the SQL-derivable co-occurrence
  * BACKBONE (weight ≥ minWeight), where DuckDB can brute-force per-edge
  * / per-vertex removal reachability as recursive CTEs; the operator
  * itself takes any (src, dst) edge frame.
  */
object Biconnectivity {

  /** Thresholded co-occurrence backbone: the sparse, SQL-derivable
    * subgraph (strong ties only) that bridge/cut analysis targets —
    * at full scale the threshold keeps E ~ V, exactly the regime where
    * bridges exist and matter. Canonical src < dst. */
  def userBackbone(spark: SparkSession, dir: String, minWeight: Int = 3): DataFrame =
    RatingsGraph.cooccurrenceEdges(spark, dir)
      .filter(col("u1") < col("u2") && col("weight") >= minWeight)
      .select(col("u1").as("src"), col("u2").as("dst"))

  /** Rooted BFS spanning forest: (node_id, parent, depth), parent =
    * node_id for the per-component root (the component's min node id).
    * Deterministic: ties go to the min-id parent; rounds = diameter. */
  def rootedForest(edges: DataFrame, maxIter: Int = 120): DataFrame = {
    val bidir = edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .repartition(col("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      // sparse backbones can be path-shaped; give min-label CC the
      // high-diameter headroom
      val comp = Algorithms.connectedComponents(edges, maxIter = 60)
      var visited = Algorithms.checkpointFresh(
        comp.filter(col("node_id") === col("component"))
          .select(col("node_id"), col("node_id").as("parent"), lit(0L).as("depth")))
      var frontier = visited
      var round = 0
      var done = false
      while (!done && round < maxIter) {
        round += 1
        val next = Algorithms.checkpointFresh(bidir
          .join(frontier.select(col("node_id").as("src")), Seq("src"))
          .select(col("dst").as("node_id"), col("src").as("parent"))
          .join(visited.select(col("node_id")), Seq("node_id"), "left_anti")
          .groupBy(col("node_id")).agg(min(col("parent")).as("parent"))
          .withColumn("depth", lit(round.toLong)))
        if (next.isEmpty) done = true
        else {
          visited = Algorithms.checkpointFresh(visited.unionAll(next))
          frontier = next
        }
      }
      require(done, s"rootedForest did not converge in $maxIter rounds")
      visited
    } finally bidir.unpersist()
  }

  /** Tree edges labelled with their biconnected block:
    * (child, parent, block, cyclic) — `child` uniquely identifies the
    * tree edge (child, parent(child)); `block` is the min tree-edge
    * child id in the biconnected class; `cyclic` is false exactly for
    * bridges (block == child alone does NOT mean bridge — a cyclic
    * class's min member also carries its own id). */
  def treeBlocks(edges: DataFrame, maxLift: Int = 240): DataFrame = {
    val spark = edges.sparkSession
    val e = edges
      .select(least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst"))
      .filter(col("src") =!= col("dst")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val forest = rootedForest(e)
      val par = forest.persist(StorageLevel.MEMORY_AND_DISK)
      try {
        val treeEdges = par.filter(col("node_id") =!= col("parent"))
        val treeCanon = treeEdges.select(
          least(col("node_id"), col("parent")).as("src"),
          greatest(col("node_id"), col("parent")).as("dst"))
        // fundamental-cycle generators; path ids offset above every real
        // node id so a block class's min label is always a tree edge
        val maxIdRow = e.agg(max(greatest(col("src"), col("dst")))).head()
        if (maxIdRow.isNullAt(0)) return spark.emptyDataFrame
          .select(lit(0L).as("child"), lit(0L).as("parent"),
            lit(0L).as("block"), lit(false).as("cyclic")).limit(0)
        val base = maxIdRow.getLong(0) + 1L
        val nontree = e.join(treeCanon, Seq("src", "dst"), "left_anti")
          .withColumn("path_id", monotonically_increasing_id() + lit(base))
        var active = Algorithms.checkpointFresh(nontree
          .join(par.select(col("node_id").as("src"), col("depth").as("da")), Seq("src"))
          .join(par.select(col("node_id").as("dst"), col("depth").as("db")), Seq("dst"))
          .select(col("path_id"), col("src").as("a"), col("da"),
            col("dst").as("b"), col("db")))
        var emitted = spark.range(0)
          .select(col("id").as("path_id"), col("id").as("child")).limit(0)
        var lift = 0
        while (!active.isEmpty) {
          lift += 1
          require(lift <= maxLift, s"treeBlocks path lifting exceeded $maxLift rounds")
          // the deeper endpoint lifts one level (both on a depth tie);
          // each lift walks one tree edge of the fundamental cycle
          emitted = emitted
            .unionAll(active.filter(col("da") >= col("db"))
              .select(col("path_id"), col("a").as("child")))
            .unionAll(active.filter(col("db") >= col("da"))
              .select(col("path_id"), col("b").as("child")))
          if (lift % 8 == 0) emitted = Algorithms.checkpointFresh(emitted)
          active = Algorithms.checkpointFresh(active
            .join(par.select(col("node_id").as("a"), col("parent").as("pa")), Seq("a"))
            .join(par.select(col("node_id").as("b"), col("parent").as("pb")), Seq("b"))
            .select(col("path_id"),
              when(col("da") >= col("db"), col("pa")).otherwise(col("a")).as("a"),
              when(col("da") >= col("db"), col("da") - 1).otherwise(col("da")).as("da"),
              when(col("db") >= col("da"), col("pb")).otherwise(col("b")).as("b"),
              when(col("db") >= col("da"), col("db") - 1).otherwise(col("db")).as("db"))
            .filter(col("a") =!= col("b")))
        }
        emitted = Algorithms.checkpointFresh(emitted)
        // TV Lemma 1: CC over the (cycle, tree-edge) incidence = blocks
        // (chains of overlapping cycles can be long → 60-round headroom)
        val cc = Algorithms.connectedComponents(
          emitted.select(col("path_id").as("src"), col("child").as("dst")),
          maxIter = 60)
        Algorithms.checkpointFresh(treeEdges
          .select(col("node_id").as("child"), col("parent"))
          .join(cc.select(col("node_id").as("child"), col("component").as("block")),
            Seq("child"), "left")
          .select(col("child"), col("parent"),
            coalesce(col("block"), col("child")).as("block"),
            col("block").isNotNull.as("cyclic")))
      } finally par.unpersist()
    } finally e.unpersist()
  }

  /** Bridge projection of a treeBlocks frame: tree edges on no
    * fundamental cycle, canonical src < dst. (Every non-tree edge
    * closes a cycle, so bridges are always tree edges.) */
  private def bridgesOf(tb: DataFrame): DataFrame =
    tb.filter(!col("cyclic"))
      .select(least(col("child"), col("parent")).as("src"),
        greatest(col("child"), col("parent")).as("dst"))
      .orderBy(col("src"), col("dst"))

  /** Articulation projection of a treeBlocks frame: vertices incident
    * to >= 2 biconnected blocks (bridge edges count as singleton
    * blocks) — the block–cut tree characterisation. */
  private def articulationPointsOf(tb: DataFrame): DataFrame =
    tb.select(col("block"), col("child").as("node_id"))
      .unionAll(tb.select(col("block"), col("parent").as("node_id")))
      .distinct()
      .groupBy(col("node_id"))
      .agg(countDistinct(col("block")).as("n_blocks"))
      .filter(col("n_blocks") >= 2)
      .select(col("node_id"))
      .orderBy(col("node_id"))

  /** Bridge edges of any (src, dst) frame. */
  def bridges(edges: DataFrame): DataFrame = bridgesOf(treeBlocks(edges))

  /** Articulation points of any (src, dst) frame. */
  def articulationPoints(edges: DataFrame): DataFrame =
    articulationPointsOf(treeBlocks(edges))

  /** Session-cached block analysis of the backbone (bridges and cut
    * vertices share the one treeBlocks pass). */
  def userTreeBlocks(spark: SparkSession, dir: String): DataFrame =
    graft.Cache.cached(spark, dir, "bicon_tree_blocks") {
      treeBlocks(userBackbone(spark, dir))
    }

  /** Backbone bridges from the cached analysis. */
  def userBridges(spark: SparkSession, dir: String): DataFrame =
    bridgesOf(userTreeBlocks(spark, dir))

  /** Backbone articulation points from the cached analysis. */
  def userArticulationPoints(spark: SparkSession, dir: String): DataFrame =
    articulationPointsOf(userTreeBlocks(spark, dir))
}
