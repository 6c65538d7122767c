package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hash-based message-passing node embeddings — the `gds.beta.hashgnn`
  * family: binary feature vectors refined by MIN-HASH aggregation over
  * neighborhoods instead of trained weight matrices. Each iteration,
  * each of `draws` global hash orderings picks the neighborhood's
  * minimal active bit; similar neighborhoods therefore select similar
  * bit sets (min-hash preserves Jaccard similarity), which is the whole
  * GNN-without-training trick. Deterministic end to end — every draw is
  * an md5 order — so TWO full iterations unroll into an exact DuckDB
  * oracle (the only GNN-class operator in the suite with a bit-exact
  * correctness gate, not a quality gate). Deviation from GDS noted: GDS
  * mixes self-features in with a sampled probability; this variant is
  * neighbors-only (heterogeneous relationship weighting is out of
  * scope).
  *
  * Scale shape per iteration: one edges⋈bits join (|E|·avg-bits rows,
  * shuffle on the neighbor key), one (node, draw) hash aggregate —
  * constants `bitUniverse`/`draws` bound the blow-up. No driver state;
  * iterations compose lazily with a localCheckpoint between rounds.
  */
object HashGnn {

  /** Deterministic sparse init: bit b is active for node v iff the
    * first 8 md5 hex chars of "v:b:init", read as a uint32 fraction,
    * fall below `density` — the md5-threshold idiom the source_mix
    * keep-rule uses (near-monotone multiplicative hashes filtered
    * nothing on dense ids; md5 has no such failure mode). */
  def initBits(nodes: DataFrame, bitUniverse: Int, density: Double): DataFrame =
    nodes.select(col("v"), explode(expr(s"sequence(0, ${bitUniverse - 1})")).as("b"))
      .filter(conv(substring(md5(concat(col("v").cast("string"), lit(":"),
          col("b").cast("string"), lit(":init"))), 1, 8), 16, 10)
        .cast("bigint").cast("double") / 4294967296.0 < density)

  /** One min-hash propagation round: for each node and each of `draws`
    * global md5 orderings over bits, select the minimal active bit in
    * the neighborhood; the new feature set is the union of selections. */
  def propagate(edges: DataFrame, bits: DataFrame, draws: Int, iter: Int): DataFrame = {
    val nbrBits = edges
      .join(bits.select(col("v").as("dst"), col("b")), Seq("dst"))
      .select(col("src").as("v"), col("b")).distinct()
    nbrBits
      .select(col("v"), col("b"), explode(expr(s"sequence(1, $draws)")).as("d"))
      .withColumn("h", md5(concat_ws(":", lit(iter), col("d"), col("b"))))
      .groupBy(col("v"), col("d"))
      .agg(min(struct(col("h"), col("b"))).as("sel"))
      .select(col("v"), col("sel.b").as("b")).distinct()
  }

  /** Full HashGNN over a directed (src, dst) edge frame (pass both
    * directions for undirected semantics): `iters` min-hash rounds from
    * the deterministic init. Output (node_id, bit), exploded + ordered.
    *
    * The init covers src ∪ dst, so a dst-only node's features DO flow
    * into its in-neighbors. Nodes with no out-edges (and nodes whose
    * neighborhood holds no active bits after a round) have an EMPTY
    * feature set and therefore no output rows — inherent to
    * neighbors-only min-hash aggregation, not an omission. */
  def embeddings(edges: DataFrame, bitUniverse: Int = 32, draws: Int = 8,
      iters: Int = 2, density: Double = 0.25): DataFrame = {
    require(iters >= 1 && draws >= 1 && bitUniverse >= 1)
    val e = edges.select(col("src"), col("dst"))
    val nodes = e.select(col("src").as("v"))
      .union(e.select(col("dst").as("v"))).distinct()
    var bits = initBits(nodes, bitUniverse, density).localCheckpoint()
    for (i <- 1 to iters)
      bits = propagate(e, bits, draws, i).localCheckpoint()
    bits.select(col("v").as("node_id"), col("b").as("bit"))
      .orderBy(col("node_id"), col("bit"))
  }

  /** HashGNN embeddings of the user co-occurrence graph. */
  def userHashGnn(spark: SparkSession, dir: String): DataFrame =
    embeddings(RatingsGraph.cooccurrenceEdges(spark, dir)
      .select(col("u1").as("src"), col("u2").as("dst")))
}
