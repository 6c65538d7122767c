package graft.graph

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
  * REPRESENTATION (the r6 scale rewrite, measured ~3× at sf0.1): a
  * node's feature set rides ONE long bitmask, not (v, b) rows. Per
  * iteration: one edges⋈masks join carrying |E| longs, one bit_or
  * aggregate (map-side combining) to the |V|-sized neighborhood masks,
  * then every draw's min-hash selection happens INSIDE codegen — the
  * md5 order over (iter, draw, bit) depends only on constants, so the
  * per-draw bit permutation is computed ONCE on the driver and
  * compiled into a first-active-bit-in-order CASE chain. The earlier
  * row form shuffled |E|·avg-bits rows and hashed md5 per
  * (v, b, draw) row; this form shuffles |E| longs and hashes md5
  * `draws`·`bitUniverse` times per round TOTAL. Selection semantics
  * are bit-identical (same hashes, same ascending-bit tie order), so
  * the unrolled oracle is unchanged.
  */
object HashGnn {

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Deterministic sparse init as a bitmask: bit b is active for node v
    * iff the first 8 md5 hex chars of "v:b:init", read as a uint32
    * fraction, fall below `density` — the md5-threshold idiom the
    * source_mix keep-rule uses. Empty masks are KEPT as m = 0 rows, on
    * purpose: a `filter(m =!= 0)` here becomes a plan CONSTRAINT that
    * localCheckpoint preserves and InferFiltersFromConstraints then
    * pushes through the propagate join — re-evaluating the whole
    * 32-md5 mask expression per EDGE row (measured ~100M md5s, 10 s at
    * sf0.1). m = 0 rows are semantically inert (they OR nothing into a
    * neighborhood and explode to no output rows). */
  def initMasks(nodes: DataFrame, bitUniverse: Int, density: Double): DataFrame = {
    val mask = (0 until bitUniverse).map { b =>
      when(graft.plans.Md5Bits.md5Bits(concat(col("v").cast("string"),
          lit(s":$b:init")), 8).cast("double") / 4294967296.0 < density,
        lit(1L << b)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    nodes.select(col("v"), mask.as("m"))
  }

  /** One min-hash propagation round over masks: neighborhood mask =
    * bit_or of neighbor masks; each draw selects the minimal active bit
    * under its md5 ordering (ranks are distinct, so no tie; the row
    * form's min(struct(h, b)) picked the same bit); the new mask ORs
    * the selections.
    *
    * The selection is FLAT arithmetic, not a nested CASE chain: the
    * active-bit list is materialised once per row, and each draw takes
    * array_min over (rank(b)·64 + b) with the driver-computed rank
    * permutation inlined as an array literal — min by rank, decoded
    * with % 64. (A 32-deep when/otherwise chain per draw was measured
    * at ~16 s of Janino compilation per round; this form generates
    * small flat code.) */
  def propagateMasks(edges: DataFrame, masks: DataFrame, draws: Int,
      iter: Int, bitUniverse: Int): DataFrame = {
    val nbr = edges
      .join(masks.select(col("v").as("dst"), col("m")), Seq("dst"))
      .groupBy(col("src"))
      .agg(expr("bit_or(m)").as("nm"))
      .select(col("src").as("v"), expr(
        s"filter(sequence(0, ${bitUniverse - 1}), b -> (nm >> b) & 1 = 1)").as("bs"))
    val newMask = (1 to draws).map { d =>
      val order = (0 until bitUniverse).sortBy(b => md5Hex(s"$iter:$d:$b"))
      val rank = Array.ofDim[Int](bitUniverse)
      order.zipWithIndex.foreach { case (b, i) => rank(b) = i }
      val rankList = rank.mkString("array(", ",", ")")
      s"shiftleft(1L, array_min(transform(bs, b -> element_at($rankList, b + 1) * 64 + b)) % 64)"
    }.mkString("(", " | ", ")")
    // empty bs (all-zero neighborhood) yields a NULL array_min → NULL
    // mask; coalesce to 0 and KEEP the row — see initMasks for why a
    // filter on the mask expression here would poison the next round's
    // join via constraint pushdown
    nbr.select(col("v"), coalesce(expr(newMask), lit(0L)).as("m"))
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
    require(iters >= 1 && draws >= 1 && bitUniverse >= 1 && bitUniverse <= 63)
    val e = edges.select(col("src"), col("dst"))
    // materialise the node set BEFORE the 32-hash mask projection: over
    // the live union+distinct plan the same projection measured ~20×
    // slower (the big expression lands inside the aggregate stage)
    val nodes = e.select(col("src").as("v"))
      .union(e.select(col("dst").as("v"))).distinct().localCheckpoint()
    var masks = initMasks(nodes, bitUniverse, density).localCheckpoint()
    for (i <- 1 to iters)
      masks = propagateMasks(e, masks, draws, i, bitUniverse).localCheckpoint()
    masks
      .select(col("v").as("node_id"), explode(expr(
        s"filter(sequence(0, ${bitUniverse - 1}), b -> (m >> b) & 1 = 1)")).as("bit"))
      .orderBy(col("node_id"), col("bit"))
  }

  /** HashGNN embeddings of the user co-occurrence graph,
    * session-cached (r11: shared by the `hashgnn_embeddings` entry and
    * the `gds.hashgnn` front door). */
  def userHashGnn(spark: SparkSession, dir: String): DataFrame =
    graft.Cache.cached(spark, dir, "hashgnn_embeddings") {
      embeddings(RatingsGraph.cooccurrenceEdges(spark, dir)
        .select(col("u1").as("src"), col("u2").as("dst")))
    }
}
