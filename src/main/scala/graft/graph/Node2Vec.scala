package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** node2vec EMBEDDINGS — completes the `gds.beta.node2vec` surface (the
  * GDS procedure the reference's FastRP sibling belongs to returns
  * VECTORS; graft's `node2vec_walks` entry produces the exactly-oracled
  * biased walk corpus, and this trains on it).
  *
  * Training is not SGD: skip-gram with negative sampling factorizes the
  * shifted PMI matrix of walk-context co-occurrence counts (Levy &
  * Goldberg, "Neural Word Embedding as Implicit Matrix Factorization",
  * NeurIPS 2014). graft computes that matrix EXACTLY from the walk
  * corpus — window-`window` context pairs, then
  * SPPMI(u,c) = max(0, log(n(u,c)·T / (n(u)·n(c))) − log(shift)) —
  * and embeds it with the same deterministic very-sparse random
  * projection FastRP uses (Chen et al., CIKM 2019):
  * e(u) = L2norm(Σ_c SPPMI(u,c) · R(c)), realised as one
  * [[FastRP.embed]] propagation step over the SPPMI-weighted context
  * graph. Executor-deterministic (no shared RNG, no gradient state),
  * two aggregates + one projection — every stage shuffle-keyed,
  * nothing driver-side, so the construction is corpus-size-free.
  *
  * Scale: the context self-join is keyed on walk_id (walks are
  * `steps+1` rows long — bounded fanout); the SPPMI weights need one
  * row-marginal aggregate and one broadcast scalar; the projection is
  * |ctx| rows through 64 codegen'd sums. Linear end to end.
  */
object Node2Vec {

  /** Window-`window` context PAIR COUNTS of a walk corpus:
    * (u, c, n_uc), symmetric by construction (the pair join emits both
    * orders). This is the incremental family's natural SILVER for
    * node2vec (T16): counts are ADDITIVE over walks — every (u, c)
    * co-occurrence belongs to exactly one walk — so a walk-corpus
    * delta folds exactly via [[mergeWalkPairCounts]] while the
    * expensive stages (biased walk generation for unchanged nodes, the
    * walk_id self-join over the full corpus) are skipped. */
  def walkPairCounts(walks: DataFrame, window: Int = 2): DataFrame = {
    require(window >= 1, "context window must be >= 1")
    val a = walks.select(col("walk_id"), col("step").as("si"), col("node_id").as("u"))
    val b = walks.select(col("walk_id"), col("step").as("sj"), col("node_id").as("c"))
    a.join(b, Seq("walk_id"))
      .filter(col("si") =!= col("sj") &&
        abs(col("si") - col("sj")) <= window)
      .groupBy(col("u"), col("c"))
      .agg(count(lit(1)).as("n_uc"))
  }

  /** T16 fold: the pair-count silver updated by a walk-corpus delta —
    * `counts + counts(addedWalks) − counts(removedWalks)`, zero rows
    * dropped. EXACT by additivity (long arithmetic, no float): fold ≡
    * full recompute on the union corpus, spec-proved. The SPPMI
    * weights themselves are NOT incremental — they depend on the
    * global total, so every weight shifts when the corpus grows — but
    * they (and the projection) derive from the folded counts in one
    * linear pass ([[embedFromCounts]]), which is the cheap tail of the
    * pipeline. One outer-join-shaped aggregate keyed (u, c); the added
    * /removed sides ship only the delta walks' windows. */
  def mergeWalkPairCounts(counts: DataFrame, addedWalks: DataFrame,
      removedWalks: DataFrame, window: Int = 2): DataFrame =
    counts.select(col("u"), col("c"), col("n_uc"))
      .unionAll(walkPairCounts(addedWalks, window))
      .unionAll(walkPairCounts(removedWalks, window)
        .select(col("u"), col("c"), (-col("n_uc")).as("n_uc")))
      .groupBy(col("u"), col("c"))
      .agg(sum(col("n_uc")).as("n_uc"))
      .filter(col("n_uc") > 0)

  /** SPPMI weights from a pair-count silver — the marginals and total
    * re-derive from the counts (one aggregate each), then
    * SPPMI(u,c) = max(0, log(n_uc·T / (n_u·n_c)) − log(shift)). */
  def sppmiFromCounts(counts: DataFrame, shift: Double = 1.0): DataFrame = {
    val rowSums = counts.groupBy(col("u")).agg(sum(col("n_uc")).as("n_u"))
    val colSums = counts.groupBy(col("c")).agg(sum(col("n_uc")).as("n_c"))
    val total = counts.agg(sum(col("n_uc")).as("n_all"))
    counts
      .join(rowSums, Seq("u"))
      .join(colSums, Seq("c"))
      .crossJoin(broadcast(total))
      .withColumn("sppmi",
        log(col("n_uc").cast("double") * col("n_all").cast("double") /
          (col("n_u").cast("double") * col("n_c").cast("double"))) - log(lit(shift)))
      .filter(col("sppmi") > 0)
      .select(col("u").as("src"), col("c").as("dst"), col("sppmi").as("weight"))
  }

  /** Embed a pair-count silver: SPPMI weights → one FastRP projection
    * step — [[embedWalks]]'s tail over a (possibly folded) count
    * frame. */
  def embedFromCounts(counts: DataFrame, dim: Int = 64,
      shift: Double = 1.0, seed: Int = 1337): DataFrame =
    FastRP.embed(sppmiFromCounts(counts, shift), dim,
      iterationWeights = Seq(0.0, 1.0), seed = seed)

  /** Window-`window` context pairs of a walk corpus with their SPPMI
    * weights: (src, dst, weight), symmetric by construction (the pair
    * join emits both orders). Zero-or-negative SPPMI pairs are dropped
    * — exactly the pairs SGNS learns nothing positive from. */
  def sppmiContexts(walks: DataFrame, window: Int = 2,
      shift: Double = 1.0): DataFrame =
    sppmiFromCounts(walkPairCounts(walks, window), shift)

  /** Embed a walk corpus: SPPMI context graph → one FastRP projection
    * step (iterationWeights [0,1] = project the SPPMI matrix onto the
    * sparse base vectors, L2-normalise). Returns
    * (node_id, embedding: array<double>). */
  def embedWalks(walks: DataFrame, dim: Int = 64, window: Int = 2,
      shift: Double = 1.0, seed: Int = 1337): DataFrame =
    FastRP.embed(sppmiContexts(walks, window, shift), dim,
      iterationWeights = Seq(0.0, 1.0), seed = seed)

  /** Session-cached node2vec embeddings of the user co-occurrence
    * graph: a 4-walks-per-node corpus with the same biased-draw
    * parameters as the oracled `node2vec_walks` entry (p=2, q=0.5 as
    * class weights wBack=1, wNbr=2, wOut=4), then [[embedWalks]].
    * Mirrors the reference family's embedding write-back
    * (`Alg_KNN_FastRP.py:62-70` is the FastRP sibling). */
  def userEmbeddings(spark: SparkSession, dir: String, dim: Int = 64): DataFrame =
    graft.Cache.cached(spark, dir, s"node2vec_emb_$dim") {
      embedGraph(RatingsGraph.cooccurrenceEdges(spark, dir)
          .select(col("u1").as("src"), col("u2").as("dst"), col("weight")), dim)
        .withColumnRenamed("node_id", "user_id")
    }

  /** Full node2vec over any both-directions weighted edge frame
    * (src, dst, weight) — the graph-in, (node_id, embedding)-out kernel
    * the GDS front door ([[graft.gds.GdsSession]] `gds.beta.node2vec`)
    * routes onto; [[userEmbeddings]] is this over the co-occurrence
    * projection. WEIGHTED draws (GDS node2vec's relationshipWeight): on
    * a near-clique projection the unweighted structure is close to
    * uniform — the signal lives in the edge weights, and unweighted
    * walks would embed noise (the quality gate catches exactly this). */
  def embedGraph(edges: DataFrame, dim: Int = 64): DataFrame = {
    val walks = Algorithms.node2vecWalkCorpus(edges,
      walksPerNode = 4, steps = 4, symmetric = true, weighted = true)
    val emb = embedWalks(walks, dim)
    // a node whose every context lands at non-positive SPPMI drops
    // out of the context graph; it still must embed (GDS returns a
    // vector for every projected node) — fall back to its unit-norm
    // base vector, so "one dim-64 unit vector per co-occurrence
    // user" stays an EXACT invariant (the node2vec_norms oracle)
    val nodes = edges.select(col("src").as("node_id")).distinct()
    val missing = nodes.join(emb.select(col("node_id")), Seq("node_id"), "left_anti")
    emb.unionAll(FastRP.baseVectors(missing, dim, seed = 1337))
  }
}
