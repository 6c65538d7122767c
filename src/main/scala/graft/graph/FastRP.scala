package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** FastRP (Fast Random Projection) node embeddings, matrix-free.
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
  *     states (GDS default iterationWeights ≈ [0.0, 1.0, 1.0]).
  *
  * Each step is one join + one map-side-combined groupBy on node id —
  * linear in |E|, no driver state, no collect.
  */
object FastRP {

  private val Sqrt3 = math.sqrt(3.0)

  /** Deterministic sparse base vector as a Column expression. */
  private def baseVector(nodeId: Column, dim: Int, seed: Int): Column = {
    val idx = sequence(lit(0), lit(dim - 1))
    transform(idx, j => {
      val h = pmod(xxhash64(nodeId, j, lit(seed)), lit(6))
      when(h === 0, lit(Sqrt3)).when(h === 1, lit(-Sqrt3)).otherwise(lit(0.0))
    })
  }

  /** Compute embeddings for every node in `edges` (src, dst, weight).
    * Edges should already contain both directions for undirected
    * semantics. Returns (node_id, embedding: array<double>). */
  def embed(edges: DataFrame, dim: Int = 64,
      iterationWeights: Seq[Double] = Seq(0.0, 1.0, 1.0), seed: Int = 42): DataFrame = {
    val e = edges.select(col("src"), col("dst"), col("weight").cast("double"))
      .localCheckpoint()
    val nodes = e.select(col("src").as("node_id")).distinct()

    var state = nodes
      .withColumn("emb", VectorOps.normalize(baseVector(col("node_id"), dim, seed)))
      .localCheckpoint()
    var combined = state.withColumn("acc",
      if (iterationWeights.head == 0.0) transform(col("emb"), _ => lit(0.0))
      else VectorOps.scale(col("emb"), lit(iterationWeights.head)))

    for (k <- 1 until iterationWeights.length) {
      // weighted mean of neighbour embeddings, then L2 normalise
      val msgs = e
        .join(state.withColumnRenamed("node_id", "src"), Seq("src"))
        .select(col("dst"), col("weight"), VectorOps.scale(col("emb"), col("weight")).as("wemb"))
      val agg = msgs
        .groupBy(col("dst").as("node_id"))
        .agg(VectorOps.vecSum(dim)(col("wemb")).as("sum_emb"), sum(col("weight")).as("w"))
        .select(col("node_id"),
          VectorOps.normalize(transform(col("sum_emb"), v => v / col("w"))).as("emb"))
      state = nodes.join(agg, Seq("node_id"), "left")
        .select(col("node_id"),
          coalesce(col("emb"), transform(sequence(lit(0), lit(dim - 1)), _ => lit(0.0))).as("emb"))
        .localCheckpoint()
      val w = iterationWeights(k)
      combined = combined.drop("emb").join(state, Seq("node_id"))
        .withColumn("acc", zip_with(col("acc"), col("emb"), (a, b) => a + b * lit(w)))
    }
    combined.select(col("node_id"), VectorOps.normalize(col("acc")).as("embedding"))
  }

  /** FastRP embeddings for the USER side of the bipartite ratings graph
    * (the reference writes embeddings to all nodes, then runs KNN over
    * users only — `Alg_KNN_FastRP.py:83-97`). */
  def userEmbeddings(spark: org.apache.spark.sql.SparkSession, dir: String,
      dim: Int = 64): DataFrame =
    embed(Algorithms.bipartiteEdges(spark, dir), dim)
      .filter(pmod(col("node_id"), lit(2)) === 0)
      .select((col("node_id") / 2).cast("bigint").as("user_id"), col("embedding"))
}
