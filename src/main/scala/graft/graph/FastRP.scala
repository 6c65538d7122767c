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

  /** Compute embeddings for every node in `edges` (src, dst, weight).
    * Edges should already contain both directions for undirected
    * semantics. Returns (node_id, embedding: array<double>). */
  def embed(edges: DataFrame, dim: Int = 64,
      iterationWeights: Seq[Double] = Seq(0.0, 1.0, 1.0, 1.0), seed: Int = 42): DataFrame = {
    val e = edges.select(col("src"), col("dst"), col("weight").cast("double"))
    val nodes = e.select(col("src").as("node_id")).distinct().localCheckpoint()

    var state = normalized(
      nodes.select(col("node_id") +: eCols(dim).zipWithIndex.map {
        case (c, j) => baseEntry(col("node_id"), j, seed).as(c)
      }: _*), dim).localCheckpoint()

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
      val w = iterationWeights(k)
      combined = combined.join(state, Seq("node_id"))
        .select(col("node_id") +: eCols(dim).map(c =>
          (col(s"acc_$c") + col(c) * w).as(s"acc_$c")): _*)
    }

    // final L2 normalise + pack into an array column; coordinates
    // snapped at 6 like every iteration state (see normalized) so the
    // embedding CONSUMERS (cosines, LSH sign bits) are bit-replayable
    val accNormSq = eCols(dim).map(c => col(s"acc_$c") * col(s"acc_$c")).reduce(_ + _)
    combined.withColumn("_norm", sqrt(accNormSq))
      .select(col("node_id"),
        array(eCols(dim).map(c =>
          when(col("_norm") > 0, round(col(s"acc_$c") / col("_norm"), 6))
            .otherwise(lit(0.0))): _*)
          .as("embedding"))
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
