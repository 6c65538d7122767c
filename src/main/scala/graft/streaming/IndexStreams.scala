package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.graph.FastRP

/** S18 — streaming maintenance of the EMBEDDING + KNN-substrate
  * silvers: the incremental family's two heaviest members (T15
  * `FastRP.mergeEmbeddings`, T13 `Lsh.mergeScoredPairs`) composed
  * inside foreachBatch, so an edge-delta stream keeps a live ANN
  * index current without ever re-embedding the graph or re-scoring
  * the full pair table.
  *
  * This is the at-ingest twin of the reference's write workflow
  * (`Alg_KNN_FastRP.py`: fastRP.write → knn.write re-run from scratch
  * on every refresh): here each micro-batch folds its delta into the
  * retained per-iteration FastRP states (blast radius = the delta
  * targets' k-hop forward closure — provable from FastRP's locality)
  * and re-scores only changed × all band collisions. At 100 TB the
  * state frames live as bucketed transactional tables and the fold's
  * dominant joins ship only the delta neighbourhood; the composition
  * and the equivalence argument are identical.
  */
object IndexStreams {

  /** One directed edge operation: `weight` None deletes, Some upserts. */
  case class EdgeOp(src: Long, dst: Long, weight: Option[Double])

  /** Maintains three silvers under a stream of edge OPERATIONS:
    * the both-directions weighted edge table, the retained FastRP
    * state ([[FastRP.FastRpState]]), and the LSH scored-pair table.
    *
    * Batch row contract: `(src, dst, weight[, _seq])` in
    * BOTH-DIRECTIONS form (the T13/T15 delta contract — each logical
    * undirected edge arrives as both orientations; the affected-set
    * closure below symmetrises defensively, so a single-direction
    * caller gets correct — if costlier — re-scoring rather than
    * silently stale pairs). `weight` NULL means DELETE the directed
    * edge, non-null upserts it to that weight. Within a batch,
    * operations are order-free by default: per directed edge the
    * greatest weight wins and any upsert beats a delete (`max` ignores
    * nulls) — the S17 last-writer discipline made associative. A
    * caller replaying an ORDERED changelog where a logical sequence
    * (e.g. upsert-then-delete) can land in one micro-batch must stamp
    * a `_seq` column: then the max-`_seq` row wins exactly
    * (CypherLoad's ordered-batch rule — last write INCLUDING deletes),
    * instead of upsert-beats-delete.
    *
    * `changedIds` handed to the pair fold is a PROVABLE superset of
    * every node whose embedding can have moved: the delta endpoints'
    * (levels−1)-hop forward closure over the SYMMETRISED old ∪ new
    * edges, which contains `mergeEmbeddings`' own affected set (same
    * seeds, superset edge relation — symmetrising only widens it) plus
    * every appeared/vanished id (they are endpoints of the delta). A
    * superset only re-scores extra unchanged pairs —
    * `mergeScoredPairs` is ≡ full recompute for ANY changedIds ⊇ the
    * true changed set. */
  final class KnnIndexMaintainer(initEdges: DataFrame, dim: Int = 16,
      bands: Int = 8, bitsPerBand: Int = 10,
      iterationWeights: Seq[Double] = Seq(0.0, 1.0, 1.0, 1.0)) {

    @volatile private var edges: DataFrame =
      initEdges.select(col("src"), col("dst"),
        col("weight").cast("double").as("weight")).localCheckpoint()
    @volatile private var state: FastRP.FastRpState =
      FastRP.embedStates(edges, dim, iterationWeights)
    @volatile private var scored: DataFrame =
      graft.ann.Lsh.scoredPairs(state.embedding, "node_id", "embedding",
        dim, bands, bitsPerBand).localCheckpoint()

    def currentEdges: DataFrame = edges
    def embedding: DataFrame = state.embedding
    def scoredPairs: DataFrame = scored

    /** A (topK, cutoff) SIMILAR_TO view over the maintained pair
      * silver — what the reference's knn.write materialises, derivable
      * here at any operating point without recomputation. */
    def knnEdges(topK: Int, cutoff: Double): DataFrame =
      graft.ann.Lsh.knnFromScoredRaw(scored, topK, cutoff)

    /** The foreachBatch body; directly callable for batch backfills. */
    def applyBatch(opsRaw: DataFrame): Unit = synchronized {
      // within-batch merge: max-`_seq` row wins when the caller stamps
      // ingest order (a delete CAN then win over an earlier upsert);
      // otherwise the order-free max-weight/upsert-beats-delete rule
      val ops = (if (opsRaw.columns.contains("_seq"))
          // struct-wrapped like CypherLoad's dedup: the chosen row's
          // weight may legitimately be NULL (a delete winning on _seq)
          opsRaw.groupBy(col("src"), col("dst"))
            .agg(max_by(struct(col("weight").cast("double").as("weight")),
              col("_seq")).as("_v"))
            .select(col("src"), col("dst"), col("_v.weight").as("weight"))
        else opsRaw.groupBy(col("src"), col("dst"))
          .agg(max(col("weight").cast("double")).as("weight")))
        .localCheckpoint()
      val newEdges = edges.join(ops, Seq("src", "dst"), "left_anti")
        .unionByName(ops.filter(col("weight").isNotNull))
        .localCheckpoint()
      val changed = ops.select(col("src"), col("dst"))
      val newState =
        FastRP.mergeEmbeddings(state, newEdges, changed, dim, iterationWeights)
      // (levels−1)-hop forward closure of the delta endpoints over
      // old ∪ new edges, SYMMETRISED — the closure must be a superset
      // of every moved embedding even when a caller violates the
      // both-directions delta contract, so both orientations of every
      // edge feed the hop join (on contract-honouring input this only
      // duplicates rows the distinct collapses) — each hop is one
      // equi-join + distinct, the frontier bounded by the delta's
      // neighbourhood, never the graph
      val unionDir = edges.select(col("src"), col("dst"))
        .unionAll(newEdges.select(col("src"), col("dst")))
      val unionEdges = unionDir
        .unionAll(unionDir.select(col("dst").as("src"), col("src").as("dst")))
        .localCheckpoint()
      var affected = changed.select(col("dst").as("node_id"))
        .unionAll(changed.select(col("src").as("node_id")))
        .distinct().localCheckpoint()
      for (_ <- 1 until iterationWeights.length) {
        affected = affected.unionAll(
            unionEdges.join(affected.withColumnRenamed("node_id", "src"),
              Seq("src"))
              .select(col("dst").as("node_id")))
          .distinct().localCheckpoint()
      }
      scored = graft.ann.Lsh.mergeScoredPairs(scored, newState.embedding,
          affected, "node_id", "embedding", dim, bands, bitsPerBand)
        .localCheckpoint()
      edges = newEdges
      state = newState
    }

    /** Wire an edge-operation stream into the maintainer; caller
      * starts it. */
    def attach(stream: DataFrame)
        : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
      stream.writeStream
        .foreachBatch((batch: DataFrame, _: Long) => applyBatch(batch))
  }
}
