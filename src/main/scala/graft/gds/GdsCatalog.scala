package graft.gds

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.cypher.CypherLite

/** The GDS graph-catalog lifecycle + the three write procedures the
  * reference drives — the last "missing" row of the r7 verdict: a
  * reference user's full workflow (`Alg_KNN_FastRP.py:10-116`,
  * `Alg_Community_Detection.py:15-52`) is project → write → drop, and
  * this twins it over the engine's property frames so that workflow
  * runs end to end next to CypherLoad (load) and CypherLite (read).
  *
  * A projection is a NAMED pair of frames in an in-memory catalog —
  * the warehouse-native analog of GDS's in-memory graph: `nodes(id,
  * props…)` and `rels(src, dst, props…)` with UNDIRECTED stored as
  * both directions (the GDS convention every engine algorithm already
  * expects). Multi-label projections encode node ids as
  * `id × L + labelIndex` — exactly the engine's bipartite convention
  * (`Algorithms.bipartiteEdges`: user → 2·id, book → 2·id + 1), so
  * `fastRpWrite` over the reference's `['User','Book']`/RATED
  * projection is frame-identical to the session-cached
  * `FastRP.userEmbeddings` path (spec-proved).
  *
  * Write procedures MUTATE the session's `db` the way GDS writes
  * properties back to Neo4j: `fastRpWrite` adds the embedding property
  * to every projected label's node frame, `knnWrite` installs the
  * SIMILAR_TO edge frame, `louvainWrite` adds the community property —
  * each returning its YIELD row as a one-row DataFrame with GDS's
  * column names. All heavy lifting delegates to the existing oracled
  * operators (FastRP.embed, Lsh.scoredPairs/knnFromScoredRaw,
  * Louvain.louvain, Algorithms.modularity) — the catalog is routing,
  * not a second implementation. */
final class GdsSession(initial: CypherLite.Graph) {

  /** The mutable database the write procedures update — node frames
    * keyed by label (key column `id`), edge frames keyed by type. */
  @volatile var db: CypherLite.Graph = initial

  final case class Projection(labels: Seq[String], nodes: DataFrame,
      rels: DataFrame)

  private val projections = TrieMap.empty[String, Projection]

  private def spark: SparkSession =
    (db.nodes.values ++ db.edges.values).headOption
      .map(_.sparkSession)
      .getOrElse(sys.error("empty graph: no session to plan on"))

  private def metaLong(cols: (String, Long)*): DataFrame = {
    val s = spark
    import s.implicits._
    cols match {
      case Seq((n1, v1)) => Seq(v1).toDF(n1)
      case Seq((n1, v1), (n2, v2)) => Seq((v1, v2)).toDF(n1, n2)
      case _ => sys.error("unsupported meta arity")
    }
  }

  /** `gds.graph.project(name, [labels], {TYPE: {orientation,
    * properties}})` (`Alg_KNN_FastRP.py:36-49,83-97`). `srcLabel` /
    * `dstLabel` bind the relationship endpoints (GDS infers them from
    * store topology; the frames don't carry labels) — defaults cover
    * both reference projections (`['User','Book']`/RATED and
    * `['User']`/DUMMY). Node ids encode as id·L + labelIndex. A rel
    * type absent from the db projects the empty edge set (the
    * reference's DUMMY type before any dummy edges exist). */
  def graphProject(name: String, nodeLabels: Seq[String], relType: String,
      orientation: String = "UNDIRECTED",
      relProperties: Seq[String] = Nil,
      nodeProperties: Seq[String] = Nil,
      srcLabel: Option[String] = None,
      dstLabel: Option[String] = None): DataFrame = {
    require(!projections.contains(name),
      s"graph '$name' already exists (gds.graph.project fails on dup)")
    val labs = nodeLabels
    val l = labs.length.toLong
    def enc(label: String, c: org.apache.spark.sql.Column) =
      c * lit(l) + lit(labs.indexOf(label).toLong)
    val nodes = labs.map { lab =>
      val base = db.nodes.getOrElse(lab, sys.error(s"unknown label $lab"))
      val keep = nodeProperties.filter(base.columns.contains)
      base.select(enc(lab, col("id")).as("id") +: keep.map(col): _*)
    }.reduce(_ unionByName _)
    val sLab = srcLabel.getOrElse(labs.head)
    val dLab = dstLabel.getOrElse(labs.last)
    val rels0 = db.edges.get(relType) match {
      case Some(e) =>
        e.select(Seq(enc(sLab, col("src")).as("src"),
          enc(dLab, col("dst")).as("dst")) ++ relProperties.map(col): _*)
      case None =>
        nodes.limit(0).select(Seq(col("id").as("src"), col("id").as("dst")) ++
          relProperties.map(n => lit(null).cast("double").as(n)): _*)
    }
    val rels =
      if (orientation.equalsIgnoreCase("UNDIRECTED"))
        rels0.unionByName(rels0
          .withColumnRenamed("src", "_s").withColumnRenamed("dst", "src")
          .withColumnRenamed("_s", "dst").select(rels0.columns.map(col): _*))
      else rels0
    // materialise once: project() already pays an eager count of both
    // frames for the YIELD row, and every write procedure re-reads them
    // — without the checkpoint each consumer re-plans the projection
    val p = Projection(labs, nodes.localCheckpoint(), rels.localCheckpoint())
    projections.put(name, p)
    val s = spark
    import s.implicits._
    Seq((name, p.nodes.count(), p.rels.count()))
      .toDF("graphName", "nodeCount", "relationshipCount")
  }

  /** `gds.graph.project.cypher(name, nodeQuery, relQuery)`
    * (`Alg_Community_Detection.py:20-31`): both queries COMPILE via
    * CypherLite against the db — the node query must return `id`, the
    * rel query `source, target[, weight…]`. No id encoding: the
    * queries define the id space themselves. */
  def graphProjectCypher(name: String, nodeQuery: String,
      relQuery: String): DataFrame = {
    require(!projections.contains(name), s"graph '$name' already exists")
    val nodes = CypherLite.run(db, nodeQuery)
    require(nodes.columns.contains("id"), "node query must return `id`")
    val rels0 = CypherLite.run(db, relQuery)
    require(Seq("source", "target").forall(rels0.columns.contains),
      "rel query must return `source`, `target`")
    val rels = rels0.withColumnRenamed("source", "src")
      .withColumnRenamed("target", "dst")
    // the cypher rel query is typically a self-join (the reference's is
    // the co-rating projection) — checkpoint so the count here, louvain,
    // and the modularity pass don't each re-run it
    val p = Projection(Nil, nodes.localCheckpoint(), rels.localCheckpoint())
    projections.put(name, p)
    val s = spark
    import s.implicits._
    Seq((name, p.nodes.count(), p.rels.count()))
      .toDF("graphName", "nodeCount", "relationshipCount")
  }

  /** `gds.graph.exists(name) YIELD exists`. */
  def graphExists(name: String): DataFrame = {
    val s = spark
    import s.implicits._
    Seq(projections.contains(name)).toDF("exists")
  }

  /** `gds.graph.drop(name) YIELD graphName` — fails on a missing
    * graph, like GDS. */
  def graphDrop(name: String): DataFrame = {
    require(projections.remove(name).isDefined,
      s"graph '$name' does not exist")
    val s = spark
    import s.implicits._
    Seq(name).toDF("graphName")
  }

  /** The reference's delete_existing_graph cascade
    * (`Alg_KNN_FastRP.py:10-25`: exists → apoc.do.when → drop). */
  def graphDropIfExists(name: String): DataFrame = {
    val s = spark
    import s.implicits._
    if (projections.remove(name).isDefined) Seq(name).toDF("graphName")
    else Seq("Graph was not present").toDF("graphName")
  }

  /** `gds.graph.list()`-lite: (graphName) rows. */
  def graphList(): DataFrame = {
    val s = spark
    import s.implicits._
    projections.keys.toSeq.sorted.toDF("graphName")
  }

  /** `gds.fastRP.write(name, {writeProperty, embeddingDimension})`
    * (`Alg_KNN_FastRP.py:63-76`): FastRP over the projection's rels
    * (weight = `relationshipWeightProperty`, 1.0 when absent — the
    * reference projection carries `rating`), embeddings decoded back
    * per label and written onto the db node frames. YIELDs
    * nodePropertiesWritten.
    *
    * `precomputed` is the materialised-silver reuse seam: a caller that
    * already holds the (node_id, embedding) frame over this projection's
    * ENCODED id space — e.g. the session-cached
    * `FastRP.bipartiteEmbeddings`, spec-proved frame-identical to the
    * in-workflow build — hands it in and the embed step is skipped, the
    * way GDS itself reuses a mutated in-memory graph. The decode +
    * write-back bookkeeping runs either way. */
  def fastRpWrite(graphName: String, writeProperty: String = "embedding",
      embeddingDimension: Int = 64,
      relationshipWeightProperty: Option[String] = Some("rating"),
      precomputed: Option[DataFrame] = None): DataFrame = {
    val p = projections.getOrElse(graphName,
      sys.error(s"graph '$graphName' does not exist"))
    val emb = fastRpEmbedOf(p, embeddingDimension,
      relationshipWeightProperty, precomputed)
    val l = math.max(p.labels.length, 1).toLong
    var written = 0L
    val updated = p.labels.zipWithIndex.foldLeft(db.nodes) {
      case (nodes, (lab, i)) =>
        val labEmb = emb.filter(pmod(col("node_id"), lit(l)) === i.toLong)
          .select(((col("node_id") - i.toLong) / l).cast("bigint").as("id"),
            col("embedding").as(writeProperty))
        written += labEmb.count()
        val base = nodes(lab).drop(writeProperty)
        nodes + (lab -> base.join(labEmb, Seq("id"), "left"))
    }
    db = db.copy(nodes = updated)
    metaLong("nodePropertiesWritten" -> written)
  }

  /** The FastRP frame all three fastRP modes share: (node_id,
    * embedding) over the projection's ENCODED id space. */
  private def fastRpEmbedOf(p: Projection, embeddingDimension: Int,
      relationshipWeightProperty: Option[String],
      precomputed: Option[DataFrame]): DataFrame = {
    val weight = relationshipWeightProperty
      .filter(p.rels.columns.contains)
      .map(col).getOrElse(lit(1.0))
    precomputed.getOrElse(graft.graph.FastRP.embed(
      p.rels.select(col("src"), col("dst"), weight.cast("double").as("weight")),
      embeddingDimension))
  }

  /** `gds.fastRP.stream(name, {...}) YIELD nodeId, embedding` — the
    * write mode's frame handed back as rows instead of mutated into the
    * db; `nodeId` is the projection's internal (encoded) id, exactly
    * GDS's stream contract. Spec-proved row-identical to the write
    * path's read-back. */
  def fastRpStream(graphName: String, embeddingDimension: Int = 64,
      relationshipWeightProperty: Option[String] = Some("rating"),
      precomputed: Option[DataFrame] = None): DataFrame = {
    val p = projections.getOrElse(graphName,
      sys.error(s"graph '$graphName' does not exist"))
    fastRpEmbedOf(p, embeddingDimension, relationshipWeightProperty, precomputed)
      .select(col("node_id").as("nodeId"), col("embedding"))
  }

  /** `gds.fastRP.stats(name, {...}) YIELD nodeCount` — the estimate/
    * dry-run mode: same compute graph, scalar YIELD, no db mutation. */
  def fastRpStats(graphName: String, embeddingDimension: Int = 64,
      relationshipWeightProperty: Option[String] = Some("rating"),
      precomputed: Option[DataFrame] = None): DataFrame = {
    val p = projections.getOrElse(graphName,
      sys.error(s"graph '$graphName' does not exist"))
    metaLong("nodeCount" ->
      fastRpEmbedOf(p, embeddingDimension, relationshipWeightProperty,
        precomputed).count())
  }

  /** `gds.knn.write(name, {nodeProperties, topK, similarityCutoff,
    * writeRelationshipType, writeProperty})`
    * (`Alg_KNN_FastRP.py:99-116`): cosine KNN over the projection
    * nodes' embedding property at the GDS operating point — similarity
    * normalised to (1 + cos)/2, cutoff on that scale, top-k per node —
    * the exact transform `Algorithms.userKnnEdgesRef` pins. Writes the
    * SIMILAR_TO edge frame into the db. Single-label projections only
    * (the reference's is `['User']`). */
  def knnWrite(graphName: String, nodeProperty: String = "embedding",
      topK: Int = 5, similarityCutoff: Double = 0.8,
      writeRelationshipType: String = "SIMILAR_TO",
      writeProperty: String = "similarity",
      embeddingDimension: Int = 64,
      precomputedScored: Option[DataFrame] = None): DataFrame = {
    val (nodesCompared, sims) = knnEdgesOf(graphName, nodeProperty, topK,
      similarityCutoff, embeddingDimension, precomputedScored)
    val edges = sims
      .select(col("src"), col("dst"), col("similarity").as(writeProperty))
      .localCheckpoint()
    db = db.copy(edges = db.edges + (writeRelationshipType -> edges))
    metaLong("nodesCompared" -> nodesCompared,
      "relationshipsWritten" -> edges.count())
  }

  /** The KNN edge frame all three knn modes share: (src, dst,
    * similarity) at the GDS operating point — similarity normalised to
    * (1 + cos)/2, cutoff on that scale, top-k per node — plus the
    * nodesCompared count the YIELD rows report. */
  private def knnEdgesOf(graphName: String, nodeProperty: String, topK: Int,
      similarityCutoff: Double, embeddingDimension: Int,
      precomputedScored: Option[DataFrame]): (Long, DataFrame) = {
    val p = projections.getOrElse(graphName,
      sys.error(s"graph '$graphName' does not exist"))
    require(p.labels.length <= 1,
      "knn modes expect a single-label projection (the reference's shape)")
    val withEmb = p.labels.headOption.map(lab => db.nodes(lab))
      .getOrElse(p.nodes)
      .select(col("id"), col(nodeProperty))
      .filter(col(nodeProperty).isNotNull)
    val nodesCompared = withEmb.count()
    // precomputedScored: the (id_a, id_b, cosine) scored-pair silver
    // over the same ids/embeddings (Algorithms.userScoredPairs for the
    // reference projection — spec-proved identical); the banding +
    // scoring is the dominant cost, shared instead of rebuilt
    val scored = precomputedScored.getOrElse(
      graft.ann.Lsh.scoredPairs(withEmb, "id", nodeProperty,
        embeddingDimension))
    val sims = graft.ann.Lsh.knnFromScoredRaw(
        scored, topK, cutoff = 2 * similarityCutoff - 1)
      .withColumn("similarity", round((col("similarity") + 1) / 2, 6))
      .select(col("src"), col("dst"), col("similarity"))
    (nodesCompared, sims)
  }

  /** `gds.knn.stream(name, {...}) YIELD node1, node2, similarity` —
    * the write mode's edge frame as rows, GDS's stream column names,
    * no db mutation. Spec-proved row-identical to the installed
    * SIMILAR_TO frame. */
  def knnStream(graphName: String, nodeProperty: String = "embedding",
      topK: Int = 5, similarityCutoff: Double = 0.8,
      embeddingDimension: Int = 64,
      precomputedScored: Option[DataFrame] = None): DataFrame =
    knnEdgesOf(graphName, nodeProperty, topK, similarityCutoff,
      embeddingDimension, precomputedScored)._2
      .select(col("src").as("node1"), col("dst").as("node2"),
        col("similarity"))

  /** `gds.knn.stats(name, {...}) YIELD nodesCompared, similarityPairs`. */
  def knnStats(graphName: String, nodeProperty: String = "embedding",
      topK: Int = 5, similarityCutoff: Double = 0.8,
      embeddingDimension: Int = 64,
      precomputedScored: Option[DataFrame] = None): DataFrame = {
    val (nodesCompared, sims) = knnEdgesOf(graphName, nodeProperty, topK,
      similarityCutoff, embeddingDimension, precomputedScored)
    metaLong("nodesCompared" -> nodesCompared,
      "similarityPairs" -> sims.count())
  }

  /** `gds.louvain.write(name, {writeProperty,
    * relationshipWeightProperty}) YIELD communityCount, modularity`
    * (`Alg_Community_Detection.py:39-52`): Louvain over the
    * projection's rels, labels written onto every db label whose ids
    * appear (the cypher projection's id space is the raw node id). */
  def louvainWrite(graphName: String, writeProperty: String = "community",
      relationshipWeightProperty: Option[String] = Some("weight"),
      writeLabel: String = "User",
      precomputedLabels: Option[DataFrame] = None): DataFrame = {
    val (labels, q) = louvainLabelsOf(graphName, relationshipWeightProperty,
      precomputedLabels)
    val base = db.nodes(writeLabel).drop(writeProperty)
    db = db.copy(nodes = db.nodes + (writeLabel ->
      base.join(labels.select(col("node_id").as("id"),
        col("community").as(writeProperty)), Seq("id"), "left")))
    val s = spark
    import s.implicits._
    Seq((labels.select(col("community")).distinct().count(),
        if (q.isNullAt(1)) 0.0 else q.getDouble(1)))
      .toDF("communityCount", "modularity")
  }

  /** The (labels, modularity row) pair all three louvain modes share.
    * precomputedLabels: the (node_id, community) silver over the same
    * projection (Louvain.userCommunities for the reference's co-rating
    * projection — spec-proved identical); modularity still runs against
    * THIS projection's edges. */
  private def louvainLabelsOf(graphName: String,
      relationshipWeightProperty: Option[String],
      precomputedLabels: Option[DataFrame])
      : (DataFrame, org.apache.spark.sql.Row) = {
    val p = projections.getOrElse(graphName,
      sys.error(s"graph '$graphName' does not exist"))
    val weight = relationshipWeightProperty
      .filter(p.rels.columns.contains)
      .map(col).getOrElse(lit(1.0))
    val edges = p.rels.select(col("src"), col("dst"),
      weight.cast("double").as("weight"))
    val labels = precomputedLabels.getOrElse(
      graft.graph.Louvain.louvain(edges, assumeGrouped = true))
      .localCheckpoint()
    val q = graft.graph.Algorithms.modularity(edges,
        labels.select(col("node_id"), col("community").as("label")))
      .head()
    (labels, q)
  }

  /** `gds.louvain.stream(name, {...}) YIELD nodeId, communityId` — the
    * label frame as rows, no db mutation. Spec-proved row-identical to
    * the write path's read-back. */
  def louvainStream(graphName: String,
      relationshipWeightProperty: Option[String] = Some("weight"),
      precomputedLabels: Option[DataFrame] = None): DataFrame =
    louvainLabelsOf(graphName, relationshipWeightProperty,
      precomputedLabels)._1
      .select(col("node_id").as("nodeId"), col("community").as("communityId"))

  /** `gds.louvain.stats(name, {...}) YIELD communityCount, modularity`
    * — the write mode's YIELD row without the write. */
  def louvainStats(graphName: String,
      relationshipWeightProperty: Option[String] = Some("weight"),
      precomputedLabels: Option[DataFrame] = None): DataFrame = {
    val (labels, q) = louvainLabelsOf(graphName, relationshipWeightProperty,
      precomputedLabels)
    val s = spark
    import s.implicits._
    Seq((labels.select(col("community")).distinct().count(),
        if (q.isNullAt(1)) 0.0 else q.getDouble(1)))
      .toDF("communityCount", "modularity")
  }
}
