package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorOps

/** Semantic deduplication over the embedding space (SemDeDup, Abbas et
  * al. 2023, arXiv:2303.09540): cluster the embeddings, then prune
  * near-duplicate PAIRS only WITHIN clusters — the cluster pass turns the
  * corpus-quadratic all-pairs comparison into k independent
  * (n/k)²-bounded ones, which is the whole reason the method runs at
  * web scale. k scales WITH the corpus (k = max(8, n/targetClusterSize),
  * [[adaptiveK]]) so the per-cluster compare stays constant-bounded at
  * any n, and the within-cluster self-joins shuffle on (cluster, salt)
  * — k·8 keys — so parallelism is never capped by the cluster count.
  *
  * Everything here is exactly SQL-oracle-able because the clustering is
  * the deterministic first-k-rows seeding (centroid c = the embedding of
  * `vec_id` c, assignment = argmax rounded cosine, ties to the lowest
  * centroid id) rather than iterated k-means — the iterated variant
  * lives in [[graft.ann.KMeans]] and is gated by its own invariants
  * entry; THIS operator's semantics (cluster-scoped pruning with a
  * keep-priority scan) are what SemDeDup adds, and they are independent
  * of which clustering seeds it.
  *
  * Keep rule (the paper's): within a cluster, items are ranked by
  * cosine-to-centroid ASCENDING (keep the example FARTHEST from the
  * centroid — maximize diversity), ties by `vec_id`; an item is removed
  * iff ANY earlier-ranked item is within `tau` cosine — the upper-
  * triangular max of the per-cluster similarity matrix, exactly the
  * reference implementation's `torch.triu` screen.
  *
  * All cosines are rounded to 6 decimals BEFORE any comparison
  * (threshold and rank alike) so the Spark and DuckDB sides make
  * identical keep decisions — raw doubles could differ by 1 ulp across
  * engines and flip a boundary comparison.
  */
object SemDedup {

  /** The paper's k scales WITH the corpus (k ≈ n / targetClusterSize)
    * so per-cluster work stays (targetClusterSize)²-bounded no matter
    * how big n gets — a fixed k would make the within-cluster compare
    * quadratic in n again. Floor 8 keeps tiny corpora from degenerating
    * to near-global greedy. One count() action at planning time is the
    * documented size-adaptive pattern (cheap: parquet row-count
    * metadata). */
  def adaptiveK(emb: DataFrame, targetClusterSize: Long = 50L): Int =
    math.max(8L, emb.count() / targetClusterSize).toInt

  /** Salt fan-out for the within-cluster self-joins: side A keys on
    * (cluster, id_a % Salt), side B replicates Salt×, so the shuffle has
    * k·Salt keys instead of k — parallelism no longer capped by the
    * cluster count while each (a, b) pair still meets exactly once (at
    * A's salt). Replication cost is Salt× on one side of a join that is
    * already (n/k)-bounded per cluster. */
  private val Salt = 8

  /** (vec_id, cluster, cos_centroid): nearest-centroid assignment over
    * the deterministic first-k centroids. The k centroids broadcast —
    * the scan is one map-side pass at any corpus size. */
  def assignments(spark: SparkSession, dir: String, k: Int = 8): DataFrame =
    assignmentsOf(Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding")), k)

  /** [[assignments]] over any (vec_id, embedding) frame. */
  def assignmentsOf(emb: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val cents = emb.filter(col("vec_id") < k)
      .select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
    emb.crossJoin(broadcast(cents))
      .select(col("vec_id"),
        col("c_id"),
        round(VectorOps.cosine(col("embedding"), col("c_emb")), 6).as("cos"))
      // argmax cosine, ties to the lowest centroid id: lexicographic
      // struct max on (cos, -c_id) — one hash aggregate, no sort
      .groupBy(col("vec_id"))
      .agg(max(struct(col("cos"), (-col("c_id")).as("nc"), col("c_id"))).as("best"))
      .select(col("vec_id"), col("best.c_id").as("cluster"),
        col("best.cos").as("cos_centroid"))
  }

  /** Assignments re-joined with vectors — the substrate both the pair
    * screen and the survivor scan share. */
  private def frameOf(emb: DataFrame, k: Int): DataFrame =
    assignmentsOf(emb, k).join(emb, Seq("vec_id"))

  /** Session-cached assignment frame: the pair screen and the survivor
    * scan are two entries over the SAME clustering — build it once.
    * k <= 0 means size-adaptive ([[adaptiveK]]). */
  private def userFrame(spark: SparkSession, dir: String, k: Int): DataFrame = {
    val emb = Tables.embeddings(spark, dir).select(col("vec_id"), col("embedding"))
    val kEff = if (k > 0) k else adaptiveK(emb)
    graft.Cache.cached(spark, dir, s"semdedup_frame_$kEff") { frameOf(emb, kEff) }
  }

  /** Silver accessor: materialize the session-cached assignment frame
    * both entries share, so the bench's silver phase carries the build
    * and the `semdedup_pairs` query line is warm compare-only (the r6
    * bench line hid a 17 s frame build inside the first consumer). */
  def cachedFrame(spark: SparkSession, dir: String, k: Int = -1): DataFrame =
    userFrame(spark, dir, k)

  /** Within-cluster near-duplicate pairs at cosine >= tau.
    * Output (cluster, id_a, id_b, cosine), id_a < id_b.
    * k <= 0 (the default) sizes k from the corpus ([[adaptiveK]]). */
  def pairs(spark: SparkSession, dir: String, k: Int = -1, tau: Double = 0.3): DataFrame =
    pairsFrom(userFrame(spark, dir, k), tau)

  /** [[pairs]] over any (vec_id, embedding) frame. */
  def pairsOf(emb: DataFrame, k: Int, tau: Double): DataFrame =
    pairsFrom(frameOf(emb, k), tau)

  private def pairsFrom(f: DataFrame, tau: Double): DataFrame = {
    val a = f.select(col("cluster"), col("vec_id").as("id_a"), col("embedding").as("ea"))
      .withColumn("salt", pmod(col("id_a"), lit(Salt)).cast("int"))
    val b = f.select(col("cluster"), col("vec_id").as("id_b"), col("embedding").as("eb"))
      .withColumn("salt", explode(sequence(lit(0), lit(Salt - 1))))
    a.join(b, Seq("cluster", "salt"))
      .filter(col("id_a") < col("id_b"))
      .select(col("cluster"), col("id_a"), col("id_b"),
        round(VectorOps.cosine(col("ea"), col("eb")), 6).as("cosine"))
      .filter(col("cosine") >= tau)
      .orderBy(col("cluster"), col("id_a"), col("id_b"))
  }

  /** The kept set: an item survives iff NO earlier item in its cluster's
    * keep-priority order (cos_centroid ASC, vec_id ASC) is within `tau`.
    * Output (vec_id, cluster, cos_centroid). */
  def survivors(spark: SparkSession, dir: String, k: Int = -1, tau: Double = 0.3): DataFrame =
    survivorsFrom(userFrame(spark, dir, k), tau)

  /** [[survivors]] over any (vec_id, embedding) frame. */
  def survivorsOf(emb: DataFrame, k: Int, tau: Double): DataFrame =
    survivorsFrom(frameOf(emb, k), tau)

  private def survivorsFrom(f: DataFrame, tau: Double): DataFrame = {
    val a = f.select(col("cluster"), col("vec_id").as("id_a"),
      col("cos_centroid").as("cos_a"), col("embedding").as("ea"))
      .withColumn("salt", pmod(col("id_a"), lit(Salt)).cast("int"))
    val b = f.select(col("cluster"), col("vec_id").as("id_b"),
      col("cos_centroid").as("cos_b"), col("embedding").as("eb"))
      .withColumn("salt", explode(sequence(lit(0), lit(Salt - 1))))
    val removed = a.join(b, Seq("cluster", "salt"))
      .filter(col("cos_a") < col("cos_b") ||
        (col("cos_a") === col("cos_b") && col("id_a") < col("id_b")))
      .filter(round(VectorOps.cosine(col("ea"), col("eb")), 6) >= tau)
      .select(col("id_b").as("vec_id")).distinct()
    f.select(col("vec_id"), col("cluster"), col("cos_centroid"))
      .join(removed, Seq("vec_id"), "left_anti")
      .orderBy(col("vec_id"))
  }
}
