package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorOps
import graft.plans.CosineSim

/** Random-hyperplane LSH for cosine similarity over `(id, vec)` tables.
  *
  * Signatures are deterministic: hyperplane entry (b, j) is ±1 derived
  * from xxhash64(bit, dim, seed) — no RNG state to ship, identical on
  * every executor and every run. Banding: `bands` buckets of `bitsPerBand`
  * sign bits; candidate pairs collide in ≥1 band. This is the linear-scale
  * path for both near-dup detection and ANN: cost is |rows| × bands
  * shuffle instead of |rows|² compare.
  */
object Lsh {

  /** Deterministic ±1 hyperplane entry via splitmix64 — computed ONCE on
    * the driver per (bit, dim) and shipped as literals, not re-hashed
    * per row (the naive xxhash-in-lambda form costs bits×dim hashes per
    * row). */
  private[graft] def hyperplane(bit: Int, dim: Int, seed: Int): Array[Double] =
    Array.tabulate(dim) { j =>
      var z = seed.toLong * 0x9E3779B97F4A7C15L + (bit.toLong << 32) + j
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z = z ^ (z >>> 31)
      if ((z & 1L) == 0L) 1.0 else -1.0
    }

  /** Sign bit of vec · hyperplane(bit) as 0/1. */
  private def signBit(vec: Column, bit: Int, dim: Int, seed: Int): Column = {
    val hp = array(hyperplane(bit, dim, seed).map(lit): _*)
    val dot = aggregate(zip_with(vec, hp, (v, h) => v.cast("double") * h),
      lit(0.0), (acc, x) => acc + x)
    when(dot >= 0, lit(1L)).otherwise(lit(0L))
  }

  /** Add `bands` bucket columns (band_0 … band_{n-1}) to (id, vec). */
  def withBuckets(df: DataFrame, vecCol: String, dim: Int,
      bands: Int = 6, bitsPerBand: Int = 8, seed: Int = 7): DataFrame = {
    val withBands = (0 until bands).foldLeft(df) { (acc, b) =>
      val bucket = (0 until bitsPerBand)
        .map(i => signBit(col(vecCol), b * bitsPerBand + i, dim, seed) * (1L << i))
        .reduce(_ + _)
      acc.withColumn(s"band_$b", bucket)
    }
    withBands
  }

  /** Candidate pairs (a < b) that share at least one band bucket.
    * One posexplode + one self-join on (band_idx, bucket) — a single
    * shuffle regardless of band count (vs one join per band). */
  def candidatePairs(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      bands: Int = 6, bitsPerBand: Int = 8, seed: Int = 7): DataFrame = {
    val base = df.select(col(idCol).as("id"), col(vecCol).as("vec")).localCheckpoint()
    val sig = withBuckets(base, "vec", dim, bands, bitsPerBand, seed)
    // ids-only through the band self-join and dedup (the shuffles), then
    // attach the vectors once to the much smaller surviving pair set
    val banded = sig.select(col("id"),
        posexplode(array((0 until bands).map(b => col(s"band_$b")): _*)))
      .select(col("id"), col("pos").as("band_idx"), col("col").as("bkt"))
      .localCheckpoint()
    val l = banded.select(col("band_idx"), col("bkt"), col("id").as("id_a"))
    val r = banded.select(col("band_idx"), col("bkt"), col("id").as("id_b"))
    l.join(r, Seq("band_idx", "bkt")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .join(base.select(col("id").as("id_a"), col("vec").as("vec_a")), Seq("id_a"))
      .join(base.select(col("id").as("id_b"), col("vec").as("vec_b")), Seq("id_b"))
  }

  /** Conf key: max rows for the exact all-pairs near-dup leg. */
  val ExactPairsThresholdConf = "graft.lsh.exactPairsThreshold"

  /** Near-duplicate pairs by cosine threshold — SIZE-ADAPTIVE (the
    * [[graft.ann.Dbscan]] idiom): under the gate the candidates come
    * from an exact broadcast nested-loop all-pairs (n²/2 codegen'd
    * cosines, ZERO shuffles — recall 1.0 by construction, which is what
    * the all-pairs DuckDB oracle demands); above it, banded LSH. The
    * crossover matters: at a low cutoff like 0.4 the recall-complete
    * banding (many bands × few bits) GENERATES ~bands/4 × n² collision
    * rows through three shuffles — more work than brute force until n
    * is well past the broadcast limit. */
  def nearDupPairs(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      minCosine: Double, bands: Int = 6, bitsPerBand: Int = 8): DataFrame = {
    val spark = df.sparkSession
    val pts = df.select(col(idCol).as("id"), col(vecCol).as("vec")).localCheckpoint()
    val gate = spark.conf.getOption(ExactPairsThresholdConf)
      .map(_.toLong).getOrElse(20000L)
    val candidates =
      if (pts.count() <= gate) {
        // spread the stream side first — a small table arrives as one
        // parquet partition and would nested-loop on a single core
        val fan = spark.conf.get("spark.sql.shuffle.partitions").toInt
        val a = pts.repartition(fan)
          .select(col("id").as("id_a"), col("vec").as("vec_a"))
        val b = pts.select(col("id").as("id_b"), col("vec").as("vec_b"))
        a.join(broadcast(b), col("id_a") < col("id_b"))
      } else {
        candidatePairs(pts, "id", "vec", dim, bands, bitsPerBand)
      }
    candidates
      .withColumn("cosine", CosineSim.cosine(spark, col("vec_a"), col("vec_b")))
      .filter(col("cosine") >= minCosine)
      .select(col("id_a"), col("id_b"), round(col("cosine"), 6).as("cosine"))
  }

  /** All LSH candidate pairs with exact cosine, NO cutoff — the shared
    * expensive stage of every (topK, cutoff) KNN view. Cache this once
    * per embedding table and derive operating points via
    * [[knnFromScored]] (re-running the banding + scoring per cutoff
    * wastes the dominant cost). */
  def scoredPairs(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      bands: Int = 8, bitsPerBand: Int = 10): DataFrame =
    candidatePairs(df, idCol, vecCol, dim, bands, bitsPerBand)
      .withColumn("cosine", CosineSim.cosine(df.sparkSession, col("vec_a"), col("vec_b")))
      .select(col("id_a"), col("id_b"), col("cosine"))

  /** Incremental maintenance of the [[scoredPairs]] silver (T13 — the
    * T9 co-occurrence-MERGE story for the ANN tier): after a delta of
    * changed / new / deleted embeddings, only pairs INCIDENT to a
    * changed id can change — signatures of unchanged vectors are
    * unchanged, so their mutual collision status and cosines are too.
    * The fold drops old pairs touching `changedIds` (which must
    * include DELETED ids — the caller's contract) and re-scores only
    * the changed-side band collisions: the posting self-join, the
    * dominant cost, runs changed × all instead of all × all. The
    * per-row signature projection over the full table is map-only (no
    * shuffle); at 100 TB the posting table itself would live bucketed
    * (the T5 layout) and ship only the changed buckets. Spec-proved ≡
    * the full [[scoredPairs]] recompute on the delta'd table. */
  def mergeScoredPairs(oldScored: DataFrame, emb: DataFrame,
      changedIds: DataFrame, idCol: String, vecCol: String, dim: Int,
      bands: Int = 8, bitsPerBand: Int = 10, seed: Int = 7): DataFrame = {
    val base = emb.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .localCheckpoint()
    val changed = changedIds.select(col(idCol).as("id")).distinct()
      .localCheckpoint()
    val sig = withBuckets(base, "vec", dim, bands, bitsPerBand, seed)
    val banded = sig.select(col("id"),
        posexplode(array((0 until bands).map(b => col(s"band_$b")): _*)))
      .select(col("id"), col("pos").as("band_idx"), col("col").as("bkt"))
      .localCheckpoint()
    val l = banded.join(changed, Seq("id"), "left_semi")
      .select(col("band_idx"), col("bkt"), col("id").as("id_a"))
    val r = banded.select(col("band_idx"), col("bkt"), col("id").as("id_b"))
    val touched = l.join(r, Seq("band_idx", "bkt"))
      .filter(col("id_a") =!= col("id_b"))
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"))
      .dropDuplicates("id_a", "id_b")
      .join(base.select(col("id").as("id_a"), col("vec").as("vec_a")), Seq("id_a"))
      .join(base.select(col("id").as("id_b"), col("vec").as("vec_b")), Seq("id_b"))
      .withColumn("cosine",
        CosineSim.cosine(emb.sparkSession, col("vec_a"), col("vec_b")))
      .select(col("id_a"), col("id_b"), col("cosine"))
    oldScored
      .join(changed.select(col("id").as("id_a")), Seq("id_a"), "left_anti")
      .join(changed.select(col("id").as("id_b")), Seq("id_b"), "left_anti")
      .select(col("id_a"), col("id_b"), col("cosine"))
      .unionAll(touched)
  }

  /** Top-k SIMILAR_TO edges from a precomputed scored-pair table, with
    * the similarity carried UNROUNDED (callers round exactly once,
    * optionally after a scale transform — double rounding shifts the
    * 6th decimal). */
  def knnFromScoredRaw(scored: DataFrame, topK: Int, cutoff: Double): DataFrame = {
    val pairs = scored.filter(col("cosine") >= cutoff)
    val bidir = pairs.unionAll(
      pairs.select(col("id_b").as("id_a"), col("id_a").as("id_b"), col("cosine")))
    // custom bounded-heap operator: no per-partition sort, O(nodes × k) state
    graft.plans.TopKPerKey.topKPerKey(bidir, Seq("id_a"),
        Seq(("cosine", false), ("id_b", true)), topK)
      .select(col("id_a").as("src"), col("id_b").as("dst"),
        col("cosine").as("similarity"))
  }

  /** Top-k SIMILAR_TO edges from a precomputed scored-pair table. */
  def knnFromScored(scored: DataFrame, topK: Int, cutoff: Double): DataFrame =
    knnFromScoredRaw(scored, topK, cutoff)
      .withColumn("similarity", round(col("similarity"), 6))

  /** Approximate top-k neighbours per id (both directions of each
    * candidate pair), with a similarity cutoff — the KNN shape of the
    * reference (`Alg_KNN_FastRP.py:99-116`: topK, similarityCutoff). */
  def knnEdges(df: DataFrame, idCol: String, vecCol: String, dim: Int,
      topK: Int = 20, cutoff: Double = 0.1,
      bands: Int = 8, bitsPerBand: Int = 10): DataFrame =
    knnFromScored(scoredPairs(df, idCol, vecCol, dim, bands, bitsPerBand), topK, cutoff)
}
