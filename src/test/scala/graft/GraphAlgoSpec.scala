package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.{Algorithms, FastRP}
import graft.ann.Lsh
import graft.functions.VectorOps

/** Hand-computable fixtures for the rows-only-oracle operators. */
class GraphAlgoSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("connectedComponents: two triangles + isolated pair") {
    // components: {1,2,3}, {10,11,12}, {20,21}
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L), (20L, 21L))
      .toDF("src", "dst")
    val cc = Algorithms.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("spanningForest: fixture forest is the unique maximum spanning tree") {
    // path-ish graph where the max forest is forced: edges (1-2, 10),
    // (2-3, 9), (1-3, 1) → the triangle drops its lightest edge; plus a
    // separate pair (7-8, 5). Forest = {1-2, 2-3, 7-8}.
    val edges = Seq((1L, 2L, 10.0), (2L, 3L, 9.0), (1L, 3L, 1.0), (7L, 8L, 5.0))
      .toDF("src", "dst", "weight")
    val f = Algorithms.spanningForest(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(f == Set((1L, 2L, 10.0), (2L, 3L, 9.0), (7L, 8L, 5.0)))
  }

  test("spanningForest: matches driver-side Kruskal on the sf co-occurrence graph") {
    val cooc = graph.RatingsGraph.cooccurrenceEdges(spark, sf)
      .filter(col("u1") < col("u2"))
      .select(col("u1").as("src"), col("u2").as("dst"), col("weight"))
    val edges = cooc.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2).toDouble))
    // Kruskal under the SAME total order (weight desc, src, dst):
    // sorts globally, union-find greedily — the unique maximum forest
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    val kruskal = edges.sortBy { case (s, d, w) => (-w, s, d) }
      .filter { case (s, d, _) =>
        val (rs, rd) = (find(s), find(d))
        if (rs == rd) false else { parent(rs) = rd; true }
      }.toSet
    val boruvka = Algorithms.spanningForest(cooc).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .map { case (s, d, w) => (s, d, w) }.toSet
    assert(boruvka.size == kruskal.size,
      s"forest sizes differ: boruvka=${boruvka.size} kruskal=${kruskal.size}")
    assert(boruvka == kruskal.map { case (s, d, w) => (s, d, w) })
  }

  test("labelPropagation: two dense cliques joined by a weak bridge") {
    // clique A = {1,2,3}, clique B = {4,5,6}, bridge 3-4 with weight 0.1
    def clique(ids: Seq[Long], w: Double) =
      for { a <- ids; b <- ids if a != b } yield (a, b, w)
    val edges = (clique(Seq(1L, 2L, 3L), 5.0) ++ clique(Seq(4L, 5L, 6L), 5.0) ++
      Seq((3L, 4L, 0.1), (4L, 3L, 0.1)))
      .toDF("src", "dst", "weight")
    val labels = Algorithms.labelPropagation(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels(1L) == labels(2L) && labels(2L) == labels(3L))
    assert(labels(4L) == labels(5L) && labels(5L) == labels(6L))
    assert(labels(1L) != labels(4L), s"bridge merged the cliques: $labels")
  }

  test("pageRank converges early on a regular graph (uniform ranks are the fixpoint)") {
    // 4-clique, unit weights: ranks start uniform and stay uniform, so
    // max|Δ| = 0 after the first iteration → early exit
    val edges = (for { a <- 1L to 4L; b <- 1L to 4L if a != b } yield (a, b, 1.0))
      .toDF("src", "dst", "weight")
    val (ranks, iters) = graft.graph.Algorithms.pageRankIters(edges, iterations = 10)
    assert(iters < 10, s"no early exit: ran $iters iterations")
    val vals = ranks.collect().map(_.getDouble(1))
    assert(vals.forall(v => math.abs(v - 1.0) < 1e-12), vals.mkString(","))
  }

  test("louvain: disjoint cliques (fully-coarsened graph) keep every node, one community each") {
    // no bridge: level-0 merges each clique fully, the coarsened graph
    // is EMPTY (isolated communities) — unfold must keep all nodes and
    // the next level must not run on the empty edge list
    def clique(ids: Seq[Long], w: Double) =
      for { a <- ids; b <- ids if a != b } yield (a, b, w)
    val edges = (clique(Seq(1L, 2L, 3L), 5.0) ++ clique(Seq(10L, 11L, 12L), 5.0))
      .toDF("src", "dst", "weight")
    val labels = graft.graph.Louvain.louvain(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.keySet == Set(1L, 2L, 3L, 10L, 11L, 12L),
      s"nodes dropped through unfold: $labels")
    assert(labels(1L) == labels(2L) && labels(2L) == labels(3L))
    assert(labels(10L) == labels(11L) && labels(11L) == labels(12L))
    assert(labels(1L) != labels(10L))
  }

  test("pageRank tolerates an empty edge list") {
    val empty = Seq.empty[(Long, Long, Double)].toDF("src", "dst", "weight")
    assert(graft.graph.Algorithms.pageRank(empty).isEmpty)
  }

  test("modularity tolerates an empty labelled-edge set") {
    val empty = Seq.empty[(Long, Long, Double)].toDF("src", "dst", "weight")
    val labels = Seq.empty[(Long, Long)].toDF("node_id", "label")
    val r = graft.graph.Algorithms.modularity(empty, labels).head()
    assert(r.getLong(0) == 0L && r.isNullAt(1))
  }

  test("modularity: clique pair scores high, random labels score ~0") {
    def clique(ids: Seq[Long], w: Double) =
      for { a <- ids; b <- ids if a != b } yield (a, b, w)
    val edges = (clique(Seq(1L, 2L, 3L), 5.0) ++ clique(Seq(4L, 5L, 6L), 5.0) ++
      Seq((3L, 4L, 0.1), (4L, 3L, 0.1))).toDF("src", "dst", "weight")
    val goodLabels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L), (6L, 4L))
      .toDF("node_id", "label")
    val oneBlob = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (5L, 1L), (6L, 1L))
      .toDF("node_id", "label")
    val qGood = Algorithms.modularity(edges, goodLabels).head().getDouble(1)
    val qBlob = Algorithms.modularity(edges, oneBlob).head().getDouble(1)
    assert(qGood > 0.4, s"qGood=$qGood")
    assert(qBlob < 1e-9, s"qBlob=$qBlob")
    assert(qGood > qBlob)
  }

  test("louvain: separates the clique pair and beats-or-ties LPA modularity") {
    def clique(ids: Seq[Long], w: Double) =
      for { a <- ids; b <- ids if a != b } yield (a, b, w)
    val edges = (clique(Seq(1L, 2L, 3L), 5.0) ++ clique(Seq(4L, 5L, 6L), 5.0) ++
      Seq((3L, 4L, 0.1), (4L, 3L, 0.1))).toDF("src", "dst", "weight")
    val labels = graph.Louvain.louvain(edges)
      .withColumnRenamed("community", "label")
    val m = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) == m(2L) && m(2L) == m(3L))
    assert(m(4L) == m(5L) && m(5L) == m(6L))
    assert(m(1L) != m(4L), s"cliques merged: $m")
    // on the real sf0.001 cooc graph, louvain modularity >= lpa modularity
    val cooc = graph.RatingsGraph.cooccurrenceEdges(spark, sf)
      .select(col("u1").as("src"), col("u2").as("dst"), col("weight"))
    val qLouvain = Algorithms.modularity(cooc,
      graph.Louvain.userCommunities(spark, sf).withColumnRenamed("community", "label"))
      .head().getDouble(1)
    val qLpa = Algorithms.modularity(cooc,
      Algorithms.userCommunities(spark, sf)).head().getDouble(1)
    assert(qLouvain >= qLpa - 1e-6, s"louvain Q=$qLouvain < lpa Q=$qLpa")
  }

  test("louvainWarmStart: identity on a converged labelling, repairs a delta in 2 sweeps") {
    def clique(ids: Seq[Long], w: Double) =
      for { a <- ids; b <- ids if a != b } yield (a, b, w)
    val base = (clique(Seq(1L, 2L, 3L), 5.0) ++ clique(Seq(4L, 5L, 6L), 5.0) ++
      Seq((3L, 4L, 0.1), (4L, 3L, 0.1))).toDF("src", "dst", "weight")
    val cold = graph.Louvain.louvain(base)
    // no delta: the converged labelling is a local-moving fixpoint, so
    // the warm start returns it UNCHANGED
    val warm = graph.Louvain.louvainWarmStart(base, cold)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val coldM = cold.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(warm == coldM, s"warm start moved a converged labelling: $warm vs $coldM")
    // delta: the bridge becomes far stronger than the cliques' internal
    // weight — the warm start must pull the bridge endpoints into ONE
    // community (a full merge is never modularity-optimal: a single
    // blob scores Q = 0) without a cold restart
    val merged = (clique(Seq(1L, 2L, 3L), 5.0) ++ clique(Seq(4L, 5L, 6L), 5.0) ++
      Seq((3L, 4L, 60.0), (4L, 3L, 60.0))).toDF("src", "dst", "weight")
    val repaired = graph.Louvain.louvainWarmStart(merged, cold, sweeps = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(repaired(3L) == repaired(4L),
      s"strong bridge endpoints not co-located by warm start: $repaired")
    assert(repaired != coldM, "delta left the labelling untouched")
    // new nodes absent from the previous labelling join as singletons
    // and are folded in by the sweeps
    val grown = (clique(Seq(1L, 2L, 3L, 9L), 5.0) ++ clique(Seq(4L, 5L, 6L), 5.0) ++
      Seq((3L, 4L, 0.1), (4L, 3L, 0.1))).toDF("src", "dst", "weight")
    val withNew = graph.Louvain.louvainWarmStart(grown, cold)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(withNew(9L) == withNew(1L), s"new clique member stranded: $withNew")
    assert(withNew(4L) == withNew(5L) && withNew(4L) != withNew(1L))
  }

  test("louvain: multigraph input (parallel edges) equals the pre-aggregated graph") {
    def clique(ids: Seq[Long], w: Double) =
      for { a <- ids; b <- ids if a != b } yield (a, b, w)
    val grouped = (clique(Seq(1L, 2L, 3L), 5.0) ++ clique(Seq(4L, 5L, 6L), 5.0) ++
      Seq((3L, 4L, 0.1), (4L, 3L, 0.1)))
    // each edge split into two parallel rows carrying half the weight —
    // louvain() must aggregate them into one (src,dst) row, not score
    // each fragment against the candidate independently
    val multi = grouped.flatMap { case (a, b, w) => Seq((a, b, w / 2), (a, b, w / 2)) }
    val fromGrouped = graph.Louvain.louvain(grouped.toDF("src", "dst", "weight"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fromMulti = graph.Louvain.louvain(multi.toDF("src", "dst", "weight"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fromMulti == fromGrouped, s"multigraph diverged: $fromMulti vs $fromGrouped")
  }

  test("pageRank: star graph centre outranks leaves; ranks deterministic") {
    val edges = (Seq((1L, 99L, 1.0), (2L, 99L, 1.0), (3L, 99L, 1.0)) ++
      Seq((99L, 1L, 1.0), (99L, 2L, 1.0), (99L, 3L, 1.0)))
      .toDF("src", "dst", "weight")
    val pr = Algorithms.pageRank(edges).collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(pr(99L) > pr(1L))
    assert(math.abs(pr(1L) - pr(2L)) < 1e-9)
    // rank mass ≈ node count for symmetric-ish graphs
    assert(math.abs(pr.values.sum - 4.0) < 0.5)
  }

  test("fastrp: deterministic across runs and similar nodes embed closer") {
    val e1 = FastRP.userEmbeddings(spark, sf).collect().map(r =>
      r.getLong(0) -> r.getSeq[Double](1)).toMap
    val e2 = FastRP.userEmbeddings(spark, sf).collect().map(r =>
      r.getLong(0) -> r.getSeq[Double](1)).toMap
    assert(e1.keySet == e2.keySet)
    e1.keys.take(20).foreach { k =>
      assert(e1(k).zip(e2(k)).forall { case (a, b) => math.abs(a - b) < 1e-12 },
        s"non-deterministic embedding for $k")
    }
    // unit norm — up to ~4e-6 deviation since r7's 1e-6 coordinate
    // snap (each of 64 coords may move ≤ 5e-7; see FastRP.normalized)
    e1.values.take(20).foreach { v =>
      val n = math.sqrt(v.map(x => x * x).sum)
      assert(math.abs(n - 1.0) < 1e-5 || n < 1e-12)
    }
  }

  test("lsh knnEdges: respects topK and cutoff, no self-edges") {
    val edges = Lsh.knnEdges(FastRP.userEmbeddings(spark, sf),
      "user_id", "embedding", 64, topK = 5, cutoff = 0.1)
    val perSrc = edges.groupBy("src").count().agg(max("count")).head().getLong(0)
    assert(perSrc <= 5)
    assert(edges.filter(col("src") === col("dst")).isEmpty)
    assert(edges.filter(col("similarity") < 0.1).isEmpty)
  }

  test("lsh nearDupPairs finds the planted near-identical vectors") {
    val base = Array.tabulate(64)(i => math.sin(i + 1))
    val nearDup = base.clone(); nearDup(0) += 0.01
    val far = Array.tabulate(64)(i => math.cos(3 * i + 2))
    val df = Seq((1L, base.toSeq), (2L, nearDup.toSeq), (3L, far.toSeq))
      .toDF("id", "vec")
      .select(col("id"), col("vec").cast("array<float>").as("vec"))
    val pairs = Lsh.nearDupPairs(df, "id", "vec", 64, minCosine = 0.99)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet == Set((1L, 2L)))
  }

  test("minhash pairs ⊇ high-jaccard ground truth at sf0.001") {
    val mh = dedup.Dedup.minhashPairs(spark, sf, minEstJaccard = 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = dedup.Dedup.ngramJaccardPairs(spark, sf, minJaccard = 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "fixture assumption: sf0.001 has >=1 pair with jaccard>=0.9")
    assert(exact.subsetOf(mh), s"minhash missed: ${exact -- mh}")
  }

  test("ann: lsh and ivf top-k overlap the exact brute-force top-k") {
    val exact = ann.AnnSearch.bruteForceTopK(spark, sf).collect().map(_.getLong(0)).toSet
    val lsh = ann.AnnSearch.lshTopK(spark, sf).collect().map(_.getLong(0)).toSet
    val ivf = ann.AnnSearch.ivfTopK(spark, sf).collect().map(_.getLong(0)).toSet
    assert((exact & lsh).size >= 3, s"lsh recall too low: ${(exact & lsh).size}/10")
    assert((exact & ivf).size >= 2, s"ivf recall too low: ${(exact & ivf).size}/10")
  }
}
