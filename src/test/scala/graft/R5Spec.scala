package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.SemDedup

/** Fixture + invariant specs for the round-5 operator additions. */
class R5Spec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  // 2-dim vectors; centroids are vec_id 0 = e_x and vec_id 1 = e_y
  private val semFixture = Seq(
    (0L, Array(1.0f, 0.0f)),
    (1L, Array(0.0f, 1.0f)),
    (2L, Array(0.9f, 0.1f)),
    (3L, Array(1.0f, 0.05f)),
    (4L, Array(0.1f, 0.9f)),
    (5L, Array(-1.0f, 0.2f))).toDF("vec_id", "embedding")

  test("semdedup: assignment routes to the max-cosine centroid, ties to the lowest id") {
    val asg = SemDedup.assignmentsOf(semFixture, k = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(asg == Map(0L -> 0L, 1L -> 1L, 2L -> 0L, 3L -> 0L, 4L -> 1L, 5L -> 1L))
  }

  test("semdedup: keep-priority scan removes centroid-near dups, keeps the diverse tail") {
    // cluster 0 = {0,2,3}: all pairwise cosines >= 0.95; priority order
    // (cos_centroid ASC) is [2, 3, 0] so only 2 survives.
    // cluster 1 = {1,4,5}: only (1,4) is a dup; priority [5, 4, 1] so 1
    // is removed by 4, and 5 (far from centroid) survives untouched.
    val kept = SemDedup.survivorsOf(semFixture, k = 2, tau = 0.95)
      .select("vec_id").as[Long].collect().toSet
    assert(kept == Set(2L, 4L, 5L))
    val pairs = SemDedup.pairsOf(semFixture, k = 2, tau = 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 2L), (0L, 3L), (2L, 3L), (1L, 4L)))
  }

  test("semdedup: impossible threshold keeps everything; k=1 degenerates to global greedy") {
    assert(SemDedup.survivorsOf(semFixture, k = 2, tau = 2.0).count() == 6)
    // k=1: one cluster, priority by cos to centroid e_x ASC — the
    // near-identical trio {0,2,3} still collapses to one survivor
    val kept = SemDedup.survivorsOf(semFixture, k = 1, tau = 0.95)
      .select("vec_id").as[Long].collect().toSet
    assert(!kept.contains(0L) || !kept.contains(3L))
    assert(kept.intersect(Set(0L, 2L, 3L)).size == 1)
  }

  test("semdedup: survivors + removed partition the corpus; no surviving pair is a dup") {
    val n = Tables.embeddings(spark, sf).count()
    val kept = SemDedup.survivors(spark, sf)
    val keptIds = kept.select("vec_id")
    // every removed id must appear as the LATER side of some dup pair
    // with an earlier-priority partner (soundness of removal)
    val pairs = SemDedup.pairs(spark, sf)
    assert(kept.count() <= n)
    // the removal order is a strict total order within each cluster
    // (cos_centroid, then vec_id), so EVERY within-cluster dup pair has a
    // later-priority side and that side is removed — no dup pair can
    // have both endpoints survive
    val bothKept = pairs
      .join(keptIds.withColumnRenamed("vec_id", "id_a"), Seq("id_a"), "left_semi")
      .join(keptIds.withColumnRenamed("vec_id", "id_b"), Seq("id_b"), "left_semi")
    assert(bothKept.isEmpty, "a within-cluster dup pair survived whole")
  }

  test("leidenRefine: splits a through-another-community 'community', identity elsewhere") {
    // community 1 = {1,2,5,6} is internally DISCONNECTED ({1,2} and
    // {5,6} touch only through node 3 in community 3) — the exact defect
    // Traag et al. 2019 fig. 1 shows for Louvain
    val edges = Seq((1L, 2L, 1.0), (5L, 6L, 1.0), (2L, 3L, 1.0), (3L, 5L, 1.0))
      .toDF("src", "dst", "weight")
    val labels = Seq((1L, 1L), (2L, 1L), (5L, 1L), (6L, 1L), (3L, 3L))
      .toDF("node_id", "community")
    val refined = graph.Louvain.leidenRefine(edges, labels).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(refined == Map(1L -> 1L, 2L -> 1L, 5L -> 5L, 6L -> 5L, 3L -> 3L))
  }

  test("leidenRefine: members with no intra-community edge become singletons") {
    val edges = Seq((1L, 2L, 1.0), (2L, 9L, 1.0)).toDF("src", "dst", "weight")
    val labels = Seq((1L, 1L), (2L, 1L), (9L, 9L), (7L, 1L)) // 7 is stranded in 1
      .toDF("node_id", "community")
    val refined = graph.Louvain.leidenRefine(edges, labels).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(refined == Map(1L -> 1L, 2L -> 1L, 9L -> 9L, 7L -> 7L))
  }

  private def bic(pairs: (Long, Long)*) = pairs.toDF("src", "dst")

  test("biconnectivity: square+tail — tail edges are bridges, joints are cut vertices") {
    val g = bic((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (4L, 5L), (5L, 6L))
    val bridges = graph.Biconnectivity.bridges(g)
      .as[(Long, Long)].collect().toSet
    assert(bridges == Set((4L, 5L), (5L, 6L)))
    val aps = graph.Biconnectivity.articulationPoints(g).as[Long].collect().toSet
    assert(aps == Set(4L, 5L))
  }

  test("biconnectivity: two triangles sharing a vertex — no bridges, one cut vertex") {
    val g = bic((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (3L, 5L))
    assert(graph.Biconnectivity.bridges(g).isEmpty)
    assert(graph.Biconnectivity.articulationPoints(g).as[Long].collect().toSet == Set(3L))
  }

  test("biconnectivity: barbell — the connecting edge is the bridge, both joints cut") {
    val g = bic((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (4L, 6L))
    assert(graph.Biconnectivity.bridges(g).as[(Long, Long)].collect().toSet ==
      Set((3L, 4L)))
    assert(graph.Biconnectivity.articulationPoints(g).as[Long].collect().toSet ==
      Set(3L, 4L))
  }

  test("biconnectivity: trees are all bridges; cycles have none; disconnected components compose") {
    val path = bic((1L, 2L), (2L, 3L), (3L, 4L))
    assert(graph.Biconnectivity.bridges(path).count() == 3)
    assert(graph.Biconnectivity.articulationPoints(path).as[Long].collect().toSet ==
      Set(2L, 3L))
    // 4-cycle plus a disjoint 2-path: the cycle contributes nothing,
    // the path contributes its edge structure
    val mixed = bic((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (10L, 11L), (11L, 12L))
    assert(graph.Biconnectivity.bridges(mixed).as[(Long, Long)].collect().toSet ==
      Set((10L, 11L), (11L, 12L)))
    assert(graph.Biconnectivity.articulationPoints(mixed).as[Long].collect().toSet ==
      Set(11L))
  }

  test("sllpa: memberships are bounded, deterministic, and drawn from the graph") {
    // two triangles sharing node 4
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (4L, 6L))
    val edges = (tri ++ tri.map(p => p._2 -> p._1)).toDF("src", "dst")
    val run1 = graph.Sllpa.sllpa(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val run2 = graph.Sllpa.sllpa(edges).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(run1.toSeq == run2.toSeq, "hash draws must be run-deterministic")
    val nodes = (1L to 6L).toSet
    assert(run1.forall { case (v, l, c) =>
      nodes(v) && nodes(l) && c >= 2 && c <= 4
    })
    // memory strength can never exceed rounds+1 and the threshold floor
    // is ceil(0.3*4)=2 — checked above; labels must come from somewhere
    // reachable (here the whole graph is one component)
  }

  test("bpeTrainMerges: textbook low/lower corpus — merges lo, low, then e+r on the tie") {
    // freqs: low×3, lower×2, newest×1. Round 1 ties (l,o) with (o,w) at 5
    // → lexicographic l wins; round 2 (lo,w) at 5; round 3 ties (low,e)
    // with (e,r) at 2 → 'e' < 'low' so (e,r) wins.
    val words = Seq(("low", 3L), ("lower", 2L), ("newest", 1L)).toDF("word", "freq")
    val merges = text.TextOps.bpeTrainMergesOf(words, rounds = 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges.toSeq == Seq((1L, "l", "o", 5L), (2L, "lo", "w", 5L), (3L, "e", "r", 2L)))
  }

  test("bpeTrainMerges: back-to-back repeats merge greedily left-to-right") {
    // "aaaa"×1: round 1 pair (a,a) count 3; applied greedily → (aa)(aa),
    // so round 2 must see (aa,aa) count 1 — the iterated-replace
    // fixpoint semantics, not single-pass replace-all (which would
    // leave |aa|a|a| and report (aa,a))
    val words = Seq(("aaaa", 1L)).toDF("word", "freq")
    val merges = text.TextOps.bpeTrainMergesOf(words, rounds = 2).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(merges.toSeq == Seq((1L, "a", "a", 3L), (2L, "aa", "aa", 1L)))
  }

  test("bpeEncode: low/lower corpus segmentations reflect the trained merges") {
    // after merges (l,o), (lo,w), (e,r): low → |low|, lower → |low|e|r|
    // → |low|er|, newest → all single chars (no trained merge applies
    // except er: n|e|w|e|s|t has e,s — er only as adjacent 'e''r', absent)
    val words = Seq(("low", 3L), ("lower", 2L), ("newest", 1L)).toDF("word", "freq")
    val enc = text.TextOps.bpeEncodeOf(words, rounds = 3, k = 10).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getString(3))).toMap
    assert(enc("low") == (1L, "|low|"))
    assert(enc("lower") == (2L, "|low|er|"))
    assert(enc("newest") == (6L, "|n|e|w|e|s|t|"))
  }

  test("mergeWalkPairCounts (T16): walk-delta fold ≡ full recompute, counts then embedding") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val cooc = graph.RatingsGraph.cooccurrenceEdges(spark, dir)
      .select(col("u1").as("src"), col("u2").as("dst"), col("weight"))
    val walks = graph.Algorithms.node2vecWalkCorpus(cooc,
      walksPerNode = 2, steps = 4, symmetric = true, weighted = true)
      .localCheckpoint()
    // delta split: walks partitioned by walk_id parity — "old corpus"
    // = even walks, the fold adds the odd ones and removes a slice of
    // the evens (the add + remove pair every incremental op needs)
    val evens = walks.filter(col("walk_id") % 2 === 0)
    val odds = walks.filter(col("walk_id") % 2 =!= 0)
    val removedIds = evens.select(col("walk_id")).distinct().limit(3)
    val removed = evens.join(removedIds, Seq("walk_id"), "left_semi")
      .localCheckpoint()
    val kept = evens.join(removedIds, Seq("walk_id"), "left_anti")

    val folded = graph.Node2Vec.mergeWalkPairCounts(
      graph.Node2Vec.walkPairCounts(evens), odds, removed)
    val full = graph.Node2Vec.walkPairCounts(kept.unionAll(odds))
    // counts are LONG-additive: fold ≡ recompute is exact set equality
    def cmap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val (fm, mm) = (cmap(full), cmap(folded))
    assert(mm == fm,
      s"count fold diverged: only-folded=${(mm.toSet -- fm.toSet).take(3)} " +
        s"only-full=${(fm.toSet -- mm.toSet).take(3)}")

    // the embedding tail derives from the folded counts alone —
    // embedFromCounts(folded) ≡ embedWalks(final corpus)
    def emap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val viaFold = emap(graph.Node2Vec.embedFromCounts(folded, dim = 16))
    val viaFull = emap(graph.Node2Vec.embedWalks(kept.unionAll(odds), dim = 16))
    assert(viaFold.keySet == viaFull.keySet)
    viaFull.foreach { case (id, v) => v.zip(viaFold(id)).foreach {
      case (a, b) => assert(math.abs(a - b) < 1e-9, s"node $id") } }
  }

  test("mergeScoredPairs: incremental fold equals the full recompute after a delta") {
    import org.apache.spark.sql.functions._
    val dim = 64
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("embedding")).localCheckpoint()
    // delta: 3 vectors re-embedded (reversed arrays — guaranteed sig
    // churn), 1 new vector, 1 deleted
    val changedIds = Seq(1L, 5L, 9L, 999999L, 2L).toDF("vec_id")
    val reEmbedded = emb.filter(col("vec_id").isin(1L, 5L, 9L))
      .select(col("vec_id"), reverse(col("embedding")).as("embedding"))
    val added = emb.filter(col("vec_id") === 0L)
      .select(lit(999999L).as("vec_id"), reverse(col("embedding")).as("embedding"))
    val newEmb = emb
      .filter(!col("vec_id").isin(1L, 5L, 9L, 2L)) // 2 deleted
      .unionAll(reEmbedded).unionAll(added).localCheckpoint()
    val oldScored = ann.Lsh.scoredPairs(emb, "vec_id", "embedding", dim)
    val full = ann.Lsh.scoredPairs(newEmb, "vec_id", "embedding", dim)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val merged = ann.Lsh.mergeScoredPairs(oldScored, newEmb, changedIds,
        "vec_id", "embedding", dim)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(merged.keySet == full.keySet,
      s"pair sets diverged: only-merged=${(merged.keySet -- full.keySet).take(5)} " +
        s"only-full=${(full.keySet -- merged.keySet).take(5)}")
    merged.foreach { case (k, c) => assert(math.abs(c - full(k)) < 1e-12, s"$k") }
  }

  test("mergeEmbeddings (T15): incremental fold equals the full re-embed after a delta") {
    import org.apache.spark.sql.functions._
    val dim = 16
    val dir = "/root/testdata/sf0.001"
    val edges0 = graph.Algorithms.bipartiteEdges(spark, dir).localCheckpoint()
    // delta: every edge of user-node 4 re-weighted (+1), user-node 6
    // deleted outright, a brand-new user-node rating two books — the
    // add/re-weight/delete triple, all in the frame's both-directions form
    val target = 4L
    val removed = 6L
    val newNode = 999998L
    val books = edges0.filter(col("src") % 2 === 1).select(col("src"))
      .distinct().limit(2).collect().map(_.getLong(0))
    val reweighted = edges0
      .filter(col("src") === target || col("dst") === target)
      .select(col("src"), col("dst"), (col("weight") + 1.0).as("weight"))
    val addedEdges = books.toSeq.toDF("b")
      .select(lit(newNode).as("src"), col("b").as("dst"), lit(7.0).as("weight"))
    val addedBoth = addedEdges.unionAll(addedEdges
      .select(col("dst").as("src"), col("src").as("dst"), col("weight")))
    val dropped = edges0
      .filter(col("src") === removed || col("dst") === removed)
    val newEdges = edges0
      .filter(col("src") =!= removed && col("dst") =!= removed)
      .filter(col("src") =!= target && col("dst") =!= target)
      .unionAll(reweighted).unionAll(addedBoth).localCheckpoint()
    val changed = reweighted.select(col("src"), col("dst"))
      .unionAll(dropped.select(col("src"), col("dst")))
      .unionAll(addedBoth.select(col("src"), col("dst")))

    val old = graph.FastRP.embedStates(edges0, dim)
    val full = graph.FastRP.embedStates(newEdges, dim)
    val merged = graph.FastRP.mergeEmbeddings(old, newEdges, changed, dim)

    def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val (fm, mm) = (toMap(full.embedding), toMap(merged.embedding))
    assert(mm.keySet == fm.keySet,
      s"node sets diverged: only-merged=${(mm.keySet -- fm.keySet).take(5)} " +
        s"only-full=${(fm.keySet -- mm.keySet).take(5)}")
    assert(!mm.contains(removed) && mm.contains(newNode))
    // states are 6-decimal-snapped, so incremental ≡ full is BIT
    // equality (< 1e-9 means same snapped value)
    fm.foreach { case (id, v) =>
      v.zip(mm(id)).zipWithIndex.foreach { case ((a, b), j) =>
        assert(math.abs(a - b) < 1e-9, s"node $id dim $j: full $a vs merged $b") }
    }
    // the retained states must ALSO match — they are the silver the
    // NEXT delta folds into
    val (fs, ms) = (toMap(full.states.last.select(col("node_id"), col("emb"))),
      toMap(merged.states.last.select(col("node_id"), col("emb"))))
    assert(ms.keySet == fs.keySet)
    fs.foreach { case (id, v) =>
      v.zip(ms(id)).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-9, s"state node $id: $a vs $b") }
    }
  }

  test("bpeCorpusEncode/bpeTokenPack: full-corpus apply covers every doc, pack bins are exact prefix sums") {
    val dir = "/root/testdata/sf0.001"
    val nDocs = Tables.documents(spark, dir).count()
    val enc = text.TextOps.bpeCorpusEncode(spark, dir).collect()
    // the vocabulary is built FROM the corpus, so the inner join drops
    // nothing: one row per document
    assert(enc.length == nDocs)
    // each word encodes to >= 1 symbol, and 3 merge rounds can at most
    // halve nothing below one symbol per word
    enc.foreach { r =>
      assert(r.getLong(2) >= r.getLong(1),
        s"doc ${r.getLong(0)}: fewer BPE tokens than words") }
    // pack rows replay the per-shard running offsets exactly
    val pack = text.TextOps.bpeTokenPack(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(pack.length == nDocs)
    pack.groupBy(_._2).foreach { case (_, rows) =>
      var off = 0L
      rows.sortBy(_._1).foreach { case (_, _, n, bin, boff) =>
        assert(bin == off / 2048 && boff == off % 2048)
        off += n
      }
    }
    // the packer's n_tokens column IS the corpus-encode count
    val encMap = enc.map(r => r.getLong(0) -> r.getLong(2)).toMap
    pack.foreach { case (doc, _, n, _, _) => assert(encMap(doc) == n) }
  }

  test("rwrSample: visit counts conserve walker-steps and stay inside the component") {
    // 1-2-3 triangle plus unreachable 10-11: walkers from 1 never leave
    // the triangle, and total visits = walkers * (steps + 1)
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (10L, 11L)).toDF("src", "dst")
    val out = graph.Algorithms.rwrSample(edges, source = 1L, walkers = 4, steps = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet.subsetOf(Set(1L, 2L, 3L)))
    assert(out.values.sum == 4L * 6L)
    assert(out(1L) >= 4L) // every walker's step 0
  }

  test("kSpanningClusters: cluster count and partition shape at sf") {
    val clusters = graph.Algorithms.kSpanningClusters(spark, sf, k = 5)
    val n = clusters.count()
    assert(clusters.select("node_id").distinct().count() == n)
    val cooc = graph.RatingsGraph.cooccurrenceEdges(spark, sf)
    val nNodes = cooc.select("u1").distinct().count()
    assert(n == nNodes)
    // k=1 means no cuts: clusters == components of the forest
    val k1 = graph.Algorithms.kSpanningClusters(spark, sf, k = 1)
      .select("cluster").distinct().count()
    val k5 = clusters.select("cluster").distinct().count()
    assert(k5 == k1 + 4, s"cutting 4 forest edges must add 4 clusters ($k1 -> $k5)")
  }

  test("hashgnn: identical neighborhoods embed identically; disjoint ones differ") {
    // 1 and 2 share the exact neighbor set; 3 lives elsewhere
    val adj = Seq(1L -> 10L, 1L -> 11L, 1L -> 12L, 2L -> 10L, 2L -> 11L, 2L -> 12L,
      3L -> 20L, 3L -> 21L, 3L -> 22L)
    val edges = (adj ++ adj.map(p => p._2 -> p._1)).toDF("src", "dst")
    val out = graph.HashGnn.embeddings(edges).collect()
      .map(r => r.getLong(0) -> r.getAs[Number](1).longValue)
      .groupBy(_._1).map { case (v, bs) => v -> bs.map(_._2).toSet }
    assert(out(1L) == out(2L), "equal neighborhoods must select equal bit sets")
    assert(out(1L) != out(3L), "disjoint neighborhoods picked identical bits")
    // selections are bounded by the draw count
    assert(out.values.forall(_.size <= 8))
  }

  test("leiden: end-to-end communities are internally connected and canonically labelled") {
    // two 3-cliques joined by one weak edge
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L))
    val all = (tri ++ Seq((3L, 4L))) flatMap { case (a, b) => Seq((a, b, 1.0), (b, a, 1.0)) }
    val got = graph.Louvain.leiden(all.toDF("src", "dst", "weight"), assumeGrouped = true)
    val labels = got.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(labels.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L))
    // canonical: each community label is its min member
    labels.groupBy(_._2).foreach { case (c, members) =>
      assert(members.keys.min == c, s"community $c not canonically labelled")
    }
    // connectivity: recompute components within each community by hand
    val adj = all.groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    labels.groupBy(_._2).foreach { case (c, members) =>
      val nodes = members.keySet
      var seen = Set(nodes.head)
      var frontier = Set(nodes.head)
      while (frontier.nonEmpty) {
        frontier = frontier.flatMap(n => adj.getOrElse(n, Set.empty))
          .intersect(nodes) -- seen
        seen ++= frontier
      }
      assert(seen == nodes, s"community $c internally disconnected")
    }
  }
}
