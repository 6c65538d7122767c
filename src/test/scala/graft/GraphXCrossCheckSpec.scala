package graft

import org.apache.spark.graphx.{Edge, Graph}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.Algorithms

/** Cross-validation of the DataFrame-native graph algorithms against
  * Spark's own GraphX implementations on the real sf0.001 ratings graph —
  * independent implementations agreeing on real data is the strongest
  * correctness evidence available for the rows-only-oracle operators. */
class GraphXCrossCheckSpec extends AnyFunSuite {
  import TestSpark._

  test("connectedComponents matches GraphX on the bipartite ratings graph") {
    val edges = Algorithms.bipartiteEdges(spark, sf)
      .select("src", "dst").distinct()
    val ours = Algorithms.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    val gxEdges = edges.rdd.map(r => Edge(r.getLong(0), r.getLong(1), 1))
    val gx = Graph.fromEdges(gxEdges, 0)
    val gxCC = gx.connectedComponents().vertices.collect().toMap

    assert(ours.keySet == gxCC.keySet)
    // both label a component by its minimum vertex id
    ours.foreach { case (node, comp) =>
      assert(gxCC(node) == comp, s"node $node: ours=$comp graphx=${gxCC(node)}")
    }
  }

  test("stronglyConnectedComponents matches GraphX SCC on the supply-return graph") {
    val ours = Algorithms.supplyChainScc(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

    val li = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_quantity") >= 50)
    val fwd = li.filter(col("l_returnflag") =!= "R")
      .select((col("o_custkey") * 2).cast("long").as("src"),
        (col("l_suppkey") * 2 + 1).cast("long").as("dst"))
    val bwd = li.filter(col("l_returnflag") === "R")
      .select((col("l_suppkey") * 2 + 1).cast("long").as("src"),
        (col("o_custkey") * 2).cast("long").as("dst"))
    val gxEdges = fwd.unionByName(bwd).distinct()
      .rdd.map(r => Edge(r.getLong(0), r.getLong(1), 1))
    // GraphX SCC also labels by the minimum vertex id in the component;
    // restrict to edge-incident vertices (fromEdges adds no extras)
    val gxScc = Graph.fromEdges(gxEdges, 0)
      .stronglyConnectedComponents(numIter = 20)
      .vertices.collect().toMap

    assert(ours.keySet == gxScc.keySet)
    ours.foreach { case (node, comp) =>
      assert(gxScc(node) == comp, s"node $node: ours=$comp graphx=${gxScc(node)}")
    }
  }

  test("triangleCount matches GraphX TriangleCount total on the cooc graph") {
    val edges = graph.RatingsGraph.cooccurrenceEdges(spark, sf)
      .select(col("u1").as("src"), col("u2").as("dst"))
    val ours = Algorithms.triangleCount(edges).head().getLong(0)
    val gxEdges = edges.filter(col("src") < col("dst")).distinct()
      .rdd.map(r => Edge(r.getLong(0), r.getLong(1), 1))
    val gx = Graph.fromEdges(gxEdges, 0)
    // GraphX counts each triangle at all three vertices
    val gxTotal = gx.triangleCount().vertices.map(_._2.toLong).sum().toLong / 3
    assert(ours == gxTotal, s"ours=$ours graphx=$gxTotal")
  }

  test("bfsHops: hand-checked distances on a path graph") {
    import spark.implicits._
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("src", "dst")
    val d = Algorithms.bfsHops(edges, source = 1L, maxHops = 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L), s"got $d")
  }

  test("pageRank ranking agrees with GraphX staticPageRank on unweighted cooc graph") {
    val edges = graph.RatingsGraph.cooccurrenceEdges(spark, sf)
      .select(col("u1").as("src"), col("u2").as("dst"), lit(1.0).as("weight"))
    val ours = Algorithms.pageRank(edges, iterations = 15).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap

    val gxEdges = edges.select("src", "dst").rdd.map(r => Edge(r.getLong(0), r.getLong(1), 1.0))
    val gx = Graph.fromEdges(gxEdges, 0.0)
    val gxPR = gx.staticPageRank(15, 0.15).vertices.collect().toMap

    assert(ours.keySet == gxPR.keySet)
    // same fixed-point equations → near-identical values
    val maxDiff = ours.map { case (n, r) => math.abs(r - gxPR(n)) }.max
    assert(maxDiff < 1e-3, s"max abs diff vs GraphX: $maxDiff")
    // and identical top-10 ordering
    val oursTop = ours.toSeq.sortBy { case (n, r) => (-r, n) }.take(10).map(_._1)
    val gxTop = gxPR.toSeq.sortBy { case (n, r) => (-r, n) }.take(10).map(_._1)
    assert(oursTop == gxTop, s"top-10 differ: $oursTop vs $gxTop")
  }
}
