package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only r12 optimization probe: stage-level timing of the heaviest
  * silver builds plus the physical-plan shape of one representative
  * iteration of each loop kernel (guide §1: measure first — is the
  * per-iteration state join BroadcastHash or SortMerge, and does the
  * persisted edge side get re-sorted every round?).
  *
  * Usage: runMain graft.R12Probe <sfDir> [section ...]
  * Sections: node2vec core pagerank louvain fastrp plans
  */
object R12Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val sections: Set[String] =
      if (args.length > 1) args.tail.toSet else Set("node2vec", "core", "plans")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val cooc = graph.RatingsGraph.cooccurrenceEdges(spark, sfDir)
    time("warm: cooccurrence silver")(cooc.count())

    if (sections("node2vec")) {
      spark.sparkContext.setJobDescription("probe: node2vec stages")
      val edges = cooc.select(col("u1").as("src"), col("u2").as("dst"), col("weight"))
      val walks = time("n2v: walk corpus (4x4 weighted)") {
        val w = graph.Algorithms.node2vecWalkCorpus(edges,
          walksPerNode = 4, steps = 4, symmetric = true, weighted = true)
          .localCheckpoint()
        w.count()
        w
      }
      val counts = time("n2v: walkPairCounts") {
        val c = graph.Node2Vec.walkPairCounts(walks).localCheckpoint()
        c.count(); c
      }
      val sppmi = time("n2v: sppmiFromCounts") {
        val s = graph.Node2Vec.sppmiFromCounts(counts).localCheckpoint()
        s.count(); s
      }
      time("n2v: FastRP.embed [0,1]") {
        noop(graph.FastRP.embed(sppmi, 64, iterationWeights = Seq(0.0, 1.0), seed = 1337))
      }
    }

    if (sections("core")) {
      spark.sparkContext.setJobDescription("probe: core decomposition")
      time("core: full decomposition") {
        noop(graph.Algorithms.coreDecomposition(
          cooc.select(col("u1").as("src"), col("u2").as("dst"))))
      }
    }

    if (sections("pagerank")) {
      spark.sparkContext.setJobDescription("probe: pagerank 10 iters")
      time("pagerank: 10 iters tol=1e-6") {
        noop(graph.Algorithms.pageRank(
          cooc.select(col("u1").as("src"), col("u2").as("dst"), col("weight")),
          iterations = 10))
      }
    }

    if (sections("louvain")) {
      spark.sparkContext.setJobDescription("probe: louvain 2 levels")
      time("louvain: 2 levels x 6 sweeps") {
        noop(graph.Louvain.louvain(
          cooc.select(col("u1").as("src"), col("u2").as("dst"), col("weight")),
          assumeGrouped = true))
      }
    }

    if (sections("fastrp")) {
      spark.sparkContext.setJobDescription("probe: fastrp bipartite")
      time("fastrp: bipartite embed") {
        noop(graph.FastRP.embed(graph.Algorithms.bipartiteEdges(spark, sfDir)))
      }
    }

    if (sections("plans")) {
      // ONE representative iteration join of each loop kernel: what join
      // strategy does the planner pick when the state side comes out of
      // localCheckpoint?
      val e = cooc.select(col("u1").as("src"), col("u2").as("dst"))
      val est = e.groupBy(col("src").as("node_id"))
        .agg(count(lit(1)).cast("long").as("est")).localCheckpoint()
      val oneRound = e.join(est.withColumnRenamed("node_id", "dst"), Seq("dst"))
      println("=== core-decomposition round join (state from localCheckpoint) ===")
      println(oneRound.queryExecution.executedPlan.toString.take(4000))

      val eW = cooc.select(col("u1").as("src"), col("u2").as("dst"),
        col("weight").cast("double"))
      val outW = eW.groupBy("src").agg(sum(col("weight")).as("out_w"))
      val norm = eW.join(outW, Seq("src"))
        .select(col("src"), col("dst"), (col("weight") / col("out_w")).as("share"))
        .repartition(col("src"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      norm.count()
      val nodes = e.select(col("src").as("node_id")).distinct().localCheckpoint()
      val ranks = nodes.withColumn("rank", lit(1.0)).localCheckpoint()
      val iter = norm
        .join(ranks.withColumnRenamed("node_id", "src"), Seq("src"))
        .select(col("dst").as("node_id"), (col("share") * col("rank")).as("contrib"))
        .unionAll(nodes.select(col("node_id"), lit(0.0).as("contrib")))
        .groupBy(col("node_id"))
        .agg(sum(col("contrib")).as("rank"))
      println("=== pagerank iteration (norm persisted+repartitioned, ranks from localCheckpoint) ===")
      println(iter.queryExecution.executedPlan.toString.take(5000))
      norm.unpersist(blocking = false)
    }

    spark.stop()
  }
}
