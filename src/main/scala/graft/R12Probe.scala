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
    val sectionArgs: Seq[String] =
      if (args.length > 1) args.tail.toSeq else Seq("node2vec", "core", "plans")
    val sectionBodies = scala.collection.mutable.LinkedHashMap[String, () => Unit]()
    def section(name: String)(body: => Unit): Unit =
      sectionBodies(name) = () => body
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
.config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // stage-level accounting (guide §1/§7): per timed block, where did
    // the wall go — executor compute, GC, shuffle read/write, result
    // ser — and how much was sheer stage count (scheduler overhead)
    val acc = new java.util.concurrent.atomic.AtomicReference(
      (0L, 0L, 0L, 0L, 0)) // runTime, gcTime, shufRead, shufWrite, nStages
    val stageLog = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, Int)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val m = sc.stageInfo.taskMetrics
          stageLog.add((m.executorRunTime,
            sc.stageInfo.name.take(90), sc.stageInfo.numTasks))
          acc.updateAndGet { case (rt, gc, sr, sw, n) =>
            (rt + m.executorRunTime, gc + m.jvmGCTime,
              sr + m.shuffleReadMetrics.totalBytesRead,
              sw + m.shuffleWriteMetrics.bytesWritten, n + 1)
          }: Unit
        }
      })
    def dumpStages(top: Int = 12): Unit = {
      import scala.jdk.CollectionConverters._
      val all = stageLog.asScala.toVector
      stageLog.clear()
      all.sortBy(-_._1).take(top).foreach { case (rt, name, nt) =>
        println(f"[stage] ${rt / 1e3}%8.1fcs tasks=$nt%-4d $name") }
    }
    def time[T](label: String)(f: => T): T = {
      val before = acc.get()
      val t0 = System.nanoTime()
      val r = f
      val wall = (System.nanoTime() - t0) / 1e9
      val after = acc.get()
      val (rt, gc) = ((after._1 - before._1) / 1e3, (after._2 - before._2) / 1e3)
      val (sr, sw) = ((after._3 - before._3) / 1e6, (after._4 - before._4) / 1e6)
      val ns = after._5 - before._5
      println(f"[probe] $label%-40s $wall%8.2fs  exec=${rt}%.1fcs gc=${gc}%.1fcs shufR=${sr}%.0fMB shufW=${sw}%.0fMB stages=$ns")
      r
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val cooc = graph.RatingsGraph.cooccurrenceEdges(spark, sfDir)
    time("warm: cooccurrence silver")(cooc.count())

    section("lpa") {
      // A/B the r12 iterState broadcast pin on label propagation: the
      // bench read lpa_communities 6.5 s (pre-pin) → ~15 s (pinned),
      // consistent across both silver passes — isolate whether the pin
      // (conf-gated) or the max_by pick is the cost
      val edges = cooc.select(col("u1").as("src"), col("u2").as("dst"), col("weight"))
      spark.conf.set("graft.iter.broadcastBytes", "0")
      time("lpa: pin OFF (gate=0), run 1") {
        noop(graph.Algorithms.labelPropagation(edges))
      }
      time("lpa: pin OFF (gate=0), run 2") {
        noop(graph.Algorithms.labelPropagation(edges))
      }
      spark.conf.set("graft.iter.broadcastBytes", "134217728")
      time("lpa: pin ON (default gate), run 1") {
        noop(graph.Algorithms.labelPropagation(edges))
      }
      time("lpa: pin ON (default gate), run 2") {
        noop(graph.Algorithms.labelPropagation(edges))
      }
    }

    section("node2vec") {
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

    section("benchseq") {
      // replicate the bench's silver PREFIX in order (real builders,
      // session cache included) — the bench read lpa p1 at 73 s and
      // louvain p1 at 38 s right after these, while both run in ~5 s
      // isolated; find the poisoning step
      time("s: ratings")(graph.RatingsGraph.ratings(spark, sfDir).count())
      time("s: pair_stats")(graph.Algorithms.coRatedPairStats(spark, sfDir).count())
      time("s: pair_stats_liked")(graph.Algorithms.coRatedPairStats(spark, sfDir, minRating = 6).count())
      time("s: liked_norms")(graph.Algorithms.likedNorms(spark, sfDir).count())
      time("s: cooccurrence")(graph.RatingsGraph.cooccurrenceEdges(spark, sfDir).count())
      time("s: fastrp")(graph.FastRP.userEmbeddings(spark, sfDir).count())
      time("s: node2vec_emb")(graph.Node2Vec.userEmbeddings(spark, sfDir).count())
      time("s: knn_scored_pairs")(graph.Algorithms.userScoredPairs(spark, sfDir).count())
      stageLog.clear()
      time("s: lpa_communities")(graph.Algorithms.userCommunities(spark, sfDir).count())
      dumpStages(8)
      stageLog.clear()
      time("s: louvain_communities")(graph.Louvain.userCommunities(spark, sfDir).count())
      dumpStages(8)
    }

    section("seq2") {
      // bisect benchseq: does fastrp (real silver) alone poison the
      // following node2vec_emb build?
      time("s: fastrp")(graph.FastRP.userEmbeddings(spark, sfDir).count())
      stageLog.clear()
      time("s: node2vec_emb")(graph.Node2Vec.userEmbeddings(spark, sfDir).count())
      dumpStages(10)
      time("s: lpa_communities")(graph.Algorithms.userCommunities(spark, sfDir).count())
    }

    section("seq3") {
      // bisect benchseq: pair_stats family alone before node2vec_emb
      time("s: pair_stats")(graph.Algorithms.coRatedPairStats(spark, sfDir).count())
      time("s: pair_stats_liked")(graph.Algorithms.coRatedPairStats(spark, sfDir, minRating = 6).count())
      time("s: node2vec_emb")(graph.Node2Vec.userEmbeddings(spark, sfDir).count())
      time("s: lpa_communities")(graph.Algorithms.userCommunities(spark, sfDir).count())
    }

    section("n2vsilver") {
      stageLog.clear()
      time("s: node2vec_emb")(graph.Node2Vec.userEmbeddings(spark, sfDir).count())
      dumpStages(10)
      time("s: lpa_communities")(graph.Algorithms.userCommunities(spark, sfDir).count())
    }

    section("core") {
      spark.sparkContext.setJobDescription("probe: core decomposition")
      time("core: full decomposition") {
        noop(graph.Algorithms.coreDecomposition(
          cooc.select(col("u1").as("src"), col("u2").as("dst"))))
      }
    }

    section("pagerank") {
      spark.sparkContext.setJobDescription("probe: pagerank 10 iters")
      time("pagerank: 10 iters tol=1e-6") {
        noop(graph.Algorithms.pageRank(
          cooc.select(col("u1").as("src"), col("u2").as("dst"), col("weight")),
          iterations = 10))
      }
    }

    section("louvain") {
      spark.sparkContext.setJobDescription("probe: louvain 2 levels")
      time("louvain: 2 levels x 6 sweeps") {
        noop(graph.Louvain.louvain(
          cooc.select(col("u1").as("src"), col("u2").as("dst"), col("weight")),
          assumeGrouped = true))
      }
    }

    section("fastrpAB") {
      // is the 17 s bipartite embed codegen-compile-bound (the k-means
      // Janino precedent) or execution-bound? A/B whole-stage codegen
      // and time two consecutive runs of each
      val be = graph.Algorithms.bipartiteEdges(spark, sfDir)
      be.count()
      for (ws <- Seq("true", "false"); r <- 1 to 2) {
        spark.conf.set("spark.sql.codegen.wholeStage", ws)
        time(s"fastrp bipartite embed wholeStage=$ws run $r") {
          noop(graph.FastRP.embed(be))
        }
      }
      // hypothesis: the 64-wide stage methods Janino-compile fine but
      // exceed HotSpot's 8000-bytecode JIT HugeMethodLimit and run
      // INTERPRETED — capping Spark's hugeMethodLimit at 8000 makes
      // codegen fall back per-stage exactly where JIT would bail
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.hugeMethodLimit", "8000")
      for (r <- 1 to 2)
        time(s"fastrp bipartite embed hugeMethodLimit=8000 run $r") {
          noop(graph.FastRP.embed(be))
        }
      spark.conf.unset("spark.sql.codegen.hugeMethodLimit")
    }

    section("fastrp") {
      spark.sparkContext.setJobDescription("probe: fastrp bipartite")
      stageLog.clear()
      time("fastrp: bipartite embed") {
        noop(graph.FastRP.embed(graph.Algorithms.bipartiteEdges(spark, sfDir)))
      }
      dumpStages()
    }

    section("fastrp2") {
      // dissect one propagate step: which piece of the 40–130 cs/iter
      // is the cost — the BHJ, the vecSum UDAF, or the checkpoint?
      val be = graph.Algorithms.bipartiteEdges(spark, sfDir)
      val e = be.select(col("src"), col("dst"), col("weight").cast("double"))
        .repartition(col("dst"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nodes = e.select(col("src").as("node_id")).distinct().localCheckpoint()
      val nV = nodes.count()
      val state = nodes.select(col("node_id"),
        transform(sequence(lit(0), lit(63)),
          j => (col("node_id") + j).cast("double")).as("emb")).localCheckpoint()
      state.count()
      val joined = e.join(graph.Algorithms.iterState(
        state.select(col("node_id").as("src"), col("emb")), nV, 536L), Seq("src"))
      stageLog.clear()
      time("step: join only (count weight)") {
        noop(joined.groupBy(col("dst")).agg(sum(col("weight")).as("w")))
      }
      time("step: join + vecSum") {
        noop(joined.groupBy(col("dst")).agg(sum(col("weight")).as("w"),
          graft.functions.VectorOps.vecSum(64)(
            transform(col("emb"), v => v * col("weight"))).as("semb")))
      }
      spark.conf.set("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      time("step: join + vecSum, no sort fallback") {
        noop(joined.groupBy(col("dst")).agg(sum(col("weight")).as("w"),
          graft.functions.VectorOps.vecSum(64)(
            transform(col("emb"), v => v * col("weight"))).as("semb")))
      }
      spark.conf.unset("spark.sql.objectHashAggregate.sortBased.fallbackThreshold")
      dumpStages(8)
      val plan = joined.groupBy(col("dst")).agg(
        graft.functions.VectorOps.vecSum(64)(
          transform(col("emb"), v => v * col("weight"))).as("semb"))
      println(plan.queryExecution.executedPlan.toString.take(3000))
    }

    section("plans") {
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

    sectionArgs.foreach { name =>
      sectionBodies.get(name) match {
        case Some(body) => body()
        case None => System.err.println(s"[probe] unknown section $name")
      }
    }
    spark.stop()
  }
}
