package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only scaling probe (the SURVEY §6 methodology, committed so the
  * 4× numbers are reproducible): materialise an N×-copy dataset — every
  * id column shifted by copy × 10⁷ so the graph copies are DISJOINT and
  * the document corpus is an N×-duplicated corpus (cross-copy texts are
  * genuine exact dups: a realistic dedup load, and the reason dedup
  * outputs grow super-linearly while dedup RUNTIME must not) — then
  * time selected `SparkEntry.queries` against it. Fixed-core sublinear
  * growth here is the property that justifies the 1000-executor
  * extrapolation.
  *
  * Usage: runMain graft.ScaleProbe <srcDir> <outDir> <copies> [q1,q2,…]
  * With outDir == srcDir the generation step is skipped (1× baseline).
  */
object ScaleProbe {
  private val Offset = 10000000L

  def main(args: Array[String]): Unit = {
    val Array(src, out, copiesS) = args.take(3)
    val queries: Seq[String] =
      if (args.length > 3) args(3).split(",").toSeq else Nil
    val copies = copiesS.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    if (out != src) generate(spark, src, out, copies)

    // job counter (r12): Spark JOBS RUN per query — the observable for
    // "iteration rounds stay constant across scale" (an iterative
    // kernel whose convergence degrades at N× shows up here even when
    // the final frame's plan signature is identical)
    def jobsSoFar: Int =
      spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val times = queries.map { q =>
      val j0 = jobsSoFar
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(q)(spark, out)
      val rows = df.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val jobs = jobsSoFar - j0
      // plan-shape signature AFTER timing (taking executedPlan first
      // would warm silvers and fake the cold time) — diffing this
      // between 1× and N× runs catches a size-adaptive threshold that
      // flips the wrong way at scale (broadcast → SMJ, gated legs)
      val plan = df.queryExecution.executedPlan.toString
      val sig = Seq("Exchange", "BroadcastHashJoin", "SortMergeJoin",
          "ShuffledHashJoin", "HashAggregate")
        .map(k => s""""$k":${plan.linesIterator.count(_.contains(k))}""")
        .mkString("{", ",", "}")
      // rows committed next to sec: on an N×-duplicated corpus the
      // DEDUP outputs legitimately grow super-linearly (every doc gains
      // N−1 cross-copy twins → Θ(N²) dup pairs per group) — the honest
      // per-unit denominator for those entries is OUTPUT volume, not
      // input volume, and the row count makes that readable off the line
      println(f"""[plan] {"q":"$q","sec":$sec%.2f,"rows":$rows,"jobs":$jobs,"sig":$sig}""")
      q -> sec
    }
    println(times.map { case (q, s) => f""""$q":$s%.2f""" }
      .mkString(s"""{"copies":$copies,"dir":"$out",""", ",", "}"))
    spark.stop()
  }

  private def generate(spark: SparkSession, src: String, out: String,
      copies: Int): Unit = {
    def shifted(name: String, idCols: Seq[String]): Unit = {
      val base = spark.read.parquet(s"$src/$name.parquet")
      (0 until copies).map { k =>
        idCols.foldLeft(base) { (df, c) =>
          df.withColumn(c, col(c) + lit(k * Offset))
        }
      }.reduce(_.unionAll(_))
        .write.mode("overwrite").parquet(s"$out/$name.parquet")
    }
    shifted("lineitem", Seq("l_orderkey", "l_partkey"))
    shifted("orders", Seq("o_orderkey", "o_custkey"))
    shifted("customer", Seq("c_custkey"))
    shifted("part", Seq("p_partkey"))
    shifted("documents", Seq("doc_id"))
    shifted("embeddings", Seq("vec_id"))
    // un-shifted dimensions/streams (supplier ids are not copied in
    // lineitem, so the 1× tables stay correct for the N× facts); raw
    // file copy — no Spark read, so events' TIMESTAMP(NANOS) (readable
    // only through graft.Tables.events) passes through untouched
    Seq("supplier", "nation", "region", "events").foreach { t =>
      val from = java.nio.file.Paths.get(s"$src/$t.parquet")
      // a Spark-written table is a DIRECTORY; Files.copy of one creates
      // an empty dir and later reads silently return nothing — fail
      // fast instead (chaining the probe on its own `shifted` output is
      // exactly this case)
      require(java.nio.file.Files.isRegularFile(from),
        s"$from is not a single parquet file — raw copy would lose its contents")
      java.nio.file.Files.copy(from,
        java.nio.file.Paths.get(s"$out/$t.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
    }
  }
}
