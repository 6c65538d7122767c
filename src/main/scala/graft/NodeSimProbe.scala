package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only probe for the nodeSimilarity posting-width cap (r10): a
  * synthetic bipartite graph with a PLANTED HUB neighbour whose posting
  * width grows with scale — the exact worst case `upperDegreeCutoff`
  * cannot bound (it caps node1/node2 degree, not the shared
  * neighbour's posting width; a hub of width h contributes h² pairs to
  * the intersection self-join). Uncapped runs demonstrate the
  * quadratic; `postingWidthCap` runs must stay flat per unit of |E|
  * with IDENTICAL plan signatures across scales — the committed
  * evidence that the one previously-unbounded operator is now bounded
  * by code, not by documentation.
  *
  * Shape: `scale`·20k users; each rates one GENRE book shared by its
  * group of 8 (posting width exactly 8 — the linear, cap-surviving
  * similarity structure: 7 true pairs per user at every scale), 9
  * PRIVATE books (width 1), and — for the first `hubDegree` users —
  * one HUB book whose posting width grows with scale. nodeSimilarity
  * over the single-label NATURAL projection compares users over their
  * book sets: uncapped runs pay the hub's d² pairs; capped runs drop
  * the hub posting (exact-or-underestimate df-cap), keep every genre
  * pair, and must stay flat per unit of |E|.
  *
  * Usage: runMain graft.NodeSimProbe <scale> <hubDegree> [cap]
  */
object NodeSimProbe {
  def main(args: Array[String]): Unit = {
    val scale = args(0).toInt
    val hubDegree = args(1).toLong
    val cap = if (args.length > 2) Some(args(2).toLong) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nUsers = 20000L * scale
    val hubBook = 2000000000L
    val genreBase = 3000000000L
    // genre tier: user u rates genre book u/8 (posting width 8)
    val genre = spark.range(nUsers).select(
      col("id").as("src"),
      (lit(genreBase) + (col("id") / 8L).cast("bigint")).as("dst"))
    // private tier: 9 books of posting width 1 each
    val priv = spark.range(nUsers * 9).select(
      (col("id") % nUsers).as("src"),
      (lit(nUsers) + col("id")).as("dst"))
    val hubEdges = spark.range(hubDegree)
      .select(col("id").as("src"), lit(hubBook).as("dst"))
    val rels = genre.unionAll(priv).unionAll(hubEdges).localCheckpoint()
    val nodes = rels.select(col("src").as("id"))
      .unionAll(rels.select(col("dst").as("id"))).distinct().localCheckpoint()

    val g = new graft.gds.GdsSession(graft.cypher.CypherLite.Graph(
      nodes = Map("N" -> nodes), edges = Map("E" -> rels)))
    g.graphProject("probe", Seq("N"), "E", orientation = "NATURAL")

    val t0 = System.nanoTime()
    val sims = g.nodeSimilarityStream("probe", postingWidthCap = cap)
    val n = sims.count()
    val sec = (System.nanoTime() - t0) / 1e9
    val plan = sims.queryExecution.executedPlan.toString
    val sig = Seq("Exchange", "BroadcastHashJoin", "SortMergeJoin",
        "ShuffledHashJoin", "HashAggregate")
      .map(k => s""""$k":${plan.linesIterator.count(_.contains(k))}""")
      .mkString("{", ",", "}")
    println(f"""{"probe":"nodesim","scale":$scale,"hub":$hubDegree,"cap":${cap.getOrElse(-1L)},"rows":$n,"sec":$sec%.2f,"sig":$sig}""")
    spark.stop()
  }
}
