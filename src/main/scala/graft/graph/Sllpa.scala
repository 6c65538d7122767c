package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Speaker-listener label propagation (SLPA, Xie et al. 2011 — GDS
  * `gds.alpha.sllpa`): OVERLAPPING community detection, the one
  * membership shape the Louvain/LPA/Leiden tier cannot express (a node
  * belongs to every community that stays frequent in its memory, not to
  * exactly one).
  *
  * Each round, every directed edge (u → v) makes u SPEAK one label from
  * its memory multiset — drawn proportionally to memory counts — and
  * every listener v ACCEPTS the most frequent label it heard (ties to
  * the smallest label), appending it to its own memory. After `rounds`
  * rounds a node reports every label holding at least
  * `threshold · (rounds + 1)` of its memory.
  *
  * The proportional draw is the ticket trick, fully deterministic: each
  * of the c copies of label l in u's memory gets ticket
  * md5("t:u:v:l:k") (k = 1..c) and the minimal ticket over u's whole
  * memory speaks — exactly a count-weighted draw, and exactly
  * replayable in SQL, so all `rounds` rounds unroll into a bit-exact
  * DuckDB oracle (the [[Algorithms.randomWalks]] idiom, lifted from
  * per-walk to per-edge).
  *
  * Scale shape per round: memory is first aggregated to ONE array row
  * per speaker (collect_list of (l, c) — ≤ t+1 entries, bounded by the
  * round count, NOT by degree), joined onto edges, and the
  * count-weighted arg-min ticket is evaluated INLINE per edge with
  * higher-order functions (flatten/transform/array_min). That removes
  * the explode → groupBy(src, dst) stage entirely — the old shape
  * shuffled |E|·(t+1) exploded ticket rows per round; the fused shape
  * shuffles only |E| spoken rows into the (listener, label) count.
  * Remaining per-round shuffles: the tiny memory aggregate, the
  * edges⋈memory join (memory is |V|-sized and AQE broadcast-eligible
  * long before |E| is the bottleneck), one (listener, label) count,
  * one memory-upsert aggregate. All shuffle-keyed; no driver state.
  */
object Sllpa {

  def sllpa(edges: DataFrame, rounds: Int = 3, threshold: Double = 0.3): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    // checkpoint cuts the lineage for the per-round re-scans; the
    // memory side is |V|-sized and broadcast by AQE, so the edge side
    // is never exchanged (a pre-repartition by src measured as a net
    // LOSS — it added a |E| shuffle to save an exchange that the
    // broadcast join already avoids)
    val e = edges.select(col("src"), col("dst")).localCheckpoint()
    var mem = e.select(col("src").as("v")).distinct()
      .select(col("v"), col("v").as("l"), lit(1L).as("c"))
      .localCheckpoint()
    for (t <- 1 to rounds) {
      // One array row per speaker, then the weighted draw inline per
      // edge: min over (ticket, l) of every (l, k≤c) memory copy —
      // identical tickets and tie order to the explode/groupBy shape
      // (struct min orders field-wise, ticket first), zero extra rows.
      // r12 note: an explicit iterState broadcast pin here was a
      // MEASURED loss (silver 7.5→10.2 s, both bench passes) — AQE
      // already broadcasts the post-aggregate memory side from its
      // materialised shuffle, and the pin only added a second
      // collect; the AQE shape stays.
      val memArr = mem.groupBy(col("v"))
        .agg(collect_list(struct(col("l"), col("c"))).as("ml"))
        .withColumnRenamed("v", "src")
      val spoken = e
        .join(memArr, Seq("src"))
        .withColumn("sp", expr(
          s"""array_min(flatten(transform(ml, p ->
             |  transform(sequence(1L, p.c), k ->
             |    struct(md5(concat_ws(':', '$t', src, dst, p.l, k)) AS ticket,
             |           p.l AS l)))))""".stripMargin))
        .select(col("dst").as("v"), col("sp.l").as("l"))
      val accepted = spoken.groupBy(col("v"), col("l"))
        .agg(count(lit(1)).as("n"))
        .groupBy(col("v"))
        .agg(max(struct(col("n"), (-col("l")).as("nl"), col("l"))).as("best"))
        .select(col("v"), col("best.l").as("l"), lit(1L).as("c"))
      mem = mem.unionAll(accepted)
        .groupBy(col("v"), col("l")).agg(sum(col("c")).as("c"))
        .localCheckpoint()
    }
    val minCount = math.ceil(threshold * (rounds + 1)).toLong
    mem.filter(col("c") >= minCount)
      .select(col("v").as("node_id"), col("l").as("community"),
        col("c").as("strength"))
      .orderBy(col("node_id"), col("community"))
  }

  /** SLPA overlapping communities of the co-occurrence graph,
    * session-cached (r11: the `communities_sllpa` entry and the
    * `gds.alpha.sllpa` front door share the frame; the build surfaces
    * in the bench silver phase like every shared detector). */
  def userSllpa(spark: SparkSession, dir: String): DataFrame =
    graft.Cache.cached(spark, dir, "sllpa_communities") {
      sllpa(RatingsGraph.cooccurrenceEdges(spark, dir)
        .select(col("u1").as("src"), col("u2").as("dst")))
    }
}
