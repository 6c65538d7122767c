package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.graph.{FastRP, RatingsGraph}
import graft.plans.CosineSim

/** Statistical quality evidence for the learned-representation
  * operators (beyond structural fixtures): the embeddings and sketches
  * must actually capture the signal they claim to. */
class QualitySpec extends AnyFunSuite {
  import TestSpark._

  test("fastrp: strongly co-rating user pairs embed closer than random pairs") {
    val emb = FastRP.userEmbeddings(spark, sf)
    val cooc = RatingsGraph.cooccurrenceEdges(spark, sf)
    // top-100 strongest co-rating pairs
    val strong = cooc.filter(col("u1") < col("u2"))
      .orderBy(col("weight").desc, col("u1"), col("u2")).limit(100)
      .select(col("u1"), col("u2"))
    def cosOf(pairs: org.apache.spark.sql.DataFrame): Double = {
      val joined = pairs
        .join(emb.select(col("user_id").as("u1"), col("embedding").as("e1")), Seq("u1"))
        .join(emb.select(col("user_id").as("u2"), col("embedding").as("e2")), Seq("u2"))
        .select(CosineSim.cosine(spark, col("e1"), col("e2")).as("c"))
      joined.agg(avg(col("c"))).head().getDouble(0)
    }
    // pseudo-random non-adjacent pairs: shifted id pairing
    val users = emb.select(col("user_id")).orderBy("user_id")
      .collect().map(_.getLong(0))
    val random = users.take(100).zip(users.reverse.take(100))
      .filter { case (a, b) => a != b }
      .toSeq
    import spark.implicits._
    val randomDf = random.toDF("u1", "u2")
    val strongAvg = cosOf(strong)
    val randomAvg = cosOf(randomDf)
    assert(strongAvg > randomAvg + 0.05,
      s"strong co-raters avg cos $strongAvg not above random $randomAvg")
  }

  test("node2vec: strongly co-rating user pairs embed closer than random pairs") {
    val emb = graft.graph.Node2Vec.userEmbeddings(spark, sf)
    val cooc = RatingsGraph.cooccurrenceEdges(spark, sf)
    val strong = cooc.filter(col("u1") < col("u2"))
      .orderBy(col("weight").desc, col("u1"), col("u2")).limit(100)
      .select(col("u1"), col("u2"))
    def cosOf(pairs: org.apache.spark.sql.DataFrame): Double = pairs
      .join(emb.select(col("user_id").as("u1"), col("embedding").as("e1")), Seq("u1"))
      .join(emb.select(col("user_id").as("u2"), col("embedding").as("e2")), Seq("u2"))
      .select(CosineSim.cosine(spark, col("e1"), col("e2")).as("c"))
      .agg(avg(col("c"))).head().getDouble(0)
    val users = emb.select(col("user_id")).orderBy("user_id")
      .collect().map(_.getLong(0))
    val random = users.take(100).zip(users.reverse.take(100))
      .filter { case (a, b) => a != b }.toSeq
    import spark.implicits._
    val strongAvg = cosOf(strong)
    val randomAvg = cosOf(random.toDF("u1", "u2"))
    assert(strongAvg > randomAvg + 0.05,
      s"node2vec strong co-raters avg cos $strongAvg not above random $randomAvg")
  }

  test("minhash estimate correlates with exact jaccard on candidate pairs") {
    val est = dedup.Dedup.minhashPairs(spark, sf, minEstJaccard = 0.0)
      .select(col("id_a"), col("id_b"), col("est_jaccard"))
    // 0.001 ≈ "any overlap at all": the r6 posting-intersection verify
    // cannot represent jaccard = 0 rows (and requires minJaccard > 0);
    // zero-overlap candidates carry no correlation signal anyway
    val exact = dedup.Dedup.ngramJaccardPairs(spark, sf, minJaccard = 0.001)
      .select(col("id_a"), col("id_b"), col("jaccard"))
    val joined = est.join(exact, Seq("id_a", "id_b")).cache()
    val n = joined.count()
    assert(n > 0)
    // mean absolute estimation error under 0.15 (32 hashes → σ ≈ 0.09)
    val mae = joined.agg(avg(abs(col("est_jaccard") - col("jaccard")))).head().getDouble(0)
    assert(mae < 0.15, s"minhash MAE too high: $mae over $n pairs")
    // and the high-jaccard pairs are estimated high
    val highExact = joined.filter(col("jaccard") >= 0.8)
    if (highExact.count() > 0) {
      val minEstOfHigh = highExact.agg(min(col("est_jaccard"))).head().getDouble(0)
      assert(minEstOfHigh >= 0.5, s"true near-dup underestimated: $minEstOfHigh")
    }
  }
}
