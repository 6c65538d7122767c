package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorOps
import graft.olap.Skew
import graft.plans.{CosineSim, TopKPerKey}

/** Property-based equivalence checks: the custom operators must agree
  * with their composed-from-built-ins reference formulations on
  * arbitrary inputs, not just fixtures. */
class PropertySpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  /** Deterministic sampling: 5 samples per property from fixed seeds
    * (scalatestplus bridge unavailable offline — raw Gen instead). */
  private def forAll[A](gen: Gen[A])(body: A => Unit): Unit =
    (0 until 5).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default.withSize(60), Seed(42L + i)))
    }

  private def whenever(cond: Boolean)(body: => Unit): Unit = if (cond) body

  private val rowsGen: Gen[List[(Long, Double, Long)]] =
    Gen.listOf(for {
      k <- Gen.choose(0L, 6L)
      score <- Gen.choose(0, 100).map(_ / 10.0) // coarse → frequent ties
      id <- Gen.choose(0L, 1000L)
    } yield (k, score, id)).map(_.distinctBy(_._3))

  test("property: topKPerKey ≡ window row_number for arbitrary keyed data") {
    forAll(rowsGen) { rows =>
      whenever(rows.nonEmpty) {
        val df = rows.toDF("key", "score", "id")
        val viaHeap = TopKPerKey.topKPerKey(df, Seq("key"),
          Seq(("score", false), ("id", true)), 3).select("key", "score", "id")
        val w = Window.partitionBy("key").orderBy(col("score").desc, col("id"))
        val viaWindow = df.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3).select("key", "score", "id")
        assert(viaHeap.exceptAll(viaWindow).isEmpty && viaWindow.exceptAll(viaHeap).isEmpty)
      }
    }
  }

  test("property: saltedJoin ≡ plain join for arbitrary key overlap") {
    val gen = for {
      left <- Gen.listOf(Gen.zip(Gen.choose(0L, 8L), Gen.choose(0L, 500L)))
      right <- Gen.listOf(Gen.zip(Gen.choose(0L, 8L), Gen.alphaStr.map(_.take(4))))
    } yield (left, right.distinctBy(_._1))
    forAll(gen) { case (left, right) =>
      whenever(left.nonEmpty && right.nonEmpty) {
        val l = left.toDF("k", "v")
        val r = right.toDF("k", "tag")
        val plain = l.join(r, Seq("k")).select("k", "v", "tag")
        val salted = Skew.saltedJoin(l, r, "k", nSalts = 4).select("k", "v", "tag")
        assert(salted.exceptAll(plain).isEmpty && plain.exceptAll(salted).isEmpty)
      }
    }
  }

  test("property: native CosineSim ≡ combinator cosine, bounded in [-1,1]") {
    val vecGen = Gen.listOfN(16, Gen.choose(-100, 100).map(_ / 10.0))
    forAll(Gen.listOfN(8, Gen.zip(vecGen, vecGen))) { pairs =>
      whenever(pairs.nonEmpty) {
        val df = pairs.zipWithIndex.map { case ((a, b), i) => (i.toLong, a, b) }
          .toDF("id", "a", "b")
        val out = df.select(
          CosineSim.cosine(spark, col("a"), col("b")).as("fast"),
          VectorOps.cosine(col("a"), col("b")).as("slow")).collect()
        out.foreach { r =>
          assert(r.getDouble(0) == r.getDouble(1))
          assert(r.getDouble(0) >= -1.0 - 1e-9 && r.getDouble(0) <= 1.0 + 1e-9)
        }
      }
    }
  }

  test("CosineSim and combinator cosine agree on length-mismatched inputs: both NULL") {
    val df = Seq((1L, Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0)))
      .toDF("id", "a", "b")
    val r = df.select(
      CosineSim.cosine(spark, col("a"), col("b")).as("fast"),
      VectorOps.cosine(col("a"), col("b")).as("slow")).head()
    assert(r.isNullAt(0), "native kernel should NULL on length mismatch")
    assert(r.isNullAt(1), "combinator kernel should NULL on length mismatch")
  }
}
