package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.CentroidOps

/** r12: the native centroid kernels must agree BIT-EXACTLY with the
  * literal-chain expressions they replaced in [[graft.ann.KMeans]] —
  * same ascending-i left-fold distance sum, same first-min tie order,
  * same a/b/s silhouette algebra. */
class CentroidOpsSpec extends AnyFunSuite {
  import TestSpark._

  private val dim = 64
  private def centroids(k: Int, seed: Int): Array[Array[Double]] =
    Array.tabulate(k) { c =>
      val rnd = new scala.util.Random(seed + c)
      Array.fill(dim)(math.rint(rnd.nextGaussian() * 1e6) / 1e6)
    }

  test("assign agrees bit-exactly with the literal least-of-structs chain") {
    val cents = centroids(8, 42)
    val emb = Tables.embeddings(spark, sf).select(col("vec_id"), col("embedding"))
    val chain = least(cents.zipWithIndex.map { case (ctr, ci) =>
      val d2 = (0 until dim).map { i =>
        val diff = col("embedding").getItem(i).cast("double") - lit(ctr(i))
        diff * diff
      }.reduce(_ + _)
      struct(d2.as("d2"), lit(ci).as("cluster"))
    }: _*).getField("cluster")
    val both = emb.select(
      CentroidOps.assign(spark, col("embedding"), cents).as("fast"),
      chain.as("slow"))
    assert(both.filter(col("fast") =!= col("slow")).isEmpty)
  }

  test("assign first-min tie order: duplicate centroids pick the lower index") {
    val c0 = Array.fill(dim)(0.5)
    val cents = Array(c0, c0.clone(), Array.fill(dim)(99.0))
    val emb = Tables.embeddings(spark, sf)
      .select(col("embedding")).limit(20)
    val out = emb.select(
      CentroidOps.assign(spark, col("embedding"), cents).as("c"))
      .collect().map(_.getInt(0))
    assert(out.forall(_ == 0))
  }

  test("silhouette agrees bit-exactly with the coalesce/least sqrt chains") {
    val cents = centroids(5, 7)
    val packed = cents.zipWithIndex
      .map { case (c, j) => j.toDouble +: c.toSeq }.map(_.toArray)
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
      .withColumn("cluster",
        CentroidOps.assign(spark, col("embedding"), cents))
    val dist: Map[Int, org.apache.spark.sql.Column] = cents.zipWithIndex.map {
      case (c, j) =>
        j -> sqrt((0 until dim).map { i =>
          val diff = col("embedding").getItem(i).cast("double") - lit(c(i))
          diff * diff
        }.reduce(_ + _))
    }.toMap
    val ks = dist.keys.toSeq.sorted
    val a = coalesce(ks.map(j => when(col("cluster") === j, dist(j))): _*)
    val b = least(ks.map(j =>
      when(col("cluster") === j, lit(Double.MaxValue)).otherwise(dist(j))): _*)
    val sChain = when(greatest(a, b) > 0, (b - a) / greatest(a, b)).otherwise(lit(0.0))
    val both = emb.select(
      CentroidOps.silhouette(spark, col("embedding"), col("cluster"), packed)
        .as("fast"),
      sChain.as("slow"))
    assert(both.filter(col("fast") =!= col("slow")).isEmpty)
  }

  test("interpreted eval matches codegen (collected literals)") {
    CentroidOps.register(spark)
    val cents = centroids(3, 11)
    val emb = Tables.embeddings(spark, sf)
      .select(col("embedding")).limit(50).collect().map(_.getSeq[Float](0))
    emb.foreach { v =>
      val x = v.map(_.toDouble).toArray
      val expected = cents.zipWithIndex.map { case (c, ci) =>
        (x.indices.map(i => { val d = x(i) - c(i); d * d }).sum, ci)
      }.minBy(identity)._2
      val interp = graft.plans.CentroidAssign(
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          v.toArray, org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.FloatType, containsNull = false)),
        org.apache.spark.sql.catalyst.expressions.Literal.create(
          cents.map(_.toSeq).toSeq,
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.DoubleType, containsNull = false),
            containsNull = false))).eval(null)
      assert(interp == expected)
    }
  }
}
