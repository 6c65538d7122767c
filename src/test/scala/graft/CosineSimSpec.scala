package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorOps
import graft.plans.CosineSim

class CosineSimSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  test("native kernel agrees bit-exactly with the combinator cosine") {
    val df = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"))
      .limit(200)
      .crossJoin(Tables.embeddings(spark, sf)
        .select(col("embedding").as("q")).limit(1))
    val both = df.select(
      CosineSim.cosine(spark, col("embedding"), col("q")).as("fast"),
      VectorOps.cosine(col("embedding"), col("q")).as("slow"))
    assert(both.filter(col("fast") =!= col("slow")).isEmpty)
  }

  test("handles zero vectors and empty arrays without NaN") {
    val df = Seq(
      (Seq(0.0, 0.0), Seq(1.0, 2.0)),
      (Seq.empty[Double], Seq.empty[Double]),
      (Seq(1.0, 0.0), Seq(1.0, 0.0))).toDF("a", "b")
    val out = df.select(CosineSim.cosine(spark, col("a"), col("b")).as("c"))
      .collect().map(_.getDouble(0))
    assert(out(0) == 0.0 && out(1) == 0.0 && math.abs(out(2) - 1.0) < 1e-12)
  }

  test("SQL registration via GraftExtensions function builder") {
    CosineSim.register(spark)
    val r = spark.sql(
      "SELECT graft_cosine(array(1.0d, 2.0d), array(2.0d, 4.0d)) AS c").head().getDouble(0)
    assert(math.abs(r - 1.0) < 1e-12)
    // mixed float/double inputs
    val r2 = spark.sql(
      "SELECT graft_cosine(cast(array(1.0, 0.0) as array<float>), array(0.0d, 1.0d)) AS c")
      .head().getDouble(0)
    assert(r2 == 0.0)
  }

  test("rejects non-array inputs at analysis time") {
    CosineSim.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT graft_cosine('a', 'b')").head()
    }
    assert(e.getMessage.toLowerCase.contains("cosine") ||
      e.getMessage.toLowerCase.contains("datatype") ||
      e.getMessage.toLowerCase.contains("data type"), e.getMessage)
  }
}
