package graft.plans

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Native centroid-distance kernels for the k-means family (r12).
  *
  * The previous shape inlined every centroid coordinate as a LITERAL
  * into a k·dim-term expression tree (8×64 = 512 subtract-square terms
  * at the kmeans operating point). Correct and codegen'd — but the
  * literal VALUES are pasted into the generated Java source, so every
  * Lloyd iteration (new centroids) generates a NEW source string and
  * pays a full Janino compile: at sf0.1 the 3-iteration training run
  * spent more time compiling than computing (guide §1.2 "per-task
  * work" — and the constant is per-QUERY, so it never amortizes at any
  * scale). These expressions keep the identical arithmetic — the same
  * ascending-i left-fold sum and first-min tie-break — but carry the
  * centroid matrix as a REFERENCE OBJECT (`ctx.addReferenceObj`), so
  * the generated source is byte-identical across iterations and the
  * codegen cache hits. Bonus at any scale: one tight primitive loop
  * per row instead of a 512-node expression tree.
  */
object CentroidKernels {
  /** Flatten a foldable array<array<double>> literal into (rows, width,
    * row-major flat matrix). */
  def flatten(e: Expression): (Int, Int, Array[Double]) = {
    val arr = e.eval().asInstanceOf[ArrayData]
    val k = arr.numElements()
    require(k >= 1, "centroid matrix must be non-empty")
    val rows = (0 until k).map(i => arr.getArray(i).toDoubleArray())
    val width = rows.head.length
    require(rows.forall(_.length == width), "ragged centroid matrix")
    (k, width, rows.flatten.toArray)
  }

  def centroidTypeOk(e: Expression): Boolean = e.foldable && (e.dataType match {
    case ArrayType(ArrayType(DoubleType, _), _) => true
    case _ => false
  })

  def embTypeOk(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** Argmin over k rows of Σ_i ((double)x_i − c_i)², ascending i sum
    * order, first-min tie — the exact semantics of
    * `least(struct(d2, cluster)…)` over the literal chains. */
  def assign(x: ArrayData, flat: Array[Double], k: Int, dim: Int,
      isFloat: Boolean): Int = {
    var best = Double.MaxValue
    var bestC = 0
    var c = 0
    while (c < k) {
      var d = 0.0
      var i = 0
      while (i < dim) {
        val xv = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
        val diff = xv - flat(c * dim + i)
        d += diff * diff
        i += 1
      }
      if (d < best) { best = d; bestC = c }
      c += 1
    }
    bestC
  }

  /** Centroid-form silhouette over packed rows [id, c_0 … c_{dim−1}]:
    * a = √Σ to the own-id row, b = min √Σ to every other row,
    * s = (b − a)/max(a, b), 0 when both are 0 — the exact semantics of
    * the coalesce/when + least(sqrt-chain) shape. */
  def silhouette(x: ArrayData, own: Long, flat: Array[Double], k: Int,
      width: Int, isFloat: Boolean): Double = {
    val dim = width - 1
    var aD = 0.0
    var bD = Double.MaxValue
    var r = 0
    while (r < k) {
      var s = 0.0
      var i = 0
      while (i < dim) {
        val xv = if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)
        val diff = xv - flat(r * width + 1 + i)
        s += diff * diff
        i += 1
      }
      val d = math.sqrt(s)
      if (flat(r * width).toLong == own) aD = d
      else if (d < bD) bD = d
      r += 1
    }
    val m = math.max(aD, bD)
    if (m > 0.0) (bD - aD) / m else 0.0
  }
}

/** `graft_centroid_assign(embedding, centroids)`: index of the centroid
  * with the smallest squared L2 distance; NULL when the embedding is
  * NULL or shorter than dim (the literal chain's getItem(i) null
  * propagation). */
case class CentroidAssign(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullable: Boolean = true
  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    if (CentroidKernels.embTypeOk(left) && CentroidKernels.centroidTypeOk(right))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_centroid_assign expects (array<float|double>, foldable array<array<double>>)")

  @transient private lazy val (k, dim, flat) = CentroidKernels.flatten(right)

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (x.numElements() < dim) null
    else CentroidKernels.assign(x, flat, k, dim, CentroidKernels.isFloat(left))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mat = ctx.addReferenceObj("centroidFlat", flat, "double[]")
    val isF = CentroidKernels.isFloat(left)
    nullSafeCodeGen(ctx, ev, (a, _) => s"""
       |if ($a.numElements() < $dim) {
       |  ${ev.isNull} = true;
       |} else {
       |  ${ev.value} = graft.plans.CentroidKernels.assign($a, $mat, $k, $dim, $isF);
       |}
     """.stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `graft_centroid_sil(embedding, cluster, packed)`: simplified
  * (centroid-form) silhouette s = (b − a)/max(a, b) over packed
  * [cluster_id, c_0 … c_{dim−1}] rows. */
case class CentroidSilhouette(first: Expression, second: Expression,
    third: Expression) extends TernaryExpression {

  override def nullable: Boolean = true
  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult =
    if (CentroidKernels.embTypeOk(first) &&
        Seq[DataType](ByteType, ShortType, IntegerType, LongType)
          .contains(second.dataType) &&
        CentroidKernels.centroidTypeOk(third))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "graft_centroid_sil expects (array<float|double>, integral, foldable array<array<double>>)")

  @transient private lazy val (k, width, flat) = CentroidKernels.flatten(third)

  override def nullSafeEval(a: Any, b: Any, c: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (x.numElements() < width - 1) null
    else CentroidKernels.silhouette(x, b.asInstanceOf[Number].longValue(),
      flat, k, width, CentroidKernels.isFloat(first))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mat = ctx.addReferenceObj("centroidPacked", flat, "double[]")
    val isF = CentroidKernels.isFloat(first)
    nullSafeCodeGen(ctx, ev, (a, cl, _) => s"""
       |if ($a.numElements() < ${width - 1}) {
       |  ${ev.isNull} = true;
       |} else {
       |  ${ev.value} = graft.plans.CentroidKernels.silhouette(
       |    $a, (long) $cl, $mat, $k, $width, $isF);
       |}
     """.stripMargin)
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object CentroidOps {
  val AssignName = "graft_centroid_assign"
  val SilName = "graft_centroid_sil"
  @volatile private var registered = Set.empty[String]

  def register(spark: SparkSession): Unit = {
    val key = graft.Cache.sessionId(spark)
    if (!registered.contains(key)) synchronized {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        AssignName, exprs => CentroidAssign(exprs(0), exprs(1)), "built-in")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        SilName, exprs => CentroidSilhouette(exprs(0), exprs(1), exprs(2)),
        "built-in")
      registered += key
    }
  }

  /** Argmin-squared-distance cluster index of `emb` over `centroids`. */
  def assign(spark: SparkSession, emb: Column,
      centroids: Array[Array[Double]]): Column = {
    register(spark)
    call_function(AssignName, emb,
      org.apache.spark.sql.functions.typedLit(centroids.map(_.toSeq).toSeq))
  }

  /** Centroid-form silhouette of `emb` assigned to `cluster`, over
    * packed [id, c…] rows. */
  def silhouette(spark: SparkSession, emb: Column, cluster: Column,
      packed: Array[Array[Double]]): Column = {
    register(spark)
    call_function(SilName, emb, cluster,
      org.apache.spark.sql.functions.typedLit(packed.map(_.toSeq).toSeq))
  }
}
