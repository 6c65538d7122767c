package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._

/** Native FastRP base-vector expression (r12).
  *
  * The base vector used to be built as `array(e_0 … e_{dim−1})` with
  * each element its own `conv(substring(md5(concat(…)), 1, 8), 16, 10)
  * % 6` chain. A 64-element CreateArray is ONE expression, so codegen
  * inlines all 64 md5 chains into one generated method, the method
  * blows the Janino/JIT limits, and the projection silently falls back
  * to INTERPRETED eval — measured as the wall-dominating stage of every
  * FastRP build (driver thread dumps showed executor threads in
  * `UnaryExpression.eval`/`Concat.doConcat`). This expression computes
  * the whole row in one tight kernel loop: one thread-local
  * MessageDigest, no hex strings, no per-element expression tree.
  *
  * BIT-EXACT contract (property-tested against the combinator chain):
  * entry j = {+√3 | −√3 | 0} for h ∈ {0, 1, _} with
  * h = uint32(first 4 md5 bytes of "<id>:<j>:<seed>") % 6 — exactly
  * `conv(substring(md5(concat(cast(id as string), ':j:seed')), 1, 8),
  * 16, 10) % 6`. DuckDB oracles replay their own substring(md5(…))
  * form and are unchanged. */
case class FastRpBaseVec(child: Expression, dim: Int, seed: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (!Seq[DataType](ByteType, ShortType, IntegerType, LongType)
        .contains(child.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"graft_fastrp_base expects an integral node id, got ${child.dataType.simpleString}")
    else if (dim < 1 || dim > 4096)
      TypeCheckResult.TypeCheckFailure(s"graft_fastrp_base dim out of range: $dim")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(input: Any): Any =
    FastRpBase.compute(input.asInstanceOf[Number].longValue, dim, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.plans.FastRpBase.compute((long) $c, $dim, $seed)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object FastRpBase {
  val FunctionName = "graft_fastrp_base"

  private val Sqrt3 = math.sqrt(3.0)

  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  def compute(id: Long, dim: Int, seed: Int): GenericArrayData = {
    val md = digests.get()
    val idStr = java.lang.Long.toString(id)
    val out = new Array[Double](dim)
    var j = 0
    while (j < dim) {
      md.reset()
      val s = idStr + ":" + j + ":" + seed
      val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val h = (((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)) % 6L
      out(j) = if (h == 0L) Sqrt3 else if (h == 1L) -Sqrt3 else 0.0
      j += 1
    }
    new GenericArrayData(out)
  }

  @volatile private var registered = Set.empty[String]

  def register(spark: SparkSession): Unit = {
    val key = graft.Cache.sessionId(spark)
    if (!registered.contains(key)) synchronized {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        FunctionName,
        exprs => FastRpBaseVec(exprs(0),
          exprs(1).eval().asInstanceOf[Number].intValue,
          exprs(2).eval().asInstanceOf[Number].intValue), "built-in")
      registered += key
    }
  }

  /** Column-API entry point; registers on first use for the session. */
  def baseVec(spark: SparkSession, id: Column, dim: Int, seed: Int): Column = {
    register(spark)
    call_function(FunctionName, id,
      org.apache.spark.sql.functions.lit(dim),
      org.apache.spark.sql.functions.lit(seed))
  }
}
