package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the first `nibbles` hex digits of
  * md5(s) as an unsigned BIGINT — bit-identical to the combinator
  * chain `conv(substring(md5(s), 1, nibbles), 16, 10).cast("long")`
  * (property-tested), which is the engine's universal deterministic
  * draw (minhash signatures, ES walk clocks, RR-set liveness, hashgnn
  * draws, ALS init, source-mix sampling).
  *
  * The combinator chain materialises a 32-char hex UTF8String, slices
  * it, then PARSES it back through conv's base-conversion loop — three
  * string allocations per draw on top of the digest. This expression
  * digests once and folds the first `nibbles/2` bytes into a long; the
  * hex detour disappears. Thread-local MessageDigest (the JDK instance
  * is not thread-safe, and allocation per row would dwarf the win).
  *
  * DuckDB oracles are UNCHANGED: they replay the arithmetic via their
  * own `('0x' || substring(md5(..)))` form, and this expression
  * produces the exact value the old chain did. */
case class Md5Bits(child: Expression, nibbles: Int)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (!child.dataType.isInstanceOf[StringType])
      TypeCheckResult.TypeCheckFailure(
        s"graft_md5_bits expects a string input, got ${child.dataType.simpleString}")
    else if (nibbles < 2 || nibbles > 14 || nibbles % 2 != 0)
      TypeCheckResult.TypeCheckFailure(
        s"graft_md5_bits supports even nibble counts in [2, 14], got $nibbles")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(input: Any): Any =
    Md5Bits.compute(input.asInstanceOf[UTF8String], nibbles)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Md5Bits.compute($c, $nibbles)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5Bits {
  val FunctionName = "graft_md5_bits"

  private val digests: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** First `nibbles`/2 bytes of md5(utf8 bytes) folded big-endian —
    * exactly conv(substring(hex, 1, nibbles), 16, 10). */
  def compute(s: UTF8String, nibbles: Int): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    val nBytes = nibbles / 2
    while (i < nBytes) {
      v = (v << 8) | (d(i) & 0xffL)
      i += 1
    }
    v
  }

  @volatile private var registered = Set.empty[String]

  def register(spark: SparkSession): Unit = {
    val key = graft.Cache.sessionId(spark)
    if (!registered.contains(key)) synchronized {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        FunctionName,
        exprs => Md5Bits(exprs(0),
          exprs(1).eval().asInstanceOf[Number].intValue), "built-in")
      registered += key
    }
  }

  /** Column-API entry point; registers on first use for the session. */
  def md5Bits(spark: SparkSession, s: Column, nibbles: Int): Column = {
    register(spark)
    call_function(FunctionName, s, lit(nibbles))
  }

  /** Column-only form for call sites that build Columns without a frame
    * in hand (minhash signature builders, HOF lambdas): registers on
    * the ACTIVE session — the one that will analyze the plan being
    * built. */
  def md5Bits(s: Column, nibbles: Int): Column =
    md5Bits(SparkSession.active, s, nibbles)
}
