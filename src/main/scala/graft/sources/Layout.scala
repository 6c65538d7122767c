package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multidimensional data layout: Z-order (Morton-curve) clustering.
  *
  * A single-column sort clusters parquet row groups on ONE dimension —
  * scans filtering on anything else read everything. Interleaving the
  * bits of two key columns and range-partitioning + sorting by the
  * resulting z-value gives every file a small bounding box in BOTH
  * dimensions, so min/max (zone-map) pruning works for filters on
  * either column. This is the standard lakehouse layout move for a
  * 100 TB fact table with two hot filter keys; the writer is one
  * `repartitionByRange` + in-partition sort — no extra shuffle beyond
  * what any clustered write pays.
  *
  * The z-value is pure Column algebra (a fold of shift/mask/or terms —
  * codegen'd, no UDF). Keys must be non-negative and fit `bits` bits;
  * values beyond that range would alias, so the writer fails fast.
  */
object Layout {

  /** Morton interleave of two non-negative integer columns:
    * bit i of `a` → bit 2i, bit i of `b` → bit 2i+1. */
  def zValue(a: Column, b: Column, bits: Int = 21): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftright(a.cast("long"), i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftright(b.cast("long"), i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_.bitwiseOR(_))
  }

  /** Write `df` parquet, z-ordered on (`colA`, `colB`): each key is
    * min–max normalized onto a `bits`-bit grid (raw keys of unequal
    * magnitude would otherwise degenerate the curve into a plain sort
    * on the wider column), the grid coordinates interleave into a
    * z-value, and the frame is range-partitioned into `nFiles` buckets
    * and sorted within each. The min/max probe is two scalar
    * aggregates — at 100 TB, table statistics supply them for free.
    * Keys must be non-negative (fail-fast below). */
  def saveZOrdered(df: DataFrame, colA: String, colB: String, path: String,
      nFiles: Int = 8, bits: Int = 16): Unit = {
    val bad = df.filter(col(colA) < 0 || col(colB) < 0).limit(1).count()
    require(bad == 0, s"saveZOrdered: $colA/$colB must be non-negative")
    val mm = df.agg(
      min(col(colA)).cast("double"), max(col(colA)).cast("double"),
      min(col(colB)).cast("double"), max(col(colB)).cast("double")).head()
    val lim = (1L << bits) - 1
    def grid(c: Column, lo: Double, hi: Double): Column =
      if (hi <= lo) lit(0L)
      else floor((c.cast("double") - lit(lo)) / lit(hi - lo) * lim).cast("long")
    df.withColumn("_z", zValue(
        grid(col(colA), mm.getDouble(0), mm.getDouble(1)),
        grid(col(colB), mm.getDouble(2), mm.getDouble(3)), bits))
      .repartitionByRange(nFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
      .write.mode("overwrite").parquet(path)
  }
}
