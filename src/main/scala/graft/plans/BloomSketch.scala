package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Session registration for Spark's OWN Bloom-filter expressions —
  * `BloomFilterAggregate` / `BloomFilterMightContain`, the pair the
  * runtime row-level filtering feature uses internally (they back the
  * `bloom_filter_agg` / `might_contain` names in
  * `FunctionRegistry.internal`, which is not reachable from user SQL).
  * Exposing them under `graft_` names gives the decontamination gate a
  * codegen'd, MERGEABLE sketch: partial Bloom filters build map-side per
  * partition and OR together in the final aggregate — the same
  * merge-across-partitions story as the HLL entries — and the probe is a
  * native Predicate with codegen, not a per-row Scala UDF over a
  * broadcast object.
  *
  * Usage notes pinned by the expressions' own type checks: the value
  * side of both functions must be an XXHASH64 long (hash first, then
  * aggregate/probe), and the probe's sketch argument must be a constant
  * or a SCALAR SUBQUERY — so callers materialize the 1-row aggregate as
  * a temp view and probe `graft_might_contain((select bf from v), …)`.
  */
object BloomSketch {
  val AggName = "graft_bloom_agg"
  val ProbeName = "graft_might_contain"
  @volatile private var registered = Set.empty[String]

  def register(spark: SparkSession): Unit = {
    val key = graft.Cache.sessionId(spark)
    if (!registered.contains(key)) synchronized {
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        AggName,
        // (hashed_value, estimated_items, num_bits); the analyzer wraps
        // the bare AggregateFunction into an AggregateExpression
        (exprs: Seq[Expression]) =>
          new BloomFilterAggregate(exprs(0), exprs(1), exprs(2)),
        "built-in")
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        ProbeName,
        (exprs: Seq[Expression]) => BloomFilterMightContain(exprs(0), exprs(1)),
        "built-in")
      registered += key
    }
  }

  /** Standard Bloom sizing: bits = ceil(-n ln p / (ln 2)²) — the same
    * formula `org.apache.spark.util.sketch.BloomFilter.create` applies,
    * computed here because the expression form takes bits, not fpp. */
  def optimalNumBits(expectedItems: Long, fpp: Double): Long = {
    require(expectedItems > 0 && fpp > 0 && fpp < 1)
    math.ceil(-expectedItems * math.log(fpp) / (math.log(2) * math.log(2))).toLong
  }
}
