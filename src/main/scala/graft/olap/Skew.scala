package graft.olap

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for large⋈large joins with hot keys.
  *
  * AQE's skew-join splitting handles most cases at runtime; explicit
  * salting is for the pathological ones (one key = 30% of the table,
  * e.g. a null-ish default id at 100 TB). The salt on the fat side is
  * derived deterministically from non-key columns (xxhash64 of the
  * whole row), so runs are reproducible — no `rand()`.
  */
object Skew {

  /** Inner-join `big ⋈ small` on `key` with the small side replicated
    * `nSalts` ways: big rows scatter across salts, small rows exist for
    * every salt, so a hot key spreads over nSalts reducers instead of
    * one. Result equals the plain join exactly. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, nSalts: Int = 16): DataFrame = {
    val bigCols = big.columns
    // collision-free temp column: a fixed "_salt" name would silently
    // overwrite (or ambiguate) a user column of the same name
    val saltCol = Iterator.from(0).map(i => s"_salt$i")
      .find(c => !big.columns.contains(c) && !small.columns.contains(c)).get
    val salted = big.withColumn(saltCol,
      pmod(xxhash64(bigCols.map(col): _*), lit(nSalts)).cast("int"))
    val replicated = small
      .withColumn(saltCol, explode(sequence(lit(0), lit(nSalts - 1))))
    salted.join(replicated, Seq(key, saltCol)).drop(saltCol)
  }

  /** Top-N hot keys of a column with their frequency share — the probe
    * you run before deciding to salt. ONE scan of `df`: the per-key
    * counts and the grand total ride the same aggregation (the total is
    * a single-partition window over the already-grouped frame, whose
    * size is the key's cardinality, not the row count — fine for a skew
    * probe, where a near-unique key has no hot keys to find anyway). */
  def hotKeys(df: DataFrame, key: String, topN: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.groupBy(col(key)).agg(count(lit(1)).as("cnt"))
      .withColumn("share",
        col("cnt") / sum(col("cnt")).over(Window.partitionBy(lit(0))))
      .orderBy(col("cnt").desc, col(key))
      .limit(topN)
  }
}
