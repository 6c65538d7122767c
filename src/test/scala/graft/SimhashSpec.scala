package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.dedup.Dedup

/** SimHash near-dup semantics on planted fixtures, plus an exhaustive
  * check that the band blocking returns EXACTLY the hamming≤3 pair set
  * (the pigeonhole guarantee: ≤3 flipped bits of 48 can touch at most 3
  * of the 4 12-bit bands, so one band always agrees exactly). */
class SimhashSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private val base = (1 to 60).map(i => s"token$i").mkString(" ")
  // one token changed out of 60 → most hash-bit votes unchanged → small
  // hamming; unrelated docs share no tokens → hamming ~ n_bits/2
  private val docs = Seq(
    (1L, base),
    (2L, base), // identical to 1 → hamming 0
    (3L, base.replace("token30", "changed")), // near-dup of 1/2
    (4L, (1 to 60).map(i => s"other$i").mkString(" ")), // unrelated
    (5L, "") // empty → simhash 0, pairs with nothing non-empty
  ).toDF("doc_id", "text")

  test("identical docs pair at hamming 0; unrelated docs don't pair") {
    val pairs = Dedup.simhashPairsFor(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs((1L, 2L)) == 0L, s"identical docs not at hamming 0: $pairs")
    assert(!pairs.keySet.exists { case (a, b) => a == 4L || b == 4L },
      s"unrelated doc paired: $pairs")
  }

  test("band blocking returns exactly the hamming<=maxHamming pair set") {
    // independent truth: collect simhashes, all-pairs popcount in Scala
    val sims = Dedup.simhashes(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (maxH <- Seq(0, 1, 3)) {
      val truth = (for {
        a <- sims.keys; b <- sims.keys if a < b
        if java.lang.Long.bitCount(sims(a) ^ sims(b)) <= maxH
      } yield (a, b)).toSet
      val got = Dedup.simhashPairsFor(docs, maxHamming = maxH).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == truth, s"maxHamming=$maxH: got $got want $truth")
    }
  }

  test("near-dup (1 of 60 tokens changed) lands within hamming 3") {
    val sims = Dedup.simhashes(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val h13 = java.lang.Long.bitCount(sims(1L) ^ sims(3L))
    val h14 = java.lang.Long.bitCount(sims(1L) ^ sims(4L))
    assert(h13 <= 3, s"near-dup hamming $h13 > 3")
    assert(h14 > 10, s"unrelated hamming $h14 suspiciously low")
    assert(sims(5L) == 0L, "empty doc simhash should be 0")
  }
}
