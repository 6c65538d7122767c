package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.text.TextOps

/** Fixture specs for the chunk-dedup / span-decontamination write
  * paths, on a corpus small enough to check by hand. Fixture docs are
  * written as a real `documents.parquet` so the operators run their
  * production read path. */
class TextPipelineSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  /** Write (doc_id, text) rows as a documents table in a temp dir. */
  private def corpusDir(docs: Seq[(Long, String)]): String = {
    val dir = Files.createTempDirectory("graft_textpipe").toString
    docs.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'web' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def toks(prefix: String, n: Int): String =
    (1 to n).map(i => s"$prefix$i").mkString(" ")

  test("chunkDedup: cross-doc first-occurrence wins, intra-doc repeats drop, partial chunks survive") {
    val A = toks("a", 8); val B = toks("b", 8)
    val C = toks("c", 8); val D = toks("d", 8)
    val dir = corpusDir(Seq(
      0L -> s"$A $B",   // both chunks novel → kept
      1L -> s"$A $C",   // chunk A already owned by doc 0 → dropped
      2L -> s"$D $D",   // intra-doc repeat → second instance dropped
      3L -> "e1 e2 e3"  // single partial chunk → kept
    ))
    val got = TextOps.chunkDedup(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == Map(
      0L -> ((s"$A $B", 2L, 0L)),
      1L -> ((C, 2L, 1L)),
      2L -> ((D, 2L, 1L)),
      3L -> (("e1 e2 e3", 1L, 0L))))
  }

  test("spanDecontaminate: test 8-grams excise covered train tokens; val docs are out of scope") {
    // md5 split buckets: ids 0,1 → train; 3 → val; 44 → test
    val X = toks("x", 8)
    val dir = corpusDir(Seq(
      0L -> s"p1 p2 $X q1 q2", // covered positions 2..9 excised
      1L -> toks("r", 10),     // clean → untouched
      3L -> s"$X",             // val: not part of the output
      44L -> X                 // the eval doc contributing the gram
    ))
    val got = TextOps.spanDecontaminate(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == Map(
      0L -> (("p1 p2 q1 q2", 12L, 8L)),
      1L -> ((toks("r", 10), 10L, 0L))))
  }

  test("tokenHeavyHitters: exact counts, and a width-2 collision sketch still never undercounts") {
    val dir = corpusDir(Seq(
      0L -> "apple apple apple banana banana cherry",
      1L -> "apple banana date date"))
    val got = TextOps.tokenHeavyHitters(spark, dir, k = 3).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2), r.getBoolean(3),
        r.getBoolean(4)))
    assert(got.toSeq == Seq(
      ("apple", 4L, true, true, true),
      ("banana", 3L, true, true, true),
      ("date", 2L, true, true, true)))

    // width 2 forces collisions: overcounts appear but the lower-bound
    // and merge-exactness gates are structural and must still hold
    val tiny = TextOps.tokenHeavyHitters(spark, dir, k = 5, width = 2).collect()
    tiny.foreach { r =>
      assert(r.getBoolean(2), s"CMS undercounted ${r.getString(0)}")
      assert(r.getBoolean(4), "shard merge must be exactly the single-pass sketch")
    }
  }

  test("spanDecontaminate: overlapping contaminated grams cover the union of spans, not double-count") {
    // train doc 0 holds x1..x9: both 8-grams (x1..x8, x2..x9) match test
    // grams from doc 44's x1..x9 → covered = union {0..8}, 9 tokens
    val dir = corpusDir(Seq(
      0L -> s"${toks("x", 9)} z1",
      44L -> toks("x", 9)))
    val got = TextOps.spanDecontaminate(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((0L, "z1", 10L, 9L)))
  }

  test("containmentPairs: doc-in-doc scores 1.0 where Jaccard would dilute to ~0.2") {
    // doc 1 = x1..x20; doc 2 = x1..x20 then y1..y80. The shared
    // x-shingles have df=2 (kept), the y-shingles and the boundary
    // x19/x20/y1 shingles df=1 (dropped) — capped sets are equal, so
    // containment = 1.0 while full-set Jaccard ≈ 18/98
    val dir = corpusDir(Seq(
      (1L, toks("x", 20)),
      (2L, toks("x", 20) + " " + toks("y", 80)),
      (3L, toks("z", 30))))
    val got = graft.dedup.Dedup.containmentPairs(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, 2L, 1.0)), s"got ${got.toSeq}")
  }

  test("qualityClassifier: logistic score matches the scala reference on a pinned doc") {
    val text = "one two three four five six seven eight nine ten."
    val dir = corpusDir(Seq((1L, text)))
    val got = TextOps.qualityClassifier(spark, dir).collect()
    val (nChars, nTokens, nPunct, nDigits) = (text.length.toDouble, 10.0, 1.0, 0.0)
    val z = -1.0 + 0.45 * math.log(1.0 + nTokens) -
      0.25 * math.abs(nChars / nTokens - 6.0) -
      6.0 * (nPunct / nChars) - 4.0 * (nDigits / nChars)
    val p = 1.0 / (1.0 + math.exp(-z))
    val p6 = BigDecimal(p).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.length == 1 && got(0).getLong(0) == 1L)
    assert(got(0).getDouble(1) == p6, s"got ${got(0).getDouble(1)}, want $p6")
    assert(got(0).getBoolean(2) == (p >= 0.5))
  }

  test("gopherRules: hand-computed metrics, each rule fires independently") {
    // doc 1: 60 alpha words incl. 'the' and 'of' (passes everything);
    // doc 2: 10 words (fails word count); doc 3: 60 words, half digits
    // (fails alpha frac), heavy '#' (fails symbols), no stop words
    val pass = (1 to 58).map(i => s"word$i").mkString(" ") + " the of"
    val short = toks("s", 10)
    val noisy = ((1 to 30).map(i => s"x$i") ++ (1 to 30).map(i => s"$i"))
      .mkString(" ") + " ##########"
    val dir = corpusDir(Seq((1L, pass), (2L, short), (3L, noisy)))
    val got = TextOps.gopherRules(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Boolean]("keep"), "doc 1 must pass all rules")
    assert(got(1L).getLong(1) == 60L && got(1L).getLong(2) == 2L)
    assert(!got(2L).getAs[Boolean]("rule_word_count"), "doc 2: 10 words < 50")
    assert(got(2L).getAs[Boolean]("rule_alpha"), "doc 2 is all-alpha")
    assert(!got(3L).getAs[Boolean]("rule_alpha"),
      "doc 3: 30/61 alpha words < 0.8")
    assert(!got(3L).getAs[Boolean]("rule_stops"), "doc 3 has no stop words")
    assert(!got(3L).getAs[Boolean]("rule_symbols"),
      "doc 3: 10 '#' over 61 words = 0.164 > 0.1")
  }

  test("ccnetBuckets: per-language terciles ordered by unigram nll") {
    // 6 docs, one lang: 3 made of the corpus-common token (lowest nll,
    // head), then increasingly rare vocab; bucket boundaries at 2/2/2
    val dir = corpusDir(Seq(
      (1L, "c c c c"), (2L, "c c c r1"), (3L, "c c r2 r3"),
      (4L, "c r4 r5 r6"), (5L, "r7 r8 r9 r10"), (6L, "r11 r12 r13 r14")))
    val got = TextOps.ccnetBuckets(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(got == Map(1L -> "head", 2L -> "head", 3L -> "middle",
      4L -> "middle", 5L -> "tail", 6L -> "tail"), s"got $got")
  }

  test("dsirWeights: target-like docs score positive, pool-only vocab negative") {
    // target (en) speaks 'alpha beta'; the pool (xx) speaks 'gamma
    // delta' — except doc 5, an xx doc written in target vocab, which
    // DSIR must surface (positive log ratio) despite its pool label
    val dir = Files.createTempDirectory("graft_dsir").toString
    Seq(
      (1L, "alpha beta alpha beta", "en"),
      (2L, "beta alpha beta alpha", "en"),
      (3L, "gamma delta gamma delta", "xx"),
      (4L, "delta gamma delta gamma", "xx"),
      (5L, "alpha beta beta alpha", "xx"))
      .toDF("doc_id", "text", "lang")
      .selectExpr("doc_id", "text", "lang", "'web' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = TextOps.dsirWeights(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getBoolean(3))).toMap
    assert(got.size == 5)
    Seq(1L, 2L, 5L).foreach(d =>
      assert(got(d)._1 > 0 && got(d)._2, s"doc $d must be selected: ${got(d)}"))
    Seq(3L, 4L).foreach(d =>
      assert(got(d)._1 < 0 && !got(d)._2, s"doc $d must not be selected: ${got(d)}"))
    // symmetric fixture: the en docs and doc 5 share one exact score
    assert(got(1L)._1 == got(5L)._1)
  }

  test("trainingShuffle: dense per-shard positions, run-deterministic, epoch-distinct") {
    val dir = corpusDir((1L to 40L).map(i => (i, s"doc number about topic $i")))
    def run(epoch: Int) = TextOps.trainingShuffle(spark, dir, epoch = epoch)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSeq
    val a = run(0)
    assert(a.length == 40 && a.map(_._1).distinct.length == 40)
    assert(a.forall(t => t._2 >= 0 && t._2 < 8))
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted == (1 to rows.length), "positions must be dense per shard")
    }
    assert(run(0) == a, "same epoch must replay bit-for-bit")
    assert(run(1) != a, "the epoch salt must change the order")
  }
}
