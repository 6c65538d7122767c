package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming members of the DOCUMENT pipeline — the near-dup analog of
  * [[EventStreams.dedupStream]]'s exact dedup: a training-data ingest
  * that flags near-duplicate documents as they ARRIVE, instead of in a
  * nightly batch sweep.
  *
  * Same md5-basis MinHash + banding as the batch ladder
  * ([[graft.dedup.Dedup]] — signatures are shared column algebra, so
  * stream and batch agree hash-for-hash), with the pair search turned
  * into per-bucket STATE: each (band_idx, band_key) bucket remembers
  * only the SMALLEST doc_id it has ever seen (one long per live
  * bucket), and every arriving doc that lands in a bucket with a
  * smaller representative emits a (doc, dup_of, band) match. That is
  * the classic representative-linkage contract: batch-equivalently,
  * doc d matches bucket-min m exactly when m < d (proved stream ≡
  * batch in StreamingSpec under id-ordered arrival; out-of-order
  * arrival degrades gracefully to "smallest seen so far", never a
  * false positive).
  *
  * At 100 TB: state is O(live band buckets) longs — RocksDB-backed
  * with TTL eviction for cold buckets; candidates flow to the same
  * exact-verify stage as the batch path (LSH candidates are a
  * prescreen in BOTH worlds, so the streaming member inherits the
  * batch tier's precision semantics unchanged).
  */
object DocStreams {

  case class DupMatch(doc_id: Long, dup_of: Long, band_idx: Int)

  // public: encoder codegen instantiates it from generated classes
  case class BandRow(band_idx: Int, band_key: String, doc_id: Long)

  /** (band_idx, band_key, doc_id) banding rows — the ONE construction
    * both the stream and its batch twin use (the stream ≡ batch proof
    * depends on them never diverging). */
  private def bandRows(docs: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    require(numHashes % bands == 0, s"bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    graft.dedup.Dedup.signaturesOf(docs, numHashes)
      .select(col("doc_id"),
        posexplode(expr(s"transform(sequence(0, ${bands - 1}), " +
          s"b -> concat_ws(',', slice(sig, b * $rowsPerBand + 1, $rowsPerBand)))")))
      .select(col("pos").cast("int").as("band_idx"),
        col("col").as("band_key"), col("doc_id"))
  }

  /** Near-dup matches over a streaming (doc_id, text) frame. */
  def nearDupStream(docs: DataFrame, numHashes: Int = 32,
      bands: Int = 8): Dataset[DupMatch] = {
    import docs.sparkSession.implicits._
    val banded = bandRows(docs, numHashes, bands).as[BandRow]

    def fn(key: (Int, String), rows: Iterator[BandRow],
        state: GroupState[Long]): Iterator[DupMatch] = {
      // ascending order inside the batch: a doc links to the smallest
      // id seen before it, wherever the trigger boundaries fall
      val incoming = rows.map(_.doc_id).toArray.sorted
      var minSeen = state.getOption.getOrElse(Long.MaxValue)
      val out = Iterator.newBuilder[DupMatch]
      incoming.foreach { d =>
        if (minSeen < d) out += DupMatch(d, minSeen, key._1)
        if (d < minSeen) minSeen = d
      }
      state.update(minSeen)
      out.result().iterator
    }

    banded
      .groupByKey(r => (r.band_idx, r.band_key))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(fn)
  }

  /** S13 — stateless streaming quality filter: the training-data
    * ingest gate run AT ARRIVAL instead of in a nightly sweep. The
    * operator IS the batch one — the same single-projection Column
    * algebra ([[graft.text.TextOps.qualityFilterOf]]: quality score +
    * language-ID, both codegen'd, no UDF) applied to a streaming
    * (doc_id, text) frame. Stateless means: no watermark, no state
    * store, Append mode, and per-row results identical wherever the
    * trigger boundaries fall — the stream ≡ batch proof is therefore
    * row-set equality (StreamingSpec, split across triggers). At
    * 100 TB this is the shape that matters: a quality gate BEFORE the
    * expensive dedup/tokenise tiers, running at source parallelism
    * with zero shuffle. */
  def qualityFilterStream(docs: DataFrame, minScore: Double = 0.7,
      langs: Seq[String] = Seq("en")): DataFrame =
    graft.text.TextOps.qualityFilterOf(docs, minScore, langs)

  /** S15 — stateless streaming MODEL-quality scorer: the
    * [[graft.text.TextOps.qualityClassifierOf]] logistic tier (the
    * DCLM/FineWeb-Edu shape) applied at arrival — like S13 a pure
    * projection (no watermark, no state store, Append mode), so the
    * stream ≡ batch proof is row-set equality across trigger
    * boundaries. Together S13+S15 are the full at-ingest quality
    * cascade: cheap heuristics first, model scorer second, both before
    * a single shuffle happens. */
  def qualityClassifierStream(docs: DataFrame): DataFrame =
    graft.text.TextOps.qualityClassifierOf(docs)

  /** S16 — stateless streaming Gopher rule battery: the named-rule
    * filter REPORT ([[graft.text.TextOps.gopherRulesOf]] — metrics,
    * per-rule verdicts, keep) at arrival, completing the at-ingest
    * cascade S13 (score) → S16 (named rules) → S15 (model). Pure
    * projection like its siblings: no watermark, no state store,
    * Append mode, stream ≡ batch by row-set equality across trigger
    * boundaries (StreamingSpec). */
  def gopherRulesStream(docs: DataFrame): DataFrame =
    graft.text.TextOps.gopherRulesOf(docs)

  /** Batch twin of [[nearDupStream]] for the stream ≡ batch proof:
    * every doc linked to its band bucket's min doc_id where min < doc.
    * Same signatures, same band keys, plain aggregation. */
  def nearDupBatch(docs: DataFrame, numHashes: Int = 32,
      bands: Int = 8): DataFrame = {
    val banded = bandRows(docs, numHashes, bands)
    val mins = banded.groupBy(col("band_idx"), col("band_key"))
      .agg(min(col("doc_id")).as("dup_of"))
    banded.join(mins, Seq("band_idx", "band_key"))
      .filter(col("dup_of") < col("doc_id"))
      .select(col("doc_id"), col("dup_of"), col("band_idx"))
  }
}
