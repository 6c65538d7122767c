package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * with batched per-partition decode/feature-extract.
  *
  * The decode itself is a STUB (no image/audio codecs in this
  * environment — a deterministic fake stands in), but the Spark-side
  * contract is real and tested: schema, partition-batched execution
  * (`mapPartitions`, the Scala analog of `mapInPandas` — one iterator
  * per partition, amortised setup), and a stable output schema for
  * downstream feature joins.
  *
  * At 100 TB: payloads live in parquet binary columns, the decode stage
  * is embarrassingly parallel per partition, and
  * `spark.sql.files.maxPartitionBytes` bounds executor memory per batch.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, modality: String, payload: Array[Byte])

  case class MediaFeatures(doc_id: Long, modality: String, byte_len: Long,
      width: Int, height: Int, n_frames: Int, feature: Array[Float])

  /** Build the media table: binary payload + modality tag (the UTF-8
    * bytes of `text` stand in for real blobs). */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.Tables.documents(spark, dir)
      .select(col("doc_id"), col("source").as("modality"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRow]
  }

  /** STUB decoder: a real implementation would decode image/audio bytes
    * here (one codec init per partition, then per-row decode). The fake
    * derives deterministic pseudo-features from the payload so the
    * pipeline shape (batched decode → fixed-dim feature vector) is
    * exercised end to end. Feature lane i is the md5 48-bit fraction of
    * "i:" + the payload's UTF-8 decoding — the dedup tier's hash basis,
    * so the WHOLE stub (metadata and features) replays in the DuckDB
    * oracle; an earlier Java-overflow polynomial hash was deterministic
    * but unexpressible in SQL, which kept this entry rows-only. */
  private def decodeStub(payload: Array[Byte]): (Int, Int, Int, Array[Float]) = {
    // ??? <- real codec goes here; deterministic fake below
    val len = payload.length
    val width = 16 + (len % 64)
    val height = 16 + ((len / 64) % 64)
    val frames = 1 + (len % 4)
    val text = new String(payload, java.nio.charset.StandardCharsets.UTF_8)
    val md = java.security.MessageDigest.getInstance("MD5")
    val feature = Array.tabulate(8) { i =>
      val hex = md.digest(s"$i:$text".getBytes("UTF-8"))
        .take(6).map("%02x".format(_)).mkString // digest() self-resets
      (java.lang.Long.parseLong(hex, 16) / 281474976710656.0).toFloat // / 2^48
    }
    (width, height, frames, feature)
  }

  /** REAL decoder for the pure-JVM image formats (BMP/PNG/GIF via
    * javax.imageio — in every JRE, no native codec dependency): proves
    * the seam decodes actual bytes, not just the stub's arithmetic.
    * Feature = 8-bin luminance histogram, L1-normalised (a real, if
    * minimal, visual descriptor). Returns None when the payload is not
    * a decodable image. */
  def decodeImage(payload: Array[Byte]): Option[(Int, Int, Int, Array[Float])] = {
    // a reader can CLAIM a payload by its header and then throw on
    // corrupt pixel data — that must be a None (fall through to the
    // stub), not a task-killing exception
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case _: java.io.IOException => null }
    if (img == null) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      val hist = new Array[Float](8)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
            (rgb & 0xff) * 114) / 1000
          hist(lum >> 5) += 1f
          x += 1
        }
        y += 1
      }
      val n = (w.toLong * h).toFloat
      Some((w, h, 1, hist.map(_ / n)))
    }
  }

  /** [[extractFeatures]] with the REAL ImageIO codec in the seam: same
    * partition-batched shape, same output schema; payloads that are not
    * decodable images (this corpus's text stand-ins) fall through to
    * the stub, so the two paths compose in one pass. The stub remains
    * the default for [[mediaFeatures]] — the driver testdata carries no
    * image bytes; this path is spec-proved on real encoded payloads. */
  def extractFeaturesImage(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // ImageIO reader lookup is per-call; a production codec would
      // init once here per partition
      rows.map { r =>
        decodeImage(r.payload) match {
          case Some((w, h, f, feat)) =>
            MediaFeatures(r.doc_id, r.modality, r.payload.length.toLong, w, h, f, feat)
          case None =>
            val (w, h, f, feat) = decodeStub(r.payload)
            MediaFeatures(r.doc_id, r.modality, r.payload.length.toLong, w, h, f, feat)
        }
      }
    }
  }

  /** The REAL-codec path as a driver-checkable entry: synthesize a
    * deterministic 24-bit BMP per doc (pixel (x, y) is the gray level
    * g = (doc_id·31 + x·7 + y·13) mod 256 — pure integer math), run the
    * bytes through the SAME ImageIO seam as [[extractFeaturesImage]],
    * and emit the decoded per-bin luminance histogram as exact COUNTS.
    * BMP is lossless and gray pixels have luminance exactly g (the
    * 299/587/114 weights sum to 1000), so the decoded histogram equals
    * the closed-form pixel histogram — which DuckDB reproduces with
    * arithmetic alone, giving the codec round-trip a bit-exact oracle
    * with no image library on the oracle side.
    *
    * Bounded: `maxDocs` docs, ≤ 15×12 px each — the entry proves the
    * decode seam, the SCALE path stays [[extractFeatures]]'s
    * partition-batched shape. */
  def decodeRealHistogram(spark: SparkSession, dir: String,
      maxDocs: Int = 64): DataFrame = {
    import spark.implicits._
    val ids = graft.Tables.documents(spark, dir)
      .select(col("doc_id")).filter(col("doc_id") < maxDocs)
      .as[Long]
    ids.mapPartitions { it =>
      it.map { id =>
        val w = 8 + (id % 8).toInt
        val h = 8 + (id % 5).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val g = ((id * 31 + x * 7 + y * 13) % 256).toInt
            img.setRGB(x, y, (g << 16) | (g << 8) | g)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "bmp", bos)
        // decode through the real seam; count per 32-wide luminance bin
        val back = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bos.toByteArray))
        require(back != null, s"BMP round-trip failed for doc $id")
        val counts = new Array[Long](8)
        var yy = 0
        while (yy < back.getHeight) {
          var xx = 0
          while (xx < back.getWidth) {
            val rgb = back.getRGB(xx, yy)
            val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 +
              (rgb & 0xff) * 114) / 1000
            counts(lum >> 5) += 1L
            xx += 1
          }
          yy += 1
        }
        (id, back.getWidth, back.getHeight, counts)
      }
    }.toDF("doc_id", "width", "height", "counts")
      .select(col("doc_id"), col("width"), col("height"),
        posexplode(col("counts")).as(Seq("bin", "n_px")))
      .filter(col("n_px") > 0)
      .select(col("doc_id"), col("width"), col("height"),
        col("bin").cast("int").as("bin"), col("n_px"))
      .orderBy(col("doc_id"), col("bin"))
  }

  /** Partition-batched feature extraction over the media table. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition setup (codec init) would happen here, once
      rows.map { r =>
        val (w, h, f, feat) = decodeStub(r.payload)
        MediaFeatures(r.doc_id, r.modality, r.payload.length.toLong, w, h, f, feat)
      }
    }
  }

  /** End-to-end: media table → batched decode → features DataFrame. */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(mediaTable(spark, dir))
      .toDF()
      .orderBy("doc_id")

  case class ResizedMeta(doc_id: Long, modality: String, width: Int, height: Int,
      target_w: Int, target_h: Int, in_bytes: Long, out_bytes: Long)

  /** Batched resize through the decode seam: a real implementation
    * decodes, scales, re-encodes per partition; the stub carries the
    * deterministic size accounting (output bytes ∝ pixel ratio) so the
    * schema and batch shape are exercised and oracle-checkable. */
  def resizeMeta(media: Dataset[MediaRow], targetW: Int = 32, targetH: Int = 32): Dataset[ResizedMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition codec/scaler init would happen here, once
      rows.map { r =>
        val (w, h, _, _) = decodeStub(r.payload)
        val outBytes = math.ceil(
          r.payload.length.toDouble * (targetW.toLong * targetH) / (w.toLong * h)).toLong
        ResizedMeta(r.doc_id, r.modality, w, h, targetW, targetH,
          r.payload.length.toLong, outBytes)
      }
    }
  }

  case class FrameSampleRow(doc_id: Long, modality: String, n_frames: Int,
      sampled: String, n_sampled: Int)

  /** Batched frame sampling (video modality): keep every k-th frame
    * index from the decoded frame count. The index arithmetic is the
    * real operator contract; frame extraction itself sits behind the
    * decode stub. */
  def frameSample(media: Dataset[MediaRow], everyK: Int = 2): Dataset[FrameSampleRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (_, _, frames, _) = decodeStub(r.payload)
        val idx = 0 until frames by everyK
        FrameSampleRow(r.doc_id, r.modality, frames, idx.mkString(","), idx.length)
      }
    }
  }
}
