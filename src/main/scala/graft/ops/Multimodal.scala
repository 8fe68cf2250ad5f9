package graft.ops

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque binary columns
  * with typed metadata, plus decode / feature-extract / resize /
  * frame-sample operators.
  *
  * The Spark-side plumbing is real — binary schema, typed Datasets,
  * partition-iterator batch processing (`mapPartitions`, the JVM
  * equivalent of a Pandas-batch UDF: per-partition setup amortized over a
  * batch of records, constant memory per task). The codec itself is a
  * DETERMINISTIC FAKE (this container has no image/audio libraries): a
  * seeded byte generator stands in for pixel data and "decode" parses the
  * fake header. Swapping in a real codec changes only `decodeFrame` /
  * `MediaCodec` internals — schemas, partitioning and operator shapes stay.
  */
object Multimodal {

  /** A media asset: opaque payload + typed metadata. */
  final case class MediaRecord(
      doc_id: Long, format: String, width: Int, height: Int,
      media: Array[Byte])

  /** Features extracted per asset. */
  final case class MediaFeatures(
      doc_id: Long, format: String, n_bytes: Int,
      mean_byte: Double, byte_entropy: Double)

  /** One sampled frame. */
  final case class Frame(
      doc_id: Long, frame_idx: Int, frame_bytes: Array[Byte], frame_hash: Long)

  val formats = Seq("png", "jpeg", "wav")

  /** Deterministic fake payload: xorshift64 stream seeded by doc_id. The
    * stand-in for real pixel/sample data (STUB — see object docs).
    */
  private[ops] def fakePayload(seed: Long, n: Int): Array[Byte] = {
    var x = seed ^ 0x9E3779B97F4A7C15L
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      x ^= x << 13; x ^= x >>> 7; x ^= x << 17
      out(i) = (x & 0xFF).toByte
      i += 1
    }
    out
  }

  /** Synthesize a media table from the documents corpus: one asset per
    * doc, format round-robin, dimensions derived from doc length.
    */
  def mediaTable(s: SparkSession, d: String): Dataset[MediaRecord] = {
    import s.implicits._
    Tables.documents(s, d)
      .select(col("doc_id"), col("n_chars"))
      .as[(Long, Long)]
      .map { case (id, nChars) =>
        val fmt = formats((id % formats.size).toInt)
        val w = 8 + (nChars % 24).toInt
        val h = 8 + (id % 16).toInt
        MediaRecord(id, fmt, w, h, fakePayload(id, w * h))
      }
  }

  /** Decode + feature-extract, batched per partition. Real decode would
    * replace the byte statistics with codec output; the batch shape
    * (iterator-in/iterator-out, per-partition codec init) is the
    * production pattern.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { records =>
      // per-partition "codec" setup would go here (amortized over batch)
      records.map { r =>
        val bytes = r.media
        val counts = new Array[Long](256)
        var sum = 0.0
        bytes.foreach { b => val u = b & 0xFF; counts(u) += 1; sum += u }
        val n = bytes.length.toDouble
        val entropy = counts.foldLeft(0.0) { (acc, c) =>
          if (c == 0) acc else { val p = c / n; acc - p * math.log(p) / math.log(2) }
        }
        MediaFeatures(r.doc_id, r.format, bytes.length,
          sum / n, math.rint(entropy * 10000) / 10000)
      }
    }
  }

  /** Resize stub: nearest-neighbor downsample of the fake pixel buffer —
    * correct index arithmetic, fake pixels.
    */
  def resize(media: Dataset[MediaRecord], newW: Int, newH: Int): Dataset[MediaRecord] = {
    import media.sparkSession.implicits._
    media.map { r =>
      val out = new Array[Byte](newW * newH)
      var y = 0
      while (y < newH) {
        var x = 0
        while (x < newW) {
          val sx = x * r.width / newW
          val sy = y * r.height / newH
          out(y * newW + x) = r.media(sy * r.width + sx)
          x += 1
        }
        y += 1
      }
      r.copy(width = newW, height = newH, media = out)
    }
  }

  /** Frame sampling: split the payload into `n` equal row-chunks ("frames")
    * with a content hash each — the video-keyframe-extraction shape.
    */
  def sampleFrames(media: Dataset[MediaRecord], n: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { r =>
      val chunk = math.max(1, r.media.length / n)
      (0 until n).iterator.map { i =>
        val from = math.min(i * chunk, r.media.length)
        val until = if (i == n - 1) r.media.length else math.min(from + chunk, r.media.length)
        val bytes = java.util.Arrays.copyOfRange(r.media, from, until)
        Frame(r.doc_id, i, bytes, java.util.Arrays.hashCode(bytes).toLong)
      }
    }
  }

  /** Q40 — multimodal feature pipeline: synth → decode/extract → per-format
    * stats. Rows-only driver check (the payloads are synthetic);
    * MultimodalSpec pins determinism and shapes.
    */
  val q40: Q = Q(
    "q40_multimodal_features",
    (s, d) => {
      extractFeatures(mediaTable(s, d)).toDF()
        .groupBy("format")
        .agg(count(lit(1)).as("n_assets"),
          round(avg(col("mean_byte")), 2).as("avg_mean_byte"),
          round(avg(col("byte_entropy")), 2).as("avg_entropy"),
          sum(col("n_bytes")).as("total_bytes"))
        .orderBy("format")
    },
    None)

  val queries: Seq[Q] = Seq(q40)
}
