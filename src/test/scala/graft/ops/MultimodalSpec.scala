package graft.ops

import graft.SparkTestBase

/** Multimodal spec with REAL codecs: payloads are genuine PNG/JPEG/WAV
  * files (magic bytes asserted), features are computed from genuinely
  * decoded pixels/samples. PNG and WAV are lossless, so decoded content
  * must equal the synthesized content bit-for-bit; JPEG is lossy, so its
  * decode is pinned to dimensional agreement plus a mean-value tolerance.
  */
class MultimodalSpec extends SparkTestBase {

  private lazy val media = Multimodal.mediaTable(spark, sfDir).cache()

  private def one(id: Long): Multimodal.MediaRecord =
    media.filter(_.doc_id == id).collect()(0)

  test("media table: one asset per document, payloads carry real codec magic bytes") {
    val rows = media.collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val m = r.media
      r.format match {
        case "png" =>
          assert((m(0) & 0xFF) == 0x89 && m(1) == 'P' && m(2) == 'N' && m(3) == 'G',
            s"doc ${r.doc_id}: not a PNG")
        case "jpeg" =>
          assert((m(0) & 0xFF) == 0xFF && (m(1) & 0xFF) == 0xD8,
            s"doc ${r.doc_id}: not a JPEG")
        case "wav" =>
          assert(m(0) == 'R' && m(1) == 'I' && m(2) == 'F' && m(3) == 'F',
            s"doc ${r.doc_id}: not a WAV")
      }
    }
  }

  test("decode: dims match metadata for every asset") {
    media.collect().take(60).foreach { r =>
      val (buf, w, h) = Multimodal.decode(r.format, r.media)
      assert(w == r.width && h == r.height, s"doc ${r.doc_id} ${r.format}: $w x $h")
      assert(buf.length == r.width * r.height)
    }
  }

  test("PNG round-trip is lossless: decoded pixels equal synthesized pixels") {
    val r = one(3L) // 3 % 3 == 0 -> png
    assert(r.format == "png")
    val (buf, _, _) = Multimodal.decode(r.format, r.media)
    assert(buf.toSeq == Multimodal.rawContent(3L, r.width * r.height).toSeq)
  }

  test("WAV round-trip is lossless: decoded samples equal synthesized samples") {
    val r = one(2L) // 2 % 3 == 2 -> wav
    assert(r.format == "wav")
    val (buf, n, h) = Multimodal.decode(r.format, r.media)
    assert(h == 1 && n == r.width)
    assert(buf.toSeq == Multimodal.rawContent(2L, r.width).toSeq)
  }

  test("JPEG decodes with correct dims and approximates source mean (lossy)") {
    val r = one(7L) // 7 % 3 == 1 -> jpeg
    assert(r.format == "jpeg")
    val (buf, w, h) = Multimodal.decode(r.format, r.media)
    assert(w == r.width && h == r.height)
    val src = Multimodal.rawContent(7L, r.width * r.height)
    val srcMean = src.map(_ & 0xFF).sum.toDouble / src.length
    val decMean = buf.map(_ & 0xFF).sum.toDouble / buf.length
    assert(math.abs(srcMean - decMean) < 20.0,
      s"jpeg mean drifted too far: src=$srcMean dec=$decMean")
  }

  test("payload generation is deterministic across evaluations") {
    val a = one(7L)
    val b = Multimodal.mediaTable(spark, sfDir).filter(_.doc_id == 7L).collect()(0)
    assert(a.media.toSeq == b.media.toSeq)
  }

  test("feature extraction: exact values for lossless formats") {
    val f = Multimodal.extractFeatures(media).collect().map(x => x.doc_id -> x).toMap
    assert(f.size == 500)
    // PNG doc 3: features must equal stats of the synthesized pixels exactly
    val r3 = one(3L)
    val src = Multimodal.rawContent(3L, r3.width * r3.height)
    val expMean = src.map(_ & 0xFF).sum.toDouble / src.length
    assert(f(3L).n_px == r3.width * r3.height)
    assert(math.abs(f(3L).mean_byte - expMean) < 1e-9)
    assert(f(3L).n_bytes == r3.media.length) // encoded size, not pixel count
    // pseudorandom 8-bit content: entropy near log2(min(256, n))
    assert(f(3L).byte_entropy > 5.0, s"entropy was ${f(3L).byte_entropy}")
    // WAV doc 2: same exactness
    val r2 = one(2L)
    val src2 = Multimodal.rawContent(2L, r2.width)
    assert(math.abs(f(2L).mean_byte - src2.map(_ & 0xFF).sum.toDouble / src2.length) < 1e-9)
  }

  test("resize: exact decoded output dims, nearest-neighbor preserves top-left (png)") {
    val rz = Multimodal.resize(media, 8, 8).collect()
    rz.filter(_.format != "wav").foreach { r =>
      val (buf, w, h) = Multimodal.decode(r.format, r.media)
      assert(w == 8 && h == 8 && buf.length == 64)
    }
    rz.filter(_.format == "wav").foreach { r =>
      val (buf, n, _) = Multimodal.decode(r.format, r.media)
      assert(n == 8 && buf.length == 8)
    }
    val (orig, _, _) = Multimodal.decode("png", one(3L).media)
    val rz3 = rz.find(_.doc_id == 3L).get
    val (rbuf, _, _) = Multimodal.decode("png", rz3.media)
    assert(rbuf(0) == orig(0), "nearest-neighbor must preserve the top-left pixel")
  }

  test("frame sampling: n frames reconstruct the decoded buffer exactly") {
    val frames = Multimodal.sampleFrames(media, 4).collect().groupBy(_.doc_id)
    assert(frames.forall(_._2.length == 4))
    val (buf, _, _) = Multimodal.decode("wav", one(11L).media) // 11 % 3 == 2 -> wav
    val fs = frames(11L).sortBy(_.frame_idx)
    assert(fs.flatMap(_.frame_bytes).toSeq == buf.toSeq,
      "concatenated frames must reconstruct the decoded samples")
  }
}
