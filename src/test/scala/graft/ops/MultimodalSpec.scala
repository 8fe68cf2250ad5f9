package graft.ops

import graft.SparkTestBase

/** Multimodal plumbing spec: schemas, determinism, operator shapes. The
  * codec is a documented stub; what's pinned here is the Spark-side
  * contract (typed Dataset schema, partition batching, frame/resize
  * arithmetic) that survives a real-codec swap.
  */
class MultimodalSpec extends SparkTestBase {

  private lazy val media = Multimodal.mediaTable(spark, sfDir).cache()

  test("media table: one asset per document, payload matches metadata") {
    val rows = media.collect()
    assert(rows.length == 500)
    rows.take(20).foreach { r =>
      assert(r.media.length == r.width * r.height)
      assert(Multimodal.formats.contains(r.format))
    }
  }

  test("payload generation is deterministic across evaluations") {
    val a = media.filter(_.doc_id == 7L).collect()(0)
    val b = Multimodal.mediaTable(spark, sfDir).filter(_.doc_id == 7L).collect()(0)
    assert(a.media.toSeq == b.media.toSeq)
  }

  test("feature extraction: stable values, entropy of pseudorandom bytes high") {
    val f = Multimodal.extractFeatures(media).collect().map(x => x.doc_id -> x).toMap
    assert(f.size == 500)
    val f7 = f(7L)
    assert(f7.n_bytes == f(7L).n_bytes)
    assert(f7.mean_byte > 0 && f7.mean_byte < 255)
    assert(f7.byte_entropy > 5.0, s"xorshift payload entropy was ${f7.byte_entropy}")
  }

  test("resize: exact output dims, deterministic nearest-neighbor") {
    val r = Multimodal.resize(media, 8, 8).collect()
    assert(r.forall(x => x.width == 8 && x.height == 8 && x.media.length == 64))
    val orig = media.filter(_.doc_id == 3L).collect()(0)
    val rz = Multimodal.resize(media, 8, 8).filter(_.doc_id == 3L).collect()(0)
    // top-left pixel is preserved by nearest-neighbor
    assert(rz.media(0) == orig.media(0))
  }

  test("frame sampling: n frames covering the payload exactly once") {
    val frames = Multimodal.sampleFrames(media, 4).collect()
      .groupBy(_.doc_id)
    assert(frames.forall(_._2.length == 4))
    val m = media.filter(_.doc_id == 11L).collect()(0)
    val fs = frames(11L).sortBy(_.frame_idx)
    assert(fs.flatMap(_.frame_bytes).toSeq == m.media.toSeq,
      "concatenated frames must reconstruct the payload")
  }
}
