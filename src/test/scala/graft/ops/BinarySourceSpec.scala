package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** q88's binaryFile ingestion fidelity: exporting assets as loose media
  * files and re-ingesting them through Spark's binaryFile source must be
  * lossless — the per-format census equals the one computed from the
  * in-memory media table the files came from.
  */
class BinarySourceSpec extends SparkTestBase {

  test("binaryFile census row-equals the in-memory media-table census") {
    val fromFiles = Multimodal.q88.fn(spark, sfDir).collect()

    val direct = Multimodal.extractFeatures(
        Multimodal.mediaTable(spark, sfDir).filter(_.doc_id < 240)).toDF()
      .groupBy("format")
      .agg(count(lit(1)).as("n_assets"),
        sum(col("n_bytes")).as("total_bytes"),
        round(avg(col("mean_byte")), 2).as("avg_mean_byte"),
        round(avg(col("byte_entropy")), 2).as("avg_entropy"))
      .orderBy("format")
      .collect()

    assert(fromFiles.toSeq == direct.toSeq,
      s"ingestion not lossless:\nfiles:  ${fromFiles.mkString("; ")}\ndirect: ${direct.mkString("; ")}")
    assert(fromFiles.map(_.getLong(1)).sum == 240L, "all 240 exported assets ingested")
  }

  test("the export writes one real file per asset and skips nothing") {
    val dir = new java.io.File(Multimodal.assetDir(spark, sfDir))
    val files = dir.listFiles().filter(f => !f.getName.startsWith("_"))
    assert(files.length == 240)
    assert(files.forall(_.length > 0), "zero-byte asset written")
    val exts = files.map(_.getName.split("\\.").last).toSet
    assert(exts == Set("png", "jpeg", "wav"))
  }
}
