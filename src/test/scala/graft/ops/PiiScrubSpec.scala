package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** PII redaction semantics on crafted rows — the driver corpus
  * deliberately contains no PII-shaped strings (verified: zero digit
  * sequences of length ≥ 3 anywhere), so the operator's contract is
  * pinned here instead of by a trivially-empty oracle query.
  */
class PiiScrubSpec extends SparkTestBase {

  test("scrubPii redacts and counts every pattern; clean text unchanged") {
    import spark.implicits._
    val df = Seq(
      (1L, "reach me at jane.doe+spam@example.co.uk or (555) 123-4567"),
      (2L, "ssn 123-45-6789 appears once"),
      (3L, "no pii here, just words"),
      (4L, "two mails: a@b.io c@d.org and ssn 000-11-2222")
    ).toDF("id", "text")
    val got = TextOps.scrubPii(df, "text")
      .orderBy("id")
      .collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[String]("text"),
        r.getAs[Long]("n_email"), r.getAs[Long]("n_ssn"), r.getAs[Long]("n_phone")))

    assert(got(0) === ((1L, "reach me at <EMAIL> or <PHONE>", 1L, 0L, 1L)))
    assert(got(1) === ((2L, "ssn <SSN> appears once", 0L, 1L, 0L)))
    assert(got(2) === ((3L, "no pii here, just words", 0L, 0L, 0L)))
    assert(got(3) === ((4L, "two mails: <EMAIL> <EMAIL> and ssn <SSN>", 2L, 1L, 0L)))
  }

  test("overlapping matches are counted once, on the pattern that redacted them") {
    import spark.implicits._
    // The email rule's local part admits digits and hyphens, so it
    // consumes the SSN-shaped prefix whole; the output then contains no
    // SSN and the counts must agree with the output, not the input.
    val df = Seq((1L, "contact 123-45-6789@corp.co now")).toDF("id", "text")
    val r = TextOps.scrubPii(df, "text").collect()(0)
    assert(r.getAs[String]("text") === "contact <EMAIL> now")
    assert(r.getAs[Long]("n_email") === 1L)
    assert(r.getAs[Long]("n_ssn") === 0L, "consumed by the email redaction")
  }

  test("scrubPii leaves the real corpus untouched (no PII exists in it)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val out = TextOps.scrubPii(docs, "text")
    assert(out.filter(col("n_email") + col("n_ssn") + col("n_phone") > 0).count() === 0L)
    // schema contract: original columns preserved, one count per pattern
    assert(out.columns.toSet ===
      docs.columns.toSet ++ TextOps.piiPatterns.map { case (n, _, _) => s"n_$n" })
  }
}
