package graft.crypto

import java.sql.Date

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** The reference's "people" demo table (write_encrypted_parquet.py:32-65)
  * and its golden rows (FIXTURES.md §1).
  */
object Fixtures {

  val peopleSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("date_of_birth", DateType, nullable = true),
    StructField("first_name", StringType, nullable = true),
    StructField("last_name", StringType, nullable = true),
    StructField("social_security_number", StringType, nullable = true)))

  val peopleRows: Seq[Row] = Seq(
    Row(1L, Date.valueOf("1988-02-17"), "Mike", "Truk", "123-45-6789"),
    Row(2L, Date.valueOf("1989-02-06"), "Rey", "McSriff", "234-56-7890"),
    Row(3L, Date.valueOf("2020-01-25"), "Todd", "Bonzalez", "345-67-8901"))

  def people(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      new java.util.ArrayList(
        scala.jdk.CollectionConverters.SeqHasAsJava(peopleRows).asJava),
      peopleSchema)
}
