package graft.io

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.Pipeline

/** Multi-format source/sink proof: the same dataset written and re-read
  * through every Spark-native columnar/text format must be value-lossless.
  * The registered query round-trips dim_customer through parquet, ORC,
  * CSV and JSON, and emits per-format (row count, order-independent
  * digest); the oracle computes the same digest straight from the source
  * tables — so a lossy writer/reader (type coercion, header mishandling,
  * encoding) shows up as a hash mismatch on that format's row.
  *
  * The digest is bit_xor over a per-row 60-bit md5 slice: commutative,
  * so file/partition order (which differs per format) cannot affect it.
  */
object Formats {

  val formats: Seq[String] = Seq("parquet", "orc", "csv", "json")

  private val digestExpr =
    "bit_xor(CAST(conv(substring(md5(concat_ws('|', CAST(customer_id AS STRING), customer_name)), 1, 15), 16, 10) AS BIGINT))"

  def roundtrip(spark: SparkSession, dir: String): DataFrame =
    graft.Memo(spark, "io_formats", dir, "io_formats") {
      val dim = graft.pipeline.Star.dimCustomer(Pipeline.silverCached(spark, dir))
      val base = Files.createTempDirectory("graft_formats").toFile.getAbsolutePath
      val perFormat = formats.map { fmt =>
        val path = s"$base/$fmt"
        val w = dim.write.mode("overwrite").format(fmt)
        (if (fmt == "csv") w.option("header", "true") else w).save(path)
        val r = spark.read.format(fmt)
        val back = (if (fmt == "csv") r.option("header", "true").schema(dim.schema)
                    else if (fmt == "json") r.schema(dim.schema)
                    else r).load(path)
        back.agg(
          count(lit(1)).as("n_rows"),
          expr(digestExpr).as("row_digest"))
          .select(lit(fmt).as("format"), col("n_rows"), col("row_digest"))
      }
      perFormat.reduce(_ unionByName _)
    }

  /** Oracle: every format row must equal the digest computed directly
    * from the source tables (roundtrips are lossless by contract).
    */
  val roundtripSql: String =
    Pipeline.starPrefix +
      s""", digest AS (
         |  SELECT count(*) AS n_rows,
         |         bit_xor(CAST(('0x' || substr(md5(CAST(customer_id AS VARCHAR) || '|' || customer_name), 1, 15)) AS BIGINT)) AS row_digest
         |  FROM dim_customer
         |)
         |SELECT f.format, d.n_rows, d.row_digest
         |FROM (VALUES ${formats.map(f => s"('$f')").mkString(", ")}) f(format), digest d""".stripMargin
}
