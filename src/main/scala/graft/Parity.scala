package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.DecimalType

/** Output-parity rules for the driver's hash compare (Spark parquet vs
  * DuckDB over the same inputs).
  *
  * DECIMAL is the right type for order-independent *accumulation* (a double
  * sum's low bits depend on partition scheduling), but it must never be an
  * *output* type: the comparator renders a Spark `DECIMAL(15,2)` with its
  * declared scale (`103580.80`) while the DuckDB value arrives as a float
  * (`103580.8`), so any trailing-zero fraction hash-diverges even when the
  * values are numerically identical. Decimal→double is a correctly-rounded
  * conversion in both engines, so casting the final columns cannot itself
  * diverge. Each oracle applies the same cast in its outermost SELECT.
  */
object Parity {

  /** Cast every top-level DecimalType column to DOUBLE, preserving column
    * order and names. No-op (same plan) when the frame has no decimals.
    */
  def doublify(df: DataFrame): DataFrame =
    if (!df.schema.fields.exists(_.dataType.isInstanceOf[DecimalType])) df
    else df.select(df.schema.fields.map { f =>
      f.dataType match {
        case _: DecimalType => col(f.name).cast("double").as(f.name)
        case _              => col(f.name)
      }
    }.toIndexedSeq: _*)
}
