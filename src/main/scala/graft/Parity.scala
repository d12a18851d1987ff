package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Output-parity rules for the driver's hash compare (Spark parquet vs
  * DuckDB over the same inputs).
  *
  * DECIMAL is the right type for order-independent *accumulation* (a double
  * sum's low bits depend on partition scheduling), but it must never be an
  * *output* type: the comparator renders a Spark `DECIMAL(15,2)` with its
  * declared scale (`103580.80`) while the DuckDB value arrives as a float
  * (`103580.8`), so any trailing-zero fraction hash-diverges even when the
  * values are numerically identical. Decimal→double is a correctly-rounded
  * conversion in both engines while the unscaled value fits in 2⁵³;
  * beyond that (e.g. a DECIMAL(18,2) sum past ~9e15 unscaled) DuckDB's
  * int128→double→÷10^scale path rounds twice and can drift 1 ulp from
  * Spark's correctly-rounded BigDecimal.doubleValue — if a very large SF
  * ever flakes on a money sum, this bound is the first suspect. Each
  * oracle applies the same cast in its outermost SELECT.
  */
object Parity {

  /** DecimalType → DoubleType everywhere in a (possibly nested) type. */
  private def dedecimal(dt: DataType): DataType = dt match {
    case _: DecimalType      => DoubleType
    case s: StructType       => StructType(s.fields.map(f => f.copy(dataType = dedecimal(f.dataType))))
    case a: ArrayType        => a.copy(elementType = dedecimal(a.elementType))
    case m: MapType          => m.copy(keyType = dedecimal(m.keyType), valueType = dedecimal(m.valueType))
    case other               => other
  }

  /** Cast every DecimalType column — including decimals nested inside
    * struct/array/map columns (`Column.cast` recurses through complex
    * types) — to DOUBLE, preserving column order and names. No-op (same
    * plan) when the frame has no decimals anywhere.
    */
  def doublify(df: DataFrame): DataFrame =
    if (df.schema.fields.forall(f => dedecimal(f.dataType) == f.dataType)) df
    else df.select(df.schema.fields.map { f =>
      val target = dedecimal(f.dataType)
      if (target == f.dataType) col(f.name)
      else col(f.name).cast(target).as(f.name)
    }.toIndexedSeq: _*)
}
