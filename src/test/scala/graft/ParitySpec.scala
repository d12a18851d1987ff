package graft

import org.apache.spark.sql.types._

/** Guards for the driver-comparator contract (see Parity.scala and the
  * round-2 lesson: DECIMAL output columns hash-fail even when values are
  * numerically identical, and array columns crash the comparator).
  */
class ParitySpec extends SparkSpec {

  // these execute work (stream runs / reload writes) inside the builder —
  // schema inspection alone doesn't justify running them here; their
  // schemas are covered by the selfcheck/driver gate instead
  private val eager = Set("stream_hourly", "stream_dedup",
    "silver_reloaded", "dq_reloaded", "export_reconcile", "io_formats")

  private def containsDecimal(dt: DataType): Boolean = dt match {
    case _: DecimalType => true
    case s: StructType => s.fields.exists(f => containsDecimal(f.dataType))
    case a: ArrayType => containsDecimal(a.elementType)
    case m: MapType => containsDecimal(m.keyType) || containsDecimal(m.valueType)
    case _ => false
  }

  test("no registered query's output schema contains a DecimalType (nested included)") {
    SparkEntry.queries.filterNot(q => eager(q._1)).foreach { case (name, fn) =>
      val schema = fn(spark, sf0001).schema
      assert(!schema.exists(f => containsDecimal(f.dataType)),
        s"$name emits a DECIMAL column: ${schema.simpleString}")
    }
  }

  test("no registered query emits array/map/struct columns (comparator-safe scalars only)") {
    SparkEntry.queries.filterNot(q => eager(q._1)).foreach { case (name, fn) =>
      val bad = fn(spark, sf0001).schema.fields.collect {
        case f if f.dataType.isInstanceOf[ArrayType] ||
          f.dataType.isInstanceOf[MapType] ||
          f.dataType.isInstanceOf[StructType] => f.name
      }
      assert(bad.isEmpty, s"$name emits non-scalar columns: ${bad.mkString(",")}")
    }
  }

  test("every registered query has an oracle (no silent rows-only fallbacks)") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracles: $missing")
  }
}
