package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.floor

/** Package-level conventions shared by the similarity / dedup / ANN
  * operator stack.
  */
package object ops {

  /** Cross-engine BIT-IDENTICAL rounding onto the 1e-6 grid:
    * `floor(x·10⁶ + 0.5) / 10⁶`, the same three IEEE-double operations
    * in Spark and in the DuckDB oracle (`floor((x) * 1e6 + 0.5) / 1e6`),
    * so both engines produce the same double for the same input — by
    * construction, not by luck.
    *
    * The previous convention, `CAST(x AS DECIMAL(10,6))`, rounds through
    * each engine's own double→decimal conversion; those disagree when a
    * value lands within an ulp of a grid HALF-POINT (measured: DuckDB
    * rounds the double 0.999999499999999042 UP to 1.000000, Java
    * BigDecimal HALF_UP rounds it down to 0.999999). Random data never
    * lands there, but the 10× replica fixture CONCENTRATES copy-pair
    * cosines exactly at one: unit vectors perturbed by ε in one
    * component pair at cosine ≈ 1 − ε²/2 — a half-point of the grid for
    * ε = 10⁻³. Half-point ties themselves remain measure-zero; what
    * matters is that BOTH engines now resolve any tie identically.
    */
  implicit class Grid6Column(private val c: Column) extends AnyVal {
    def grid6: Column = floor(c * 1e6 + 0.5) / 1e6
  }

  /** The oracle-side twin of [[Grid6Column.grid6]] — interpolate into
    * DuckDB SQL. */
  def grid6Sql(e: String): String = s"floor(($e) * 1e6 + 0.5) / 1e6"
}
