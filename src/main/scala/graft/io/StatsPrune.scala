package graft.io

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.functions._

/** Translates a ROW-level predicate into a MANIFEST-level pruning
  * predicate over [[CowTable]]'s per-file statistics — the discipline
  * every lakehouse format uses to turn "DELETE WHERE date < cutoff"
  * into a scan of the head-of-timeline files instead of the table.
  *
  * The manifest carries kmin/kmax (the clustering key, as longs) and
  * `smin`/`smax` string maps for the table's declared stats columns
  * (aggregated on the natural type at write time, stringified for
  * storage). Each supported comparison becomes a may-contain range test
  * against those bounds, with the stored string cast BACK to the
  * predicate literal's type so numerics and dates compare numerically,
  * not lexically.
  *
  * Strictly CONSERVATIVE: any subtree the translator does not
  * understand contributes `true` (file kept), a missing stats entry
  * yields NULL which coalesces to `true`, and an `OR` prunes only when
  * BOTH branches translate. Pruning can only skip files whose
  * statistics PROVE no row matches — the row-level predicate is always
  * re-applied on the survivors, so a translator gap costs I/O, never
  * correctness.
  */
private[graft] object StatsPrune {

  /** Manifest filter: TRUE for every file that MAY contain a row
    * matching `pred`; `key` is the table's clustering-key column, whose
    * statistics live in kmin/kmax rather than the stats maps. A STRING
    * key (`stringKey = true`) routes through the stats maps instead —
    * its natural min/max are always recorded there at write time, so the
    * comparison is exact string order, not the lossy long encoding
    * kmin/kmax carry for the bucket join. */
  def mayContain(pred: Column, key: String,
                 stringKey: Boolean = false,
                 rename: Map[String, String] = Map.empty): Column =
    translate(org.apache.spark.sql.graftbridge.ColumnBridge.expression(pred),
      if (stringKey) "" else key, rename).getOrElse(lit(true))

  private def attrName(e: Expression): Option[String] = e match {
    case a: UnresolvedAttribute => Some(a.name)
    case a: AttributeReference => Some(a.name)
    case _ => None
  }

  /** Rebuild the literal as a Column via its SQL rendering — exact for
    * every literal type the parser can round-trip (strings, numerics,
    * dates, timestamps, booleans). */
  private def litCol(l: Literal): Column = expr(l.sql)

  /** Build a bound test for attribute `n` against literal `l`:
    * `test(lo, hi, v)` over the file's (lower, upper, literal) columns.
    * For the clustering key the bounds are kmin/kmax and the LITERAL is
    * cast to long (casting the long bound down to a narrower literal
    * type could overflow); for stats columns the stored strings are
    * cast to the literal's type. */
  private def bound(n: String, key: String, l: Literal,
                    rename: Map[String, String])
                   (test: (Column, Column, Column) => Column): Option[Column] = {
    if (l.value == null) return None // null literal: matches nothing; skip
    // predicates name LOGICAL columns; the stats maps are keyed by
    // PHYSICAL names (stable across column renames)
    val pn = rename.getOrElse(n, n)
    val (lo, hi, v) =
      if (n == key)
        (col("kmin"), col("kmax"), litCol(l).cast("long"))
      else
        (element_at(col("smin"), lit(pn)).cast(l.dataType),
          element_at(col("smax"), lit(pn)).cast(l.dataType),
          litCol(l))
    // NULL bounds (column not in the stats set, or an all-null file)
    // keep the file
    Some(coalesce(test(lo, hi, v), lit(true)))
  }

  private def translate(e: Expression, key: String,
                        rename: Map[String, String]): Option[Column] = e match {
    case And(a, b) =>
      (translate(a, key, rename), translate(b, key, rename)) match {
        case (None, None) => None
        case (x, y) => Some(x.getOrElse(lit(true)) && y.getOrElse(lit(true)))
      }
    case Or(a, b) =>
      for (x <- translate(a, key, rename); y <- translate(b, key, rename)) yield x || y

    case EqualTo(a, l: Literal) =>
      attrName(a).flatMap(n => bound(n, key, l, rename)((lo, hi, v) =>
        lo <= v && hi >= v))
    case EqualTo(l: Literal, a) => translate(EqualTo(a, l), key, rename)
    case EqualNullSafe(a, l: Literal) if l.value != null =>
      translate(EqualTo(a, l), key, rename)
    case EqualNullSafe(l: Literal, a) if l.value != null =>
      translate(EqualTo(a, l), key, rename)

    case GreaterThan(a, l: Literal) =>
      attrName(a).flatMap(n => bound(n, key, l, rename)((_, hi, v) => hi > v))
    case GreaterThan(l: Literal, a) => translate(LessThan(a, l), key, rename)
    case GreaterThanOrEqual(a, l: Literal) =>
      attrName(a).flatMap(n => bound(n, key, l, rename)((_, hi, v) => hi >= v))
    case GreaterThanOrEqual(l: Literal, a) =>
      translate(LessThanOrEqual(a, l), key, rename)
    case LessThan(a, l: Literal) =>
      attrName(a).flatMap(n => bound(n, key, l, rename)((lo, _, v) => lo < v))
    case LessThan(l: Literal, a) => translate(GreaterThan(a, l), key, rename)
    case LessThanOrEqual(a, l: Literal) =>
      attrName(a).flatMap(n => bound(n, key, l, rename)((lo, _, v) => lo <= v))
    case LessThanOrEqual(l: Literal, a) =>
      translate(GreaterThanOrEqual(a, l), key, rename)

    case In(a, vs) if vs.nonEmpty && vs.forall(_.isInstanceOf[Literal]) =>
      attrName(a).map { n =>
        // IN = OR of equalities; a null element matches nothing and is
        // dropped. All-null list -> false would be aggressive; keep true.
        val terms = vs.collect { case l: Literal if l.value != null =>
          bound(n, key, l, rename)((lo, hi, v) => lo <= v && hi >= v)
        }.flatten
        if (terms.isEmpty) lit(true) else terms.reduce(_ || _)
      }

    // Column-operator predicates arrive PRE-ANALYSIS as
    // UnresolvedFunction nodes (the analyzer is what turns "=" into
    // EqualTo); rebuild the catalyst comparison and recurse
    case f: org.apache.spark.sql.catalyst.analysis.UnresolvedFunction
        if f.nameParts.size == 1 =>
      (f.nameParts.head.toLowerCase(java.util.Locale.ROOT),
        f.arguments.toList) match {
        case ("and", a :: b :: Nil) => translate(And(a, b), key, rename)
        case ("or", a :: b :: Nil) => translate(Or(a, b), key, rename)
        case ("=" | "==", a :: b :: Nil) => translate(EqualTo(a, b), key, rename)
        case ("<=>", a :: b :: Nil) => translate(EqualNullSafe(a, b), key, rename)
        case ("<", a :: b :: Nil) => translate(LessThan(a, b), key, rename)
        case ("<=", a :: b :: Nil) => translate(LessThanOrEqual(a, b), key, rename)
        case (">", a :: b :: Nil) => translate(GreaterThan(a, b), key, rename)
        case (">=", a :: b :: Nil) => translate(GreaterThanOrEqual(a, b), key, rename)
        case ("in", a :: rest) if rest.nonEmpty => translate(In(a, rest), key, rename)
        case _ => None
      }

    case _ => None // Not / IsNull / functions / ...: no pruning claim
  }
}
