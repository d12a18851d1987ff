package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, StringType}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.unsafe.types.UTF8String

/** Hashing-trick feature vector (Weinberger et al., ICML'09) as a native
  * Catalyst expression — the performance-critical kernel behind
  * [[graft.ops.Featurize]].
  *
  * Semantics (bit-identical to the column-op formulation it replaced,
  * and to the DuckDB oracle in `Featurize.embCteAs`):
  * tokens = nonempty runs between `[^a-z0-9]+` over the lowercased
  * text; grams = unigrams ++ adjacent `a_b` bigrams; each gram's md5
  * gives bucket = first byte mod `dim` and sign = +1 when the third hex
  * char is 0–7; the vector is the per-bucket signed sum (±1 integer
  * sums — exact in doubles, order-free).
  *
  * Why a custom `Expression`: the previous formulation
  * (`transform(sequence(0,63), b => aggregate(grams, …))`) re-evaluated
  * the md5 of every gram once PER BUCKET inside interpreted lambda
  * machinery — O(dim·grams) digests, measured at ~194 s for the sf0.1
  * corpus. This kernel hashes each gram exactly once into a `dim`-slot
  * accumulator — O(grams) digests inside whole-stage codegen — and
  * brings the same build under a second. Same rationale as
  * [[WinnowFingerprint]]: no encoder boundary, no codegen break.
  */
case class FeatureHashVector(child: Expression, dim: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"feature_hash requires a string argument, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    FeatureHashUtil.vector(input.asInstanceOf[UTF8String], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.FeatureHashUtil.vector($c, $dim)")

  override protected def withNewChildInternal(newChild: Expression): FeatureHashVector =
    copy(child = newChild)

  override def prettyName: String = "feature_hash"
}

/** Hashing core, static so generated Java can call it directly. */
object FeatureHashUtil {

  private val sep = java.util.regex.Pattern.compile("[^a-z0-9]+")

  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  def vector(s: UTF8String, dim: Int): ArrayData = {
    val acc = new Array[Double](dim)
    val toks0 = sep.split(s.toString.toLowerCase(java.util.Locale.ROOT), -1)
    // drop empties (a leading delimiter yields one; trailing too)
    var n = 0
    var i = 0
    while (i < toks0.length) {
      if (!toks0(i).isEmpty) { toks0(n) = toks0(i); n += 1 }
      i += 1
    }
    val md = md5.get()
    def add(g: String): Unit = {
      md.reset()
      val d = md.digest(g.getBytes(StandardCharsets.UTF_8))
      // bucket: first two md5 hex chars = the first digest byte
      val b = (d(0) & 0xFF) % dim
      // sign: third hex char (second byte's high nibble) in 0-7 → +1
      acc(b) += (if (((d(1) >> 4) & 0xF) <= 7) 1.0 else -1.0)
    }
    i = 0
    while (i < n) { add(toks0(i)); i += 1 }
    i = 0
    while (i < n - 1) { add(toks0(i) + "_" + toks0(i + 1)); i += 1 }
    new GenericArrayData(acc)
  }
}

object FeatureHashFunctions {

  private val info = new ExpressionInfo(
    classOf[FeatureHashVector].getName, "feature_hash")

  /** `feature_hash(text, dim)` — dim is a LITERAL argument of the call
    * site, not state baked into the registered builder (the same
    * parameter-independence contract as [[CdcCutFunctions]]: two call
    * sites with different dims in one session never race on the
    * session-global registration).
    */
  def builder(args: Seq[Expression]): Expression = args match {
    case Seq(c, d) => FeatureHashVector(c, litInt(d))
    case other => throw new IllegalArgumentException(
      s"feature_hash expects 2 arguments (text, dim), got ${other.size}")
  }

  private def litInt(e: Expression): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"feature_hash dim must be an integer literal, got $other")
  }

  def register(spark: SparkSession): Unit = if (!spark.sessionState
      .functionRegistry.functionExists(FunctionIdentifier("feature_hash")))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("feature_hash"), info, builder _)

  def featureHash(spark: SparkSession, c: Column, dim: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("feature_hash", c,
      org.apache.spark.sql.functions.lit(dim))
  }
}
