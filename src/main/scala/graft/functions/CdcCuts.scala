package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined-chunking boundary scan as a native Catalyst
  * expression — the performance kernel behind [[graft.ops.CdcChunk]].
  *
  * Semantics (bit-identical to the column-op formulation it replaced,
  * and to the DuckDB oracle in `CdcChunk.reportSql`): for each 1-based
  * word position `p`, hash the window `words[max(1, p−w+1) .. p]`
  * joined by single spaces and prefixed `cdc:` with md5; `p` is a cut
  * when the first 8 hex chars, read as an unsigned integer, are
  * `0 mod divisor` — or when `p` is the last position (the tail chunk
  * always closes). Returns the ascending array of cut positions.
  *
  * Why a custom `Expression`: the `filter(sequence(1, n), p -> …)`
  * formulation evaluates a slice + concat + md5 + conv expression tree
  * through interpreted lambda machinery per word position — measured at
  * 60 s for the sf0.1 corpus. This kernel runs the same digests in a
  * tight loop inside whole-stage codegen (one md5 per position, window
  * assembled into a reused StringBuilder) — same rationale as
  * [[FeatureHashVector]], which took the identical restructuring from
  * 194 s to under a second.
  */
case class CdcCutPositions(child: Expression, window: Int, divisor: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      // containsNull accepted: CdcCutUtil treats a null element as the
      // empty string (split() output — the only production feed — never
      // contains nulls, but SQL callers can hand-build arrays)
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"cdc_cuts requires array<string>, got ${other.sql}")
    }

  override def nullSafeEval(input: Any): Any =
    CdcCutUtil.cuts(input.asInstanceOf[ArrayData], window, divisor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.CdcCutUtil.cuts($c, $window, $divisor)")

  override protected def withNewChildInternal(newChild: Expression): CdcCutPositions =
    copy(child = newChild)

  override def prettyName: String = "cdc_cuts"
}

/** Boundary-scan core, static so generated Java can call it directly. */
object CdcCutUtil {

  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  def cuts(ws: ArrayData, window: Int, divisor: Int): ArrayData = {
    val n = ws.numElements()
    val words = new Array[String](n)
    var i = 0
    while (i < n) {
      // null elements hash as the empty string (checkInputDataTypes
      // admits containsNull=true, so the kernel must tolerate it)
      val u = if (ws.isNullAt(i)) null else ws.getUTF8String(i)
      words(i) = if (u == null) "" else u.toString
      i += 1
    }
    val md = md5.get()
    val sb = new java.lang.StringBuilder(64)
    val out = new Array[Int](n)
    var m = 0
    var p = 1
    while (p <= n) {
      sb.setLength(0)
      sb.append("cdc:")
      var j = math.max(0, p - window)
      while (j < p) {
        sb.append(words(j))
        if (j < p - 1) sb.append(' ')
        j += 1
      }
      md.reset()
      val d = md.digest(sb.toString.getBytes(StandardCharsets.UTF_8))
      // first 8 hex chars = first 4 digest bytes as an unsigned int
      val h = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
        ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
      if (p == n || h % divisor == 0) { out(m) = p; m += 1 }
      p += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }
}

object CdcCutFunctions {

  private val info = new ExpressionInfo(
    classOf[CdcCutPositions].getName, "cdc_cuts")

  /** `cdc_cuts(words, window, divisor)` — window/divisor are LITERAL
    * arguments of the call site, not state baked into the registered
    * builder: two call sites with different parameters in one session
    * each get their own expression instance, and the session-global
    * registration is parameter-independent (re-registering is a no-op
    * in effect, never a silent last-writer-wins race).
    */
  def builder(args: Seq[Expression]): Expression = args match {
    case Seq(c, w, d) => CdcCutPositions(c, litInt(w, "window"), litInt(d, "divisor"))
    case other => throw new IllegalArgumentException(
      s"cdc_cuts expects 3 arguments (words, window, divisor), got ${other.size}")
  }

  private def litInt(e: Expression, name: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"cdc_cuts $name must be an integer literal, got $other")
  }

  def register(spark: SparkSession): Unit = if (!spark.sessionState
      .functionRegistry.functionExists(FunctionIdentifier("cdc_cuts")))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("cdc_cuts"), info, builder _)

  def cdcCuts(spark: SparkSession, c: Column, window: Int, divisor: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("cdc_cuts", c,
      org.apache.spark.sql.functions.lit(window),
      org.apache.spark.sql.functions.lit(divisor))
  }
}
