package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization (canonical composition) as a native Catalyst
  * expression — the first transform of every real text-cleaning pipeline:
  * crawled text arrives with the same glyph in multiple byte encodings
  * ("é" as U+00E9 vs "e"+U+0301), and every downstream exact-dedup
  * fingerprint, shingle, and token count silently fractures until the
  * corpus is on one canonical form.
  *
  * Same design rationale as [[WinnowFingerprint]]: a custom `Expression`
  * (not a UDF) keeps the projection inside whole-stage codegen and off
  * the encoder boundary. The kernel adds an ASCII fast path — NFC is the
  * identity on pure-ASCII strings, and `UTF8String` exposes the bytes, so
  * the overwhelmingly-ASCII common case never materializes a
  * `java.lang.String` at all; only strings containing a non-ASCII byte
  * pay the JDK `Normalizer` round-trip (public Unicode algorithm, UAX
  * #15). DuckDB ships the identical function (`nfc_normalize`), which is
  * what makes the operator oracle-able end-to-end.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize requires a string argument, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    NfcUtil.nfc(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcUtil.nfc($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)

  override def prettyName: String = "nfc_normalize"
}

/** Normalization core, static so generated Java can call it directly. */
object NfcUtil {

  /** NFC of a UTF8String; returns the input object untouched when every
    * byte is ASCII (high bit clear) — NFC is the identity there and the
    * scan is branch-predictable, so the fast path costs one pass over
    * the bytes and zero allocation.
    */
  def nfc(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n) {
      if (s.getByte(i) < 0) ascii = false
      i += 1
    }
    if (ascii) s
    else {
      val str = s.toString
      val norm = java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC)
      if (norm.equals(str)) s else UTF8String.fromString(norm)
    }
  }
}

object NfcFunctions {

  private val info = new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize")

  private def builder(args: Seq[Expression]): Expression = args match {
    case Seq(c) => NfcNormalize(c)
    case other => throw new IllegalArgumentException(
      s"nfc_normalize expects 1 argument, got ${other.size}")
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("nfc_normalize"), info, builder _)

  /** Column-API entry (via the registry + call_function, keeping off
    * Spark's private Column internals — the [[GraftFunctions]] pattern).
    */
  def nfcNormalize(spark: SparkSession, c: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("nfc_normalize", c)
  }
}
