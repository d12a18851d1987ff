package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, StringType}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Codegen'd Bloom-filter membership probe — replaces the library's one
  * remaining Scala UDF (the [[graft.ops.Contamination]] prefilter).
  * Spark's own `BloomFilterMightContain` is optimizer-internal (injected
  * by the runtime-filter rule, not user-callable), so a user-level
  * Bloom prefilter previously needed a UDF: an opaque black box that
  * breaks whole-stage codegen around it and deserializes its closure
  * per task. This expression keeps the probe ON the codegen'd path —
  * the generated code calls a single virtual method on a plan-shipped
  * reference, the same mechanism Spark's internal probe uses.
  *
  * The serialized filter travels as a constructor field (extracted from
  * the binary literal at registry-build time, so analysis sees only the
  * string child), and deserializes lazily ONCE per executor
  * deserialization rather than per row or per task closure. Probe
  * semantics are identical to `BloomFilter.mightContainString`: the
  * UTF-8 bytes of the value are hashed, so filters built by
  * `DataFrameStatFunctions.bloomFilter` over a string column answer
  * exactly as before — no false negatives, result rows unchanged.
  */
case class BloomMightContain(child: Expression, bytes: Array[Byte])
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects a string value, got ${child.dataType}")
  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  /** Called from both interpreted eval and the generated code. */
  def probe(v: UTF8String): Boolean = bloom.mightContainBinary(v.getBytes)

  override protected def nullSafeEval(v: Any): Any =
    probe(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("graftBloomProbe", this,
      classOf[BloomMightContain].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.probe($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomMightContain {

  private val info = new ExpressionInfo(
    classOf[BloomMightContain].getName, "bloom_might_contain")

  private[functions] def builder(args: Seq[Expression]): Expression = args match {
    case Seq(value, bloomLit: Literal)
        if bloomLit.dataType == BinaryType && bloomLit.value != null =>
      BloomMightContain(value, bloomLit.value.asInstanceOf[Array[Byte]])
    case other => throw new IllegalArgumentException(
      "bloom_might_contain expects (value, <binary literal bloom>), got " +
        other.map(_.dataType).mkString(", "))
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("bloom_might_contain"), info, builder _)

  /** Column-API entry: probe `c` against `bloom` (serialized into the
    * call as a binary literal; the registry builder unwraps it).
    */
  def bloomMightContain(spark: SparkSession, c: Column,
                        bloom: BloomFilter): Column = {
    register(spark)
    val baos = new ByteArrayOutputStream()
    bloom.writeTo(baos)
    org.apache.spark.sql.functions.call_function("bloom_might_contain",
      c, org.apache.spark.sql.functions.lit(baos.toByteArray))
  }
}
