package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprint (Schleimer/Wilkerson/Aiken, SIGMOD'03 —
  * the MOSS algorithm) as a native Catalyst expression:
  * byte-level k-gram polynomial rolling hashes → per-window minimum
  * (rightmost on ties) → distinct sorted fingerprint set.
  *
  * Guarantees: any shared substring of length ≥ k + w − 1 between two
  * documents contributes at least one shared fingerprint — the
  * containment of fingerprint sets estimates overlap, which is the
  * rolling-hash dedup primitive (complementing MinHash's bag-of-shingles
  * Jaccard).
  *
  * Why a custom `Expression` rather than a UDF: a Scala UDF forces
  * ser/de of the string through the encoder boundary and blocks
  * whole-stage codegen around it; this expression participates in
  * codegen ([[doGenCode]] emits a straight static call on the raw
  * `UTF8String`), is null-safe for free via `UnaryExpression`, and is
  * registrable in the SQL function registry ([[GraftFunctions.register]])
  * so `spark.sql("SELECT winnow_fingerprint(text) …")` works.
  */
case class WinnowFingerprint(child: Expression, k: Int = 12, window: Int = 8)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // a non-string argument becomes a clean analysis error, not a Janino
  // compile failure at execution time (ExpectsInputTypes is unusable
  // outside Spark: AbstractDataType is private[sql])
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprint requires a string argument, got ${child.dataType.sql}")

  override def nullSafeEval(input: Any): Any =
    WinnowUtil.fingerprint(input.asInstanceOf[UTF8String], k, window)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WinnowUtil.fingerprint($c, $k, $window)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprint =
    copy(child = newChild)

  override def prettyName: String = "winnow_fingerprint"
}

/** Hashing core, static so generated Java can call it directly. */
object WinnowUtil {

  private final val Base = 257L

  /** k-gram rolling hashes over the UTF-8 bytes (mod 2^64 arithmetic). */
  def rollingHashes(bytes: Array[Byte], k: Int): Array[Long] = {
    val n = bytes.length - k + 1
    if (n <= 0) return Array.empty
    var pow = 1L // Base^(k-1)
    var i = 1
    while (i < k) { pow *= Base; i += 1 }
    val out = new Array[Long](n)
    var h = 0L
    i = 0
    while (i < k) { h = h * Base + (bytes(i) & 0xFF); i += 1 }
    out(0) = h
    i = 1
    while (i < n) {
      h = (h - (bytes(i - 1) & 0xFF) * pow) * Base + (bytes(i + k - 1) & 0xFF)
      out(i) = h
      i += 1
    }
    out
  }

  /** Winnowing selection: rightmost minimum of each w-window, deduped by
    * position, returned as a sorted distinct ArrayData.
    */
  def fingerprint(s: UTF8String, k: Int, w: Int): ArrayData = {
    val hashes = rollingHashes(s.getBytes, k)
    if (hashes.isEmpty) return new GenericArrayData(Array.empty[Long])
    val selected = scala.collection.mutable.LinkedHashSet.empty[Long]
    var lastPos = -1
    var start = 0
    val windows = math.max(1, hashes.length - w + 1)
    while (start < windows) {
      val end = math.min(start + w, hashes.length)
      var minPos = start
      var i = start
      while (i < end) {
        // unsigned comparison; >= keeps the RIGHTMOST minimum (robust
        // winnowing — stable under prefix edits)
        if (java.lang.Long.compareUnsigned(hashes(i), hashes(minPos)) <= 0) minPos = i
        i += 1
      }
      if (minPos != lastPos) { selected += hashes(minPos); lastPos = minPos }
      start += 1
    }
    val arr = selected.toArray
    java.util.Arrays.sort(arr)
    new GenericArrayData(arr)
  }
}

/** Registration: both the SQL function registry (per-session) and the
  * `SparkSessionExtensions` hook (config
  * `spark.sql.extensions=graft.functions.GraftExtensions`).
  */
object GraftFunctions {

  private val info = new ExpressionInfo(
    classOf[WinnowFingerprint].getName, "winnow_fingerprint")

  private def builder(args: Seq[Expression]): Expression = args match {
    case Seq(c) => WinnowFingerprint(c)
    case other => throw new IllegalArgumentException(
      s"winnow_fingerprint expects 1 argument, got ${other.size}")
  }

  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("winnow_fingerprint"), info, builder _)

  /** Column-API entry (via the registry + call_function, which keeps us
    * off Spark's private Column internals).
    */
  def winnowFingerprint(spark: SparkSession, c: Column): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("winnow_fingerprint", c)
  }
}

/** The one-line plug-in for the whole library
  * (`spark.sql.extensions=graft.functions.GraftExtensions`, or
  * `builder.withExtensions(new GraftExtensions)`): EVERY custom
  * function — scalar expressions and sketch aggregates — plus the
  * top-k planner strategy and its optimizer rewrite, injected at
  * session build so SQL-only users (thriftserver, notebooks) get the
  * full surface without touching the Scala API. The per-object
  * `register` entry points stay for programmatic use; both paths share
  * the same builders, so they cannot drift.
  */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    def fn(name: String, clazz: Class[_],
           builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name), builder))
    fn("winnow_fingerprint", classOf[WinnowFingerprint],
      args => WinnowFingerprint(args.head))
    fn("nfc_normalize", classOf[NfcNormalize],
      args => NfcNormalize(args.head))
    fn("cdc_cuts", classOf[CdcCutPositions], CdcCutFunctions.builder)
    fn("feature_hash", classOf[FeatureHashVector], FeatureHashFunctions.builder)
    fn("bloom_might_contain", classOf[BloomMightContain],
      BloomMightContain.builder)
    fn("word_ngrams", classOf[WordNgrams], WordNgramFunctions.builder)
    SketchAggFunctions.injectables.foreach {
      case (name, clazz, b) => fn(name, clazz, b)
    }
    ext.injectPlannerStrategy(_ => new graft.plans.TopKStrategy)
    ext.injectOptimizerRule(_ => graft.plans.TopKRewriteRule)
  }
}
