package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.unsafe.types.UTF8String

/** Sketch UDAFs — the HLL and KMV distinct sketches of [[graft.ops.Sketch]]
  * as native Catalyst aggregate functions (`TypedImperativeAggregate`),
  * the one extension type the library's SQL-composition builds could not
  * express: a single-buffer aggregation pass with map-side partial merge,
  * reusable as one-call SQL primitives (`hll_sketch(x, b)` /
  * `kmv_sketch(x, k)`) plus the state-merging unions (`hll_merge` /
  * `kmv_union`) that fold persisted per-group sketches without rescanning
  * — the DataSketches sketch/union API shape (Apache DataSketches —
  * public design; implementation here is original).
  *
  * Parity contract: the hash is EXACTLY the library's house 60-bit md5
  * rule (`Sketch.h60` = first 15 hex chars of `md5(cast(x AS STRING))`
  * read base-16), computed here as the top 60 bits of the digest's first
  * 8 bytes — so sketches built by these UDAFs are bit-identical to the
  * SQL-composed register/k-min builds and the existing DuckDB oracles
  * replay them verbatim. Callers pass the input pre-cast to string so
  * the cast semantics stay visible in the query (and identical between
  * engines).
  *
  * Determinism/mergeability: HLL state is a register max (commutative,
  * idempotent), KMV state a bounded distinct-min set (commutative,
  * idempotent) — both partition-order invariant, which SketchAggSpec
  * proves by re-running repartitioned. At 100 TB each task reduces its
  * split to m bytes / k longs before anything shuffles (the classic
  * partial-aggregation contract `TypedImperativeAggregate` exists for).
  */
object SketchAggUtil {

  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("MD5"))

  /** First 60 bits of md5(s) — identical to
    * `conv(substring(md5(s), 1, 15), 16, 10)`: 15 hex chars = the top 60
    * bits of the first 8 digest bytes read big-endian.
    */
  def h60(s: UTF8String): Long = {
    val d = md5.get()
    d.reset()
    val dig = d.digest(s.getBytes)
    val be = ((dig(0) & 0xFFL) << 56) | ((dig(1) & 0xFFL) << 48) |
      ((dig(2) & 0xFFL) << 40) | ((dig(3) & 0xFFL) << 32) |
      ((dig(4) & 0xFFL) << 24) | ((dig(5) & 0xFFL) << 16) |
      ((dig(6) & 0xFFL) << 8) | (dig(7) & 0xFFL)
    be >>> 4
  }

  /** ρ of the post-register hash bits: 53 − bitLength(w), 53 when w = 0 —
    * the JVM twin of `CASE WHEN w > 0 THEN 53 - length(bin(w)) ELSE 53`.
    */
  def rho(w: Long): Int =
    if (w > 0) 53 - (64 - java.lang.Long.numberOfLeadingZeros(w)) else 53
}

/** `hll_sketch(x_str, b)` → the 2^b HLL registers as array<int> —
  * bit-identical to [[graft.ops.Sketch.dayRegisters]]'s grouped max (a
  * register array is COMPLETE: untouched registers hold 0).
  */
case class HllSketchAgg(child: Expression, b: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  private val m = 1 << b

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = SketchAggUtil.h60(v.asInstanceOf[UTF8String])
      val reg = (h % m).toInt
      val r = SketchAggUtil.rho(h >>> b)
      if (r > buf(reg)) buf(reg) = r.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (other(i) > a(i)) a(i) = other(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    val out = new Array[Int](m)
    var i = 0
    while (i < m) { out(i) = buf(i); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hll_sketch requires a string input (cast explicitly), got ${other.sql}")
  }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "hll_sketch"
  override def withNewMutableAggBufferOffset(n: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): HllSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): HllSketchAgg =
    copy(child = newChild)
}

/** `hll_merge(registers, b)` — element-wise max over register arrays:
  * folds persisted per-group HLL states into a coarser grain without
  * touching the raw keys.
  */
case class HllUnionAgg(child: Expression, b: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  private val m = 1 << b

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == m,
        s"hll_merge expects 2^$b registers, got ${arr.numElements()}")
      var i = 0
      while (i < m) {
        // a null register contributes nothing (max with 0) — reading it
        // unguarded would return garbage from the null slot
        if (!arr.isNullAt(i)) {
          val mj = arr.getInt(i)
          if (mj > buf(i)) buf(i) = mj.toByte
        }
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (other(i) > a(i)) a(i) = other(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    val out = new Array[Int](m)
    var i = 0
    while (i < m) { out(i) = buf(i); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hll_merge requires array<int> registers, got ${other.sql}")
  }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "hll_merge"
  override def withNewMutableAggBufferOffset(n: Int): HllUnionAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): HllUnionAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): HllUnionAgg =
    copy(child = newChild)
}

/** Bounded distinct-k-min buffer shared by the KMV build and union. */
final class KminBuffer(val k: Int) {
  val set = new java.util.TreeSet[java.lang.Long]()
  def add(h: Long): Unit = {
    if (set.size < k) set.add(h)
    else if (h < set.last) { if (set.add(h)) set.pollLast() }
  }
}

/** `kmv_sketch(x_str, k)` → the k smallest distinct 60-bit hashes as an
  * ascending array<long> — the KMV state of
  * [[graft.ops.Sketch.kmvDistinctUsers]], built in one pass (duplicates
  * absorbed by the distinct-min set, no pre-distinct needed).
  */
case class KmvSketchAgg(child: Expression, k: Int,
                        mutableAggBufferOffset: Int = 0,
                        inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KminBuffer] with UnaryLike[Expression] {

  override def createAggregationBuffer(): KminBuffer = new KminBuffer(k)

  override def update(buf: KminBuffer, input: InternalRow): KminBuffer = {
    val v = child.eval(input)
    if (v != null) buf.add(SketchAggUtil.h60(v.asInstanceOf[UTF8String]))
    buf
  }

  override def merge(a: KminBuffer, other: KminBuffer): KminBuffer = {
    val it = other.set.iterator()
    while (it.hasNext) a.add(it.next())
    a
  }

  override def eval(buf: KminBuffer): Any = {
    val out = new Array[Long](buf.set.size)
    val it = buf.set.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: KminBuffer): Array[Byte] =
    KmvSerde.ser(buf)
  override def deserialize(bytes: Array[Byte]): KminBuffer =
    KmvSerde.de(bytes, k)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kmv_sketch requires a string input (cast explicitly), got ${other.sql}")
  }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kmv_sketch"
  override def withNewMutableAggBufferOffset(n: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): KmvSketchAgg =
    copy(child = newChild)
}

/** `kmv_union(mins, k)` — k smallest of the union of k-min states (every
  * global minimum lives in its own input's k-min set, so the union is
  * exact — see [[graft.ops.Sketch.kmvDistinctUsers]]'s merge proof).
  */
case class KmvUnionAgg(child: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KminBuffer] with UnaryLike[Expression] {

  override def createAggregationBuffer(): KminBuffer = new KminBuffer(k)

  override def update(buf: KminBuffer, input: InternalRow): KminBuffer = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      // skip null elements: unguarded getLong reads 0 from a null slot,
      // which would inject a spurious global minimum into the k-min set
      while (i < arr.numElements()) {
        if (!arr.isNullAt(i)) buf.add(arr.getLong(i))
        i += 1
      }
    }
    buf
  }

  override def merge(a: KminBuffer, other: KminBuffer): KminBuffer = {
    val it = other.set.iterator()
    while (it.hasNext) a.add(it.next())
    a
  }

  override def eval(buf: KminBuffer): Any = {
    val out = new Array[Long](buf.set.size)
    val it = buf.set.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: KminBuffer): Array[Byte] = KmvSerde.ser(buf)
  override def deserialize(bytes: Array[Byte]): KminBuffer = KmvSerde.de(bytes, k)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"kmv_union requires array<bigint> k-mins, got ${other.sql}")
  }

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kmv_union"
  override def withNewMutableAggBufferOffset(n: Int): KmvUnionAgg =
    copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): KmvUnionAgg =
    copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(newChild: Expression): KmvUnionAgg =
    copy(child = newChild)
}

private[functions] object KmvSerde {
  def ser(buf: KminBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream(8 + buf.set.size * 8)
    val out = new DataOutputStream(bos)
    out.writeInt(buf.set.size)
    val it = buf.set.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush()
    bos.toByteArray
  }
  def de(bytes: Array[Byte], k: Int): KminBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new KminBuffer(k)
    var i = 0
    while (i < n) { buf.set.add(in.readLong()); i += 1 }
    buf
  }
}

object SketchAggFunctions {

  private def litInt(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn parameter must be an integer literal, got $other")
  }

  private def reg(spark: SparkSession, name: String, clazz: Class[_],
                  builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name),
      builder)

  /** The four (name, expression class, builder) triples — shared by the
    * per-session [[register]] and the [[GraftExtensions]] injection so
    * the two entry points can never drift apart.
    */
  private[functions] val injectables: Seq[(String, Class[_], Seq[Expression] => Expression)] = Seq(
    ("hll_sketch", classOf[HllSketchAgg], {
      case Seq(c, b) => HllSketchAgg(c, litInt(b, "hll_sketch"))
      case other => throw new IllegalArgumentException(
        s"hll_sketch expects (x, b), got ${other.size} args")
    }: Seq[Expression] => Expression),
    ("hll_merge", classOf[HllUnionAgg], {
      case Seq(c, b) => HllUnionAgg(c, litInt(b, "hll_merge"))
      case other => throw new IllegalArgumentException(
        s"hll_merge expects (registers, b), got ${other.size} args")
    }: Seq[Expression] => Expression),
    ("kmv_sketch", classOf[KmvSketchAgg], {
      case Seq(c, k) => KmvSketchAgg(c, litInt(k, "kmv_sketch"))
      case other => throw new IllegalArgumentException(
        s"kmv_sketch expects (x, k), got ${other.size} args")
    }: Seq[Expression] => Expression),
    ("kmv_union", classOf[KmvUnionAgg], {
      case Seq(c, k) => KmvUnionAgg(c, litInt(k, "kmv_union"))
      case other => throw new IllegalArgumentException(
        s"kmv_union expects (mins, k), got ${other.size} args")
    }: Seq[Expression] => Expression))

  /** Idempotent, parameter-independent registration of all four sketch
    * aggregates (b/k are literal call-site arguments). Skips if already
    * present — the builders carry no state, so first-wins is safe.
    */
  def register(spark: SparkSession): Unit = if (!spark.sessionState
      .functionRegistry.functionExists(FunctionIdentifier("hll_sketch"))) {
    injectables.foreach { case (name, clazz, b) => reg(spark, name, clazz, b) }
  }

  def hllSketch(spark: SparkSession, c: Column, b: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("hll_sketch", c,
      org.apache.spark.sql.functions.lit(b))
  }

  def hllUnion(spark: SparkSession, c: Column, b: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("hll_merge", c,
      org.apache.spark.sql.functions.lit(b))
  }

  def kmvSketch(spark: SparkSession, c: Column, k: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("kmv_sketch", c,
      org.apache.spark.sql.functions.lit(k))
  }

  def kmvUnion(spark: SparkSession, c: Column, k: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function("kmv_union", c,
      org.apache.spark.sql.functions.lit(k))
  }
}
