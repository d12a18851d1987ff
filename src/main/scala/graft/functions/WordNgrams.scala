package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `word_ngrams(words, n)` — a table-generating function (Catalyst
  * `Generator`) emitting one row per word n-gram of an `array<string>`,
  * joined with single spaces. This is the whole-operator form of the
  * `explode(transform(sequence(0, size(ws) − n), i → concat_ws(...)))`
  * chain the dedup/decontamination stack was built on (SURVEY §8's
  * dedup rationale: 3-shingles for MinHash in `ops/Dedup.shingles`,
  * word n-grams for the decontamination leakage checks in
  * `ops/Contamination`): identical output, but the generator emits n-grams
  * one at a time straight from the word array — the chain materializes
  * a `sequence` index array plus a transformed n-gram array per
  * document BEFORE exploding, which for a w-word document allocates
  * O(w) intermediate array cells and O(w) eagerly-built n-gram strings
  * per row even when downstream operators (a `distinct`'s partial
  * aggregate) would have consumed them incrementally.
  *
  * Null handling matches the chain it replaces: a NULL word inside a
  * window is skipped by `concat_ws` semantics; a NULL array produces no
  * rows; a document shorter than `n` produces no rows. `n` must be a
  * positive literal — it shapes every emitted row, so a per-row `n` has
  * no sane generator semantics.
  */
case class WordNgrams(words: Expression, n: Expression)
  extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(words, n)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): WordNgrams =
    copy(words = newChildren(0), n = newChildren(1))

  override def elementSchema: StructType =
    StructType(StructField("ngram", StringType, nullable = false) :: Nil)

  override def checkInputDataTypes(): TypeCheckResult = words.dataType match {
    case ArrayType(StringType, _) =>
      if (!n.foldable || !n.dataType.isInstanceOf[IntegerType])
        TypeCheckResult.TypeCheckFailure(
          "word_ngrams requires a literal INT n")
      else if (n.eval() == null || n.eval().asInstanceOf[Int] < 1)
        TypeCheckResult.TypeCheckFailure(
          "word_ngrams requires n >= 1")
      else TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_ngrams requires array<string> words, got ${other.sql}")
  }

  private lazy val nVal: Int = n.eval().asInstanceOf[Int]
  private val sep = UTF8String.fromString(" ")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = words.eval(input)
    if (v == null) Iterator.empty
    else {
      val arr = v.asInstanceOf[ArrayData]
      val total = arr.numElements() - nVal + 1
      if (total <= 0) Iterator.empty
      else new Iterator[InternalRow] {
        private var i = 0
        override def hasNext: Boolean = i < total
        override def next(): InternalRow = {
          val parts = new Array[UTF8String](nVal)
          var j = 0
          while (j < nVal) {
            parts(j) = if (arr.isNullAt(i + j)) null
            else arr.getUTF8String(i + j)
            j += 1
          }
          i += 1
          InternalRow(UTF8String.concatWs(sep, parts: _*))
        }
      }
    }
  }
}

object WordNgramFunctions {

  private[graft] val info = new ExpressionInfo(
    classOf[WordNgrams].getName, "word_ngrams")

  private[graft] def builder(args: Seq[Expression]): Expression = args match {
    case Seq(w, n) => WordNgrams(w, n)
    case other => throw new IllegalArgumentException(
      s"word_ngrams expects 2 arguments, got ${other.size}")
  }

  def register(spark: SparkSession): Unit = if (!spark.sessionState
    .functionRegistry.functionExists(FunctionIdentifier("word_ngrams")))
    spark.sessionState.functionRegistry.registerFunction(
      FunctionIdentifier("word_ngrams"), info, builder _)

  /** Column-API entry: rows of n-grams of `words`, one per window. */
  def wordNgrams(spark: SparkSession, words: Column, n: Int): Column = {
    register(spark)
    org.apache.spark.sql.functions.call_function(
      "word_ngrams", words, org.apache.spark.sql.functions.lit(n))
  }
}
