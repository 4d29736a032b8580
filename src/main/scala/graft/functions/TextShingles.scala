package graft.functions

import java.util.LinkedHashSet

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel shared by interpreted eval and generated code. */
object NgramHelper {

  /** Distinct character n-grams (by code point, first-occurrence order —
    * the same result as `array_distinct(transform(sequence(...), i =>
    * substr(i, n)))`, including the short-document rule: a document
    * shorter than n code points yields its whole text as the single
    * shingle).
    */
  def charNgrams(text: UTF8String, n: Int): ArrayData = {
    val s = text.toString
    val cps = s.codePoints().toArray()
    val m = cps.length
    if (m < n) {
      new GenericArrayData(Array[Any](text.copy()))
    } else {
      val seen = new LinkedHashSet[String]()
      var i = 0
      while (i <= m - n) {
        seen.add(new String(cps, i, n))
        i += 1
      }
      val out = new Array[Any](seen.size())
      val it = seen.iterator()
      var j = 0
      while (it.hasNext) {
        out(j) = UTF8String.fromString(it.next())
        j += 1
      }
      new GenericArrayData(out)
    }
  }

  /** Distinct word n-gram shingles, replicating EXACTLY
    * `array_distinct(transform(sequence(0, size(ts)-n), i =>
    * array_join(slice(ts, i+1, n), " ")))` over
    * `ts = split(lower(trim(text)), "\s+")`, including the
    * short-document rule (fewer than n words → the whole token list
    * joined as one shingle). One pass per document: the HOF chain
    * re-evaluates the captured tokenize expression per lambda element
    * — O(words²) re-splits per row (measured seconds over sf0.1 where
    * this kernel is noise). Uses the same UTF8String trim/toLowerCase
    * as Spark's StringTrim/Lower and `split(regex, -1)` to match
    * StringSplit's default limit.
    */
  def wordNgrams(text: UTF8String, n: Int): ArrayData = {
    val ws = text.trim().toLowerCase().toString.split("\\s+", -1)
    if (ws.length < n) {
      new GenericArrayData(Array[Any](UTF8String.fromString(ws.mkString(" "))))
    } else {
      val seen = new LinkedHashSet[String]()
      var i = 0
      while (i <= ws.length - n) {
        val sb = new java.lang.StringBuilder(ws(i))
        var j = i + 1
        while (j < i + n) {
          sb.append(' ').append(ws(j))
          j += 1
        }
        seen.add(sb.toString)
        i += 1
      }
      val out = new Array[Any](seen.size())
      val it = seen.iterator()
      var j = 0
      while (it.hasNext) {
        out(j) = UTF8String.fromString(it.next())
        j += 1
      }
      new GenericArrayData(out)
    }
  }

  /** ALL word n-gram occurrences in order (non-distinct) — the
    * occurrence-statistics sibling of [[wordNgrams]]: frequency counting
    * (BPE pair merges, occurrence-weighted boilerplate) needs every
    * occurrence, where dedup shingling wants the distinct set. No
    * short-document whole-text fallback: a document with fewer than n
    * words simply has no n-gram occurrences (empty array).
    */
  def wordNgramsAll(text: UTF8String, n: Int): ArrayData = {
    val ws = text.trim().toLowerCase().toString.split("\\s+", -1)
    if (ws.length < n) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](ws.length - n + 1)
      var i = 0
      while (i <= ws.length - n) {
        val sb = new java.lang.StringBuilder(ws(i))
        var j = i + 1
        while (j < i + n) {
          sb.append(' ').append(ws(j))
          j += 1
        }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    }
  }
}

/** Distinct character n-gram shingles of a string as a codegen'd Catalyst
  * expression — one pass per document instead of the interpreted
  * `transform(sequence(...), i => substr(...))` higher-order chain
  * (CodegenFallback, re-evaluated per branch), which dominated the n-gram
  * dedup runtime. Equivalence with the HOF formulation is pinned in
  * HashFunctionsSpec.
  */
case class CharNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, s"n must be positive, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "char_ngrams"

  override def nullSafeEval(input: Any): Any =
    NgramHelper.charNgrams(input.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      s"""
         |${ev.value} = graft.functions.NgramHelper.charNgrams($s, $n);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Distinct word n-gram shingles (tokenize + slide + join) as a codegen'd
  * expression — same motivation and contract as [[CharNgrams]]; the
  * equivalent HOF formulation lives on as `Dedup.wordShinglesBuiltin`,
  * equivalence pinned in HashFunctionsSpec.
  */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, s"n must be positive, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_ngrams"

  override def nullSafeEval(input: Any): Any =
    NgramHelper.wordNgrams(input.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      s"""
         |${ev.value} = graft.functions.NgramHelper.wordNgrams($s, $n);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Every word n-gram occurrence (non-distinct, in order) — see
  * [[NgramHelper.wordNgramsAll]]. Codegen'd like its siblings.
  */
case class WordNgramsAll(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, s"n must be positive, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string, got ${other.simpleString}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_ngrams_all"

  override def nullSafeEval(input: Any): Any =
    NgramHelper.wordNgramsAll(input.asInstanceOf[UTF8String], n)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      s"""
         |${ev.value} = graft.functions.NgramHelper.wordNgramsAll($s, $n);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextShingles {
  def charNgrams(text: Column, n: Int): Column =
    GraftShims.toColumn(CharNgrams(GraftShims.toExpression(text), n))

  def wordNgrams(text: Column, n: Int): Column =
    GraftShims.toColumn(WordNgrams(GraftShims.toExpression(text), n))

  def wordNgramsAll(text: Column, n: Int): Column =
    GraftShims.toColumn(WordNgramsAll(GraftShims.toExpression(text), n))
}
