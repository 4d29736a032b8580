package graft.functions

import org.apache.spark.sql.{Column, GraftShims}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernel shared by interpreted eval and generated code. */
object TextStatsHelper {

  /** One-pass word/bigram repetition counts over the same tokenization
    * as [[NgramHelper.wordNgrams]] (UTF8String trim + toLowerCase,
    * `split("\\s+", -1)`): total words, distinct words, the most
    * frequent word's occurrence count, total bigrams (n-1, or 0 below
    * 2 words) and distinct bigrams. Counts, not fractions — the caller
    * derives ratios in exact integer→double arithmetic, so an external
    * SQL oracle reproduces them bit-for-bit.
    */
  def repetitionCounts(text: UTF8String): InternalRow = {
    val ws = text.trim().toLowerCase().toString.split("\\s+", -1)
    val n = ws.length
    val counts = new java.util.HashMap[String, Int](n * 2)
    var top = 0
    var i = 0
    while (i < n) {
      val c = counts.merge(ws(i), 1, Integer.sum)
      if (c > top) top = c
      i += 1
    }
    val nB = if (n >= 2) n - 1 else 0
    val bigrams = new java.util.HashSet[String](nB * 2)
    i = 0
    while (i < nB) {
      bigrams.add(ws(i) + " " + ws(i + 1))
      i += 1
    }
    new GenericInternalRow(Array[Any](
      n.toLong, counts.size.toLong, top.toLong, nB.toLong,
      bigrams.size.toLong))
  }
}

/** Word/bigram repetition counts as a codegen'd Catalyst expression —
  * one tokenize pass per document. The higher-order-function
  * formulation ([[graft.operators.TextAnalysis.repetitionSignals]],
  * kept as the equivalence oracle) pays interpreted lambda evaluation
  * per element and re-evaluates the token array once per extracted
  * struct field; this kernel is noise at sf0.1 where the HOF chain
  * measured seconds.
  */
case class RepetitionStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires string, got ${other.simpleString}")
    }

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", LongType, nullable = false),
    StructField("n_distinct_words", LongType, nullable = false),
    StructField("top_count", LongType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false),
    StructField("n_distinct_bigrams", LongType, nullable = false)))
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "repetition_stats"

  override def nullSafeEval(input: Any): Any =
    TextStatsHelper.repetitionCounts(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s => {
      s"""
         |${ev.value} = graft.functions.TextStatsHelper.repetitionCounts($s);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextStats {
  def repetitionStats(text: Column): Column =
    GraftShims.toColumn(RepetitionStats(GraftShims.toExpression(text)))
}
