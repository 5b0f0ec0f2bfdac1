package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graft.ColumnBridge.{column, expression}

/** Byte-pair-encoding expressions: the per-row imperative tier of
  * [[graft.functions.Bpe]] (tokenizer training / subword segmentation for
  * a training-data pipeline).
  *
  * Both are single-pass tight loops over small per-row arrays — the same
  * Catalyst tier as `shingle_minhash`/`repetition_signals` (custom scalar
  * Expression before any physical-operator machinery, SURVEY.md §7.3).
  */
object BpeExpressions {

  /** One BPE merge step over a symbol array: every non-overlapping
    * left-to-right occurrence of adjacent `(lhs, rhs)` becomes the single
    * symbol `lhs+rhs`. The per-iteration vocabulary transform of the
    * trainer. */
  case class BpeMergePair(child: Expression, lhs: String, rhs: String)
    extends UnaryExpression with CodegenFallback {
    // null elements pass through untouched, so element nullability is
    // inherited — declaring containsNull=false here would lie to codegen
    // for nullable-element inputs
    override def dataType: DataType = child.dataType match {
      case ArrayType(_, n) => ArrayType(StringType, containsNull = n)
      case _ => ArrayType(StringType, containsNull = false)
    }
    override def prettyName: String = "bpe_merge_pair"
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs array<string>, got ${other.simpleString(10)}")
    }
    private lazy val lhsU = UTF8String.fromString(lhs)
    private lazy val rhsU = UTF8String.fromString(rhs)
    private lazy val mergedU = UTF8String.fromString(lhs + rhs)

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val out = new Array[Any](n)
      var i = 0
      var m = 0
      while (i < n) {
        val s = arr.getUTF8String(i)
        if (i + 1 < n && lhsU == s && rhsU == arr.getUTF8String(i + 1)) {
          out(m) = mergedU; i += 2
        } else {
          out(m) = s; i += 1
        }
        m += 1
      }
      new GenericArrayData(java.util.Arrays.copyOf(
        out.asInstanceOf[Array[AnyRef]], m))
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Full BPE segmentation of a text under an ordered merge list: split on
    * whitespace, expand each word to character symbols + the end-of-word
    * marker, then repeatedly merge the present adjacent pair with the
    * LOWEST merge rank until none applies — equivalent to applying the
    * merges one-by-one in rank order (the standard rank-map formulation,
    * O(len²) worst case per word instead of O(numMerges × len), which is
    * what makes a 30k-merge vocabulary affordable per row). Emits the
    * concatenated subword tokens of all words. */
  case class BpeEncode(child: Expression, merges: Seq[(String, String)], endOfWord: String)
    extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "bpe_encode"
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs string, got ${other.simpleString(10)}")
    }
    // rank lookup built once per task, not per row
    private lazy val rank: java.util.HashMap[(UTF8String, UTF8String), Integer] = {
      val m = new java.util.HashMap[(UTF8String, UTF8String), Integer]()
      merges.zipWithIndex.foreach { case ((a, b), r) =>
        m.putIfAbsent((UTF8String.fromString(a), UTF8String.fromString(b)), r)
      }
      m
    }
    private lazy val eowU = UTF8String.fromString(endOfWord)

    // EXACTLY the regex \s class Bpe.vocabulary splits on at train time
    // ([ \t\n\x0B\f\r], ASCII-only). Character.isWhitespace would also split
    // on Unicode separators (u2028, u2003, u001C-u001F) that training
    // treats as word characters - merges learned over such "words" would
    // then never apply and segmentation would diverge from training.
    private def isSplitWs(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

    override def nullSafeEval(input: Any): Any = {
      val text = input.asInstanceOf[UTF8String].toString
      val out = scala.collection.mutable.ArrayBuffer.empty[Any]
      var start = 0
      val len = text.length
      while (start < len) {
        while (start < len && isSplitWs(text.charAt(start))) start += 1
        var end = start
        while (end < len && !isSplitWs(text.charAt(end))) end += 1
        if (end > start) segmentWord(text, start, end, out)
        start = end
      }
      new GenericArrayData(out.toArray)
    }

    private def segmentWord(text: String, from: Int, until: Int,
                            out: scala.collection.mutable.ArrayBuffer[Any]): Unit = {
      // symbols = one UTF-16-aware char each (surrogate pairs stay whole) + </w>
      var syms = {
        val b = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
        var i = from
        while (i < until) {
          val cp = text.codePointAt(i)
          val w = Character.charCount(cp)
          b += UTF8String.fromString(text.substring(i, i + w))
          i += w
        }
        b += eowU
        b
      }
      var done = false
      while (!done && syms.length > 1) {
        // find the adjacent pair with the lowest merge rank
        var bestRank = Int.MaxValue
        var bestAt = -1
        var i = 0
        while (i + 1 < syms.length) {
          val r = rank.get((syms(i), syms(i + 1)))
          if (r != null && r < bestRank) { bestRank = r; bestAt = i }
          i += 1
        }
        if (bestAt < 0) done = true
        else {
          // merge ALL occurrences of that pair, left to right
          val a = syms(bestAt)
          val b = syms(bestAt + 1)
          val merged = UTF8String.concat(a, b)
          val next = scala.collection.mutable.ArrayBuffer.empty[UTF8String]
          var j = 0
          while (j < syms.length) {
            if (j + 1 < syms.length && (syms(j) == a) && (syms(j + 1) == b)) {
              next += merged; j += 2
            } else { next += syms(j); j += 1 }
          }
          syms = next
        }
      }
      out ++= syms
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def mergePair(syms: Column, lhs: String, rhs: String): Column =
    column(BpeMergePair(expression(syms), lhs, rhs))

  def encode(text: Column, merges: Seq[(String, String)], endOfWord: String): Column =
    column(BpeEncode(expression(text), merges, endOfWord))
}
