package graft.functions

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-word kernels for BPE (byte-pair-encoding) vocabulary induction.
  *
  * Both are inherently SEQUENTIAL over a word's symbols (a merge at
  * position i consumes position i+1, so the next decision depends on the
  * previous one — the left-to-right, non-overlapping rule), which no
  * composition of higher-order Column functions expresses. Per the
  * custom-operator preference order they are native Catalyst expressions;
  * they carry data-dependent loops with early exits, so they use the
  * interpreted eval path (CodegenFallback) rather than generated code —
  * the per-row cost is a few short string scans, far off the engine's
  * hot path (the corpus-wide pair COUNTING around them is ordinary
  * codegen'd explode/aggregate work).
  */

/** One training step: replace every non-overlapping left-to-right
  * occurrence of the adjacent pair (`leftSym`,`rightSym`) in the symbol
  * array with their concatenation. `[a a a]` with pair (a,a) → `[aa a]`,
  * exactly the original BPE rule (Sennrich et al., ACL 2016).
  */
case class BpeMergePair(child: Expression, leftSym: String, rightSym: String)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_merge_pair"

  @transient private lazy val l = UTF8String.fromString(leftSym)
  @transient private lazy val r = UTF8String.fromString(rightSym)
  @transient private lazy val lr = UTF8String.fromString(leftSym + rightSym)

  override protected def nullSafeEval(input: Any): Any = {
    val in = input.asInstanceOf[ArrayData]
    val n = in.numElements()
    val out = new ArrayBuffer[UTF8String](n)
    var i = 0
    while (i < n) {
      val cur = in.getUTF8String(i)
      if (i + 1 < n && l.equals(cur) && r.equals(in.getUTF8String(i + 1))) {
        out += lr
        i += 2
      } else {
        out += cur
        i += 1
      }
    }
    new GenericArrayData(out.toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Encode one word with a learned merge table: repeatedly find the
  * LOWEST-RANK adjacent pair present and merge all its occurrences
  * (left-to-right), until no ranked pair remains — the standard BPE
  * segmenter. Input is the word string; output its subword array.
  */
case class BpeEncodeWord(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_encode"

  @transient private lazy val rank: Map[(String, String), Int] =
    merges.zipWithIndex.toMap

  override protected def nullSafeEval(input: Any): Any = {
    val word = input.asInstanceOf[UTF8String].toString
    // split by CODE POINTS, not UTF-16 units — `split(word, "")` in the
    // distributed trainer never breaks a surrogate pair, and neither may
    // the encoder (a lone surrogate would corrupt to '?' on re-encode)
    var syms: ArrayBuffer[String] = ArrayBuffer.from(
      word.codePoints().toArray.map(cp => new String(Character.toChars(cp))))
    var done = syms.length < 2
    while (!done) {
      // lowest-rank adjacent pair present in the current segmentation
      var best = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        rank.get((syms(i), syms(i + 1))).foreach(rk =>
          if (rk < best) best = rk)
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val (bl, br) = merges(best)
        val merged = new ArrayBuffer[String](syms.length)
        var j = 0
        while (j < syms.length) {
          if (j + 1 < syms.length && syms(j) == bl && syms(j + 1) == br) {
            merged += bl + br
            j += 2
          } else {
            merged += syms(j)
            j += 1
          }
        }
        syms = merged
        done = syms.length < 2
      }
    }
    new GenericArrayData(syms.map(UTF8String.fromString).toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
