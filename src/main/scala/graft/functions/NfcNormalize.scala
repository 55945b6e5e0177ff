package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `nfc_normalize(text)` — Unicode NFC (canonical composition) of a string.
  *
  * Spark has no builtin normalizer, yet NFC is the first step of any
  * web-scale text-cleaning pipeline: crawled corpora mix precomposed and
  * combining-mark encodings of the same grapheme ("é" vs "e"+U+0301), and
  * every downstream equality — exact dedup fingerprints, shingles, token
  * counts, vocabulary — silently fractures unless the corpus is normalized
  * first. Running it as a codegen'd expression keeps it in the scan stage's
  * WholeStageCodegen span: normalization cost scales with bytes scanned and
  * adds no shuffle, which is the only acceptable shape at 100 TB.
  *
  * Fast path: `Normalizer.isNormalized` is a cheap scan (true for all-ASCII
  * and most already-composed text — the overwhelming majority of a real
  * corpus), in which case the input UTF8String is returned as-is with zero
  * allocation; only rows that actually need composing pay the
  * String-roundtrip cost.
  *
  * Cross-engine contract: NFC is a versioned-but-stable Unicode algorithm;
  * DuckDB's `nfc_normalize` produces identical output, which is what the
  * q103 oracle gates on.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects string, got $other")
  }

  override def dataType: DataType = StringType

  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(input: Any): Any =
    NfcNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NfcNormalize.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {

  /** Static kernel shared by eval and generated code. */
  def compute(s: UTF8String): UTF8String = {
    // numBytes == numChars iff every code point is single-byte UTF-8, i.e.
    // pure ASCII — NFC is the identity there, no String allocation at all.
    if (s.numBytes == s.numChars) s
    else {
      val str = s.toString
      if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
      else UTF8String.fromString(
        java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
    }
  }
}
