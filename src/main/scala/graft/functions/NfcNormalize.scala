package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst NFC Unicode normalization (SURVEY.md §7.2 preference
  * order (b): a custom Expression where Spark has no builtin — there is
  * no `normalize` in org.apache.spark.sql.functions). Web text arrives
  * in mixed normalization (decomposed e + U+0301 vs precomposed é,
  * compatibility singletons like U+212B ANGSTROM SIGN): without a
  * canonical form, exact dedup, shingle hashing and token counts treat
  * visually identical strings as distinct.
  *
  * Hot-path design: stays inside WholeStageCodegen (no UDF
  * serialization, inline null handling) and fast-paths the common case —
  * `Normalizer.isNormalized` is a scan without allocation, so
  * already-NFC text (the vast majority of a web corpus) returns the
  * input UTF8String untouched; only denormalized rows pay the
  * String round-trip.
  *
  * Semantics are the Unicode NFC spec, so engines agree byte-for-byte
  * (the oracle twin is DuckDB's `nfc_normalize`). */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(s: Any): Any =
    NfcNormalize.nfc(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.NfcNormalize.nfc($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {

  /** Static entry the generated code calls; allocation-free when the
    * input is already NFC. */
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  private[functions] val entry
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_nfc"),
    new ExpressionInfo(classOf[NfcNormalize].getName, null, "graft_nfc",
      "_FUNC_(s) - Unicode NFC normalization of a string", ""),
    (children: Seq[Expression]) => NfcNormalize(children.head))

  /** Column-API form; requires GraftExtensions registration. */
  def nfcCol(s: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_nfc", s)
}
