package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.{Column, SparkSessionExtensions}

/** Native Catalyst cosine-similarity over two array<float> columns, with
  * whole-stage codegen (SURVEY.md §7.2: the optional custom Expression
  * for hot scalar paths — preference order (b) of the operator-mapping
  * rules). Semantics match Similarity.cosineExpr exactly: dot over the
  * zipped prefix, norms over each full array, plain double division
  * (0-norm → NaN/Infinity, same as the higher-order-function form).
  *
  * vs the HOF form: one fused loop, no per-element lambda closure
  * allocation, stays inside WholeStageCodegen — the 100 TB hot path for
  * embedding dedup / ANN re-rank. */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements(); val nb = b.numElements()
    val n = math.min(na, nb)
    var dot = 0.0; var sa = 0.0; var sb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; sa += x * x; sb += y * y
      i += 1
    }
    while (i < na) { val x = a.getFloat(i).toDouble; sa += x * x; i += 1 }
    i = n
    while (i < nb) { val y = b.getFloat(i).toDouble; sb += y * y; i += 1 }
    dot / (math.sqrt(sa) * math.sqrt(sb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val dot = ctx.freshName("dot")
      val sa = ctx.freshName("sa")
      val sb = ctx.freshName("sb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
        |final int $na = $a.numElements();
        |final int $nb = $b.numElements();
        |final int $n = Math.min($na, $nb);
        |double $dot = 0.0, $sa = 0.0, $sb = 0.0;
        |int $i = 0;
        |for (; $i < $n; $i++) {
        |  final double $x = (double) $a.getFloat($i);
        |  final double $y = (double) $b.getFloat($i);
        |  $dot += $x * $y; $sa += $x * $x; $sb += $y * $y;
        |}
        |for (; $i < $na; $i++) { final double $x = (double) $a.getFloat($i); $sa += $x * $x; }
        |for ($i = $n; $i < $nb; $i++) { final double $y = (double) $b.getFloat($i); $sb += $y * $y; }
        |${ev.value} = $dot / (Math.sqrt($sa) * Math.sqrt($sb));
      """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Session wiring for the native functions: either
  * `spark.sql.extensions=graft.functions.GraftExtensions` at session
  * build, or `GraftExtensions.register(spark)` on a live session. SQL
  * name: `graft_cosine(a, b)`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.cosineEntry)
    ext.injectFunction(NfcNormalize.entry)
    ext.injectFunction(BottomK.entry)
    ext.injectFunction(LevenshteinBounded.entry)
  }
}

object GraftExtensions {
  private[functions] val cosineEntry
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("graft_cosine"),
    new ExpressionInfo(classOf[CosineSim].getName, null, "graft_cosine",
      "_FUNC_(a, b) - cosine similarity of two float arrays", ""),
    (children: Seq[Expression]) => CosineSim(children(0), children(1)))

  /** Imperative registration on an existing session (tests, REPL). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    for ((id, info, builder) <- Seq(cosineEntry, NfcNormalize.entry,
        BottomK.entry, LevenshteinBounded.entry))
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
  }

  /** Column-API form; requires `register(spark)` (or the extensions
    * config) to have wired the function into the session registry. */
  def cosine(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_cosine", a, b)
}
