package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native per-block code-point sums over a string prefix — the signature
  * kernel of the perceptual block-mean hash
  * ([[graft.ops.Multimodal.phashSignatures]]).
  *
  * Why a custom Catalyst expression (same argument as [[VecDot]]): the
  * built-in formulation
  * `transform(sequence(0, B-1), b -> aggregate(transform(sequence(...),
  * i -> ascii(substring(text, i, 1))), ...))` is nested higher-order
  * lambdas, which Catalyst evaluates INTERPRETED — and each
  * `substring(text, i, 1)` is O(i) on multi-byte UTF-8, making the per-doc
  * cost quadratic in the prefix length. This expression is one codegen'd
  * pass over the code points.
  *
  * Semantics match the lambda form exactly: the k-th "char" is the k-th
  * CODE POINT (Spark's substring counts code points; `ascii` returns the
  * code point — both engines agree on CJK), block b sums code points
  * [b·len, (b+1)·len), and the scan stops at blocks·len code points or the
  * end of the string, whichever is first (missing positions contribute 0,
  * exactly like `ascii(substring(text, i, 1))` = 0 past the end).
  */
case class CharBlockSums(child: Expression, blocks: Int, blockLen: Int)
    extends UnaryExpression {

  require(blocks > 0 && blockLen > 0, s"need positive geometry, got $blocks x $blockLen")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"char_block_sums requires a string argument, got ${child.dataType.sql}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "char_block_sums"

  override protected def nullSafeEval(input: Any): Any = {
    val js = input.asInstanceOf[UTF8String].toString
    val sums = new Array[Long](blocks)
    val total = blocks * blockLen
    var i = 0
    var cp = 0
    while (i < js.length && cp < total) {
      val c = js.codePointAt(i)
      sums(cp / blockLen) += c
      i += Character.charCount(c)
      cp += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sums)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val js = ctx.freshName("js")
      val sums = ctx.freshName("sums")
      val i = ctx.freshName("i")
      val cp = ctx.freshName("cp")
      val ch = ctx.freshName("ch")
      s"""
         |String $js = $c.toString();
         |long[] $sums = new long[$blocks];
         |int $i = 0;
         |int $cp = 0;
         |while ($i < $js.length() && $cp < ${blocks * blockLen}) {
         |  int $ch = $js.codePointAt($i);
         |  $sums[$cp / $blockLen] += $ch;
         |  $i += java.lang.Character.charCount($ch);
         |  $cp++;
         |}
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($sums);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): CharBlockSums =
    copy(child = newChild)
}
