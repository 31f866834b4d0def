package graft.plans

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.SparkSessionExtensions

/** Native dot product over two vector columns — `array<double>`,
  * `array<float>`, or a mix.
  *
  * Why a custom Catalyst expression: the built-in formulation
  * (`aggregate(zip_with(a, b, (x, y) -> x * y), 0d, (acc, x) -> acc + x)`)
  * is a higher-order function, which Catalyst evaluates INTERPRETED — per
  * element, per lambda, with boxing. This expression is a tight codegen'd
  * loop over the unsafe array data, keeping vector similarity inside
  * whole-stage codegen. Semantics match the built-in fold exactly
  * (left-to-right IEEE double accumulation), so results are bit-identical
  * to the DuckDB oracle's seeded fold.
  *
  * Float arrays are consumed IN PLACE: float→double conversion is exact,
  * so `(double) f1 * (double) f2` equals the product after an up-front
  * `cast(array<double>)` bit-for-bit — but skipping the cast removes a
  * per-row array allocation and keeps vectors at 4 bytes/element in
  * shuffles and caches (the embedding table's storage format is float).
  *
  * Extends the reference's capability set per the north-star brief (the
  * reference has no vector ops; its expression surface is §2.3 built-ins
  * only — reference: src/streaming/transforms directory).
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemOk(t: DataType): Boolean = t match {
    case ArrayType(DoubleType, _) | ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires array<double|float> arguments, got " +
        s"${left.dataType.sql} and ${right.dataType.sql}")

  override def dataType: DataType = DoubleType

  override def prettyName: String = "vec_dot"

  private def isFloat(t: DataType): Boolean =
    t.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val lf = isFloat(left.dataType)
    val rf = isFloat(right.dataType)
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val xe = if (isFloat(left.dataType)) s"(double) $x.getFloat($i)" else s"$x.getDouble($i)"
      val ye = if (isFloat(right.dataType)) s"(double) $y.getFloat($i)" else s"$y.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $xe * $ye;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Optimizer rule: elide `cast(x as array<double>)` directly under
  * [[VecDot]] when `x` is `array<float>`. Sound because VecDot consumes
  * float arrays in place with bit-identical results (float→double is an
  * exact conversion, applied per element inside the loop) — the cast's
  * only effect was a per-row array allocation, and any user query written
  * against the old double-only signature keeps its exact results while
  * losing the copy. The float→double cast never errors, so elision is
  * valid under every cast eval mode.
  */
object VecDotCastElision
    extends org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.Cast
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

  private def strip(e: Expression): Expression = e match {
    case c: Cast => (c.child.dataType, c.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(DoubleType, _)) => c.child
      case _ => c
    }
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case v @ VecDot(l, r) =>
        val (sl, sr) = (strip(l), strip(r))
        if (sl.eq(l) && sr.eq(r)) v else VecDot(sl, sr)
    }
}

/** Session extension registering graft's native surface — the scalar
  * function AND the optimizer rule:
  * `spark.sql.extensions=graft.plans.GraftExtensions` (set by the
  * Verify/Bench/Explain mains and the test session).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => VecDot(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("char_block_sums"),
      new ExpressionInfo(classOf[CharBlockSums].getName, "char_block_sums"),
      (children: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.Literal
        import org.apache.spark.sql.types.IntegerType
        def intLit(e: Expression, name: String): Int = e match {
          case Literal(v: Int, IntegerType) => v
          case _ => throw new IllegalArgumentException(
            s"char_block_sums: $name must be an integer literal, got $e")
        }
        CharBlockSums(children.head,
          intLit(children(1), "blocks"), intLit(children(2), "blockLen"))
      }))
    def schemaNameLit(e: Expression, fn: String): String = {
      import org.apache.spark.sql.catalyst.expressions.Literal
      import org.apache.spark.sql.types.StringType
      e match {
        case Literal(s, StringType) if s != null => s.toString
        case _ => throw new IllegalArgumentException(
          s"$fn: schema name must be a string literal, got $e")
      }
    }
    ext.injectFunction((
      FunctionIdentifier("to_avro_graft"),
      new ExpressionInfo(classOf[graft.sources.AvroCodec.AvroEncodeExpr].getName,
        "to_avro_graft"),
      (children: Seq[Expression]) => graft.sources.AvroCodec.AvroEncodeExpr(
        children.head, schemaNameLit(children(1), "to_avro_graft"))))
    ext.injectFunction((
      FunctionIdentifier("from_avro_graft"),
      new ExpressionInfo(classOf[graft.sources.AvroCodec.AvroDecodeExpr].getName,
        "from_avro_graft"),
      (children: Seq[Expression]) => graft.sources.AvroCodec.AvroDecodeExpr(
        children.head, schemaNameLit(children(1), "from_avro_graft"))))
    ext.injectFunction((
      FunctionIdentifier("from_avro_evolved"),
      new ExpressionInfo(
        classOf[graft.sources.AvroCodec.AvroDecodeEvolvedExpr].getName,
        "from_avro_evolved"),
      (children: Seq[Expression]) => graft.sources.AvroCodec.AvroDecodeEvolvedExpr(
        children.head, schemaNameLit(children(1), "from_avro_evolved"),
        schemaNameLit(children(2), "from_avro_evolved"))))
    // Spark's runtime-filter Bloom pair, surfaced as callable functions so
    // operators can build an explicit semi-join prefilter (decontamination
    // against an eval set too large to broadcast as a hash set): the agg
    // serializes an org.apache.spark.util.sketch.BloomFilter over xxhash64ed
    // long keys; the probe takes a FOLDABLE binary (the collected sketch)
    // and is codegen'd with a deserialize-once reference — per-row cost is
    // one mightContainLong.
    ext.injectFunction((
      FunctionIdentifier("graft_bloom_agg"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
        "graft_bloom_agg"),
      (children: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
        children match {
          case Seq(c) => new BloomFilterAggregate(c)
          case Seq(c, items) => new BloomFilterAggregate(c, items)
          case Seq(c, items, bits) => new BloomFilterAggregate(c, items, bits)
          case _ => throw new IllegalArgumentException(
            s"graft_bloom_agg expects 1-3 arguments, got ${children.size}")
        }
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
        "graft_might_contain"),
      (children: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          children.head, children(1))))
    ext.injectOptimizerRule(_ => VecDotCastElision)
    ext.injectOptimizerRule(_ => TopK.WindowTopKRewrite)
    ext.injectPlannerStrategy(_ => TopK.TopKStrategy)
  }
}
