package graft

/** The native VecDot expression: registered via GraftExtensions, codegen'd,
  * and bit-identical to the built-in higher-order fold. */
class VecDotSpec extends SparkSpec {

  test("vec_dot matches the interpreted aggregate/zip_with fold bit-for-bit") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val df = (0 until 100).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextDouble() * 2 - 1),
        Array.fill(64)(rnd.nextDouble() * 2 - 1))
    }.toDF("id", "a", "b")
    val bad = df.selectExpr(
      "vec_dot(a, b) AS native",
      "aggregate(zip_with(a, b, (x, y) -> x * y), cast(0 as double), (acc, x) -> acc + x) AS fold")
      .where("native <> fold").count()
    assert(bad == 0)
  }

  test("vec_dot over float arrays is bit-identical to the double-cast path") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val df = (0 until 100).map { i =>
      (i.toLong, Array.fill(64)(rnd.nextFloat() * 2 - 1),
        Array.fill(64)(rnd.nextFloat() * 2 - 1))
    }.toDF("id", "fa", "fb")
    // float consumed in place vs an explicit up-front cast: float→double is
    // exact, so the two paths must agree on every bit.
    val bad = df.selectExpr(
      "vec_dot(fa, fb) AS native_float",
      "vec_dot(cast(fa as array<double>), cast(fb as array<double>)) AS cast_double",
      "vec_dot(fa, cast(fb as array<double>)) AS mixed")
      .where("native_float <> cast_double OR mixed <> cast_double").count()
    assert(bad == 0)
  }

  test("optimizer elides redundant double casts under vec_dot") {
    import spark.implicits._
    // non-literal inputs (derived from range's id) so constant folding
    // can't evaluate the whole expression away before the rule is observed
    val df = spark.range(1)
      .selectExpr("array(cast(id + 1 as float), 2.0F) AS fa",
        "array(3.0F, cast(id + 4 as float)) AS fb")
      .selectExpr("vec_dot(cast(fa as array<double>), cast(fb as array<double>)) AS d")
    val dots = df.queryExecution.optimizedPlan.expressions
      .flatMap(_.collect { case v: graft.plans.VecDot => v })
    assert(dots.nonEmpty)
    // after elision both children are the raw float arrays, not casts
    dots.foreach { v =>
      assert(v.children.forall(c =>
        c.dataType == org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, containsNull = true) ||
        c.dataType == org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, containsNull = false)),
        v.children.map(_.dataType).toString)
    }
    assert(df.head().getDouble(0) == 11.0)
  }

  test("vec_dot handles length mismatch and nulls") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(4.0, 5.0))).toDF("a", "b")
    // shorter side bounds the loop: 1*4 + 2*5
    assert(df.selectExpr("vec_dot(a, b)").head().getDouble(0) == 14.0)
    val withNull = Seq((Some(Array(1.0)), Option.empty[Array[Double]]))
      .toDF("a", "b")
    assert(withNull.selectExpr("vec_dot(a, b)").head().isNullAt(0))
  }
}
