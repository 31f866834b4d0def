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
