package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The imperative vector kernels must be BIT-IDENTICAL to the HOF
  * expression trees they replaced — fuzzed over the full edge surface:
  * float vs double element types, null arrays, null elements, NaN,
  * zero vectors, length mismatches, empty arrays. */
class VecKernelsSpec extends SparkSpec {
  import graft.functions.VecKernels

  private val rnd = new scala.util.Random(20260818L)

  // legacy HOF forms (what the kernels replaced)
  private def hofEuclid(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v))
  private def hofCosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v * v))
    val nb = sqrt(aggregate(b, lit(0.0), (acc, v) => acc + v * v))
    dot / (na * nb)
  }
  private def hofDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
  private def hofRuzicka(a: Column, b: Column): Column = {
    val smin = aggregate(zip_with(a, b, (x, y) => least(x, y)), lit(0.0), (acc, v) => acc + v)
    val smax = aggregate(zip_with(a, b, (x, y) => greatest(x, y)), lit(0.0), (acc, v) => acc + v)
    lit(1.0) - when(smax === 0, lit(1.0)).otherwise(smin / smax)
  }
  private def hofSqnormCast(v: Column): Column =
    aggregate(transform(v, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, e) => acc + e)
  private def hofUnitize(vec: Column): Column = {
    val norm = sqrt(aggregate(vec, lit(0.0), (a, x) => a + x * x))
    transform(vec, x => when(norm > 0.0, x / norm).otherwise(x))
  }

  private def dvec(n: Int): Seq[java.lang.Double] = Seq.tabulate(n) { i =>
    val r = rnd.nextInt(20)
    if (r == 0) null
    else if (r == 1) java.lang.Double.valueOf(Double.NaN)
    else if (r == 2) java.lang.Double.valueOf(0.0)
    else java.lang.Double.valueOf(rnd.nextGaussian() * 10)
  }

  private def bits(x: Any): Any = x match {
    case d: Double => java.lang.Double.doubleToLongBits(d) // NaN-exact
    case s: scala.collection.Seq[_] => s.toList.map(bits) // rows yield mutable ArraySeq
    case other => other
  }

  private def compare(df: org.apache.spark.sql.DataFrame,
                      kernel: Column, hof: Column, tag: String): Unit = {
    val rows = df.select(kernel.as("k"), hof.as("h")).collect()
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(bits(r.get(0)) == bits(r.get(1)),
        s"$tag row $i: kernel=${r.get(0)} hof=${r.get(1)}")
    }
  }

  test("euclid/dot/ruzicka kernels match the HOF forms on fuzzed double arrays") {
    import spark.implicits._
    val pairs = (1 to 300).map { i =>
      val n = rnd.nextInt(8)
      val m = if (rnd.nextInt(5) == 0) n + rnd.nextInt(3) else n // mismatches
      (dvec(n), dvec(m))
    } ++ Seq((null, Seq(java.lang.Double.valueOf(1.0))),
      (Seq.empty[java.lang.Double], Seq.empty[java.lang.Double]))
    val df = pairs.toDF("a", "b")
    compare(df, VecKernels.euclid(col("a"), col("b")),
      hofEuclid(col("a"), col("b")), "euclid-double")
    compare(df, VecKernels.dot(col("a"), col("b")),
      hofDot(col("a"), col("b")), "dot-double")
    compare(df, VecKernels.ruzicka(col("a"), col("b")),
      hofRuzicka(col("a"), col("b")), "ruzicka-double")
  }

  test("cosine matches HOF on non-degenerate doubles; both THROW on zero norms (ANSI)") {
    import spark.implicits._
    // a zero-norm side makes BOTH forms raise DIVIDE_BY_ZERO under the
    // session's ANSI default — the kernel keeps the division a Catalyst
    // Divide precisely so that semantic is untouched
    def safe(n: Int): Seq[java.lang.Double] = {
      val v = dvec(math.max(n, 1))
      if (v.exists(x => x != null && x.doubleValue() != 0.0 && !x.isNaN)) v
      else Seq(java.lang.Double.valueOf(1.5)) ++ v.drop(1)
    }
    val pairs = (1 to 300).map { _ =>
      val n = rnd.nextInt(7) + 1
      val m = if (rnd.nextInt(5) == 0) n + 1 + rnd.nextInt(2) else n
      (safe(n), safe(m))
    }
    val df = pairs.toDF("a", "b")
    compare(df, VecKernels.cosineSim(col("a"), col("b")),
      hofCosine(col("a"), col("b")), "cosine-double")
    val zero = Seq((Seq[java.lang.Double](0.0, 0.0), Seq[java.lang.Double](1.0, 2.0)))
      .toDF("a", "b")
    intercept[Exception] {
      zero.select(VecKernels.cosineSim(col("a"), col("b"))).collect() }
    intercept[Exception] {
      zero.select(hofCosine(col("a"), col("b"))).collect() }
  }

  test("euclid/cosine kernels match the HOF float coercion path") {
    import spark.implicits._
    def f(n: Int) = {
      val v = Seq.tabulate(n)(_ => rnd.nextInt(12) match {
        case 0 => null
        case 1 => java.lang.Float.valueOf(Float.NaN)
        case _ => java.lang.Float.valueOf((rnd.nextGaussian() * 3).toFloat)
      })
      if (v.exists(x => x != null && x.floatValue() != 0.0f && !x.isNaN)) v
      else Seq(java.lang.Float.valueOf(2.5f)) ++ v.drop(1)
    }
    val pairs = (1 to 300).map { _ =>
      val n = rnd.nextInt(7) + 1
      (f(n), f(n))
    }
    val df = pairs.toDF("a", "b")
    compare(df, VecKernels.euclid(col("a"), col("b")),
      hofEuclid(col("a"), col("b")), "euclid-float")
    compare(df, VecKernels.cosineSim(col("a"), col("b")),
      hofCosine(col("a"), col("b")), "cosine-float")
    compare(df, VecKernels.sqnormCast(col("a")),
      hofSqnormCast(col("a")), "sqnorm-float")
  }

  test("ruzicka kernel matches HOF on int count vectors incl. length mismatch") {
    import spark.implicits._
    val pairs = (1 to 300).map { _ =>
      val n = rnd.nextInt(8)
      val m = if (rnd.nextInt(4) == 0) n + rnd.nextInt(3) else n
      def v(k: Int) = Seq.tabulate(k)(_ =>
        if (rnd.nextInt(15) == 0) null
        else java.lang.Integer.valueOf(rnd.nextInt(5)))
      (v(n), v(m))
    }
    val df = pairs.toDF("a", "b")
    compare(df, VecKernels.ruzicka(col("a"), col("b")),
      hofRuzicka(col("a"), col("b")), "ruzicka-int")
  }

  test("unitize kernel matches HOF incl. zero/NaN/null-element vectors") {
    import spark.implicits._
    val vecs = (1 to 300).map(_ => dvec(rnd.nextInt(8))) ++
      Seq(Seq(java.lang.Double.valueOf(0.0), java.lang.Double.valueOf(0.0)), null)
    val df = vecs.toDF("v")
    compare(df, VecKernels.unitize(col("v")), hofUnitize(col("v")), "unitize")
  }

  test("sqnormCast matches the cast-then-multiply HOF on doubles") {
    import spark.implicits._
    val df = ((1 to 200).map(_ => dvec(rnd.nextInt(8))) :+ null).toDF("v")
    compare(df, VecKernels.sqnormCast(col("v")), hofSqnormCast(col("v")), "sqnorm-double")
  }
}
