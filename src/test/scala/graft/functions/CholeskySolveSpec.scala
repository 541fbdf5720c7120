package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._

import graft.SparkSpec

class CholeskySolveSpec extends SparkSpec {

  /** Independent reference: Gaussian elimination with partial
    * pivoting — shares no op sequence with the Cholesky kernel. */
  private def gauss(a: Array[Array[Double]], b: Array[Double]): Array[Double] = {
    val d = b.length
    val m = Array.tabulate(d, d + 1)((i, j) => if (j < d) a(i)(j) else b(i))
    for (p <- 0 until d) {
      val piv = (p until d).maxBy(i => math.abs(m(i)(p)))
      val tmp = m(p); m(p) = m(piv); m(piv) = tmp
      for (i <- p + 1 until d) {
        val f = m(i)(p) / m(p)(p)
        for (j <- p to d) m(i)(j) -= f * m(p)(j)
      }
    }
    val x = new Array[Double](d)
    for (i <- d - 1 to 0 by -1) {
      var s = m(i)(d)
      for (j <- i + 1 until d) s -= m(i)(j) * x(j)
      x(i) = s / m(i)(i)
    }
    x
  }

  private def solveVia(aFull: Array[Array[Double]], b: Array[Double],
      lambda: Double): Array[Double] = {
    val d = b.length
    val upper = (for (i <- 0 until d; j <- i until d) yield aFull(i)(j))
      .toArray
    CholeskySolve.compute(new GenericArrayData(upper),
      new GenericArrayData(b), lambda).toDoubleArray()
  }

  test("kernel matches Gaussian elimination on random SPD systems") {
    val rnd = new scala.util.Random(42)
    for (d <- Seq(2, 3, 8, 16); _ <- 1 to 5) {
      val g = Array.fill(2 * d, d)(rnd.nextDouble() * 2 - 1)
      val a = Array.tabulate(d, d)((i, j) =>
        g.map(r => r(i) * r(j)).sum)
      val b = Array.fill(d)(rnd.nextDouble() * 2 - 1)
      val lambda = 0.05
      val x = solveVia(a, b, lambda)
      val aReg = Array.tabulate(d, d)((i, j) =>
        a(i)(j) + (if (i == j) lambda else 0.0))
      val want = gauss(aReg.map(_.clone()), b.clone())
      for (i <- 0 until d)
        assert(math.abs(x(i) - want(i)) <= 1e-9 * (1 + math.abs(want(i))),
          s"d=$d dim $i: ${x(i)} vs ${want(i)}")
      // residual check against the original system
      for (i <- 0 until d) {
        val r = (0 until d).map(j => aReg(i)(j) * x(j)).sum - b(i)
        assert(math.abs(r) < 1e-8, s"residual row $i: $r")
      }
    }
  }

  test("d=2 kernel agrees with the closed-form 2x2 inverse the ALS " +
      "gates use") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 20) {
      val (a11, a12, a22raw) = (rnd.nextDouble() + 1.0,
        rnd.nextDouble() - 0.5, rnd.nextDouble() + 1.0)
      val a22 = a22raw + a12 * a12 / a11 // keep SPD
      val (b1, b2) = (rnd.nextDouble(), rnd.nextDouble())
      val lambda = 0.01
      val x = solveVia(Array(Array(a11, a12), Array(a12, a22)),
        Array(b1, b2), lambda)
      val r11 = a11 + lambda
      val r22 = a22 + lambda
      val det = r11 * r22 - a12 * a12
      val wx = (r22 * b1 - a12 * b2) / det
      val wy = (r11 * b2 - a12 * b1) / det
      assert(math.abs(x(0) - wx) < 1e-12 && math.abs(x(1) - wy) < 1e-12)
    }
  }

  test("expression evaluates inside a plan (codegen path)") {
    import spark.implicits._
    val df = Seq((2.0, 0.3, 1.5, 1.0, -1.0)).toDF("a00", "a01", "a11",
      "b0", "b1")
    val sol = CholeskySolve(array(col("a00"), col("a01"), col("a11")),
      array(col("b0"), col("b1")), 0.0)
    val row = df.select(element_at(sol, 1).as("x0"),
      element_at(sol, 2).as("x1")).head()
    val det = 2.0 * 1.5 - 0.3 * 0.3
    assert(math.abs(row.getDouble(0) - (1.5 * 1.0 - 0.3 * -1.0) / det) < 1e-12)
    assert(math.abs(row.getDouble(1) - (2.0 * -1.0 - 0.3 * 1.0) / det) < 1e-12)
  }
}
