package graft.ensemble

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Boosting semantics the exact-replay gates can't express: training
  * SSE strictly decreases round over round, the first boosted stump
  * agrees with the standalone Gini stump (binary-label variance
  * impurity is gini/2, so the argmax split coincides), and the fit is
  * deterministic. */
class BoostingSpec extends SparkSpec {

  private val features = Seq(
    "ship_year" -> year(col("l_shipdate")),
    "quantity_bucket" -> floor(col("l_quantity") / 10).cast("int"),
    "discount_pct" -> round(col("l_discount") * 100).cast("int"))
  private def label = col("l_returnflag") === "R"
  private lazy val li = Tables.lineitem(spark, sfDir)

  private def sse(cells: Seq[(Long, Long, Long)]): Double =
    cells.map { case (n, sy, fm) =>
      val f = fm / 1e6
      sy * (1.0 - f) * (1.0 - f) + (n - sy) * f * f
    }.sum

  private def collectCells(df: org.apache.spark.sql.DataFrame) =
    df.select(col("n"), col("sy"), col("f_micro")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("training SSE strictly decreases each round") {
    val fits = (1 to 3).map(t =>
      Boosting.fitBinned(li, features, label, rounds = t, eta = 0.5))
    val sse0 = sse(collectCells(fits.head._2).map { case (n, sy, _) => (n, sy, 0L) })
    val sses = fits.map(f => sse(collectCells(f._2)))
    val chain = sse0 +: sses
    chain.zip(chain.tail).foreach { case (a, b) =>
      assert(b < a - 1e-9, s"SSE did not decrease: $chain")
    }
  }

  test("round 1 picks the same split as the standalone Gini stump") {
    val boost = Boosting.fitBinned(li, features, label, rounds = 1, eta = 0.5)._1.head
    val stump = Stump.bestSplits(li, features, label)
      .orderBy(col("gini_decrease").desc).limit(1).head()
    assert(boost.feature === stump.getAs[String]("feature"))
    assert(boost.threshold === stump.getAs[Int]("threshold"))
    assert(boost.gain > 0.0)
  }

  test("fit is deterministic and leaf deltas carry the eta shrinkage") {
    val a = Boosting.fitBinned(li, features, label, rounds = 2, eta = 0.5)._1
    val b = Boosting.fitBinned(li, features, label, rounds = 2, eta = 0.5)._1
    assert(a === b)
    // a full step (eta=1) doubles the round-1 deltas (± rounding)
    val full = Boosting.fitBinned(li, features, label, rounds = 1, eta = 1.0)._1.head
    assert(math.abs(full.leftMicro - 2L * a.head.leftMicro) <= 1L)
    assert(math.abs(full.rightMicro - 2L * a.head.rightMicro) <= 1L)
  }
}
