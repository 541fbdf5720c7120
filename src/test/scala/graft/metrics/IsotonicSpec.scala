package graft.metrics

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The minimax-form isotonic fit must equal the textbook sequential
  * pool-adjacent-violators algorithm — checked against an in-spec PAV
  * on randomized bucket profiles, plus the analytical invariants
  * (monotonicity, mean preservation, identity on monotone input).
  */
class IsotonicSpec extends SparkSpec {

  import spark.implicits._

  /** Textbook PAV over (n, pos) buckets in order: pool adjacent
    * violators until non-decreasing; returns per-bucket fitted rate. */
  private def pavReference(buckets: Seq[(Long, Long)]): Seq[Double] = {
    case class Block(n: Long, pos: Long) { def mean: Double = pos.toDouble / n }
    val blocks = scala.collection.mutable.ArrayBuffer[(Block, Int)]() // block, size in buckets
    buckets.foreach { case (n, p) =>
      blocks += ((Block(n, p), 1))
      while (blocks.length >= 2 &&
          blocks(blocks.length - 2)._1.mean >= blocks.last._1.mean) {
        val (b2, s2) = blocks.remove(blocks.length - 1)
        val (b1, s1) = blocks.remove(blocks.length - 1)
        blocks += ((Block(b1.n + b2.n, b1.pos + b2.pos), s1 + s2))
      }
    }
    blocks.toSeq.flatMap { case (b, s) => Seq.fill(s)(b.mean) }
  }

  private def fitOn(buckets: Seq[(Long, Long)]): Seq[Double] = {
    // expand buckets to row-level (score = bucket index scaled so the
    // fixed-width binning reproduces the buckets exactly)
    val b = buckets.length
    val rows = buckets.zipWithIndex.flatMap { case ((n, p), i) =>
      (0L until n).map(j => (i.toDouble + 0.5, if (j < p) 1 else 0))
    }
    val df = rows.toDF("s", "y")
      // anchor rows pin the range to [0, b] so bucket i is exactly i
      .union(Seq((0.0, 0), (b.toDouble, 0)).toDF("s", "y"))
    Isotonic.fitBuckets(df, col("s") * 1.0, col("y") === 1, nBuckets = b)
      .orderBy("bucket").collect().map(_.getAs[Double]("fitted")).toSeq
  }

  test("matches sequential PAV on randomized bucket profiles") {
    val rnd = new scala.util.Random(41)
    (1 to 5).foreach { _ =>
      val buckets = (0 until 8).map { _ =>
        val n = 2L + rnd.nextInt(20); (n + 2, rnd.nextInt(n.toInt + 1).toLong)
      }
      // anchor rows land in bucket 0 and b-1 — add their (neutral) mass
      val adj = buckets.zipWithIndex.map { case ((n, p), i) =>
        if (i == 0 || i == buckets.length - 1) (n + 1, p) else (n, p)
      }
      val expected = pavReference(adj)
      val got = fitOn(buckets)
      expected.zip(got).zipWithIndex.foreach { case ((e, g), i) =>
        assert(g ~== (BigDecimal(e).setScale(6,
          BigDecimal.RoundingMode.HALF_UP).toDouble, 1e-6),
          s"bucket $i: got $g, PAV says $e (profile $adj)")
      }
    }
  }

  test("fitted curve is monotone and preserves the weighted mean") {
    val fit = Isotonic.fitBuckets(
      graft.core.Tables.lineitem(spark, sfDir),
      unix_micros(col("l_shipdate").cast("timestamp")),
      col("l_returnflag") === "R", nBuckets = 20)
      .orderBy("bucket").collect()
    val fitted = fit.map(_.getAs[Double]("fitted"))
    assert(fitted.zip(fitted.tail).forall { case (a, b) => a <= b + 1e-9 })
    val n = fit.map(_.getAs[Long]("n"))
    val pos = fit.map(_.getAs[Long]("pos"))
    val massFit = fitted.zip(n).map { case (f, w) => f * w }.sum
    assert(massFit ~== (pos.sum.toDouble, 0.01 * pos.sum))
  }

  test("already-monotone input is returned unchanged") {
    val got = fitOn(Seq((10L, 0L), (10L, 2L), (10L, 5L), (10L, 9L)))
    val raw = Seq(0.0 / 11, 2.0 / 10, 5.0 / 10, 9.0 / 11) // anchors widen edges
    got.zip(raw).foreach { case (g, r) =>
      assert(g ~== (BigDecimal(r).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble, 1e-6))
    }
  }
}
