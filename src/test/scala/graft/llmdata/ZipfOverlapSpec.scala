package graft.llmdata

import graft.SparkSpec

/** Zipf fit and the cross-source overlap matrix vs brute force. */
class ZipfOverlapSpec extends SparkSpec {
  import spark.implicits._

  test("zipfFit recovers the exponent of an exact power-law corpus") {
    // token w_r appears round(1000/r) times: ln f = ln 1000 − 1·ln r
    val words = (1 to 50).flatMap(r =>
      Seq.fill(math.round(1000.0 / r).toInt)(f"w$r%03d"))
    val df = words.grouped(100).map(_.mkString(" ")).toSeq.toDF("text")
    val got = TextStats.zipfFit(df, "text", topK = 30)
      .as[(Int, Double, Double)].collect().head
    assert(got._1 == 30)
    assert(got._2 ~== (-1.0, 0.01), s"slope ${got._2}")
    assert(got._3 ~== (math.log(1000.0), 0.05), s"intercept ${got._3}")
  }

  test("zipfFit ranks by (freq desc, token asc) like the oracle") {
    // two tokens tie at the top; regression input must be stable
    val df = Seq("b b b a a a c c d").toDF("text")
    val got = TextStats.zipfFit(df, "text", topK = 4)
      .as[(Int, Double, Double)].collect().head
    // brute force with the same tie rule
    val freqs = Seq(3.0, 3.0, 2.0, 1.0) // a, b, c, d
    val xs = (1 to 4).map(r => math.log(r.toDouble))
    val ys = freqs.map(math.log)
    val n = 4.0
    val (sx, sy) = (xs.sum, ys.sum)
    val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
    val sxx = xs.map(x => x * x).sum
    val slope = (sxy - sx * sy / n) / (sxx - sx * sx / n)
    assert(got._2 ~== (slope, 1e-9))
  }

  test("crossSourceOverlap matches brute-force Jaccard of shingle sets") {
    val docs = Seq(
      ("a", "one two three four five"),
      ("a", "six seven eight nine"),
      ("b", "one two three four ten"),     // shares shingles with a
      ("c", "totally disjoint text body here"),
      ("d", "one two three four five"))    // identical to an a-doc
    val df = docs.zipWithIndex
      .map { case ((s, t), i) => (i.toLong, s, t) }
      .toDF("doc_id", "source", "text")
    val got = TextStats.crossSourceOverlap(df, "text", "source", n = 3)
      .as[(String, String, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap

    def shingles(src: String): Set[String] = docs.filter(_._1 == src)
      .flatMap(_._2.split(" ").sliding(3).map(_.mkString(" "))).toSet
    val pairs = Seq(("a", "b"), ("a", "d"), ("b", "d"))
    pairs.foreach { case (x, y) =>
      val (sx, sy) = (shingles(x), shingles(y))
      val inter = sx.intersect(sy).size.toLong
      val r = got((x, y))
      assert(r._3 == inter && r._4 == sx.size && r._5 == sy.size,
        s"pair $x-$y: $r")
      assert(r._6 ~== (inter.toDouble / (sx.size + sy.size - inter), 1e-12))
    }
    // d's shingles are a subset of a's: inter = |d|
    assert(got(("a", "d"))._3 == got(("a", "d"))._5)
    // disjoint pairs are absent (inner semantics)
    assert(!got.contains(("a", "c")) && !got.contains(("b", "c")))
  }
}
