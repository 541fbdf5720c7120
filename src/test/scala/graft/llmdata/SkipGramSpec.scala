package graft.llmdata

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Skip-gram pairs: exact positive window semantics on hand docs, an
  * INDEPENDENT MessageDigest replay of the weighted negative draws,
  * and bucket-count invariance of the noise-table equi-join.
  */
class SkipGramSpec extends SparkSpec {
  import spark.implicits._

  private val docs: DataFrame = Seq(
    (1L, "a b c d"),
    (2L, "b b e"),
    (3L, "a")).toDF("id", "txt")

  test("positives: symmetric window-2, center position excluded") {
    val got = SkipGram.positives(docs, "txt", "id", window = 2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getInt(3), r.getString(4))).toSet
    val doc1 = Set(
      (1L, 0, "a", 1, "b"), (1L, 0, "a", 2, "c"),
      (1L, 1, "b", 0, "a"), (1L, 1, "b", 2, "c"), (1L, 1, "b", 3, "d"),
      (1L, 2, "c", 0, "a"), (1L, 2, "c", 1, "b"), (1L, 2, "c", 3, "d"),
      (1L, 3, "d", 1, "b"), (1L, 3, "d", 2, "c"))
    val doc2 = Set(
      (2L, 0, "b", 1, "b"), (2L, 0, "b", 2, "e"),
      (2L, 1, "b", 0, "b"), (2L, 1, "b", 2, "e"),
      (2L, 2, "e", 0, "b"), (2L, 2, "e", 1, "b"))
    assert(got == doc1 ++ doc2) // doc 3 has no context at all
  }

  private def pairs(negatives: Int, nBuckets: Int = 1 << 12) =
    SkipGram.trainingPairs(docs, "txt", "id", window = 2,
        negatives = negatives, nBuckets = nBuckets)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getString(3), r.getInt(4)))
      .toSeq.sorted

  test("negative accounting: k noise rows per positive, label 0") {
    val all = pairs(negatives = 3)
    val (p, n) = all.partition(_._5 == 1)
    assert(n.size == 3 * p.size)
    assert(n.map(_._4).toSet.subsetOf(Set("a", "b", "c", "d", "e")))
  }

  test("independent MessageDigest replay reproduces every draw") {
    // noise table replayed in plain Scala: counts over the whitespace
    // tokens, wt = round(c^0.75 * 1e6), intervals in ascending token
    // order (ASCII tokens — byte order == string order)
    val counts = Seq("a b c d", "b b e", "a").flatMap(_.split(" "))
      .groupBy(identity).view.mapValues(_.size.toLong).toSeq.sortBy(_._1)
    val wts = counts.map { case (w, c) =>
      (w, math.round(math.pow(c.toDouble, 0.75) * 1e6)) }
    val his = wts.scanLeft(0L)(_ + _._2).tail
    val iv = wts.zip(his).map { case ((w, wt), hi) => (w, hi - wt, hi) }
    val tot = his.last
    def drawTok(doc: Long, pos: Int, cp: Int, j: Int): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
      val hex = d.digest(s"sg$doc:$pos:$cp:$j".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 15)
      val x = java.lang.Long.parseLong(hex, 16) % tot
      iv.find(t => x >= t._2 && x < t._3).get._1
    }
    val posRows = SkipGram.positives(docs, "txt", "id", window = 2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))
    val expectedNegs = (for {
      (doc, pos, center, cp) <- posRows; j <- 0 until 2
    } yield (doc, pos, center, drawTok(doc, pos, cp, j), 0)).toSeq.sorted
    val gotNegs = pairs(negatives = 2).filter(_._5 == 0)
    assert(gotNegs == expectedNegs)
  }

  test("bucket count does not change the sample") {
    assert(pairs(2, nBuckets = 1) == pairs(2, nBuckets = 1 << 14))
  }

  test("GloVe co-occurrence: hand-computed 1/d sums, symmetric X") {
    val df = Seq((1L, "a b a b")).toDF("id", "txt")
    val got = SkipGram.cooccurrenceCounts(df, "txt", "id", window = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getDouble(2), r.getLong(3))).toMap
    // [a b a b]: X(a,b) = 1 + (1+1) = 3 over 3 co-occurrences;
    // X(a,a) = 0.5 + 0.5 at distance 2
    assert(got(("a", "b")) == (3.0, 3L))
    assert(got(("b", "a")) == (3.0, 3L))
    assert(got(("a", "a")) == (1.0, 2L))
    assert(got(("b", "b")) == (1.0, 2L))
    // symmetric window => symmetric matrix
    got.keys.foreach { case (c, x) =>
      assert(got((c, x)) == got((x, c)))
    }
  }
}
