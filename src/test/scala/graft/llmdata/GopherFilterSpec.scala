package graft.llmdata

import graft.SparkSpec

/** Gopher quality rules (Rae 2112.11446 App. A) on hand docs where every
  * rule is the unique reason a document fails.
  */
class GopherFilterSpec extends SparkSpec {
  import spark.implicits._

  // 60 ordinary words incl. several required stop words — passes all rules
  private val goodText = "the be to of and that have with word"
    .split(" ").toSeq.padTo(60, "word").mkString(" ")

  private def run(docs: Seq[(Long, String)]) =
    TextStats.gopherFilter(docs.toDF("doc_id", "text"), "text", "doc_id")
      .collect().map(r => r.getLong(0) -> r).toMap

  test("baseline doc passes every rule") {
    val r = run(Seq(1L -> goodText))(1L)
    assert(r.getAs[Int]("n_words") == 60)
    assert(r.getAs[Int]("keep") == 1)
  }

  test("each rule fails for exactly the right reason") {
    val bullets = (1 to 10).map(i => s"- bullet $i here").mkString("\n")
    val ellipsisLines = (1 to 10).map(i => s"line $i trails off...").mkString("\n")
    val docs = Seq(
      10L -> "too short doc.",                              // rule 1 low
      11L -> (goodText + " " +
        Seq.fill(60)("pneumonoultramicroscopicsilico").mkString(" ")), // rule 2 high
      12L -> (goodText + " " + Seq.fill(60)("#").mkString(" ")),  // rule 3
      13L -> (goodText + " " + Seq.fill(60)("...").mkString(" ")), // rule 4
      14L -> (goodText + "\n" + bullets),                   // rule 5? see below
      15L -> (goodText + "\n" + ellipsisLines),             // rule 6? see below
      16L -> (goodText + " " + Seq.fill(60)("12345").mkString(" ")), // rule 7
      17L -> Seq.fill(60)("word").mkString(" "))            // rule 8 no stops
    val r = run(docs)
    assert(r(10L).getAs[Int]("r_words") == 0)
    assert(r(11L).getAs[Int]("r_word_len") == 0)
    assert(r(12L).getAs[Int]("r_hash") == 0 && r(12L).getAs[Int]("r_words") == 1)
    assert(r(13L).getAs[Int]("r_ellipsis") == 0)
    // 10 bullet lines / 11 lines = 0.909 ≥ 0.9 → fails; 10/11 ellipsis
    // line frac 0.909 ≥ 0.3 → fails
    assert(r(14L).getAs[Int]("r_bullet") == 0)
    assert(r(15L).getAs[Int]("r_ellipsis_line") == 0)
    assert(r(16L).getAs[Int]("r_alpha") == 0)
    assert(r(17L).getAs[Int]("r_stop") == 0 && r(17L).getAs[Int]("keep") == 0)
    // signals are exact ratios
    assert(math.abs(r(16L).getAs[Double]("alpha_word_frac") - 0.5) < 1e-9)
  }

  test("ratio edge: hash ratio exactly 0.1 passes (<= bound)") {
    // 90 words + 10 one-hash words → 100 words, 10 hashes, ratio 0.1
    val t = (goodText.split(" ").toSeq.padTo(90, "word") ++
      Seq.fill(10)("#")).mkString(" ")
    val r = run(Seq(20L -> t))(20L)
    assert(math.abs(r.getAs[Double]("hash_ratio") - 0.1) < 1e-12)
    assert(r.getAs[Int]("r_hash") == 1)
  }
}
