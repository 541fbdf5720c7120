package graft.llmdata

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** C4 preset rules on hand docs where every branch is pinned. */
class C4FilterSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)],
      badwords: Seq[String] = Seq("verboten")) =
    TextStats.c4Filter(docs.toDF("doc_id", "text"), "text", "doc_id",
        badwords = badwords)
      .as[(Long, String, Int, Int, Int, Int, Int, Int)].collect()
      .map(r => r._1 -> r).toMap

  test("line rules: terminal punct, min words, javascript") {
    val doc = Seq(
      "this line ends properly.",       // kept
      "no terminal punctuation here",   // dropped: no punct
      "too short.",                     // dropped: 2 words
      "enable JavaScript to proceed.",  // dropped: javascript
      "a quoted ending counts too\"",   // kept
      "is this kept? yes! it is. ok. fine.") // kept, 5 marks
      .mkString("\n")
    val got = run(Seq(1L -> doc))(1L)
    val (_, cleaned, nKept, nSent, lorem, brace, bad, keep) = got
    assert(nKept == 3, s"kept lines: $cleaned")
    assert(cleaned == "this line ends properly.\n" +
      "a quoted ending counts too\"\nis this kept? yes! it is. ok. fine.")
    assert(nSent == 6, "1 + 0 + 5 sentence marks")
    assert((lorem, brace, bad) == ((0, 0, 0)))
    assert(keep == 1)
  }

  test("page rules: lorem ipsum, brace, blocklist token, min sentences") {
    val good = "one good sentence here. two! three? four. five."
    val docs = Seq(
      2L -> s"$good\nsome Lorem Ipsum boilerplate.",
      3L -> s"$good\ncode with brace { inside.",
      4L -> s"$good\nthis is verboten content.",
      5L -> s"$good\nthe word verbotenx is not a token match.",
      6L -> "only two marks here. second!",
      7L -> good)
    val got = run(docs)
    assert(got(2L)._5 == 1 && got(2L)._8 == 0, "lorem page dropped")
    assert(got(3L)._6 == 1 && got(3L)._8 == 0, "brace page dropped")
    assert(got(4L)._7 == 1 && got(4L)._8 == 0, "blocklist page dropped")
    assert(got(5L)._7 == 0 && got(5L)._8 == 1,
      "blocklist is token-exact, not substring")
    assert(got(6L)._4 == 2 && got(6L)._8 == 0, "< 5 sentences dropped")
    assert(got(7L)._8 == 1, "clean page kept")
  }

  test("a page with no kept lines is dropped even without flags") {
    val got = run(Seq(8L -> "no punct at all\nanother bare line"))(8L)
    assert(got._3 == 0 && got._2 == "" && got._8 == 0)
  }

  test("c4Filter scores a live stream unchanged (stateless projection)") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val docs = Seq(
      30L -> "a clean first sentence. two! three? four. five.",
      31L -> "lorem ipsum in a page. two! three? four. five.",
      32L -> "no terminal punctuation so nothing keeps")
    val expected = run(docs)
    val input = MemoryStream[(Long, String)]
    val scored = TextStats.c4Filter(input.toDF.toDF("doc_id", "text"),
      "text", "doc_id", badwords = Seq("verboten"))
    val q = scored.writeStream.outputMode("append")
      .format("memory").queryName("c4_stream").start()
    try {
      input.addData(docs: _*)
      q.processAllAvailable()
      val got = spark.table("c4_stream")
        .as[(Long, String, Int, Int, Int, Int, Int, Int)].collect()
        .map(r => r._1 -> r).toMap
      assert(got == expected)
    } finally q.stop()
  }
}
