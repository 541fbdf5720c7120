package graft.llmdata

import graft.SparkSpec

class LineCleanSpec extends SparkSpec {
  import spark.implicits._

  private def clean(texts: (Long, String)*): Map[Long, (String, Long, Long)] =
    TextStats.cleanLines(texts.toDF("doc_id", "text"), "text", "doc_id")
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("corpusDiff: added/removed/changed/unchanged; normalization absorbs punct noise") {
    val old = Seq(1L -> "doc one text", 2L -> "doc two text",
      3L -> "doc three text").toDF("doc_id", "text")
    val neu = Seq(2L -> "Doc  two, text!", // same after normalization
      3L -> "doc three REVISED text", 4L -> "doc four text")
      .toDF("doc_id", "text")
    val got = Dedup.corpusDiff(old, neu, "text", "doc_id")
      .as[(Long, String, String, String)].collect()
      .map(r => r._1 -> r._2).toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("dedupLinesGlobal: corpus-wide keep-first, order preserved, empty docs survive") {
    val docs = Seq(
      1L -> "unique alpha\nshared boilerplate\nunique beta",
      2L -> "shared boilerplate\nunique gamma\nshared boilerplate",
      3L -> "shared boilerplate")
    val got = Dedup.dedupLinesGlobal(docs.toDF("doc_id", "text"),
        "text", "doc_id")
      .as[(Long, Int, Int, String)].collect().map(r => r._1 -> r).toMap
    // doc 1 is first (min struct(id,pos)): keeps everything
    assert(got(1L) == ((1L, 3, 3,
      "unique alpha\nshared boilerplate\nunique beta")))
    // doc 2 loses BOTH copies of the boilerplate (within-doc repeat too)
    assert(got(2L) == ((2L, 3, 1, "unique gamma")))
    // doc 3 loses its only line but still emits a row
    assert(got(3L) == ((3L, 1, 0, "")))
  }

  test("each rule fires: short, shouted, numeric, duplicate-keep-first") {
    val doc = Seq(
      "keep me please now",      // kept
      "no",                      // < 3 words
      "THIS IS ALL SHOUTED",     // upper frac 1 > 0.6
      "12 345 678",              // digit frac 1 > 0.5
      "keep me please now",      // duplicate of line 0 → dropped
      "another good line here"   // kept
    ).mkString("\n")
    val (cleaned, kept, dropped) = clean(0L -> doc)(0L)
    assert(cleaned == "keep me please now\nanother good line here")
    assert(kept == 2 && dropped == 4)
  }

  test("duplicate keeps the FIRST position, preserving order") {
    val doc = Seq(
      "zz late alphabetically first",
      "aa early alphabetically second",
      "zz late alphabetically first"
    ).mkString("\n")
    val (cleaned, kept, _) = clean(1L -> doc)(1L)
    assert(cleaned ==
      "zz late alphabetically first\naa early alphabetically second")
    assert(kept == 2)
  }

  test("fully-cleaned doc keeps a row with empty text") {
    val m = clean(2L -> "no\nNOPE BAD\n1 2 3", 3L -> "fine good line here")
    assert(m(2L) == (("", 0L, 3L)))
    assert(m(3L) == (("fine good line here", 1L, 0L)))
  }

  test("thresholds are inclusive: exactly-at-bound lines survive") {
    // 9 upper of 15 non-space chars = 0.6 exactly ≤ 0.6 → kept
    val exact = "ABCDEFGHI abc def"
    val m = clean(4L -> exact)
    assert(m(4L)._2 == 1L, s"expected kept, got ${m(4L)}")
  }
}
