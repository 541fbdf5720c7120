package graft.llmdata

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.ByteBpeEncode

class ByteBpeSpec extends SparkSpec {

  test("alphabet is a 256-way bijection that never emits the delimiter") {
    val a = ByteBpeEncode.alphabet
    assert(a.length == 256)
    assert(a.toSet.size == 256, "surrogates must be distinct")
    assert(!a.contains('|'), "no surrogate may collide with the delimiter")
    assert(!a.contains(' '), "no surrogate may collide with the word split")
    // printable bytes keep their own code point (the GPT-2 keep set
    // minus the house '|' divergence)
    assert(a('a'.toInt) == 'a' && a('Z'.toInt) == 'Z' && a(255) == 255.toChar)
    assert(a(124) != '|', "byte 124 must divert")
  }

  test("empty merge table yields one token per UTF-8 byte — zero OOV " +
      "by construction on any input") {
    val none = Array.empty[Array[String]]
    for (t <- Seq("plain ascii", "café", "中文 text", "pipe|and\nnewline",
        "emoji 😀 four-byte", "")) {
      val toks = ByteBpeEncode.encode(t, none).map(_.toString)
      val wantBytes = t.split(" ", -1).filter(_.nonEmpty)
        .map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8).length).sum
      assert(toks.length == wantBytes,
        s"'$t': ${toks.length} tokens vs $wantBytes bytes")
      assert(toks.forall(_.length == 1), "unmerged tokens are single bytes")
    }
  }

  test("tokens concatenate to the word's surrogate form and decode " +
      "back to the original bytes") {
    val merges = Bpe.mergeLoop(
      Array("the", "then", "theme", "café", "|x|", "a\nb")
        .map(w => (ByteBpeEncode.byteState(w), 5L)), 10)
    assert(merges.nonEmpty)
    val pr = merges.map { case (l, r) => Array(s"|$l|$r|", s"|$l$r|") }.toArray
    for (w <- Seq("the", "theme", "café", "|x|", "a\nb", "zebra",
        "éé")) {
      val toks = ByteBpeEncode.encode(w, pr).map(_.toString)
      assert(toks.mkString == ByteBpeEncode.surrogates(w),
        s"'$w' must partition its surrogate form")
      assert(ByteBpeEncode.decode(toks.toSeq) == w,
        s"'$w' must round-trip through decode")
    }
  }

  test("document encode splits on single spaces with the house " +
      "empty-word convention") {
    val none = Array.empty[Array[String]]
    val toks = ByteBpeEncode.encode("ab  c", none).map(_.toString)
    assert(toks.toSeq == Seq("a", "b", "c"),
      "double space contributes no tokens")
  }

  test("trained merges reduce token counts and the expression is " +
      "codegen-scannable") {
    import spark.implicits._
    val docs = Seq((1L, "the cat the hat"), (2L, "the theme"),
      (3L, "café | café")).toDF("doc_id", "text")
    val merges = ByteBpe.train(docs, "text", numMerges = 12, maxWords = 64)
    assert(merges.nonEmpty, "corpus has repeated pairs to merge")
    val rows = docs.select(col("doc_id"),
        size(ByteBpe.encodeExpr(col("text"), merges)).as("n"),
        size(ByteBpe.encodeExpr(col("text"),
          Seq.empty[(String, String)])).as("n0"))
      .collect()
    rows.foreach { r =>
      assert(r.getInt(1) < r.getInt(2),
        s"doc ${r.getLong(0)}: merges must shrink the token count")
    }
  }
}
