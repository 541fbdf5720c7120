package graft.llmdata

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.BpeTokenCount

class BpeSpec extends SparkSpec {

  test("train learns the most frequent pairs first, deterministically") {
    import spark.implicits._
    // 'aaab' ×3 and 'ab' ×2: pair (a,a) appears 2·3=6 times (two
    // adjacent occurrences per word, string-replace semantics merges
    // the first two), (a,b) 3+2=5 → first merge is (a,a)
    val docs = Seq("aaab aaab aaab ab ab").toDF("text")
    val merges = Bpe.train(docs, "text", numMerges = 3)
    assert(merges.head == ("a", "a"), s"first merge: ${merges.head}")
    val again = Bpe.train(docs, "text", numMerges = 3)
    assert(merges == again, "training must be deterministic")
  }

  test("train stops when no pair repeats") {
    import spark.implicits._
    val docs = Seq("ab cd ef").toDF("text") // every pair frequency 1
    assert(Bpe.train(docs, "text", numMerges = 10).isEmpty)
  }

  test("wordTokens: empty, fallback, unicode, full merge") {
    val merges = Seq(("j", "o"), ("jo", "i"), ("joi", "n"))
    val pr = merges.map { case (l, r) => Array(s"|$l|$r|", s"|$l$r|") }.toArray
    assert(BpeTokenCount.wordTokens("", pr) == 0)
    assert(BpeTokenCount.wordTokens("join", pr) == 1, "fully merged word")
    assert(BpeTokenCount.wordTokens("joins", pr) == 2, "join + s")
    assert(BpeTokenCount.wordTokens("xyz", pr) == 3, "untouched word = chars")
    assert(BpeTokenCount.wordTokens("a|b", pr) == 3, "delimiter fallback = code points")
    assert(BpeTokenCount.wordTokens("héllo", pr) == 5, "code points, not UTF-16 units")
    assert(BpeTokenCount.wordTokens("日本", pr) == 2)
  }

  test("boundary-shared runs merge to the string-replace fixpoint") {
    val pr = Array(Array("|a|a|", "|aa|"))
    // k=4: pass1 leaves a shared-boundary pair, pass2 finishes → (aa)(aa)
    assert(BpeTokenCount.wordTokens("aaaa", pr) == 2)
    // k=5: fixpoint is (aa)(a)(aa) under replace semantics
    assert(BpeTokenCount.wordTokens("aaaaa", pr) == 3)
  }

  test("countExpr through the codegen path matches the driver compute") {
    import spark.implicits._
    val docs = Seq((1L, "join the join"), (2L, ""), (3L, "a  b"))
      .toDF("id", "text")
    val merges = Seq(("j", "o"), ("jo", "i"), ("joi", "n"), ("t", "h"), ("th", "e"))
    val got = docs.select(col("id"), Bpe.countExpr(col("text"), merges).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val pr = merges.map { case (l, r) => Array(s"|$l|$r|", s"|$l$r|") }.toArray
    assert(got(1L) == BpeTokenCount.compute("join the join", pr))
    assert(got(1L) == 3, "join(1) + the(1) + join(1)")
    assert(got(2L) == 0, "empty text")
    assert(got(3L) == 2, "double space contributes an empty 0-token word")
  }

  test("trained table on the corpus reduces counts below whitespace-char baseline") {
    val docs = graft.core.Tables.documents(spark, sfDir)
    val merges = Bpe.trained(spark, sfDir)
    assert(merges.nonEmpty && merges.size <= Bpe.NumMerges)
    val row = docs.select(
      sum(Bpe.countExpr(col("text"), merges)).as("bpe"),
      sum(TextStats.tokenCount(col("text"))).as("ws"),
      sum(length(regexp_replace(col("text"), " ", ""))).as("chars"))
      .head()
    val (bpe, ws, chars) = (row.getLong(0), row.getLong(1), row.getLong(2))
    assert(bpe >= ws, "a word is at least one subword")
    assert(bpe < chars, "merges must compress below the per-char count")
  }

  test("encode: size equals count, tokens concatenate back to the text") {
    import spark.implicits._
    val merges = Bpe.trained(spark, sfDir)
    val docs = graft.core.Tables.documents(spark, sfDir).limit(50)
    val bad = docs.select(
      (size(Bpe.encodeExpr(col("text"), merges)) =!=
        Bpe.countExpr(col("text"), merges)).cast("int").as("szm"),
      (concat_ws("", Bpe.encodeExpr(col("text"), merges)) =!=
        regexp_replace(col("text"), " ", "")).cast("int").as("ccm"))
      .agg(sum("szm"), sum("ccm")).head()
    assert(bad.getLong(0) == 0, "encode size must equal the count")
    assert(bad.getLong(1) == 0, "tokens must concatenate back to the text")
  }

  test("encode fallback: delimiter/newline words tokenize per code point") {
    val patReps = Array(Array("|a|b|", "|ab|"))
    val toks = BpeTokenCount.encode("x|y a\nb ab", patReps).map(_.toString)
    assert(toks.toSeq == Seq("x", "|", "y", "a", "\n", "b", "ab"))
  }

  test("encode matches the driver kernel through codegen") {
    import spark.implicits._
    val merges = Seq("a" -> "b", "ab" -> "c")
    val texts = Seq("abc abcabc", "", "a b c", "xyz abca")
    val got = texts.toDF("t")
      .select(Bpe.encodeExpr(col("t"), merges))
      .collect().map(_.getSeq[String](0).toList)
    val patReps = merges.map { case (l, r) =>
      Array(s"|$l|$r|", s"|$l$r|") }.toArray
    val want = texts.map(t =>
      BpeTokenCount.encode(t, patReps).map(_.toString).toList)
    assert(got.toSeq == want)
  }
}
