package graft.llmdata

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{WordPieceEncode, WordPieceModel}

class WordPieceSpec extends SparkSpec {

  private def model(pieces: String*): WordPieceModel =
    new WordPieceModel(pieces.toArray)

  /** Independent replay of BERT MaxMatch: at each position COMMIT to
    * the longest vocabulary match (position-keyed `##` lookup) with no
    * backtracking, whole word → [UNK] on any failure — shares no code
    * with the expression's loop shape (recursive, not while-based).
    */
  private def bruteGreedy(w: String, m: WordPieceModel): Seq[String] = {
    val cps = w.codePoints().toArray
    def key(i: Int, l: Int): String =
      (if (i == 0) "" else "##") + new String(cps, i, l)
    def step(i: Int): Option[List[String]] =
      if (i == cps.length) Some(Nil)
      else (math.min(m.maxLen, cps.length - i) to 1 by -1)
        .find(l => m.lookup.contains(key(i, l)))
        .flatMap(l => step(i + l).map(key(i, l) :: _))
    step(0).getOrElse(List(WordPieceEncode.Unk))
  }

  test("greedy longest-match matches the independent replay") {
    val m = model("a", "b", "c", "ab", "abc", "##a", "##b", "##c",
      "##ab", "##bc", "##abc")
    for (w <- Seq("a", "ab", "abc", "abab", "ababab", "cabcab",
        "aaaa", "cccb", "abcabcab", "bca")) {
      val got = WordPieceEncode.wordPieces(w, m).toSeq
      assert(got == bruteGreedy(w, m), s"word $w")
      assert(got.map(p => if (p.startsWith("##")) p.substring(2) else p)
        .mkString == w, s"pieces must concatenate back: $w")
    }
  }

  test("greedy prefers the longest piece even when shorter pieces chain") {
    val m = model("un", "u", "unable", "##n", "##able", "##a", "##b",
      "##l", "##e", "##nable")
    // "unable" itself is in vocab → one token, not un + ##able
    assert(WordPieceEncode.wordPieces("unable", m).toSeq == Seq("unable"))
    // without the full word, longest-first takes "un" then "##able"
    val m2 = model("un", "u", "##n", "##able", "##a", "##b", "##l", "##e")
    assert(WordPieceEncode.wordPieces("unable", m2).toSeq ==
      Seq("un", "##able"))
  }

  test("continuation lookup is position-keyed, not surface-keyed") {
    // "ab" exists only word-initially; "##ab" only as continuation
    val m = model("ab", "x", "##ab")
    assert(WordPieceEncode.wordPieces("ab", m).toSeq == Seq("ab"))
    assert(WordPieceEncode.wordPieces("xab", m).toSeq == Seq("x", "##ab"))
    // initial piece missing → whole word is [UNK] even though '##ab'
    // could cover the tail
    val m3 = model("##ab")
    assert(WordPieceEncode.wordPieces("ab", m3).toSeq ==
      Seq(WordPieceEncode.Unk))
  }

  test("any failed position collapses the WHOLE word to [UNK]") {
    val m = model("a", "##a", "##b")
    // fails at the 'x' (no ##x): the leading matches are discarded
    assert(WordPieceEncode.wordPieces("aaxb", m).toSeq ==
      Seq(WordPieceEncode.Unk))
    // failure at position 0 too
    assert(WordPieceEncode.wordPieces("xa", m).toSeq ==
      Seq(WordPieceEncode.Unk))
    // supplementary-plane chars are single code points on both paths
    assert(WordPieceEncode.wordPieces("a😀", m).toSeq ==
      Seq(WordPieceEncode.Unk))
    val m2 = model("a", "##😀")
    assert(WordPieceEncode.wordPieces("a😀", m2).toSeq ==
      Seq("a", "##😀"))
  }

  test("document encode: word split, empties skipped, unk counts one") {
    val m = model("a", "b", "##b")
    val got = WordPieceEncode.encode("ab  a xa b", m).map(_.toString).toSeq
    assert(got == Seq("a", "##b", "a", WordPieceEncode.Unk, "b"), s"got $got")
    assert(WordPieceEncode.encode("", m).isEmpty)
  }

  test("training picks the likelihood-best pair, not the most frequent") {
    import spark.implicits._
    // pair (q,##z) occurs 4× inside a rare word; (a,##b) occurs 6×
    // but both symbols are everywhere (high denominator): likelihood
    // prefers qz. Corpus: 'ab' common with a,b also appearing alone
    // in many other words; 'qz' seen only together.
    val docs = Seq(
      "ab ab ab ab ab ab qz qz qz qz",
      "ax ay az bx by bz xa ya za xb yb zb").toDF("text")
    val m = WordPiece.train(docs, "text", numMerges = 1)
    assert(m.lookup.contains("qz"),
      s"expected the exclusive pair to merge first: ${m.pieces.toSeq}")
    assert(!m.lookup.contains("ab"),
      "the high-count/high-denominator pair must lose the first merge")
  }

  test("training is deterministic and covers the alphabet") {
    import spark.implicits._
    val docs = Seq("banana bandana banana cabana", "banana cabana na na")
      .toDF("text")
    val m1 = WordPiece.train(docs, "text")
    val m2 = WordPiece.train(docs, "text")
    assert(m1.pieces.toSeq == m2.pieces.toSeq, "vocabulary must be stable")
    // the alphabet is position-keyed: bare singles for word-INITIAL
    // chars (b-anana, c-abana, n-a), ## singles for continuations
    for (c <- "bcn")
      assert(m1.lookup.contains(c.toString), s"initial '$c' missing")
    for (c <- "andb")
      assert(m1.lookup.contains("##" + c), s"continuation '##$c' missing")
    // every training word tokenizes without [UNK]
    for (w <- Seq("banana", "bandana", "cabana", "na")) {
      val ps = WordPieceEncode.wordPieces(w, m1)
      assert(!ps.contains(WordPieceEncode.Unk), s"training word $w → UNK")
      assert(ps.map(p => if (p.startsWith("##")) p.substring(2) else p)
        .mkString == w)
    }
  }

  test("merged piece surfaces never exceed MaxPieceLen") {
    import spark.implicits._
    val docs = Seq("abcdefgh abcdefgh abcdefgh abcdefgh").toDF("text")
    val m = WordPiece.train(docs, "text", numMerges = 20)
    for (p <- m.pieces) {
      val surf = if (p.startsWith("##")) p.substring(2) else p
      assert(surf.codePointCount(0, surf.length) <= WordPiece.MaxPieceLen,
        s"piece $p exceeds the lattice bound")
    }
    assert(m.maxLen <= WordPiece.MaxPieceLen)
  }

  test("encodeExpr through the codegen path matches the driver compute") {
    import spark.implicits._
    val m = model("a", "b", "ab", "##a", "##b", "##ab")
    val docs = Seq((1L, "abab ba"), (2L, ""), (3L, "xa  b"))
      .toDF("id", "text")
    val got = docs.select(col("id"),
        WordPiece.encodeExpr(col("text"), m).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
    for ((id, text) <- Seq(1L -> "abab ba", 2L -> "", 3L -> "xa  b"))
      assert(got(id) == WordPieceEncode.encode(text, m).map(_.toString).toSeq,
        s"row $id")
    assert(got(1L) == Seq("ab", "##ab", "b", "##a"))
    assert(got(3L) == Seq(WordPieceEncode.Unk, "b"))
  }
}
