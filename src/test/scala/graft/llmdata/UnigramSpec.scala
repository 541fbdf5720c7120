package graft.llmdata

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{UnigramEncode, UnigramModel}

class UnigramSpec extends SparkSpec {

  private def model(pieces: (String, Long)*): UnigramModel =
    new UnigramModel(pieces.map(_._1).toArray, pieces.map(_._2).toArray,
      unkScore = -50000000L)

  /** Independent replay: enumerate EVERY segmentation of `w` into
    * table pieces (or unk single chars), score it, and pick the best
    * with the longest-first tie-break applied position by position
    * from the END of the word — a brute-force oracle sharing no code
    * with the DP.
    */
  private def bruteBest(w: String, m: UnigramModel): Seq[String] = {
    val cps = w.codePoints().toArray
    def segs(from: Int): Seq[List[String]] =
      if (from == cps.length) Seq(Nil)
      else (1 to math.min(m.maxLen, cps.length - from)).flatMap { l =>
        val p = new String(cps, from, l)
        val in = m.lookup.containsKey(p)
        if (in || l == 1) segs(from + l).map(p :: _) else Seq.empty
      }
    def score(seg: List[String]): Long = seg.map { p =>
      val s = m.lookup.get(p); if (s != null) s.longValue() else m.unkScore
    }.sum
    // tie-break: walking back from the end, longer last piece wins —
    // compare reversed piece-length sequences descending
    segs(0).maxBy(s => (score(s), s.reverse.map(_.length).mkString))
  }

  test("Viterbi matches brute-force enumeration on assorted words") {
    val m = model("a" -> -2000000L, "b" -> -3000000L, "c" -> -3500000L,
      "ab" -> -2500000L, "bc" -> -2600000L, "abc" -> -4000000L,
      "abab" -> -5000000L)
    for (w <- Seq("a", "ab", "abc", "abab", "ababab", "cabcab", "bcbcbc",
        "aaaa", "cccb", "abcabcab")) {
      val got = UnigramEncode.wordPieces(w, m).toSeq
      assert(got == bruteBest(w, m), s"word $w")
      assert(got.mkString == w, s"pieces must concatenate back: $w")
    }
  }

  test("ties break toward the longer piece") {
    // "ab" as one piece scores equal to "a"+"b": -5 vs -2 + -3
    val m = model("a" -> -2000000L, "b" -> -3000000L, "ab" -> -5000000L)
    assert(UnigramEncode.wordPieces("ab", m).toSeq == Seq("ab"))
    // and the same rule applies at every backward position
    assert(UnigramEncode.wordPieces("abab", m).toSeq == Seq("ab", "ab"))
  }

  test("out-of-vocabulary code points fall back to unk singles") {
    val m = model("a" -> -1000000L, "ab" -> -1500000L)
    assert(UnigramEncode.wordPieces("axb", m).toSeq == Seq("a", "x", "b"))
    // unk is expensive, so known pieces still win around it
    assert(UnigramEncode.wordPieces("abx", m).toSeq == Seq("ab", "x"))
    // supplementary-plane char is ONE unk piece, not two UTF-16 halves
    assert(UnigramEncode.wordPieces("a😀b", m).toSeq ==
      Seq("a", "😀", "b"))
  }

  test("document encode: word split, empties skipped, count = size") {
    val m = model("a" -> -1000000L, "b" -> -2000000L, "ab" -> -2500000L)
    val got = UnigramEncode.encode("ab  a b", m).map(_.toString).toSeq
    assert(got == Seq("ab", "a", "b"), s"got $got")
    assert(UnigramEncode.encode("", m).isEmpty)
  }

  test("training is deterministic and keeps every single code point") {
    import spark.implicits._
    val docs = Seq("banana bandana banana cabana", "banana cabana na na")
      .toDF("text")
    val m1 = Unigram.train(docs, "text")
    val m2 = Unigram.train(docs, "text")
    assert(m1.pieces.toSeq == m2.pieces.toSeq, "piece set must be stable")
    assert(m1.scores.toSeq == m2.scores.toSeq, "scores must be stable")
    for (c <- "bandc") // every char of the corpus survives pruning
      assert(m1.lookup.containsKey(c.toString), s"single '$c' pruned")
    assert(m1.unkScore < m1.scores.min, "unk must score below every piece")
    // frequent substrings should have been kept as multi-char pieces
    assert(m1.pieces.exists(_.length > 1), "no multi-char piece learned")
  }

  test("trained model segments the training corpus with finite scores") {
    import spark.implicits._
    val docs = Seq("banana bandana banana cabana na").toDF("text")
    val m = Unigram.train(docs, "text")
    for (w <- Seq("banana", "bandana", "cabana", "na")) {
      val ps = UnigramEncode.wordPieces(w, m)
      assert(ps.mkString == w)
      assert(ps.forall(m.lookup.containsKey), s"OOV piece for $w")
      assert(ps.toSeq == bruteBest(w, m), s"brute-force replay on $w")
    }
  }

  test("a model trained on one script flags another as pure OOV") {
    import spark.implicits._
    val latin = Seq("hola mundo hola bueno mundo").toDF("text")
    val m = Unigram.train(latin, "text")
    // cyrillic word: every code point is unseen → unk singles
    val ps = UnigramEncode.wordPieces("мир", m)
    assert(ps.toSeq == Seq("м", "и", "р"))
    assert(ps.forall(p => !m.lookup.containsKey(p)),
      "unseen-script pieces must be OOV")
    // …and the coverage join counts them: 3 OOV of 5 tokens
    val docs = Seq(("xx", "мир hola")).toDF("lang", "text")
    val pieces = broadcast(m.pieces.toSeq.toDF("piece"))
    val row = docs
      .select(col("lang"), explode(Unigram.encodeExpr(col("text"), m))
        .as("token"))
      .join(pieces, col("token") === col("piece"), "left")
      .agg(count(lit(1)).as("n"),
        sum(when(col("piece").isNull, 1L).otherwise(0L)).as("oov"))
      .head()
    assert(row.getLong(1) == 3L, s"expected 3 OOV, got $row")
  }

  test("encodeExpr through the codegen path matches the driver compute") {
    import spark.implicits._
    val m = model("a" -> -1000000L, "b" -> -2000000L, "ab" -> -2500000L,
      "ba" -> -2600000L)
    val docs = Seq((1L, "abab ba"), (2L, ""), (3L, "xa  b"))
      .toDF("id", "text")
    val got = docs.select(col("id"),
        Unigram.encodeExpr(col("text"), m).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1).toSeq).toMap
    for ((id, text) <- Seq(1L -> "abab ba", 2L -> "", 3L -> "xa  b"))
      assert(got(id) == UnigramEncode.encode(text, m).map(_.toString).toSeq,
        s"row $id")
    assert(got(1L) == Seq("ab", "ab", "ba"))
    assert(got(3L) == Seq("x", "a", "b"), "unk + empties skipped")
  }
}
