package graft.llmdata

import graft.SparkSpec
import graft.core.Tables
import org.apache.spark.sql.functions._

class NgramLmSpec extends SparkSpec {
  import spark.implicits._

  test("score matches a from-first-principles bigram LM on a tiny corpus") {
    val ref = Seq("the cat sat", "the cat ran", "a dog sat")
    val docs = (ref ++ Seq("the cat sat", "zebra qux", "a cat sat the")).zipWithIndex
      .map { case (t, i) => (i.toLong, t, i < ref.size) }
    val df = docs.toDF("doc_id", "text", "is_ref")
    val got = NgramLm.perplexityScore(df, "text", "doc_id", col("is_ref"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap

    // reference model recomputed independently
    val toks = ref.map(_.split(" ").toSeq)
    val uni = toks.flatten.groupBy(identity).view.mapValues(_.size).toMap
    val bi = toks.flatMap(t => t.sliding(2).map(_.mkString(" ")))
      .groupBy(identity).view.mapValues(_.size).toMap
    val n = toks.map(_.size).sum
    val v = uni.size
    def puni(w: String) = (uni.getOrElse(w, 0) + 1).toDouble / (n + v)
    def p(prev: Option[String], w: String): Double = prev match {
      case None => puni(w)
      case Some(pr) =>
        val pb = uni.get(pr) match {
          case Some(cp) => bi.getOrElse(s"$pr $w", 0).toDouble / cp
          case None => 0.0
        }
        0.9 * pb + 0.1 * puni(w)
    }
    for ((id, text, _) <- docs) {
      val t = text.split(" ").toSeq
      val ps = t.zipWithIndex.map { case (w, i) =>
        p(if (i == 0) None else Some(t(i - 1)), w)
      }
      val nll = -ps.map(math.log).sum / ps.size
      val (gn, gnll) = got(id)
      assert(gn == t.size, s"doc $id token count")
      assert(gnll ~== (nll, 1e-12), s"doc $id nll: got $gnll want $nll")
    }
    // a doc made of seen bigrams scores better than unseen-vocab gibberish
    assert(got(3L)._2 < got(4L)._2)
  }

  test("on real data: the trusted-language slice scores lower NLL") {
    val docs = Tables.documents(spark, sfDir)
    val scored = NgramLm.perplexityScore(docs, "text", "doc_id",
        col("lang") === "en")
      .join(docs.select("doc_id", "lang"), "doc_id")
    val byLang = scored.groupBy("lang").agg(avg("nll").as("m"))
      .as[(String, Double)].collect().toMap
    assert(byLang("en") < byLang("zh") && byLang("en") < byLang("de") &&
      byLang("en") < byLang("es") && byLang("en") < byLang("fr"),
      s"en must be the low-perplexity slice: $byLang")
  }

  test("kneserNeyScore matches a from-first-principles KN model") {
    val ref = Seq("san francisco is big", "san francisco is far",
      "york is big", "new york is big")
    val probe = Seq("san francisco", "new francisco", "zzz qqq")
    val all = (ref ++ probe).zipWithIndex
      .map { case (t, i) => (i.toLong, t, if (i < ref.length) "en" else "xx") }
      .toDF("doc_id", "text", "lang")
    val got = NgramLm.kneserNeyScore(all, "text", "doc_id",
        col("lang") === "en", discount = 0.75)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap

    // independent recount
    val toks = ref.map(_.split(" ").toSeq)
    val bi = toks.flatMap(_.sliding(2).map(s => (s(0), s(1))))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cctx = bi.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val n1f = bi.groupBy(_._1._1).view.mapValues(_.size.toLong).toMap
    val n1b = bi.groupBy(_._1._2).view.mapValues(_.size.toLong).toMap
    val nBiTypes = bi.size.toLong
    val v = toks.flatten.distinct.size.toLong
    def pcont(w: String) =
      (n1b.getOrElse(w, 0L) + 1).toDouble / (nBiTypes + v).toDouble
    def p(prev: Option[String], w: String): Double = prev match {
      case Some(pr) if cctx.contains(pr) =>
        math.max(bi.getOrElse((pr, w), 0L).toDouble - 0.75, 0.0) / cctx(pr) +
          0.75 * n1f(pr).toDouble / cctx(pr) * pcont(w)
      case _ => pcont(w)
    }
    (ref ++ probe).zipWithIndex.foreach { case (text, i) =>
      val ws = text.split(" ").toSeq
      val ps = ws.zipWithIndex.map { case (w, j) =>
        p(if (j > 0) Some(ws(j - 1)) else None, w)
      }
      val want = BigDecimal(-ps.map(math.log).sum / ps.length)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      val (n, nll) = got(i.toLong)
      assert(n == ws.length, s"doc $i n_tokens")
      assert(math.abs(nll - want) < 2e-6, s"doc $i: got $nll want $want")
    }
    // the KN property: "francisco" after "san" (its only context) is
    // likely; after the unseen-as-context "new"... the continuation
    // prob of francisco (1 distinct context) is LOW vs "is" or "big"
    assert(pcont("francisco") < pcont("is"),
      "continuation prob must punish single-context words")
    // seen bigram beats unseen-context backoff for the same word
    assert(p(Some("san"), "francisco") > p(Some("new"), "francisco"))
  }

  test("perplexityBuckets: per-key terciles match a brute-force replay") {
    val docs = Tables.documents(spark, sfDir).limit(200)
    val got = NgramLm.perplexityBuckets(docs, "text", "doc_id", "lang")
      .as[(Long, String, Long, Double, String)].collect()

    // expected labels from an independent interpolated-percentile replay
    def percentile(sorted: Array[Double], p: Double): Double = {
      val rank = p * (sorted.length - 1)
      val lo = rank.toInt
      if (lo == sorted.length - 1) sorted(lo)
      else sorted(lo) + (rank - lo) * (sorted(lo + 1) - sorted(lo))
    }
    val round6 = (x: Double) =>
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    got.groupBy(_._2).foreach { case (lang, rows) =>
      val nlls = rows.map(_._4).sorted
      val c1 = round6(percentile(nlls, 1.0 / 3))
      val c2 = round6(percentile(nlls, 2.0 / 3))
      rows.foreach { case (id, _, _, nll, bucket) =>
        val want =
          if (nll <= c1) "head" else if (nll <= c2) "middle" else "tail"
        assert(bucket == want,
          s"doc $id ($lang): nll=$nll cuts=($c1,$c2) got $bucket")
      }
      // terciles are balanced within interpolation slack
      val sizes = rows.groupBy(_._5).view.mapValues(_.size)
      assert(sizes.values.max - sizes.values.min <= 2,
        s"$lang tercile sizes skewed: ${sizes.toMap}")
    }
    // every language contributes to every bucket on this corpus
    assert(got.map(r => (r._2, r._5)).distinct.length ==
      got.map(_._2).distinct.length * 3)
  }
}
