package graft.llmdata

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Exact-substring dedup (Lee et al. ExactSubstr re-expression):
  * span detection vs a from-first-principles Scala oracle, alignment
  * independence of the content-defined sampling, and span removal.
  */
class ExactSubstrSpec extends SparkSpec {
  import spark.implicits._

  private val K = 25

  /** The operator's sampling rule, recomputed independently. */
  private def sampled(gram: String): Boolean = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(gram.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    hex.startsWith("0")
  }

  /** Brute-force reference: sampled duplicated anchors -> merged spans. */
  private def refSpans(docs: Seq[(Long, String)]): Map[Long, Seq[(Int, Int)]] = {
    val grams = for {
      (id, t) <- docs if t.length >= K
      p <- 0 to t.length - K
      g = t.substring(p, p + K) if sampled(g)
    } yield (id, p, g)
    val counts = grams.groupBy(_._3).view.mapValues(_.size).toMap
    val marked = grams.filter(g => counts(g._3) > 1)
    marked.groupBy(_._1).view.mapValues { ps =>
      val sorted = ps.map(_._2).sorted
      sorted.foldLeft(List.empty[(Int, Int)]) {
        case (acc, p) if acc.nonEmpty && p <= acc.head._2 =>
          (acc.head._1, math.max(acc.head._2, p + K)) :: acc.tail
        case (acc, p) => (p, p + K) :: acc
      }.reverse
    }.toMap
  }

  private def rndText(rnd: scala.util.Random, n: Int): String =
    Seq.fill(n)(('a' + rnd.nextInt(26)).toChar).mkString

  test("spans match the brute-force oracle; misaligned copies are caught") {
    val rnd = new scala.util.Random(3)
    val shared = rndText(rnd, 120) // ~96 anchors-at-stake; P(none) ~ 2e-3
    val docs = Seq(
      1L -> (rndText(rnd, 37) + shared + rndText(rnd, 50)),  // offset 37
      2L -> (rndText(rnd, 14) + shared + rndText(rnd, 9)),   // offset 14
      3L -> rndText(rnd, 200),                               // clean
      4L -> rndText(rnd, 10))                                // shorter than k
    val ref = refSpans(docs)
    assert(ref(1L).nonEmpty && ref(2L).nonEmpty,
      "fixture must contain at least one shared anchor")
    val got = Dedup.exactSubstrSpans(docs.toDF("doc_id", "text"), "text",
        "doc_id", k = K)
      .as[(Long, Int, Int)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).sorted.toSeq).toMap
    assert(got == ref.filter(_._2.nonEmpty))
    // the duplicated span sits inside the shared region at each offset
    val (s1, e1) = got(1L).head
    val (s2, e2) = got(2L).head
    assert(s1 >= 37 && e1 <= 37 + 120 && s2 >= 14 && e2 <= 14 + 120)
    assert(e1 - s1 == e2 - s2, "same content -> same span length")
  }

  test("within-doc repetition marks both copies") {
    val rnd = new scala.util.Random(5)
    val run = rndText(rnd, 100)
    val doc = Seq(9L -> (run + rndText(rnd, 40) + run))
    val ref = refSpans(doc)
    val got = Dedup.exactSubstrSpans(doc.toDF("doc_id", "text"), "text",
        "doc_id", k = K)
      .as[(Long, Int, Int)].collect().map(t => (t._2, t._3)).sorted.toSeq
    assert(got == ref(9L))
    assert(got.size == 2, s"two separated copies -> two spans, got $got")
  }

  test("removeSpans stitches the kept regions; clean docs pass through") {
    val rnd = new scala.util.Random(3)
    val shared = rndText(rnd, 120)
    val docs = Seq(
      1L -> (rndText(rnd, 37) + shared + rndText(rnd, 50)),
      2L -> (rndText(rnd, 14) + shared + rndText(rnd, 9)),
      3L -> rndText(rnd, 200))
    val df = docs.toDF("doc_id", "text")
    val spans = Dedup.exactSubstrSpans(df, "text", "doc_id", k = K)
    val got = Dedup.removeSpans(df, spans, "text", "doc_id")
      .select("doc_id", "text_dedup").as[(Long, String)].collect().toMap
    val ref = refSpans(docs)
    for ((id, t) <- docs) {
      val keep = ref.getOrElse(id, Nil)
        .foldLeft((0, new StringBuilder)) { case ((pos, sb), (s, e)) =>
          (e, sb.append(t.substring(pos, s)))
        }
      val expect = keep._2.append(t.substring(keep._1)).toString
      assert(got(id) == expect, s"doc $id")
    }
    assert(got(3L) == docs.find(_._1 == 3L).get._2)
  }

  test("stats include zero-span docs with frac 0") {
    val rnd = new scala.util.Random(3)
    val shared = rndText(rnd, 120)
    val docs = Seq(
      1L -> (shared + rndText(rnd, 30)),
      2L -> (rndText(rnd, 60) + shared),
      3L -> rndText(rnd, 150))
    val got = Dedup.exactSubstrStats(docs.toDF("doc_id", "text"), "text",
        "doc_id", k = K)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(got.map(_._1) == Seq(1L, 2L, 3L))
    assert(got(2) == ((3L, 0L, 0L, 0.0)))
    val d1 = got(0)
    assert(d1._2 >= 1L && d1._3 > 0L)
    assert(d1._4 == math.round(d1._3.toDouble / 150 * 1e6) / 1e6)
  }
}
