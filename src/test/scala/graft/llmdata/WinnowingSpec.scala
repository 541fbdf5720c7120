package graft.llmdata

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Winnowing fingerprints vs a literal-from-the-paper replay: rolling
  * window min with rightmost ties, the ≥ w+k−1 detection guarantee,
  * and the 2/(w+1) density bound.
  */
class WinnowingSpec extends SparkSpec {
  import spark.implicits._

  private def hash60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(
      md.map(b => f"$b%02x").mkString.substring(0, 15), 16)
  }

  /** Paper algorithm, verbatim: all windows, min with rightmost tie. */
  private def winnow(text: String, k: Int, w: Int): Set[(Int, Long)] = {
    if (text.length < k) return Set.empty
    val hs = (0 to text.length - k).map(p => hash60(text.substring(p, p + k)))
    val starts = if (hs.length < w) Seq(0) else 0 to hs.length - w
    starts.map { s =>
      val sl = hs.slice(s, s + w)
      val mn = sl.min
      val rightmost = s + sl.lastIndexOf(mn)
      (rightmost, mn)
    }.toSet
  }

  private def run(docs: Seq[(Long, String)], k: Int, w: Int) =
    TextStats.winnowingFingerprints(docs.toDF("doc_id", "text"),
        "text", "doc_id", k, w)
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).view
      .mapValues(_.map(r => (r._2, r._3)).toSet).toMap

  test("matches the paper algorithm on varied docs incl. tie-heavy ones") {
    val docs = Seq(
      1L -> "do run run run do run run",        // repeated grams → hash ties
      2L -> "the quick brown fox jumps over the lazy dog",
      3L -> "aaaaaaaaaaaaaaaaaaaa",             // ALL grams tie
      4L -> "abc",                              // < k → no fingerprints
      5L -> "abcde")                            // nh = 2 < w → one window
    val (k, w) = (4, 3)
    val got = run(docs, k, w)
    docs.foreach { case (id, text) =>
      val want = winnow(text, k, w)
      assert(got.getOrElse(id, Set.empty) == want,
        s"doc $id: got ${got.get(id)} want $want")
    }
    assert(!got.contains(4L))
    assert(got(5L).size == 1, "single short-doc window selects one print")
  }

  test("property: native expression matches the paper replay on seeded random docs") {
    // deterministic pseudo-random corpus over a tiny alphabet (forces
    // hash ties and repeated grams) across several (k, w) shapes
    val rnd = new scala.util.Random(42)
    val alphabet = "abcd "
    val docs = (1L to 20L).map { id =>
      val len = 5 + rnd.nextInt(60)
      id -> (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    for ((k, w) <- Seq((3, 4), (5, 2), (2, 7))) {
      val got = run(docs, k, w)
      docs.foreach { case (id, text) =>
        val want = winnow(text, k, w)
        assert(got.getOrElse(id, Set.empty) == want,
          s"doc $id k=$k w=$w: got ${got.get(id)} want $want (text=$text)")
      }
    }
  }

  test("guarantee: docs sharing a substring >= w+k-1 share a fingerprint") {
    val shared = "zqxwvutsrqponmlk"  // 16 chars >= w+k-1 = 15
    val (k, w) = (8, 8)
    val docs = Seq(
      10L -> s"prefix junk $shared and a suffix tail here",
      11L -> s"completely different start ${shared} other end",
      12L -> "no overlap with anything else whatsoever at all")
    val got = run(docs, k, w)
    val common = got(10L).map(_._2).intersect(got(11L).map(_._2))
    assert(common.nonEmpty, "guaranteed shared fingerprint missing")
    assert(got(12L).map(_._2).intersect(got(10L).map(_._2)).isEmpty)
  }

  test("density stays near 2/(w+1)") {
    val rnd = new scala.util.Random(3)
    val text = (1 to 2000).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val (k, w) = (5, 9)
    val got = run(Seq(20L -> text), k, w)(20L)
    val density = got.size.toDouble / (text.length - k + 1)
    // expected 2/(w+1) = 0.2 on random input
    assert(density > 0.1 && density < 0.3, s"density $density")
  }
}
