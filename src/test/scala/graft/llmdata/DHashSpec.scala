package graft.llmdata

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.DHash64

class DHashSpec extends SparkSpec {

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("dHash basics: empty, identity, locality, discrimination") {
    val text = ("the quick brown fox jumps over the lazy dog " * 12).trim
    val bytes = text.getBytes("UTF-8")
    assert(DHash64.compute(Array.emptyByteArray) == 0L)
    assert(DHash64.compute(bytes) == DHash64.compute(bytes.clone()),
      "identical content must collide")
    // a local same-length patch perturbs only the cells covering it
    val patched = ("xxxxx" + text.substring(5)).getBytes("UTF-8")
    assert(hamming(DHash64.compute(bytes), DHash64.compute(patched)) <= 7,
      "near-dup within the Hamming band")
    // unrelated content of the same length should differ broadly
    val other = ("zqvwk mbtnp crldj aeiou ghsyf xwzqv jkmbt npcrl " * 12).trim
      .substring(0, text.length).getBytes("UTF-8")
    assert(hamming(DHash64.compute(bytes), DHash64.compute(other)) > 7,
      "unrelated content lands outside the band")
  }

  test("codegen path matches driver compute") {
    import spark.implicits._
    val df = Seq((1L, "alpha beta gamma delta epsilon zeta"), (2L, ""))
      .toDF("id", "t")
      .withColumn("b", encode(col("t"), "utf-8"))
    val got = df.select(col("id"), DHash64(col("b")).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == DHash64.compute(
      "alpha beta gamma delta epsilon zeta".getBytes("UTF-8")))
    assert(got(2L) == 0L)
  }

  test("nearDuplicateMedia banding equals brute force on a synthetic set") {
    import spark.implicits._
    val base = "key agg row scan slow fast table value part hash " * 10
    val docs = (0L until 20L).map { i =>
      // docs 0-9 distinct-ish, 10-19 are near-dup clones of 0-9
      if (i < 10) (i, base + s"doc$i unique tail content $i $i $i")
      else (i, "xxxxx" + (base + s"doc${i - 10} unique tail content ${i - 10} ${i - 10} ${i - 10}").substring(5))
    }.toDF("media_id", "t")
    val media = Multimodal.binarize(docs, "t", "image")
    val banded = Multimodal.nearDuplicateMedia(media, "media_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // brute force on the driver
    val hs = docs.collect().map(r =>
      r.getLong(0) -> DHash64.compute(r.getString(1).getBytes("UTF-8"))).toMap
    val brute = (for {
      a <- 0L until 20L; b <- (a + 1) until 20L
      h = hamming(hs(a), hs(b)) if h <= 7
    } yield (a, b, h)).toSet
    assert(banded == brute, s"banding missed/invented pairs: $banded vs $brute")
    assert(brute.exists { case (a, b, _) => b == a + 10 },
      "the synthetic clones must land inside the band")
  }

  test("hammingNearDupPairs rejects chunk widths that break the pigeonhole") {
    import spark.implicits._
    val hashes = Seq((1L, 5L), (2L, 7L)).toDF("id", "h")
    intercept[IllegalArgumentException] {
      Dedup.hammingNearDupPairs(hashes, "id", "h", maxHamming = 6, bits = 64)
    }
  }
}
