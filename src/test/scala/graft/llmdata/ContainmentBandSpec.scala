package graft.llmdata

import graft.SparkSpec
import graft.core.Tables

/** Pins the recall/exactness contract of the containment df band on the
  * gate corpus (500 docs, threshold 0.8): banded results are always a
  * SUBSET of the exact join with IDENTICAL containment values on
  * surviving pairs (verification runs on full sets), recall is monotone
  * in the band, and the production preset's default band keeps the
  * measured recall stated in [[Dedup.containmentNearDups]]'s scaladoc.
  */
class ContainmentBandSpec extends SparkSpec {

  private def pairs(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Double] = {
    val m = df.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    df.unpersist(blocking = false)
    m
  }

  test("df band: subset of exact, identical values, monotone recall, default band recall") {
    val docs = Tables.documents(spark, sfDir)
    val nDocs = docs.count()
    val exact = pairs(Dedup.containmentPairs(docs, "text", "doc_id", 0.8))
    assert(exact.nonEmpty, "gate corpus must have containment pairs")
    var prevRecall = -1.0
    Seq(5L, 15L, 50L, 150L).foreach { band =>
      val got = pairs(Dedup.containmentPairs(docs, "text", "doc_id", 0.8,
        maxDf = band))
      assert(got.keySet.subsetOf(exact.keySet),
        s"band $band invented pairs: ${got.keySet.diff(exact.keySet)}")
      got.foreach { case (k, v) =>
        assert(v == exact(k), s"band $band changed value of $k: $v vs ${exact(k)}")
      }
      val recall = got.size.toDouble / exact.size
      info(f"maxDf=$band%3d (${band * 100.0 / nDocs}%4.1f%% of docs): recall $recall%.3f (${got.size}/${exact.size})")
      assert(recall >= prevRecall, "recall must be monotone in the band")
      prevRecall = recall
    }
    val preset = pairs(Dedup.containmentNearDups(docs, "text", "doc_id", 0.8,
      knownDocCount = nDocs))
    val presetRecall = preset.size.toDouble / exact.size
    info(f"default preset (10%% band): recall $presetRecall%.3f")
    assert(preset.keySet.subsetOf(exact.keySet))
    assert(presetRecall == 1.0,
      "scaladoc claims recall 1.0 at the default band on the gate corpus — " +
        f"measured $presetRecall%.3f; re-measure and update BOTH if the corpus changed")
  }
}
