package graft.llmdata

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables
import graft.functions.HashedLinearScore

class QualityClassifierSpec extends SparkSpec {

  test("training is deterministic and produces a discriminative model") {
    val docs = Tables.documents(spark, sfDir)
    val (w1, b1) = QualityClassifier.train(docs, "text", "doc_id")
    val (w2, b2) = QualityClassifier.train(docs, "text", "doc_id")
    assert(w1.toSeq == w2.toSeq && b1 == b2, "training must be deterministic")
    assert(w1.length == QualityClassifier.D)
    // both classes must actually be predicted on the training corpus
    val m = QualityClassifier.marginExpr(col("text"), w1, b1)
    val preds = docs.select((m > 0).cast("int").as("p"))
      .groupBy("p").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(preds.keySet == Set(0, 1), s"degenerate predictions: $preds")
    // training accuracy vs the weak labels must beat the majority class
    val scored = docs.select(
      QualityClassifier.weakLabel(col("text")).as("y"),
      (m > 0).cast("double").as("p"))
    val n = scored.count().toDouble
    val acc = scored.filter(col("y") === col("p")).count() / n
    val base = math.max(
      scored.filter(col("y") === 1.0).count() / n,
      scored.filter(col("y") === 0.0).count() / n)
    info(f"training accuracy $acc%.3f vs majority baseline $base%.3f")
    assert(acc > base, f"classifier ($acc%.3f) must beat majority ($base%.3f)")
  }

  test("HashedLinearScore codegen path matches driver compute") {
    import spark.implicits._
    val w = Array.tabulate(QualityClassifier.D)(j => (j % 5) * 0.1 - 0.2)
    val texts = Seq((1L, "key agg row scan"), (2L, ""), (3L, "a  b"))
    val got = texts.toDF("id", "t")
      .select(col("id"), HashedLinearScore(col("t"), w.toIndexedSeq, 0.5).as("m"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    texts.foreach { case (id, t) =>
      assert(got(id) == HashedLinearScore.compute(t, w, 0.5), s"row $id")
    }
  }

  test("bucket matches the SQL md5 arithmetic") {
    import spark.implicits._
    val toks = Seq("key", "agg", "row", "", "héllo")
    val viaSql = toks.toDF("t")
      .select(col("t"), QualityClassifier.bucketExpr(col("t")).as("b"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    toks.foreach { t =>
      assert(viaSql(t) == HashedLinearScore.bucket(t, QualityClassifier.D),
        s"bucket mismatch for '$t'")
    }
  }
}
