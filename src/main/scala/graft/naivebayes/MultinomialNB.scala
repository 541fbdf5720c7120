package graft.naivebayes

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multinomial Naive Bayes over hashed bag-of-words features — the
  * classic streaming-friendly text classifier (McCallum & Nigam 1998)
  * in the fastText hashed-feature representation the scorer expression
  * already speaks: class-conditional token counts are the ENTIRE
  * sufficient statistic, so
  *
  *  - fit is ONE exploded corpus pass to a ≤ |classes|·D count frame
  *    (map-side combinable; two fits merge by adding counts — the
  *    partial_fit contract for free);
  *  - predict is scan-fused: per class one
  *    [[graft.functions.HashedLinearScore]] (log-prior intercept +
  *    Σ log-likelihood weights over tokens, w[b] =
  *    ln((n_cb + α)/(n_c + αD))), argmax via a greatest() over
  *    (score, class) structs — no vector materialized, no shuffle.
  *
  * Token and bucket conventions match HashedLinearScore exactly
  * (split on single spaces keeping empties; house md5-60bit % D), so
  * the full train→score→argmax path replays in DuckDB SQL.
  */
class MultinomialNB(textCol: String, labelCol: String,
    numBuckets: Int = 2048, alpha: Double = 1.0) {
  require(numBuckets > 0 && alpha > 0)

  /** The HashedLinearScore bucket as a Column (house md5 trick). */
  private def bucketExpr(tok: Column): Column =
    pmod(conv(substring(md5(tok), 1, 15), 16, 10).cast("long"),
      lit(numBuckets.toLong))

  def fit(df: DataFrame): MultinomialNBModel = {
    val toks = df.select(col(labelCol).cast("string").as("__c"),
      explode(split(col(textCol), " ")).as("__tok"))
    val counts = toks
      .groupBy(col("__c"), bucketExpr(col("__tok")).as("__b"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1).toInt, r.getLong(2)))
    val docs = df.groupBy(col(labelCol).cast("string").as("__c"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totalDocs = docs.values.sum
    val tokTotals = counts.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val classes = docs.keys.toSeq.sorted
    val weights = classes.map { c =>
      val w = Array.fill(numBuckets)(
        math.log(alpha / (tokTotals(c) + alpha * numBuckets)))
      counts.iterator.filter(_._1 == c).foreach { case (_, b, n) =>
        w(b) = math.log((n + alpha) / (tokTotals(c) + alpha * numBuckets))
      }
      c -> w
    }.toMap
    val priors = classes.map(c =>
      c -> math.log(docs(c).toDouble / totalDocs)).toMap
    MultinomialNBModel(classes, priors, weights, numBuckets)
  }
}

/** @param weights per class: D log-likelihood weights (the hashed
  *   vocabulary); small driver-side summaries per the Memos contract.
  */
case class MultinomialNBModel(classes: Seq[String],
    priors: Map[String, Double], weights: Map[String, Array[Double]],
    numBuckets: Int) {

  /** Per-class log-posterior scores, rounded 6 (the cross-engine
    * argmax convention; ties break to the LARGEST class label — the
    * lexicographic max of the (score, class) struct). */
  def scoreStructs(text: Column): Seq[Column] =
    classes.map(c => struct(
      round(graft.functions.HashedLinearScore(text,
        weights(c).toIndexedSeq, priors(c)), 6).as("s"),
      lit(c).as("c")))

  def predict(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("pred",
      greatest(scoreStructs(col(textCol)): _*).getField("c"))
}
