package graft.featureextraction

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{Estimator, Model}

/** Ref: dask_ml.feature_extraction.text (feature_extraction/text.py).
  *
  *  - CountVectorizer (text.py:120-282): pass 1 = distributed distinct
  *    terms with document/total frequencies → sorted, bounded vocabulary
  *    (the reference's per-partition vocab sets merged by sorted union,
  *    text.py:274-282, with the vocabulary then broadcast/scattered,
  *    212-224). Here: one explode+groupBy job; the vocabulary literal
  *    broadcasts with the plan. Pass 2 = transform against the vocab.
  *  - HashingVectorizer (text.py:21-117): stateless hashing-trick
  *    vectorizer — no vocabulary pass; delegates to MLlib HashingTF.
  */
class CountVectorizer(
    val textCol: String,
    val vocabSize: Int = 1 << 18,
    val minDF: Long = 1,
    val lowercase: Boolean = true
) extends Estimator[CountVectorizerModel] {

  private[featureextraction] def tokensCol =
    if (lowercase) split(lower(col(textCol)), " ") else split(col(textCol), " ")

  def fit(df: DataFrame): CountVectorizerModel = {
    // one explode + one shuffle: per-term document frequency and total
    // count together, then bounded top-k vocabulary
    val withId = df.withColumn("__doc", monotonically_increasing_id())
      .select(col("__doc"), explode(tokensCol).as("term"))
    val agg = withId.groupBy("term").agg(
      countDistinct("__doc").as("df"),
      count(lit(1)).as("tf"))
      .filter(col("df") >= minDF)
      .orderBy(desc("tf"), asc("term"))
      .limit(vocabSize)
    val vocab = agg.select("term").collect().map(_.getString(0))
    new CountVectorizerModel(textCol, vocab.sorted, lowercase)
  }
}

class CountVectorizerModel(
    val textCol: String,
    val vocabulary: Array[String],
    val lowercase: Boolean
) extends Model {
  private val index = vocabulary.zipWithIndex.toMap

  private def tokensCol =
    if (lowercase) split(lower(col(textCol)), " ") else split(col(textCol), " ")

  /** Dense counts array aligned with `vocabulary`: one broadcast
    * hash-map lookup per TOKEN (O(tokens + V_row) per row), not one
    * expression per vocabulary term — the earlier per-term
    * `size(filter(...))` form generated O(V) Catalyst expressions and
    * O(V·tokens) work per row, which falls over long before the default
    * vocabulary size. Dense output is inherently O(V) per row, so it is
    * gated to small vocabularies; [[transformLong]] is the sparse scale
    * path.
    */
  def transform(df: DataFrame): DataFrame = {
    require(vocabulary.length <= (1 << 16),
      s"dense transform materializes ${vocabulary.length} counts per row; " +
        "use transformLong for large vocabularies")
    val bcIndex = df.sparkSession.sparkContext.broadcast(index)
    val counts = udf { tokens: Seq[String] =>
      val idx = bcIndex.value
      val out = new Array[Int](idx.size)
      tokens.foreach(t => idx.get(t) match {
        case Some(i) => out(i) += 1
        case None =>
      })
      out.toSeq
    }
    df.withColumn("tf", counts(tokensCol))
  }

  /** Long-format term counts (id, term, term_index, count) — restricted
    * to the vocabulary; the sparse, shuffle-friendly representation.
    */
  def transformLong(df: DataFrame, idCol: String): DataFrame = {
    val vocabDf = broadcast(df.sparkSession
      .createDataFrame(vocabulary.zipWithIndex.toSeq)
      .toDF("term", "term_index"))
    df.select(col(idCol), explode(tokensCol).as("term"))
      .groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
      .join(vocabDf, "term")
      .select(col(idCol), col("term"), col("term_index"), col("tf"))
  }
}

/** Stateless hashing vectorizer (MLlib HashingTF = murmur3 hashing
  * trick, same design as the reference's sklearn-delegating version).
  */
class HashingVectorizer(
    val textCol: String,
    val nFeatures: Int = 1 << 20,
    val lowercase: Boolean = true,
    val outputCol: String = "features"
) extends Model {
  def transform(df: DataFrame): DataFrame = {
    val toks = if (lowercase) split(lower(col(textCol)), " ") else split(col(textCol), " ")
    val withTokens = df.withColumn("__tokens", toks)
    new org.apache.spark.ml.feature.HashingTF()
      .setInputCol("__tokens").setOutputCol(outputCol)
      .setNumFeatures(nFeatures)
      .transform(withTokens)
      .drop("__tokens")
  }
}

/** FeatureHasher over arbitrary columns (MLlib native). */
class FeatureHasher(
    val inputCols: Seq[String],
    val nFeatures: Int = 1 << 18,
    val outputCol: String = "features"
) extends Model {
  def transform(df: DataFrame): DataFrame =
    new org.apache.spark.ml.feature.FeatureHasher()
      .setInputCols(inputCols: _*).setOutputCol(outputCol)
      .setNumFeatures(nFeatures)
      .transform(df)
}
