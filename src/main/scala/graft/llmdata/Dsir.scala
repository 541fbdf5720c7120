package graft.llmdata

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling — DSIR (Xie et al.,
  * arXiv:2302.03169): select raw-corpus documents whose hashed-n-gram
  * distribution looks like a trusted target slice, by importance
  * weights under two bag-of-hashed-n-grams models.
  *
  *  - Features: unigrams + bigrams hashed into `b` buckets (the paper
  *    uses 10k; the gate default is 64 so the oracle's bucket table
  *    stays readable). The house md5 bucket makes the hash
  *    reproducible in integer SQL.
  *  - Models: add-one-smoothed bucket distributions for the target
  *    slice and the raw corpus — two bucket-count aggregations
  *    (map-side partial merge; B-row results regardless of corpus
  *    size).
  *  - Per-doc log importance weight: Σ over the doc's hashed grams of
  *    ln p_target[b] − ln p_raw[b]. Scoring is a broadcast join of the
  *    B-row ratio table onto the gram stream plus ONE groupBy(doc) —
  *    the corpus never joins anything corpus-sized.
  *  - Resampling: Gumbel top-k (sampling without replacement ∝ the
  *    importance weights): key = logw + Gumbel(md5(salt‖doc_id)) with
  *    the uniform drawn from 52 md5 bits, so both engines compute the
  *    identical key; selection is a bounded TakeOrdered, never a
  *    global sort materialization.
  *
  * Probabilities are rational in integer counts, so Spark and DuckDB
  * agree bit-for-bit before the ln; per-doc sums of ln terms see float
  * accumulation order only, absorbed by the gates' round(…, 6).
  */
object Dsir {

  /** Gate-default hashed-feature bucket count (production: O(10k)). */
  val B = 64

  /** Uni+bi-gram array per document. Bigrams pair the two length-(n−1)
    * slices via `zip_with`, NOT `transform(sequence(1, n-1), i =>
    * t(i-1) ‖ t(i))`: subexpression elimination does not descend into
    * lambda bodies, so the indexed form re-evaluates the `split` per
    * element — O(n²) per document (measured 30× on the gate corpus).
    * Here the split array is an argument of each slice, evaluated once
    * per row; n = 1 yields empty slices, so no size guard is needed.
    */
  def grams(textCol: Column): Column = {
    val t = split(textCol, " ")
    val n1 = size(t) - 1
    concat(t,
      zip_with(slice(t, lit(1), n1), slice(t, lit(2), n1),
        (a, b) => concat_ws(" ", a, b)))
  }

  /** House md5 bucket: 60 md5 bits mod `b` (non-negative, so Scala and
    * SQL `%` agree).
    */
  def bucket(g: Column, b: Int): Column =
    conv(substring(md5(g), 1, 15), 16, 10).cast("long") % b

  /** The `b`-row model table: (bucket, logratio) with
    * logratio = ln((ct+1)/(Nt+b)) − ln((cr+1)/(Nr+b)). Built over the
    * FULL 0..b-1 domain so unseen buckets still carry smoothed mass.
    *
    * Both models come out of ONE aggregation over the tagged union of
    * the two gram streams, collected (bounded: ≤ b rows) so the grand
    * totals come from the same pass — the naive shape (separate
    * per-model groupBys, referenced again by a totals aggregate) scans
    * the corpus-wide gram stream four times because Spark cannot reuse
    * those exchanges. The ln arithmetic stays in Spark expressions on
    * the literal integer counts, so scores are bit-identical to the
    * all-lazy formulation.
    */
  def bucketLogRatios(target: DataFrame, raw: DataFrame, textCol: String,
      b: Int = B): DataFrame = {
    val spark = target.sparkSession
    def gramBuckets(df: DataFrame, tag: Int) =
      graft.core.FanOut.byKey(df, textCol)
        .select(explode(grams(col(textCol))).as("g"))
        .select(bucket(col("g"), b).as("bucket"), lit(tag.toLong).as("t"))
    val counts = gramBuckets(target, 1).unionByName(gramBuckets(raw, 0))
      .groupBy("bucket")
      .agg(sum(col("t")).as("ct"), count(lit(1)).as("n"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2) - r.getLong(1)))
      .toMap
    val nt = counts.valuesIterator.map(_._1).sum
    val nr = counts.valuesIterator.map(_._2).sum
    import spark.implicits._
    (0L until b).map { k =>
      val (ct, cr) = counts.getOrElse(k, (0L, 0L))
      (k, ct, cr)
    }.toDF("bucket", "ct", "cr")
      .select(col("bucket"),
        (log((col("ct") + 1).cast("double") / lit((nt + b).toDouble))
          - log((col("cr") + 1).cast("double") / lit((nr + b).toDouble)))
          .as("logratio"))
  }

  /** Per-document (n_grams, logw): broadcast the B-row ratios onto the
    * gram stream, one groupBy(doc). The join is total — every bucket
    * 0..b-1 exists in `ratios`.
    */
  def importanceWeights(docs: DataFrame, textCol: String, idCol: String,
      ratios: DataFrame, b: Int = B): DataFrame =
    graft.core.FanOut.byKey(docs, idCol)
      .select(col(idCol), explode(grams(col(textCol))).as("g"))
      .select(col(idCol), bucket(col("g"), b).as("bucket"))
      .join(broadcast(ratios), Seq("bucket"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_grams"), sum("logratio").as("logw"))

  /** Scan-fused scoring: the B-row ratio table collapsed into an
    * in-plan map literal, the per-doc weight computed as a single
    * `aggregate` HOF over the gram array — NO explode, NO groupBy, NO
    * join. Stateless per row, so the identical expression scores a
    * structured STREAM (stream-static joins and aggregations never
    * enter the plan); it is also the right batch plan when B stays
    * map-literal-sized (≲10⁵). Returns struct(n_grams, logw).
    */
  def weightExpr(textCol: Column, ratios: Map[Long, Double],
      b: Int = B): Column = {
    require(ratios.keySet == (0L until b).toSet,
      s"ratios must cover the full 0..${b - 1} bucket domain")
    val m = map(ratios.toSeq.sortBy(_._1).flatMap {
      case (k, v) => Seq(lit(k), lit(v)) }: _*)
    val g = grams(textCol)
    struct(size(g).cast("long").as("n_grams"),
      aggregate(g, lit(0.0),
        (acc, gr) => acc + element_at(m, bucket(gr, b))).as("logw"))
  }

  /** Collect a [[bucketLogRatios]] frame into the literal map
    * [[weightExpr]] wants (bounded: exactly `b` rows).
    */
  def collectRatios(ratios: DataFrame): Map[Long, Double] =
    ratios.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  /** Deterministic Gumbel perturbation from 52 md5 bits of
    * (salt‖doc_id): u ∈ (0,1) exactly representable, g = −ln(−ln u).
    * 52 bits keep the long→double cast exact in BOTH engines.
    */
  def gumbelKey(id: Column, logw: Column, salt: String = "dsir"): Column = {
    val h = conv(substring(md5(concat(lit(salt), id.cast("string"))), 1, 13),
      16, 10).cast("double")
    val u = (h + 1.0) / lit(4503599627370497.0) // 2^52 + 1
    logw - log(-log(u))
  }

  /** Gumbel top-k resample: k docs without replacement, inclusion
    * probability ∝ softmax of logw. Ranked on the ROUNDED key (house
    * cross-engine convention), id as tiebreak; bounded TakeOrdered.
    */
  def resample(weights: DataFrame, idCol: String, k: Int,
      salt: String = "dsir"): DataFrame =
    weights
      .select(col(idCol),
        round(gumbelKey(col(idCol), col("logw"), salt), 6).as("gkey"))
      .orderBy(desc("gkey"), col(idCol))
      .limit(k)
}
