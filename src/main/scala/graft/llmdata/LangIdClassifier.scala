package graft.llmdata

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.HashedLinearScore

/** Trained multiclass language identifier — the fastText-langid shape
  * (Joulin arXiv:1607.01759, the model behind lid.176): a linear
  * classifier over hashed bag-of-words features, trained one-vs-rest
  * with the existing GLM surface, applied as K scan-fused
  * [[HashedLinearScore]] margins + an in-plan argmax. Complements the
  * rule-based [[TextStats]] language heuristic (q_lang_id) with the
  * trained path real pipelines deploy.
  *
  * Train-time: ONE hashed-feature aggregation (D columns, bounded) is
  * shared across all K binary fits — the per-class loop only re-labels.
  * At 100 TB you train on a content-hash sample
  * ([[graft.modelselection.Splits.hashSample]]), never the corpus.
  * Score-time: no features materialize; each class margin is one pass
  * over the tokens inside WholeStageCodegen with its weights in-plan,
  * and the argmax is an `array_max` over K (margin, -classRank)
  * structs — rounded margins (1e-6) with class-ascending tie break so
  * both engines elect the same label at rank boundaries.
  */
object LangIdClassifier {

  /** Hashed-feature bucket count. More buckets than the binary quality
    * classifier (32): K one-vs-rest models share the same feature
    * space, so collisions hurt every class at once.
    */
  val D = 256

  /** One-vs-rest training: returns (class, weights, intercept) sorted
    * by class ascending — the order the argmax tie break assumes.
    */
  def train(docs: DataFrame, textCol: String, idCol: String,
      labelCol: String, d: Int = D): Seq[(String, Array[Double], Double)] = {
    val classes = docs.select(col(labelCol)).distinct()
      .collect().map(_.getString(0)).sorted
    require(classes.nonEmpty && classes.length <= 1000,
      s"class inventory must be small/bounded, got ${classes.length}")
    val feats = QualityClassifier.hashedFeatures(
      docs.select(col(idCol), col(textCol)), textCol, idCol, d)
      .join(docs.select(col(idCol), col(labelCol)), Seq(idCol))
      .persist()
    feats.count() // materialize once; K fits share the cached features
    val models = classes.toSeq.map { c =>
      val data = feats.withColumn("label",
        (col(labelCol) === c).cast("double"))
      val m = new graft.linear.LogisticRegression(
        (0 until d).map(j => s"f$j"), "label").fit(data)
      (c, m.coef, m.intercept)
    }
    feats.unpersist(blocking = false)
    models
  }

  /** Per-class margin columns (rounded to 1e-6 — the cross-engine
    * ranking convention), class-ascending.
    */
  def marginExprs(text: Column,
      models: Seq[(String, Array[Double], Double)]): Seq[(String, Column)] =
    models.sortBy(_._1).map { case (c, w, b) =>
      c -> round(HashedLinearScore(text, w.toIndexedSeq, b), 6)
    }

  /** Predicted class: argmax of rounded margins, ties to the
    * lexicographically least class (via the -rank struct field).
    */
  def predictExpr(text: Column,
      models: Seq[(String, Array[Double], Double)]): Column = {
    val entries = marginExprs(text, models).zipWithIndex.map {
      case ((c, m), i) =>
        struct(m.as("m"), lit(-i).as("nr"), lit(c).as("cls"))
    }
    array_max(array(entries: _*)).getField("cls")
  }

  /** Per-dir trained model memo (the trained-index pattern: queries
    * run first and populate it; oracle generation reads it back).
    */
  private val memo = graft.core.Memos.register(
    new java.util.concurrent.ConcurrentHashMap[String, Seq[(String, Array[Double], Double)]]())
  def trained(s: SparkSession, dir: String): Seq[(String, Array[Double], Double)] =
    memo.computeIfAbsent(dir, d =>
      train(Tables.documents(s, d), "text", "doc_id", "lang"))
  def memoized: List[Seq[(String, Array[Double], Double)]] = {
    import scala.jdk.CollectionConverters._
    memo.values.asScala.toList
  }

  /** DuckDB CTE block ending in `lpred(doc_id, pred_lang)`: weights and
    * intercepts as VALUES keyed by class rank, the house md5 bucket,
    * per-(doc, class) margin replayed per token, argmax via
    * row_number(m DESC, cls ASC) — the same rounded-margin election.
    */
  def predictCteSql(models: Seq[(String, Array[Double], Double)],
      srcTable: String = "documents", d: Int = D): String = {
    val sorted = models.sortBy(_._1)
    val wVals = (for {
      ((_, w, _), k) <- sorted.zipWithIndex
      (wj, j) <- w.zipWithIndex
    } yield s"($k,$j,CAST($wj AS DOUBLE))").mkString(",")
    val iVals = sorted.zipWithIndex
      .map { case ((_, _, b), k) => s"($k,CAST($b AS DOUBLE))" }.mkString(",")
    val cVals = sorted.zipWithIndex
      .map { case ((c, _, _), k) => s"($k,'$c')" }.mkString(",")
    s"""lw(cls, b, wt) AS (SELECT * FROM (VALUES $wVals)),
       |li(cls, b0) AS (SELECT * FROM (VALUES $iVals)),
       |lcls(cls, cname) AS (SELECT * FROM (VALUES $cVals)),
       |ltok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS t
       |         FROM $srcTable),
       |ltb AS (SELECT doc_id,
       |          ('0x' || substr(md5(t), 1, 15))::BIGINT % $d AS b
       |        FROM ltok),
       |lsum AS (SELECT doc_id, lw.cls, sum(lw.wt) AS s
       |         FROM ltb JOIN lw ON lw.b = ltb.b GROUP BY doc_id, lw.cls),
       |lmg AS (SELECT doc_id, lsum.cls, round(li.b0 + lsum.s, 6) AS m
       |        FROM lsum JOIN li ON li.cls = lsum.cls),
       |lrk AS (SELECT doc_id, cls, m, row_number() OVER
       |          (PARTITION BY doc_id ORDER BY m DESC, cls) AS rn
       |        FROM lmg),
       |lpred AS (SELECT lrk.doc_id, lcls.cname AS pred_lang
       |          FROM lrk JOIN lcls ON lcls.cls = lrk.cls
       |          WHERE lrk.rn = 1)""".stripMargin
  }
}
