package graft.preprocessing

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.{Estimator, Model}

/** Categorical encoders. Fit = distributed distinct + sort (the
  * reference's `da.unique`, label.py:289-292) collected to the driver —
  * category cardinality is assumed bounded (same contract as the
  * reference and as MLlib's StringIndexer). Transform = a broadcast
  * literal map lookup (`element_at(map_lit, col)`), which stays inside
  * whole-stage codegen — no UDF, no join, no shuffle; at 100 TB this is
  * a map-side-only stage fused into the scan.
  */
object Encoders {
  /** Distinct values of each column, sorted ascending, one Spark job
    * (single pass, grouped distinct per column via explode-free unions
    * would shuffle once per column; for few columns this is fine and
    * each result is tiny).
    */
  /** Driver-side cardinality guard: collecting an unbounded distinct
    * would OOM the driver at scale; fail fast instead (same bounded-
    * category contract as the reference / StringIndexer).
    */
  val maxCategories: Int = 100000

  private[preprocessing] def categories(df: DataFrame, cols: Seq[String]): Map[String, Array[String]] =
    cols.map { c =>
      // take(limit+1) compiles to TakeOrderedAndProject (top-k per
      // partition + merge) — no full collect even on overflow
      val vals = df.select(col(c).cast("string")).na.drop().distinct()
        .orderBy(col(c)).take(maxCategories + 1).map(_.getString(0))
      require(vals.length <= maxCategories,
        s"column $c has more than $maxCategories distinct values; " +
          "categorical encoders require bounded cardinality")
      c -> vals
    }.toMap

  private[preprocessing] def codeExpr(c: String, cats: Array[String]): Column = {
    val kv = cats.zipWithIndex.flatMap { case (v, i) => Seq(lit(v), lit(i)) }
    element_at(map(kv.toIndexedSeq: _*), col(c).cast("string"))
  }

  private[preprocessing] def decodeExpr(codeCol: Column, cats: Array[String]): Column =
    element_at(array(cats.map(lit).toIndexedSeq: _*), (codeCol + lit(1)).cast("int"))
}

/** Ref: dask_ml.preprocessing.LabelEncoder (preprocessing/label.py:91-248).
  * classes_ = sorted distinct; transform maps value→code (searchsorted per
  * block in the reference, label.py:217-232); unseen values yield null
  * (or error when `errorOnUnseen`). Inverse = code→value.
  */
class LabelEncoder(
    val inputCol: String,
    val outputCol: String = "label_encoded",
    val errorOnUnseen: Boolean = true
) extends Estimator[LabelEncoderModel] {
  def fit(df: DataFrame): LabelEncoderModel =
    new LabelEncoderModel(inputCol, outputCol,
      Encoders.categories(df, Seq(inputCol))(inputCol), errorOnUnseen)
}

class LabelEncoderModel(
    val inputCol: String,
    val outputCol: String,
    val classes: Array[String],
    val errorOnUnseen: Boolean
) extends Model {
  def transform(df: DataFrame): DataFrame = {
    val code = Encoders.codeExpr(inputCol, classes)
    val checked =
      if (errorOnUnseen)
        when(col(inputCol).isNotNull && code.isNull,
          raise_error(concat(lit(s"unseen label in $inputCol: "), col(inputCol))))
          .otherwise(code)
      else code
    df.withColumn(outputCol, checked)
  }
  /** label.py:159-196. */
  override def inverseTransform(df: DataFrame): DataFrame =
    df.withColumn(inputCol, Encoders.decodeExpr(col(outputCol), classes))
      .drop(outputCol)
}

/** Ref: dask_ml.preprocessing.OrdinalEncoder (preprocessing/data.py:837-1045).
  * Each categorical column → integer codes (cat.codes); inverse rebuilds
  * the strings.
  */
class OrdinalEncoder(val cols: Seq[String]) extends Estimator[OrdinalEncoderModel] {
  def fit(df: DataFrame): OrdinalEncoderModel =
    new OrdinalEncoderModel(cols, Encoders.categories(df, cols))
}

class OrdinalEncoderModel(
    val cols: Seq[String],
    val categories: Map[String, Array[String]]
) extends Model {
  def transform(df: DataFrame): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, Encoders.codeExpr(c, categories(c))))
  override def inverseTransform(df: DataFrame): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, Encoders.decodeExpr(col(c), categories(c))))
}

/** Ref: dask_ml.preprocessing.DummyEncoder (preprocessing/data.py:583-834).
  * get_dummies-style: each categorical column expands to one 0/1
  * indicator column per category, named `{col}_{value}`; `dropFirst`
  * mirrors `drop_first` (and MLlib's `dropLast`, inverted). Inverse =
  * per-row argmax over the indicator block rebuilt into the category
  * string (data.py:700-760).
  */
class DummyEncoder(
    val cols: Seq[String],
    val dropFirst: Boolean = false
) extends Estimator[DummyEncoderModel] {
  def fit(df: DataFrame): DummyEncoderModel =
    new DummyEncoderModel(cols, Encoders.categories(df, cols), dropFirst)
}

class DummyEncoderModel(
    val cols: Seq[String],
    val categories: Map[String, Array[String]],
    val dropFirst: Boolean
) extends Model {
  def outputColumns(c: String): Seq[String] = {
    val cats = if (dropFirst) categories(c).toSeq.drop(1) else categories(c).toSeq
    cats.map(v => s"${c}_$v")
  }
  def transform(df: DataFrame): DataFrame =
    cols.foldLeft(df) { (d, c) =>
      val cats = if (dropFirst) categories(c).toSeq.drop(1) else categories(c).toSeq
      cats.foldLeft(d)((dd, v) =>
        dd.withColumn(s"${c}_$v",
          when(col(c).cast("string") === lit(v), 1).otherwise(0)))
        .drop(c)
    }
  override def inverseTransform(df: DataFrame): DataFrame =
    cols.foldLeft(df) { (d, c) =>
      val allCats = categories(c)
      val present = if (dropFirst) allCats.toSeq.drop(1) else allCats.toSeq
      // argmax over indicators; with dropFirst, all-zeros = first category.
      val firstCase: Column =
        if (dropFirst) lit(allCats.head) else lit(null).cast("string")
      val rebuilt = present.reverse.foldLeft(firstCase)((acc, v) =>
        when(col(s"${c}_$v") === 1, lit(v)).otherwise(acc))
      d.withColumn(c, rebuilt).drop(present.map(v => s"${c}_$v"): _*)
    }
}

/** Ref: dask_ml.preprocessing.OneHotEncoder (preprocessing/_encoders.py:16-305).
  * Array-mode output: a dense 0/1 array column (rows are SparseVector in
  * the reference; at our widths a codegen'd array beats a vector UDT).
  */
class OneHotEncoder(
    val inputCol: String,
    val outputCol: String = "onehot"
) extends Estimator[OneHotEncoderModel] {
  def fit(df: DataFrame): OneHotEncoderModel =
    new OneHotEncoderModel(inputCol, outputCol,
      Encoders.categories(df, Seq(inputCol))(inputCol))
}

class OneHotEncoderModel(
    val inputCol: String,
    val outputCol: String,
    val categories: Array[String]
) extends Model {
  def transform(df: DataFrame): DataFrame =
    df.withColumn(outputCol, array(categories.map(v =>
      when(col(inputCol).cast("string") === lit(v), 1.0).otherwise(0.0)).toIndexedSeq: _*))
  override def inverseTransform(df: DataFrame): DataFrame =
    df.withColumn(inputCol,
      Encoders.decodeExpr(array_position(col(outputCol), 1.0) - 1, categories))
      .drop(outputCol)
}

/** Ref: dask_ml.preprocessing.Categorizer (preprocessing/data.py:421-580).
  * Detects string columns, records their category lists (the
  * CategoricalDtype analog), and on transform attaches MLlib nominal
  * metadata so downstream stages see the category set in the schema.
  */
class Categorizer(val cols: Seq[String] = Nil) extends Estimator[CategorizerModel] {
  def fit(df: DataFrame): CategorizerModel = {
    val target =
      if (cols.nonEmpty) cols
      else df.schema.fields.filter(_.dataType.typeName == "string").map(_.name).toSeq
    new CategorizerModel(target, Encoders.categories(df, target))
  }
}

class CategorizerModel(
    val cols: Seq[String],
    val categories: Map[String, Array[String]]
) extends Model {
  def transform(df: DataFrame): DataFrame =
    cols.foldLeft(df) { (d, c) =>
      val meta = new org.apache.spark.sql.types.MetadataBuilder()
        .putStringArray("categories", categories(c)).build()
      d.withColumn(c, col(c).as(c, meta))
    }
}
