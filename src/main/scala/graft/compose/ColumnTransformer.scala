package graft.compose

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.core.{Estimator, Model}

/** Ref: dask_ml.compose.ColumnTransformer
  * (compose/_column_transformer.py:172-200): apply a different
  * estimator to each column subset and keep everything in one frame.
  *
  * Our transformers operate on named columns in place, so "hstack of
  * blocks" (dd.concat(axis=1)) is simply sequential application — no
  * join, no shuffle, one fused projection at execution time.
  */
class ColumnTransformer(
    val transformers: Seq[(String, Estimator[_ <: Model])]
) extends Estimator[ColumnTransformerModel] {
  def fit(df: DataFrame): ColumnTransformerModel =
    new ColumnTransformerModel(transformers.map { case (name, est) =>
      name -> est.fit(df)
    })
}

class ColumnTransformerModel(
    val fitted: Seq[(String, Model)]
) extends Model {
  def transform(df: DataFrame): DataFrame =
    fitted.foldLeft(df) { case (d, (_, m)) => m.transform(d) }
  override def inverseTransform(df: DataFrame): DataFrame =
    fitted.reverse.foldLeft(df) { case (d, (_, m)) => m.inverseTransform(d) }
  def apply(name: String): Model = fitted.find(_._1 == name).get._2
}

/** A transformer slot in the sklearn-parity [[ColumnTransformerSpec]]:
  * an estimator factory over the slot's columns, or the special-cased
  * reference strings (`compose/_column_transformer.py:42-47`).
  */
sealed trait TransformerSpec
object TransformerSpec {
  final case class Est(mk: Seq[String] => Estimator[_ <: Model]) extends TransformerSpec
  case object Passthrough extends TransformerSpec
  case object Drop extends TransformerSpec

  /** The reference's string forms, verbatim. */
  def apply(s: String): TransformerSpec = s match {
    case "passthrough" => Passthrough
    case "drop" => Drop
    case other => throw new IllegalArgumentException(
      s"transformer must be an estimator, 'passthrough' or 'drop'; got '$other'")
  }
}

/** Full reference parameter surface for ColumnTransformer
  * (compose/_column_transformer.py:33-68): `(name, transformer,
  * columns)` triples where `transformer` is an estimator or the
  * strings 'passthrough' / 'drop', plus the `remainder` policy for
  * non-specified columns — 'drop' (the reference default),
  * 'passthrough', or an estimator. A ported sklearn/dask-ml spec runs
  * verbatim modulo Scala syntax.
  *
  * Output = the specified sets in SPEC ORDER (transformed in place;
  * 'drop' sets contribute nothing) followed by the remainder subset in
  * frame order — sklearn's hstack, realized as ONE fused projection
  * (no join, no shuffle). Column sets must be disjoint: the in-place
  * column model cannot transform one source column two ways — use
  * [[FeatureUnion]] (namespaced copies) for that.
  */
class ColumnTransformerSpec(
    val specs: Seq[(String, TransformerSpec, Seq[String])],
    val remainder: TransformerSpec = TransformerSpec.Drop
) extends Estimator[ColumnTransformerSpecModel] {
  locally {
    val all = specs.flatMap(_._3)
    require(all.distinct.size == all.size,
      s"column sets must be disjoint (use FeatureUnion for overlap): " +
        all.diff(all.distinct).distinct.mkString(", "))
  }

  def fit(df: DataFrame): ColumnTransformerSpecModel = {
    val specified = specs.flatMap(_._3).toSet
    val remainderCols = df.columns.filterNot(specified).toSeq
    val fitted = specs.map {
      case (n, TransformerSpec.Est(mk), cols) => (n, cols, Some(mk(cols).fit(df)))
      case (n, TransformerSpec.Passthrough, cols) => (n, cols, None)
      case (n, TransformerSpec.Drop, _) => (n, Seq.empty[String], None)
    }
    val remModel = remainder match {
      case TransformerSpec.Est(mk) if remainderCols.nonEmpty =>
        Some(mk(remainderCols).fit(df))
      case _ => None
    }
    val keptRemainder = remainder match {
      case TransformerSpec.Drop => Seq.empty[String]
      case _ => remainderCols
    }
    new ColumnTransformerSpecModel(fitted, keptRemainder, remModel)
  }
}

class ColumnTransformerSpecModel(
    val fitted: Seq[(String, Seq[String], Option[Model])],
    val remainderCols: Seq[String],
    val remainderModel: Option[Model]
) extends Model {
  def transform(df: DataFrame): DataFrame = {
    val applied = fitted.foldLeft(df) {
      case (d, (_, _, Some(m))) => m.transform(d)
      case (d, _) => d
    }
    val withRem = remainderModel.fold(applied)(_.transform(applied))
    val out = fitted.flatMap(_._2) ++ remainderCols
    withRem.select(out.map(col): _*)
  }
  def apply(name: String): Model =
    fitted.find(_._1 == name).flatMap(_._3)
      .getOrElse(throw new NoSuchElementException(
        s"no fitted estimator named '$name' (passthrough/drop slots hold none)"))
}

/** sklearn-style Pipeline: sequential estimator stages, each fitted on
  * the output of the previous (the reference reuses sklearn.Pipeline
  * directly; its graph form is in model_selection._search — see
  * PipelineGridSearchCV for the shared-prefix search).
  */
class Pipeline(val stages: Seq[(String, Estimator[_ <: Model])])
    extends Estimator[PipelineModel] {
  def fit(df: DataFrame): PipelineModel = {
    var cur = df
    val fitted = stages.map { case (name, est) =>
      val m = est.fit(cur)
      cur = m.transform(cur)
      name -> m
    }
    new PipelineModel(fitted)
  }
}

class PipelineModel(val fitted: Seq[(String, Model)]) extends Model {
  def transform(df: DataFrame): DataFrame =
    fitted.foldLeft(df) { case (d, (_, m)) => m.transform(d) }
  override def inverseTransform(df: DataFrame): DataFrame =
    fitted.reverse.foldLeft(df) { case (d, (_, m)) => m.inverseTransform(d) }
  def apply(name: String): Model = fitted.find(_._1 == name).get._2
}

/** The `None` / `"drop"` pipeline step (ref: model_selection/_search.py:712
  * treats `step is None or step == "drop"` as a no-op stage): fits
  * nothing, transforms identity. Grid-search candidates swap a real
  * stage for [[Passthrough]] to search over "with/without this step" —
  * the factory just returns it for the skipping parameter value, and
  * the search's fit memo dedups it like any other stage config.
  */
object Passthrough extends Estimator[PassthroughModel.type] {
  def fit(df: DataFrame): PassthroughModel.type = PassthroughModel
}

object PassthroughModel extends Model {
  def transform(df: DataFrame): DataFrame = df
  override def inverseTransform(df: DataFrame): DataFrame = df
}

/** Ref: sklearn FeatureUnion as dask-ml's search graph handles it
  * (model_selection/_search.py:851-955 `_do_featureunion`,
  * methods.py:188-208 `feature_union` / `feature_union_concat`): every
  * branch is fitted on the SAME input (fan-out, unlike Pipeline's
  * chain), branch outputs are hstacked, and `transformer_weights`
  * multiply a branch's output block.
  *
  * Spark shape: "hstack" = namespaced column copies. Each branch b over
  * source columns cs first gets `b__<c>` copies (one fused projection —
  * no join, no shuffle), fits and transforms in place on its own
  * copies, and its weight scales those columns afterwards. Two branches
  * can therefore transform the SAME source column differently — the
  * semantics ColumnTransformer's disjoint in-place model can't express.
  * The whole transform stays map-only: one scan at any data size.
  *
  * @param branches (name, sourceCols, factory given the branch's
  *   namespaced column names `name__src`)
  * @param weights transformer_weights: branch name → multiplier
  */
class FeatureUnion(
    val branches: Seq[(String, Seq[String], Seq[String] => Estimator[_ <: Model])],
    val weights: Map[String, Double] = Map.empty
) extends Estimator[FeatureUnionModel] {
  def fit(df: DataFrame): FeatureUnionModel = {
    val prepared = FeatureUnion.prepare(df, branches.map(b => (b._1, b._2)))
    new FeatureUnionModel(
      branches.map { case (n, srcs, mk) =>
        (n, srcs, mk(srcs.map(c => s"${n}__$c")).fit(prepared))
      }, weights)
  }
}

object FeatureUnion {
  /** The stateless hstack projection: `name__src` copies per branch. */
  def prepare(df: DataFrame, branchCols: Seq[(String, Seq[String])]): DataFrame =
    branchCols.foldLeft(df) { case (d, (n, srcs)) =>
      srcs.foldLeft(d)((dd, c) => dd.withColumn(s"${n}__$c", col(c)))
    }
}

class FeatureUnionModel(
    val fitted: Seq[(String, Seq[String], Model)],
    val weights: Map[String, Double]
) extends Model {
  def transform(df: DataFrame): DataFrame = {
    val prepared = FeatureUnion.prepare(df, fitted.map(b => (b._1, b._2)))
    val transformed = fitted.foldLeft(prepared) { case (d, (_, _, m)) => m.transform(d) }
    // feature_union_concat's `X * w` on the branch's output block
    fitted.foldLeft(transformed) { case (d, (n, srcs, _)) =>
      weights.get(n).fold(d) { w =>
        srcs.foldLeft(d)((dd, c) =>
          dd.withColumn(s"${n}__$c", col(s"${n}__$c") * w))
      }
    }
  }
  def apply(name: String): Model = fitted.find(_._1 == name).get._3
}
