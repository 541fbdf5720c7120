package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ExpressionBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}

/** Product-quantization encode as ONE codegen expression holding the
  * codebooks as a referenced object (the [[Interp1D]] object-pool
  * pattern) instead of m·ksub unrolled per-centroid `vec_dot(x,
  * [literal…])` argmin sub-trees.
  *
  * Why this exists: the unrolled formulation generates code linear in
  * m·ksub·dsub — at production embedding dims (d=768, m=8, ksub=256
  * → ~200k doubles of literals) the single generated method overflows
  * janino's 64 KB limit and Spark silently drops the whole stage out of
  * whole-stage codegen. Here `doGenCode` emits one static call per row;
  * the codebooks ride along as a shared `double[][][]` reference (zero
  * per-row allocation beyond the m-int code array), so generated-code
  * size is CONSTANT in m, ksub and d.
  *
  * Bit-exactness contract with the unrolled form it replaces (gates
  * q_ann_pq / q_ann_ivfpq / q_ann_pq_rerank / q_ann_ingest stay
  * hash-identical):
  *  - subspace j reads elements `[j·dsub, j·dsub+dsub)` of the input —
  *    exactly `slice(vec, j·dsub+1, dsub)`, loop bounded by the input
  *    length like [[VecDot]];
  *  - score = `(Σ_i x_i·c_i) · (−2.0) + ‖c‖²` with the dot accumulated
  *    sequentially left-to-right ([[VecDot]] order) and ‖c‖² pre-folded
  *    on the driver with the same left-to-right `map(v*v).sum`;
  *  - argmin is FIRST minimum (strict `<` scan), matching
  *    `array_position(arr, array_min(arr)) - 1`.
  *
  * With a single "subspace" spanning the whole vector this is the IVF
  * coarse-quantizer cell assignment (see `Ann.cellExpr`).
  */
case class PqEncode(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {
  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "need >= 1 centroid per subspace")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_encode"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  /** ‖c‖² per (subspace, centroid), folded once on the driver in the
    * exact literal order (`map(v*v).sum`) the unrolled form embedded.
    */
  @transient private lazy val normSq: Array[Array[Double]] =
    codebooks.map(_.map(_.map(v => v * v).sum))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_encode needs array<float|double>, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    PqEncode.encode(input.asInstanceOf[ArrayData], isFloat, codebooks, normSq)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
    val nsRef = ctx.addReferenceObj("pqNormSq", normSq, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PqEncode.encode($c, $isFloat, $cbRef, $nsRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)
}

object PqEncode {
  /** Shared kernel (interpreted eval + generated code): first-minimum
    * argmin of `−2·x_j·c + ‖c‖²` per subspace.
    */
  def encode(vec: ArrayData, isFloat: Boolean,
      codebooks: Array[Array[Array[Double]]],
      normSq: Array[Array[Double]]): ArrayData = {
    val n = vec.numElements()
    val m = codebooks.length
    val codes = new Array[Int](m)
    var j = 0
    var off = 0
    while (j < m) {
      val ctrs = codebooks(j)
      val ns = normSq(j)
      val dsub = ctrs(0).length
      val lim = math.min(dsub, math.max(0, n - off))
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < ctrs.length) {
        val ctr = ctrs(c)
        var s = 0.0
        var i = 0
        while (i < lim) {
          val x = if (isFloat) vec.getFloat(off + i).toDouble else vec.getDouble(off + i)
          s += x * ctr(i)
          i += 1
        }
        val d = s * -2.0 + ns(c)
        if (c == 0 || d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(j) = best
      off += dsub
      j += 1
    }
    new GenericArrayData(codes)
  }

  def apply(col: Column, codebooks: Array[Array[Array[Double]]]): Column =
    ExpressionBridge.column(
      PqEncode(ExpressionBridge.expression(col), codebooks))
}

/** The m·ksub ADC distance tables `dt(j)(c) = ‖q_j − c‖²` of a query
  * vector, as `array<array<double>>` — the query-side companion of
  * [[PqEncode]], replacing the unrolled
  * `array(array(vec_dot…, …), …)` form whose generated code grew as
  * m·ksub·dsub. Runs on the broadcast-tiny query frame, but janino's
  * 64 KB limit is per generated METHOD, not per row count, so the
  * query-side projection needed the same object-pool treatment to stay
  * inside whole-stage codegen at production dims.
  *
  * Bit-exactness: `dt = q_j·q_j + (q_j·c · (−2.0) + ‖c‖²)` with both
  * dots in [[VecDot]] sequential order and ‖c‖² pre-folded
  * driver-side — the exact association the unrolled form produced.
  */
case class PqDistTables(child: Expression, codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {
  require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
    "need >= 1 centroid per subspace")

  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def prettyName: String = "pq_dist_tables"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val normSq: Array[Array[Double]] =
    codebooks.map(_.map(_.map(v => v * v).sum))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pq_dist_tables needs array<float|double>, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    PqDistTables.tables(input.asInstanceOf[ArrayData], isFloat, codebooks, normSq)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebooks", codebooks, "double[][][]")
    val nsRef = ctx.addReferenceObj("pqNormSq", normSq, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PqDistTables.tables($c, $isFloat, $cbRef, $nsRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): PqDistTables =
    copy(child = newChild)
}

object PqDistTables {
  def tables(vec: ArrayData, isFloat: Boolean,
      codebooks: Array[Array[Array[Double]]],
      normSq: Array[Array[Double]]): ArrayData = {
    val n = vec.numElements()
    val m = codebooks.length
    val out = new Array[AnyRef](m)
    var j = 0
    var off = 0
    while (j < m) {
      val ctrs = codebooks(j)
      val ns = normSq(j)
      val dsub = ctrs(0).length
      val lim = math.min(dsub, math.max(0, n - off))
      // q_j · q_j once per subspace (the unrolled form computed it per
      // centroid via dotExpr(qs, qs), but the value is identical — same
      // inputs, same sequential order — so the fold stays bit-exact)
      var qq = 0.0
      var i = 0
      while (i < lim) {
        val x = if (isFloat) vec.getFloat(off + i).toDouble else vec.getDouble(off + i)
        qq += x * x
        i += 1
      }
      val row = new Array[Double](ctrs.length)
      var c = 0
      while (c < ctrs.length) {
        val ctr = ctrs(c)
        var s = 0.0
        i = 0
        while (i < lim) {
          val x = if (isFloat) vec.getFloat(off + i).toDouble else vec.getDouble(off + i)
          s += x * ctr(i)
          i += 1
        }
        row(c) = qq + (s * -2.0 + ns(c))
        c += 1
      }
      out(j) = new GenericArrayData(row)
      off += dsub
      j += 1
    }
    new GenericArrayData(out)
  }

  def apply(col: Column, codebooks: Array[Array[Array[Double]]]): Column =
    ExpressionBridge.column(
      PqDistTables(ExpressionBridge.expression(col), codebooks))
}

/** The `nProbe` nearest coarse cells of a query vector, ordered by
  * ascending squared distance with ties broken by cell index — the
  * query-side IVF probe list, replacing the unrolled
  * `slice(transform(array_sort(zip_with(…)), …), 1, nProbe)` tree
  * (generated code linear in nList·dim).
  *
  * Bit-exactness: per-cell score is the same `−2·q·c + ‖c‖²` drop-the-
  * ‖q‖² comparator as [[PqEncode]]; the (score, index) sort matches
  * `array_sort` over `struct(d, i)` (ascending d, then i — Spark
  * sorts NaN last, mirrored here via java.lang.Double.compare).
  */
case class ProbeCells(child: Expression, centroids: Array[Array[Double]],
    nProbe: Int) extends UnaryExpression {
  require(centroids.nonEmpty && nProbe >= 1 && nProbe <= centroids.length,
    s"nProbe=$nProbe must be in [1, ${centroids.length}]")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "probe_cells"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  @transient private lazy val normSq: Array[Double] =
    centroids.map(_.map(v => v * v).sum)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"probe_cells needs array<float|double>, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    ProbeCells.probe(input.asInstanceOf[ArrayData], isFloat, centroids, normSq, nProbe)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ctRef = ctx.addReferenceObj("ivfCentroids", centroids, "double[][]")
    val nsRef = ctx.addReferenceObj("ivfNormSq", normSq, "double[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ProbeCells.probe($c, $isFloat, $ctRef, $nsRef, $nProbe)")
  }

  override protected def withNewChildInternal(newChild: Expression): ProbeCells =
    copy(child = newChild)
}

object ProbeCells {
  def probe(vec: ArrayData, isFloat: Boolean, centroids: Array[Array[Double]],
      normSq: Array[Double], nProbe: Int): ArrayData = {
    val n = vec.numElements()
    val nList = centroids.length
    val dists = new Array[Double](nList)
    var c = 0
    while (c < nList) {
      val ctr = centroids(c)
      val lim = math.min(ctr.length, n)
      var s = 0.0
      var i = 0
      while (i < lim) {
        val x = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
        s += x * ctr(i)
        i += 1
      }
      dists(c) = s * -2.0 + normSq(c)
      c += 1
    }
    val idx = Array.tabulate(nList)(identity)
    // full argsort by (dist, index) — nList is the coarse-cell count
    // (driver-tiny, ≤ a few thousand even at 100 TB), so n·log n here
    // is noise next to the dot products above
    val boxed = idx.map(Integer.valueOf)
    java.util.Arrays.sort(boxed, new java.util.Comparator[Integer] {
      override def compare(a: Integer, b: Integer): Int = {
        val d = java.lang.Double.compare(dists(a), dists(b))
        if (d != 0) d else Integer.compare(a, b)
      }
    })
    val out = new Array[Int](nProbe)
    var i = 0
    while (i < nProbe) { out(i) = boxed(i).intValue(); i += 1 }
    new GenericArrayData(out)
  }

  def apply(col: Column, centroids: Array[Array[Double]], nProbe: Int): Column =
    ExpressionBridge.column(
      ProbeCells(ExpressionBridge.expression(col), centroids, nProbe))
}
