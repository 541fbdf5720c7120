package graft.llmdata

import scala.util.Random

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.debug.codegenStringSeq

import graft.SparkSpec

/** Production-dimension ANN: the testdata embeddings are d=64, but real
  * transformer embeddings are d=384–1024 — and the one codegen defect
  * found in r13 (the unrolled PQ-encode argmin overflowing janino's
  * 64 KB method limit) was exactly a dimension-driven code-size blowup.
  * This spec pins the contract at d=768 (m=8, ksub=16 → the codebook
  * object carries 8·16·96 doubles that MUST NOT appear as plan
  * literals):
  *
  *  1. the encode/search stages stay inside WholeStageCodegen, and
  *     every generated method in those stages is under the 65 535-byte
  *     `spark.sql.codegen.hugeMethodLimit` fallback threshold
  *     (codegenStringSeq compiles the real generated code and reports
  *     per-stage max method bytecode size);
  *  2. recall@10 vs exact brute force clears the design floor on
  *     clustered data (IVF ≥ 0.9, IVFPQ ≥ 0.6, PQ+rerank ≥ 0.9,
  *     SQ8 ≥ 0.9);
  *  3. the index entry row stays (cell, m-byte code, norm) — the
  *     32×-compression contract that makes the 100 TB scan read codes,
  *     not vectors.
  */
class AnnProductionDimSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 768
  private val m = 8
  private val ksub = 16
  private val nClusters = 6
  private val rnd = new Random(768001)

  // hierarchical corpus — 6 clusters × 5 subclusters × 12 points.
  // An isotropic noise ball would make fine-grained PQ ranking
  // information-theoretically hopeless at d=768 (all within-cluster
  // distances concentrate, so the true top-k is decided by gaps far
  // below any 8-bit quantizer's resolution); real embedding spaces are
  // hierarchical, and this shape puts the top-k boundary at the
  // subcluster level — well above PQ resolution, so the recall floors
  // measure the INDEX, not the generator.
  private val nSub = 5
  private val perSub = 12
  private val centers: IndexedSeq[Array[Double]] =
    IndexedSeq.fill(nClusters)(Array.fill(dim)(rnd.nextGaussian() * 3.0))
  private val subCenters: IndexedSeq[Array[Double]] =
    (0 until nClusters * nSub).map { s =>
      val c = centers(s % nClusters)
      Array.tabulate(dim)(j => c(j) + rnd.nextGaussian() * 1.0)
    }
  private val corpusRows: Seq[(Long, Seq[Double])] =
    (0L until (nClusters * nSub * perSub).toLong).map { i =>
      val sc = subCenters((i % (nClusters * nSub)).toInt)
      (i, sc.toIndexedSeq.map(_ + rnd.nextGaussian() * 0.15))
    }
  private val queryRows: Seq[(Long, Seq[Double])] = (1000L until 1012L).map { i =>
    val sc = subCenters((i % (nClusters * nSub)).toInt)
    (i, sc.toIndexedSeq.map(_ + rnd.nextGaussian() * 0.15))
  }
  // parquet round-trip: in-memory Seqs become LocalRelations and
  // ConvertToLocalRelation folds the encode projection away at
  // optimization time — there would be no codegen stage to assert on.
  // A parquet scan is also what the production encode pass fuses into.
  private lazy val (corpus, queries) = {
    val base = java.nio.file.Files.createTempDirectory("graft-annd768").toString
    corpusRows.toDF("id", "vec").write.mode("overwrite").parquet(s"$base/corpus")
    queryRows.toDF("id", "vec").write.mode("overwrite").parquet(s"$base/queries")
    (spark.read.parquet(s"$base/corpus"), spark.read.parquet(s"$base/queries"))
  }

  private lazy val cents = Ann.ivfIndex(corpus, "vec", nList = nClusters,
    dim = dim, sampleSize = 360, iters = 5, seed = 7)
  private lazy val cbs = Ann.pqTrain(corpus, "vec", m = m, ksub = ksub,
    dim = dim, sampleSize = 360, iters = 5, seed = 7)

  private val k = 10
  private lazy val exact: Map[Long, Set[Long]] = topkMap(
    Ann.cosineTopK(corpus.union(queries), queries, "id", "vec", k))

  private def topkMap(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  private def recallVsExact(approx: Map[Long, Set[Long]]): Double = {
    val per = exact.map { case (q, truth) =>
      approx.getOrElse(q, Set.empty).count(truth).toDouble / truth.size
    }
    per.sum / per.size
  }

  /** Compile the plan's whole-stage-codegen subtrees for real and
    * assert (a) at least one stage contains the marker (the operator
    * did not fall out of codegen entirely), and (b) every generated
    * method in EVERY stage of the plan is under the huge-method
    * fallback limit — i.e. nothing in this query would be silently
    * dropped back to the interpreted path.
    */
  private def assertFusedUnderLimit(df: org.apache.spark.sql.DataFrame,
      marker: String): Unit = {
    df.collect() // finalize AQE so stage boundaries are the real ones
    // codegenStringSeq descends through AdaptiveSparkPlanExec /
    // QueryStageExec wrappers (whose `children` are Nil, so a plain
    // plan.collect would miss every materialized stage), compiles each
    // WholeStageCodegen subtree for real, and reports bytecode stats.
    val stats = codegenStringSeq(df.queryExecution.executedPlan)
    assert(stats.nonEmpty)
    assert(stats.exists(_._1.contains(marker)),
      s"no WholeStageCodegen stage contains $marker:\n" +
        stats.map(_._1).mkString("\n"))
    stats.foreach { case (subtree, _, bs) =>
      assert(bs.maxMethodCodeSize < 65535,
        s"generated method of ${bs.maxMethodCodeSize} bytes would trip the " +
          s"hugeMethodLimit fallback in subtree:\n$subtree")
    }
  }

  test("d=768 index entries: fused encode, no huge-method fallback, m-byte codes") {
    val entries = Ann.ivfPqIndexEntries(corpus, "id", "vec", cents, cbs)
    assertFusedUnderLimit(entries, "pq_encode")
    val rows = entries.as[(Long, Int, Seq[Int], Double)].collect()
    assert(rows.length == corpusRows.length)
    assert(rows.forall { case (_, cell, code, norm) =>
      cell >= 0 && cell < nClusters && code.length == m &&
        code.forall(c => c >= 0 && c < ksub) && norm > 0.0
    })
    // the index is non-degenerate: multiple cells in use (k-means may
    // split/merge a true cluster — the recall floors below are the
    // semantic assertion, this is just "not everything in one cell")
    assert(rows.map(_._2).distinct.length >= 2)
  }

  test("d=768 IVF search: fused probe + recall floor") {
    val df = Ann.ivfCosineTopK(corpus.union(queries), queries, "id", "vec",
      k, cents, nProbe = 2)
    assertFusedUnderLimit(df, "pq_encode")
    val r = recallVsExact(topkMap(df))
    info(f"recall@10 = $r%.3f")
    assert(r >= 0.9, s"IVF recall@10 $r below floor")
  }

  test("d=768 IVFPQ search: fused ADC scan + recall floor") {
    val df = Ann.ivfPqTopK(corpus.union(queries), queries, "id", "vec",
      k, cents, cbs, nProbe = 2)
    assertFusedUnderLimit(df, "pq_encode")
    val r = recallVsExact(topkMap(df))
    info(f"recall@10 = $r%.3f")
    assert(r >= 0.6, s"IVFPQ recall@10 $r below floor")
  }

  test("d=768 PQ + exact re-rank: recall floor recovers") {
    val df = Ann.pqAdcTopKReranked(corpus.union(queries), queries, "id",
      "vec", k, cbs, rerank = 40)
    val r = recallVsExact(topkMap(df))
    info(f"recall@10 = $r%.3f")
    assert(r >= 0.9, s"PQ+rerank recall@10 $r below floor")
  }

  test("d=768 SQ8 search: fused reconstruct-and-score + recall floor") {
    val (mins, scales) = Ann.sqTrain(corpus, "vec", dim)
    assert(mins.length == dim && scales.length == dim && scales.forall(_ > 0))
    val df = Ann.sqTopK(corpus.union(queries), queries, "id", "vec", k,
      mins, scales)
    assertFusedUnderLimit(df, "vec_dot")
    val r = recallVsExact(topkMap(df))
    info(f"recall@10 = $r%.3f")
    assert(r >= 0.9, s"SQ8 recall@10 $r below floor")
  }
}
