package graft.cluster

import graft.SparkSpec

/** Grid-DBSCAN semantics on constructed point sets: separated blobs
  * form distinct clusters, sparse points are noise, adjacent dense
  * cells merge, and border points attach via the 3×3 neighborhood. */
class GridDbscanSpec extends SparkSpec {

  import spark.implicits._

  private def cluster(pts: Seq[(Long, Double, Double)], eps: Double,
      minPts: Int) =
    GridDbscan.gridCluster(pts.toDF("id", "x", "y"), "id", "x", "y",
      eps, minPts)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("two separated blobs cluster apart; isolated points are noise") {
    val blobA = (1L to 10L).map(i => (i, 0.1 + 0.01 * i, 0.1))
    val blobB = (11L to 20L).map(i => (i, 5.1 + 0.01 * i, 5.1))
    val noise = Seq((21L, 2.5, 2.5))
    val got = cluster(blobA ++ blobB ++ noise, eps = 1.0, minPts = 5)
    val ca = blobA.map(p => got(p._1)).distinct
    val cb = blobB.map(p => got(p._1)).distinct
    assert(ca.length === 1 && cb.length === 1 && ca.head != cb.head)
    assert(ca.head >= 0 && cb.head >= 0)
    assert(got(21L) === -1L)
  }

  test("adjacent dense cells merge into one cluster (diagonal too)") {
    // dense cell (0,0) and diagonal dense cell (1,1), eps = 1
    val a = (1L to 6L).map(i => (i, 0.5, 0.5))
    val b = (7L to 12L).map(i => (i, 1.5, 1.5))
    val got = cluster(a ++ b, eps = 1.0, minPts = 5)
    assert(got.values.toSet.size === 1)
  }

  test("a point in a sparse cell adjacent to a dense cell is a border member") {
    val core = (1L to 8L).map(i => (i, 0.5, 0.5))
    val border = Seq((9L, 1.5, 0.5)) // next cell over, alone
    val far = Seq((10L, 4.5, 4.5))
    val got = cluster(core ++ border ++ far, eps = 1.0, minPts = 5)
    assert(got(9L) === got(1L)) // attaches to the adjacent dense cell
    assert(got(10L) === -1L)
  }
}
