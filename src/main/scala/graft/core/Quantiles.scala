package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact interpolated quantiles via ONE distributed range-sort plus a
  * positional lookup — the scalable exact path.
  *
  * Spark's builtin exact `percentile` aggregate accumulates a
  * value→count map per partition and merges them; on continuous columns
  * (every value distinct) that map is O(n) per partition and merge-heavy.
  * Sorting instead costs one range-shuffle (Spark's sort is the fastest
  * primitive it has) and the lookup touches only the ~2·|probs| rows at
  * the target positions. Interpolation is the standard linear rule
  * (numpy/DuckDB quantile_cont-compatible).
  */
object Quantiles {

  def exact(df: DataFrame, column: String, probs: Seq[Double]): Seq[Double] = {
    val vals = df.select(col(column).cast("double").as("v")).na.drop()
      .sort("v").persist()
    try {
      // per-partition counts → global offsets (no second sort)
      val counts = vals.rdd.mapPartitionsWithIndex { case (i, it) =>
        Iterator((i, it.size))
      }.collect().sortBy(_._1).map(_._2)
      val n = counts.map(_.toLong).sum
      if (n == 0) return probs.map(_ => Double.NaN)
      val offsets = counts.scanLeft(0L)(_ + _.toLong)
      val positions = probs.flatMap { q =>
        val h = (n - 1) * q
        Seq(math.floor(h).toLong, math.ceil(h).toLong)
      }.distinct.sorted
      // fetch the few needed rows partition-locally, ONE job for all
      // partitions (a per-partition runJob would pay a scheduling
      // round-trip each)
      val byPartition: Map[Int, Set[Int]] = positions
        .groupBy(pos => offsets.indexWhere(_ > pos) - 1)
        .map { case (pid, ps) => pid -> ps.map(p => (p - offsets(pid)).toInt).toSet }
      val bc = vals.sparkSession.sparkContext.broadcast(byPartition)
      val fetched = vals.rdd.mapPartitionsWithIndex { case (pid, it) =>
        bc.value.get(pid) match {
          case None => Iterator.empty
          case Some(wanted) =>
            it.zipWithIndex.collect {
              case (r, i) if wanted(i) => (offsets(pid) + i, r.getDouble(0))
            }
        }
      }.collect().toMap
      probs.map { q =>
        val h = (n - 1) * q
        val lo = math.floor(h).toLong; val hi = math.ceil(h).toLong
        val f = h - lo
        if (lo == hi) fetched(lo) else fetched(lo) * (1 - f) + fetched(hi) * f
      }
    } finally vals.unpersist(blocking = false)
  }

  /** Exact quantiles for several columns (one sort per column). */
  def exact(df: DataFrame, columns: Seq[String], probs: Seq[Double]): Map[String, Seq[Double]] =
    columns.map(c => c -> exact(df, c, probs)).toMap
}
