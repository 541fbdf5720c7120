package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact interpolated quantiles without a global sort.
  *
  * Three scan-only passes, any number of columns at once:
  *   1. min / max / count per column (one fused aggregate);
  *   2. a fixed-width histogram per column (`treeAggregate` of a long
  *      array — map-side combine, no shuffle);
  *   3. the cumulative histogram locates the bin of every needed order
  *      statistic; one filtered `groupBy(value)` fetches just those
  *      bins' (value, count) pairs (~|probs| bins of ~n/nBins rows).
  * Linear interpolation between order statistics then matches
  * numpy/DuckDB `quantile_cont` exactly.
  *
  * Scale: a sort-based exact quantile pays a full range-shuffle of the
  * column (the classic approach, and what this replaced); three scans
  * with a broadcast-sized aggregate state each is strictly better at
  * 100 TB and exact regardless of partitioning. Spark's builtin exact
  * `percentile` is worse still on continuous data (per-partition
  * value→count maps). The GK-sketch `percentile_approx` remains the
  * one-pass approximate option for fit paths that tolerate it.
  */
object Quantiles {

  /** Exact quantiles of one column (convenience over [[exactOnePass]]). */
  def exact(df: DataFrame, column: String, probs: Seq[Double]): Seq[Double] =
    exactOnePass(df, Seq(column), probs)(column).toSeq

  def exact(df: DataFrame, columns: Seq[String], probs: Seq[Double]): Map[String, Seq[Double]] =
    exactOnePass(df, columns, probs).map { case (k, v) => k -> v.toSeq }

  /** Exact quantile tables for ALL columns via the histogram method. */
  def exactOnePass(df: DataFrame, columns: Seq[String], probs: Seq[Double],
      nBins: Int = 1 << 20): Map[String, Array[Double]] = {
    val k = columns.size
    val data = df.select(columns.map(c => col(c).cast("double")): _*)

    // pass 1: min/max/count per column, one aggregate
    val statsRow = data.agg(
      min(col(columns.head)),
      (columns.map(c => max(col(c))) ++ columns.map(c => count(col(c))) ++
        columns.tail.map(c => min(col(c)))): _*).head()
    val mins = new Array[Double](k); val maxs = new Array[Double](k)
    val counts = new Array[Long](k)
    mins(0) = if (statsRow.isNullAt(0)) Double.NaN else statsRow.getDouble(0)
    for (i <- 0 until k) {
      maxs(i) = if (statsRow.isNullAt(1 + i)) Double.NaN else statsRow.getDouble(1 + i)
      counts(i) = statsRow.getLong(1 + k + i)
    }
    for (i <- 1 until k)
      mins(i) = if (statsRow.isNullAt(1 + 2 * k + (i - 1))) Double.NaN
        else statsRow.getDouble(1 + 2 * k + (i - 1))

    val widths = Array.tabulate(k)(i => (maxs(i) - mins(i)) / nBins)

    def binOf(i: Int, v: Double): Int = {
      val b = ((v - mins(i)) / widths(i)).toInt
      if (b < 0) 0 else if (b >= nBins) nBins - 1 else b
    }

    // pass 2: per-column fixed-width histograms, merged associatively
    val bcMins = data.sparkSession.sparkContext.broadcast((mins, widths))
    val hists = data.rdd.treeAggregate(null: Array[Array[Long]])(
      seqOp = (acc0, r) => {
        val acc = if (acc0 == null) Array.fill(k)(new Array[Long](nBins)) else acc0
        val (mn, w) = bcMins.value
        var i = 0
        while (i < k) {
          if (!r.isNullAt(i)) {
            val v = r.getDouble(i)
            if (!v.isNaN && w(i) > 0) {
              val b = ((v - mn(i)) / w(i)).toInt
              acc(i)(if (b < 0) 0 else if (b >= nBins) nBins - 1 else b) += 1
            }
          }
          i += 1
        }
        acc
      },
      combOp = (a, b) => {
        if (a == null) b else if (b == null) a
        else {
          var i = 0
          while (i < k) {
            val ai = a(i); val bi = b(i); var j = 0
            while (j < nBins) { ai(j) += bi(j); j += 1 }
            i += 1
          }
          a
        }
      })

    // ranks needed per column: floor/ceil of p·(n−1)
    columns.zipWithIndex.map { case (c, i) =>
      val n = counts(i)
      if (n == 0) { c -> probs.map(_ => Double.NaN).toArray }
      else if (n == 1 || !(widths(i) > 0) || mins(i) == maxs(i)) {
        // !(w > 0) also catches the NaN width of an all-NaN column
        c -> probs.map(_ => mins(i)).toArray
      } else {
        val ranks = probs.flatMap { p =>
          val h = (n - 1) * p
          Seq(math.floor(h).toLong, math.ceil(h).toLong)
        }.distinct.sorted
        // cumulative histogram → bin of each rank
        val hist = hists(i)
        val cumBefore = new Array[Long](nBins + 1)
        var j = 0
        while (j < nBins) { cumBefore(j + 1) = cumBefore(j) + hist(j); j += 1 }
        val binOfRank = ranks.map { r =>
          // first bin whose cumulative count exceeds r
          var lo = 0; var hi = nBins
          while (hi - lo > 1) {
            val mid = (lo + hi) >>> 1
            if (cumBefore(mid) <= r) lo = mid else hi = mid
          }
          r -> lo
        }.toMap
        val needed = binOfRank.values.toSeq.distinct

        // pass 3: fetch (value, count) for the needed bins only
        val w = widths(i); val mn = mins(i)
        val binExpr = least(greatest(
          floor((col("v") - lit(mn)) / lit(w)), lit(0.0)),
          lit((nBins - 1).toDouble)).cast("int")
        val maxFetch = 2000000 // driver guard: ~50 MB of (bin, v, cnt)
        val fetchedRows = data.select(col(c).cast("double").as("v"))
          .na.drop()
          .withColumn("__bin", binExpr)
          .filter(col("__bin").isInCollection(needed))
          .groupBy("__bin", "v").agg(count(lit(1)).as("cnt"))
          .limit(maxFetch + 1).collect()
        require(fetchedRows.length <= maxFetch,
          s"column $c: needed histogram bins hold > $maxFetch distinct values; " +
            "raise nBins or use the approximate fit")
        val fetched = fetchedRows
          .map(r => (r.getInt(0), r.getDouble(1), r.getLong(2)))
          .groupBy(_._1)
          .map { case (b, vs) => b -> vs.map(t => (t._2, t._3)).sortBy(_._1) }

        // order statistic at rank r: walk the sorted values of its bin
        def orderStat(r: Long): Double = {
          val b = binOfRank(r)
          var acc = cumBefore(b)
          val vs = fetched(b)
          var idx = 0
          while (idx < vs.length) {
            acc += vs(idx)._2
            if (acc > r) return vs(idx)._1
            idx += 1
          }
          vs.last._1 // counts disagree only if data changed mid-query
        }
        c -> probs.map { p =>
          val h = (n - 1) * p
          val lo = math.floor(h).toLong; val hi = math.ceil(h).toLong
          val f = h - lo
          if (lo == hi) orderStat(lo)
          else orderStat(lo) * (1 - f) + orderStat(hi) * f
        }.toArray
      }
    }.toMap
  }

  /** ALL columns' quantile tables in ONE aggregate job via the GK sketch
    * (`percentile_approx`) — the bounded-memory single-pass approximate
    * path (the reference itself fits on approximate `da.percentile`,
    * data.py:343-349).
    */
  def approxOnePass(df: DataFrame, columns: Seq[String], probs: Seq[Double],
      accuracy: Int = 10000): Map[String, Array[Double]] = {
    val probsSql = probs.map(p => p.toString + "D").mkString(",")
    val row = df.agg(
      expr(s"percentile_approx(`${columns.head}`, array($probsSql), $accuracy)").as("q0"),
      columns.tail.zipWithIndex.map { case (c, i) =>
        expr(s"percentile_approx(`$c`, array($probsSql), $accuracy)").as(s"q${i + 1}") }: _*)
      .head()
    columns.indices.map(i =>
      columns(i) -> row.getSeq[Double](i).toArray).toMap
  }
}
