package graft.relational

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  private def asofRows(df: DataFrame): Seq[(Long, Long, Option[Long], Option[Double])] =
    df.select(col("k"), col("ord"), col("asof.r_ord"), col("asof.r_val"))
      .as[(Long, Long, Option[Long], Option[Double])]
      .collect().sortBy(r => (r._1, r._2)).toSeq

  private val left = Seq(
    (1L, 100L), (1L, 200L), (1L, 50L),
    (2L, 100L), (3L, 10L)).toDF("k", "ord")
  private val right = Seq(
    (1L, 100L, 1.0, 10L), (1L, 100L, 2.0, 20L), (1L, 150L, 3.0, 30L),
    (2L, 99L, 4.0, 40L)).toDF("k", "r_ord", "r_val", "r_id")

  test("asofJoin backward inclusive: greatest right ord <= left ord, ties by tiebreak") {
    val out = asofRows(Temporal.asofJoin(left, right, Seq("k"), "ord", "r_ord",
      Seq("r_val"), rightTiebreak = Seq("r_id")))
    assert(out == Seq(
      (1L, 50L, None, None),                    // nothing at-or-before 50
      (1L, 100L, Some(100L), Some(2.0)),        // tie at 100: r_id 20 wins
      (1L, 200L, Some(150L), Some(3.0)),
      (2L, 100L, Some(99L), Some(4.0)),
      (3L, 10L, None, None)))                   // key with no right rows
  }

  test("asofJoin strict (allowExactMatches=false) skips the equal-ord row") {
    val out = asofRows(Temporal.asofJoin(left, right, Seq("k"), "ord", "r_ord",
      Seq("r_val"), allowExactMatches = false, rightTiebreak = Seq("r_id")))
    assert(out.find(r => r._1 == 1L && r._2 == 100L).get._3.isEmpty)
    assert(out.find(r => r._1 == 2L && r._2 == 100L).get._3 == Some(99L))
  }

  test("asofJoin tolerance nulls out matches beyond the bound") {
    val out = asofRows(Temporal.asofJoin(left, right, Seq("k"), "ord", "r_ord",
      Seq("r_val"), tolerance = Some(10L), rightTiebreak = Seq("r_id")))
    // (1,200): nearest is 150, gap 50 > 10 -> null; (2,100): gap 1 <= 10 -> kept
    assert(out.find(r => r._1 == 1L && r._2 == 200L).get._3.isEmpty)
    assert(out.find(r => r._1 == 2L && r._2 == 100L).get._3 == Some(99L))
  }

  test("asofJoin matches a brute-force oracle on randomized data") {
    val rnd = new scala.util.Random(7)
    val l = Seq.fill(300)((rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong))
      .zipWithIndex.map { case ((k, o), i) => (k, o, i.toLong) }
    val r = Seq.fill(300)((rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong))
      .zipWithIndex.map { case ((k, o), i) => (k, o, i.toLong) }
    val ldf = l.toDF("k", "ord", "lid")
    val rdf = r.toDF("k", "r_ord", "r_id").withColumn("r_val", col("r_id").cast("double"))
    val got = Temporal.asofJoin(ldf, rdf, Seq("k"), "ord", "r_ord",
      Seq("r_val"), rightTiebreak = Seq("r_id"))
      .select(col("lid"), col("asof.r_ord"), col("asof.r_val"))
      .as[(Long, Option[Long], Option[Double])].collect()
      .map(t => t._1 -> ((t._2, t._3))).toMap
    // brute force: max r_ord <= ord; among ties the max r_id
    val byKey = r.groupBy(_._1)
    for ((k, o, lid) <- l) {
      val cands = byKey.getOrElse(k, Nil).filter(_._2 <= o)
      val expect =
        if (cands.isEmpty) (None, None)
        else {
          val m = cands.map(_._2).max
          val win = cands.filter(_._2 == m).map(_._3).max
          (Some(m), Some(win.toDouble))
        }
      assert(got(lid) == expect, s"lid=$lid k=$k ord=$o")
    }
  }

  test("asofJoin forward matches a brute-force oracle (smallest ord >= left)") {
    val rnd = new scala.util.Random(13)
    val l = Seq.fill(200)((rnd.nextInt(4).toLong, rnd.nextInt(500).toLong))
      .zipWithIndex.map { case ((k, o), i) => (k, o, i.toLong) }
    val r = Seq.fill(200)((rnd.nextInt(4).toLong, rnd.nextInt(500).toLong))
      .zipWithIndex.map { case ((k, o), i) => (k, o, i.toLong) }
    val got = Temporal.asofJoin(l.toDF("k", "ord", "lid"),
        r.toDF("k", "r_ord", "r_id").withColumn("r_val", col("r_id").cast("double")),
        Seq("k"), "ord", "r_ord", Seq("r_val"),
        rightTiebreak = Seq("r_id"), direction = "forward")
      .select(col("lid"), col("asof.r_ord")).as[(Long, Option[Long])]
      .collect().map(t => t._1 -> t._2).toMap
    val byKey = r.groupBy(_._1)
    for ((k, o, lid) <- l) {
      val cands = byKey.getOrElse(k, Nil).filter(_._2 >= o).map(_._2)
      val expect = if (cands.isEmpty) None else Some(cands.min)
      assert(got(lid) == expect, s"lid=$lid k=$k ord=$o")
    }
  }

  test("asofJoin: string tiebreak column pins ties deterministically") {
    val l = Seq((1L, 100L)).toDF("k", "ord")
    val r = Seq((1L, 100L, 1.0, "aa"), (1L, 100L, 2.0, "zz"),
      (1L, 100L, 3.0, "mm")).toDF("k", "r_ord", "r_val", "r_sid")
    val out = Temporal.asofJoin(l, r, Seq("k"), "ord", "r_ord",
      Seq("r_val", "r_sid"), rightTiebreak = Seq("r_sid"))
      .select(col("asof.r_val"), col("asof.r_sid"))
      .as[(Double, String)].collect().toSeq
    assert(out == Seq((2.0, "zz"))) // max under ascending tiebreak
  }

  test("asofJoin: null right ord/key rows never match; fractional ords keep order") {
    val l = Seq((1L, Some(10.5)), (2L, Some(3.0))).toDF("k", "ord")
    val r = Seq((Some(1L), Some(10.9), 1.0), (Some(1L), Some(10.2), 2.0),
      (Some(1L), None, 3.0), (None, Some(1.0), 4.0))
      .toDF("k", "r_ord", "r_val")
    val out = Temporal.asofJoin(l, r, Seq("k"), "ord", "r_ord", Seq("r_val"))
      .select(col("k"), col("asof.r_ord"), col("asof.r_val"))
      .as[(Long, Option[Double], Option[Double])].collect()
      .sortBy(_._1).toSeq
    // 10.9 > 10.5 must NOT match (no long truncation); 10.2 does.
    // Null-ord and null-key right rows are excluded entirely (k=2 -> no match).
    assert(out == Seq((1L, Some(10.2), Some(2.0)), (2L, None, None)))
  }

  test("rangeJoinPairs matches brute force, incl. negative ordinates") {
    val rnd = new scala.util.Random(11)
    val l = Seq.tabulate(200)(i => (i.toLong, rnd.nextLong() % 500L))
    val r = Seq.tabulate(200)(i => (i.toLong, rnd.nextLong() % 500L))
    val tol = 60L
    val got = Temporal.rangeJoinPairs(
      l.toDF("lid", "lo"), r.toDF("rid", "ro"), "lo", "ro", tol)
      .select("lid", "rid").as[(Long, Long)].collect().toSeq
    val expect = for {
      (lid, lo) <- l; (rid, ro) <- r if math.abs(lo - ro) <= tol
    } yield (lid, rid)
    assert(got.sorted == expect.sorted)
    assert(got.size == got.toSet.size, "each pair exactly once")
  }

  test("rangeJoinPairs with key equality restricts pairs to the key group") {
    val l2 = Seq((1L, 0L, 10L), (2L, 1L, 10L)).toDF("lid", "lk", "lo")
    val r2 = Seq((7L, 0L, 12L), (8L, 1L, 500L)).toDF("rid", "rk", "ro")
    val got = Temporal.rangeJoinPairs(l2, r2, "lo", "ro", 60L, Seq("lk" -> "rk"))
      .select("lid", "rid").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 7L)))
  }

  test("intervalOverlapPairs matches brute force; each pair exactly once") {
    val rnd = new scala.util.Random(23)
    // negative ordinates, spans of varied length (0 to ~300, bucket 100:
    // many intervals straddle several buckets)
    def gen(n: Int) = Seq.tabulate(n) { i =>
      val s = rnd.nextLong() % 1000L
      (i.toLong, s, s + rnd.nextInt(300))
    }
    val l = gen(150); val r = gen(150)
    val got = Temporal.intervalOverlapPairs(
      l.toDF("lid", "ls", "le"), r.toDF("rid", "rs", "re"),
      "ls", "le", "rs", "re", bucketWidth = 100L)
      .select("lid", "rid").as[(Long, Long)].collect().toSeq
    val expect = for {
      (lid, ls, le) <- l; (rid, rs, re) <- r if ls <= re && rs <= le
    } yield (lid, rid)
    assert(got.sorted == expect.sorted)
    assert(got.size == got.toSet.size, "each pair exactly once")
  }

  test("intervalOverlapPairs: inclusive edges and key isolation") {
    val l = Seq((1L, 0L, 10L, 10L), (2L, 1L, 10L, 20L)).toDF("lid", "lk", "ls", "le")
    val r = Seq((7L, 0L, 10L, 15L), (8L, 1L, 21L, 30L)).toDF("rid", "rk", "rs", "re")
    val got = Temporal.intervalOverlapPairs(l, r, "ls", "le", "rs", "re",
        bucketWidth = 7L, keys = Seq("lk" -> "rk"))
      .select("lid", "rid").as[(Long, Long)].collect().toSeq
    // (1,7): touch at exactly 10 → inclusive match; (2,8): gap of 1 → no;
    // cross-key (1,8)/(2,7) excluded regardless of overlap
    assert(got == Seq((1L, 7L)))
  }

  test("plan shape: asofJoin is one shuffle, range join never a nested loop") {
    // executedPlan (post-EnsureRequirements): Exchange placement visible
    val asof = Temporal.asofJoin(left, right, Seq("k"), "ord", "r_ord",
      Seq("r_val"), rightTiebreak = Seq("r_id"))
      .queryExecution.executedPlan.toString
    // union-tag design: both sides meet in ONE key-partitioned exchange;
    // a theta-join formulation would show Cartesian/BroadcastNestedLoop
    assert("Exchange hashpartitioning".r.findAllIn(asof).size == 1, asof)
    assert(!asof.contains("CartesianProduct") &&
      !asof.contains("BroadcastNestedLoop"), asof)
    val rj = Temporal.rangeJoinPairs(
      Seq((1L, 10L)).toDF("lid", "lo"), Seq((2L, 11L)).toDF("rid", "ro"),
      "lo", "ro", 60L)
      .queryExecution.executedPlan.toString
    // the band predicate must arrive as an equi-join on buckets, never a
    // nested-loop theta-join
    assert(!rj.contains("CartesianProduct") &&
      !rj.contains("BroadcastNestedLoop"), rj)
    assert(rj.contains("Join"), rj)
  }

  test("sessionize: gap-based sessions; an exactly-gap-later event still merges") {
    val df = Seq(
      (1L, "2024-01-01 10:00:00", 1.0),
      (1L, "2024-01-01 10:10:00", 2.0),  // exactly gap later -> same session
      (1L, "2024-01-01 10:20:01", 4.0),  // 1 s beyond gap -> new session
      (2L, "2024-01-01 09:00:00", 8.0))
      .toDF("k", "s", "v").withColumn("ts", to_timestamp(col("s")))
    val out = Temporal.sessionize(df, Seq("k"), "ts", "10 minutes",
        Seq(count(lit(1)).as("n"), sum("v").as("sv")))
      .select(col("k"), unix_micros(col("session_start")).as("st"),
        unix_micros(col("session_last")).as("en"), col("n"), col("sv"))
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2)).toSeq
    def us(s: String): Long =
      java.time.Instant.parse(s).toEpochMilli * 1000L
    assert(out == Seq(
      (1L, us("2024-01-01T10:00:00Z"), us("2024-01-01T10:10:00Z"), 2L, 3.0),
      (1L, us("2024-01-01T10:20:01Z"), us("2024-01-01T10:20:01Z"), 1L, 4.0),
      (2L, us("2024-01-01T09:00:00Z"), us("2024-01-01T09:00:00Z"), 1L, 8.0)))
  }

  test("resampleHourlyFfill: dense grid, gap hours forward-fill, in-hour tie by (ts, id)") {
    import spark.implicits._
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val df = Seq(
      // user 1: events at 10:xx (two, same hour — later one wins), gap
      // at 11, then 12:05
      (1L, ts("2024-01-01 10:05:00"), 100L, 1.0),
      (1L, ts("2024-01-01 10:40:00"), 101L, 2.0),
      (1L, ts("2024-01-01 12:05:00"), 102L, 9.0),
      // user 2: single event → single-hour grid
      (2L, ts("2024-01-01 08:30:00"), 103L, 5.0))
      .toDF("user_id", "ts", "event_id", "value")
    val out = Temporal.resampleHourlyFfill(df, "user_id", "ts", "value", "event_id")
      .orderBy("user_id", "hour")
      .as[(Long, String, Long, Double)].collect().toSeq
    assert(out == Seq(
      (1L, "2024-01-01 10", 2L, 2.0), // in-hour tie: ts-desc → value 2.0
      (1L, "2024-01-01 11", 0L, 2.0), // gap hour forward-fills
      (1L, "2024-01-01 12", 1L, 9.0),
      (2L, "2024-01-01 08", 1L, 5.0)))
  }

  test("scd2History: change points open intervals, last interval stays open") {
    import spark.implicits._
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), 1L, "a"),
      (1L, ts("2024-01-01 01:00:00"), 2L, "a"), // same value → same interval
      (1L, ts("2024-01-01 02:00:00"), 3L, "b"), // change
      (1L, ts("2024-01-01 03:00:00"), 4L, "a"), // back to a = NEW interval
      (2L, ts("2024-01-01 05:00:00"), 5L, "x"))
      .toDF("user_id", "ts", "event_id", "v")
    val out = Temporal.scd2History(ev, "user_id", "ts", "v", "event_id")
      .orderBy("user_id", "valid_from")
      .collect().map(r => (r.getLong(0), r.getString(1),
        r.getTimestamp(2), Option(r.getTimestamp(3)), r.getLong(4))).toSeq
    assert(out == Seq(
      (1L, "a", ts("2024-01-01 00:00:00"), Some(ts("2024-01-01 02:00:00")), 2L),
      (1L, "b", ts("2024-01-01 02:00:00"), Some(ts("2024-01-01 03:00:00")), 1L),
      (1L, "a", ts("2024-01-01 03:00:00"), None, 1L), // re-entry, open-ended
      (2L, "x", ts("2024-01-01 05:00:00"), None, 1L)))
  }

  test("resampleHourlyFfill properties: dense grid, counts partition the input") {
    import spark.implicits._
    // seeded pseudo-random events over a 3-day span for 5 users
    val rnd = new scala.util.Random(7)
    val base = java.sql.Timestamp.valueOf("2024-02-01 00:00:00").getTime
    val ev = (1 to 400).map { i =>
      (rnd.nextInt(5).toLong,
        new java.sql.Timestamp(base + rnd.nextInt(3 * 24 * 3600) * 1000L),
        i.toLong, rnd.nextDouble())
    }.toDF("user_id", "ts", "event_id", "value")
    val out = Temporal.resampleHourlyFfill(ev, "user_id", "ts", "value", "event_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.get(3))).toSeq
    // counts partition the input exactly
    assert(out.map(_._3).sum == 400L)
    // per-user grid is DENSE: hours count == span between min and max + 1
    out.groupBy(_._1).foreach { case (_, rows) =>
      val hours = rows.map(_._2).sorted
      val h0 = java.time.LocalDateTime.parse(hours.head + ":00:00",
        java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
      val h1 = java.time.LocalDateTime.parse(hours.last + ":00:00",
        java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
      val span = java.time.Duration.between(h0, h1).toHours + 1
      assert(hours.length.toLong == span, s"grid not dense: ${hours.length} vs $span")
      assert(hours.distinct.length == hours.length)
    }
    // forward fill never leaves a null after the first observation
    assert(out.forall(_._4 != null))
  }

  test("scd2History properties: intervals partition events; valid_from increases") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val base = java.sql.Timestamp.valueOf("2024-03-01 00:00:00").getTime
    val vals = Seq("a", "b", "c")
    val ev = (1 to 300).map { i =>
      (rnd.nextInt(4).toLong,
        new java.sql.Timestamp(base + i * 60000L),
        i.toLong, vals(rnd.nextInt(3)))
    }.toDF("user_id", "ts", "event_id", "v")
    val out = Temporal.scd2History(ev, "user_id", "ts", "v", "event_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
        Option(r.getTimestamp(3)), r.getLong(4))).toSeq
    assert(out.map(_._5).sum == 300L, "interval event counts partition the input")
    out.groupBy(_._1).foreach { case (_, ivs) =>
      val sorted = ivs.sortBy(_._3.getTime)
      // exactly one open interval per key, and it is the last one
      assert(sorted.count(_._4.isEmpty) == 1 && sorted.last._4.isEmpty)
      // each interval closes exactly where the next opens
      sorted.sliding(2).foreach {
        case Seq(a, b) =>
          assert(a._4.contains(b._3), "valid_to must equal next valid_from")
          assert(a._2 != b._2, "adjacent intervals must change value")
        case _ =>
      }
    }
  }

  test("funnel window edges: pre-signup purchase excluded, day-7 boundary included") {
    import spark.implicits._
    val ts = (s: String) => java.sql.Timestamp.valueOf(s)
    // u1: purchase BEFORE signup only → not converted
    // u2: purchase exactly 7 days after signup → converted (<= bound)
    // u3: purchase 7 days + 1 µs later → not converted
    val ev = Seq(
      (1L, "signup", ts("2024-01-10 00:00:00")),
      (1L, "purchase", ts("2024-01-05 00:00:00")),
      (2L, "signup", ts("2024-01-01 00:00:00")),
      (2L, "purchase", ts("2024-01-08 00:00:00")),
      (3L, "signup", ts("2024-01-01 00:00:00")),
      (3L, "purchase", java.sql.Timestamp.from(
        ts("2024-01-08 00:00:00").toInstant.plusNanos(1000))))
      .toDF("user_id", "event_type", "ts")
    // re-run the gate's plan shape on the fixture via the registered query
    // builder path: signup-anchored 7-day conversion
    val signup = ev.filter($"event_type" === "signup")
      .groupBy($"user_id").agg(org.apache.spark.sql.functions.min($"ts").as("su"))
    val purchase = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts".as("pt"))
    import org.apache.spark.sql.functions._
    val conv = signup.join(purchase, Seq("user_id"), "left")
      .groupBy($"user_id")
      .agg(max(when(unix_micros($"pt") >= unix_micros($"su") &&
        unix_micros($"pt") - unix_micros($"su") <= lit(604800000000L), 1)
        .otherwise(0)).as("conv"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(conv(1L) == 0 && conv(2L) == 1 && conv(3L) == 0)
  }

  test("transitionMatrix counts per-user consecutive pairs, P sums to 1 per prev") {
    import java.sql.Timestamp
    def t(s: Long) = new Timestamp(1700000000000L + s * 1000L)
    val ev = Seq(
      (1L, t(1), "a", 1L), (1L, t(2), "b", 2L), (1L, t(3), "a", 3L),
      (1L, t(4), "b", 4L),
      (2L, t(1), "a", 5L), (2L, t(2), "a", 6L),
      (3L, t(9), "c", 7L)) // single event: no transition
      .toDF("user_id", "ts", "event_type", "event_id")
    val got = Temporal.transitionMatrix(ev, "user_id", "event_type",
        "ts", "event_id")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(got == Map(
      ("a", "b") -> (2L, 0.666667), ("a", "a") -> (1L, 0.333333),
      ("b", "a") -> (1L, 1.0)))
  }

  test("transitionMatrix breaks timestamp ties by the tiebreak column") {
    import java.sql.Timestamp
    val ts = new Timestamp(1700000000000L)
    val ev = Seq((1L, ts, "x", 2L), (1L, ts, "y", 1L))
      .toDF("user_id", "ts", "event_type", "event_id")
    val got = Temporal.transitionMatrix(ev, "user_id", "event_type",
        "ts", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got == Seq(("y", "x"))) // event_id 1 first
  }

  test("changePoint recovers an injected volume step") {
    import java.sql.Timestamp
    // 10 days at ~5 events/day, then 10 days at ~50/day
    val rows = (0 until 20).flatMap { day =>
      val n = if (day < 10) 5 else 50
      (0 until n).map(i =>
        Timestamp.valueOf(f"2024-03-${day + 1}%02d 0${i % 9}:00:00"))
    }
    val got = Temporal.changePoint(rows.toDF("ts"), "ts").head()
    assert(got.getAs[String]("break_day") === "2024-03-10")
    assert(got.getAs[Double]("mean_before") === 5.0)
    assert(got.getAs[Double]("mean_after") === 50.0)
    assert(got.getAs[Long]("n_before") === 10L)
  }

  test("holtSmoothing tracks a perfectly linear series exactly") {
    import java.sql.Timestamp
    // y_d = 4 + 3·d events on day d: level_t = y_t, trend_t = 3,
    // fitted_t = y_t for t >= 2 (exact by induction)
    val rows = (0 until 12).flatMap(day => (0 until 4 + 3 * day).map(i =>
      Timestamp.valueOf(f"2024-03-${day + 1}%02d 0${i % 9}:15:00")))
    val got = Temporal.holtSmoothing(rows.toDF("ts"), "ts")
      .orderBy("day").collect()
    got.zipWithIndex.foreach { case (r, i) =>
      assert(r.getAs[Double]("level") === (4.0 + 3 * i))
      assert(r.getAs[Double]("trend") === 3.0)
      if (i == 0) assert(r.isNullAt(r.fieldIndex("fitted")))
      else assert(r.getAs[Double]("fitted") === (4.0 + 3 * i))
    }
  }

  test("holtSmoothing damps a level shift gradually") {
    import java.sql.Timestamp
    val rows = (0 until 10).flatMap(day => (0 until (if (day < 5) 5 else 50))
      .map(i => Timestamp.valueOf(f"2024-03-${day + 1}%02d 0${i % 9}:45:00")))
    val got = Temporal.holtSmoothing(rows.toDF("ts"), "ts")
      .orderBy("day").collect()
    val fittedAtShift = got(5).getAs[Double]("fitted")
    assert(fittedAtShift < 10.0) // forecast lags the jump
    assert(got.last.getAs[Double]("level") > 30.0) // but converges up
  }

  test("changePoint on a flat series reports ~zero gain") {
    import java.sql.Timestamp
    val rows = (0 until 15).flatMap(day => (0 until 7).map(i =>
      Timestamp.valueOf(f"2024-03-${day + 1}%02d 0${i % 9}:30:00")))
    val got = Temporal.changePoint(rows.toDF("ts"), "ts").head()
    assert(math.abs(got.getAs[Double]("gain")) < 1e-6)
  }

  private def dayRows(counts: Seq[Int]): Seq[java.sql.Timestamp] =
    counts.zipWithIndex.flatMap { case (n, day) =>
      (0 until n).map(i => java.sql.Timestamp.valueOf(
        f"2024-03-${day + 1}%02d 0${i % 9}:10:00"))
    }

  test("holtWinters nails an exact period-7 pattern: zero forecast error") {
    // y repeats (10,20,30,40,30,20,10) — level flat, trend 0, seasonal
    // exactly the pattern; every fitted value equals y
    val pattern = Seq(10, 20, 30, 40, 30, 20, 10)
    val got = Temporal.holtWinters(
        dayRows(pattern ++ pattern ++ pattern).toDF("ts"), "ts")
      .orderBy("day").collect()
    assert(got.length == 14)
    got.foreach { r =>
      assert(r.getAs[Double]("fitted") === r.getAs[Long]("y").toDouble, r)
      assert(math.abs(r.getAs[Double]("trend")) < 1e-9, r)
    }
  }

  test("holtWinters beats plain Holt on a strongly seasonal series") {
    val pattern = Seq(5, 9, 40, 44, 41, 8, 6)
    val series = pattern ++ pattern ++ pattern ++ pattern
    val df = dayRows(series).toDF("ts")
    def sse(rows: Array[org.apache.spark.sql.Row]) = rows
      .filter(r => !r.isNullAt(r.fieldIndex("fitted")))
      .map { r =>
        val e = r.getAs[Double]("fitted") - r.getAs[Long]("y")
        e * e
      }.sum
    val hw = sse(Temporal.holtWinters(df, "ts").orderBy("day").collect())
    val holt = sse(Temporal.holtSmoothing(df, "ts").orderBy("day")
      .collect().drop(7)) // compare on the same forecastable tail
    assert(hw < holt / 10, (hw, holt))
  }

  test("holtWinters requires two full seasons") {
    intercept[IllegalArgumentException] {
      Temporal.holtWinters(dayRows(Seq.fill(13)(5)).toDF("ts"), "ts")
        .collect()
    }
  }

  test("robustTrend recovers an exact linear slope with zero-variance pairs") {
    // y = 7 + 3·i: every pairwise slope is 3, S = n(n-1)/2, no ties
    val got = Temporal.robustTrend(
        dayRows((0 until 12).map(d => 7 + 3 * d)).toDF("ts"), "ts").head()
    assert(got.getAs[Double]("slope") === 3.0)
    // index is 1-based: y = 7 + 3(i−1) = 4 + 3i, so y − 3i = 4
    assert(got.getAs[Double]("intercept") === 4.0)
    assert(got.getAs[Long]("s_stat") === 66L)       // 12*11/2
    assert(got.getAs[Long]("n_days") === 12L)
    assert(got.getAs[Double]("z") > 3.0) // strongly significant
  }

  test("robustTrend shrugs off an outlier that wrecks the OLS slope") {
    // flat series with one huge spike: median slope stays 0
    val counts = Seq(10, 10, 10, 10, 200, 10, 10, 10, 10)
    val got = Temporal.robustTrend(dayRows(counts).toDF("ts"), "ts").head()
    assert(got.getAs[Double]("slope") === 0.0)
    assert(math.abs(got.getAs[Double]("z")) < 1.0) // not significant
  }

  test("robustTrend tie correction: a constant series has var 0 and z 0") {
    val got = Temporal.robustTrend(dayRows(Seq.fill(8)(4)).toDF("ts"),
      "ts").head()
    assert(got.getAs[Long]("s_stat") === 0L)
    assert(got.getAs[Double]("var_s") === 0.0) // all in one tie group
    assert(got.getAs[Double]("z") === 0.0)
  }

  test("cusum stays silent on a stable series and alarms after a drift") {
    // 20 stable days then 10 drifted days: alarms only after the drift
    val counts = Seq.fill(20)(10) ++ Seq.fill(10)(14)
    val got = Temporal.cusumChart(dayRows(counts).toDF("ts"), "ts",
        k = 0.5, h = 4.0)
      .orderBy("day").collect()
    val alarms = got.map(_.getAs[Boolean]("alarm"))
    assert(!alarms.take(20).exists(identity), "false alarm pre-drift")
    assert(alarms.drop(20).exists(identity), "drift never flagged")
    // one-sided drift: the negative sum never fires
    assert(got.forall(_.getAs[Double]("s_minus") <= 4.0))
  }

  test("cusum sums are non-negative and reset under the allowance") {
    val counts = Seq(10, 11, 9, 10, 12, 8, 10, 11, 9, 10)
    val got = Temporal.cusumChart(dayRows(counts).toDF("ts"), "ts")
      .collect()
    got.foreach { r =>
      assert(r.getAs[Double]("s_plus") >= 0.0)
      assert(r.getAs[Double]("s_minus") >= 0.0)
      assert(!r.getAs[Boolean]("alarm"))
    }
  }
}
