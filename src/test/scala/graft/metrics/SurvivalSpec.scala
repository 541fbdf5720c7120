package graft.metrics

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  private def km(rows: Seq[(Long, Boolean)]) =
    Survival.kaplanMeier(rows.toDF("duration_days", "churned"),
        "duration_days", "churned")
      .orderBy("t")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(4)))

  test("textbook KM: censoring keeps units in earlier risk sets only") {
    // deaths at 1 (n=5), 3 (n=3); censored at 2 and 3
    val got = km(Seq((1L, true), (2L, false), (3L, true),
      (3L, false), (5L, false)))
    assert(got.map(_._1).toSeq == Seq(1L, 3L))
    val s1 = got(0); val s3 = got(1)
    assert(s1._2 == 5 && s1._3 == 1 && math.abs(s1._4 - 0.8) < 1e-9)
    // S(3) = round(0.8 * round(1 - 1/3, 6), 6) — the quantized trajectory
    assert(s3._2 == 3 && s3._4 == 0.533334)
  }

  test("no censoring: KM equals the empirical survival function") {
    val got = km(Seq((1L, true), (1L, true), (2L, true), (4L, true)))
    assert(got.map(r => (r._1, r._4)).toSeq ==
      Seq((1L, 0.5), (2L, 0.25), (4L, 0.0)))
  }

  test("all censored: no curve rows, nothing fabricated") {
    assert(km(Seq((1L, false), (2L, false))).isEmpty)
  }

  test("durations: censoring window keeps recently-active users alive") {
    import java.sql.Timestamp
    def t(d: Long) = new Timestamp(1700000000000L + d * 86400000L)
    val ev = Seq(
      (1L, t(0)), (1L, t(10)),   // last seen day 10, cutoff 30: churned
      (2L, t(5)), (2L, t(28)),   // within 7d of cutoff: censored
      (3L, t(30)))               // defines the cutoff; duration 0
      .toDF("user_id", "ts")
    val got = Survival.durations(ev, "user_id", "ts", churnGapUnits = 7)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2)))
      .toMap
    assert(got(1L) == ((10L, true)))
    assert(got(2L) == ((23L, false)))
    assert(got(3L) == ((0L, false)))
  }
}
