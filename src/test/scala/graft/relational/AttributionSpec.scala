package graft.relational

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Attribution against a hand-traced journey, plus the unattributed
  * tail and credit-conservation contracts. */
class AttributionSpec extends SparkSpec {

  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  // user 1: ad → email → PURCHASE → search → PURCHASE → ad (dangling)
  // user 2: email → PURCHASE
  private def events = Seq(
    (1L, ts(1), 1L, "ad"), (1L, ts(2), 2L, "email"),
    (1L, ts(3), 3L, "purchase"),
    (1L, ts(4), 4L, "search"), (1L, ts(5), 5L, "purchase"),
    (1L, ts(6), 6L, "ad"),
    (2L, ts(1), 7L, "email"), (2L, ts(2), 8L, "purchase"))
    .toDF("user_id", "ts", "event_id", "channel")

  private lazy val got = Attribution.multiTouch(events, "user_id", "ts",
      "channel", "event_id", col("channel") === "purchase")
    .collect().map(r => r.getString(0) ->
      (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4))).toMap

  test("hand-traced journey attributes exactly") {
    // group u1#1: [ad, email] → first ad, last email, linear 0.5 each
    // group u1#2: [search]    → all to search
    // group u2#1: [email]     → all to email
    // trailing ad (after the last purchase) is unattributed
    assert(got("ad") === ((1L, 0L, 0.5, 1L)))
    assert(got("email") === ((1L, 2L, 1.5, 2L)))
    assert(got("search") === ((1L, 1L, 1.0, 1L)))
    assert(!got.contains("purchase"))
  }

  test("credit is conserved: linear credits sum to the conversion count") {
    val totalLinear = got.values.map(_._3).sum
    assert(totalLinear ~== (3.0, 1e-9)) // 3 purchases with ≥1 touch
    assert(got.values.map(_._1).sum === 3L) // one first-touch each
    assert(got.values.map(_._2).sum === 3L)
  }
}
