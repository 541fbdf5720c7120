package graft

class EntrySmokeSpec extends SparkSpec {
  test("SparkEntry.entry (flagship v7) returns rows at sf0.001") {
    val n = SparkEntry.entry(spark).count()
    info(s"entry rows: $n")
    assert(n > 0)
  }
}
