package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A bundle of named queries + their DuckDB oracle SQL, contributed by one
  * module. SparkEntry aggregates every pack. Queries without an oracle get
  * the driver's weaker rows-only check (iterative / seed-dependent ops).
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}
