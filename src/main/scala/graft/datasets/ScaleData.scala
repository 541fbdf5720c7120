package graft.datasets

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic scaled replicas of the driver testdata schemas for
  * the SCALING harness ([[graft.Scaling]]): every table is a pure
  * projection of `spark.range(n)` through xxhash64-derived columns —
  * partition-count-independent, seed-stable, no driver-side data, so a
  * 16× corpus generates as fast as Spark can write parquet. Row counts
  * mirror sf0.1 (TESTDATA.md) times `factor`; value distributions
  * mirror the testdata's shape (same schemas, key ranges that keep
  * referential joins non-degenerate, same 5-language/20-source word
  * stream for documents) without claiming bit-parity — scaling curves
  * need workload shape, not oracle equality.
  *
  * Writes under the given directory ONLY (callers pass /tmp paths;
  * /root/testdata is never touched).
  */
object ScaleData {

  private def unit(key: Column, salt: String): Column =
    pmod(xxhash64(lit(salt), key), lit(1000000L)).cast("double") / 1e6

  private def pick(key: Column, salt: String, values: Seq[String]): Column = {
    val arr = array(values.map(lit): _*)
    element_at(arr, (pmod(xxhash64(lit(salt), key), lit(values.size.toLong))
      .cast("int") + 1))
  }

  private val vocab = Seq("spark", "query", "table", "hash", "join", "scan",
    "sort", "group", "agg", "filter", "merge", "batch", "stream", "column",
    "line", "part", "order", "key", "value", "window", "vector", "index",
    "cache", "shuffle", "stage", "task", "slow", "fast", "big", "small",
    "the", "a", "customer", "supplier", "region", "nation")

  def documents(spark: SparkSession, n: Long): DataFrame = {
    val langs = Seq("en", "en", "en", "zh", "es", "fr", "de") // en-heavy
    val id = col("id")
    val nWords = (pmod(xxhash64(lit("len"), id), lit(90L)) + 10L).cast("int")
    val words = transform(sequence(lit(1), nWords),
      i => element_at(array(vocab.map(lit): _*),
        pmod(xxhash64(lit("w"), id, i), lit(vocab.size.toLong)).cast("int") + 1))
    val text = concat(array_join(words, " "), lit(" "))
    spark.range(n).select(
      id.as("doc_id"), text.as("text"),
      pick(id, "lang", langs).as("lang"),
      concat(lit("src"), pmod(id, lit(20L)).cast("string")).as("source"),
      length(text).cast("long").as("n_chars"))
  }

  def embeddings(spark: SparkSession, n: Long, dim: Int = 64): DataFrame =
    spark.range(n).select(
      col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)),
        i => ((pmod(xxhash64(lit("e"), col("id"), i), lit(2000L)) - 1000L)
          .cast("double") / 5000.0).cast("float")).as("embedding"),
      pmod(col("id"), lit(10L)).cast("int").as("label"))

  def events(spark: SparkSession, n: Long, nUsers: Long): DataFrame = {
    val id = col("id")
    spark.range(n).select(
      id.as("event_id"),
      // ~30s cadence from 2024-01-01, hash jitter
      timestamp_micros(lit(1704067200000000L) + id * 30000000L +
        pmod(xxhash64(lit("j"), id), lit(29000000L))).as("ts"),
      pmod(xxhash64(lit("u"), id), lit(nUsers)).as("user_id"),
      pick(id, "et", Seq("view", "view", "view", "click", "purchase",
        "signup", "error")).as("event_type"),
      round(unit(id, "v") * 200.0, 2).as("value"),
      concat(lit("{\"k\": "),
        pmod(xxhash64(lit("p"), id), lit(100L)).cast("string"),
        lit("}")).as("props"))
  }

  def customer(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(
      col("id").as("c_custkey"),
      concat(lit("Customer#"), lpad(col("id").cast("string"), 9, "0"))
        .as("c_name"),
      pmod(xxhash64(lit("cn"), col("id")), lit(25L)).cast("int")
        .as("c_nationkey"),
      round(unit(col("id"), "cb") * 10000.0, 2).as("c_acctbal"),
      pick(col("id"), "cm", Seq("AUTOMOBILE", "BUILDING", "FURNITURE",
        "MACHINERY", "HOUSEHOLD")).as("c_mktsegment"))

  def supplier(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(
      col("id").as("s_suppkey"),
      concat(lit("Supplier#"), lpad(col("id").cast("string"), 9, "0"))
        .as("s_name"),
      pmod(xxhash64(lit("sn"), col("id")), lit(25L)).cast("int")
        .as("s_nationkey"),
      round(unit(col("id"), "sb") * 10000.0, 2).as("s_acctbal"))

  def part(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(
      col("id").as("p_partkey"),
      concat(lit("part "), pick(col("id"), "pw", vocab)).as("p_name"),
      concat(lit("Brand#"), pmod(col("id"), lit(5L)).cast("string"))
        .as("p_brand"),
      pick(col("id"), "pt", Seq("STANDARD", "SMALL", "MEDIUM", "LARGE",
        "ECONOMY", "PROMO")).as("p_type"),
      (pmod(xxhash64(lit("ps"), col("id")), lit(50L)) + 1L).cast("int")
        .as("p_size"),
      round(unit(col("id"), "pr") * 2000.0, 2).as("p_retailprice"))

  def orders(spark: SparkSession, n: Long, nCustomers: Long): DataFrame =
    spark.range(n).select(
      col("id").as("o_orderkey"),
      pmod(xxhash64(lit("oc"), col("id")), lit(nCustomers)).as("o_custkey"),
      pick(col("id"), "os", Seq("O", "F", "P")).as("o_orderstatus"),
      round(unit(col("id"), "op") * 300000.0, 2).as("o_totalprice"),
      timestamp_micros(lit(694224000000000L) + // 1992-01-01
        pmod(xxhash64(lit("od"), col("id")), lit(220752000000000L)))
        .as("o_orderdate"),
      pick(col("id"), "opr", Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
        "4-NOT SPECIFIED", "5-LOW")).as("o_orderpriority"))

  def lineitem(spark: SparkSession, n: Long, nOrders: Long, nParts: Long,
      nSuppliers: Long): DataFrame =
    spark.range(n).select(
      pmod(xxhash64(lit("lo"), col("id")), lit(nOrders)).as("l_orderkey"),
      pmod(xxhash64(lit("lp"), col("id")), lit(nParts)).as("l_partkey"),
      pmod(xxhash64(lit("ls"), col("id")), lit(nSuppliers)).as("l_suppkey"),
      (pmod(col("id"), lit(7L)) + 1L).cast("int").as("l_linenumber"),
      (pmod(xxhash64(lit("lq"), col("id")), lit(50L)) + 1L).cast("double")
        .as("l_quantity"),
      round(unit(col("id"), "le") * 100000.0, 2).as("l_extendedprice"),
      (pmod(xxhash64(lit("ld"), col("id")), lit(11L)).cast("double") / 100.0)
        .as("l_discount"),
      (pmod(xxhash64(lit("lt"), col("id")), lit(9L)).cast("double") / 100.0)
        .as("l_tax"),
      pick(col("id"), "lr", Seq("N", "N", "A", "R")).as("l_returnflag"),
      pick(col("id"), "ll", Seq("O", "F")).as("l_linestatus"),
      timestamp_micros(lit(694224000000000L) +
        pmod(xxhash64(lit("lsd"), col("id")), lit(252288000000000L)))
        .as("l_shipdate"))

  def nation(spark: SparkSession): DataFrame =
    spark.range(25).select(
      col("id").cast("int").as("n_nationkey"),
      concat(lit("NATION_"), col("id").cast("string")).as("n_name"),
      pmod(col("id"), lit(5L)).cast("int").as("n_regionkey"))

  def region(spark: SparkSession): DataFrame =
    spark.range(5).select(
      col("id").cast("int").as("r_regionkey"),
      concat(lit("REGION_"), col("id").cast("string")).as("r_name"))

  /** Generate the full ten-table dataset at sf0.1-row-counts × factor
    * under `outDir` (skipped if already present — the layout is pure
    * function of factor).
    */
  def generate(spark: SparkSession, outDir: String, factor: Int): Unit = {
    val f = factor.toLong
    val nCust = 15000L * f
    val nOrd = 150000L * f
    val nPart = 20000L * f
    val nSupp = 1000L * f
    val tables: Seq[(String, DataFrame)] = Seq(
      "region" -> region(spark),
      "nation" -> nation(spark),
      "supplier" -> supplier(spark, nSupp),
      "customer" -> customer(spark, nCust),
      "part" -> part(spark, nPart),
      "orders" -> orders(spark, nOrd, nCust),
      "lineitem" -> lineitem(spark, 600000L * f, nOrd, nPart, nSupp),
      "events" -> events(spark, 100000L * f, nUsers = 2000L * f),
      "documents" -> documents(spark, 5000L * f),
      "embeddings" -> embeddings(spark, 2000L * f))
    tables.foreach { case (name, df) =>
      val path = s"$outDir/$name.parquet"
      // reuse only a COMPLETE write: a dir without Spark's _SUCCESS
      // marker is a killed run's partial output — regenerate it
      // (mode overwrite), never silently time gates against it
      if (!new java.io.File(s"$path/_SUCCESS").exists)
        df.write.mode("overwrite").parquet(path)
    }
  }
}
