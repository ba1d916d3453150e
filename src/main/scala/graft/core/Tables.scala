package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-provided parquet tables.
  *
  * Mirrors the reference's per-table access layer
  * (weatherdb/db/connections.py) but as plain Spark reads: schema
  * discovery, predicate pushdown and column pruning are left to the
  * parquet datasource.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  /** events.parquet stores TIMESTAMP(NANOS); Spark's parquet reader has
    * no nanos timestamp type, so sessions set
    * `spark.sql.legacy.parquet.nanosAsLong` and we convert the long
    * nanos to a microsecond timestamp here (data is micro-aligned). */
  def events(s: SparkSession, d: String): DataFrame = {
    val df = load(s, d, "events")
    if (df.schema("ts").dataType == LongType)
      df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else df
  }
  /** Small parquet files arrive as one split, which would serialize
    * the expensive per-document hash/vector projections onto a single
    * core; spread them across the session's parallelism. At cluster
    * scale real inputs have many splits and this is a no-op. */
  def ensureParallelism(s: SparkSession, df: DataFrame): DataFrame = {
    val target = s.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  def documents(s: SparkSession, d: String): DataFrame =
    ensureParallelism(s, load(s, d, "documents"))
  def embeddings(s: SparkSession, d: String): DataFrame =
    ensureParallelism(s, load(s, d, "embeddings"))
}
