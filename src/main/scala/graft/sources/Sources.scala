package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.StructType

/** Source/sink layer.
  *
  * Reference: update_raw (StationBases.py:1021) normalizes and upserts
  * DWD CDC files into per-station tables. Here ingest is
  * file-to-DataFrame with explicit schemas (never inference on big
  * data), dedup-keep-latest normalization, and bucketed parquet output
  * so downstream per-station operators read co-partitioned data
  * without a shuffle.
  */
object Sources {

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** CSV with explicit schema — schema inference would scan 100 TB
    * twice. */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true): DataFrame =
    spark.read.schema(schema).option("header", header.toString).csv(path)

  /** JSON-lines with explicit schema. */
  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Ingest normalization: exact-duplicate rows collapse; conflicting
    * measurements for the same (station, timestamp) resolve to the
    * latest import (highest event_id) — the reference's
    * ON CONFLICT DO UPDATE upsert semantics. */
  def ingestDedup(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("ts")).orderBy(col("event_id").desc)
    events.withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
  }

  /** Bucketed, sorted parquet table: downstream joins/windows keyed on
    * bucketCol become shuffle-free scans. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      nBuckets: Int = 32): Unit =
    df.write.mode("overwrite")
      .bucketBy(nBuckets, bucketCol).sortBy(bucketCol)
      .option("path", s"spark-warehouse/$table")
      .saveAsTable(table)
}
