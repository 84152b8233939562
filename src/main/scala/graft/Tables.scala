package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All reads are plain parquet scans: schema comes from the footer (no
  * inference cost), and Catalyst pushes filters/projections down to the
  * scan, which is the Spark-native equivalent of the reference's
  * storage-side IndexScan/prefix-scan machinery
  * (src/storage/exec/IndexScanNode.cpp).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") loadEvents(spark, s"$sfDir/$name.parquet")
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** events.parquet carries TIMESTAMP(NANOS) which Spark's reader
    * rejects by default; read nanos as long and truncate to µs (the
    * same ns→µs floor DuckDB applies), keeping the column name+type
    * contract (ts: timestamp). */
  def loadEvents(spark: SparkSession, path: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(path)
      .withColumn("ts",
        org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
  }

  /** Register every table as a temp view so spark.sql(...) mirrors the
    * DuckDB oracle's naming. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
