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
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Register every table as a temp view so spark.sql(...) mirrors the
    * DuckDB oracle's naming. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
