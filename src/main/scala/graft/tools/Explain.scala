package graft.tools

import org.apache.spark.sql.SparkSession
import graft.SparkEntry

/** Plan auditor: `.explain("formatted")` for selected queries (or a
  * default audit set) — the loop for checking that filters reach the
  * parquet scan (PushedFilters), small sides broadcast, and operators
  * stay inside WholeStageCodegen. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_lookup", "q_filter", "q_inner_join", "q_aggregate",
        "q_go_1", "q_cosine_topk", "q_dedup_exact")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // plans must reflect the bench/verify posture: store-backed unless
    // SPARK_GRAFT_STORE=off (same knob as Bench/Verify)
    if (!sys.env.get("SPARK_GRAFT_STORE").contains("off"))
      graft.sources.GraphStore.enableManaged(spark)
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
