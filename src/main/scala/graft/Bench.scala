package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: times every SparkEntry query at
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line for the driver.
  *
  * Hygiene (round-1 VERDICT #5): a query that throws is recorded in
  * "errors" and EXCLUDED from the total instead of being silently
  * counted as a fast success. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup so the first measured query doesn't absorb
    // Spark's one-time startup cost
    spark.range(1000).selectExpr("sum(id)").collect()

    var times = Vector.empty[(String, Double)]
    var errors = Vector.empty[(String, String)]
    // SPARK_GRAFT_ONLY=q_a,q_b → time just those (local iteration aid)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).count()
        times :+= name -> (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          errors :+= name -> Option(e.getMessage).getOrElse(e.getClass.getName)
            .replaceAll("[\"\\\\\n\r\t]", " ").take(160)
      }
      // outside the timed window: drop every block the finished query
      // leaked so later iterative queries run against an empty block
      // manager (in-session parity with their isolated times)
      SessionHygiene.sweep(spark)
    }
    val qs = times.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val errs = errors.map { case (k, v) => "\"" + k + "\":\"" + v + "\"" }
      .mkString("{", ",", "}")
    val total = times.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"n_ok":${times.size},"n_err":${errors.size},"sf":"$sfDir"}""")
    spark.stop()
  }
}
