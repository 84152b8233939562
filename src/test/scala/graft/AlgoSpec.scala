package graft

import graft.algo.GraphAlgos
import org.apache.spark.sql.functions._

/** Convergence-mode analytics: fixed-round mode exists for oracle
  * replay; untilConverged/tol must be correct on graphs whose diameter
  * exceeds any fixed round count. */
class AlgoSpec extends SparkSpec {

  test("WCC untilConverged is correct on a diameter-8 chain (fixed-6 is not)") {
    import spark.implicits._
    // chain v1-v2-...-v9 (diameter 8) plus an isolated pair
    val verts = ((1 to 9).map(i => s"v$i") ++ Seq("x1", "x2")).toDF("vid")
    val edges = ((1 to 8).map(i => (s"v$i", s"v${i + 1}")) ++ Seq("x1" -> "x2"))
      .toDF("src", "dst")

    // 6 fixed rounds: label cannot cross 8 hops — far end still wrong
    val fixed = GraphAlgos.connectedComponents(verts, edges, 6)
      .filter($"vid" === "v9").select("label").as[String].head()
    assert(fixed != "v1", "6 rounds unexpectedly reached the chain end")

    // convergence mode with a generous cap: every chain vertex -> v1
    val conv = GraphAlgos.connectedComponents(verts, edges, 50,
      untilConverged = true)
    val labels = conv.as[(String, String)].collect().toMap
    (1 to 9).foreach(i => assert(labels(s"v$i") == "v1", s"v$i: ${labels(s"v$i")}"))
    assert(labels("x1") == "x1" && labels("x2") == "x1")
  }

  test("PageRank tol-mode stops early and matches long fixed run") {
    import spark.implicits._
    val verts = (1 to 6).map(i => s"v$i").toDF("vid")
    val edges = Seq("v1" -> "v2", "v2" -> "v3", "v3" -> "v1",
      "v4" -> "v1", "v5" -> "v1", "v6" -> "v3").toDF("src", "dst")
    val long = GraphAlgos.pageRank(verts, edges, 60)
      .as[(String, Double)].collect().toMap
    val conv = GraphAlgos.pageRank(verts, edges, 200, tol = 1e-7)
      .as[(String, Double)].collect().toMap
    long.foreach { case (v, p) =>
      assert(math.abs(conv(v) - p) < 1e-4, s"$v: ${conv(v)} vs $p")
    }
  }

  test("saltedSum spreads a hot key with constant values and stays exact") {
    import spark.implicits._
    val df = (1 to 1000).map(i => ("hot", 1.0, i)) :+ (("cold", 2.0, 0))
    val frame = df.toDF("k", "v", "row")
    val out = graft.operators.Skew.saltedSum(frame, "k", "v", salt = 8)
      .as[(String, Double)].collect().toMap
    assert(out("hot") == 1000.0 && out("cold") == 2.0)
    // the pre-split actually splits: partial agg over (k, salt) must
    // see >1 bucket for the hot key even though v is constant
    val buckets = frame.withColumn("__salt",
        pmod(hash(frame.columns.map(col): _*), lit(8)))
      .filter($"k" === "hot").select("__salt").distinct().count()
    assert(buckets > 1, s"hot key not scattered: $buckets bucket(s)")
  }
}
