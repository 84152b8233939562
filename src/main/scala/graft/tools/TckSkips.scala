package graft.tools

import org.apache.spark.sql.SparkSession
import graft.graph.{GraphCatalog, MapCatalog}
import graft.sources.CsvFixtures
import graft.nql.Gql
import graft.tck.TckRunner

/** Diagnostic: list the TCK scenarios the runner SKIPS (parse reject /
  * unsupported surface) for the given feature files, with the reason.
  * Usage: runMain graft.tools.TckSkips <feature-file>...
  */
object TckSkips {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]").appName("tck-skips")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val nba = "/root/reference/tests/data/nba"
    val cat: GraphCatalog = MapCatalog(
      tags = Map(
        "player" -> CsvFixtures.load(spark, s"$nba/player.csv")
          .unionByName(CsvFixtures.load(spark, s"$nba/null.csv"),
            allowMissingColumns = true),
        "team" -> CsvFixtures.load(spark, s"$nba/team.csv"),
        "bachelor" -> CsvFixtures.load(spark, s"$nba/bachelor.csv")),
      edges = Map(
        "like" -> CsvFixtures.load(spark, s"$nba/like.csv"),
        "serve" -> CsvFixtures.load(spark, s"$nba/serve.csv"),
        "teammate" -> CsvFixtures.load(spark, s"$nba/teammate.csv")))
    // debug mode: TCK_QUERY=<substring> dumps got/want rows for the
    // matching query of the FIRST file instead of a report
    sys.env.get("TCK_QUERY").foreach { sub =>
      val text = java.nio.file.Files.readString(java.nio.file.Paths.get(args(0)))
      TckRunner.parseFeature(text).filter(_.query.contains(sub)).foreach { c =>
        println(s"QUERY ${c.query}")
        val got = Gql.runScript(cat, c.query).limit(100000).collect().toSeq
          .map(r => r.toSeq.map(TckRunner.norm).mkString(" | "))
        got.sorted.foreach(r => println(s"GOT  $r"))
        c.golden.map(_.map(TckRunner.normGoldenCell(_)).mkString(" | "))
          .sorted.foreach(r => println(s"WANT $r"))
      }
      spark.stop(); sys.exit(0)
    }
    args.foreach { f =>
      val text = java.nio.file.Files.readString(java.nio.file.Paths.get(f))
      println(s"===== $f")
      val report = TckRunner.run(cat, text)
      println(s"REPORT executed=${report.executed} passed=${report.passed} " +
        s"skipped=${report.skipped} errored=${report.errored} " +
        s"diverged=${report.diverged}")
      report.failures.foreach { case (q, why) =>
        println(s"FAIL [${why.take(400)}] :: ${q.take(200)}")
      }
      report.errors.foreach { case (q, why) =>
        println(s"ERROR [${why.take(200)}] :: ${q.take(200)}")
      }
      TckRunner.parseFeature(text).foreach { c =>
        val why =
          try { Gql.parseScript(c.query); null }
          catch { case e: Exception => s"PARSE: ${e.getMessage}" }
        val why2 = if (why != null) why else {
          try { Gql.runScript(cat, c.query).limit(1).collect(); null }
          catch {
            case e: IllegalArgumentException => s"EXEC-IAE: ${e.getMessage}"
            case e: org.apache.spark.sql.AnalysisException =>
              s"EXEC-ANALYSIS: ${e.getMessage.take(120)}"
            case _: Exception => null // errors are surfaced by the spec
          }
        }
        if (why2 != null)
          println(s"SKIP [${why2.take(150)}] :: ${c.query.take(200)}")
      }
    }
    spark.stop()
  }
}
