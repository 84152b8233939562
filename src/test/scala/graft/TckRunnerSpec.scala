package graft

import graft.graph.MapCatalog
import graft.sources.CsvFixtures
import graft.tck.TckRunner

/** Runs the reference's OWN Gherkin TCK scenarios (tests/tck/features/
  * go/GO.feature) against the nba fixture graph through the nGQL
  * parser. Contract: every scenario the subset can execute must match
  * its golden table; unsupported syntax is skipped and counted. */
class TckRunnerSpec extends SparkSpec {

  private val nba = "/root/reference/tests/data/nba"
  private val feature = "/root/reference/tests/tck/features/go/GO.feature"
  private def have = new java.io.File(feature).exists()

  private def catalog = MapCatalog(
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

  test("GO.feature: every executable scenario matches its golden table") {
    assume(have)
    val text = java.nio.file.Files.readString(java.nio.file.Paths.get(feature))
    val report = TckRunner.run(catalog, text)
    info(s"executed=${report.executed} passed=${report.passed} " +
      s"skipped=${report.skipped}")
    report.failures.take(5).foreach { case (q, why) =>
      info(s"FAIL: $q -> $why")
    }
    assert(report.ok, s"${report.failures.size} golden mismatches")
    assert(report.executed >= 5, "too few scenarios executed to be meaningful")
    assert(report.passed == report.executed)
  }

  test("feature parsing finds a substantial scenario corpus") {
    assume(have)
    val text = java.nio.file.Files.readString(java.nio.file.Paths.get(feature))
    val cases = TckRunner.parseFeature(text)
    assert(cases.size >= 50, s"only ${cases.size} cases parsed from GO.feature")
  }
}
