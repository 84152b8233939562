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
  private val features = Seq(
    "/root/reference/tests/tck/features/go/GO.feature",
    "/root/reference/tests/tck/features/fetch/FetchVertices.strVid.feature",
    "/root/reference/tests/tck/features/lookup/WithYield.feature",
    // (LookUpTopN is excluded: its ORDER BY+LIMIT scenarios cut ties
    // at the limit boundary, so ANY reimplementation's row choice is
    // valid but cannot match the recorded golden rows)
    "/root/reference/tests/tck/features/lookup/LookUpLimit.feature",
    "/root/reference/tests/tck/features/lookup/TagIndexFullScan.feature",
    "/root/reference/tests/tck/features/lookup/Output.feature",
    // (GroupbyLimit excluded like LookUpTopN: LIMIT after ORDER BY on
    // an all-NULL key makes the surviving rows order-ambiguous)
    "/root/reference/tests/tck/features/go/Orderby.feature",
    // MATCH surface (round 3)
    "/root/reference/tests/tck/features/match/Base.feature",
    "/root/reference/tests/tck/features/match/MatchById.feature",
    "/root/reference/tests/tck/features/match/SeekById.feature",
    "/root/reference/tests/tck/features/match/SeekByTag.feature",
    "/root/reference/tests/tck/features/match/StartFromAnyNode.feature",
    "/root/reference/tests/tck/features/match/MatchGroupBy.feature",
    "/root/reference/tests/tck/features/match/MultiQueryParts.feature",
    "/root/reference/tests/tck/features/match/VariableLengthPattern.feature",
    "/root/reference/tests/tck/features/match/ZeroStep.feature",
    "/root/reference/tests/tck/features/match/PipeAndVariable.feature",
    "/root/reference/tests/tck/features/match/MatchByVariable.feature",
    "/root/reference/tests/tck/features/match/With.feature",
    "/root/reference/tests/tck/features/match/Unwind.feature",
    // FETCH edge form + set sentences (round 3)
    "/root/reference/tests/tck/features/fetch/FetchEdges.strVid.feature",
    "/root/reference/tests/tck/features/set/Set.feature",
    // expression / aggregate / yield / function surface (round 3)
    "/root/reference/tests/tck/features/expression/Case.feature",
    "/root/reference/tests/tck/features/expression/EndsWith.feature",
    "/root/reference/tests/tck/features/expression/StartsWith.feature",
    "/root/reference/tests/tck/features/expression/In.feature",
    "/root/reference/tests/tck/features/expression/NotIn.feature",
    "/root/reference/tests/tck/features/expression/LogicalExpression.feature",
    "/root/reference/tests/tck/features/expression/RelationalExpr.feature",
    "/root/reference/tests/tck/features/expression/Null.feature",
    "/root/reference/tests/tck/features/expression/FunctionCall.feature",
    "/root/reference/tests/tck/features/expression/Attribute.feature",
    "/root/reference/tests/tck/features/expression/UnaryExpr.feature",
    "/root/reference/tests/tck/features/aggregate/Agg.feature",
    "/root/reference/tests/tck/features/yield/yield.feature",
    "/root/reference/tests/tck/features/function/coalesce.feature",
    "/root/reference/tests/tck/features/function/round.feature",
    // lambda expressions: quantifiers, comprehensions, reduce, slices
    "/root/reference/tests/tck/features/expression/Predicate.feature",
    "/root/reference/tests/tck/features/expression/ListComprehension.feature",
    "/root/reference/tests/tck/features/expression/Reduce.feature",
    "/root/reference/tests/tck/features/expression/ListRangeSubscript.feature")
  private def have = features.forall(f => new java.io.File(f).exists())

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

  test("reference TCK features: every executable scenario matches its golden") {
    assume(have)
    val cat = catalog
    var executed = 0; var passed = 0; var skipped = 0
    features.foreach { f =>
      val text = java.nio.file.Files.readString(java.nio.file.Paths.get(f))
      val report = TckRunner.run(cat, text)
      info(s"${f.split('/').last}: executed=${report.executed} " +
        s"passed=${report.passed} skipped=${report.skipped} " +
        s"errored=${report.errored}")
      report.failures.take(5).foreach { case (q, why) =>
        info(s"FAIL: $q -> $why")
      }
      report.errors.take(5).foreach { case (q, why) =>
        info(s"ERROR: $q -> $why")
      }
      assert(report.ok, s"$f: ${report.failures.size} golden mismatches, " +
        s"${report.errored} execution errors")
      executed += report.executed; passed += report.passed
      skipped += report.skipped
    }
    assert(executed >= 30, "too few scenarios executed to be meaningful")
    assert(passed == executed)
  }

  test("feature parsing finds a substantial scenario corpus") {
    assume(have)
    val text = java.nio.file.Files.readString(
      java.nio.file.Paths.get(features.head))
    val cases = TckRunner.parseFeature(text)
    assert(cases.size >= 50, s"only ${cases.size} cases parsed from GO.feature")
  }
}
