package graft

import graft.nql.Gql
import graft.nql.Gql._
import graft.traverse.Traverse.{Both, In, Out}

/** Parser unit tests for the nGQL sentence subset. Execution against
  * data is covered by the q_nql_* oracle queries. */
class GqlSpec extends SparkSpec {

  test("GO defaults: 1 step, Out, implicit yields") {
    val Go(m, n, seeds, et, dir, ys, dist, where, _) =
      Gql.parse("""GO FROM "a" OVER like"""): @unchecked
    assert(m == 1 && n == 1 && seeds == Seq("a") && et == "like" && dir == Out)
    assert(ys.map(_.prop) == Seq("origin", "vid", "step"))
    assert(!dist && where.isEmpty)
  }

  test("GO m TO n STEPS with direction and aliased yields") {
    val Go(m, n, seeds, et, dir, ys, _, _, _) =
      Gql.parse("""GO 2 TO 3 STEPS FROM "a", "b" OVER * REVERSELY YIELD vid AS v, step"""): @unchecked
    assert(m == 2 && n == 3 && seeds == Seq("a", "b") && et == "*" && dir == In)
    assert(ys.map(y => y.prop -> y.alias) == Seq("vid" -> "v", "step" -> "step"))
  }

  test("GO N STEPS (no TO) fixes both ends of the range") {
    val Go(m, n, _, _, dir, _, _, _, _) =
      Gql.parse("""GO 3 STEPS FROM "x" OVER e BIDIRECT"""): @unchecked
    assert(m == 3 && n == 3 && dir == Both)
  }

  test("LOOKUP with WHERE ops and literals") {
    val Lookup(tag, where, ys, _) =
      Gql.parse("""LOOKUP ON customer WHERE acctbal >= 9900 YIELD vid, name AS n"""): @unchecked
    assert(tag == "customer" &&
      where.contains(Gql.LkWhere(None, "acctbal", ">=", 9900L)))
    assert(ys.map(y => y.prop -> y.alias) == Seq("vid" -> "vid", "name" -> "n"))
    val Lookup(_, w2, _, _) =
      Gql.parse("""LOOKUP ON part WHERE brand == "Brand#11""""): @unchecked
    assert(w2.contains(Gql.LkWhere(None, "brand", "==", "Brand#11")))
    val Lookup(t3, w3, y3, _) = Gql.parse(
      """LOOKUP ON player WHERE player.age == 40 YIELD player.name"""): @unchecked
    assert(t3 == "player" &&
      w3.contains(Gql.LkWhere(Some("player"), "age", "==", 40L)))
    assert(y3.map(_.kind) == Seq("eprop"))
  }

  test("FETCH PROP ON tag vids") {
    val Fetch(tag, vids, ys, dist) =
      Gql.parse("""FETCH PROP ON part "p:1", "p:2""""): @unchecked
    assert(tag == "part" && vids == Seq("p:1", "p:2"))
    assert(ys.isEmpty && !dist)
    val Fetch(_, _, ys2, dist2) = Gql.parse(
      """FETCH PROP ON player 'Boris Diaw' YIELD DISTINCT player.name, player.age"""): @unchecked
    assert(dist2 && ys2.map(_.prop) == Seq("name", "age"))
  }

  test("FIND SHORTEST/ALL PATH with UPTO") {
    val FindPath(s1, srcs, dsts, k) =
      Gql.parse("""FIND SHORTEST PATH FROM "a" TO "b", "c" UPTO 4 STEPS"""): @unchecked
    assert(s1 && srcs == Seq("a") && dsts == Seq("b", "c") && k == 4)
    val FindPath(s2, _, _, k2) =
      Gql.parse("""FIND ALL PATH FROM "a" TO "b""""): @unchecked
    assert(!s2 && k2 == 5)
  }

  test("GET SUBGRAPH N STEPS") {
    val Subgraph(steps, seeds) =
      Gql.parse("""GET SUBGRAPH 2 STEPS FROM "c:1""""): @unchecked
    assert(steps == 2 && seeds == Seq("c:1"))
  }

  test("errors: unterminated string, unknown sentence, bad operator") {
    intercept[IllegalArgumentException](Gql.parse("""GO FROM "a OVER x"""))
    intercept[IllegalArgumentException](Gql.parse("""DROP TABLE x"""))
    intercept[IllegalArgumentException](
      Gql.parse("""LOOKUP ON t WHERE a ~ 3"""))
  }

  test("GO property-reference yields and WHERE") {
    val Go(_, _, _, _, _, ys, dist, where, _) = Gql.parse(
      """GO FROM "a" OVER serve WHERE serve.start_year > 2000 YIELD DISTINCT serve._dst, serve.start_year AS y, $$.team.name, id($^)"""): @unchecked
    assert(dist)
    assert(where.contains(Gql.GoWhere(Some("serve" -> "start_year"), None, ">", 2000L)))
    assert(ys.map(_.kind) == Seq("edst", "eprop", "dstprop", "idsrc"))
    assert(ys.map(_.alias) == Seq("serve._dst", "y", "$$.team.name", "id($^)"))
  }

  test("pipe-chained GO seeds FROM $-.col") {
    val Piped(_, pipes) = Gql.parse(
      """GO FROM "a" OVER like YIELD like._dst as id | GO FROM $-.id OVER serve YIELD serve._dst"""): @unchecked
    val Seq(PGo(g2)) = pipes: @unchecked
    assert(g2.seedsCol.contains("id") && g2.etype == "serve")
  }

  test("keywords are case-insensitive") {
    val Go(_, _, _, _, _, _, _, _, _) =
      Gql.parse("""go from "a" over like yield vid"""): @unchecked
  }
}
