package graft

import graft.algo.PathFinder

/** Endpoint path semantics on:
  *   a -> b -> d
  *   a -> c -> d        (two shortest 2-hop routes a~>d)
  *   a -> e -> f -> d   (longer 3-hop route)
  */
class PathFinderSpec extends SparkSpec {
  import spark.implicits._

  private def edges = Seq(
    ("a", "b"), ("b", "d"), ("a", "c"), ("c", "d"),
    ("a", "e"), ("e", "f"), ("f", "d")
  ).toDF("src", "dst")

  test("shortestPaths: returns ALL tied shortest paths, not longer ones") {
    val r = PathFinder.shortestPaths(Seq("a").toDF("vid"), Seq("d").toDF("vid"),
        edges, 5)
      .select("path", "hops").as[(String, Int)].collect().toSet
    assert(r == Set(("a->b->d", 2), ("a->c->d", 2)))
  }

  test("shortestPaths: singlePath picks one deterministic representative") {
    val r = PathFinder.shortestPaths(Seq("a").toDF("vid"), Seq("d").toDF("vid"),
        edges, 5, singlePath = true)
      .select("path").as[String].collect()
    assert(r.sameElements(Array("a->b->d"))) // lexicographically first
  }

  test("shortestPaths: unreachable target yields no row") {
    val r = PathFinder.shortestPaths(Seq("d").toDF("vid"), Seq("a").toDF("vid"),
      edges, 5)
    assert(r.count() == 0)
  }

  test("allPaths: every simple path up to the cap") {
    val r = PathFinder.allPaths(Seq("a").toDF("vid"), Seq("d").toDF("vid"),
        edges, 4)
      .select("path").as[String].collect().toSet
    assert(r == Set("a->b->d", "a->c->d", "a->e->f->d"))
  }

  test("allPaths: maxSteps cuts long routes") {
    val r = PathFinder.allPaths(Seq("a").toDF("vid"), Seq("d").toDF("vid"),
        edges, 2)
      .select("path").as[String].collect().toSet
    assert(r == Set("a->b->d", "a->c->d"))
  }
}
