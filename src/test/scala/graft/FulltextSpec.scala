package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.nql.Fulltext

/** Native fulltext surface (SURVEY §2 FulltextIndexScan): the
  * standard-analyzer re-expression and the Lucene-8 BM25 scoring that
  * the fulltext_index TCK goldens (recorded from a real ES) pin
  * bit-for-bit. */
class FulltextSpec extends AnyFunSuite {

  test("analyzer lowercases word runs and splits on punctuation") {
    assert(Fulltext.analyze("Nebula-Graph  is FAST") ==
      Vector("nebula", "graph", "is", "fast"))
    assert(Fulltext.analyze("abc123 x") == Vector("abc123", "x"))
    assert(Fulltext.analyze("") == Vector.empty)
  }

  test("analyzer tokenizes Han ideographs one per character") {
    assert(Fulltext.analyze("高性能") == Vector("高", "性", "能"))
    assert(Fulltext.analyze("ES查询abc") == Vector("es", "查", "询", "abc"))
  }

  test("SmallFloat int4 norm lengths are exact to 40, floored above") {
    (1 to 40).foreach(dl => assert(Fulltext.normLength(dl) == dl))
    assert(Fulltext.normLength(41) == 40)
    assert(Fulltext.normLength(100) == 96)
  }

  /** The five distinct scores the TCK goldens record from ES
    * (FulltextIndexScan.feature) — float32-exact. */
  test("BM25 reproduces the recorded ES scores bit-for-bit") {
    // tag2.prop1: 8 single-token docs, query "abc" matches doc 0
    val prop1 = Vector("abc", "abcde", "bcd", "zyx", "cba", "abcxyz",
      "xyz", "123456").map(v => Seq(Option(v)))
    assert(Fulltext.search(prop1, "abc") == Vector(0 -> 1.7917595f))
    // tag2.prop2: all 8 docs contain "nebula"; two are single-token
    val prop2 = Vector("nebula graph", "nebula-graph", "nebula database",
      "Nebula", "neBula", "nebula graph", "nebula graph", "nebula graph")
      .map(v => Seq(Option(v)))
    val m2 = Fulltext.search(prop2, "nebula")
    assert(m2.map(_._1) == Vector(3, 4, 0, 1, 2, 5, 6, 7)) // score desc, doc order
    assert(m2.map(_._2).distinct == Vector(0.0693102f, 0.054002427f))
    // edge2.prop1: CJK docs, query "高" matches 3 (ordered by dl)
    val cjk = Vector("一个可靠的分布式", "性能高效的图数据库", "高性能",
      "高吞吐", "低延时", "易扩展", "线性扩缩容", "安全稳定")
      .map(v => Seq(Option(v)))
    val m3 = Fulltext.search(cjk, "高")
    assert(m3 == Vector(2 -> 1.1120702f, 3 -> 1.1120702f, 1 -> 0.6913923f))
  }

  test("multi-field index sums per-field scores; absent fields skip") {
    val docs = Vector(
      Seq(Option("alpha beta"), Option("alpha")),
      Seq(Option("gamma"), None),
      Seq(None, Option("alpha")))
    val m = Fulltext.search(docs, "alpha")
    assert(m.map(_._1) == Vector(0, 2))
    // doc 0 matches in both fields — strictly more than doc 2's one
    assert(m(0)._2 > m(1)._2 && m.forall(_._2 > 0f))
  }
}
