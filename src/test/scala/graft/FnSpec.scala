package graft

import org.apache.spark.sql.functions._
import graft.functions.Fn

/** Expression-layer mappings with nGQL semantics (SURVEY §2.8):
  * 0-based subscripts, substr, predicates, reduce, portable round. */
class FnSpec extends SparkSpec {
  import spark.implicits._

  private def one = spark.range(1)

  test("substr_ is 0-based like nGQL, not 1-based like SQL") {
    val r = one.select(Fn.substr_(lit("abcdef"), 1, 3)).as[String].head()
    assert(r == "bcd")
  }

  test("subscript and subscriptRange are 0-based, end-exclusive") {
    val xs = array(lit("a"), lit("b"), lit("c"), lit("d"))
    assert(one.select(Fn.subscript(xs, 1)).as[String].head() == "b")
    assert(one.select(Fn.subscriptRange(xs, 1, 3)).as[Seq[String]].head()
      == Seq("b", "c"))
  }

  test("head/last/tail collection functions") {
    val xs = array(lit(1), lit(2), lit(3))
    assert(one.select(Fn.head_(xs)).as[Int].head() == 1)
    assert(one.select(Fn.last_(xs)).as[Int].head() == 3)
    assert(one.select(Fn.tail_(xs)).as[Seq[Int]].head() == Seq(2, 3))
  }

  test("predicate functions: all/any/none/single") {
    val xs = array(lit(2), lit(4), lit(5))
    assert(one.select(Fn.allPred(xs, _ > 1)).as[Boolean].head())
    assert(one.select(Fn.anyPred(xs, _ > 4)).as[Boolean].head())
    assert(one.select(Fn.nonePred(xs, _ > 9)).as[Boolean].head())
    assert(one.select(Fn.singlePred(xs, _ % 2 === 1)).as[Boolean].head())
  }

  test("list comprehension + reduce") {
    val xs = array(lit(1), lit(2), lit(3), lit(4))
    assert(one.select(Fn.listComprehension(xs, _ % 2 === 0, _ * 10))
      .as[Seq[Int]].head() == Seq(20, 40))
    assert(one.select(Fn.reduce_(xs, lit(0), (a, x) => a + x)).as[Int].head() == 10)
  }

  test("caseWhen: ordered branches with otherwise") {
    val c = Fn.caseWhen(Seq((lit(false), lit("a")), (lit(true), lit("b"))), lit("z"))
    assert(one.select(c).as[String].head() == "b")
  }

  test("cosSimilarity matches hand computation") {
    val r = one.select(Fn.cosSimilarity(
      array(lit(1.0f), lit(2.0f)), array(lit(2.0f), lit(4.0f)))).as[Double].head()
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("strcasecmp three-way compare") {
    assert(one.select(Fn.strcasecmp(lit("ABC"), lit("abc"))).as[Int].head() == 0)
    assert(one.select(Fn.strcasecmp(lit("abd"), lit("ABC"))).as[Int].head() == 1)
  }

  test("roundPortable: IEEE-stable half-up") {
    val r = one.select(
      Fn.roundPortable(lit(2.345), 2),
      Fn.roundPortable(lit(0.078125), 6)).as[(Double, Double)].head()
    assert(r._1 == 2.35 || r._1 == 2.34) // depends on binary repr, but stable
    assert(one.select(Fn.roundPortable(lit(2.345), 2)).as[Double].head() == r._1)
  }

  test("range/toSet/coalesce") {
    assert(one.select(Fn.range_(lit(1), lit(5), lit(2))).as[Seq[Long]].head()
      == Seq(1L, 3L, 5L))
    assert(one.select(Fn.toSet(array(lit(1), lit(1), lit(2)))).as[Seq[Int]].head()
      .sorted == Seq(1, 2))
  }

  test("hash() on NON-CONSTANT columns matches reference semantics " +
       "per type: identity on ints, 0/1 on bools, murmur on strings/floats") {
    import graft.functions.NebulaHash
    // identity on an integral COLUMN (round-4 divergence: the UDF
    // stringified then murmured)
    val ints = Seq(0L, 1L, -7L, 123456789012L).toDF("x")
    assert(ints.select(NebulaHash.hashCol(col("x"))).as[Long].collect().toSeq
      == Seq(0L, 1L, -7L, 123456789012L))
    val int32 = Seq(42, -1).toDF("x")
    assert(int32.select(NebulaHash.hashCol(col("x"))).as[Long].collect().toSeq
      == Seq(42L, -1L))
    assert(Seq(true, false).toDF("x")
      .select(NebulaHash.hashCol(col("x"))).as[Long].collect().toSeq
      == Seq(1L, 0L))
    // strings/floats agree with the driver-side constant fold
    val ss = Seq("Tim Duncan", "", "nebula").toDF("x")
    assert(ss.select(NebulaHash.hashCol(col("x"))).as[Long].collect().toSeq
      == Seq("Tim Duncan", "", "nebula").map(NebulaHash.hash64))
    val ds = Seq(1.5, -2.25).toDF("x")
    assert(ds.select(NebulaHash.hashCol(col("x"))).as[Long].collect().toSeq
      == Seq(1.5, -2.25).map(NebulaHash.hash64))
    // Fn.hash_ is the same function (the round-4 xxhash64 shim is gone)
    assert(ints.select(Fn.hash_(col("x"))).as[Long].collect().toSeq
      == Seq(0L, 1L, -7L, 123456789012L))
  }
}
