package graft

import org.apache.spark.sql.functions._
import graft.operators.{Apply, Relational => R}

class RelationalSpec extends SparkSpec {
  import spark.implicits._

  test("aggregate: empty global input produces the defaults row (count 0, sum0 0)") {
    val empty = Seq.empty[(String, Double)].toDF("k", "v")
    val r = R.aggregate(empty, Seq.empty,
      Seq(count(lit(1)).as("c"), R.sum0d(col("v")).as("s"), avg(col("v")).as("a")))
      .as[(Long, Double, Option[Double])].head()
    assert(r == ((0L, 0.0, None)))
  }

  test("topN: sort + offset + limit fused") {
    val df = (1 to 20).toDF("x")
    val r = R.topN(df, 3, 2, col("x").desc).as[Int].collect()
    assert(r.sameElements(Array(18, 17, 16)))
  }

  test("samplePerKey: at most k per key, deterministic") {
    val df = (1 to 100).map(i => (i % 5, i)).toDF("k", "v")
    val s1 = R.samplePerKey(df, col("k"), 3, col("v")).collect().toSet
    val s2 = R.samplePerKey(df, col("k"), 3, col("v")).collect().toSet
    assert(s1 == s2)
    assert(R.samplePerKey(df, col("k"), 3, col("v"))
      .groupBy("k").count().select(max("count")).as[Long].head() <= 3L)
  }

  test("set ops enforce the same-column rule (SetExecutor)") {
    val a = Seq(1).toDF("x"); val b = Seq(1).toDF("y")
    intercept[IllegalArgumentException](R.union(a, b))
  }

  test("unionDistinct / intersect / minus distinct semantics") {
    val a = Seq(1, 1, 2, 3).toDF("x")
    val b = Seq(2, 2, 4).toDF("x")
    assert(R.unionDistinct(a, b).as[Int].collect().sorted.sameElements(Array(1, 2, 3, 4)))
    assert(R.intersect(a, b).as[Int].collect().sameElements(Array(2)))
    assert(R.minus(a, b).as[Int].collect().sorted.sameElements(Array(1, 3)))
  }

  test("unwind: null list yields zero rows, scalar wrap yields one") {
    val df = Seq((1, Seq("a", "b")), (2, null)).toDF("id", "xs")
    val r = R.unwind(df, col("xs"), "x").select("id", "x").as[(Int, String)].collect()
    assert(r.toSet == Set((1, "a"), (1, "b")))
    val s = R.unwind(Seq(3).toDF("id"), R.wrapScalar(col("id")), "x")
      .select("x").as[Int].collect()
    assert(s.sameElements(Array(3)))
  }

  test("rollUpApply: unmatched rows get empty list, not null") {
    val left = Seq(1, 2).toDF("k")
    val right = Seq((1, "p"), (1, "q")).toDF("k", "v")
    val r = Apply.rollUpApplySorted(left, right, Seq("k"), col("v"), "vs")
      .select("k", "vs").as[(Int, Seq[String])].collect().toMap
    assert(r(1) == Seq("p", "q") && r(2) == Seq.empty)
  }

  test("patternApply: semi keeps matches, anti keeps the rest") {
    val left = Seq(1, 2, 3).toDF("k")
    val right = Seq(2, 2).toDF("k")
    assert(Apply.patternApply(left, right, Seq("k")).as[Int].collect()
      .sameElements(Array(2)))
    assert(Apply.patternApply(left, right, Seq("k"), anti = true)
      .as[Int].collect().sorted.sameElements(Array(1, 3)))
  }

  test("saltedJoin: identical results to a plain inner join on a hot key") {
    import graft.operators.Skew
    // one hot key (0) with 500 rows, plus a cold tail
    val left = ((1 to 500).map(i => (0, i)) ++ (1 to 50).map(i => (i, i)))
      .toDF("k", "v")
    val right = (0 to 50).map(i => (i, s"r$i")).toDF("k", "name")
    val plain = left.join(right, Seq("k")).collect().toSet
    val salted = Skew.saltedJoin(left, right, "k", salt = 8).collect().toSet
    assert(salted == plain && salted.size == 550)
  }

  test("saltedSum: equals plain sum per key") {
    import graft.operators.Skew
    val df = ((1 to 300).map(i => (0, i.toDouble)) ++
      (1 to 30).map(i => (i, i.toDouble))).toDF("k", "v")
    val plain = df.groupBy("k").agg(sum(col("v")).as("sum"))
      .as[(Int, Double)].collect().toMap
    val salted = Skew.saltedSum(df, "k", "v", salt = 4)
      .as[(Int, Double)].collect().toMap
    assert(salted.keySet == plain.keySet)
    assert(plain.forall { case (k, s) => math.abs(salted(k) - s) < 1e-9 })
  }

  test("value: literal single-row source") {
    val r = R.value(spark, "a" -> lit(1), "b" -> lit("x"))
    assert(r.collect().map(_.toSeq).toSeq == Seq(Seq(1, "x")))
  }
}
