package graft
import graft.graph.MapCatalog
import graft.sources.CsvFixtures
import graft.tck.TckRunner
import graft.nql.Gql

object MatchTry {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").appName("mtry")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val nba = "/root/reference/tests/data/nba"
    val strCat = MapCatalog(
      tags = Map(
        "player" -> CsvFixtures.load(spark, s"$nba/player.csv")
          .unionByName(CsvFixtures.load(spark, s"$nba/null.csv"), allowMissingColumns = true),
        "team" -> CsvFixtures.load(spark, s"$nba/team.csv"),
        "bachelor" -> CsvFixtures.load(spark, s"$nba/bachelor.csv")),
      edges = Map(
        "like" -> CsvFixtures.load(spark, s"$nba/like.csv"),
        "serve" -> CsvFixtures.load(spark, s"$nba/serve.csv"),
        "teammate" -> CsvFixtures.load(spark, s"$nba/teammate.csv")))
    def intCat = MapCatalog(
      tags = strCat.tags.map { case (t, df) => t -> CsvFixtures.hashVids(df) },
      edges = strCat.edges.map { case (e, df) => e -> CsvFixtures.hashVids(df) })
    val stu = "/root/reference/tests/data/student"
    def stuCat = MapCatalog(
      tags = Map(
        "person" -> CsvFixtures.load(spark, s"$stu/person.csv"),
        "teacher" -> CsvFixtures.load(spark, s"$stu/teacher.csv"),
        "student" -> CsvFixtures.load(spark, s"$stu/student.csv")),
      edges = Map(
        "is_teacher" -> CsvFixtures.load(spark, s"$stu/is_teacher.csv"),
        "is_schoolmate" -> CsvFixtures.load(spark, s"$stu/is_schoolmate.csv"),
        "is_friend" -> CsvFixtures.load(spark, s"$stu/is_friend.csv"),
        "is_colleagues" -> CsvFixtures.load(spark, s"$stu/is_colleagues.csv")))
    var cat: MapCatalog = strCat
    var space = "nba"
    args.headOption match {
      case Some(f) if f.endsWith(".feature") =>
        val text = java.nio.file.Files.readString(java.nio.file.Paths.get(f))
        val spaceRe = "Given a graph with space named \"([^\"]+)\"".r
        space = spaceRe.findFirstMatchIn(text).map(_.group(1)).getOrElse("nba")
        if (space.contains("int_vid")) cat = intCat
        if (space == "student") cat = stuCat
        if (args.length > 1 && args(1) == "skips") {
          TckRunner.parseFeature(text, space).foreach { c =>
            try { graft.nql.Gql.parseScript(c.query); () }
            catch { case e: Exception =>
              println(s"SKIP[${e.getMessage.take(60)}]: ${c.query.take(110)}")
            }
          }
        } else if (args.length > 1 && args(1) == "execskips") {
          TckRunner.parseFeature(text, space).foreach { c =>
            val parsed = try { Gql.parseScript(c.query); true }
              catch { case _: Exception => false }
            if (parsed)
              try { Gql.runScript(cat, c.query).limit(1).collect(); () }
              catch { case e: Exception =>
                println(s"ESKIP[${Option(e.getMessage).getOrElse("?").take(70)}]: ${c.query.take(110)}")
              }
          }
        } else {
          val r = TckRunner.run(cat, text, space)
          println(s"RESULT executed=${r.executed} passed=${r.passed} skipped=${r.skipped} errored=${r.errored}")
          r.failures.take(8).foreach { case (q, why) => println(s"FAIL: $q\n  -> $why") }
          r.errors.take(8).foreach { case (q, why) => println(s"ERR: $q\n  -> $why") }
        }
      case Some(qf) if qf.endsWith(".q") =>
        val q = java.nio.file.Files.readString(java.nio.file.Paths.get(qf))
        Gql.parseScript(q).foreach { case (v, s) => println(s"AST[$v]: $s") }
        Gql.runScript(cat, q).show(40, false)
      case Some(q) =>
        Gql.runScript(cat, q).show(20, false)
      case None => ()
    }
    spark.stop()
  }
}
