package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.graph.MapCatalog
import graft.nql.Gql

/** LDBC-SNB-shaped workload over a property graph derived
  * deterministically from the driver's TPC-H-ish tables, so every
  * query has a DuckDB oracle on the same parquet inputs.
  *
  * The reference ships the LDBC interactive/BI query texts as TCK
  * features (tests/tck/ldbc/interactive_workload feature files) but NO
  * fixture data (tests/data/ldbc_v0_3_3/config.yaml lists no files),
  * so those features are unwirable as goldens. Instead the same query
  * SHAPES run here through the MATCH text surface against an
  * LDBC-shaped catalog:
  *
  *   Person        := customer            (per:<custkey>)
  *   Place         := nation              (plc:<nationkey>)
  *   Organisation  := supplier            (org:<suppkey>)
  *   Message       := orders              (msg:<orderkey>)
  *   Comment       := lineitem            (cmt:<orderkey>_<linenumber>)
  *   Tag           := part                (tag:<partkey>)
  *   KNOWS         := customers of adjacent orders (orderkey, orderkey+1)
  *   IS_LOCATED_IN := customer/supplier nation FKs
  *   WORK_AT       := per:<k> → org:<k % |supplier|>
  *   HAS_CREATOR   := msg → per:<o_custkey>; cmt → per:<l_suppkey>
  *   REPLY_OF      := cmt → msg:<l_orderkey>
  *   HAS_TAG       := msg:<l_orderkey> → tag:<l_partkey>
  *
  * Every derivation is pure column arithmetic over the source tables
  * (mirrored 1:1 by the `ldbcCte` DuckDB prelude) — at scale the
  * catalog is just projections; the queries themselves drive the
  * seek→expand→filter MATCH pipeline, so seeds prune to vid lookups
  * and the var-length KNOWS expansions are the same frontier joins
  * the GO surface uses. */
object LdbcQueries {
  type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, name: String) =
    Tables.load(s, dir, name)

  /** LDBC-shaped MapCatalog derived from the sfDir tables. */
  def catalog(s: SparkSession, dir: String): MapCatalog = {
    val cust = t(s, dir, "customer")
    val supp = t(s, dir, "supplier")
    val nation = t(s, dir, "nation")
    val orders = t(s, dir, "orders")
    val li = t(s, dir, "lineitem")
    val part = t(s, dir, "part")
    // |supplier| enters the workAt derivation as a broadcast 1-row
    // aggregate instead of the historical driver-side count(): the
    // count was an eager Spark job paid by EVERY catalog construction
    // (17 LDBC queries × one job) whether or not the query touched
    // WORK_AT — as a lazy subtree it costs nothing until used
    val suppCnt = supp.agg(count(lit(1)).as("__nsupp"))
    // NOTE a catalog-level persist of the derived edge frames (knows/
    // hasCreator/hasTag/comment) was tried and REVERTED with
    // measurement (round 13, A-B-B-A min-of-3 at sf0.1): it forces
    // materialization of the full frame on first touch, which defeats
    // the id-seek queries' filter pushdown into the parquet scan —
    // is5 2.12x, varseed 1.81x, is3 1.66x worse; only the var-length
    // KNOWS queries won (ic1/ic13 ~0.82x, their loops already persist
    // the oriented view via Traverse.persistEdges), family total
    // 1.14x WORSE. Single-hop seeks keep the lazy projections.

    val person = cust.select(
      concat(lit("per:"), col("c_custkey")).as("vid"),
      col("c_custkey").as("id"),
      concat(lit("First"), pmod(col("c_custkey"), lit(20))).as("firstName"),
      concat(lit("Last"), pmod(col("c_custkey"), lit(50))).as("lastName"),
      when(pmod(col("c_custkey"), lit(2)) === 0, "male").otherwise("female")
        .as("gender"),
      col("c_mktsegment").as("browserUsed"))
    val place = nation.select(
      concat(lit("plc:"), col("n_nationkey")).as("vid"),
      col("n_name").as("name"))
    val organisation = supp.select(
      concat(lit("org:"), col("s_suppkey")).as("vid"),
      col("s_name").as("name"))
    val message = orders.select(
      concat(lit("msg:"), col("o_orderkey")).as("vid"),
      col("o_orderkey").as("id"),
      unix_millis(col("o_orderdate").cast("timestamp")).as("creationDate"),
      col("o_orderpriority").as("content"))
    // (l_orderkey, l_linenumber) is NOT unique in the driver tables —
    // one comment per key, min() picks for the non-key props
    val comment = li.groupBy(col("l_orderkey"), col("l_linenumber"))
      .agg(min(col("l_suppkey")).as("cmtCreator"),
        min(unix_millis(col("l_shipdate").cast("timestamp")))
          .as("creationDate"))
      .select(
        concat(lit("cmt:"), col("l_orderkey"), lit("_"), col("l_linenumber"))
          .as("vid"),
        (col("l_orderkey") * 10 + col("l_linenumber")).as("id"),
        col("creationDate"), col("cmtCreator"), col("l_orderkey"),
        col("l_linenumber"))
    val tagV = part.select(
      concat(lit("tag:"), col("p_partkey")).as("vid"),
      col("p_name").as("name"))

    val r0 = lit(0L).as("rank")
    // KNOWS: customers of ADJACENT orders know each other — one
    // deterministic directed edge per pair, earliest adjacency date
    val o2 = orders.select((col("o_orderkey") - 1).as("k2"),
      col("o_custkey").as("cust2"))
    val knows = orders.join(o2, col("o_orderkey") === col("k2"))
      .filter(col("o_custkey") =!= col("cust2"))
      .groupBy(concat(lit("per:"), col("o_custkey")).as("src"),
        concat(lit("per:"), col("cust2")).as("dst"))
      .agg(min(unix_millis(col("o_orderdate").cast("timestamp"))).as("creationDate"))
      .select(col("src"), col("dst"), r0, col("creationDate"))
    val located = cust.select(
      concat(lit("per:"), col("c_custkey")).as("src"),
      concat(lit("plc:"), col("c_nationkey")).as("dst"), r0)
      .unionByName(supp.select(
        concat(lit("org:"), col("s_suppkey")).as("src"),
        concat(lit("plc:"), col("s_nationkey")).as("dst"), r0))
    val workAt = cust.crossJoin(broadcast(suppCnt)).select(
      concat(lit("per:"), col("c_custkey")).as("src"),
      concat(lit("org:"), pmod(col("c_custkey"), col("__nsupp"))).as("dst"), r0,
      (lit(2000) + pmod(col("c_custkey"), lit(20))).cast("long")
        .as("workFrom"))
    val hasCreator = orders.select(
      concat(lit("msg:"), col("o_orderkey")).as("src"),
      concat(lit("per:"), col("o_custkey")).as("dst"), r0)
      .unionByName(comment.select(col("vid").as("src"),
        concat(lit("per:"), col("cmtCreator")).as("dst"), r0))
    val replyOf = comment.select(col("vid").as("src"),
      concat(lit("msg:"), col("l_orderkey")).as("dst"), r0)
    val hasTag = li.select(
      concat(lit("msg:"), col("l_orderkey")).as("src"),
      concat(lit("tag:"), col("l_partkey")).as("dst"), r0).distinct()

    MapCatalog(
      tags = Map("Person" -> person, "Place" -> place,
        "Organisation" -> organisation, "Message" -> message,
        "Comment" -> comment.select(col("vid"), col("id"),
          col("creationDate")), "Tag" -> tagV),
      edges = Map("KNOWS" -> knows, "IS_LOCATED_IN" -> located,
        "WORK_AT" -> workAt, "HAS_CREATOR" -> hasCreator,
        "REPLY_OF" -> replyOf, "HAS_TAG" -> hasTag))
  }

  private def q(text: String): Q =
    (s, dir) => Gql.runScript(catalog(s, dir), text)

  val queries: Map[String, Q] = Map(
    // IS1: person profile + city (ShortReads.feature scenario 1 shape)
    "q_ldbc_is1" -> q(
      """MATCH (n:Person)-[:IS_LOCATED_IN]->(p:Place)
        |WHERE id(n) == "per:42"
        |RETURN n.Person.firstName AS firstName, n.Person.lastName AS lastName,
        |       n.Person.gender AS gender, p.Place.name AS cityName""".stripMargin),
    // IS2: a person's recent messages
    "q_ldbc_is2" -> q(
      """MATCH (n:Person)<-[:HAS_CREATOR]-(m:Message)
        |WHERE id(n) == "per:7"
        |RETURN m.Message.id AS messageId, m.Message.content AS content,
        |       m.Message.creationDate AS creationDate
        |ORDER BY creationDate DESC, messageId ASC LIMIT 10""".stripMargin),
    // IS3: friends of a person with the KNOWS date
    "q_ldbc_is3" -> q(
      """MATCH (n:Person)-[k:KNOWS]-(f:Person)
        |WHERE id(n) == "per:42"
        |RETURN f.Person.id AS personId, f.Person.firstName AS firstName,
        |       f.Person.lastName AS lastName, k.creationDate AS since
        |ORDER BY since DESC, personId ASC""".stripMargin),
    // IS5: creator of a message
    "q_ldbc_is5" -> q(
      """MATCH (m:Message)-[:HAS_CREATOR]->(p:Person)
        |WHERE id(m) == "msg:7"
        |RETURN p.Person.id AS personId, p.Person.firstName AS firstName,
        |       p.Person.lastName AS lastName""".stripMargin),
    // IS7: replies to a message and their authors
    "q_ldbc_is7" -> q(
      """MATCH (m:Message)<-[:REPLY_OF]-(c:Comment)-[:HAS_CREATOR]->(p:Person)
        |WHERE id(m) == "msg:3"
        |RETURN c.Comment.id AS commentId,
        |       c.Comment.creationDate AS commentDate,
        |       p.Person.id AS replyAuthorId,
        |       p.Person.firstName AS replyAuthorFirstName
        |ORDER BY commentDate DESC, replyAuthorId ASC""".stripMargin),
    // IC1: friends up to 3 hops with a given first name, by distance
    // (min over var-length trails == BFS distance: any shortest walk
    // is a simple path, and simple paths are trails)
    "q_ldbc_ic1" -> q(
      """MATCH pth = (n:Person)-[:KNOWS*1..3]-(f:Person)
        |WHERE id(n) == "per:42" AND f.Person.firstName == "First7" AND id(f) != id(n)
        |RETURN f.Person.id AS friendId, f.Person.lastName AS friendLastName,
        |       min(length(pth)) AS distanceFromPerson
        |ORDER BY distanceFromPerson ASC, friendLastName ASC, friendId ASC
        |LIMIT 20""".stripMargin),
    // IC2: recent messages (before a date) by direct friends
    "q_ldbc_ic2" -> q(
      """MATCH (n:Person)-[:KNOWS]-(f:Person)<-[:HAS_CREATOR]-(m:Message)
        |WHERE id(n) == "per:42" AND m.Message.creationDate <= 896659200000
        |RETURN f.Person.id AS personId, f.Person.firstName AS personFirstName,
        |       m.Message.id AS messageId,
        |       m.Message.creationDate AS messageCreationDate
        |ORDER BY messageCreationDate DESC, messageId ASC LIMIT 20""".stripMargin),
    // IC4: topics of friends' messages (tag counts)
    "q_ldbc_ic4" -> q(
      """MATCH (n:Person)-[:KNOWS]-(f:Person)<-[:HAS_CREATOR]-(m:Message)-[:HAS_TAG]->(tg:Tag)
        |WHERE id(n) == "per:42"
        |RETURN tg.Tag.name AS tagName, count(*) AS postCount
        |ORDER BY postCount DESC, tagName ASC LIMIT 10""".stripMargin),
    // IC9: recent messages by friends-of-friends before a date
    "q_ldbc_ic9" -> q(
      """MATCH (n:Person)-[:KNOWS*1..2]-(f:Person)<-[:HAS_CREATOR]-(m:Message)
        |WHERE id(n) == "per:42" AND id(f) != id(n)
        |  AND m.Message.creationDate <= 896659200000
        |WITH DISTINCT f, m
        |RETURN f.Person.id AS personId, m.Message.id AS messageId,
        |       m.Message.creationDate AS messageCreationDate
        |ORDER BY messageCreationDate DESC, messageId ASC LIMIT 20""".stripMargin),
    // IC11: job referral — friends (≤2 hops) working at organisations
    // in a given country, earliest workFrom first
    "q_ldbc_ic11" -> q(
      """MATCH (n:Person)-[:KNOWS*1..2]-(f:Person)-[w:WORK_AT]->(o:Organisation)-[:IS_LOCATED_IN]->(p:Place)
        |WHERE id(n) == "per:42" AND id(f) != id(n) AND p.Place.name == "NATION_3"
        |  AND w.workFrom < 2010
        |WITH DISTINCT f, w, o
        |RETURN f.Person.id AS personId, o.Organisation.name AS organizationName,
        |       w.workFrom AS organizationWorkFromYear
        |ORDER BY organizationWorkFromYear ASC, personId ASC, organizationName DESC
        |LIMIT 10""".stripMargin),
    // IC3 shape: friends ≤2 hops located in a given country, ranked by
    // their message output. The second MATCH re-uses the bound `f` —
    // the bound-var re-seek path (seeds from clause 1's binding, not an
    // O(V) all-vertex scan).
    "q_ldbc_ic3" -> q(
      """MATCH (n:Person)-[:KNOWS*1..2]-(f:Person)-[:IS_LOCATED_IN]->(pl:Place)
        |WHERE id(n) == "per:42" AND id(f) != id(n) AND pl.Place.name == "NATION_2"
        |WITH DISTINCT f
        |MATCH (f)<-[:HAS_CREATOR]-(m:Message)
        |RETURN f.Person.id AS personId, count(*) AS msgCount
        |ORDER BY msgCount DESC, personId ASC LIMIT 20""".stripMargin),
    // IC6 shape: tags co-occurring with a given tag on friends' messages
    "q_ldbc_ic6" -> q(
      """MATCH (n:Person)-[:KNOWS*1..2]-(f:Person)<-[:HAS_CREATOR]-(m:Message)-[:HAS_TAG]->(t1:Tag)
        |WHERE id(n) == "per:42" AND id(f) != id(n) AND id(t1) == "tag:5"
        |WITH DISTINCT m
        |MATCH (m)-[:HAS_TAG]->(t2:Tag)
        |WHERE id(t2) != "tag:5"
        |RETURN t2.Tag.name AS tagName, count(*) AS postCount
        |ORDER BY postCount DESC, tagName ASC LIMIT 10""".stripMargin),
    // IC8 shape: recent replies to any of a person's messages
    "q_ldbc_ic8" -> q(
      """MATCH (n:Person)<-[:HAS_CREATOR]-(m:Message)<-[:REPLY_OF]-(c:Comment)-[:HAS_CREATOR]->(p:Person)
        |WHERE id(n) == "per:42"
        |RETURN p.Person.id AS replyAuthorId, c.Comment.id AS commentId,
        |       c.Comment.creationDate AS commentDate
        |ORDER BY commentDate DESC, commentId ASC LIMIT 20""".stripMargin),
    // IC13 shape: shortest KNOWS path length between two persons —
    // the shortestPath() MATCH surface inside a workload query
    "q_ldbc_ic13" -> q(
      """MATCH pth = shortestPath((a:Person)-[:KNOWS*..15]-(b:Person))
        |WHERE id(a) == "per:42" AND id(b) == "per:87"
        |RETURN length(pth) AS shortestPathLength""".stripMargin),
    // IC-style two-phase read: a first MATCH collects the friend ids,
    // a WITH pipes them as a plain column, and the second MATCH is
    // seeded FROM that variable (`id(p) == fid`) — the reference's
    // VariableVertexIdSeek (PlannersRegister.cpp:94-118). Exercises
    // the variable-seed pushdown: the Person scan of clause 2 must
    // prune to the piped id set before the HAS_CREATOR expansion.
    "q_ldbc_varseed" -> q(
      """MATCH (n:Person)-[:KNOWS]-(f:Person)
        |WHERE id(n) == "per:42"
        |WITH DISTINCT id(f) AS fid
        |MATCH (p:Person)<-[:HAS_CREATOR]-(m:Message)
        |WHERE id(p) == fid
        |RETURN p.Person.id AS personId, m.Message.id AS messageId,
        |       m.Message.creationDate AS creationDate
        |ORDER BY creationDate DESC, messageId ASC LIMIT 20""".stripMargin),
    // BI4 shape: popular topics among messages created in a country
    "q_ldbc_bi4" -> q(
      """MATCH (tg:Tag)<-[:HAS_TAG]-(m:Message)-[:HAS_CREATOR]->(p:Person)-[:IS_LOCATED_IN]->(c:Place)
        |WHERE c.Place.name == "NATION_3"
        |RETURN tg.Tag.name AS topic, count(*) AS cnt
        |ORDER BY cnt DESC, topic ASC LIMIT 10""".stripMargin))

  /** DuckDB prelude mirroring the catalog derivation 1:1. */
  private val ldbcCte: String =
    """WITH PERSON AS (
      |  SELECT c_custkey AS id, 'First' || (c_custkey % 20) AS firstName,
      |         'Last' || (c_custkey % 50) AS lastName,
      |         CASE WHEN c_custkey % 2 = 0 THEN 'male' ELSE 'female' END AS gender,
      |         c_nationkey AS placeId
      |  FROM customer
      |), KNOWS0 AS (
      |  SELECT a.o_custkey AS src, b.o_custkey AS dst,
      |         min(epoch_ms(a.o_orderdate)) AS since
      |  FROM orders a JOIN orders b ON b.o_orderkey = a.o_orderkey + 1
      |  WHERE a.o_custkey <> b.o_custkey
      |  GROUP BY 1, 2
      |), K AS (
      |  SELECT src, dst, since FROM KNOWS0
      |  UNION ALL SELECT dst, src, since FROM KNOWS0
      |), MSG AS (
      |  SELECT o_orderkey AS id, o_custkey AS creator,
      |         epoch_ms(o_orderdate) AS creationDate,
      |         o_orderpriority AS content
      |  FROM orders
      |), CMT AS (
      |  SELECT l_orderkey * 10 + l_linenumber AS id,
      |         min(l_suppkey) AS creator,
      |         min(epoch_ms(l_shipdate)) AS creationDate,
      |         l_orderkey AS replyOf
      |  FROM lineitem GROUP BY l_orderkey, l_linenumber
      |), MSGTAG AS (
      |  SELECT DISTINCT l_orderkey AS msg, l_partkey AS tag FROM lineitem
      |), WORKAT AS (
      |  SELECT c_custkey AS per,
      |         c_custkey % (SELECT count(*) FROM supplier) AS org,
      |         2000 + c_custkey % 20 AS workFrom
      |  FROM customer
      |)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q_ldbc_is1" -> (ldbcCte +
      """
        |SELECT firstName, lastName, gender, n_name AS cityName
        |FROM PERSON JOIN nation ON n_nationkey = placeId
        |WHERE id = 42""".stripMargin),
    "q_ldbc_is2" -> (ldbcCte +
      """
        |SELECT id AS messageId, content, creationDate
        |FROM MSG WHERE creator = 7
        |ORDER BY creationDate DESC, messageId ASC LIMIT 10""".stripMargin),
    "q_ldbc_is3" -> (ldbcCte +
      """
        |SELECT p.id AS personId, p.firstName AS firstName,
        |       p.lastName AS lastName, k.since AS since
        |FROM K k JOIN PERSON p ON p.id = k.dst
        |WHERE k.src = 42
        |ORDER BY since DESC, personId ASC""".stripMargin),
    "q_ldbc_is5" -> (ldbcCte +
      """
        |SELECT p.id AS personId, p.firstName AS firstName,
        |       p.lastName AS lastName
        |FROM MSG m JOIN PERSON p ON p.id = m.creator
        |WHERE m.id = 7""".stripMargin),
    "q_ldbc_is7" -> (ldbcCte +
      """
        |SELECT c.id AS commentId, c.creationDate AS commentDate,
        |       p.id AS replyAuthorId, p.firstName AS replyAuthorFirstName
        |FROM CMT c JOIN PERSON p ON p.id = c.creator
        |WHERE c.replyOf = 3
        |ORDER BY commentDate DESC, replyAuthorId ASC""".stripMargin),
    // BFS to depth 3 (min over trails = min over walks = BFS level)
    "q_ldbc_ic1" -> (ldbcCte + """,
        |L1 AS (SELECT dst, 1 AS d FROM K WHERE src = 42),
        |L2 AS (SELECT k.dst, 2 AS d FROM L1 JOIN K k ON k.src = L1.dst),
        |L3 AS (SELECT k.dst, 3 AS d FROM (SELECT DISTINCT dst FROM L2) x
        |       JOIN K k ON k.src = x.dst),
        |D AS (
        |  SELECT dst, min(d) AS dist FROM (
        |    SELECT * FROM L1 UNION ALL SELECT * FROM L2
        |    UNION ALL SELECT * FROM L3) GROUP BY dst
        |)
        |SELECT p.id AS friendId, p.lastName AS friendLastName,
        |       CAST(D.dist AS BIGINT) AS distanceFromPerson
        |FROM D JOIN PERSON p ON p.id = D.dst
        |WHERE p.firstName = 'First7' AND p.id <> 42
        |ORDER BY distanceFromPerson ASC, friendLastName ASC, friendId ASC
        |LIMIT 20""".stripMargin),
    "q_ldbc_ic2" -> (ldbcCte + """
        |SELECT p.id AS personId, p.firstName AS personFirstName,
        |       m.id AS messageId, m.creationDate AS messageCreationDate
        |FROM K k JOIN PERSON p ON p.id = k.dst
        |JOIN MSG m ON m.creator = p.id
        |WHERE k.src = 42 AND m.creationDate <= 896659200000
        |ORDER BY messageCreationDate DESC, messageId ASC LIMIT 20""".stripMargin),
    "q_ldbc_ic4" -> (ldbcCte + """
        |SELECT p_name AS tagName, count(*) AS postCount
        |FROM K k JOIN MSG m ON m.creator = k.dst
        |JOIN MSGTAG mt ON mt.msg = m.id
        |JOIN part ON p_partkey = mt.tag
        |WHERE k.src = 42
        |GROUP BY p_name
        |ORDER BY postCount DESC, tagName ASC LIMIT 10""".stripMargin),
    "q_ldbc_ic9" -> (ldbcCte + """,
        |FOF AS (
        |  SELECT DISTINCT dst FROM (
        |    SELECT dst FROM K WHERE src = 42
        |    UNION ALL
        |    SELECT k2.dst FROM K k1 JOIN K k2 ON k2.src = k1.dst
        |    WHERE k1.src = 42)
        |  WHERE dst <> 42
        |)
        |SELECT f.dst AS personId, m.id AS messageId,
        |       m.creationDate AS messageCreationDate
        |FROM FOF f JOIN MSG m ON m.creator = f.dst
        |WHERE m.creationDate <= 896659200000
        |ORDER BY messageCreationDate DESC, messageId ASC LIMIT 20""".stripMargin),
    "q_ldbc_ic11" -> (ldbcCte + """,
        |FOF AS (
        |  SELECT DISTINCT dst FROM (
        |    SELECT dst FROM K WHERE src = 42
        |    UNION ALL
        |    SELECT k2.dst FROM K k1 JOIN K k2 ON k2.src = k1.dst
        |    WHERE k1.src = 42)
        |  WHERE dst <> 42
        |)
        |SELECT f.dst AS personId, s_name AS organizationName,
        |       w.workFrom AS organizationWorkFromYear
        |FROM FOF f JOIN WORKAT w ON w.per = f.dst
        |JOIN supplier ON s_suppkey = w.org
        |JOIN nation ON n_nationkey = s_nationkey
        |WHERE n_name = 'NATION_3' AND w.workFrom < 2010
        |ORDER BY organizationWorkFromYear ASC, personId ASC,
        |         organizationName DESC
        |LIMIT 10""".stripMargin),
    "q_ldbc_ic3" -> (ldbcCte + """,
        |FOF AS (
        |  SELECT DISTINCT dst FROM (
        |    SELECT dst FROM K WHERE src = 42
        |    UNION ALL
        |    SELECT k2.dst FROM K k1 JOIN K k2 ON k2.src = k1.dst
        |    WHERE k1.src = 42)
        |  WHERE dst <> 42
        |)
        |SELECT f.dst AS personId, count(*) AS msgCount
        |FROM FOF f
        |JOIN PERSON p ON p.id = f.dst
        |JOIN nation ON n_nationkey = p.placeId
        |JOIN MSG m ON m.creator = f.dst
        |WHERE n_name = 'NATION_2'
        |GROUP BY f.dst
        |ORDER BY msgCount DESC, personId ASC LIMIT 20""".stripMargin),
    "q_ldbc_ic6" -> (ldbcCte + """,
        |FOF AS (
        |  SELECT DISTINCT dst FROM (
        |    SELECT dst FROM K WHERE src = 42
        |    UNION ALL
        |    SELECT k2.dst FROM K k1 JOIN K k2 ON k2.src = k1.dst
        |    WHERE k1.src = 42)
        |  WHERE dst <> 42
        |),
        |M5 AS (
        |  SELECT DISTINCT m.id FROM FOF f
        |  JOIN MSG m ON m.creator = f.dst
        |  JOIN MSGTAG mt ON mt.msg = m.id
        |  WHERE mt.tag = 5
        |)
        |SELECT p_name AS tagName, count(*) AS postCount
        |FROM M5 JOIN MSGTAG mt ON mt.msg = M5.id
        |JOIN part ON p_partkey = mt.tag
        |WHERE mt.tag <> 5
        |GROUP BY p_name
        |ORDER BY postCount DESC, tagName ASC LIMIT 10""".stripMargin),
    "q_ldbc_ic8" -> (ldbcCte + """
        |SELECT c.creator AS replyAuthorId, c.id AS commentId,
        |       c.creationDate AS commentDate
        |FROM MSG m JOIN CMT c ON c.replyOf = m.id
        |WHERE m.creator = 42
        |ORDER BY commentDate DESC, commentId ASC LIMIT 20""".stripMargin),
    "q_ldbc_ic13" -> (ldbcCte + """,
        |B AS (
        |  WITH RECURSIVE R(v, d) AS (
        |    SELECT 42, 0
        |    UNION
        |    SELECT k.dst, R.d + 1 FROM R JOIN K k ON k.src = R.v
        |    WHERE R.d < 15
        |  ) SELECT v, d FROM R
        |)
        |SELECT CAST(min(d) AS BIGINT) AS shortestPathLength
        |FROM B WHERE v = 87
        |HAVING count(*) > 0""".stripMargin),
    "q_ldbc_varseed" -> (ldbcCte + """
        |SELECT p.id AS personId, m.id AS messageId,
        |       m.creationDate AS creationDate
        |FROM (SELECT DISTINCT dst FROM K WHERE src = 42) f
        |JOIN PERSON p ON p.id = f.dst
        |JOIN MSG m ON m.creator = p.id
        |ORDER BY creationDate DESC, messageId ASC LIMIT 20""".stripMargin),
    "q_ldbc_bi4" -> (ldbcCte + """
        |SELECT p_name AS topic, count(*) AS cnt
        |FROM MSGTAG mt
        |JOIN MSG m ON m.id = mt.msg
        |JOIN PERSON p ON p.id = m.creator
        |JOIN nation ON n_nationkey = p.placeId
        |JOIN part ON p_partkey = mt.tag
        |WHERE n_name = 'NATION_3'
        |GROUP BY p_name
        |ORDER BY cnt DESC, topic ASC LIMIT 10""".stripMargin))
}
