package graft.tck

/** Adjudicated divergences from upstream-@skip TCK goldens.
  *
  * The reference's own CI does not run @skip scenarios, so their golden
  * tables are unverified recordings. The runner normally ATTEMPTS such a
  * scenario and rolls the whole thing back to skip-accounting on any
  * mismatch — sound, but it buries steps whose goldens are *provably*
  * wrong together with steps we simply haven't adjudicated. This
  * registry is the adjudicated list: each entry pins one @skip-scenario
  * step to the result our engine SHOULD produce (worked out by
  * brute-force enumeration over the fixture CSVs, independent of both
  * engines), with the reason the recorded golden cannot be right.
  *
  * A step matching an entry counts as `diverged` in the Report —
  * executed and regression-pinned, but deliberately NOT `passed`, so
  * parity numbers never silently absorb a divergence. Steps of @skip
  * scenarios with no entry keep the conservative rollback behavior.
  *
  * Matching is by whitespace-normalized full query text, so an entry
  * can never leak onto a neighbouring step.
  */
object Divergences {
  /** What our engine is pinned to produce for the step. */
  sealed trait Expect
  /** Exactly these rows (cells as the runner's normalized strings). */
  final case class Table(rows: Seq[Seq[String]]) extends Expect
  /** Any non-empty result (used where the sound answer depends on a
    * sampling choice but emptiness is the adjudicated impossibility). */
  case object NonEmpty extends Expect
  /** Exactly this many rows (used where row MEMBERSHIP is adjudicated
    * but cell rendering is tie-nondeterministic, e.g. which of several
    * equal-length shortest paths represents a pair). */
  final case class RowCount(n: Int) extends Expect
  /** The engine rejects the statement (parse/semantic), matching the
    * reference's own validator behavior for the surface. */
  case object Rejected extends Expect
  /** The engine ACCEPTS and executes a statement whose @skip golden
    * demands an error the reference does not actually raise — the
    * scenario records aspirational validation (reference TODO), and
    * the reference's current behavior (proven by its non-skip CI
    * scenarios) is acceptance. */
  case object Accepted extends Expect

  /** Order-insensitive table equality on the CELL LISTS themselves —
    * not on joined strings, where `["ab","c"]` and `["a","bc"]` would
    * collide and a wrong engine result could be pinned as a confirmed
    * divergence. The sort key joins with U+0000 (never produced by the
    * runner's normalizer) purely to obtain a total order; the equality
    * compares the row vectors element-wise. */
  def tableMatches(got: Seq[Seq[String]], want: Seq[Seq[String]]): Boolean = {
    def key(r: Seq[String]) = r.mkString("\u0000")
    got.map(_.toVector).sortBy(key) == want.map(_.toVector).sortBy(key)
  }

  /** `unskippedOk`: the entry applies even to a NON-@skip scenario.
    * Reserved for steps whose FEATURE TEXT is itself broken upstream
    * (verifiable by reading the .feature file) — a golden no engine
    * could reach because the query it belongs to is malformed in the
    * source. Everything else must stay gated on @skip. */
  final case class Entry(query: String, expect: Expect, why: String,
                         unskippedOk: Boolean = false) {
    val key: String = Divergences.norm(query)
  }

  /** Entry matching `q` that may pin a scenario with skip-state
    * `skipped` (non-@skip scenarios only match unskippedOk entries). */
  def findFor(q: String, skipped: Boolean): Option[Entry] =
    find(q).filter(e => skipped || e.unskippedOk)

  def norm(q: String): String = q.replaceAll("\\s+", " ").trim
    .stripSuffix(";").trim

  // ---- match/VariableLengthPattern.feature ----------------------------
  // Scenario "variable scope test in path pattern" (@skip,
  // vesoft-inc/nebula#5221). All five goldens record ZERO rows from
  // `RETURN count(*)` / `RETURN v` queries. For the count(*) steps that
  // is unproducible by ANY engine — an aggregate with no grouping keys
  // returns exactly one row on empty input — so the recording run can
  // only have errored (the issue is precisely about variable scoping in
  // these patterns). Our pinned values are brute-force counts over the
  // nba CSVs under openCypher semantics (comprehension variable shadows
  // the pattern variable; relationship uniqueness across the MATCH;
  // edge identity = (src,dst,type,rank)), reproduced in
  // SKIPS.md ("VariableLengthPattern adjudication").
  private val vlpScope = Seq(
    Entry(
      """MATCH (v:player{name: 'Tim Duncan'})-[e:like*0..2]-(v2)
        |WHERE size([i in e WHERE (v)-[i]-(v2) | i])>1
        |RETURN count(*) AS cnt""".stripMargin,
      Table(Seq(Seq("0"))),
      "golden records zero rows from ungrouped count(*) — impossible; " +
        "no edge list of a like*0..2 trail holds >1 edge directly " +
        "joining its endpoints (len-1 trails hold exactly 1), so cnt=0"),
    Entry(
      """MATCH (v:player{name: 'Tim Duncan'})-[e:like*0..2]-(v2)-[i]-(v3)
        |WHERE size([i in e WHERE (v)-[i]-(v2) | i])>1
        |RETURN count(*) AS cnt""".stripMargin,
      Table(Seq(Seq("0"))),
      "golden records zero rows from ungrouped count(*) — impossible; " +
        "comprehension `i` shadows the pattern edge, same bound as above"),
    Entry(
      """MATCH (v:player{name: 'Tim Duncan'})-[e:like*0..2]-(v2)-[i]-(v3)
        |WHERE size([i in e WHERE (v)-[i:like]-(v2) | i])>1
        |RETURN count(*) AS cnt""".stripMargin,
      Table(Seq(Seq("0"))),
      "golden records zero rows from ungrouped count(*) — impossible"),
    Entry(
      """MATCH (v:player)-[e*2]->(n)
        |WHERE size([n in e WHERE (v{name:'Tim Duncan'})-[n]-()])>3
        |RETURN v""".stripMargin,
      Rejected,
      "`(v{name:...})` — a property map on an untagged vertex pattern — " +
        "is the exact surface the reference's validator rejects with " +
        "SemanticError `No tag found for property.`; we reject alike. " +
        "The golden (an empty table, i.e. a clean run) contradicts the " +
        "reference's own validation rules"),
    Entry(
      """MATCH (v:player)-[e*2]->()-[n]-()
        |WHERE size([n in e WHERE (v)-[n]-()])>0
        |RETURN count(*) AS cnt""".stripMargin,
      Table(Seq(Seq("4391"))),
      "golden records zero rows from ungrouped count(*) — impossible. " +
        "The comprehension `n` shadows the outer edge and iterates e's " +
        "edges, the first of which is always incident to v, so every " +
        "row qualifies: cnt = |(v:player)-[e*2]->()-[n]-()| = 4391 " +
        "(brute-forced over the CSVs with (src,dst,type,rank) edge " +
        "identity and MATCH-wide relationship uniqueness)"))

  // Scenario "variable pattern in where clause" (@skip, no issue link).
  // Golden counts 182/56/56 are internally impossible for ANY var-length
  // existence semantics; ours are the openCypher-trail values:
  //  * `NOT (v)-[:like*0..1]-(v2)`: a *0..1 predicate has no trail/walk
  //    ambiguity at all — it holds iff v2==v or a direct like edge joins
  //    them. Rows ending at Tim's direct like-neighbours (Tony Parker 10,
  //    Dejounte 9, Manu 6, ... = 48+ of the 64 like*0..2 rows) MUST be
  //    excluded; the golden (56 kept = 8 excluded) keeps most of them.
  //  * `NOT (v)-[:like*1..2]-(v2)` over an e:like*0..2 outer: the outer
  //    path itself is a like-trail of length 1..2 for every non-zero row,
  //    witnessing the predicate — at most the single len-0 row can
  //    survive, so 56 is impossible (true count: 0).
  //  * the first step's golden (76, all-type outer, *0..1 predicate) IS
  //    the openCypher value and passes un-diverged.
  private val vlpWhere = Seq(
    Entry(
      """MATCH (v:player{name: 'Tim Duncan'})-[e*0..2]-(v2)
        |WHERE NOT (v)-[:like*1..2]-(v2)
        |RETURN count(*) AS cnt""".stripMargin,
      Table(Seq(Seq("56"))),
      "rows ending at a direct like-neighbour of Tim (>=46 of 216) must " +
        "be excluded under any *1..2 existence semantics; golden 182 " +
        "excludes only 34. Brute-force openCypher-trail count: 56"),
    Entry(
      """MATCH (v:player{name: 'Tim Duncan'})-[e:like*0..2]-(v2)
        |WHERE NOT (v)-[:like*0..1]-(v2)
        |RETURN count(*) AS cnt""".stripMargin,
      Table(Seq(Seq("11"))),
      "*0..1 existence is unambiguous (v2==v or a direct edge); the " +
        "48+ rows ending at direct like-neighbours must be excluded, " +
        "golden 56 keeps them. Brute-force count: 11"),
    Entry(
      """MATCH (v:player{name: 'Tim Duncan'})-[e:like*0..2]-(v2)
        |WHERE NOT (v)-[:like*1..2]-(v2)
        |RETURN count(*) AS cnt""".stripMargin,
      Table(Seq(Seq("0"))),
      "the outer like*0..2 path is itself a like*1..2 witness for every " +
        "non-zero-length row, so only the single len-0 row could pass " +
        "NOT — and Tim sits on a like 2-cycle, excluding it too. " +
        "Golden 56 is impossible; true count: 0"))

  // ---- go/GoYieldVertexEdge.feature -----------------------------------
  // Scenarios "go step limit" / "go step sample" (@skip, no issue link).
  // The well-formed steps' goldens record EMPTY tables, but per the
  // reference's documented step-cap semantics (GO ... LIMIT/SAMPLE
  // [n1,..,nSteps] caps each step's expansion per source) a cap of >=1
  // on a vertex with out-edges yields >=1 row — `GO FROM "Tim Duncan"
  // OVER like LIMIT [1]` cannot be empty (Tim has 2 out-likes). The
  // same scenarios' malformed-cap steps (wrong arity, non-int,
  // non-constant) expect SemanticError and pass normally. Which rows
  // survive a cap/sample is storage-order/random, so the pin is
  // NonEmpty, not a table.
  private val goCaps = Seq(
    "GO FROM \"Tim Duncan\" OVER like LIMIT [1];",
    "GO 3 STEPS FROM \"Tim Duncan\" OVER like LIMIT [1, 2, 2];",
    "GO FROM \"Tim Duncan\" OVER like YIELD like._dst  SAMPLE [1];",
    "GO 3 STEPS FROM \"Tim Duncan\" OVER like YIELD like._dst SAMPLE [1, 3, 2];"
  ).map(q => Entry(q, NonEmpty,
    "golden records an EMPTY table for a >=1-capped GO from a vertex " +
      "with out-edges — contradicts the reference's own documented " +
      "LIMIT/SAMPLE step-cap semantics; the recording run predates the " +
      "feature (scenario is upstream-@skip)"))

  // ---- match/PipeAndVariable.feature ----------------------------------
  // Three @skip scenarios pipe a `LOOKUP ... WHERE player.name CONTAINS`
  // into GO. The reference's OWN index validator rejects CONTAINS on an
  // index scan ("Expression contains with not supported yet" —
  // LookupTag2.feature records exactly that SemanticError as a PASSING
  // golden), so the recorded result tables here are unreachable by the
  // reference itself; the scenarios are @skip because they cannot run.
  // Our engine rejects with the same validator message.
  private val pipeLookup = Seq(
    """LOOKUP ON player
      |WHERE player.name CONTAINS 'Tim'
      |YIELD player.age AS age, id(vertex) AS vid |
      |GO FROM $-.vid
      |OVER like REVERSELY
      |YIELD
      |  $-.age AS age,
      |  ('Tony Parker' == like._dst) AS liked,
      |  like._src AS src,
      |  like._dst AS dst""".stripMargin,
    """$var = LOOKUP ON player
      |WHERE player.name CONTAINS 'Tim'
      |YIELD player.age AS age, id(vertex) AS vid;
      |GO FROM $var.vid
      |OVER like REVERSELY
      |YIELD
      |  $var.age AS age,
      |  ('Tony Parker' == like._dst) AS liked,
      |  like._src AS src,
      |  like._dst AS dst""".stripMargin,
    """LOOKUP ON player
      |WHERE player.name CONTAINS 'Tim'
      |YIELD player.age as age, id(vertex) as vid |
      |GO FROM $-.vid OVER like REVERSELY YIELD $-.age AS age, like._dst AS dst |
      |YIELD
      |  any(d IN COLLECT(DISTINCT $-.dst) WHERE d=='Tony Parker') AS d,
      |  $-.age as age""".stripMargin
  ).map(q => Entry(q, Rejected,
    "LOOKUP ... CONTAINS cannot drive an index scan in the reference — " +
      "its validator raises `Expression contains with not supported " +
      "yet` (a PASSING golden in LookupTag2.feature) — so this @skip " +
      "golden's result table is unreachable by the reference itself; " +
      "we reject with the same validator error"))

  // ---- match/With.feature ----------------------------------------------
  // @skip "with match return": the golden claims Tony Parker's age is
  // 23, but player.csv records 36 — and the PASSING scenario directly
  // above it renders ("Tony Parker" :player{age: 36, ...}). The golden
  // contradicts the fixture.
  private val withMatch = Seq(Entry(
    """WITH "Tony Parker" AS a
      |MATCH (v:player{name: a})
      |RETURN v.player.age AS age""".stripMargin,
    Table(Seq(Seq("36"))),
    "golden age 23 contradicts the fixture (player.csv: Tony Parker,36) " +
      "and the passing scenario immediately above, which renders " +
      "age: 36 for the same vertex"))

  // ---- optimizer/PushFilterDownExpandAllRule.feature --------------------
  // Two @skip scenarios GO over Boris Diaw's serve edges. Boris has 5
  // serve edges (Hawks/Suns/Hornets/Spurs/Jazz) and age 36:
  //  * WHERE age>18 OR team=="Lakers": true for every edge → 5 rows of
  //    "Boris Diaw"; the golden records 1.
  //  * WHERE team=="Lakers": Boris never served the Lakers → 0 rows;
  //    the golden records 1 row "Boris Diaw".
  private val pushFilter = Seq(
    Entry(
      """GO 1 STEPS FROM "Boris Diaw" OVER serve
        |WHERE $^.player.age > 18 OR $$.team.name == "Lakers"
        |YIELD $^.player.name AS name""".stripMargin,
      Table(Seq.fill(5)(Seq("Boris Diaw"))),
      "GO yields one row per edge; the disjunction holds for all 5 of " +
        "Boris Diaw's serve edges (age 36 > 18), so 5 rows — the " +
        "golden's single row undercounts its own fixture"),
    Entry(
      """GO 1 STEPS FROM "Boris Diaw" OVER serve
        |WHERE $$.team.name == "Lakers"
        |YIELD $^.player.name AS name""".stripMargin,
      Table(Seq.empty),
      "serve.csv has no Boris Diaw -> Lakers edge, so the filter " +
        "eliminates every row; the golden's 1-row table contradicts " +
        "the fixture"))

  // ---- yield/yield.feature + .IntVid twin -------------------------------
  // @skip scenario "Mistake" ("# TODO fix it"): demands SemanticErrors
  // the reference does not raise — its own PASSING scenario AggCall
  // (yield.feature:553) accepts `YIELD COUNT(*), 1+1` → (1, 2), i.e.
  // aggregates without input are currently legal. The goldens record
  // aspirational validation; actual reference behavior is acceptance.
  private val yieldMistake = Seq(
    Entry("YIELD count(*)", Accepted,
      "the golden demands `Don't support aggregate function without " +
        "input.` but the reference's own passing AggCall scenario " +
        "accepts YIELD COUNT(*), 1+1 — the error is a reference TODO, " +
        "not current behavior"),
    Entry("YIELD (v)-[:like]-()", Accepted,
      "same @skip TODO scenario: the demanded `Not support pattern " +
        "expression.` error is aspirational; the reference currently " +
        "accepts the statement (which is why its CI skips the scenario)"))

  // ---- openCypher path/Path3.feature ------------------------------------
  // @skip "# unimplement" scenarios [2]/[3]: demand SyntaxError for
  // length() on a node/relationship. The reference marks them
  // unimplemented — it currently accepts both — so the golden is an
  // aspirational validator, not behavior.
  private val path3Len = Seq(
    Entry("MATCH (n)\nRETURN length(n)", Accepted,
      "@skip '# unimplement': the reference does not yet raise " +
        "InvalidArgumentType for length(node); acceptance is its " +
        "current behavior"),
    Entry("MATCH ()-[r]->()\nRETURN length(r)", Accepted,
      "@skip '# unimplement': same as length(node) — the demanded " +
        "SyntaxError is unimplemented in the reference"))

  // ---- fetch/FetchVertices.intVid + FetchEdges.intVid --------------------
  // @skip "works with uuid()" scenarios record the LEGACY uuid(string)
  // vid form. The current reference grammar takes no argument
  // (parser.yy `uuid_expression : KW_UUID L_PAREN R_PAREN`), so
  // `uuid('Boris Diaw')` is a syntax error in the reference today —
  // the goldens describe a deleted surface. We reject at parse alike.
  private val uuidFetch = Seq(
    "FETCH PROP ON player uuid('Boris Diaw') YIELD player.name, player.age",
    "FETCH PROP ON player uuid('Boris Diaw')",
    "FETCH PROP ON serve uuid('Boris Diaw')->uuid('Hawks') YIELD serve.start_year, serve.end_year",
    "FETCH PROP ON serve uuid(\"Zion Williamson\")->uuid(\"Spurs\") YIELD serve.start_year"
  ).map(q => Entry(q, Rejected,
    "legacy uuid(string) vid form: the current reference grammar " +
      "accepts only uuid() with no argument (parser.yy:1156), so this " +
      "@skip golden records a surface the reference itself now " +
      "syntax-rejects; we reject at parse alike"))

  // ---- match/SingleShorestPath.feature -----------------------------------
  // @skip scenario literally titled "run fail in CI environment": one
  // shortestPath per (a,b) pair, tie choice storage-defined (hence the
  // CI flake upstream). Pair MEMBERSHIP is deterministic: 319 pairs.
  // The golden's 316 rows omit exactly the three self-cycle pairs
  // (Spurs,Spurs), (Tim Duncan,Tim Duncan), (Tony Parker,Tony Parker) —
  // yet the reference's own PASSING scenario in the same file counts a
  // self-cycle pair (count(p)==14 includes Tim→Tony→Tim), so the
  // omission contradicts the reference's verified semantics.
  private val singleShortest = Seq(Entry(
    """MATCH p = shortestPath( (a)-[e*..5]-(b) )
      |  WHERE id(a) == 'Tim Duncan' OR id(b) in ['Spurs', 'Tony Parker', 'Yao Ming']
      |  RETURN p""".stripMargin,
    RowCount(319),
    "tie-nondeterministic path rendering (scenario titled 'run fail in " +
      "CI environment'); pair membership pinned at 319 = the golden's " +
      "316 + the 3 self-cycle pairs the reference's own passing " +
      "count(p)==14 scenario proves must be included"))

  // ---- expression/TimeComputation.feature ------------------------------
  // Scenario Outline "datetime add or subtract duration" (first of the
  // two with that name), second query. The FEATURE TEXT itself is
  // broken upstream: TimeComputation.feature:70 literally reads
  // `WITH  as x,  as d` — the WITH items' expressions are missing from
  // the file (an editing casualty; the sibling scenarios read
  // `WITH datetime(...) as x, duration(<map>) as d`). The query is a
  // syntax error in ANY engine, so the recorded golden is unreachable;
  // the scenario is NOT @skip upstream, hence unskippedOk with the
  // file-verifiable justification.
  private val timeComputationBroken = Seq(Entry(
    "WITH as x, as d RETURN datetime('1984-10-11T12:31:14') + " +
      "duration({years: 12, months: 5, days: 14, hours: 16, " +
      "minutes: 12, seconds: 70}) AS sum, " +
      "datetime('1984-10-11T12:31:14') - " +
      "duration({years: 12, months: 5, days: 14, hours: 16, " +
      "minutes: 12, seconds: 70}) AS diff",
    Rejected,
    "upstream feature text is malformed (TimeComputation.feature:70 " +
      "`WITH  as x,  as d` — the WITH expressions are missing from the " +
      "file), so the query cannot parse in any engine and the golden " +
      "is unreachable; we reject at parse",
    unskippedOk = true))

  val entries: Seq[Entry] = vlpScope ++ vlpWhere ++ goCaps ++
    pipeLookup ++ withMatch ++ pushFilter ++ yieldMistake ++ path3Len ++
    uuidFetch ++ singleShortest ++ timeComputationBroken

  private val byKey: Map[String, Entry] =
    entries.map(e => e.key -> e).toMap
  require(byKey.size == entries.size, "duplicate divergence keys")

  def find(q: String): Option[Entry] = byKey.get(norm(q))
}
