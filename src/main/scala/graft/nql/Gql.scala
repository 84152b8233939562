package graft.nql

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.graph.GraphCatalog
import graft.algo.PathFinder
import graft.traverse.Traverse
import graft.traverse.Traverse.{Both, Direction, In, Out}

/** nGQL sentence front door (SURVEY.md §3 entry points 2/3 + FETCH /
  * FIND PATH / GET SUBGRAPH; reference grammar src/parser/parser.yy:
  * GO :1424, LOOKUP :2201, FETCH :2312, FIND PATH :2317, GET SUBGRAPH
  * :2426). A hand-rolled recursive-descent parser over a small token
  * stream — no parser-generator dependency — compiling straight onto
  * the Traverse/PathFinder/GraphModel operators, so every sentence
  * inherits their scale posture (materialized frontiers, pushdown,
  * broadcast seeds).
  *
  * Supported subset:
  *   GO [m [TO n] STEPS] FROM <vid,...> OVER <etype|*>
  *      [REVERSELY|BIDIRECT] [YIELD col [AS a], ...]
  *   LOOKUP ON <tag> [WHERE <prop> <op> <lit>] [YIELD col, ...]
  *   FETCH PROP ON <tag> <vid,...>
  *   FIND {SHORTEST|ALL} PATH FROM <vid,...> TO <vid,...> [UPTO n STEPS]
  *   GET SUBGRAPH [n STEPS] FROM <vid,...>
  */
object Gql {

  // ---------- tokenizer ----------
  sealed trait Tok
  case class Word(s: String) extends Tok       // keyword / identifier
  case class Str(s: String) extends Tok        // "quoted"
  case class Num(v: Double, raw: String) extends Tok
  case class Sym(s: String) extends Tok        // punctuation / operators

  def tokenize(q: String): List[Tok] = {
    val out = scala.collection.mutable.ListBuffer.empty[Tok]
    var i = 0
    while (i < q.length) {
      val c = q(i)
      if (c.isWhitespace) i += 1
      else if (c == '"' || c == '\'') {
        val end = q.indexOf(c, i + 1)
        require(end > 0, s"unterminated string at $i")
        out += Str(q.substring(i + 1, end)); i = end + 1
      } else if (c.isDigit) {
        val j = q.indexWhere(ch => !(ch.isDigit || ch == '.'), i)
        val end = if (j < 0) q.length else j
        val raw = q.substring(i, end)
        out += Num(raw.toDouble, raw); i = end
      } else if (c.isLetter || c == '_') {
        val j = q.indexWhere(ch => !(ch.isLetterOrDigit || ch == '_'), i)
        val end = if (j < 0) q.length else j
        out += Word(q.substring(i, end)); i = end
      } else if ("<>=!".contains(c) && i + 1 < q.length && q(i + 1) == '=') {
        out += Sym(q.substring(i, i + 2)); i += 2
      } else { out += Sym(c.toString); i += 1 }
    }
    out.toList
  }

  // ---------- AST ----------
  sealed trait Stmt
  /** Pipe stages applied to the head sentence's output (`|`). */
  sealed trait Pipe
  /** YIELD [DISTINCT] items; any aggregate item triggers the
    * reference's IMPLICIT GROUPING: every non-aggregate item becomes a
    * group key (AggregateExecutor.cpp:12-99). */
  case class PYield(items: Seq[YieldItem], distinct: Boolean) extends Pipe
  case class POrderBy(col: String, desc: Boolean) extends Pipe
  case class PLimit(n: Int) extends Pipe
  case class YieldItem(agg: Option[String], col: String, alias: String)
  case class Piped(head: Stmt, pipes: Seq[Pipe]) extends Stmt
  /** One GO yield item. kind ∈ col | eprop | edst | esrc | dstprop |
    * srcprop | iddst | idsrc (the $$/$^/id()/edge-prop reference forms,
    * Expression.h:66-76). */
  case class YExpr(kind: String, etype: String, tag: String, prop: String,
                   alias: String)
  /** GO WHERE: single comparison; lhs either an edge prop or a literal
    * (constant conditions like `1 > 0` fold driver-side). */
  case class GoWhere(eprop: Option[(String, String)], lhs: Option[Any],
                     op: String, rhs: Any)
  case class Go(m: Int, n: Int, seeds: Seq[String], etype: String,
                dir: Direction, yields: Seq[YExpr], distinct: Boolean,
                where: Option[GoWhere],
                seedsCol: Option[String] = None) extends Stmt
  /** A chained GO consuming the previous stage ($-.col seeds). */
  case class PGo(go: Go) extends Pipe
  /** LOOKUP WHERE: optionally tag-qualified prop comparison. */
  case class LkWhere(tag: Option[String], prop: String, op: String, lit: Any)
  case class Lookup(tag: String, where: Option[LkWhere],
                    yields: Seq[YExpr], distinct: Boolean) extends Stmt
  case class Fetch(tag: String, vids: Seq[String], yields: Seq[YExpr],
                   distinct: Boolean) extends Stmt
  case class FindPath(shortest: Boolean, srcs: Seq[String], dsts: Seq[String],
                      upto: Int) extends Stmt
  case class Subgraph(steps: Int, seeds: Seq[String]) extends Stmt

  // ---------- parser ----------
  private class P(var ts: List[Tok]) {
    def peek: Option[Tok] = ts.headOption
    def next(): Tok = { val h = ts.head; ts = ts.tail; h }
    def kw(s: String): Boolean = ts.headOption match {
      case Some(Word(w)) if w.equalsIgnoreCase(s) => ts = ts.tail; true
      case _ => false
    }
    def expectKw(s: String): Unit =
      require(kw(s), s"expected $s at ${ts.take(3)}")
    def word(): String = next() match {
      case Word(w) => w
      case t => throw new IllegalArgumentException(s"expected word, got $t")
    }
    def stringList(): Seq[String] = {
      val out = scala.collection.mutable.ListBuffer.empty[String]
      var go = true
      while (go) {
        next() match {
          case Str(s) => out += s
          case t => throw new IllegalArgumentException(s"expected vid, got $t")
        }
        if (peek.contains(Sym(","))) next() else go = false
      }
      out.toSeq
    }
    def intLit(): Int = next() match {
      case Num(v, _) => v.toInt
      case t => throw new IllegalArgumentException(s"expected int, got $t")
    }
  }

  private val aggNames = Set("count", "sum", "avg", "min", "max",
    "std", "collect", "collect_set")

  def parse(q: String): Stmt = {
    val p = new P(tokenize(q))
    val head = parseSentence(p)
    val pipes = scala.collection.mutable.ListBuffer.empty[Pipe]
    while (p.peek.contains(Sym("|"))) {
      p.next()
      if (p.peek.exists { case Word(w) => w.equalsIgnoreCase("GO"); case _ => false }) {
        parseSentence(p) match {
          case g2: Go =>
            require(g2.seedsCol.isDefined, "piped GO must seed FROM $-.col")
            pipes += PGo(g2)
          case other =>
            throw new IllegalArgumentException(s"bad piped sentence $other")
        }
      } else if (p.kw("YIELD")) {
        val distinct = p.kw("DISTINCT")
        val items = scala.collection.mutable.ListBuffer.empty[YieldItem]
        def pipeCol(): String = {
          // optional $-. prefix: the pipe input's column namespace
          if (p.peek.contains(Sym("$"))) {
            p.next()
            require(p.next() == Sym("-"), "expected $-")
            require(p.next() == Sym("."), "expected . after $-")
          }
          p.word()
        }
        var go = true
        while (go) {
          val w = pipeCol()
          val item = if (p.peek.contains(Sym("(")) && aggNames(w.toLowerCase)) {
            p.next() // (
            val c = p.peek match {
              case Some(Sym("*")) => p.next(); "*"
              case Some(Sym("$")) =>
                p.next()
                require(p.next() == Sym("-"), "expected $-")
                require(p.next() == Sym("."), "expected . after $-")
                p.word()
              case _ => p.word()
            }
            require(p.next() == Sym(")"), "expected )")
            val a = if (p.kw("AS")) p.word() else s"${w.toLowerCase}($c)"
            YieldItem(Some(w.toLowerCase), c, a)
          } else {
            val a = if (p.kw("AS")) p.word() else w
            YieldItem(None, w, a)
          }
          items += item
          if (p.peek.contains(Sym(","))) p.next() else go = false
        }
        pipes += PYield(items.toSeq, distinct)
      } else if (p.kw("ORDER")) {
        p.expectKw("BY")
        if (p.peek.contains(Sym("$"))) {
          p.next()
          require(p.next() == Sym("-"), "expected $-")
          require(p.next() == Sym("."), "expected . after $-")
        }
        val c = p.word()
        val desc = if (p.kw("DESC")) true else { p.kw("ASC"); false }
        pipes += POrderBy(c, desc)
      } else if (p.kw("LIMIT")) {
        pipes += PLimit(p.intLit())
      } else throw new IllegalArgumentException(s"bad pipe at ${p.ts.take(3)}")
    }
    require(p.ts.isEmpty, s"trailing tokens: ${p.ts.take(3)}")
    if (pipes.isEmpty) head else Piped(head, pipes.toSeq)
  }


  /** Parse one GO yield operand: plain col, edge.prop / edge._dst /
    * edge._src, $$.tag.prop, $^.tag.prop, id($$) / id($^). */
  private def goYieldExpr(p: P): YExpr = {
    p.peek match {
      case Some(Sym("$")) =>
        p.next()
        val dstSide = p.next() match {
          case Sym("$") => true
          case Sym("^") => false
          case t => throw new IllegalArgumentException(s"bad ref $t")
        }
        require(p.next() == Sym("."), "expected . after $$/$^")
        val tag = p.word()
        require(p.next() == Sym("."), "expected . after tag")
        val prop = p.word()
        val raw = (if (dstSide) "$$." else "$^.") + tag + "." + prop
        YExpr(if (dstSide) "dstprop" else "srcprop", "", tag, prop, raw)
      case Some(Word("id")) if p.ts.drop(1).headOption.contains(Sym("(")) =>
        p.next(); p.next()
        p.peek match {
          case Some(Word(w)) if w.equalsIgnoreCase("vertex") =>
            // id(vertex) — LOOKUP/FETCH vid ref
            p.next()
            require(p.next() == Sym(")"), "expected )")
            YExpr("col", "", "", "vid", "id(vertex)")
          case _ =>
            require(p.next() == Sym("$"), "expected $ in id()")
            val dstSide = p.next() match {
              case Sym("$") => true
              case Sym("^") => false
              case t => throw new IllegalArgumentException(s"bad id ref $t")
            }
            require(p.next() == Sym(")"), "expected )")
            YExpr(if (dstSide) "iddst" else "idsrc", "", "", "",
              if (dstSide) "id($$)" else "id($^)")
        }
      case Some(Word(fn)) if Set("src", "dst", "rank")(fn.toLowerCase) &&
          p.ts.drop(1).headOption.contains(Sym("(")) =>
        // src(edge)/dst(edge)/rank(edge) — edge LOOKUP refs
        val f = fn.toLowerCase
        p.next(); p.next()
        val inner = p.word()
        require(inner.equalsIgnoreCase("edge"), s"expected edge in $f()")
        require(p.next() == Sym(")"), "expected )")
        YExpr("col", "", "", f, s"$f(edge)")
      case _ =>
        val w = p.word()
        if (p.peek.contains(Sym("."))) {
          p.next()
          val prop = p.word()
          val raw = w + "." + prop
          prop match {
            case "_dst" => YExpr("edst", w, "", "", raw)
            case "_src" => YExpr("esrc", w, "", "", raw)
            case pr => YExpr("eprop", w, "", pr, raw)
          }
        } else YExpr("col", "", "", w, w)
    }
  }

  private def goYields(p: P): Seq[YExpr] = {
    val out = scala.collection.mutable.ListBuffer.empty[YExpr]
    var go = true
    while (go) {
      val e = goYieldExpr(p)
      out += (if (p.kw("AS")) e.copy(alias = p.word()) else e)
      if (p.peek.contains(Sym(","))) { p.next() } else go = false
    }
    out.toSeq
  }

  private def goWhere(p: P): GoWhere = {
    def operand(): Either[(String, String), Any] = p.next() match {
      case Num(v, raw) => Right(if (raw.contains('.')) v else v.toLong)
      case Str(sv) => Right(sv)
      case Word(w) =>
        require(p.next() == Sym("."), "expected . in where prop")
        Left(w -> p.word())
      case t => throw new IllegalArgumentException(s"bad where operand $t")
    }
    val l = operand()
    val op = p.next() match {
      case Sym(sy) if Set(">", "<", ">=", "<=", "==", "=", "!=")(sy) => sy
      case t => throw new IllegalArgumentException(s"bad operator $t")
    }
    val r = operand()
    (l, r) match {
      case (Left(ep), Right(lit)) => GoWhere(Some(ep), None, op, lit)
      case (Right(a), Right(b)) => GoWhere(None, Some(a), op, b)
      case _ => throw new IllegalArgumentException("unsupported WHERE shape")
    }
  }

  private def parseSentence(p: P): Stmt = {
    if (p.kw("GO")) {
      val (m, n) = p.peek match {
        case Some(Num(v, _)) =>
          p.next()
          val hi = if (p.kw("TO")) p.intLit() else v.toInt
          p.expectKw("STEPS"); (v.toInt, hi)
        case _ => (1, 1)
      }
      p.expectKw("FROM")
      val (seeds, seedsCol) = p.peek match {
        case Some(Sym("$")) =>
          p.next()
          require(p.next() == Sym("-"), "expected $- seed ref")
          require(p.next() == Sym("."), "expected . after $-")
          (Seq.empty[String], Some(p.word()))
        case _ => (p.stringList(), None)
      }
      p.expectKw("OVER")
      val etype = p.next() match {
        case Word(w) => w
        case Sym("*") => "*"
        case t => throw new IllegalArgumentException(s"bad edge type $t")
      }
      val dir = if (p.kw("REVERSELY")) In
        else if (p.kw("BIDIRECT")) Both else Out
      val where = if (p.kw("WHERE")) Some(goWhere(p)) else None
      val (ys, dist) = if (p.kw("YIELD")) {
        val d = p.kw("DISTINCT")
        (goYields(p), d)
      } else (Seq(YExpr("col", "", "", "origin", "origin"),
        YExpr("col", "", "", "vid", "vid"),
        YExpr("col", "", "", "step", "step")), false)
      Go(m, n, seeds, etype, dir, ys, dist, where, seedsCol)
    } else if (p.kw("LOOKUP")) {
      p.expectKw("ON")
      val tag = p.word()
      val where = if (p.kw("WHERE")) {
        val w0 = p.word()
        val (qual, prop) =
          if (p.peek.contains(Sym("."))) { p.next(); (Some(w0), p.word()) }
          else (None, w0)
        val op = p.next() match {
          case Sym(s) if Set(">", "<", ">=", "<=", "==", "=", "!=")(s) => s
          case t => throw new IllegalArgumentException(s"bad operator $t")
        }
        val lit: Any = p.next() match {
          case Num(v, raw) => if (raw.contains('.')) v else v.toLong
          case Str(s) => s
          case Word(b) if b.equalsIgnoreCase("true") => true
          case Word(b) if b.equalsIgnoreCase("false") => false
          case t => throw new IllegalArgumentException(s"bad literal $t")
        }
        Some(LkWhere(qual, prop, op, lit))
      } else None
      val (ys, dist) = if (p.kw("YIELD")) {
        val d = p.kw("DISTINCT")
        (goYields(p), d)
      } else (Seq.empty[YExpr], false)
      Lookup(tag, where, ys, dist)
    } else if (p.kw("FETCH")) {
      p.expectKw("PROP"); p.expectKw("ON")
      val tag = p.word()
      val vids = p.stringList()
      val (ys, dist) = if (p.kw("YIELD")) {
        val d = p.kw("DISTINCT")
        (goYields(p), d)
      } else (Seq.empty[YExpr], false)
      Fetch(tag, vids, ys, dist)
    } else if (p.kw("FIND")) {
      val shortest = p.kw("SHORTEST")
      if (!shortest) p.expectKw("ALL")
      p.expectKw("PATH"); p.expectKw("FROM")
      val srcs = p.stringList()
      p.expectKw("TO")
      val dsts = p.stringList()
      // OVER * accepted and ignored (we traverse the full edge view)
      if (p.kw("OVER")) p.next()
      val upto = if (p.kw("UPTO")) { val k = p.intLit(); p.expectKw("STEPS"); k }
        else 5
      FindPath(shortest, srcs, dsts, upto)
    } else if (p.kw("GET")) {
      p.expectKw("SUBGRAPH")
      val steps = p.peek match {
        case Some(Num(v, _)) => p.next(); p.expectKw("STEPS"); v.toInt
        case _ => 1
      }
      p.expectKw("FROM")
      Subgraph(steps, p.stringList())
    } else throw new IllegalArgumentException(
      s"unknown sentence at ${p.ts.take(4)}")
  }

  // ---------- executor: AST → DataFrame plan ----------
  def run(g: GraphCatalog, query: String): DataFrame = exec(g, parse(query))

  def exec(g: GraphCatalog, stmt: Stmt): DataFrame = {
    val spark = g.allVertices.sparkSession
    import spark.implicits._
    def seedsDf(vids: Seq[String]) = vids.toDF("vid")
    stmt match {
      case Piped(head, pipes) =>
        pipes.foldLeft(exec(g, head))((df, pp) => applyPipe(g, df, pp))
      case go: Go =>
        require(go.seedsCol.isEmpty, "top-level GO needs literal seeds")
        // the reference treats the FROM vid list as a set (dup seeds
        // yield once — GO.feature golden); piped GO keeps multiplicity
        execGo(g, go, seedsDf(go.seeds.distinct))
      case Lookup(tag, where, ys, dist) =>
        // LOOKUP targets a tag OR an edge type (LookupEdge TCK)
        val tbl =
          try g.vertexTable(tag)
          catch { case _: IllegalArgumentException => g.edgesByType(tag) }
        val filtered = where match {
          case Some(LkWhere(qual, prop, op, lit)) =>
            require(qual.forall(_ == tag), s"WHERE ref ${qual.get} != ON $tag")
            tbl.filter(cmp(col(prop), op, lit))
          case None => tbl
        }
        val out =
          if (ys.isEmpty) filtered
          else filtered.select(ys.map {
            case YExpr("col", _, _, c, a) => col(c).as(a)
            case YExpr("eprop", t, _, prop, a) =>
              require(t == tag, s"YIELD ref $t != ON $tag")
              col(prop).as(a)
            case y => throw new IllegalArgumentException(s"bad lookup yield $y")
          }: _*)
        if (dist) out.distinct() else out
      case Fetch(tag, vids, ys, dist) =>
        // vid list keeps multiplicity (dup vids yield dup rows unless
        // DISTINCT — FetchVertices TCK); bag semantics via join
        val bag = vids.zipWithIndex.toDF("vid", "__i")
        val rows = bag.join(g.vertexTable(tag), Seq("vid")).drop("__i")
        val out =
          if (ys.isEmpty) rows
          else rows.select(ys.map {
            case YExpr("eprop", t, _, prop, a) =>
              require(t == tag, s"unknown tag $t in FETCH YIELD")
              col(prop).as(a)
            case YExpr("col", _, _, c, a) => col(c).as(a)
            case y => throw new IllegalArgumentException(s"bad fetch yield $y")
          }: _*)
        if (dist) out.distinct() else out
      case FindPath(shortest, srcs, dsts, upto) =>
        if (shortest)
          PathFinder.shortestPaths(seedsDf(srcs), seedsDf(dsts), g.allEdges, upto)
        else
          PathFinder.allPaths(seedsDf(srcs), seedsDf(dsts), g.allEdges, upto)
      case Subgraph(steps, seeds) =>
        Traverse.subgraph(seedsDf(seeds), g.allEdges, steps, Both).vertices
    }
  }

  /** GO execution against a prepared seed frame (literal set for a
    * top-level sentence; the previous pipe stage's column, with bag
    * multiplicity, for a chained `| GO FROM $-.col`). */
  private def execGo(g: GraphCatalog, goAst: Go, seedsDF: DataFrame): DataFrame = {
    val Go(m, n, _, etype, dir, ys, dist, where, _) = goAst
    val edges = if (etype == "*") g.allEdges else g.edgesByType(etype)
    // constant WHERE folds driver-side (FoldConstantExprVisitor)
    val constFalse = where.exists(w =>
      w.eprop.isEmpty && !constTruthy(w.lhs.get, w.op, w.rhs))
    val plainCols = Set("origin", "vid", "step")
    val simple = ys.forall(y => y.kind == "col" && plainCols(y.prop)) &&
          where.forall(_.eprop.isEmpty)
        val base =
          if (simple)
            // ExpandAll frontier semantics: deduped (origin,vid) rows
            Traverse.go(seedsDF, edges, m, n, dir)
          else {
            // per-edge yield rows; edge-prop WHERE filters yielded rows
            var out = Traverse.goYield(seedsDF, edges, m, n, dir)
            where.flatMap(_.eprop).foreach { case (et, prop) =>
              require(et == etype, s"WHERE edge ref $et needs OVER $et")
              out = out.filter(cmp(col(prop), where.get.op, where.get.rhs))
            }
            // vertex-prop refs join the tag tables on dst/src
            val dstTags = ys.collect { case YExpr("dstprop", _, tag, _, _) => tag }.distinct
            val srcTags = ys.collect { case YExpr("srcprop", _, tag, _, _) => tag }.distinct
            dstTags.foreach { tag =>
              out = Traverse.appendVertices(out, g.vertexTable(tag),
                vidCol = "dst", prefix = s"__dst_${tag}_")
            }
            srcTags.foreach { tag =>
              out = Traverse.appendVertices(out, g.vertexTable(tag),
                vidCol = "src", prefix = s"__src_${tag}_")
            }
            out
          }
        val cols = ys.map {
          case YExpr("col", _, _, c, a) => col(c).as(a)
          // OVER * with edge-typed refs needs the reference's per-type
          // NULL padding; out of subset -> reject (TCK runner skips)
          case YExpr("edst", et, _, _, a) =>
            require(et == etype, s"edge ref $et needs OVER $et")
            col("dst").as(a)
          case YExpr("esrc", et, _, _, a) =>
            require(et == etype, s"edge ref $et needs OVER $et")
            col("src").as(a)
          case YExpr("eprop", et, _, prop, a) =>
            require(et == etype, s"edge ref $et needs OVER $et")
            col(prop).as(a)
          case YExpr("iddst", _, _, _, a) => col("dst").as(a)
          case YExpr("idsrc", _, _, _, a) => col("src").as(a)
          case YExpr("dstprop", _, tag, prop, a) =>
            col(s"__dst_${tag}_$prop").as(a)
          case YExpr("srcprop", _, tag, prop, a) =>
            col(s"__src_${tag}_$prop").as(a)
          case y => throw new IllegalArgumentException(s"bad yield $y")
        }
        val selected = base.select(cols: _*)
        val out = if (dist) selected.distinct() else selected
        if (constFalse) out.limit(0) else out
  }

  /** Driver-side evaluation of a constant WHERE comparison. */
  private def constTruthy(l: Any, op: String, r: Any): Boolean = (l, r) match {
    case (a: Long, b: Long) => op match {
      case ">" => a > b; case "<" => a < b; case ">=" => a >= b
      case "<=" => a <= b; case "==" | "=" => a == b; case "!=" => a != b
    }
    case (a: Double, b: Double) => op match {
      case ">" => a > b; case "<" => a < b; case ">=" => a >= b
      case "<=" => a <= b; case "==" | "=" => a == b; case "!=" => a != b
    }
    case (a: String, b: String) => op match {
      case ">" => a > b; case "<" => a < b; case ">=" => a >= b
      case "<=" => a <= b; case "==" | "=" => a == b; case "!=" => a != b
    }
    // mixed-type comparison: BAD_TYPE null → not truthy → drop rows
    case _ => false
  }

  /** Pipe application over the previous stage's DataFrame ($- input). */
  private def applyPipe(g: GraphCatalog, df: DataFrame, pipe: Pipe): DataFrame = pipe match {
    case PGo(goAst) =>
      // chained GO: previous stage's column seeds the expansion WITH
      // multiplicity (GO.feature pipe goldens keep duplicate rows)
      val seeds = df.select(col(goAst.seedsCol.get).as("vid"))
      execGo(g, goAst, seeds)
    case PLimit(n) => df.limit(n)
    case POrderBy(c, desc) => df.orderBy(if (desc) col(c).desc else col(c))
    case PYield(items, distinct) =>
      val hasAgg = items.exists(_.agg.isDefined)
      val out =
        if (!hasAgg) df.select(items.map(i => col(i.col).as(i.alias)): _*)
        else {
          // implicit grouping: non-agg items are the keys
          val keys = items.filter(_.agg.isEmpty).map(i => col(i.col))
          val aggs = items.collect { case YieldItem(Some(fn), c, a) =>
            (fn match {
              case "count" => if (c == "*") count(lit(1)) else count(col(c))
              case "sum" => sum(col(c))
              case "avg" => avg(col(c))
              case "min" => min(col(c))
              case "max" => max(col(c))
              case "std" => stddev_pop(col(c))
              case "collect" => collect_list(col(c))
              case "collect_set" => collect_set(col(c))
            }).as(a)
          }
          val grouped =
            if (keys.isEmpty) df.agg(aggs.head, aggs.tail: _*)
            else df.groupBy(keys: _*).agg(aggs.head, aggs.tail: _*)
          // re-apply aliases for key columns
          grouped.select(items.map(i =>
            if (i.agg.isEmpty) col(i.col).as(i.alias) else col(i.alias)): _*)
        }
      if (distinct) out.distinct() else out
  }

  private def cmp(c: Column, op: String, lit: Any): Column = op match {
    case ">" => c > lit
    case "<" => c < lit
    case ">=" => c >= lit
    case "<=" => c <= lit
    case "==" | "=" => c === lit
    case "!=" => c =!= lit
    case other => throw new IllegalArgumentException(s"bad operator $other")
  }

}
