package graft.cypher

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A Cypher-subset compiler to Spark DataFrame plans — the missing
  * piece of "a reference user could switch": the reference app drives
  * Neo4j entirely through Cypher strings (`streamlit_app.py`,
  * the `recommender` scripts), and this compiles THOSE query shapes, verbatim
  * modulo the documented property mapping, onto the engine's property
  * frames. Each clause lowers to the DataFrame op it denotes, so the
  * result is an ordinary Catalyst plan — joins get reordered, filters
  * push down, the anti-join pattern predicate becomes a real
  * `left_anti` — nothing is interpreted row-at-a-time.
  *
  * Supported surface (everything the reference's 8 read queries use):
  *  - `MATCH (v:Label {prop: $param|literal|boundScalar})` node
  *    patterns, chained relationships `(a)-[r:TYPE]->(b)`, multiple
  *    MATCH clauses sharing variables;
  *  - `WHERE` with =, <>, <, <=, >, >=, AND, OR, XOR, NOT, `IS [NOT]
  *    NULL`, `STARTS WITH` / `ENDS WITH` / `CONTAINS` / `IN [list]` /
  *    `=~` (whole-string regex, literal pattern), and the pattern
  *    predicate `NOT (a)-[:TYPE]->(b)` (compiled as a left_anti join;
  *    the positive form as left_semi);
  *  - arithmetic `+ - * / %` with standard precedence and unary minus
  *    (`+` concatenates when either side is a string; `/` is true
  *    division — Spark's and DuckDB's shared semantics, documented
  *    deviation from Neo4j's int/int truncation), searched `CASE WHEN
  *    … THEN … [ELSE …] END` and simple `CASE subj WHEN v THEN …`
  *    (desugared to `=` branches — r12b), list literals `[a, b, c]`,
  *    and the
  *    scalar whitelist (all codegen'd built-ins, no UDFs): toLower,
  *    toUpper, trim/ltrim/rtrim, reverse, toString, toInteger,
  *    toFloat, abs, round(x[, d]), ceil, floor, sqrt, sign, exp, log,
  *    log10, size (list or string by resolved type), head, last,
  *    coalesce, substring (0-based), replace, split, left, right,
  *    range;
  *  - `WITH [DISTINCT] items` with aggregation grouping Cypher-style
  *    (group keys = the non-aggregate items; an item containing an
  *    aggregate ANYWHERE is an aggregate item, so `sum(x) * 1.0 /
  *    count(*)` compiles) over `count(*)`, `count([DISTINCT] x)`,
  *    `avg([DISTINCT] x)`, `sum([DISTINCT] x)`, `min(x)`, `max(x)`,
  *    `COLLECT([DISTINCT] x)` (DISTINCT in canonical sorted order),
  *    `stDev(x)`, `stDevP(x)`, `percentileCont(x, p)`, plus trailing
  *    `WHERE` / `ORDER BY` / `LIMIT`;
  *  - `UNWIND list AS v`;
  *  - `RETURN [DISTINCT] items [ORDER BY ...] [SKIP n] [LIMIT n]`
  *    (SKIP/LIMIT also on WITH — Cypher's pagination trio);
  *  - `UNION [ALL]` between whole queries (same column names in the
  *    same order, Neo4j's contract; mixing UNION and UNION ALL in one
  *    query fails fast) — r12b;
  *  - list expressions (r12b, all native Catalyst higher-order
  *    functions — no UDFs): comprehensions `[x IN l WHERE p | e]`
  *    (filter/transform), quantifiers `any/all/none/single(x IN l
  *    WHERE p)` (exists/forall), and `reduce(acc = init, x IN l | e)`
  *    (aggregate) — lambda bodies compile through the same expression
  *    compiler, so the whole scalar whitelist and outer row columns
  *    work inside, and nesting composes;
  *  - var-length segments `-[r:T*min..max]->` / `-[:T*..k]-` (bounded
  *    BFS; `r.hops` = minimal hop distance — see [[Compiler]] for the
  *    documented DISTINCT-endpoint semantics), inside plain AND
  *    OPTIONAL MATCH, and
  *    `MATCH p = shortestPath((a {id:s})-[:T*..k]-(b {id:t}))` with
  *    `nodes(p)` / `relationships(p)` / `length(p)`, lowered onto the
  *    engine's shortest-path machinery.
  *
  * Variables live as STRUCT columns (node: id + properties; rel:
  * src/dst + properties), property access is `getField`, and a WITH
  * re-projects scope exactly as Cypher does (anything not listed is
  * gone). Unsupported constructs fail fast with the offending token —
  * never a silently wrong plan.
  *
  * Scale: the compiler emits only equi-joins keyed on node ids plus
  * the filters/aggregations the query states; a compiled query is
  * plan-for-plan the same shape the hand-built twin uses (spec-proved
  * equal on `user_rated_books`, `recommend_knn`,
  * `users_in_large_groups`, `similar_users`, `recommend_community`).
  */
object CypherLite {

  /** Property-graph binding: label → node frame (`id` column first,
    * then properties), type → edge frame (`src`, `dst`, properties). */
  case class Graph(nodes: Map[String, DataFrame], edges: Map[String, DataFrame])

  def run(graph: Graph, query: String,
      params: Map[String, Any] = Map.empty): DataFrame = {
    val (parts, all) = Parser.parseUnion(query)
    val dfs = parts.map(p => new Compiler(graph, params).compile(p))
    if (dfs.lengthCompare(1) == 0) dfs.head
    else {
      // Neo4j's UNION contract: every part returns the same column
      // names in the same order; UNION dedups full rows, UNION ALL
      // keeps them. unionAll on positionally-aligned parts is exactly
      // that — one narrow concat, the optional distinct is the only
      // shuffle.
      val cols = dfs.head.columns.toSeq
      dfs.tail.foreach(d => require(d.columns.toSeq == cols,
        s"UNION parts must return the same columns in the same order: " +
          s"$cols vs ${d.columns.toSeq}"))
      val u = dfs.reduce(_ unionAll _)
      if (all) u else u.distinct()
    }
  }

  // ---------------------------------------------------------------- AST

  private[cypher] sealed trait Expr
  private[cypher] case class Prop(v: String, field: String) extends Expr
  private[cypher] case class Ident(name: String) extends Expr
  private[cypher] case class Param(name: String) extends Expr
  private[cypher] case class Lit(value: Any) extends Expr
  private[cypher] case class Cmp(op: String, l: Expr, r: Expr) extends Expr
  private[cypher] case class And(l: Expr, r: Expr) extends Expr
  private[cypher] case class Or(l: Expr, r: Expr) extends Expr
  private[cypher] case class Not(e: Expr) extends Expr
  /** `distinct` = `count(DISTINCT x)` etc.; `arg2` carries the second
    * argument of two-arg aggregates (`percentileCont(x, p)`). */
  private[cypher] case class Agg(fn: String, arg: Option[Expr],
      distinct: Boolean = false, arg2: Option[Expr] = None) extends Expr
  private[cypher] case class PatPred(a: String, relType: String, b: String) extends Expr

  private[cypher] case class Fn1(name: String, arg: Expr) extends Expr
  /** Generic scalar function call, compiled against the whitelist in
    * [[Compiler.col1]]. */
  private[cypher] case class FnN(name: String, args: Seq[Expr]) extends Expr
  private[cypher] case class Arith(op: String, l: Expr, r: Expr) extends Expr
  private[cypher] case class Neg(e: Expr) extends Expr
  private[cypher] case class ListLit(items: Seq[Expr]) extends Expr
  /** `[x IN list WHERE pred | proj]` — filter and/or transform. */
  private[cypher] case class ListComp(v: String, list: Expr,
      where: Option[Expr], proj: Option[Expr]) extends Expr
  /** `any/all/none/single(x IN list WHERE pred)`. */
  private[cypher] case class ListQuant(q: String, v: String, list: Expr,
      pred: Expr) extends Expr
  /** `reduce(acc = init, x IN list | step)`. */
  private[cypher] case class ReduceExpr(acc: String, init: Expr, v: String,
      list: Expr, step: Expr) extends Expr
  private[cypher] case class CaseExpr(whens: Seq[(Expr, Expr)],
      default: Option[Expr]) extends Expr
  private[cypher] case class IsNull(e: Expr, negated: Boolean) extends Expr

  private[cypher] case class NodePat(v: Option[String], label: Option[String],
      props: Seq[(String, Expr)])
  /** `varLength = Some((min, max))` for `-[:T*min..max]->` segments;
    * `undirected` for `-[:T]-` (no arrowhead either side). */
  private[cypher] case class RelPat(v: Option[String], relType: String,
      leftToRight: Boolean, varLength: Option[(Int, Int)] = None,
      undirected: Boolean = false)
  private[cypher] case class Chain(first: NodePat, rest: Seq[(RelPat, NodePat)])

  private[cypher] case class Item(expr: Expr, alias: Option[String])
  private[cypher] case class Order(expr: Expr, asc: Boolean)

  private[cypher] sealed trait Clause
  /** `where` is the OPTIONAL MATCH-attached WHERE — Cypher applies it
    * INSIDE the optional pattern (an unmatched-or-filtered head keeps
    * its row with nulls), which is NOT the same as a post-filter. */
  private[cypher] case class Match(chains: Seq[Chain],
      optional: Boolean = false, where: Option[Expr] = None) extends Clause
  /** `MATCH p = shortestPath((a)-[:T*..k]-(b))` — binds `p` to the
    * node sequence of THE shortest path (deterministic min-parent
    * tie-break, [[graft.graph.Algorithms.shortestPathNodesOn]]). */
  private[cypher] case class ShortestPath(pathVar: String,
      chain: Chain) extends Clause
  /** `MATCH p = (a)-[r:T*min..max]->(b)` — PER-PATH var-length match:
    * one row per relationship-unique path (Cypher's multiplicity, not
    * the bare var-length segment's DISTINCT-endpoint contract). `p`
    * binds the shortestPath node-sequence shape; `r` binds the
    * relationship list. */
  private[cypher] case class PathMatch(pathVar: String,
      chain: Chain) extends Clause
  private[cypher] case class Where(expr: Expr) extends Clause
  private[cypher] case class With(items: Seq[Item], distinct: Boolean,
      where: Option[Expr], order: Seq[Order], limit: Option[Long],
      skip: Option[Long] = None) extends Clause
  private[cypher] case class Unwind(expr: Expr, alias: String) extends Clause
  private[cypher] case class Return(items: Seq[Item], distinct: Boolean,
      order: Seq[Order], limit: Option[Long],
      skip: Option[Long] = None) extends Clause

  // ------------------------------------------------------------- Parser

  private object Parser {
    private val Keywords = Set("MATCH", "OPTIONAL", "WHERE", "WITH", "UNWIND",
      "RETURN", "AS", "AND", "OR", "XOR", "NOT", "DISTINCT", "ORDER", "BY",
      "LIMIT", "SKIP", "ASC", "DESC", "STARTS", "ENDS", "CONTAINS", "IN",
      "IS", "NULL", "CASE", "WHEN", "THEN", "ELSE", "END", "TRUE", "FALSE",
      // ALL is deliberately NOT a keyword: `all(x IN l WHERE p)` is a
      // quantifier call — unionAll() matches the trailing ALL by case-
      // insensitive identifier instead
      "UNION")

    def parse(q: String): Seq[Clause] = {
      val p = new P(tokenize(q))
      val cs = p.clauses()
      p.expectEof("UNION is only supported through CypherLite.run")
      cs
    }

    /** `part1 UNION [ALL] part2 [...]` — the per-part clause lists plus
      * the ALL flag. Neo4j rejects mixing UNION and UNION ALL in one
      * query; so does this. */
    def parseUnion(q: String): (Seq[Seq[Clause]], Boolean) = {
      val p = new P(tokenize(q))
      val parts = Seq.newBuilder[Seq[Clause]]
      val flags = Seq.newBuilder[Boolean]
      parts += p.clauses()
      while (p.atUnion) { flags += p.unionAll(); parts += p.clauses() }
      p.expectEof("trailing tokens after the last UNION part")
      val fs = flags.result()
      require(fs.distinct.lengthCompare(1) <= 0,
        "cannot mix UNION and UNION ALL in one query (Neo4j contract)")
      (parts.result(), fs.headOption.getOrElse(false))
    }

    /** Tokens: identifiers/keywords, numbers, 'strings', $params, and
      * the symbols ( ) [ ] { } : , . plus - > < = >= <= <>. */
    private def tokenize(q: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < q.length) {
        val ch = q(i)
        if (ch.isWhitespace) i += 1
        else if (ch == '/' && i + 1 < q.length && q(i + 1) == '/') {
          val nl = q.indexOf('\n', i)
          i = if (nl < 0) q.length else nl + 1
        } else if (ch.isLetter || ch == '_') {
          val j = q.indexWhere(c => !c.isLetterOrDigit && c != '_', i)
          val end = if (j < 0) q.length else j
          val w = q.substring(i, end)
          out += (if (Keywords.contains(w.toUpperCase)) w.toUpperCase else w)
          i = end
        } else if (ch.isDigit) {
          val j = q.indexWhere(c => !c.isDigit && c != '.', i)
          val end = if (j < 0) q.length else j
          out += q.substring(i, end); i = end
        } else if (ch == '\'') {
          val end = q.indexOf('\'', i + 1)
          require(end > 0, s"unterminated string at $i")
          out += q.substring(i, end + 1); i = end + 1
        } else if (ch == '$') {
          val j = q.indexWhere(c => !c.isLetterOrDigit && c != '_', i + 1)
          val end = if (j < 0) q.length else j
          out += q.substring(i, end); i = end
        } else if (ch == '=' && i + 1 < q.length && q(i + 1) == '~') {
          out += "=~"; i += 2
        } else if (ch == '<' && i + 1 < q.length && (q(i + 1) == '>' || q(i + 1) == '=')) {
          out += q.substring(i, i + 2); i += 2
        } else if (ch == '>' && i + 1 < q.length && q(i + 1) == '=') {
          out += ">="; i += 2
        } else if (ch == '-' && i + 1 < q.length && q(i + 1) == '>') {
          out += "->"; i += 2
        } else {
          out += ch.toString; i += 1
        }
      }
      out.result()
    }

    private class P(ts: Vector[String]) {
      private var pos = 0
      private def peek: String = if (pos < ts.length) ts(pos) else "<eof>"
      private def peekAt(k: Int): String =
        if (pos + k < ts.length) ts(pos + k) else "<eof>"
      private def next(): String = { val t = peek; pos += 1; t }
      private def expect(t: String): Unit = {
        val got = next()
        require(got == t, s"expected '$t', got '$got' (near token $pos)")
      }
      private def isIdent(t: String): Boolean =
        t.nonEmpty && (t(0).isLetter || t(0) == '_') && !Keywords.contains(t)

      def clauses(): Seq[Clause] = {
        val out = Seq.newBuilder[Clause]
        while (peek != "<eof>" && peek != "UNION") out += clause()
        out.result()
      }

      def atUnion: Boolean = peek == "UNION"
      def unionAll(): Boolean = {
        expect("UNION")
        if (peek.equalsIgnoreCase("ALL")) { next(); true } else false
      }
      def expectEof(msg: String): Unit =
        require(peek == "<eof>", s"unexpected token '$peek' — $msg")

      private def clause(): Clause = next() match {
        case "MATCH" =>
          // `MATCH p = shortestPath((a)-[:T*..k]-(b))`
          if (isIdent(peek) && peekAt(1) == "=" && peekAt(2) == "shortestPath") {
            val pv = next(); next(); next(); expect("(")
            val c = chain()
            expect(")")
            ShortestPath(pv, c)
          } else if (isIdent(peek) && peekAt(1) == "=") {
            // `MATCH p = (a)-[r:T*min..max]->(b)` — per-path binding
            val pv = next(); next()
            PathMatch(pv, chain())
          } else {
            val cs = Seq.newBuilder[Chain]
            cs += chain()
            while (peek == ",") { next(); cs += chain() }
            Match(cs.result())
          }
        case "OPTIONAL" =>
          expect("MATCH")
          val cs = Seq.newBuilder[Chain]
          cs += chain()
          while (peek == ",") { next(); cs += chain() }
          // a WHERE here belongs to the OPTIONAL pattern (Cypher
          // semantics), not to the row stream — parsing it as a
          // separate post-filter clause would silently drop the
          // null-extended rows Cypher keeps
          val w = if (peek == "WHERE") { next(); Some(expr()) } else None
          Match(cs.result(), optional = true, w)
        case "WHERE" => Where(expr())
        case "UNWIND" =>
          val e = expr(); expect("AS"); Unwind(e, next())
        case "WITH" =>
          val (d, its) = itemList()
          val w = if (peek == "WHERE") { next(); Some(expr()) } else None
          val (o, sk, l) = orderLimit()
          With(its, d, w, o, l, sk)
        case "RETURN" =>
          val (d, its) = itemList()
          val (o, sk, l) = orderLimit()
          Return(its, d, o, l, sk)
        case other => sys.error(s"unsupported clause '$other'")
      }

      private def itemList(): (Boolean, Seq[Item]) = {
        val d = peek == "DISTINCT"
        if (d) next()
        val its = Seq.newBuilder[Item]
        its += item()
        while (peek == ",") { next(); its += item() }
        (d, its.result())
      }

      private def item(): Item = {
        val e = expr()
        if (peek == "AS") { next(); Item(e, Some(next())) } else Item(e, None)
      }

      /** `[ORDER BY …] [SKIP n] [LIMIT n]` — Cypher's trailing
        * pagination trio, in its fixed order. */
      private def orderLimit(): (Seq[Order], Option[Long], Option[Long]) = {
        val o = if (peek == "ORDER") {
          next(); expect("BY")
          val os = Seq.newBuilder[Order]
          def one(): Unit = {
            val e = expr()
            val asc = peek match {
              case "DESC" => next(); false
              case "ASC" => next(); true
              case _ => true
            }
            os += Order(e, asc)
          }
          one()
          while (peek == ",") { next(); one() }
          os.result()
        } else Nil
        val sk = if (peek == "SKIP") { next(); Some(next().toLong) } else None
        val l = if (peek == "LIMIT") { next(); Some(next().toLong) } else None
        (o, sk, l)
      }

      def chain(): Chain = {
        val first = nodePat()
        val rest = Seq.newBuilder[(RelPat, NodePat)]
        while (peek == "-" || peek == "<") rest += ((relPat(), nodePat()))
        Chain(first, rest.result())
      }

      private def nodePat(): NodePat = {
        expect("(")
        val v = if (isIdent(peek)) Some(next()) else None
        val label = if (peek == ":") { next(); Some(next()) } else None
        val props = if (peek == "{") propMap() else Nil
        expect(")")
        NodePat(v, label, props)
      }

      private def propMap(): Seq[(String, Expr)] = {
        expect("{")
        val out = Seq.newBuilder[(String, Expr)]
        def one(): Unit = {
          val k = next(); expect(":"); out += ((k, primary()))
        }
        one()
        while (peek == ",") { next(); one() }
        expect("}")
        out.result()
      }

      /** `-[r:TYPE]->`, `<-[r:TYPE]-`, undirected `-[r:TYPE]-`, each
        * with an optional var-length `*min..max` / `*k` / `*..k`. */
      private def relPat(): RelPat = {
        val leftArrow = peek == "<"
        if (leftArrow) { next(); expect("-") } else expect("-")
        expect("[")
        val v = if (isIdent(peek)) Some(next()) else None
        expect(":")
        val t = next()
        val vl = if (peek == "*") { next(); Some(varBounds()) } else None
        expect("]")
        if (leftArrow) { expect("-"); RelPat(v, t, leftToRight = false, vl) }
        else if (peek == "->") { next(); RelPat(v, t, leftToRight = true, vl) }
        else { expect("-"); RelPat(v, t, leftToRight = true, vl,
          undirected = true) }
      }

      /** Var-length bounds after `*`. The tokenizer folds digit/dot
        * runs, so `1..3` arrives as ONE token and `..3` as `.` `.` `3`.
        * An unbounded `*` fails fast — a 100 TB graph has no business
        * in an unbounded transitive closure; state the horizon. */
      private def varBounds(): (Int, Int) = {
        if (peek == "]") sys.error(
          "unbounded var-length '*' unsupported; give an upper bound (*..k)")
        if (peek == ".") { next(); expect("."); (1, next().toInt) }
        else {
          val tok = next()
          if (tok.contains("..")) {
            val parts = tok.split("\\.\\.")
            require(parts.length == 2 && parts(1).nonEmpty,
              s"var-length needs an upper bound, got '*$tok'")
            (parts(0).toInt, parts(1).toInt)
          } else (tok.toInt, tok.toInt)
        }
      }

      // -- expressions ------------------------------------------------
      // precedence (loosest first): OR, XOR, AND, NOT, comparison /
      // string predicates / IN / IS NULL, + -, * / %, unary -, primary
      def expr(): Expr = orE()
      private def orE(): Expr = {
        var e = xorE()
        while (peek == "OR") { next(); e = Or(e, xorE()) }
        e
      }
      private def xorE(): Expr = {
        var e = andE()
        // boolean XOR ≡ NOT(l = r) for boolean operands
        while (peek == "XOR") { next(); e = Not(Cmp("=", e, andE())) }
        e
      }
      private def andE(): Expr = {
        var e = notE()
        while (peek == "AND") { next(); e = And(e, notE()) }
        e
      }
      private def notE(): Expr =
        if (peek == "NOT") { next(); Not(notE()) }
        else cmpE()
      private def cmpE(): Expr = {
        val l = addE()
        peek match {
          case op @ ("=" | "<>" | "<" | "<=" | ">" | ">=") =>
            next(); Cmp(op, l, addE())
          case "=~" => next(); Cmp("regex", l, addE())
          case "STARTS" => next(); expect("WITH"); Cmp("startsWith", l, addE())
          case "ENDS" => next(); expect("WITH"); Cmp("endsWith", l, addE())
          case "CONTAINS" => next(); Cmp("contains", l, addE())
          case "IN" => next(); Cmp("in", l, addE())
          case "IS" =>
            next()
            if (peek == "NOT") { next(); expect("NULL"); IsNull(l, negated = true) }
            else { expect("NULL"); IsNull(l, negated = false) }
          case _ => l
        }
      }
      private def addE(): Expr = {
        var e = mulE()
        while (peek == "+" || peek == "-") {
          val op = next(); e = Arith(op, e, mulE())
        }
        e
      }
      private def mulE(): Expr = {
        var e = unaryE()
        while (peek == "*" || peek == "/" || peek == "%") {
          val op = next(); e = Arith(op, e, unaryE())
        }
        e
      }
      private def unaryE(): Expr =
        if (peek == "-") { next(); Neg(unaryE()) }
        else if (peek == "+") { next(); unaryE() }
        else primary()
      private val AggFns = Set("count", "avg", "sum", "min", "max",
        "collect", "stdev", "stdevp", "percentilecont")

      private def primary(): Expr = {
        val t = peek
        if (t.equalsIgnoreCase("EXISTS") && peekAt(1) == "{") {
          // Neo4j 5 existential subquery shorthand:
          // EXISTS { (a)-[:T]->(b) } — the modern spelling of the bare
          // pattern predicate (which Neo4j 5 deprecates), same
          // single-hop bound-variable contract, same left_semi/left_anti
          // lowering (NOT EXISTS { } composes through Not)
          next(); next()
          val c = chain()
          require(c.rest.length == 1 && c.rest.head._2.v.isDefined &&
            c.first.v.isDefined, "EXISTS { } supports (a)-[:T]->(b)")
          val (rel, dst) = c.rest.head
          require(rel.leftToRight, "EXISTS { } supports -> only")
          expect("}")
          PatPred(c.first.v.get, rel.relType, dst.v.get)
        } else if (t == "(") {
          // '(' starts either a parenthesised expr or a PATTERN
          // predicate `(a)-[:T]->(b)`; patterns are `(ident)` followed
          // by `-[` or `<-` — look ahead FOUR tokens so parenthesised
          // arithmetic `(a) - 1` / comparison `(a) < b` stays an expr
          if (isIdent(peekAt(1)) && peekAt(2) == ")" &&
              ((peekAt(3) == "-" && peekAt(4) == "[") ||
               (peekAt(3) == "<" && peekAt(4) == "-"))) {
            val c = chain()
            require(c.rest.length == 1 && c.rest.head._2.v.isDefined &&
              c.first.v.isDefined, "pattern predicate must be (a)-[:T]->(b)")
            val (rel, dst) = c.rest.head
            require(rel.leftToRight, "pattern predicate supports -> only")
            PatPred(c.first.v.get, rel.relType, dst.v.get)
          } else {
            next(); val e = expr(); expect(")"); e
          }
        } else if (t == "[") {
          next()
          if (isIdent(peek) && peekAt(1) == "IN") {
            // list comprehension `[x IN list (WHERE pred)? (| proj)?]`
            // — Cypher gives the comprehension reading priority over a
            // one-element literal of a boolean `x IN list`
            val v = next()
            expect("IN")
            val listE = expr()
            val w = if (peek == "WHERE") { next(); Some(expr()) } else None
            val proj = if (peek == "|") { next(); Some(expr()) } else None
            expect("]")
            ListComp(v, listE, w, proj)
          } else {
            val items = Seq.newBuilder[Expr]
            if (peek != "]") {
              items += expr()
              while (peek == ",") { next(); items += expr() }
            }
            expect("]")
            ListLit(items.result())
          }
        } else if (t == "CASE") {
          // searched CASE: CASE WHEN cond THEN v [WHEN …] [ELSE v] END
          // simple CASE:   CASE subj WHEN v THEN r [WHEN …] [ELSE d] END
          // — desugars to searched with subj = v_i branches (Cypher's
          // simple CASE is `=` comparison, so a null subject falls to
          // ELSE exactly like the desugaring does)
          next()
          val subject = if (peek == "WHEN") None else Some(expr())
          require(peek == "WHEN",
            "CASE needs WHEN (searched) or a subject expression (simple)")
          val whens = Seq.newBuilder[(Expr, Expr)]
          while (peek == "WHEN") {
            next()
            val c = expr()
            expect("THEN")
            val cond = subject.map(s => Cmp("=", s, c)).getOrElse(c)
            whens += ((cond, expr()))
          }
          val dflt = if (peek == "ELSE") { next(); Some(expr()) } else None
          expect("END")
          CaseExpr(whens.result(), dflt)
        } else if (t == "NULL") { next(); Lit(null) }
        else if (t == "TRUE") { next(); Lit(true) }
        else if (t == "FALSE") { next(); Lit(false) }
        else if (t.startsWith("$")) { next(); Param(t.drop(1)) }
        else if (t.startsWith("'")) { next(); Lit(t.substring(1, t.length - 1)) }
        else if (t.nonEmpty && t(0).isDigit) {
          next()
          if (t.contains('.')) Lit(t.toDouble) else Lit(t.toLong)
        } else if (t == "*") { next(); Ident("*") }
        else if (isIdent(t)) {
          val name = next()
          val fl = name.toLowerCase
          if (peek == "(" && AggFns.contains(fl)) {
            next()
            val distinct = peek == "DISTINCT"
            if (distinct) next()
            val arg = if (peek == "*") { next(); None } else Some(expr())
            val arg2 = if (peek == ",") { next(); Some(expr()) } else None
            expect(")")
            Agg(fl, arg, distinct, arg2)
          } else if (peek == "(" && fl == "id") {
            // id(v): Neo4j's internal-id accessor — the binding's `id`
            // key field (`gds.graph.project.cypher`'s node/rel queries
            // use it, `Alg_Community_Detection.py:21-30`)
            next()
            val v = next()
            expect(")")
            Prop(v, "id")
          } else if (peek == "(" && fl == "nodes") {
            // nodes(p): a shortestPath binding already IS its node
            // sequence (array<struct<step, node_id>>) — identity
            next(); val e = expr(); expect(")"); e
          } else if (peek == "(" && fl == "relationships") {
            next(); val e = expr(); expect(")"); Fn1("relationships", e)
          } else if (peek == "(" && fl == "length") {
            next(); val e = expr(); expect(")"); Fn1("length", e)
          } else if (peek == "(" &&
              Set("any", "all", "none", "single").contains(fl) &&
              isIdent(peekAt(1)) && peekAt(2) == "IN") {
            // list-predicate quantifiers `any(x IN list WHERE pred)`
            next()
            val v = next()
            expect("IN")
            val listE = expr()
            expect("WHERE")
            val pred = expr()
            expect(")")
            ListQuant(fl, v, listE, pred)
          } else if (peek == "(" && fl == "reduce") {
            // `reduce(acc = init, x IN list | step)`
            next()
            val acc = next()
            expect("=")
            val init = expr()
            expect(",")
            val v = next()
            expect("IN")
            val listE = expr()
            expect("|")
            val step = expr()
            expect(")")
            ReduceExpr(acc, init, v, listE, step)
          } else if (peek == "(") {
            // generic scalar call — compiled against the whitelist in
            // Compiler.col1 (unknown names still fail fast, at compile)
            next()
            val args = Seq.newBuilder[Expr]
            if (peek != ")") {
              args += expr()
              while (peek == ",") { next(); args += expr() }
            }
            expect(")")
            FnN(fl, args.result())
          } else if (peek == ".") {
            next(); Prop(name, next())
          } else Ident(name)
        } else sys.error(s"unexpected token '$t'")
      }
    }
  }

  // ----------------------------------------------------------- Compiler

  private class Compiler(graph: Graph, params: Map[String, Any]) {
    /** Bound variables: struct columns (nodes/rels/list elements) or
      * plain scalar columns introduced by WITH aliases. */
    private var structVars = Set.empty[String]
    /** Compile-time provenance for `labels(v)` / `type(r)`: node var →
      * label, rel var → relationship type — known statically (each
      * binding names its frame), so both functions fold to literals. */
    private var varLabels = Map.empty[String, String]
    private var varTypes = Map.empty[String, String]
    private var df: DataFrame = _
    private var fresh = 0

    def compile(clauses: Seq[Clause]): DataFrame = {
      clauses.foreach {
        case m: Match if m.optional =>
          // one OPTIONAL MATCH = one pattern: comma-joined chains bind
          // all-or-nothing (separate OPTIONAL MATCH clauses stay
          // independent null cascades)
          optionalChains(m.chains, m.where)
        case m: Match => m.chains.foreach(matchChain)
        case sp: ShortestPath => compileShortestPath(sp)
        case pm: PathMatch => compilePathMatch(pm)
        case Where(e) => applyPredicate(e)
        case w: With =>
          project(w.items, w.distinct, w.where, w.order, w.limit, w.skip)
        case Unwind(e, v) =>
          df = df.withColumn(v, explode(col1(e)))
          structVars += v
        case r: Return =>
          project(r.items, r.distinct, None, r.order, r.limit, r.skip)
      }
      df
    }

    private def nodeDf(label: String, as: String): DataFrame = {
      val base = graph.nodes.getOrElse(label,
        sys.error(s"unknown node label :$label"))
      base.select(struct(base.columns.map(col).toIndexedSeq: _*).as(as))
    }

    private def edgeFrame(relType: String): DataFrame =
      graph.edges.getOrElse(relType,
        sys.error(s"unknown relationship type :$relType"))

    /** Edge frame as a struct column. An undirected pattern `-[:T]-`
      * symmetrises the frame FIRST so the hop stays one equi-join (an
      * OR over both endpoint orders would plan a nested-loop join);
      * the struct's src/dst then reflect traversal direction, not
      * storage order. */
    private def edgeDf(relType: String, as: String,
        undirected: Boolean = false): DataFrame = {
      val base0 = edgeFrame(relType)
      val base =
        if (undirected) base0.unionAll(base0.select(base0.columns.map {
          case "src" => col("dst").as("src")
          case "dst" => col("src").as("dst")
          case c => col(c)
        }.toIndexedSeq: _*))
        else base0
      base.select(struct(base.columns.map(col).toIndexedSeq: _*).as(as))
    }

    private def freshName(): String = { fresh += 1; s"__anon$fresh" }

    private def matchChain(c: Chain): Unit = {
      bindNode(c.first)
      var prev = c.first.v.getOrElse(
        sys.error("chained pattern needs a named source node"))
      c.rest.foreach { case (rel, node) =>
        prev =
          if (rel.varLength.isDefined) varLengthHop(prev, rel, node)
          else singleHop(prev, rel, node)
      }
    }

    private def singleHop(prev: String, rel: RelPat, node: NodePat): String = {
      val rv = rel.v.getOrElse(freshName())
      val (fromField, toField) =
        if (rel.undirected || rel.leftToRight) ("src", "dst")
        else ("dst", "src")
      df = df.join(edgeDf(rel.relType, rv, rel.undirected),
        col(prev).getField("id") === col(rv).getField(fromField))
      structVars += rv
      varTypes += rv -> rel.relType
      bindChainTarget(node, col(rv).getField(toField))
    }

    /** Bind the target node of a hop given the column holding its id:
      * filter when already bound, join the label frame when new. */
    private def bindChainTarget(node: NodePat, idCol: Column): String =
      node.v match {
        case Some(v) if structVars.contains(v) =>
          df = df.filter(col(v).getField("id") === idCol)
          applyProps(v, node.props)
          v
        case _ =>
          val v = node.v.getOrElse(freshName())
          val label = node.label.getOrElse(
            sys.error(s"new node '$v' in a chain needs a :Label"))
          df = df.join(nodeDf(label, v), col(v).getField("id") === idCol)
          structVars += v
          varLabels += v -> label
          applyProps(v, node.props)
          v
      }

    /** `(a)-[r:T*min..max]->(b)`: bounded-BFS reachability. Binds each
      * (a, b) endpoint pair ONCE, with the MINIMAL hop distance as the
      * segment variable's `hops` field — i.e. Cypher's semantics under
      * a `WITH DISTINCT a, b` projection (per-path row multiplicity and
      * the relationship-list binding are not reproduced; a query that
      * needs them fails fast at the binding site, never silently). The
      * loop is the `bfs_hops` machinery generalised to a FRAME of
      * sources: one equi-join + (source, node)-keyed min-aggregate per
      * hop with a localCheckpoint lineage cut — no driver state, so a
      * bound head with millions of rows BFSes as one multi-source wave
      * (`Algorithms.multiSourceDistances`' shape: all waves share each
      * shuffle). */
    private def varLengthHop(prev: String, rel: RelPat,
        node: NodePat): String = {
      val reach = varLengthReachFrom(
        df.select(col(prev).getField("id").as("__vl_source")), rel)
      df = df.join(reach, col(prev).getField("id") === col("__vl_source"))
      rel.v.foreach { rv =>
        df = df.withColumn(rv, struct(col("__vl_hops").as("hops")))
        structVars += rv
        varTypes += rv -> rel.relType
      }
      val v = bindChainTarget(node, col("__vl_node"))
      df = df.drop("__vl_source", "__vl_node", "__vl_hops")
      v
    }

    /** The var-length BFS core, frame-parameterised so MATCH and
      * OPTIONAL MATCH share it: given a one-column frame of source ids,
      * returns (__vl_source, __vl_node, __vl_hops) for every endpoint
      * within the hop bounds — minimal hop distance per pair, no driver
      * state, one equi-join + (source, node) min-aggregate per hop with
      * a localCheckpoint lineage cut. */
    private def varLengthReachFrom(sourcesRaw: DataFrame,
        rel: RelPat): DataFrame = {
      val (minH, maxH) = rel.varLength.get
      require(0 <= minH && minH <= maxH && maxH >= 1,
        s"bad var-length bounds *$minH..$maxH")
      val dir0 = edgeFrame(rel.relType).select(col("src"), col("dst"))
      val step =
        (if (rel.undirected)
          dir0.unionAll(dir0.select(col("dst").as("src"), col("src").as("dst")))
        else if (rel.leftToRight) dir0
        else dir0.select(col("dst").as("src"), col("src").as("dst")))
          .distinct().localCheckpoint()
      val sources = sourcesRaw.toDF("__vl_source")
        .filter(col("__vl_source").isNotNull).distinct().localCheckpoint()
      var dist = sources.select(col("__vl_source"),
        col("__vl_source").as("__vl_node"), lit(0L).as("__vl_hops"))
      for (h <- 1 to maxH) {
        val frontier = dist.filter(col("__vl_hops") === (h - 1).toLong)
        val next = step
          .join(frontier.select(col("__vl_source"), col("__vl_node").as("src")),
            Seq("src"))
          .select(col("__vl_source"), col("dst").as("__vl_node"),
            lit(h.toLong).as("__vl_hops"))
        dist = dist.unionAll(next)
          .groupBy(col("__vl_source"), col("__vl_node"))
          .agg(min(col("__vl_hops")).as("__vl_hops"))
          .localCheckpoint()
      }
      dist.filter(col("__vl_hops") >= minH.toLong)
    }

    /** `MATCH p = (a)-[r:T*min..max]->(b)` — per-PATH var-length
      * binding (r12, closing the DISTINCT-endpoint gap): one output
      * row per relationship-unique path, Cypher's multiplicity. `p`
      * binds `array<struct<step, node_id>>` (the shortestPath shape,
      * so `nodes(p)` / `length(p)` / `relationships(p)` compose
      * unchanged); a named segment variable binds the path's
      * RELATIONSHIP LIST as `array<struct<src, dst, properties…>>` in
      * traversal order — the edge frame's property columns ride along
      * (r12b), so `UNWIND r AS e RETURN e.rating` path analytics work;
      * under an undirected segment a reversed traversal keeps the
      * stored edge's properties. Exactly one var-length segment is supported —
      * a mixed chain fails fast. Enumeration is frame-wise BFS keyed
      * on the bound head (one edge join + array-append per hop, no
      * driver state); path count is bounded by maxH and the
      * relationship-uniqueness filter (Cypher's own rule), which also
      * guarantees termination for any bounds. Under an UNDIRECTED
      * segment, uniqueness canonicalises each edge to (min, max)
      * endpoint order — stored twin edges (u→v AND v→u) count as one
      * relationship, marginally stricter than Neo4j on such graphs
      * (documented deviation; the engine's graphs store one row per
      * logical edge). */
    private def compilePathMatch(pm: PathMatch): Unit = {
      val c = pm.chain
      require(c.rest.length == 1 && c.rest.head._1.varLength.isDefined,
        "MATCH p = ... supports exactly one var-length segment " +
          "(a)-[r:T*min..max]->(b); for the single shortest path use " +
          "shortestPath((...))")
      bindNode(c.first)
      val head = c.first.v.getOrElse(
        sys.error("path pattern needs a named source node"))
      val (rel, node) = c.rest.head
      require(!structVars.contains(pm.pathVar),
        s"re-binding path variable '${pm.pathVar}' is unsupported")
      val paths = varLengthPathsEnum(
        df.select(col(head).getField("id").as("__vl_source")), rel)
      df = df.join(paths, col(head).getField("id") === col("__vl_source"))
      rel.v.foreach { rv =>
        require(!structVars.contains(rv),
          s"re-binding relationship variable '$rv' is unsupported")
        df = df.withColumn(rv, col("__vl_rels"))
        structVars += rv
      }
      df = df.withColumn(pm.pathVar, col("__vl_nodes"))
      structVars += pm.pathVar
      bindChainTarget(node, col("__vl_node")): Unit
      df = df.drop("__vl_source", "__vl_node", "__vl_hops", "__vl_rels",
        "__vl_nodes")
    }

    /** The per-path BFS core for [[compilePathMatch]]: given a frame of
      * source ids, one row per relationship-unique path within the hop
      * bounds — (__vl_source, __vl_node, __vl_hops, __vl_rels,
      * __vl_nodes). Each hop is one equi-join + an array-append; the
      * uniqueness check is an `array_contains` on the path's canonical
      * edge list (≤ maxH elements — a bounded scalar filter, not a
      * join), and lineage is cut per hop. */
    private def varLengthPathsEnum(sourcesRaw: DataFrame,
        rel: RelPat): DataFrame = {
      val (minH, maxH) = rel.varLength.get
      require(0 <= minH && minH <= maxH && maxH >= 1,
        s"bad var-length bounds *$minH..$maxH")
      // the full edge frame, traversal-direction adjusted WITH its
      // property columns (r12b): the rel-list elements carry the edge
      // properties, so `UNWIND r AS e RETURN e.rating` path analytics
      // work — reversal swaps src/dst and keeps properties (the edgeDf
      // undirected convention)
      val base = edgeFrame(rel.relType)
      def reversed = base.select(base.columns.map {
        case "src" => col("dst").as("src")
        case "dst" => col("src").as("dst")
        case c => col(c)
      }.toIndexedSeq: _*)
      val step =
        (if (rel.undirected) base.unionAll(reversed)
        else if (rel.leftToRight) base
        else reversed)
          .distinct().localCheckpoint()
      // src first, then dst, then properties — a stable rel-struct shape
      val relCols = "src" +: "dst" +: step.columns.filterNot(c =>
        c == "src" || c == "dst").toIndexedSeq
      val relStruct = struct(relCols.map(col): _*)
      val emptyRels = array().cast(org.apache.spark.sql.types.ArrayType(
        step.select(relCols.map(col): _*).schema))
      // canonical edge identity for the uniqueness rule: traversal
      // order for directed segments, (min, max) for undirected ones
      def canon(s: Column, d: Column): Column =
        if (rel.undirected) struct(least(s, d).as("src"), greatest(s, d).as("dst"))
        else struct(s.as("src"), d.as("dst"))
      val sources = sourcesRaw.toDF("__vl_source")
        .filter(col("__vl_source").isNotNull).distinct().localCheckpoint()
      var frontier = sources.select(
        col("__vl_source"), col("__vl_source").as("__vl_node"),
        lit(0L).as("__vl_hops"),
        emptyRels.as("__vl_rels"),
        array().cast("array<struct<src:bigint,dst:bigint>>").as("__vl_seen"),
        array(struct(lit(0).as("step"), col("__vl_source").as("node_id")))
          .as("__vl_nodes"))
      var all = frontier
      for (h <- 1 to maxH) {
        frontier = step
          .join(frontier.select(col("__vl_source"),
            col("__vl_node").as("src"), col("__vl_rels"), col("__vl_seen"),
            col("__vl_nodes")), Seq("src"))
          .filter(!array_contains(col("__vl_seen"), canon(col("src"), col("dst"))))
          .select(col("__vl_source"), col("dst").as("__vl_node"),
            lit(h.toLong).as("__vl_hops"),
            concat(col("__vl_rels"), array(relStruct)).as("__vl_rels"),
            concat(col("__vl_seen"),
              array(canon(col("src"), col("dst")))).as("__vl_seen"),
            concat(col("__vl_nodes"),
              array(struct(lit(h).as("step"), col("dst").as("node_id"))))
              .as("__vl_nodes"))
          .localCheckpoint()
        all = all.unionAll(frontier)
      }
      all.filter(col("__vl_hops") >= minH.toLong).drop("__vl_seen")
    }

    /** `MATCH p = shortestPath((a {id: s})-[:T*..k]-(b {id: t}))`:
      * endpoints must pin `id` to a literal/param (the idiom's shape —
      * anything else fails fast); lowers onto
      * [[graft.graph.Algorithms.shortestPathNodes]] — BFS waves with
      * the deterministic min-parent tie-break, then a depth-bounded
      * backtrack. `p` binds as an `array<struct<step, node_id>>`
      * column (`nodes(p)` yields it, `length(p)` = size − 1, UNWIND
      * explodes it); an unreachable pair matches ZERO rows, like
      * Cypher. This clause executes eagerly at compile time: the
      * backtrack is ≤ k single-row lookups, the only driver-side work
      * in the compiler. */
    private def compileShortestPath(sp: ShortestPath): Unit = {
      val c = sp.chain
      require(c.rest.length == 1,
        "shortestPath needs exactly (a)-[:T*..k]-(b)")
      val (rel, dstPat) = c.rest.head
      val (_, maxH) = rel.varLength.getOrElse(
        sys.error("shortestPath needs a var-length relationship (*..k)"))
      def idOf(n: NodePat, side: String): Long =
        n.props.collectFirst {
          case ("id", Lit(x)) => x
          case ("id", Param(p)) =>
            params.getOrElse(p, sys.error(s"missing param $$$p"))
        } match {
          case Some(v: Long) => v
          case Some(v: Int) => v.toLong
          case other => sys.error(
            s"shortestPath $side endpoint must pin {id: literal|param}, got $other")
        }
      val source = idOf(c.first, "source")
      val target = idOf(dstPat, "target")
      val dir0 = edgeFrame(rel.relType).select(col("src"), col("dst"))
      val prepared =
        if (rel.undirected)
          dir0.unionAll(dir0.select(col("dst").as("src"), col("src").as("dst")))
        else if (rel.leftToRight) dir0
        else dir0.select(col("dst").as("src"), col("src").as("dst"))
      val rows = graft.graph.Algorithms
        .shortestPathNodes(prepared, source, target, maxH)
        .collect() // ≤ maxH + 1 rows by construction
      val s = graphSpark
      if (rows.isEmpty) {
        val empty = array().cast("array<struct<step:int,node_id:bigint>>")
        df =
          if (df == null) s.range(0).select(empty.as(sp.pathVar))
          else df.limit(0).withColumn(sp.pathVar, empty)
      } else {
        val arr = array(rows.sortBy(_.getInt(0)).map(r =>
          struct(lit(r.getInt(0)).as("step"),
            lit(r.getLong(1)).as("node_id"))).toIndexedSeq: _*)
        df =
          if (df == null) s.range(1).select(arr.as(sp.pathVar))
          else df.withColumn(sp.pathVar, arr)
      }
      structVars += sp.pathVar
    }

    private def graphSpark: org.apache.spark.sql.SparkSession =
      (graph.nodes.values ++ graph.edges.values).headOption
        .map(_.sparkSession)
        .getOrElse(sys.error("empty graph: no session to plan on"))

    /** OPTIONAL MATCH: the whole pattern binds or every new variable is
      * NULL — the chain (edges + new nodes + their prop filters) joins
      * INTERNALLY first against the DISTINCT set of head ids, then
      * attaches to the frame with ONE left_outer keyed on the bound
      * head node. A null head (itself from an earlier OPTIONAL) joins
      * nothing and null-fills, which is exactly Cypher's cascade. Head
      * must be bound (the reference's only usage); WHERE inside
      * OPTIONAL is not supported. Var-length segments compile onto the
      * shared [[varLengthReachFrom]] BFS with the engine's
      * DISTINCT-endpoint contract: each (head, target) pair binds once
      * at its minimal hop distance, the segment variable carrying
      * `hops`; per-path row multiplicity stays out of scope, and a
      * query needing it fails at the binding site like everywhere
      * else (there is no relationship-LIST binding to fail here — the
      * segment var is the hops struct by construction). An attached
      * `where` filters the chain extension BEFORE the left_outer —
      * Cypher's semantics: a head whose matches are all filtered away
      * keeps its row, null-extended (a post-filter would drop it). The
      * predicate may reference the chain's NEW variables and (r11) the
      * HEAD's properties — the `WHERE b.year > a.year` idiom: the head
      * struct is carried into the extension next to its id seed (it is
      * functionally dependent on the id, so the distinct is unchanged)
      * and dropped again before the join back. Any OTHER pre-bound
      * variable still fails fast — the extension re-attaches on the
      * head alone, so non-head context would need a different join
      * shape. Comma-joined chains inside ONE OPTIONAL MATCH are a
      * SINGLE pattern (r11): Cypher's all-or-nothing rule — every
      * chain must bind (and the WHERE hold) for ANY of the new
      * variables to be non-null, so they compose into one extension
      * (each chain re-rooted at the shared head's id) and ONE
      * left_outer. Chains with different heads fail fast (the
      * re-attach key is the one head). */
    private def optionalChains(cs: Seq[Chain],
        where: Option[Expr] = None): Unit = {
      val heads = cs.map(_.first.v.getOrElse(
        sys.error("OPTIONAL MATCH needs a named, bound head node")))
      require(heads.distinct.length == 1,
        "multi-chain OPTIONAL MATCH must share ONE bound head, got " +
          heads.distinct.mkString(", "))
      val head = heads.head
      require(structVars.contains(head),
        s"OPTIONAL MATCH head '$head' must be bound by an earlier MATCH")
      cs.foreach { c =>
        require(c.first.props.isEmpty,
          "props on the bound head of an OPTIONAL MATCH are unsupported")
        require(c.rest.nonEmpty, "OPTIONAL MATCH needs a relationship pattern")
      }
      val carryHead = where.exists(e => exprVars(e).contains(head))
      // the chain extension starts from the distinct head-id frame, so
      // every segment kind (single hop, var-length) composes uniformly
      // and the frame is joined back exactly once
      var ext: DataFrame = df
        .select(col(head).getField("id").as("__opt_head") +:
          (if (carryHead) Seq(col(head)) else Nil): _*)
        .filter(col("__opt_head").isNotNull).distinct()
      var prevIdCol: Column = col("__opt_head")
      var newVars = List.empty[String]
      cs.foreach { c =>
      prevIdCol = col("__opt_head") // each chain re-roots at the head
      c.rest.foreach { case (rel, node) =>
        val v = node.v.getOrElse(freshName())
        require(!structVars.contains(v),
          s"re-binding '$v' inside OPTIONAL MATCH is unsupported")
        // comma-joined chains re-using one new variable would be a
        // same-node equality constraint in Cypher; unguarded it adds a
        // duplicate column and dies later as an opaque Spark
        // ambiguous-reference error — fail fast in-dialect instead
        require(!newVars.contains(v),
          s"shared non-head variable '$v' across OPTIONAL MATCH chains is unsupported")
        rel.v.foreach(rv => require(!newVars.contains(rv) && !structVars.contains(rv),
          s"shared relationship variable '$rv' across OPTIONAL MATCH chains is unsupported"))
        val label = node.label.getOrElse(
          sys.error(s"new node '$v' in a chain needs a :Label"))
        if (rel.varLength.isDefined) {
          val reach = varLengthReachFrom(ext.select(prevIdCol), rel)
          ext = ext.join(reach, prevIdCol === col("__vl_source"))
          rel.v.foreach { rv =>
            ext = ext.withColumn(rv, struct(col("__vl_hops").as("hops")))
            newVars ::= rv
            varTypes += rv -> rel.relType
          }
          ext = ext.join(nodeDf(label, v),
            col(v).getField("id") === col("__vl_node"))
            .drop("__vl_source", "__vl_node", "__vl_hops")
        } else {
          val rv = rel.v.getOrElse(freshName())
          val (fromField, toField) =
            if (rel.undirected || rel.leftToRight) ("src", "dst")
            else ("dst", "src")
          ext = ext.join(edgeDf(rel.relType, rv, rel.undirected),
            prevIdCol === col(rv).getField(fromField))
          newVars ::= rv
          varTypes += rv -> rel.relType
          ext = ext.join(nodeDf(label, v),
            col(v).getField("id") === col(rv).getField(toField))
        }
        node.props.foreach { case (k, e) =>
          ext = ext.filter(col(v).getField(k) === constCol(e))
        }
        newVars ::= v
        varLabels += v -> label
        prevIdCol = col(v).getField("id")
      }
      }
      where.foreach { e =>
        val foreign = exprVars(e) -- newVars.toSet - head
        require(foreign.isEmpty,
          "OPTIONAL MATCH WHERE may reference the head and this " +
            s"pattern's variables only; got ${foreign.mkString(", ")}")
        // type dispatch (string `+`, size()) must resolve against the
        // EXTENSION frame while this predicate compiles — against the
        // outer df, chain-local vars read as NullType and mis-dispatch
        typeFrame = Some(ext)
        try ext = ext.filter(col1(e)) finally typeFrame = None
      }
      if (carryHead) ext = ext.drop(head)
      df = df.join(ext, col(head).getField("id") === col("__opt_head"),
        "left_outer").drop("__opt_head")
      structVars ++= newVars
    }

    /** Variables an expression references (Prop targets + bare
      * identifiers) — compile-time analysis for the OPTIONAL MATCH
      * WHERE carry/fail-fast decision. */
    private def exprVars(e: Expr): Set[String] = e match {
      case Prop(v, _) => Set(v)
      case Ident(n) => Set(n)
      case Cmp(_, l, r) => exprVars(l) ++ exprVars(r)
      case And(l, r) => exprVars(l) ++ exprVars(r)
      case Or(l, r) => exprVars(l) ++ exprVars(r)
      case Not(x) => exprVars(x)
      case IsNull(x, _) => exprVars(x)
      case Arith(_, l, r) => exprVars(l) ++ exprVars(r)
      case Neg(x) => exprVars(x)
      case ListLit(items) => items.flatMap(exprVars).toSet
      // lambda-bound variables are NOT outer references
      case ListComp(v, l, w, proj) =>
        exprVars(l) ++
          ((w.toSeq ++ proj.toSeq).flatMap(exprVars).toSet - v)
      case ListQuant(_, v, l, p) => exprVars(l) ++ (exprVars(p) - v)
      case ReduceExpr(acc, init, v, l, step) =>
        exprVars(init) ++ exprVars(l) ++ (exprVars(step) - acc - v)
      case CaseExpr(whens, d) =>
        (whens.flatMap(w => exprVars(w._1) ++ exprVars(w._2)) ++
          d.toSeq.flatMap(exprVars)).toSet
      case Fn1(_, x) => exprVars(x)
      case FnN(_, args) => args.flatMap(exprVars).toSet
      case Agg(_, arg, _, arg2) =>
        (arg.toSeq ++ arg2.toSeq).flatMap(exprVars).toSet
      case PatPred(a, _, b) => Set(a, b)
      case _ => Set.empty // Lit, Param
    }

    /** Bind a standalone (chain-head) node: fresh frame, equi-join on
      * prop values referencing bound scalars, or filter when already
      * bound. */
    private def bindNode(n: NodePat): Unit = {
      val v = n.v.getOrElse(freshName())
      if (structVars.contains(v)) { applyProps(v, n.props); return }
      val label = n.label.getOrElse(sys.error(s"node '$v' needs a :Label"))
      varLabels += v -> label
      var nd = nodeDf(label, v)
      // literal/param props filter the node table BEFORE any join
      val (joinProps, filterProps) = n.props.partition {
        case (_, Ident(_)) => true
        case _ => false
      }
      filterProps.foreach { case (k, e) =>
        nd = nd.filter(col(v).getField(k) === constCol(e))
      }
      if (df == null) df = nd
      else if (joinProps.nonEmpty)
        // prop values referencing a bound scalar (e.g. {community:
        // communityId} after a WITH) are equi-join conditions, the
        // Cypher idiom for "index lookup by property"
        df = df.join(nd, joinProps.map { case (k, e) =>
          col(v).getField(k) === col1(e)
        }.reduce(_ && _))
      else df = df.crossJoin(nd)
      structVars += v
    }

    private def applyProps(v: String, props: Seq[(String, Expr)]): Unit =
      props.foreach { case (k, e) =>
        df = df.filter(col(v).getField(k) === col1(e))
      }

    private def constCol(e: Expr): Column = e match {
      case Param(p) => lit(params.getOrElse(p, sys.error(s"missing param $$$p")))
      case Lit(x) => lit(x)
      case other => sys.error(s"expected literal/param, got $other")
    }

    /** Conjunct-level predicate application: pattern predicates become
      * semi/anti joins, everything else a filter. */
    private def applyPredicate(e: Expr): Unit = e match {
      case And(l, r) => applyPredicate(l); applyPredicate(r)
      case Not(PatPred(a, t, b)) => df = patJoin(a, t, b, "left_anti")
      case PatPred(a, t, b) => df = patJoin(a, t, b, "left_semi")
      case other => df = df.filter(col1(other))
    }

    private def patJoin(a: String, relType: String, b: String,
        how: String): DataFrame = {
      val base = graph.edges.getOrElse(relType,
        sys.error(s"unknown relationship type :$relType"))
      val e = base.select(col("src").as("__pp_src"), col("dst").as("__pp_dst"))
      df.join(e, col(a).getField("id") === col("__pp_src") &&
        col(b).getField("id") === col("__pp_dst"), how)
    }

    /** An item containing an aggregate ANYWHERE is an aggregate item
      * (Cypher's grouping rule: group keys are the aggregate-free
      * items) — `count(*) * 1.0 / sum(x)` lands in the agg list and
      * Catalyst accepts the arithmetic around the AggregateExpressions. */
    private def isAgg(e: Expr): Boolean = e match {
      case _: Agg => true
      case Arith(_, l, r) => isAgg(l) || isAgg(r)
      case Neg(x) => isAgg(x)
      case Cmp(_, l, r) => isAgg(l) || isAgg(r)
      case And(l, r) => isAgg(l) || isAgg(r)
      case Or(l, r) => isAgg(l) || isAgg(r)
      case Not(x) => isAgg(x)
      case IsNull(x, _) => isAgg(x)
      case Fn1(_, x) => isAgg(x)
      case FnN(_, args) => args.exists(isAgg)
      case ListLit(items) => items.exists(isAgg)
      case ListComp(_, l, w, proj) =>
        isAgg(l) || w.exists(isAgg) || proj.exists(isAgg)
      case ListQuant(_, _, l, p) => isAgg(l) || isAgg(p)
      case ReduceExpr(_, init, _, l, step) =>
        isAgg(init) || isAgg(l) || isAgg(step)
      case CaseExpr(whens, d) =>
        whens.exists(w => isAgg(w._1) || isAgg(w._2)) || d.exists(isAgg)
      case _ => false
    }

    private def project(items: Seq[Item], distinct: Boolean,
        where: Option[Expr], order: Seq[Order], limit: Option[Long],
        skip: Option[Long] = None): Unit = {
      val named = items.map { it =>
        val name = it.alias.getOrElse(it.expr match {
          case Ident(n) => n
          case Prop(v, f) => f
          case other => sys.error(s"item $other needs an AS alias")
        })
        (name, it.expr)
      }
      val (aggs, keys) = named.partition(kv => isAgg(kv._2))
      if (aggs.nonEmpty) {
        val keyCols = keys.map { case (n, e) => col1(e).as(n) }
        // col1 compiles composite aggregate items (`sum(x) * 1.0 /
        // count(*)`) — Catalyst accepts arithmetic around the
        // AggregateExpressions inside .agg
        val aggCols = aggs.map { case (n, e) => col1(e).as(n) }
        df = df.groupBy(keyCols: _*).agg(aggCols.head, aggCols.tail: _*)
      } else {
        df = df.select(named.map { case (n, e) => col1(e).as(n) }: _*)
      }
      structVars = named.collect {
        case (n, Ident(v)) if structVars.contains(v) => n
        case (n, Agg("collect", _, _, _)) => n
      }.toSet
      // provenance survives a WITH only for carried variables
      varLabels = named.collect {
        case (n, Ident(v)) if varLabels.contains(v) => n -> varLabels(v)
      }.toMap
      varTypes = named.collect {
        case (n, Ident(v)) if varTypes.contains(v) => n -> varTypes(v)
      }.toMap
      if (distinct) df = df.distinct()
      where.foreach(e => df = df.filter(col1(e)))
      if (order.nonEmpty)
        df = df.orderBy(order.map(o =>
          if (o.asc) col1(o.expr).asc else col1(o.expr).desc): _*)
      // Cypher SKIP n LIMIT m = rows n+1..n+m; Dataset.offset composes
      // with limit exactly that way (Limit over Offset in the plan).
      // Both Dataset methods take Int — fail loudly on a >2³¹ count
      // instead of silently truncating it
      skip.foreach { n =>
        require(n <= Int.MaxValue,
          s"SKIP $n exceeds Int.MaxValue (Dataset.offset bound)")
        df = df.offset(n.toInt)
      }
      limit.foreach { n =>
        require(n <= Int.MaxValue,
          s"LIMIT $n exceeds Int.MaxValue (Dataset.limit bound)")
        df = df.limit(n.toInt)
      }
    }

    /** The scalar-function whitelist (names arrive lowercased). Every
      * entry lowers to a codegen'd built-in — no UDFs — and unknown
      * names fail fast with the arity, never silently null. */
    private def fnCol(fn: String, args: Seq[Expr]): Column = (fn, args) match {
      case ("tolower", Seq(x)) => lower(col1(x))
      case ("toupper", Seq(x)) => upper(col1(x))
      case ("trim", Seq(x)) => trim(col1(x))
      case ("ltrim", Seq(x)) => ltrim(col1(x))
      case ("rtrim", Seq(x)) => rtrim(col1(x))
      // string or list — Spark's reverse handles both
      case ("reverse", Seq(x)) => reverse(col1(x))
      case ("tostring", Seq(x)) => col1(x).cast("string")
      case ("tointeger", Seq(x)) => col1(x).cast("bigint")
      case ("tofloat", Seq(x)) => col1(x).cast("double")
      case ("abs", Seq(x)) => abs(col1(x))
      case ("round", Seq(x)) => round(col1(x), 0)
      case ("round", Seq(x, Lit(n: Long))) => round(col1(x), n.toInt)
      case ("ceil", Seq(x)) => ceil(col1(x))
      case ("floor", Seq(x)) => floor(col1(x))
      case ("sqrt", Seq(x)) => sqrt(col1(x))
      case ("sign", Seq(x)) => signum(col1(x)).cast("bigint")
      case ("exp", Seq(x)) => exp(col1(x))
      case ("log", Seq(x)) => log(col1(x))
      case ("log10", Seq(x)) => log10(col1(x))
      // size(): list → element count, string → char count, picked by
      // the resolved type (collect() inside an agg item is a list)
      case ("size", Seq(x)) =>
        val c = col1(x)
        if (isAgg(x)) size(c).cast("bigint")
        else dtypeOf(c) match {
          case _: org.apache.spark.sql.types.ArrayType => size(c).cast("bigint")
          case _: org.apache.spark.sql.types.StringType => length(c).cast("bigint")
          case other => sys.error(s"size() needs a list or string, got $other")
        }
      case ("head", Seq(x)) => element_at(col1(x), 1)
      case ("last", Seq(x)) => element_at(col1(x), -1)
      case ("coalesce", as) if as.nonEmpty => coalesce(as.map(col1): _*)
      // Cypher substring is 0-based; Column.substr is 1-based
      case ("substring", Seq(x, st)) =>
        col1(x).substr(col1(st).cast("int") + lit(1), lit(Int.MaxValue))
      case ("substring", Seq(x, st, ln)) =>
        col1(x).substr(col1(st).cast("int") + lit(1), col1(ln).cast("int"))
      case ("replace", Seq(x, a, b)) => replace(col1(x), col1(a), col1(b))
      // Cypher split is a LITERAL delimiter; Spark's is a regex — quote
      case ("split", Seq(x, Lit(d: String))) =>
        split(col1(x), java.util.regex.Pattern.quote(d))
      case ("left", Seq(x, n)) =>
        col1(x).substr(lit(1), col1(n).cast("int"))
      case ("right", Seq(x, n)) =>
        val c = col1(x); val k = col1(n).cast("int")
        c.substr(greatest(length(c) - k + lit(1), lit(1)), k)
      // range(a, b[, step]) — inclusive both ends, like Cypher. Spark
      // sequence(a, b) AUTO-DESCENDS when a > b; Cypher's default step
      // is +1 and range(3, 1) is the EMPTY list — guard the two-arg
      // form. Three-arg keeps sequence semantics (explicit negative
      // step descends in both engines).
      // null bound → null (Cypher: range(null, x) IS NULL, not []):
      // neither `when` matches under a null comparison, so the chain
      // falls through to its implicit null — no explicit guard needed
      case ("range", Seq(a, b)) =>
        val (ac, bc) = (col1(a), col1(b))
        when(ac <= bc, sequence(ac, bc))
          .when(ac > bc, array().cast("array<bigint>"))
      case ("range", Seq(a, b, st)) => sequence(col1(a), col1(b), col1(st))
      // labels(v) / type(r): each binding names its frame, so both fold
      // to literals at compile time — but stay NULL-correct under the
      // OPTIONAL MATCH cascade (an unmatched row's var is null, and
      // Cypher's labels(null)/type(null) is null)
      case ("labels", Seq(Ident(v))) =>
        val label = varLabels.getOrElse(v,
          sys.error(s"labels(): '$v' is not a labelled node variable"))
        when(col(v).isNotNull, array(lit(label)))
      case ("type", Seq(Ident(v))) =>
        val t = varTypes.getOrElse(v,
          sys.error(s"type(): '$v' is not a relationship variable"))
        when(col(v).isNotNull, lit(t))
      case _ => sys.error(s"unsupported function $fn/${args.length}")
    }

    private def aggCol(a: Agg): Column = {
      // the fail-fast whitelist philosophy applies to MODIFIERS too:
      // DISTINCT on an aggregate that ignores it, or a second argument
      // on a one-arg aggregate, must error — not return plausible
      // numbers for a query the engine didn't actually run
      require(!a.distinct ||
        Set("count", "avg", "sum", "collect").contains(a.fn),
        s"DISTINCT is unsupported for aggregate ${a.fn}()")
      require(a.arg2.isEmpty || a.fn == "percentilecont",
        s"${a.fn}() takes one argument")
      (a.fn, a.arg) match {
      case ("count", None) => count(lit(1))
      case ("count", Some(e)) if a.distinct => count_distinct(col1(e))
      case ("count", Some(e)) => count(col1(e))
      // avg(DISTINCT) as the exact quotient of its distinct parts —
      // nulls drop from both factors, matching Cypher/SQL
      case ("avg", Some(e)) if a.distinct =>
        sum_distinct(col1(e)) / count_distinct(col1(e))
      case ("avg", Some(e)) => avg(col1(e))
      case ("sum", Some(e)) if a.distinct => sum_distinct(col1(e))
      case ("sum", Some(e)) => sum(col1(e))
      case ("min", Some(e)) => min(col1(e))
      case ("max", Some(e)) => max(col1(e))
      // collect(DISTINCT): Cypher leaves the order undefined; compile
      // to the canonical sorted form so replays are deterministic
      case ("collect", Some(e)) if a.distinct =>
        array_sort(collect_set(col1(e)))
      case ("collect", Some(e)) => collect_list(col1(e))
      case ("stdev", Some(e)) => stddev_samp(col1(e))
      case ("stdevp", Some(e)) => stddev_pop(col1(e))
      // exact interpolated percentile (SQL PERCENTILE_CONT / DuckDB
      // quantile_cont semantics — one sort-based aggregate, mergeable)
      case ("percentilecont", Some(e)) =>
        val p = a.arg2.getOrElse(sys.error("percentileCont(x, p) needs p"))
        percentile(col1(e), constCol(p))
      case other => sys.error(s"unsupported aggregate $other")
      }
    }

    /** The frame [[dtypeOf]] resolves against — normally the main `df`;
      * [[optionalChain]] pins it to the chain EXTENSION while the
      * attached WHERE compiles (ADVICE r10: chain-local vars don't
      * exist on the outer frame, so `+`/size() would mis-dispatch on a
      * NullType read). */
    private var typeFrame: Option[DataFrame] = None

    /** Resolved type of a compiled column against the CURRENT frame —
      * pure analysis (no job). NullType when unresolvable (e.g. the
      * column contains an aggregate, selectable only through groupBy). */
    private def dtypeOf(c: Column): org.apache.spark.sql.types.DataType =
      scala.util.Try(typeFrame.getOrElse(df).select(c).schema.head.dataType)
        .getOrElse(org.apache.spark.sql.types.NullType)

    private def isStringy(c: Column): Boolean =
      dtypeOf(c).isInstanceOf[org.apache.spark.sql.types.StringType]

    /** Lambda bindings for list-expression variables (comprehensions,
      * quantifiers, reduce) — consulted by col1 before frame columns,
      * innermost binding wins, restored on exit (nesting composes). */
    private var lambdaEnv: Map[String, Column] = Map.empty
    private def withLambda[A](bs: (String, Column)*)(body: => A): A = {
      val saved = lambdaEnv
      lambdaEnv = lambdaEnv ++ bs
      try body finally lambdaEnv = saved
    }

    private def col1(e: Expr): Column = e match {
      case Prop(v, f) if lambdaEnv.contains(v) => lambdaEnv(v).getField(f)
      case Prop(v, f) => col(v).getField(f)
      case Ident(n) if lambdaEnv.contains(n) => lambdaEnv(n)
      case Ident(n) => col(n)
      // list expressions — native Catalyst higher-order functions (no
      // UDFs): the lambda body compiles through the SAME col1 with the
      // element column bound, so the full scalar whitelist (and outer
      // row columns) work inside
      case ListComp(v, l, w, proj) =>
        val base = col1(l)
        val filtered = w.map(p =>
          filter(base, (x: Column) => withLambda(v -> x)(col1(p))))
          .getOrElse(base)
        proj.map(pr =>
          transform(filtered, (x: Column) => withLambda(v -> x)(col1(pr))))
          .getOrElse(filtered)
      case ListQuant(q, v, l, p) =>
        val lc = col1(l)
        def pred(x: Column) = withLambda(v -> x)(col1(p))
        q match {
          case "any" => exists(lc, pred _)
          case "all" => forall(lc, pred _)
          case "none" => !exists(lc, pred _)
          case "single" => size(filter(lc, pred _)) === 1
          case other => sys.error(s"unsupported quantifier $other")
        }
      case ReduceExpr(acc, init, v, l, step) =>
        aggregate(col1(l), col1(init),
          (a: Column, x: Column) =>
            withLambda(acc -> a, v -> x)(col1(step)))
      case Param(p) => lit(params.getOrElse(p, sys.error(s"missing param $$$p")))
      case Lit(x) => lit(x)
      case Cmp("=", l, r) => col1(l) === col1(r)
      case Cmp("<>", l, r) => col1(l) =!= col1(r)
      case Cmp("<", l, r) => col1(l) < col1(r)
      case Cmp("<=", l, r) => col1(l) <= col1(r)
      case Cmp(">", l, r) => col1(l) > col1(r)
      case Cmp(">=", l, r) => col1(l) >= col1(r)
      case Cmp("startsWith", l, r) => col1(l).startsWith(col1(r))
      case Cmp("endsWith", l, r) => col1(l).endsWith(col1(r))
      case Cmp("contains", l, r) => col1(l).contains(col1(r))
      // `x IN list` over both list literals and bound list columns —
      // array_contains codegens either way
      case Cmp("in", l, r) => array_contains(col1(r), col1(l))
      case Cmp("regex", l, r) => r match {
        // Cypher `=~` matches the WHOLE string — anchor the pattern
        // (rlike alone is a substring search)
        case Lit(p: String) => col1(l).rlike("^(?:" + p + ")$")
        case other => sys.error(s"=~ needs a string-literal pattern, got $other")
      }
      case And(l, r) => col1(l) && col1(r)
      case Or(l, r) => col1(l) || col1(r)
      case Not(x) => !col1(x)
      case IsNull(x, false) => col1(x).isNull
      case IsNull(x, true) => col1(x).isNotNull
      case Arith(op, l, r) =>
        val lc = col1(l); val rc = col1(r)
        op match {
          // Cypher `+` concatenates when either side is a string —
          // resolved from the frame's schema at compile time
          case "+" if isStringy(lc) || isStringy(rc) =>
            concat(lc.cast("string"), rc.cast("string"))
          case "+" => lc + rc
          case "-" => lc - rc
          case "*" => lc * rc
          // true division (double), Spark's and DuckDB's shared `/`
          // semantics; Neo4j's int/int truncation is NOT reproduced —
          // use toInteger(a / b) to ask for it explicitly
          case "/" => lc / rc
          case "%" => lc % rc
        }
      case Neg(x) => negate(col1(x))
      case ListLit(items) => array(items.map(col1): _*)
      case CaseExpr(whens, dflt) =>
        val head = when(col1(whens.head._1), col1(whens.head._2))
        val chained = whens.tail.foldLeft(head) { (acc, wt) =>
          acc.when(col1(wt._1), col1(wt._2))
        }
        dflt.map(d => chained.otherwise(col1(d))).getOrElse(chained)
      case FnN(fn, args) => fnCol(fn, args)
      case Fn1("length", x) => size(col1(x)) - 1
      case Fn1("relationships", x) =>
        // relationships(p) over a shortestPath binding: the path's
        // relationship sequence derived by zipping consecutive node
        // structs — array<struct<src, dst>>, size = length(p), empty
        // for a zero-hop path. The path IS concrete (one shortest
        // path, deterministic tie-break), so the rel list is exact —
        // no per-path multiplicity involved.
        {
          val a = col1(x)
          val n = greatest(size(a) - 1, lit(0))
          zip_with(
            slice(a, lit(1), n), slice(a, lit(2), n),
            (s, d) => struct(s.getField("node_id").as("src"),
              d.getField("node_id").as("dst")))
        }
      case Fn1(fn, _) => sys.error(s"unsupported function $fn()")
      case _: PatPred => sys.error(
        "pattern predicate only supported as a top-level WHERE conjunct")
      case a: Agg => aggCol(a)
      case Cmp(op, _, _) => sys.error(s"unsupported operator $op")
    }
  }
}
