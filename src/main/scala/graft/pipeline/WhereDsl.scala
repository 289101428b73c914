package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's `where` filter runs a Rhai script per post
  * (main.rs:1952-1971, an interpreter invoked row by row). Here the same
  * surface syntax compiles ONCE to a Catalyst Column, so the predicate
  * runs inside whole-stage codegen — no per-row interpreter, and
  * Catalyst can push the compiled predicate into the scan.
  *
  * Supported surface (the scope the reference pushes is scalar post
  * fields + `lang` + running `score`, main.rs:2596):
  *   - identifiers (mapped to columns), numeric & string literals,
  *     `true`/`false`, comparison ops, `&&` `||` `!`, parentheses,
  *     `+ - * / %`;
  *   - Rhai string methods as postfix calls: `text.contains("x")`,
  *     `text.starts_with("x")`, `text.ends_with("x")`, `text.len()`,
  *     `text.to_lower()` / `to_lowercase`, `text.to_upper()` /
  *     `to_uppercase`, `text.trim()`, `text.index_of("x")` (−1 when
  *     absent, Rhai semantics);
  *   - `x in coll`: membership — `array_contains` when `coll` is a
  *     declared array field, substring containment otherwise (both
  *     Rhai `in` meanings);
  *   - conditionals: Rhai `if c { a } else { b }` expressions and the
  *     `c ? a : b` shorthand, compiled to `CASE WHEN`.
  *
  * Anything outside this surface still fails LOUDLY at compile time —
  * a truncated parse must never silently weaken a filter.
  *
  * Example: `likeCount > 10 && lang == "en" && text.contains("spark")`.
  */
object WhereDsl {

  def compile(src: String, cols: Map[String, Column]): Column =
    compile(src, cols, Set.empty)

  /** `arrayFields` names the identifiers bound to ARRAY columns so
    * `in` can pick `array_contains` over substring containment.
    */
  def compile(src: String, cols: Map[String, Column], arrayFields: Set[String]): Column = {
    val p = new Parser(tokenize(src), cols, arrayFields)
    val out = p.parseExpr()
    require(
      p.toks.isEmpty,
      s"trailing tokens ${p.toks.take(3)} in: $src — a truncated parse would silently weaken the filter")
    out
  }

  // --- lexer ---
  private sealed trait Tok
  private case class Num(v: Double) extends Tok
  private case class Str(v: String) extends Tok
  private case class Ident(v: String) extends Tok
  private case class Op(v: String) extends Tok

  private def tokenize(src: String): List[Tok] = {
    val out = scala.collection.mutable.ListBuffer[Tok]()
    var i = 0
    while (i < src.length) {
      val c = src(i)
      if (c.isWhitespace) i += 1
      else if (c.isDigit || (c == '.' && i + 1 < src.length && src(i + 1).isDigit)) {
        val j = src.indexWhere(ch => !(ch.isDigit || ch == '.'), i)
        val end = if (j < 0) src.length else j
        out += Num(src.substring(i, end).toDouble); i = end
      } else if (c == '"') {
        val end = src.indexOf('"', i + 1)
        require(end > 0, s"unterminated string in: $src")
        out += Str(src.substring(i + 1, end)); i = end + 1
      } else if (c.isLetter || c == '_') {
        val j = src.indexWhere(ch => !(ch.isLetterOrDigit || ch == '_'), i)
        val end = if (j < 0) src.length else j
        out += Ident(src.substring(i, end)); i = end
      } else {
        val two = if (i + 1 < src.length) src.substring(i, i + 2) else ""
        if (Set("&&", "||", "==", "!=", ">=", "<=").contains(two)) {
          out += Op(two); i += 2
        } else if ("()<>!+-*/%{}?:.,".contains(c)) { out += Op(c.toString); i += 1 }
        else throw new IllegalArgumentException(s"bad char '$c' in: $src")
      }
    }
    out.toList
  }

  // --- recursive-descent parser over precedence levels ---
  private class Parser(var toks: List[Tok], cols: Map[String, Column], arrayFields: Set[String]) {
    private def peek: Option[Tok] = toks.headOption
    private def eat(): Tok = {
      require(toks.nonEmpty, "unexpected end of expression (unbalanced parenthesis?)")
      val t = toks.head; toks = toks.tail; t
    }
    private def expect(t: Tok, what: String): Unit =
      require(eat() == t, s"expected $what")

    /** Entry: ternary `?:` sits below `||` (C/Rhai precedence). */
    def parseExpr(): Column = {
      val c = parseOr()
      if (peek.contains(Op("?"))) {
        eat()
        val a = parseExpr()
        expect(Op(":"), ":")
        val b = parseExpr()
        when(c, a).otherwise(b)
      } else c
    }

    def parseOr(): Column = {
      var l = parseAnd()
      while (peek.contains(Op("||"))) { eat(); l = l || parseAnd() }
      l
    }
    private def parseAnd(): Column = {
      var l = parseCmp()
      while (peek.contains(Op("&&"))) { eat(); l = l && parseCmp() }
      l
    }
    private def parseCmp(): Column = {
      val l = parseAdd()
      peek match {
        case Some(Op(o)) if Set("==", "!=", ">", "<", ">=", "<=").contains(o) =>
          eat()
          val r = parseAdd()
          o match {
            case "==" => l === r
            case "!=" => l =!= r
            case ">" => l > r
            case "<" => l < r
            case ">=" => l >= r
            case "<=" => l <= r
          }
        case Some(Ident("in")) =>
          // Rhai `in`: array membership when the rhs RESOLVES to a
          // declared array field — decided from the tokens the rhs
          // parse actually consumed (parens stripped), not a one-token
          // peek: `"x" in (tags)` is membership too. Any OTHER rhs
          // expression that touches an array field (indexing,
          // concatenation, …) is rejected loudly — falling through to
          // string Contains on an array column would either fail
          // analysis or silently compile substring semantics the
          // author meant as membership.
          eat()
          val before = toks
          val r = parseAdd()
          val consumed = before.take(before.length - toks.length)
          val core = consumed.filter(t => t != Op("(") && t != Op(")"))
          core match {
            case List(Ident(n)) if arrayFields.contains(n) => array_contains(r, l)
            case _ if core.exists {
                  case Ident(n) => arrayFields.contains(n)
                  case _ => false
                } =>
              throw new IllegalArgumentException(
                "`in` rhs must be a bare array column (or a string expression): " +
                  s"got ${consumed.mkString(" ")}")
            case _ => r.contains(l)
          }
        case _ => l
      }
    }
    private def parseAdd(): Column = {
      var l = parseMul()
      var go = true
      while (go) peek match {
        case Some(Op("+")) => eat(); l = l + parseMul()
        case Some(Op("-")) => eat(); l = l - parseMul()
        case _ => go = false
      }
      l
    }
    private def parseMul(): Column = {
      var l = parseUnary()
      var go = true
      while (go) peek match {
        case Some(Op("*")) => eat(); l = l * parseUnary()
        case Some(Op("/")) => eat(); l = l / parseUnary()
        case Some(Op("%")) => eat(); l = l % parseUnary()
        case _ => go = false
      }
      l
    }
    private def parseUnary(): Column = postfix(parsePrimary())

    private def parsePrimary(): Column = peek match {
      case Some(Op("!")) => eat(); !parseUnary()
      case Some(Op("-")) => eat(); -parseUnary()
      case Some(Op("(")) =>
        eat(); val e = parseExpr()
        expect(Op(")"), ")")
        e
      case Some(Ident("if")) =>
        // Rhai if-EXPRESSION: `if c { a } else { b }` (else mandatory —
        // an if without else is a statement, not a value)
        eat()
        val c = parseExpr()
        expect(Op("{"), "{ after if condition")
        val a = parseExpr()
        expect(Op("}"), "} after then-branch")
        expect(Ident("else"), "else (if-expressions need both branches)")
        val b = peek match {
          case Some(Ident("if")) => parsePrimary() // else-if chain
          case _ =>
            expect(Op("{"), "{ after else")
            val x = parseExpr()
            expect(Op("}"), "} after else-branch")
            x
        }
        when(c, a).otherwise(b)
      case Some(Ident("true")) => eat(); lit(true)
      case Some(Ident("false")) => eat(); lit(false)
      case Some(Num(v)) => eat(); lit(v)
      case Some(Str(v)) => eat(); lit(v)
      case Some(Ident(v)) =>
        eat()
        cols.getOrElse(v, throw new IllegalArgumentException(s"unknown field $v"))
      case other => throw new IllegalArgumentException(s"unexpected $other")
    }

    /** Postfix method calls — the Rhai string API, compiled to native
      * codegen'd string expressions.
      */
    private def postfix(base: Column): Column = {
      var l = base
      while (peek.contains(Op("."))) {
        eat()
        val name = eat() match {
          case Ident(n) => n
          case other => throw new IllegalArgumentException(s"expected method name after '.', got $other")
        }
        val args = scala.collection.mutable.ListBuffer[Column]()
        if (peek.contains(Op("("))) {
          eat()
          if (!peek.contains(Op(")"))) {
            args += parseExpr()
            while (peek.contains(Op(","))) { eat(); args += parseExpr() }
          }
          expect(Op(")"), ") after method arguments")
        }
        def one(f: (Column, Column) => Column): Column = {
          require(args.length == 1, s"$name takes exactly one argument")
          f(l, args.head)
        }
        def zero(f: Column => Column): Column = {
          require(args.isEmpty, s"$name takes no arguments")
          f(l)
        }
        l = name match {
          case "contains" => one(_.contains(_))
          case "starts_with" => one(_.startsWith(_))
          case "ends_with" => one(_.endsWith(_))
          case "len" => zero(length)
          case "to_lower" | "to_lowercase" => zero(lower)
          case "to_upper" | "to_uppercase" => zero(upper)
          case "trim" => zero(trim)
          // Rhai index_of: 0-based, −1 when absent; Spark instr is
          // 1-based with 0 when absent
          case "index_of" => one((s, sub) => instr(s, sub) - lit(1))
          case other =>
            throw new IllegalArgumentException(
              s"unsupported method .$other — supported: contains, starts_with, ends_with, " +
                "len, to_lower(case), to_upper(case), trim, index_of")
        }
      }
      l
    }
  }
}
