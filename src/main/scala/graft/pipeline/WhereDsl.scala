package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's `where` filter runs a Rhai script per post
  * (main.rs:1952-1971, an interpreter invoked row by row). Here the same
  * surface syntax compiles ONCE to a Catalyst Column, so the predicate
  * runs inside whole-stage codegen — no per-row interpreter, and
  * Catalyst can push the compiled predicate into the scan.
  *
  * Supported: identifiers (mapped to columns), numeric & string
  * literals, comparison ops, `&&` `||` `!`, parentheses, `+ - * /`.
  * Example: `likeCount > 10 && lang == "en"`.
  */
object WhereDsl {

  def compile(src: String, cols: Map[String, Column]): Column = {
    val p = new Parser(tokenize(src), cols)
    val out = p.parseOr()
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
        } else if ("()<>!+-*/".contains(c)) { out += Op(c.toString); i += 1 }
        else throw new IllegalArgumentException(s"bad char '$c' in: $src")
      }
    }
    out.toList
  }

  // --- recursive-descent parser over precedence levels ---
  private class Parser(var toks: List[Tok], cols: Map[String, Column]) {
    private def peek: Option[Tok] = toks.headOption
    private def eat(): Tok = {
      require(toks.nonEmpty, "unexpected end of expression (unbalanced parenthesis?)")
      val t = toks.head; toks = toks.tail; t
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
        case _ => go = false
      }
      l
    }
    private def parseUnary(): Column = peek match {
      case Some(Op("!")) => eat(); !parseUnary()
      case Some(Op("-")) => eat(); -parseUnary()
      case Some(Op("(")) =>
        eat(); val e = parseOr()
        require(eat() == Op(")"), "expected )")
        e
      case Some(Num(v)) => eat(); lit(v)
      case Some(Str(v)) => eat(); lit(v)
      case Some(Ident(v)) =>
        eat()
        cols.getOrElse(v, throw new IllegalArgumentException(s"unknown field $v"))
      case other => throw new IllegalArgumentException(s"unexpected $other")
    }
  }
}
