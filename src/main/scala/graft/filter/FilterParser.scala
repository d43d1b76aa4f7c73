package graft.filter

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Parser for the reference's scalar filter expression language.
  *
  * The reference passes filter strings verbatim to the server (see
  * /root/reference/aiotcvectordb/client/stub.py:524 `filter` params and
  * tests/test_documents/test_documents_filters.py — e.g. `tag="a"`).
  * The documented grammar (Tencent VectorDB public docs) is:
  *
  *   expr    := or
  *   or      := and ( "or" and )*
  *   and     := unary ( "and" unary )*
  *   unary   := "not" unary | "(" expr ")" | pred
  *   pred    := ident cmp literal
  *            | ident ["not"] "in" "(" literal ("," literal)* ")"
  *            | ident ("include" | "exclude" | "include_all") "(" ... ")"
  *   cmp     := "=" | "!=" | ">" | ">=" | "<" | "<="
  *
  * `include`  — array field contains ANY of the listed values
  * `exclude`  — array field contains NONE of the listed values
  * `include_all` — array field contains ALL of the listed values
  *
  * Compiles to a Catalyst [[Column]] (never string-concatenated SQL), so
  * predicates participate in pushdown/pruning and injection is impossible.
  */
object FilterParser {

  def parse(filter: String): Column = {
    if (filter == null || filter.trim.isEmpty) lit(true)
    else new Parser(tokenize(filter)).parseAll()
  }

  // ---------------------------------------------------------------- lexer
  sealed trait Tok
  final case class Ident(s: String) extends Tok
  final case class Str(s: String) extends Tok
  final case class Num(s: String) extends Tok
  final case class Sym(s: String) extends Tok // operators and punctuation
  final case class Kw(s: String) extends Tok  // and or not in include exclude include_all

  private val keywords = Set("and", "or", "not", "in", "include", "exclude", "include_all", "true", "false")

  private[filter] def tokenize(s: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '(' || c == ')' || c == ',') { out += Sym(c.toString); i += 1 }
      else if (c == '"' || c == '\'') {
        val quote = c
        val sb = new StringBuilder
        i += 1
        var closed = false
        while (i < n && !closed) {
          val d = s.charAt(i)
          if (d == '\\' && i + 1 < n) { sb.append(s.charAt(i + 1)); i += 2 }
          else if (d == quote) { closed = true; i += 1 }
          else { sb.append(d); i += 1 }
        }
        require(closed, s"unterminated string literal in filter: $s")
        out += Str(sb.toString)
      }
      else if (c == '!' || c == '<' || c == '>' || c == '=') {
        if (i + 1 < n && s.charAt(i + 1) == '=') { out += Sym(s.substring(i, i + 2)); i += 2 }
        else { out += Sym(c.toString); i += 1 }
      }
      else if (c.isDigit || (c == '-' && i + 1 < n && s.charAt(i + 1).isDigit)) {
        val start = i
        i += 1
        while (i < n && (s.charAt(i).isDigit || s.charAt(i) == '.' || s.charAt(i) == 'e' ||
          s.charAt(i) == 'E' || ((s.charAt(i) == '-' || s.charAt(i) == '+') &&
            (s.charAt(i - 1) == 'e' || s.charAt(i - 1) == 'E')))) i += 1
        out += Num(s.substring(start, i))
      }
      else if (c.isLetter || c == '_') {
        val start = i
        while (i < n && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_' || s.charAt(i) == '.')) i += 1
        val word = s.substring(start, i)
        if (keywords.contains(word.toLowerCase)) out += Kw(word.toLowerCase) else out += Ident(word)
      }
      else throw new IllegalArgumentException(s"unexpected character '$c' at $i in filter: $s")
    }
    out.result()
  }

  // --------------------------------------------------------------- parser
  private final class Parser(toks: Vector[Tok]) {
    private var pos = 0
    private def peek: Option[Tok] = if (pos < toks.length) Some(toks(pos)) else None
    private def next(): Tok = {
      if (pos >= toks.length) fail("unexpected end of filter")
      val t = toks(pos); pos += 1; t
    }
    private def expect(sym: String): Unit = next() match {
      case Sym(`sym`) => ()
      case other => fail(s"expected '$sym' but found $other")
    }
    private def fail(msg: String): Nothing = throw new IllegalArgumentException(s"filter parse error: $msg")

    def parseAll(): Column = {
      val c = parseOr()
      if (pos != toks.length) fail(s"trailing tokens after position $pos")
      c
    }

    private def parseOr(): Column = {
      var left = parseAnd()
      while (peek.contains(Kw("or"))) { next(); left = left.or(parseAnd()) }
      left
    }

    private def parseAnd(): Column = {
      var left = parseUnary()
      while (peek.contains(Kw("and"))) { next(); left = left.and(parseUnary()) }
      left
    }

    private def parseUnary(): Column = peek match {
      case Some(Kw("not")) => next(); !parseUnary()
      case Some(Sym("(")) => next(); val c = parseOr(); expect(")"); c
      case _ => parsePredicate()
    }

    private def parsePredicate(): Column = {
      val field = next() match {
        case Ident(name) => col(name)
        case Kw("true") => return lit(true)
        case Kw("false") => return lit(false)
        case other => fail(s"expected field name, found $other")
      }
      next() match {
        case Sym("=")  => field === parseLiteral()
        case Sym("!=") => field =!= parseLiteral()
        case Sym(">")  => field > parseLiteral()
        case Sym(">=") => field >= parseLiteral()
        case Sym("<")  => field < parseLiteral()
        case Sym("<=") => field <= parseLiteral()
        case Kw("in") => field.isin(parseList(): _*)
        case Kw("not") => next() match {
          case Kw("in") => !field.isin(parseList(): _*)
          case other => fail(s"expected 'in' after 'not', found $other")
        }
        // array semantics: include=ANY, exclude=NONE, include_all=ALL
        case Kw("include") =>
          arrays_overlap(field, array(parseList().map(lit): _*))
        case Kw("exclude") =>
          !arrays_overlap(field, array(parseList().map(lit): _*))
        case Kw("include_all") =>
          size(array_except(array(parseList().map(lit): _*), field)) === 0
        case other => fail(s"expected operator after field, found $other")
      }
    }

    private def parseLiteral(): Any = next() match {
      case Str(s) => s
      case Num(s) => if (s.matches("-?\\d+")) s.toLong else s.toDouble
      case Kw("true") => true
      case Kw("false") => false
      case other => fail(s"expected literal, found $other")
    }

    private def parseList(): Seq[Any] = {
      expect("(")
      val items = Seq.newBuilder[Any]
      items += parseLiteral()
      while (peek.contains(Sym(","))) { next(); items += parseLiteral() }
      expect(")")
      items.result()
    }
  }
}
