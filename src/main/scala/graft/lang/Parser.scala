package graft.lang

/** Surface syntax for the `Lang` AST — the analog of the reference's
  * comprehension notation (fiat2/src/fiat2/Notations.v:31-150). The grammar
  * mirrors the notation forms and their Coq precedence levels (lower level =
  * tighter binding: `* / %` at 40 under `+ -` at 50, `::` at 55 right-assoc,
  * `++ +++` at 60, `< ==` at 70, `&&` 80, `||` 90, binder forms at 99-100):
  *
  * {{{
  * commands:    skip | c1 ; c2 | let x = e in c | let mut x := e in c
  *            | set x := e | if e then c1 else c2 end | for x in e : c end
  * expressions: x <- e1 ; e2        (monadic bind = EFlatmap)
  *            | check(p) ; e        (guard     = EIf p e [])
  *            | ret e               (singleton = e :: [])
  *            | let x = e1 in e2 | if e1 then e2 else e3
  *            | flatmap e1 x e2 | fold e1 e2 x acc e3
  *            | e || e | e && e | e < e | e == e | e ++ e | e +++ e
  *            | e :: e | e + e | e - e | e * e | e / e | e % e | -e | !e
  *            | len(e) | strLen(e) | toStr(e) | some(e) | range(e, e)
  *            | lookup(d, k) | delete(d, k) | insert(d, k -> v)
  *            | fst(e) | snd(e) | <( e , e )>       (pair record "0"/"1")
  *            | { name : e , ... } | e[field] | mut x | [e, ..., e] | []
  *            | nil[type] | int | "string" | true | false | x
  * types:       int | bool | string | word | unit | list[t] | bag[t]
  *            | set[t] | option[t] | dict[k, v] | { name : t , ... }
  * }}}
  *
  * A parsed comprehension is exactly the nested flatmap/if/cons tree the
  * reference's notation desugars to, so `Rewrites.normalize` recognizes
  * joins/filters/projections in it and the compiler emits real relational
  * operators (the full reference lifecycle: parse → typecheck → rewrite →
  * execute, SURVEY.md §3.1).
  */
object Parser {
  import Lang._

  final case class ParseError(msg: String, pos: Int)
      extends RuntimeException(s"parse error at $pos: $msg")

  // --- Tokens ---
  private sealed trait Tok { def pos: Int }
  /** `huge` marks the one digit string whose NEGATION is representable but
    * whose positive form is not (2^63): valid only directly under an
    * adjacent `-`. */
  private final case class TokInt(v: Long, pos: Int, huge: Boolean = false)
      extends Tok
  private final case class TokStr(v: String, pos: Int) extends Tok
  private final case class TokId(v: String, pos: Int) extends Tok
  private final case class TokSym(v: String, pos: Int) extends Tok
  private final case class TokEof(pos: Int) extends Tok

  /** Maximal-munch symbol list (longest first). `<(` / `)>` lex as pair
    * brackets only when ADJACENT (Coq keyword-token behavior): `a < (b)`
    * keeps its comparison because the space breaks the munch. */
  private val syms = List(
    "+++", "<(", ")>", "<-", "++", "::", ":=", "==", "->", "&&", "||",
    "+", "-", "*", "/", "%", "<", ">", "!", ";", ",",
    "(", ")", "[", "]", "{", "}", ":", "=")

  private def tokenize(src: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var i = 0
    while (i < src.length) {
      val c = src(i)
      if (c.isWhitespace) i += 1
      else if (c == '#') { while (i < src.length && src(i) != '\n') i += 1 }
      else if (c.isDigit) {
        val start = i
        while (i < src.length && src(i).isDigit) i += 1
        val digits = src.substring(start, i)
        out += (digits.toLongOption match {
          case Some(v) => TokInt(v, start)
          case None if BigInt(digits) == BigInt(1) << 63 =>
            TokInt(Long.MinValue, start, huge = true) // only under `-`
          case None =>
            throw ParseError(s"integer literal out of range: $digits", start)
        })
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < src.length && (src(i).isLetterOrDigit || src(i) == '_')) i += 1
        out += TokId(src.substring(start, i), start)
      } else if (c == '"') {
        val start = i
        val sb = new StringBuilder
        i += 1
        while (i < src.length && src(i) != '"') {
          if (src(i) == '\\' && i + 1 < src.length) {
            sb += (src(i + 1) match {
              case 'n' => '\n'; case 't' => '\t'; case other => other
            })
            i += 2
          } else { sb += src(i); i += 1 }
        }
        if (i >= src.length) throw ParseError("unterminated string", start)
        i += 1
        out += TokStr(sb.toString, start)
      } else {
        syms.find(s => src.startsWith(s, i)) match {
          case Some(s) => out += TokSym(s, i); i += s.length
          case None => throw ParseError(s"unexpected character '$c'", i)
        }
      }
    }
    out += TokEof(src.length)
    out.result()
  }

  // --- Parser state ---
  private final class P(toks: Vector[Tok]) {
    private var pos = 0
    def peek: Tok = toks(pos)
    def peek2: Tok = toks(math.min(pos + 1, toks.length - 1))
    def next(): Tok = { val t = toks(pos); pos += 1; t }
    def eatSym(s: String): Unit = next() match {
      case TokSym(`s`, _) => ()
      case t => throw ParseError(s"expected '$s', got $t", t.pos)
    }
    def eatKw(k: String): Unit = next() match {
      case TokId(`k`, _) => ()
      case t => throw ParseError(s"expected '$k', got $t", t.pos)
    }
    def isSym(s: String): Boolean = peek match {
      case TokSym(`s`, _) => true; case _ => false
    }
    def isKw(k: String): Boolean = peek match {
      case TokId(`k`, _) => true; case _ => false
    }
    def ident(): String = next() match {
      case TokId(x, _) if !keywords(x) => x
      case t => throw ParseError(s"expected identifier, got $t", t.pos)
    }
    def eof(): Unit = peek match {
      case TokEof(_) => ()
      case t => throw ParseError(s"trailing input: $t", t.pos)
    }
  }

  /** Words the grammar reserves — not usable as identifiers (Pretty quotes
    * colliding record-field names). */
  def isKeyword(s: String): Boolean = keywords(s)

  private val keywords = Set(
    "skip", "let", "mut", "set", "if", "then", "else", "end", "for", "in",
    "flatmap", "fold", "check", "ret", "true", "false", "nil", "len",
    "strLen", "toStr", "some", "range", "insert", "delete", "lookup",
    "fst", "snd",
    // r12 engine-surface extension beyond the reference's Notations.v —
    // call-forms and binder-forms for the remaining grammar (words,
    // collections, relational nodes) so the printable fraction of
    // well-typed ASTs covers the whole expression language
    "word", "wneg", "wadd", "wsub", "wmul", "wdivu", "wdivs", "wmodu",
    "wmods", "wltu", "wlts", "wrange",
    "none", "unit", "emptyDict", "emptyBag", "emptySet",
    "sum", "count", "min", "max", "bagof", "setof",
    "bagInsert", "setInsert", "sort", "sortBag", "sortSet",
    "filter", "filterBag", "filterSet", "map", "mapBag", "mapSet",
    "join", "joinBag", "joinSet", "flatmapBag", "flatmapSet",
    "flatmap2", "dictfold", "optmatch")

  // --- Public API ---
  def parseExpr(src: String): Expr = {
    val p = new P(tokenize(src))
    val e = expr(p)
    p.eof(); e
  }

  def parseCommand(src: String): Command = {
    val p = new P(tokenize(src))
    val c = command(p)
    p.eof(); c
  }

  // --- Commands (Notations.v:52-67) ---
  private def command(p: P): Command = {
    val c1 = simpleCommand(p)
    if (p.isSym(";")) { p.eatSym(";"); CSeq(c1, command(p)) } else c1
  }

  private def simpleCommand(p: P): Command = p.peek match {
    case TokId("skip", _) => p.next(); CSkip
    case TokId("let", _) =>
      p.next()
      if (p.isKw("mut")) {
        p.next(); val x = p.ident(); p.eatSym(":=")
        val e = expr(p); p.eatKw("in"); CLetMut(e, x, command(p))
      } else {
        val x = p.ident(); p.eatSym("=")
        val e = expr(p); p.eatKw("in"); CLet(e, x, command(p))
      }
    case TokId("set", _) =>
      p.next(); val x = p.ident(); p.eatSym(":="); CAssign(x, expr(p))
    case TokId("if", _) =>
      p.next(); val e = expr(p)
      p.eatKw("then"); val c1 = command(p)
      p.eatKw("else"); val c2 = command(p)
      p.eatKw("end"); CIf(e, c1, c2)
    case TokId("for", _) =>
      p.next(); val x = p.ident(); p.eatKw("in"); val e = expr(p)
      p.eatSym(":"); val c = command(p); p.eatKw("end"); CForeach(e, x, c)
    case TokSym("(", _) =>
      p.next(); val c = command(p); p.eatSym(")"); c
    case t => throw ParseError(s"expected command, got $t", t.pos)
  }

  // --- Expressions, loosest level first (binder forms, level 99-100) ---
  private def expr(p: P): Expr = p.peek match {
    case TokId("let", _) =>
      p.next(); val x = p.ident(); p.eatSym("=")
      val e1 = expr(p); p.eatKw("in"); ELet(e1, x, expr(p))
    case TokId("if", _) =>
      p.next(); val c = expr(p)
      p.eatKw("then"); val t = expr(p)
      p.eatKw("else"); EIf(c, t, expr(p))
    case TokId(kw @ ("flatmap" | "flatmapBag" | "flatmapSet"), _) =>
      p.next(); val e1 = orExpr(p); val x = p.ident()
      EFlatmap(tagOf(kw), e1, x, expr(p))
    case TokId("fold", _) =>
      p.next(); val l = orExpr(p); val z = orExpr(p)
      val x = p.ident(); val acc = p.ident()
      EFold(l, z, x, acc, expr(p))
    // --- r12 binder-form extension (engine surface; juxtaposed args
    // follow the flatmap/fold convention — Pretty parenthesizes them) ---
    case TokId(kw @ ("filter" | "filterBag" | "filterSet"), _) =>
      p.next(); val l = orExpr(p); val x = p.ident()
      EFilter(tagOf(kw), l, x, expr(p))
    case TokId(kw @ ("map" | "mapBag" | "mapSet"), _) =>
      p.next(); val l = orExpr(p); val x = p.ident()
      EProj(tagOf(kw), l, x, expr(p))
    case TokId(kw @ ("join" | "joinBag" | "joinSet"), _) =>
      // the predicate is the one juxtaposed argument FOLLOWED by an
      // arbitrary expression (the result), so it must be a CLOSED paren
      // group: an orExpr here would greedily extend its binary chain
      // into a result that begins with `-`
      p.next(); val l1 = orExpr(p); val l2 = orExpr(p)
      val x = p.ident(); val y = p.ident()
      p.eatSym("("); val pr = expr(p); p.eatSym(")")
      EJoin(tagOf(kw), l1, l2, x, y, pr, expr(p))
    case TokId("flatmap2", _) =>
      p.next(); val e1 = orExpr(p); val e2 = orExpr(p)
      val x = p.ident(); val y = p.ident()
      EFlatmap2(e1, e2, x, y, expr(p))
    case TokId("dictfold", _) =>
      p.next(); val d = orExpr(p); val z = orExpr(p)
      val k = p.ident(); val v = p.ident(); val acc = p.ident()
      EDictFold(d, z, k, v, acc, expr(p))
    case TokId("optmatch", _) =>
      p.next(); val e1 = orExpr(p); val noneE = orExpr(p)
      val x = p.ident()
      EOptMatch(e1, noneE, x, expr(p))
    case TokId("check", _) => // check(p); e  =  if p then e else []
      p.next(); p.eatSym("(")
      val c = expr(p); p.eatSym(")"); p.eatSym(";")
      EIf(c, expr(p), EAtom(ANil()))
    case TokId("ret", _) => // ret e  =  e :: []
      p.next(); EBinop(OCons, expr(p), EAtom(ANil()))
    case TokId(x, _) if !keywords(x) && (p.peek2 match {
          case TokSym("<-", _) => true; case _ => false
        }) => // x <- e1; e2  =  flatmap e1 (λx. e2)
      p.next(); p.next()
      val e1 = orExpr(p); p.eatSym(";")
      EFlatmap(LikeList, e1, x, expr(p))
    case _ => orExpr(p)
  }

  /** Left-assoc binary ladder per the notation levels. */
  private def orExpr(p: P): Expr = chainL(p, andExpr, Map("||" -> OOr))
  private def andExpr(p: P): Expr = chainL(p, cmpExpr, Map("&&" -> OAnd))
  private def cmpExpr(p: P): Expr =
    chainL(p, concatExpr, Map("<" -> OLess, "==" -> OEq))
  private def concatExpr(p: P): Expr =
    chainL(p, consExpr, Map("++" -> OConcat, "+++" -> OConcatString))

  /** `::` is right-associative (Notations.v:103). */
  private def consExpr(p: P): Expr = {
    val head = addExpr(p)
    if (p.isSym("::")) { p.eatSym("::"); EBinop(OCons, head, consExpr(p)) }
    else head
  }

  private def addExpr(p: P): Expr =
    chainL(p, mulExpr, Map("+" -> OPlus, "-" -> OMinus))
  private def mulExpr(p: P): Expr =
    chainL(p, unaryExpr, Map("*" -> OTimes, "/" -> ODiv, "%" -> OMod))

  private def chainL(p: P, sub: P => Expr, ops: Map[String, Binop]): Expr = {
    var e = sub(p)
    var continue = true
    while (continue) p.peek match {
      case TokSym(s, _) if ops.contains(s) =>
        p.next(); e = EBinop(ops(s), e, sub(p))
      case _ => continue = false
    }
    e
  }

  private def unaryExpr(p: P): Expr = p.peek match {
    case TokSym("-", pos) => p.peek2 match {
      // `-5` (ADJACENT digits, Coq Number-Notation behavior) is a negative
      // int ATOM; `- 5` (spaced) stays unary negation — the distinction
      // Pretty relies on for identity round-trips
      case TokInt(v, p2, huge) if p2 == pos + 1 =>
        p.next(); p.next()
        EAtom(AInt(if (huge) v else -v))
      case _ => p.next(); EUnop(ONeg, unaryExpr(p))
    }
    case TokSym("!", _) => p.next(); EUnop(ONot, unaryExpr(p))
    case _ => postfix(p)
  }

  /** `e[field]` record access chains (Notations.v:138). */
  private def postfix(p: P): Expr = {
    var e = primary(p)
    while (p.isSym("[")) {
      p.eatSym("[")
      val f = p.next() match {
        case TokId(x, _) => x
        case TokStr(s, _) => s
        case TokInt(n, _, _) => n.toString // pair fields "0"/"1"
        case t => throw ParseError(s"expected field name, got $t", t.pos)
      }
      p.eatSym("]")
      e = EAccess(e, f)
    }
    e
  }

  private def callArgs1(p: P): Expr = {
    p.eatSym("("); val e = expr(p); p.eatSym(")"); e
  }

  private def callArgs2(p: P): (Expr, Expr) = {
    p.eatSym("(")
    val a = expr(p); p.eatSym(","); val b = expr(p); p.eatSym(")")
    (a, b)
  }

  private def tagOf(kw: String): CollectionTag =
    if (kw.endsWith("Bag")) LikeBag
    else if (kw.endsWith("Set")) LikeSet
    else LikeList

  /** A signed integer LITERAL — the `word(...)` payload. `-2^63` rides the
    * `huge` token (only legal under the minus). */
  private def signedIntLit(p: P): Long = {
    val neg = p.isSym("-")
    if (neg) p.next()
    p.next() match {
      case t @ TokInt(v, _, huge) =>
        if (huge && !neg)
          throw ParseError("integer literal out of range", t.pos)
        if (huge) v else if (neg) -v else v
      case t => throw ParseError(s"expected integer literal, got $t", t.pos)
    }
  }

  private def primary(p: P): Expr = p.peek match {
    case TokInt(v, _, huge) if !huge => p.next(); EAtom(AInt(v))
    case TokStr(s, _) => p.next(); EAtom(AString(s))
    case TokId("true", _) => p.next(); EAtom(ABool(true))
    case TokId("false", _) => p.next(); EAtom(ABool(false))
    case TokId("len", _) => p.next(); EUnop(OLength, callArgs1(p))
    case TokId("strLen", _) => p.next(); EUnop(OLengthString, callArgs1(p))
    case TokId("toStr", _) => p.next(); EUnop(OIntToString, callArgs1(p))
    case TokId("some", _) => p.next(); EUnop(OSome, callArgs1(p))
    case TokId("fst", _) => p.next(); EAccess(callArgs1(p), "0")
    case TokId("snd", _) => p.next(); EAccess(callArgs1(p), "1")
    case TokId("range", _) =>
      p.next(); p.eatSym("(")
      val a = expr(p); p.eatSym(","); val b = expr(p); p.eatSym(")")
      EBinop(ORange, a, b)
    case TokId("lookup", _) =>
      p.next(); p.eatSym("(")
      val d = expr(p); p.eatSym(","); val k = expr(p); p.eatSym(")")
      EBinop(OLookup, d, k)
    case TokId("delete", _) =>
      p.next(); p.eatSym("(")
      val d = expr(p); p.eatSym(","); val k = expr(p); p.eatSym(")")
      EBinop(ODelete, d, k)
    case TokId("insert", _) =>
      p.next(); p.eatSym("(")
      val d = expr(p); p.eatSym(",")
      val k = expr(p); p.eatSym("->"); val v = expr(p); p.eatSym(")")
      ETernop(OInsert, d, k, v)
    case TokId("nil", _) =>
      p.next(); p.eatSym("[")
      val t = ftype(p); p.eatSym("]"); EAtom(ANil(t))
    // --- r12 call-form extension (engine surface) ---
    case TokId("word", _) =>
      p.next(); p.eatSym("(")
      val v = signedIntLit(p); p.eatSym(")"); EAtom(AWord(v))
    case TokId("wneg", _) => p.next(); EUnop(OWNeg, callArgs1(p))
    case TokId(kw @ ("wadd" | "wsub" | "wmul" | "wdivu" | "wdivs" |
        "wmodu" | "wmods" | "wltu" | "wlts" | "wrange"), _) =>
      p.next()
      val (a, b) = callArgs2(p)
      EBinop(kw match {
        case "wadd" => OWPlus; case "wsub" => OWMinus; case "wmul" => OWTimes
        case "wdivu" => OWDivU; case "wdivs" => OWDivS
        case "wmodu" => OWModU; case "wmods" => OWModS
        case "wltu" => OWLessU; case "wlts" => OWLessS
        case "wrange" => OWRange
      }, a, b)
    case TokId("none", _) =>
      p.next()
      if (p.isSym("[")) {
        p.eatSym("["); val t = ftype(p); p.eatSym("]"); EAtom(ANone(t))
      } else EAtom(ANone())
    case TokId("unit", _) => p.next(); EAtom(AUnit)
    case TokId("emptyDict", _) =>
      p.next()
      if (p.isSym("[")) {
        p.eatSym("["); val kt = ftype(p); p.eatSym(",")
        val vt = ftype(p); p.eatSym("]"); EAtom(AEmptyDict(kt, vt))
      } else EAtom(AEmptyDict())
    case TokId(kw @ ("emptyBag" | "emptySet"), _) =>
      p.next()
      val t = if (p.isSym("[")) {
        p.eatSym("["); val t0 = ftype(p); p.eatSym("]"); t0
      } else THole
      if (kw == "emptyBag") EAtom(AEmptyBag(t)) else EAtom(AEmptySet(t))
    case TokId("sum", _) => p.next(); EACFold(AGSum, callArgs1(p))
    case TokId("count", _) => p.next(); EACFold(AGCount, callArgs1(p))
    case TokId("min", _) => p.next(); EACIFold(AGMin, callArgs1(p))
    case TokId("max", _) => p.next(); EACIFold(AGMax, callArgs1(p))
    case TokId("bagof", _) => p.next(); EBagOf(callArgs1(p))
    case TokId("setof", _) => p.next(); ESetOf(callArgs1(p))
    case TokId("bagInsert", _) =>
      p.next(); val (a, b) = callArgs2(p); EBinop(OBagInsert, a, b)
    case TokId("setInsert", _) =>
      p.next(); val (a, b) = callArgs2(p); EBinop(OSetInsert, a, b)
    case TokId(kw @ ("sort" | "sortBag" | "sortSet"), _) =>
      p.next(); ESort(tagOf(kw), callArgs1(p))
    case TokId("mut", _) => p.next(); ELoc(p.ident())
    case TokId(x, _) if !keywords(x) => p.next(); EVar(x)
    case TokSym("[", _) => // list literal → cons chain onto a nil hole
      p.next()
      if (p.isSym("]")) { p.next(); EAtom(ANil()) }
      else {
        val items = Vector.newBuilder[Expr]
        items += expr(p)
        while (p.isSym(",")) { p.next(); items += expr(p) }
        p.eatSym("]")
        items.result().foldRight[Expr](EAtom(ANil())) {
          (e, acc) => EBinop(OCons, e, acc)
        }
      }
    case TokSym("{", _) => // record literal
      p.next()
      val fields = List.newBuilder[(String, Expr)]
      if (!p.isSym("}")) {
        def field(): Unit = {
          val k = p.next() match {
            case TokId(n, _) => n
            case TokStr(n, _) => n
            case t => throw ParseError(s"expected field name, got $t", t.pos)
          }
          p.eatSym(":"); fields += (k -> expr(p))
        }
        field()
        while (p.isSym(",")) { p.next(); field() }
      }
      p.eatSym("}")
      ERecord(fields.result())
    case TokSym("<(", _) => // pair <( x , y )> (Notations.v:116)
      p.next()
      val a = expr(p); p.eatSym(","); val b = expr(p)
      p.eatSym(")>")
      ERecord(List("0" -> a, "1" -> b))
    case TokSym("(", _) =>
      p.next(); val e = expr(p); p.eatSym(")"); e
    case t => throw ParseError(s"expected expression, got $t", t.pos)
  }

  // --- Types (for nil[t] annotations) ---
  private def ftype(p: P): FType = p.peek match {
    case TokId("int", _) => p.next(); TInt
    case TokId("bool", _) => p.next(); TBool
    case TokId("string", _) => p.next(); TString
    case TokId("word", _) => p.next(); TWord
    case TokId("unit", _) => p.next(); TUnit
    case TokId("list", _) => p.next(); TList(bracketed(p))
    case TokId("bag", _) => p.next(); TBag(bracketed(p))
    case TokId("set", _) => p.next(); TSet(bracketed(p))
    case TokId("option", _) => p.next(); TOption(bracketed(p))
    case TokId("dict", _) =>
      p.next(); p.eatSym("[")
      val k = ftype(p); p.eatSym(","); val v = ftype(p); p.eatSym("]")
      TDict(k, v)
    case TokSym("{", _) =>
      p.next()
      val fields = List.newBuilder[(String, FType)]
      def field(): Unit = {
        val k = p.ident(); p.eatSym(":"); fields += (k -> ftype(p))
      }
      field()
      while (p.isSym(",")) { p.next(); field() }
      p.eatSym("}")
      TRecord(fields.result().sortBy(_._1))
    case t => throw ParseError(s"expected type, got $t", t.pos)
  }

  private def bracketed(p: P): FType = {
    p.eatSym("["); val t = ftype(p); p.eatSym("]"); t
  }
}
