package graft.lang

/** Precedence-aware pretty-printer for the surface notation — the inverse
  * of `Parser` over the notation's expressible subset. The core mirrors the
  * reference's notations verbatim (fiat2/src/fiat2/Notations.v:52-148);
  * r12 extends the ENGINE surface with call/binder forms for the rest of
  * the grammar: word ops (wadd..wrange, word(n)), collection literals
  * (none, unit, emptyBag, emptySet, emptyDict), aggregates (sum, count,
  * min, max), bagof, setof, sort(+Bag,+Set), relational binder forms
  * (filter, map — each with Bag and Set variants — join, flatmap2,
  * dictfold, optmatch), and adjacent-minus negative int atoms.
  * `Parser.parseExpr(Pretty(e)) == e` for every printable form
  * (ParserSpec + DifferentialSpec round-trip batteries).
  *
  * Still Unprintable, enumerated: identifiers spelled as reserved words
  * (directed, so a collision can never silently misparse) and empties
  * with a PARTIALLY-holed type (e.g. AEmptyDict(TInt, THole)) — a form
  * no surface program can construct.
  *
  * Parenthesization mirrors the Coq levels: a child prints bare iff its
  * level fits the context's maximum; binder arguments that the grammar
  * takes by juxtaposition (`flatmap e1 x e2`, `fold e1 e2 x acc e3`) are
  * restricted to primaries so adjacent operands can't fuse on reparse.
  */
object Pretty {
  import Lang._

  def apply(e: Expr): String = expr(e, 100)
  def apply(c: Command): String = command(c)

  final case class Unprintable(what: String)
      extends RuntimeException(s"no surface notation for $what")

  private def level(e: Expr): Int = e match {
    case EVar(_) | ELoc(_) | EAccess(_, _) | ERecord(_) => 0
    case EAtom(AInt(v)) => if (v >= 0) 0 else 10 // `-5`: adjacent-minus atom
    case EAtom(_) => 0 // every other atom is a literal / call form
    case EUnop(ONeg | ONot, _) => 10
    case EUnop(_, _) => 0 // len(..), wneg(..) etc — call syntax
    case EBinop(OTimes | ODiv | OMod, _, _) => 40
    case EBinop(OPlus | OMinus, _, _) => 50
    case EBinop(OCons, _, _) => 55
    case EBinop(OConcat | OConcatString, _, _) => 60
    case EBinop(OLess | OEq, _, _) => 70
    case EBinop(OAnd, _, _) => 80
    case EBinop(OOr, _, _) => 90
    case EBinop(_, _, _) => 0 // range/lookup/delete/word ops/bag-set insert
    case ETernop(OInsert, _, _, _) => 0
    case EACFold(_, _) | EACIFold(_, _) | EBagOf(_) | ESetOf(_) |
         ESort(_, _) => 0 // call syntax
    case _ => 100
  }

  private def expr(e: Expr, max: Int): String = {
    val s = raw(e)
    if (level(e) <= max) s else s"($s)"
  }

  /** Juxtaposed binder argument (`flatmap e1 x e2`, `fold e1 e2 x acc s`):
    * ALWAYS parenthesized — a bare primary here can fuse with the next
    * juxtaposed argument on reparse (`xs [] …` reads as an access chain). */
  private def arg(e: Expr): String = s"(${expr(e, 100)})"

  private def raw(e: Expr): String = e match {
    case EVar(x) => ident(x)
    case ELoc(x) => s"mut ${ident(x)}"
    case EAtom(a) => atom(a)

    case EUnop(ONeg, e1) => s"- ${expr(e1, 10)}"
    case EUnop(ONot, e1) => s"! ${expr(e1, 10)}"
    case EUnop(OLength, e1) => s"len(${expr(e1, 100)})"
    case EUnop(OLengthString, e1) => s"strLen(${expr(e1, 100)})"
    case EUnop(OIntToString, e1) => s"toStr(${expr(e1, 100)})"
    case EUnop(OSome, e1) => s"some(${expr(e1, 100)})"
    case EUnop(OWNeg, e1) => s"wneg(${expr(e1, 100)})"

    case EBinop(ORange, a, b) => s"range(${expr(a, 100)}, ${expr(b, 100)})"
    case EBinop(OLookup, d, k) => s"lookup(${expr(d, 100)}, ${expr(k, 100)})"
    case EBinop(ODelete, d, k) => s"delete(${expr(d, 100)}, ${expr(k, 100)})"
    case EBinop(OCons, a, b) => // right-assoc at 55
      s"${expr(a, 54)} :: ${expr(b, 55)}"
    case EBinop(op, a, b) if callBinop.contains(op) =>
      s"${callBinop(op)}(${expr(a, 100)}, ${expr(b, 100)})"
    case EBinop(op, a, b) =>
      val (sym, lvl) = binop(op)
      s"${expr(a, lvl)} $sym ${expr(b, lvl - 1)}" // left-assoc

    case ETernop(OInsert, d, k, v) =>
      s"insert(${expr(d, 100)}, ${expr(k, 100)} -> ${expr(v, 100)})"

    // --- r12 engine-surface extension (beyond the reference's
    // Notations.v): call/binder forms for the remaining grammar ---
    case EACFold(AGSum, l) => s"sum(${expr(l, 100)})"
    case EACFold(AGCount, l) => s"count(${expr(l, 100)})"
    case EACIFold(AGMin, l) => s"min(${expr(l, 100)})"
    case EACIFold(AGMax, l) => s"max(${expr(l, 100)})"
    case EBagOf(l) => s"bagof(${expr(l, 100)})"
    case ESetOf(l) => s"setof(${expr(l, 100)})"
    case ESort(tag, l) => s"${tagged("sort", tag)}(${expr(l, 100)})"
    case EFilter(tag, l, x, p) =>
      s"${tagged("filter", tag)} ${arg(l)} ${ident(x)} ${expr(p, 100)}"
    case EProj(tag, l, x, r) =>
      s"${tagged("map", tag)} ${arg(l)} ${ident(x)} ${expr(r, 100)}"
    case EJoin(tag, l1, l2, x, y, p, r) =>
      s"${tagged("join", tag)} ${arg(l1)} ${arg(l2)} ${ident(x)} " +
        s"${ident(y)} ${arg(p)} ${expr(r, 100)}"
    case EFlatmap2(e1, e2, x, y, b) =>
      s"flatmap2 ${arg(e1)} ${arg(e2)} ${ident(x)} ${ident(y)} ${expr(b, 100)}"
    case EDictFold(d, z, k, v, acc, step) =>
      s"dictfold ${arg(d)} ${arg(z)} ${ident(k)} ${ident(v)} ${ident(acc)} ${expr(step, 100)}"
    case EOptMatch(e1, noneE, x, someE) =>
      s"optmatch ${arg(e1)} ${arg(noneE)} ${ident(x)} ${expr(someE, 100)}"

    case EIf(c, t, f) =>
      s"if ${expr(c, 100)} then ${expr(t, 100)} else ${expr(f, 100)}"
    case ELet(e1, x, e2) =>
      s"let ${ident(x)} = ${expr(e1, 100)} in ${expr(e2, 100)}"
    case EFlatmap(tag, e1, x, e2) =>
      s"${tagged("flatmap", tag)} ${arg(e1)} ${ident(x)} ${expr(e2, 100)}"
    case EFold(l, z, x, acc, step) =>
      s"fold ${arg(l)} ${arg(z)} ${ident(x)} ${ident(acc)} ${expr(step, 100)}"

    case ERecord(List(("0", a), ("1", b))) =>
      s"<( ${expr(a, 100)} , ${expr(b, 100)} )>"
    case ERecord(fields) =>
      fields.map { case (k, v) => s"${fieldName(k)} : ${expr(v, 100)}" }
        .mkString("{ ", ", ", " }")
    case EAccess(r, f) => s"${expr(r, 0)}[${fieldName(f)}]"

    case other => throw Unprintable(other.getClass.getSimpleName)
  }

  private def binop(op: Binop): (String, Int) = op match {
    case OTimes => ("*", 40); case ODiv => ("/", 40); case OMod => ("%", 40)
    case OPlus => ("+", 50); case OMinus => ("-", 50)
    case OConcat => ("++", 60); case OConcatString => ("+++", 60)
    case OLess => ("<", 70); case OEq => ("==", 70)
    case OAnd => ("&&", 80); case OOr => ("||", 90)
    case other => throw Unprintable(other.toString)
  }

  /** Word and collection-insert binops print as 2-arg call forms. */
  private val callBinop: Map[Binop, String] = Map(
    OWPlus -> "wadd", OWMinus -> "wsub", OWTimes -> "wmul",
    OWDivU -> "wdivu", OWDivS -> "wdivs", OWModU -> "wmodu",
    OWModS -> "wmods", OWLessU -> "wltu", OWLessS -> "wlts",
    OWRange -> "wrange", OBagInsert -> "bagInsert",
    OSetInsert -> "setInsert")

  private def tagged(base: String, tag: CollectionTag): String = tag match {
    case LikeList => base
    case LikeBag => base + "Bag"
    case LikeSet => base + "Set"
  }

  private def atom(a: Atom): String = a match {
    case AInt(v) => v.toString // negatives: adjacent-minus atom form
    case AWord(v) => s"word($v)"
    case ABool(v) => v.toString
    case AString(s) => quote(s)
    case ANil(THole) => "[]"
    case ANil(t) => s"nil[${ftype(t)}]"
    case ANone(THole) => "none"
    case ANone(t) => s"none[${ftype(t)}]"
    case AUnit => "unit"
    case AEmptyBag(THole) => "emptyBag"
    case AEmptyBag(t) => s"emptyBag[${ftype(t)}]"
    case AEmptySet(THole) => "emptySet"
    case AEmptySet(t) => s"emptySet[${ftype(t)}]"
    case AEmptyDict(THole, THole) => "emptyDict"
    case AEmptyDict(kt, vt) if kt != THole && vt != THole =>
      s"emptyDict[${ftype(kt)}, ${ftype(vt)}]"
    case other => throw Unprintable(other.toString)
  }

  private val identPat = "[A-Za-z_][A-Za-z0-9_]*".r

  /** An IDENTIFIER position (variable, location, binder): a reserved word
    * or non-identifier spelling has no surface form — raise the pinned
    * `Unprintable`, never print text that silently misparses (an
    * `EVar("sum")` printed bare would reparse as a malformed call). */
  private def ident(x: String): String =
    if (identPat.matches(x) && !Parser.isKeyword(x)) x
    else throw Unprintable(s"identifier '$x' (reserved word or non-identifier spelling)")
  private def fieldName(k: String): String = k match {
    case identPat() if !Parser.isKeyword(k) => k
    case _ if k.forall(_.isDigit) && k.nonEmpty => k // pair fields "0"/"1"
    case _ => quote(k)
  }

  private def quote(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\t' => "\\t"
      case c => c.toString
    } + "\""

  def ftype(t: FType): String = t match {
    case TInt => "int"
    case TBool => "bool"
    case TString => "string"
    case TWord => "word"
    case TUnit => "unit"
    case TList(u) => s"list[${ftype(u)}]"
    case TBag(u) => s"bag[${ftype(u)}]"
    case TSet(u) => s"set[${ftype(u)}]"
    case TOption(u) => s"option[${ftype(u)}]"
    case TDict(k, v) => s"dict[${ftype(k)}, ${ftype(v)}]"
    case TRecord(fs) =>
      fs.map { case (n, u) => s"$n : ${ftype(u)}" }.mkString("{ ", ", ", " }")
    case THole => throw Unprintable("type hole")
  }

  private def command(c: Command): String = c match {
    case CSkip => "skip"
    case CSeq(a, b) =>
      // a greedy-bodied or seq head must close before `;`
      val head = a match {
        case CLet(_, _, _) | CLetMut(_, _, _) | CSeq(_, _) =>
          s"(${command(a)})"
        case _ => command(a)
      }
      s"$head; ${command(b)}"
    case CLet(e, x, body) =>
      s"let ${ident(x)} = ${expr(e, 100)} in ${command(body)}"
    case CLetMut(e, x, body) =>
      s"let mut ${ident(x)} := ${expr(e, 100)} in ${command(body)}"
    case CAssign(x, e) => s"set ${ident(x)} := ${expr(e, 100)}"
    case CIf(e, a, b) =>
      s"if ${expr(e, 100)} then ${command(a)} else ${command(b)} end"
    case CForeach(e, x, body) =>
      s"for ${ident(x)} in ${expr(e, 100)} : ${command(body)} end"
  }
}
