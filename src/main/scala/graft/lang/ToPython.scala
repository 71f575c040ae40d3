package graft.lang

/** Python extraction backend — the reference's OTHER execution path
  * (fiat2/src/fiat2/ToPython.v: `expr_py` :86, `command_py` :203,
  * `program_py` :231; run under CPython per SURVEY.md §3.1 step 4).
  *
  * Faithful to the INTERPRETER, not to the reference printer's known
  * divergences: `EFlatmap2` renders with `zip` (lockstep, shorter side
  * cuts — ToPython.v:185-188 wrongly renders a product), `EFold` renders
  * as a RIGHT fold (`Interpret.v:313-319`; reduce over the reversed
  * list), and `ESort` sorts by the canonical value order via a prelude
  * key function (plain `sorted()` raises on dicts). Notably Python's
  * `//` and `%` ARE Coq's `Z.div`/`Z.modulo` (floor division, modulo
  * with the divisor's sign), so `ODiv`/`OMod` extract exactly — the one
  * scalar family the SQL backend must refuse. Word ops extract through
  * width-parametric prelude helpers that mask every result back to
  * two's complement (signed canonical form, any width ≥ 1) — the
  * reference's printer emits plain `+`/`//` on unbounded ints here,
  * diverging from its own interpreter; this extraction is wrap-faithful
  * (`__w`, `__wdivu`, … with the total x/0=0, x%0=x semantics and
  * truncation toward zero for the signed family).
  */
object ToPython {
  import Lang._

  final case class Unextractable(what: String)
      extends RuntimeException(s"no Python extraction for $what")

  /** Helpers every extracted program needs: functools for folds, the
    * canonical-order sort key (records = name-sorted field lists, then
    * lexicographic — Value.v:116-147), and the width-`w` word family
    * (signed two's-complement canonical; Interpret.v:139-151 semantics). */
  def preludeFor(wordWidth: Int): String = {
    require(wordWidth >= 1, s"bad word width $wordWidth")
    s"""import functools
      |def __key(v):
      |    if isinstance(v, dict):
      |        return [(k, __key(v[k])) for k in sorted(v)]
      |    if isinstance(v, list):
      |        return [__key(x) for x in v]
      |    return v
      |__W = $wordWidth
      |__MASK = (1 << __W) - 1
      |def __w(v):
      |    v &= __MASK
      |    return v - (1 << __W) if v >= (1 << (__W - 1)) else v
      |def __wdivu(a, b):
      |    return 0 if b == 0 else __w((a & __MASK) // (b & __MASK))
      |def __wdivs(a, b):
      |    if b == 0:
      |        return 0
      |    q = abs(a) // abs(b)
      |    return __w(-q if (a < 0) != (b < 0) else q)
      |def __wmodu(a, b):
      |    return __w(a) if b == 0 else __w((a & __MASK) % (b & __MASK))
      |def __wmods(a, b):
      |    if b == 0:
      |        return __w(a)
      |    r = abs(a) % abs(b)
      |    return __w(-r if a < 0 else r)
      |""".stripMargin
  }
  /** Width-64 prelude — ONLY for the surface-syntax path, whose word
    * literals are width 64 by definition. Programs authored under a
    * non-64 `Env` must use `preludeFor`/`program` with the Env's width. */
  val prelude64: String = preludeFor(64)

  /** Whole-command extraction (`program_py`): prelude + indented body.
    * Binder SHADOWING refuses: Python has no block scope, so a flat
    * rendering would leak an inner `CLet`/`CLetMut` value past its scope
    * where the interpreter restores the outer binding (the reference's
    * own printer has exactly this bug; for non-shadowing well-typed
    * programs flat assignment is faithful, since a binding that ended is
    * unreadable anyway). */
  def program(c: Command, wordWidth: Int): String = {
    def checkShadow(c: Command, bound: Set[String]): Unit = c match {
      case CSkip =>
      case CSeq(a, b) => checkShadow(a, bound); checkShadow(b, bound)
      case CLet(_, x, body) =>
        if (bound(x)) throw Unextractable(s"shadowed binder '$x'")
        checkShadow(body, bound + x)
      case CLetMut(_, x, body) =>
        if (bound(x)) throw Unextractable(s"shadowed binder '$x'")
        checkShadow(body, bound + x)
      case CAssign(_, _) =>
      case CIf(_, a, b) => checkShadow(a, bound); checkShadow(b, bound)
      case CForeach(_, x, body) => checkShadow(body, bound + x)
    }
    checkShadow(c, Set.empty)
    preludeFor(wordWidth) + command(0, c)
  }

  private def command(n: Int, c: Command): String = c match {
    case CSkip => line(n, "pass")
    case CSeq(c1, c2) => command(n, c1) + command(n, c2)
    case CLet(e, x, body) =>
      line(n, s"${ident(x)} = ${apply(e)}") + command(n, body)
    case CLetMut(e, x, body) =>
      line(n, s"${ident(x)} = ${apply(e)}") + command(n, body)
    case CAssign(x, e) => line(n, s"${ident(x)} = ${apply(e)}")
    case CIf(e, c1, c2) =>
      line(n, s"if ${apply(e)}:") + command(n + 1, c1) +
        line(n, "else:") + command(n + 1, c2)
    case CForeach(e, x, body) =>
      line(n, s"for ${ident(x)} in ${apply(e)}:") + command(n + 1, body)
  }

  private def line(n: Int, s: String): String = "    " * n + s + "\n"

  def apply(e: Expr): String = e match {
    case EVar(x) => ident(x)
    case ELoc(x) => ident(x)
    case EAtom(a) => atom(a)
    case EUnop(op, a) => unop(op, apply(a))
    case EBinop(op, a, b) => binop(op, apply(a), apply(b))
    case ETernop(OInsert, d, k, v) =>
      s"(${apply(d)} | {${apply(k)}: ${apply(v)}})"
    case EIf(c, t, f) => s"(${apply(t)} if ${apply(c)} else ${apply(f)})"
    case ELet(e1, x, e2) =>
      s"(lambda ${ident(x)}: ${apply(e2)})(${apply(e1)})"
    case ERecord(fs) =>
      fs.map { case (k, v) => s"${str(k)}: ${apply(v)}" }
        .mkString("{", ", ", "}")
    case EAccess(r, f) => s"${apply(r)}[${str(f)}]"
    case EOptMatch(e1, none, x, some) =>
      s"(lambda __o: ${apply(none)} if __o is None else " +
        s"(lambda ${ident(x)}: ${apply(some)})(__o))(${apply(e1)})"
    case EDictFold(d, z, k, v, acc, step) =>
      s"functools.reduce(lambda ${ident(acc)}, __kv: " +
        s"(lambda ${ident(k)}, ${ident(v)}: ${apply(step)})" +
        s"(__kv[0], __kv[1]), sorted(${apply(d)}.items()), ${apply(z)})"
    case ESort(_, l) => s"sorted(${apply(l)}, key=__key)"
    case EFilter(_, l, x, p) =>
      s"[${ident(x)} for ${ident(x)} in ${apply(l)} if ${apply(p)}]"
    case EJoin(_, l1, l2, x, y, p, r) =>
      s"[${apply(r)} for ${ident(x)} in ${apply(l1)} " +
        s"for ${ident(y)} in ${apply(l2)} if ${apply(p)}]"
    case EProj(_, l, x, r) =>
      s"[${apply(r)} for ${ident(x)} in ${apply(l)}]"
    case EFlatmap(_, l, x, b) =>
      s"[__y for ${ident(x)} in ${apply(l)} for __y in ${apply(b)}]"
    case EFlatmap2(e1, e2, x1, x2, e3) => // zip, NOT the printer's product
      s"[__y for (${ident(x1)}, ${ident(x2)}) in " +
        s"zip(${apply(e1)}, ${apply(e2)}) for __y in ${apply(e3)}]"
    case EFold(l, z, x, acc, step) => // RIGHT fold (Interpret.v:313-319)
      s"functools.reduce(lambda ${ident(acc)}, ${ident(x)}: ${apply(step)}, " +
        s"reversed(${apply(l)}), ${apply(z)})"
    case EACFold(AGSum, l) => s"sum(${apply(l)})"
    case EACFold(AGCount, l) => s"len(${apply(l)})"
    case EACIFold(AGMin, l) => s"min(${apply(l)}, default=None)"
    case EACIFold(AGMax, l) => s"max(${apply(l)}, default=None)"
    // nested bags/sets observe as CANONICALLY SORTED arrays (the engine's
    // convention, = the reference's set_insert/bag canonical forms;
    // the reference printer renders plain list(), diverging from its own
    // interpreter)
    case EBagOf(l) => s"sorted(${apply(l)}, key=__key)"
    case ESetOf(l) =>
      s"sorted((lambda __l: [__v for __i, __v in enumerate(__l) " +
        s"if __l.index(__v) == __i])(${apply(l)}), key=__key)"
  }

  private def atom(a: Atom): String = a match {
    case AWord(v) => s"__w($v)" // canonicalize the literal at the width
    case AInt(v) => v.toString
    case ABool(b) => if (b) "True" else "False"
    case AString(s) => str(s)
    case ANil(_) | AEmptyBag(_) | AEmptySet(_) => "[]"
    case ANone(_) => "None"
    case AEmptyDict(_, _) => "{}"
    case AUnit => "None"
  }

  private def unop(op: Unop, e: String): String = op match {
    case ONeg => s"(- $e)"
    case ONot => s"(not $e)"
    case OLength | OLengthString => s"len($e)"
    case OIntToString => s"str($e)"
    case OSome => e // options are nullables; Some is identity
    case OWNeg => s"__w(- $e)" // wraps at the width's MinValue
  }

  private def binop(op: Binop, a: String, b: String): String = op match {
    case OPlus => s"($a + $b)"
    case OMinus => s"($a - $b)"
    case OTimes => s"($a * $b)"
    // Python floor-div/mod ARE Z.div/Z.modulo — exact extraction
    case ODiv => s"($a // $b)"
    case OMod => s"($a % $b)"
    case OAnd => s"($a and $b)"
    case OOr => s"($a or $b)"
    case OConcat => s"($a + $b)"
    case OConcatString => s"($a + $b)"
    case OLess => s"($a < $b)"
    case OEq => s"($a == $b)"
    case OCons => s"([$a] + $b)"
    case ORange => s"list(range($a, $b))"
    // canonical sorted insert (bag_insert/set_insert, Interpret.v:112-135)
    case OBagInsert => s"sorted([$b] + $a, key=__key)"
    case OSetInsert => s"sorted([$b] + [__x for __x in $a if __x != $b], key=__key)"
    case OLookup => s"$a.get($b)"
    case ODelete => s"{__k: __v for __k, __v in $a.items() if __k != $b}"
    // word family: every result masked back to two's complement — the
    // reference printer's plain +/* and // silently lose the wrap and the
    // unsigned views (ToPython.v:65-68)
    case OWPlus => s"__w($a + $b)"
    case OWMinus => s"__w($a - $b)"
    case OWTimes => s"__w($a * $b)"
    case OWDivU => s"__wdivu($a, $b)"
    case OWDivS => s"__wdivs($a, $b)"
    case OWModU => s"__wmodu($a, $b)"
    case OWModS => s"__wmods($a, $b)"
    case OWLessU => s"(($a & __MASK) < ($b & __MASK))"
    case OWLessS => s"($a < $b)"
    // eval_range_word (Interpret.v:80-90): length = unsigned(hi) -
    // unsigned(lo), elements step by WRAPPING add
    case OWRange =>
      s"(lambda __lo, __hi: [__w(__lo + __i) for __i in " +
        s"range(max(0, (__hi & __MASK) - (__lo & __MASK)))])($a, $b)"
  }

  private def str(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private val identPat = "[A-Za-z_][A-Za-z0-9_]*".r
  /** Python keywords plus every name the generated code itself uses —
    * a binder colliding with either would change the program's meaning
    * (e.g. a variable named `zip` breaking the EFlatmap2 rendering). */
  private val reserved = Set(
    "False", "None", "True", "and", "as", "assert", "async", "await",
    "break", "class", "continue", "def", "del", "elif", "else", "except",
    "finally", "for", "from", "global", "if", "import", "in", "is",
    "lambda", "nonlocal", "not", "or", "pass", "raise", "return", "try",
    "while", "with", "yield",
    "functools", "sorted", "zip", "sum", "len", "min", "max", "enumerate",
    "list", "range", "str", "reversed", "print")
  private def ident(s: String): String = s match {
    case identPat() if !reserved(s) && !s.startsWith("__") => s
    case _ => throw Unextractable(s"identifier '$s'")
  }
}
