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
  * scalar family the SQL backend must refuse. Word-variant ops refuse
  * instead (Python ints are unbounded; two's-complement wrap would be
  * silently lost — the reference prints them as plain ints, diverging
  * from its own interpreter).
  */
object ToPython {
  import Lang._

  final case class Unextractable(what: String)
      extends RuntimeException(s"no Python extraction for $what")

  /** Helpers every extracted program needs: functools for folds and the
    * canonical-order sort key (records = name-sorted field lists, then
    * lexicographic — Value.v:116-147). */
  val prelude: String =
    """import functools
      |def __key(v):
      |    if isinstance(v, dict):
      |        return [(k, __key(v[k])) for k in sorted(v)]
      |    if isinstance(v, list):
      |        return [__key(x) for x in v]
      |    return v
      |""".stripMargin

  /** Whole-command extraction (`program_py`): prelude + indented body.
    * Binder SHADOWING refuses: Python has no block scope, so a flat
    * rendering would leak an inner `CLet`/`CLetMut` value past its scope
    * where the interpreter restores the outer binding (the reference's
    * own printer has exactly this bug; for non-shadowing well-typed
    * programs flat assignment is faithful, since a binding that ended is
    * unreadable anyway). */
  def program(c: Command): String = {
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
    prelude + command(0, c)
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
    case AWord(v) => v.toString
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
    case OWNeg => throw Unextractable("OWNeg (word wrap semantics)")
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
    case other => throw Unextractable(s"$other (word semantics)")
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
