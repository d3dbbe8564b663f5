package graft.plans

import org.apache.spark.sql.types._

/** Parser for serialized Myria/Raco plan text — the reference's third entry
  * point (`opt/raco/PTree.kt`, `opt/raco/RacoOperators.kt:106-223`,
  * exercised by `test/.../opt/QueryOptimizeExecuteTest.kt:38-83`): a Python
  * `repr` of nested operator constructors, e.g.
  *
  * {{{
  * Store(RelationKey('public','adhoc','out'),
  *   Apply([('rate', DIVIDE(NamedAttributeRef('TotBytes'), NamedAttributeRef('Dur')))],
  *     Select(GT(UnnamedAttributeRef(12, None), NumericLiteral(250)),
  *       FileScan('file:///data.csv', 'CSV', Scheme([('Dur','DOUBLE_TYPE'), …]), {'skip': 1}))))
  * }}}
  *
  * Two stages, mirroring the reference's structure (PTree → operator tree)
  * with the lowering targeting [[Relational.Op]] instead of Accumulo
  * iterators:
  *
  *  1. `parse`: Python-repr text → [[PTree]] (numbers, strings, tuples,
  *     lists, dicts, `None`, constructor nodes).
  *  2. `toOp` / `toExpr`: PTree → `Relational.Op` / `Relational.Expr`.
  *
  * Operator vocabulary (reference `RacoOperators.kt:119-191`): Store, Dump,
  * Apply, Select, FileScan, FileStore, Scan, RelationKey, Scheme,
  * RepresentationProperties, frozenset; expressions NamedAttributeRef,
  * UnnamedAttributeRef, NumericLiteral, StringLiteral, PLUS, DIVIDE, GT —
  * extended with the rest of the [[Relational.Expr]] comparison/boolean/
  * arithmetic surface (MINUS, TIMES, LT, EQ, AND, OR, NOT), which Raco
  * emits for richer queries.
  */
object RacoParser {

  final class RacoParseException(msg: String) extends IllegalArgumentException(msg)
  private def fail(msg: String): Nothing = throw new RacoParseException(msg)

  // -------------------------------------------------------------- stage 1
  sealed trait PTree
  final case class PNode(name: String, args: List[PTree]) extends PTree
  final case class PList(items: List[PTree]) extends PTree
  final case class PTuple(items: List[PTree]) extends PTree
  final case class PMap(entries: Map[String, PTree]) extends PTree
  final case class PLong(v: Long) extends PTree
  final case class PDouble(v: Double) extends PTree
  final case class PStr(s: String) extends PTree
  final case class PBool(b: Boolean) extends PTree
  case object PNone extends PTree

  /** Parse a full Python-repr plan string; trailing garbage is an error. */
  def parse(text: String): PTree = {
    val p = new Cursor(text)
    val t = p.value()
    p.skipWs()
    if (!p.atEnd) fail(s"trailing input at ${p.pos}: '${p.rest.take(20)}…'")
    t
  }

  private final class Cursor(s: String) {
    var pos = 0
    def atEnd: Boolean = pos >= s.length
    def rest: String = s.substring(pos)
    def skipWs(): Unit = while (!atEnd && s.charAt(pos).isWhitespace) pos += 1
    private def peek: Char = { if (atEnd) fail("unexpected end of input"); s.charAt(pos) }
    private def expect(c: Char): Unit = {
      skipWs()
      if (atEnd || s.charAt(pos) != c) fail(s"expected '$c' at $pos in: …${s.substring(math.max(0, pos - 20), math.min(s.length, pos + 5))}")
      pos += 1
    }

    def value(): PTree = {
      skipWs()
      peek match {
        case c if c == '-' || c == '.' || c.isDigit => number()
        case '\'' | '"' => PStr(quoted(peekThenAdvance()))
        case '[' => pos += 1; PList(sequence(']'))
        case '(' => pos += 1; PTuple(sequence(')'))
        case '{' => dict()
        case _ => identifierOrNode()
      }
    }

    private def peekThenAdvance(): Char = { val c = peek; pos += 1; c }

    private def number(): PTree = {
      val start = pos
      if (peek == '-') pos += 1
      var seenDot = false; var seenExp = false
      while (!atEnd && {
        val c = s.charAt(pos)
        c.isDigit || c == '.' || c == 'e' || c == 'E' || c == 'x' || c == 'X' ||
          ((c == '+' || c == '-') && (s.charAt(pos - 1) == 'e' || s.charAt(pos - 1) == 'E'))
      }) {
        if (s.charAt(pos) == '.') seenDot = true
        if (s.charAt(pos) == 'e' || s.charAt(pos) == 'E') seenExp = true
        pos += 1
      }
      val tok = s.substring(start, pos)
      if (tok.toLowerCase.startsWith("0x")) PLong(java.lang.Long.parseLong(tok.drop(2), 16))
      else if (seenDot || seenExp) PDouble(tok.toDouble)
      else PLong(tok.toLong)
    }

    private def quoted(q: Char): String = {
      val sb = new StringBuilder
      while (peek != q) {
        val c = peekThenAdvance()
        if (c == '\\' && !atEnd) sb.append(peekThenAdvance()) // python-repr escapes pass through
        else sb.append(c)
      }
      pos += 1 // closing quote
      sb.toString
    }

    private def sequence(end: Char): List[PTree] = {
      val items = List.newBuilder[PTree]
      skipWs()
      if (peek == end) { pos += 1; return items.result() }
      var done = false
      while (!done) {
        items += value()
        skipWs()
        peek match {
          case ',' => pos += 1; skipWs(); if (peek == end) { pos += 1; done = true } // trailing comma
          case `end` => pos += 1; done = true
          case c => fail(s"expected ',' or '$end' at $pos, found '$c'")
        }
      }
      items.result()
    }

    private def dict(): PTree = {
      expect('{')
      val entries = Map.newBuilder[String, PTree]
      skipWs()
      if (peek == '}') { pos += 1; return PMap(Map.empty) }
      var done = false
      while (!done) {
        skipWs()
        val k = value() match {
          case PStr(k) => k
          case other => fail(s"dict key must be a string, got $other")
        }
        expect(':')
        entries += k -> value()
        skipWs()
        peek match {
          case ',' => pos += 1
          case '}' => pos += 1; done = true
          case c => fail(s"expected ',' or '}' at $pos, found '$c'")
        }
      }
      PMap(entries.result())
    }

    private def identifierOrNode(): PTree = {
      val start = pos
      while (!atEnd && (s.charAt(pos).isLetterOrDigit || s.charAt(pos) == '_')) pos += 1
      val name = s.substring(start, pos)
      if (name.isEmpty) fail(s"unexpected character '${peek}' at $pos")
      // u'…' / u"…" unicode-string prefix
      if (name == "u" && !atEnd && (s.charAt(pos) == '\'' || s.charAt(pos) == '"'))
        return PStr(quoted(peekThenAdvance()))
      name match {
        case "None" => PNone
        case "True" => PBool(true)
        case "False" => PBool(false)
        case _ =>
          skipWs()
          expect('(')
          PNode(name, sequence(')'))
      }
    }
  }

  // -------------------------------------------------------------- stage 2
  import Relational._

  /** Parse plan text straight to an executable op-tree. */
  def parsePlan(text: String): Op = toOp(parse(text))

  /** Reference `RelationKey.sanitizeTableName()`
    * (`opt/RacoToAccumulo.kt:724`): user_program_relation.
    */
  private def relationName(t: PTree): String = t match {
    case PNode("RelationKey", List(PStr(u), PStr(p), PStr(r))) => s"${u}_${p}_$r"
    case other => fail(s"expected RelationKey, got $other")
  }

  /** Reference `RacoType` (`opt/raco/RacoOperators.kt:9-17`), names with or
    * without the `_TYPE` suffix. DATETIME maps to TimestampType (the
    * reference rejects it, `opt/RacoToAccumulo.kt:34` — an Accumulo
    * lexicoder gap, not a semantic one).
    */
  private def racoType(name: String): DataType =
    name.stripSuffix("_TYPE") match {
      case "STRING"   => StringType
      case "LONG"     => LongType
      case "INT"      => IntegerType
      case "DOUBLE"   => DoubleType
      case "FLOAT"    => FloatType
      case "BOOLEAN"  => BooleanType
      case "DATETIME" => TimestampType
      case other      => fail(s"unknown Raco type $other")
    }

  private def scheme(t: PTree): StructType = t match {
    case PNode("Scheme", List(PList(fields))) =>
      StructType(fields.map {
        case PTuple(List(PStr(n), PStr(ty))) => StructField(n, racoType(ty))
        case other => fail(s"expected (name, type) pair in Scheme, got $other")
      })
    case other => fail(s"expected Scheme, got $other")
  }

  def toOp(t: PTree): Op = t match {
    case PNode("Store", List(rk, child)) => Store(relationName(rk), toOp(child))
    case PNode("Dump", List(child)) => Dump(toOp(child))
    case PNode("Apply", List(PList(emitters), child)) =>
      Apply(emitters.map {
        case PTuple(List(PStr(n), e)) => n -> toExpr(e)
        case other => fail(s"expected (name, expr) emitter, got $other")
      }, toOp(child))
    case PNode("Select", List(cond, child)) => Select(toExpr(cond), toOp(child))
    case PNode("FileScan", List(PStr(file), PStr(format), sch, opts)) =>
      if (format.toUpperCase != "CSV") fail(s"unsupported FileScan format $format")
      val skip = opts match {
        case PMap(m) => m.get("skip") match {
          case Some(PLong(n)) => n
          case None => 0L
          case Some(other) => fail(s"bad skip option $other")
        }
        case _ => 0L
      }
      FileScan(file, scheme(sch), header = skip >= 1)
    case PNode("FileStore", List(PStr(file), PStr(format), _, child)) =>
      if (format.toUpperCase != "CSV") fail(s"unsupported FileStore format $format")
      FileStore(file, header = true, toOp(child))
    case PNode("Scan", List(rk, sch, _, _)) =>
      // the plan-declared Scheme travels with the Scan: positional refs
      // bind to ITS order, not the backing table's physical column order
      val declared = sch match {
        case s @ PNode("Scheme", _) => Some(scheme(s))
        case _ => None
      }
      Scan(relationName(rk), declared)
    case other => fail(s"unexpected operator node: $other")
  }

  def toExpr(t: PTree): Expr = t match {
    case PNode("NamedAttributeRef", List(PStr(n))) => Ref(n)
    case PNode("UnnamedAttributeRef", List(PLong(i), PNone)) => PosRef(i.toInt)
    case PNode("UnnamedAttributeRef", List(PLong(i))) => PosRef(i.toInt)
    case PNode("NumericLiteral", List(PLong(v))) => Lit(v)
    case PNode("NumericLiteral", List(PDouble(v))) => Lit(v)
    case PNode("StringLiteral", List(PStr(v))) => Lit(v)
    case PNode("PLUS", List(a, b))   => Plus(toExpr(a), toExpr(b))
    case PNode("MINUS", List(a, b))  => Minus(toExpr(a), toExpr(b))
    case PNode("TIMES", List(a, b))  => Times(toExpr(a), toExpr(b))
    case PNode("DIVIDE", List(a, b)) => Divide(toExpr(a), toExpr(b))
    case PNode("GT", List(a, b))     => Gt(toExpr(a), toExpr(b))
    case PNode("LT", List(a, b))     => Lt(toExpr(a), toExpr(b))
    case PNode("EQ", List(a, b))     => Eq(toExpr(a), toExpr(b))
    case PNode("AND", List(a, b))    => And(toExpr(a), toExpr(b))
    case PNode("OR", List(a, b))     => Or(toExpr(a), toExpr(b))
    case PNode("NOT", List(a))       => Not(toExpr(a))
    case other => fail(s"unexpected expression node: $other")
  }
}
