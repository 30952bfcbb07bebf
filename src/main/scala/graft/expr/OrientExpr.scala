package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Translator for the OrientDB SQL expression dialect used throughout the
  * reference's configs (`field.expression`, per-component `if`, `let`
  * blocks, lookup SELECTs, `etl` parameters).
  *
  * Reference semantics (all citations into /root/reference):
  *   - method-chain syntax `field.trim()`, `$var.append('x')`,
  *     `sysdate()` — resources/config.json:5-6, config-dbpedia.json:9-10
  *   - `$var` / `${var}` / `={expr}` interpolation —
  *     OAbstractETLComponent.java:501-530
  *   - `if` predicates are OrientDB SQL filters over the current record —
  *     OAbstractETLComponent.java:453-468
  *
  * Design (SURVEY.md §7.2 step 1): we do NOT interpret per record. The
  * dialect string is parsed ONCE at plan-build time into a Spark
  * [[Column]] tree of built-in (whole-stage-codegen'd) expressions, so the
  * hot path stays inside Tungsten whole-stage codegen. No custom Catalyst
  * Expression was needed: every dialect function observed in the reference
  * maps to a built-in (SURVEY.md §4).
  */
object OrientExpr {

  /** Parse a dialect expression to a Spark Column.
    * @param vars driver-side context variables (`let` blocks, CLI -NAME=v);
    *             `$var` resolves to a literal (or Column) from here.
    */
  def compile(src: String, vars: Map[String, Any] = Map.empty): Column =
    new Parser(src, vars).parseFull().col

  /** Resolve `$var` / `${var}` inside a *config string value*
    * (path names, command text, …) to a driver-side string.
    * Mirrors OAbstractETLComponent.java:501-530. The closing brace is
    * consumed only when the opening one was present — `$var}` keeps the
    * literal `}`. */
  def resolveString(s: String, vars: Map[String, Any]): String = {
    val re = raw"\$$\{([A-Za-z_][A-Za-z0-9_]*)\}|\$$([A-Za-z_][A-Za-z0-9_]*)".r
    re.replaceAllIn(s, m => java.util.regex.Matcher.quoteReplacement({
      val name = Option(m.group(1)).getOrElse(m.group(2))
      vars.get(name).map(_.toString).getOrElse(m.matched)
    }))
  }

  // ------------------------------------------------------------------
  private sealed trait Tok
  private case class TIdent(s: String) extends Tok
  private case class TVar(s: String) extends Tok
  private case class TNum(s: String) extends Tok
  private case class TStr(s: String) extends Tok
  private case class TOp(s: String) extends Tok
  private case object TEOF extends Tok

  /** A compiled sub-expression; `lit` carries the raw literal value when
    * the sub-expression was a single literal token (some dialect methods —
    * format strings, split separators — need the value at plan time).
    * `stringy` marks a KNOWN-string sub-expression (a string literal, a
    * string variable, or a concat chain) — it is what routes `+` to
    * concatenation (OrientDB and JS semantics) instead of the numeric
    * add that would cast a string operand to null. */
  private case class Arg(col: Column, lit: Option[Any] = None,
                         stringy: Boolean = false,
                         arrayish: Boolean = false) {
    def litStr(what: String): String = lit match {
      case Some(v) => v.toString
      case None => throw new IllegalArgumentException(s"OrientExpr: $what must be a literal")
    }
  }

  /** Dialect methods with a STRING result — their chains participate in
    * `+`-as-concatenation like string literals do. */
  private val StringMethods: Set[String] = Set(
    "trim", "ltrim", "rtrim", "touppercase", "tolowercase", "append",
    "prefix", "substring", "left", "right", "charat", "replace",
    "normalize", "hash", "asstring", "tostring", "format", "tojson",
    "padstart", "padend", "repeat", "slice", "concat", "join")

  private final class Parser(src: String, vars: Map[String, Any]) {
    private val toks = lex(src)
    private var pos = 0
    /** In-scope lambda parameters of `.map(x -> …)`/`.filter(x -> …)`
      * bodies — bare identifiers resolve here BEFORE falling back to
      * record columns. */
    private var lambdaVars: Map[String, Column] = Map.empty
    private def peek: Tok = if (pos < toks.length) toks(pos) else TEOF
    private def next(): Tok = { val t = peek; pos += 1; t }
    private def expect(op: String): Unit = next() match {
      case TOp(`op`) => ()
      case t => fail(s"expected '$op' but got $t")
    }
    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"OrientExpr: $msg in <<$src>>")

    def parseFull(): Arg = {
      val c = parseOr()
      if (peek != TEOF) fail(s"trailing tokens from $peek")
      c
    }

    private def parseOr(): Arg = {
      var l = parseAnd()
      while (peekKw("OR")) { next(); l = Arg(l.col || parseAnd().col) }
      l
    }
    private def parseAnd(): Arg = {
      var l = parseNot()
      while (peekKw("AND")) { next(); l = Arg(l.col && parseNot().col) }
      l
    }
    private def parseNot(): Arg =
      if (peekKw("NOT")) { next(); Arg(!parseNot().col) } else parseCmp()

    private def peekKw(kw: String): Boolean = peek match {
      case TIdent(s) => s.equalsIgnoreCase(kw)
      case _ => false
    }

    private def parseCmp(): Arg = {
      val l = parseAdd()
      peek match {
        case TOp("=") | TOp("==") => next(); Arg(l.col === parseAdd().col)
        case TOp("<>") | TOp("!=") => next(); Arg(l.col =!= parseAdd().col)
        case TOp("<=") => next(); Arg(l.col <= parseAdd().col)
        case TOp(">=") => next(); Arg(l.col >= parseAdd().col)
        case TOp("<")  => next(); Arg(l.col < parseAdd().col)
        case TOp(">")  => next(); Arg(l.col > parseAdd().col)
        case TIdent(s) if s.equalsIgnoreCase("LIKE") =>
          next(); val p = parseAdd(); Arg(l.col.like(p.litStr("LIKE pattern")))
        case TIdent(s) if s.equalsIgnoreCase("IN") =>
          // both delimiters: `IN (a, b)` (SQL) and `IN [a, b]` (the
          // OrientDB collection-literal form the reference configs use)
          next()
          val close = next() match {
            case TOp("(") => ")"
            case TOp("[") => "]"
            case t => fail(s"expected ( or [ after IN, got $t")
          }
          val items = if (peek == TOp(close)) Nil else parseArgs()
          expect(close)
          if (items.isEmpty) Arg(lit(false)) // empty list matches nothing
          else Arg(items.map(i => l.col === i.col).reduceLeft(_ || _))
        case TIdent(s) if s.equalsIgnoreCase("IS") =>
          next()
          if (peekKw("NOT")) { next(); kwNull(); Arg(l.col.isNotNull) }
          else { kwNull(); Arg(l.col.isNull) }
        case _ => l
      }
    }
    private def kwNull(): Unit = next() match {
      case TIdent(s) if s.equalsIgnoreCase("NULL") => ()
      case t => fail(s"expected NULL, got $t")
    }

    private def parseAdd(): Arg = {
      var l = parseMul()
      var cont = true
      while (cont) peek match {
        case TOp("+") =>
          next(); val r = parseMul()
          // `+` with a known-string side concatenates (OrientDB / JS
          // semantics); numeric-vs-string typing of bare COLUMNS is
          // unknowable at parse time — those keep numeric add, use
          // .append()/format() for column-column string concat.
          // Known deviation: numeric rendering follows Spark's string
          // cast (whole doubles concat as '5.0'), not JS's '5' — use
          // .asLong()/.format() for JS-exact rendering
          l = if (l.stringy || r.stringy)
            Arg(concat(l.col.cast("string"), r.col.cast("string")), stringy = true)
          else Arg(l.col + r.col)
        case TOp("-") => next(); l = Arg(l.col - parseMul().col)
        case _ => cont = false
      }
      l
    }
    private def parseMul(): Arg = {
      var l = parseUnary()
      var cont = true
      while (cont) peek match {
        case TOp("*") => next(); l = Arg(l.col * parseUnary().col)
        case TOp("/") => next(); l = Arg(l.col / parseUnary().col)
        case TOp("%") => next(); l = Arg(l.col % parseUnary().col)
        case _ => cont = false
      }
      l
    }
    private def parseUnary(): Arg = peek match {
      case TOp("-") =>
        next()
        val a = parsePostfix()
        // a negated literal stays a literal (`round(x, -2)`,
        // `slice(-3)`'s loud guard)
        Arg(lit(0) - a.col, a.lit.map(v => s"-$v"))
      case _ => parsePostfix()
    }

    /** primary followed by zero or more `.method(args)` / `.field` /
      * `[index]` hops. */
    private def parsePostfix(): Arg = {
      var c = parsePrimary()
      var cont = true
      while (cont) peek match {
        case TOp(".") =>
          next()
          val name = next() match {
            case TIdent(s) => s
            case t => fail(s"expected method/field after '.', got $t")
          }
          if (peek == TOp("(")) {
            next()
            val lname = name.toLowerCase
            if (LambdaMethods(lname) && peekIsLambda) {
              // `.map(x -> expr)` / `.filter(x -> cond)` /
              // `.flatMap(x -> arr)` / `.some(x -> cond)` /
              // `.every(x -> cond)` / `.find(x -> cond)` → the Catalyst
              // array HOFs (transform/filter/flatten/exists/forall) —
              // codegen'd per-row, no UDF. Spark invokes the body
              // builder exactly once at plan construction, so the
              // parser advances over the body once.
              val param = next() match {
                case TIdent(s) => s
                case t => fail(s"expected lambda parameter, got $t")
              }
              expect("->")
              def body(x: Column): Column = {
                val saved = lambdaVars
                lambdaVars = lambdaVars + (param -> x)
                try parseOr().col finally lambdaVars = saved
              }
              val res = lname match {
                case "map" => transform(c.col, body _)
                case "filter" => filter(c.col, body _)
                case "flatmap" => flatten(transform(c.col, body _))
                case "some" => exists(c.col, body _)
                case "every" => forall(c.col, body _)
                // JS find: first match or undefined → element 0 of the
                // filtered array, null when nothing matched
                case "find" => get(filter(c.col, body _), lit(0))
              }
              expect(")")
              c = Arg(res, arrayish = Set("map", "filter", "flatmap")(lname))
            } else if (lname == "reduce" && peekIsParenLambda) {
              // `.reduce((acc, x) -> expr, init)` → Catalyst aggregate()
              // (codegen'd fold, no UDF). The body tokens are consumed
              // once with throwaway bindings to find their extent, then
              // re-parsed when aggregate() invokes the merge builder —
              // Spark calls it exactly once at plan construction.
              expect("(")
              val accP = next() match {
                case TIdent(s) => s
                case t => fail(s"expected reduce accumulator parameter, got $t")
              }
              expect(",")
              val elemP = next() match {
                case TIdent(s) => s
                case t => fail(s"expected reduce element parameter, got $t")
              }
              expect(")"); expect("->")
              val bodyStart = pos
              def bodyAt(start: Int)(acc: Column, x: Column): Column = {
                val savedPos = pos; val savedVars = lambdaVars
                pos = start
                lambdaVars = lambdaVars + (accP -> acc) + (elemP -> x)
                try parseOr().col
                finally { pos = savedPos; lambdaVars = savedVars }
              }
              // advance past the body (throwaway bindings)
              {
                val savedVars = lambdaVars
                lambdaVars = lambdaVars + (accP -> lit(0)) + (elemP -> lit(0))
                try { parseOr(); () } finally lambdaVars = savedVars
              }
              expect(",")
              val init = parseOr()
              expect(")")
              c = Arg(aggregate(c.col, init.col, bodyAt(bodyStart) _))
            } else {
              val args = parseArgs(); expect(")")
              val lname2 = name.toLowerCase
              (if (c.arrayish) arrayMethod(c.col, lname2, args) else None) match {
                case Some(r) =>
                  c = Arg(r, stringy = lname2 == "join",
                    arrayish = ArrayPreserving(lname2))
                case None =>
                  c = Arg(method(c.col, name, args),
                    stringy = StringMethods(lname2),
                    arrayish = lname2 == "split")
              }
            }
          } else c = Arg(c.col.getField(name))
        case TOp("[") =>
          // JS array indexing: 0-based; out-of-range AND negative
          // indices yield null — exactly JS `undefined`. functions.get
          // gives that directly (element_at is 1-based, throws
          // INVALID_ARRAY_INDEX under Spark 4's default ANSI mode, and
          // counts negatives from the end — all silently different).
          next(); val idx = parseOr(); expect("]")
          if (idx.stringy)
            fail("[...] indexing is 0-based numeric (JS array semantics)")
          c = Arg(get(c.col, idx.col.cast("int")))
        case _ => cont = false
      }
      c
    }

    private def peekIsLambda: Boolean = peek match {
      case TIdent(_) => pos + 1 < toks.length && toks(pos + 1) == TOp("->")
      case _ => false
    }

    /** Single-param lambda methods → Catalyst array HOFs. */
    private val LambdaMethods: Set[String] =
      Set("map", "filter", "flatmap", "some", "every", "find")

    /** `(acc, x) ->` — the two-param lambda head of `.reduce`. */
    private def peekIsParenLambda: Boolean =
      peek == TOp("(") &&
        toks.lift(pos + 1).exists(_.isInstanceOf[TIdent]) &&
        toks.lift(pos + 2).contains(TOp(",")) &&
        toks.lift(pos + 3).exists(_.isInstanceOf[TIdent]) &&
        toks.lift(pos + 4).contains(TOp(")")) &&
        toks.lift(pos + 5).contains(TOp("->"))

    /** Array methods whose result is still an array (chains keep the
      * array-typed dispatch). */
    private val ArrayPreserving: Set[String] =
      Set("slice", "concat", "sort", "reverse", "flat", "distinct")

    /** Array-typed method dispatch — used when the TARGET is statically
      * known to be an array (a literal, a `.map`/`.filter` chain, or
      * `.split`'s result). Names shared with the string table
      * (includes/indexOf/slice/concat/length) get their JS Array
      * semantics here; unknown names fall through to the generic table
      * (`.join` keeps its null-preserving rendering there). A column
      * reference's type is unknown at parse time, so bare array COLUMNS
      * still take the string table — chain through `.filter(x -> true)`
      * or a literal to assert arrayness. */
    private def arrayMethod(target: Column, name: String,
                            args: List[Arg]): Option[Column] = (name, args) match {
      case ("includes", Seq(a)) => Some(array_contains(target, a.col))
      // 0-based like JS, -1 absent (array_position is 1-based, 0 absent)
      case ("indexof", Seq(a)) => Some(array_position(target, a.col) - 1)
      case ("length", Nil) | ("size", Nil) => Some(size(target))
      // full JS slice semantics: negative indices count from the end
      // (clamped at 0), end is clamped at length, and a crossed range
      // (end <= start) yields [] — Spark's slice() would instead throw
      // on a non-positive length, and its own negative-start rule is
      // off-by-one vs JS
      case ("slice", as) if as.size == 1 || as.size == 2 =>
        val n = size(target)
        def jsIdx(c: Column, outOfRange: Column): Column = {
          val i = c.cast("int")
          when(i >= 0, least(i, outOfRange)).otherwise(greatest(n + i, lit(0)))
        }
        val s0 = jsIdx(as.head.col, n)
        val e0 = as.lift(1).map(b => jsIdx(b.col, n)).getOrElse(n)
        Some(slice(target, s0 + lit(1), greatest(e0 - s0, lit(0))))
      case ("concat", as) if as.nonEmpty =>
        Some(concat(target +: as.map(_.col): _*))
      // array_sort is TYPED (numeric arrays sort numerically) — the one
      // deliberate divergence from JS's string-coercing default sort,
      // which no config intends
      case ("sort", Nil) => Some(array_sort(target))
      case ("reverse", Nil) => Some(reverse(target))
      case ("flat", Nil) => Some(flatten(target))
      case ("distinct", Nil) => Some(array_distinct(target))
      case _ => None
    }

    private def parseArgs(): List[Arg] = {
      if (peek == TOp(")")) return Nil
      // single-literal args keep their `lit` payload all the way up from
      // parsePrimary — no re-attachment needed here
      val buf = scala.collection.mutable.ListBuffer(parseOr())
      while (peek == TOp(",")) { next(); buf += parseOr() }
      buf.toList
    }

    private def parsePrimary(): Arg = next() match {
      case TNum(s) =>
        val c = if (s.contains('.') || s.toLowerCase.contains('e')) lit(s.toDouble)
                else { val v = s.toLong; if (v >= Int.MinValue && v <= Int.MaxValue) lit(v.toInt) else lit(v) }
        Arg(c, Some(s))
      case TStr(s) => Arg(lit(s), Some(s), stringy = true)
      case TVar(name) =>
        vars.get(name) match {
          case Some(c: Column) => Arg(c)
          case Some(v) => Arg(lit(v), Some(v), stringy = v.isInstanceOf[String])
          case None => fail(s"unbound variable $$$name")
        }
      case TIdent(s) if s.equalsIgnoreCase("null")  => Arg(lit(null))
      case TIdent(s) if s.equalsIgnoreCase("true")  => Arg(lit(true))
      case TIdent(s) if s.equalsIgnoreCase("false") => Arg(lit(false))
      case TIdent(name) if lambdaVars.contains(name) => Arg(lambdaVars(name))
      case TIdent(name) if peek == TOp("(") =>
        next(); val args = parseArgs(); expect(")")
        Arg(freeFunction(name, args),
          stringy = Set("string", "format", "uuid")(name.toLowerCase))
      case TIdent(name) => Arg(col(name))
      // parens keep literal/stringy/arrayish payloads — `('x') + col`
      // must still concatenate (object-member inlining parenthesizes)
      case TOp("(") => val c = parseOr(); expect(")"); c
      case TOp("[") =>
        // collection literal `[a, b, c]` (the OrientDB/JS array form) —
        // elements are full expressions; empty `[]` is an empty array
        if (peek == TOp("]")) { next(); Arg(array(), arrayish = true) }
        else {
          val buf = scala.collection.mutable.ListBuffer(parseOr())
          while (peek == TOp(",")) { next(); buf += parseOr() }
          expect("]")
          Arg(array(buf.map(_.col).toSeq: _*), arrayish = true)
        }
      case t => fail(s"unexpected token $t")
    }

    /** Free functions of the dialect → Spark built-ins. */
    private def freeFunction(name: String, args: List[Arg]): Column =
      (name.toLowerCase, args) match {
        case ("sysdate", Nil)           => current_timestamp()
        case ("date", Seq(a))           => to_date(a.col)
        case ("date", Seq(a, f))        => to_date(a.col, f.litStr("date format"))
        case ("coalesce", as)           => coalesce(as.map(_.col): _*)
        case ("ifnull", Seq(a, b))      => coalesce(a.col, b.col)
        case ("if", Seq(c, t, f))       => when(c.col, t.col).otherwise(f.col)
        case ("abs", Seq(a))            => abs(a.col)
        case ("floor", Seq(a))          => floor(a.col)
        case ("ceil", Seq(a))           => ceil(a.col)
        case ("round", Seq(a))          => round(a.col)
        case ("round", Seq(a, n))       => round(a.col, n.litStr("round scale").toInt)
        case ("sqrt", Seq(a))           => sqrt(a.col)
        case ("pow", Seq(a, b))         => pow(a.col, b.col)
        case ("power", Seq(a, b))       => pow(a.col, b.col)
        case ("exp", Seq(a))            => exp(a.col)
        case ("ln", Seq(a))             => log(a.col)      // natural log
        case ("log10", Seq(a))          => log10(a.col)
        case ("sign", Seq(a))           => signum(a.col)
        case ("min", as) if as.size > 1 => least(as.map(_.col): _*)
        case ("max", as) if as.size > 1 => greatest(as.map(_.col): _*)
        case ("format", f :: a)         => format_string(f.litStr("format"), a.map(_.col): _*)
        // the ES5 global conversion functions (the JS shim's `String(x)`
        // etc.; also valid dialect): String → cast, Number/parseFloat →
        // double, parseInt → truncate-toward-zero long (JS semantics for
        // numeric input; digit-prefix parsing of arbitrary strings is
        // out of scope — a non-numeric string casts to null)
        case ("string", Seq(a))         => a.col.cast("string")
        case ("number", Seq(a))         => a.col.cast("double")
        case ("parsefloat", Seq(a))     => a.col.cast("double")
        case ("parseint", Seq(a))       => a.col.cast("double").cast("long")
        case ("uuid", Nil)              => expr("uuid()")
        case _ => fail(s"unknown function $name/${args.size}")
      }

    /** Method-chain dialect → Spark built-ins.
      * Surface: OrientDB OSQLMethod* dialect subset used by the reference's
      * shipped configs plus the common string/number/cast methods. */
    private def method(target: Column, name: String, args: List[Arg]): Column =
      (name.toLowerCase, args) match {
        case ("trim", Nil)             => trim(target)
        case ("ltrim", Nil)            => ltrim(target)
        case ("rtrim", Nil)            => rtrim(target)
        case ("touppercase", Nil)      => upper(target)
        case ("tolowercase", Nil)      => lower(target)
        case ("append", Seq(a))        => concat(target, a.col)
        case ("prefix", Seq(a))        => concat(a.col, target)
        case ("substring", Seq(a))     => target.substr(a.col + lit(1), length(target))
        case ("substring", Seq(a, b))  => target.substr(a.col + lit(1), b.col - a.col) // java [from,to)
        case ("left", Seq(n))          => target.substr(lit(1), n.col)
        // start clamps to 1: Spark substr counts a NON-positive start
        // from the string's end, so right(n) on a string shorter than n
        // would return a 1-char garbage suffix instead of the whole value
        case ("right", Seq(n))         =>
          target.substr(greatest(lit(1), length(target) - n.col + 1), n.col)
        case ("charat", Seq(i))        => target.substr(i.col + lit(1), lit(1))
        case ("indexof", Seq(s))       => locate(s.litStr("indexOf arg"), target) - 1 // 0-based, -1 absent
        case ("length", Nil) | ("size", Nil) => length(target)
        case ("replace", Seq(a, b)) =>
          // BOTH sides are literal text: an unquoted replacement would
          // interpret $n / backslashes as group references
          regexp_replace(target,
            java.util.regex.Pattern.quote(a.litStr("replace from")),
            java.util.regex.Matcher.quoteReplacement(b.litStr("replace to")))
        case ("split", Seq(sep))       => split(target, java.util.regex.Pattern.quote(sep.litStr("separator")))
        case ("normalize", Nil)        => trim(target)
        case ("hash", Nil)             => md5(target.cast("string"))
        case ("hash", Seq(alg))        => alg.litStr("hash alg").toLowerCase match {
          case "md5" => md5(target.cast("string"))
          case "sha-256" | "sha256" => sha2(target.cast("string"), 256)
          case a => fail(s"unsupported hash $a")
        }
        // JS-string surface (the code-shim's method chains; also valid
        // dialect): semantics follow JavaScript where they differ from
        // SQL — padStart/padEnd never truncate a longer string
        case ("startswith", Seq(a))    => target.startsWith(a.col)
        case ("endswith", Seq(a))      => target.endsWith(a.col)
        case ("includes", Seq(a))      => target.contains(a.col)
        case ("contains", Seq(a))      => target.contains(a.col)
        case ("padstart", Seq(n)) =>
          val len = n.litStr("padStart length").toInt
          when(length(target) >= len, target).otherwise(lpad(target, len, " "))
        case ("padstart", Seq(n, p)) =>
          val len = n.litStr("padStart length").toInt
          when(length(target) >= len, target)
            .otherwise(lpad(target, len, p.litStr("pad string")))
        case ("padend", Seq(n)) =>
          val len = n.litStr("padEnd length").toInt
          when(length(target) >= len, target).otherwise(rpad(target, len, " "))
        case ("padend", Seq(n, p)) =>
          val len = n.litStr("padEnd length").toInt
          when(length(target) >= len, target)
            .otherwise(rpad(target, len, p.litStr("pad string")))
        case ("repeat", Seq(n))        => repeat(target, n.litStr("repeat count").toInt)
        case ("tostring", Nil)         => target.cast("string")
        // non-negative-index slice = Java substring semantics; a
        // LITERAL negative index fails loud (substr's from-end counting
        // is off by one vs JS slice — silently wrong data otherwise);
        // non-literal indices are the caller's contract
        case ("slice", as) if as.size == 1 || as.size == 2 =>
          as.foreach(_.lit match {
            case Some(v) if v.toString.matches("-\\d+.*") =>
              fail(s"slice($v): negative JS indices are not translated — " +
                "compute from .length() explicitly (e.g. " +
                "x.substring(x.length() - 3))")
            case _ => ()
          })
          if (as.size == 1) target.substr(as.head.col + lit(1), length(target))
          else target.substr(as.head.col + lit(1), as(1).col - as.head.col)
        case ("concat", as) if as.nonEmpty => concat(target +: as.map(_.col): _*)
        case ("asstring", Nil)         => target.cast("string")
        case ("asinteger", Nil)        => target.cast("int")
        case ("aslong", Nil)           => target.cast("long")
        case ("asfloat", Nil)          => target.cast("float")
        case ("asdouble", Nil)         => target.cast("double")
        // DECIMAL means exact decimal semantics (OrientDB converts via
        // BigDecimal; a double cast would reintroduce binary rounding —
        // the CLAUDE.md hash-exact-oracle rule)
        case ("asdecimal", Nil)        => target.cast("decimal(38,18)")
        case ("asboolean", Nil)        => target.cast("boolean")
        case ("asdate", Nil)           => to_date(target)
        case ("asdatetime", Nil)       => to_timestamp(target)
        // OrientDB's format() is String.format for %-patterns and a
        // date formatter otherwise (OSQLMethodFormat dispatches on the
        // target; the pattern shape is the plan-time signal we have)
        case ("format", Seq(f)) =>
          val fmt = f.litStr("format")
          if (fmt.contains('%')) format_string(fmt, target)
          else date_format(target, fmt)
        case ("tojson", Nil)           => to_json(target)
        // JS Array.prototype.join — element-wise string render + concat;
        // no-arg join uses JS's ',' default. nullReplacement "" keeps
        // separators for null elements ([1,null,2] → "1,,2" like JS;
        // Spark's 2-arg form would drop them → "1,2").
        case ("join", Nil)             =>
          array_join(target.cast("array<string>"), ",", "")
        case ("join", Seq(sep))        =>
          array_join(target.cast("array<string>"), sep.litStr("join separator"), "")
        case _ => fail(s"unknown method .$name/${args.size}")
      }
  }

  // ------------------------------------------------------------------
  private def lex(src: String): Vector[Tok] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Tok]
    var i = 0
    val n = src.length
    def isIdentStart(c: Char) = c.isLetter || c == '_' || c == '@'
    def isIdent(c: Char) = c.isLetterOrDigit || c == '_' || c == '@'
    while (i < n) {
      val c = src(i)
      if (c.isWhitespace) i += 1
      else if (c == '\'' || c == '"') {
        val quote = c
        val sb = new StringBuilder
        i += 1
        while (i < n && src(i) != quote) {
          if (src(i) == '\\' && i + 1 < n) {
            // control-character escapes decode (OrientDB string
            // semantics); anything else (\' \" \\) keeps the escaped char
            sb.append(src(i + 1) match {
              case 'n' => '\n'; case 't' => '\t'; case 'r' => '\r'
              case other => other
            })
            i += 2
          }
          else { sb.append(src(i)); i += 1 }
        }
        if (i >= n) throw new IllegalArgumentException(s"OrientExpr: unterminated string in <<$src>>")
        i += 1
        out += TStr(sb.toString)
      } else if (c == '$') {
        i += 1
        val braced = i < n && src(i) == '{'
        if (braced) i += 1
        val start = i
        while (i < n && isIdent(src(i))) i += 1
        val name = src.substring(start, i)
        if (braced) { require(i < n && src(i) == '}', s"unclosed $${ in <<$src>>"); i += 1 }
        out += TVar(name)
      } else if (c.isDigit) {
        val start = i
        while (i < n && (src(i).isDigit ||
               (src(i) == '.' && i + 1 < n && src(i + 1).isDigit) ||
               ((src(i) == 'e' || src(i) == 'E') && i + 1 < n && (src(i + 1).isDigit || src(i + 1) == '-')) ||
               (src(i) == '-' && i > start && (src(i - 1) == 'e' || src(i - 1) == 'E')))) i += 1
        out += TNum(src.substring(start, i))
      } else if (isIdentStart(c)) {
        val start = i
        while (i < n && isIdent(src(i))) i += 1
        out += TIdent(src.substring(start, i))
      } else {
        val two = if (i + 1 < n) src.substring(i, i + 2) else ""
        if (Set("<>", "!=", "<=", ">=", "==", "->").contains(two)) { out += TOp(two); i += 2 }
        else { out += TOp(c.toString); i += 1 }
      }
    }
    out.toVector
  }
}
