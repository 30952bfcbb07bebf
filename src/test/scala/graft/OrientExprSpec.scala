package graft

import graft.expr.OrientExpr
import org.apache.spark.sql.functions._

class OrientExprSpec extends SparkSpec {
  import spark.implicits._

  private def eval1(src: String, vars: Map[String, Any] = Map.empty): Any =
    spark.range(1).select(OrientExpr.compile(src, vars).as("v")).head().get(0)

  test("literals and arithmetic") {
    assert(eval1("1 + 2 * 3") == 7)
    assert(eval1("(1 + 2) * 3") == 9)
    assert(eval1("10 / 4") == 2.5)
    assert(eval1("10 % 3") == 1)
    assert(eval1("-5 + 2") == -3)
    assert(eval1("1.5 + 0.25") == 1.75)
    assert(eval1("'a'") == "a")
    assert(eval1("true") == true)
  }

  test("string method chains — the reference's dialect surface") {
    assert(eval1("'  x  '.trim()") == "x")
    assert(eval1("'ab'.append('cd')") == "abcd")        // config.json:5 style
    assert(eval1("'cd'.prefix('ab')") == "abcd")
    assert(eval1("'hello'.toUpperCase()") == "HELLO")
    assert(eval1("'HELLO'.toLowerCase()") == "hello")
    assert(eval1("'hello'.substring(1, 3)") == "el")    // java [from,to)
    assert(eval1("'hello'.substring(2)") == "llo")
    assert(eval1("'hello'.left(2)") == "he")
    assert(eval1("'hello'.right(2)") == "lo")
    assert(eval1("'hello'.indexOf('ll')") == 2)          // 0-based
    assert(eval1("'hello'.indexOf('zz')") == -1)
    assert(eval1("'hello'.length()") == 5)
    assert(eval1("'a.b.c'.replace('.', '-')") == "a-b-c") // literal, not regex
    assert(eval1("'  x '.trim().append('!')") == "x!")   // chaining
    assert(eval1("'42'.asInteger()") == 42)
    assert(eval1("'4.5'.asDouble()") == 4.5)
  }

  test("variables: $var and ${var}") {
    assert(eval1("$name.append('!')", Map("name" -> "bob")) == "bob!")
    assert(eval1("${name}", Map("name" -> "bob")) == "bob")
    assert(eval1("$n + 1", Map("n" -> 41)) == 42)
    intercept[IllegalArgumentException](eval1("$missing"))
  }

  test("comparisons, boolean logic, is null, like, in") {
    assert(eval1("1 < 2 AND 2 <= 2") == true)
    assert(eval1("1 > 2 OR 2 >= 3 OR 1 = 1") == true)
    assert(eval1("1 <> 2") == true)
    assert(eval1("NOT (1 = 2)") == true)
    assert(eval1("null is null") == true)
    assert(eval1("'x' is not null") == true)
    assert(eval1("'hello' LIKE 'he%'") == true)
    assert(eval1("2 IN (1, 2, 3)") == true)
    assert(eval1("5 IN (1, 2, 3)") == false)
  }

  test("free functions") {
    assert(eval1("coalesce(null, 'x')") == "x")
    assert(eval1("ifnull(null, 7)") == 7)
    assert(eval1("if(1 < 2, 'yes', 'no')") == "yes")
    assert(eval1("abs(0 - 5)") == 5)
    assert(eval1("min(3, 1, 2)") == 1)
    assert(eval1("max(3, 1, 2)") == 3)
    assert(eval1("format('%s-%d', 'a', 1)") == "a-1")
    assert(eval1("sysdate()").isInstanceOf[java.sql.Timestamp])
  }

  test("field references compile against a real frame") {
    val df = Seq((1, "  Bob "), (2, "Ann")).toDF("id", "name")
    val out = df.select(OrientExpr.compile("name.trim().toUpperCase()").as("v"))
      .as[String].collect().toSeq
    assert(out == Seq("BOB", "ANN"))
    val filtered = df.filter(OrientExpr.compile("id > 1 AND name is not null"))
    assert(filtered.count() == 1)
  }

  test("resolveString interpolation — OAbstractETLComponent semantics") {
    val vars = Map[String, Any]("fileName" -> "data.csv", "n" -> 3)
    assert(OrientExpr.resolveString("/tmp/$fileName", vars) == "/tmp/data.csv")
    assert(OrientExpr.resolveString("${fileName}.gz", vars) == "data.csv.gz")
    assert(OrientExpr.resolveString("x$n", vars) == "x3")
    assert(OrientExpr.resolveString("$unknown stays", vars) == "$unknown stays")
    // the closing brace belongs to the string unless the opening brace
    // was present — `$var}` keeps the literal `}`
    assert(OrientExpr.resolveString("{$n}", vars) == "{3}")
    assert(OrientExpr.resolveString("a$n}b", vars) == "a3}b")
  }

  test("review-fix semantics: replace/right/IN/escapes/format/asDecimal") {
    // replacement text with $ / backslash is literal, not a group ref
    assert(eval1("'price'.replace('r', '$5')") == "p$5ice")
    assert(eval1("'a-b'.replace('-', '\\\\')") == "a\\b")
    // right(n) clamps when the value is shorter than n
    assert(eval1("'hello'.right(7)") == "hello")
    assert(eval1("'hello'.right(2)") == "lo")
    // IN accepts both SQL parens and OrientDB bracket lists; empty → false
    assert(eval1("2 IN (1, 2, 3)") == true)
    assert(eval1("2 IN [1, 2, 3]") == true)
    assert(eval1("5 IN [1, 2, 3]") == false)
    assert(eval1("5 IN []") == false)
    // control-character escapes decode in string literals
    assert(eval1("'a\\nb'") == "a\nb")
    assert(eval1("'a\\tb'") == "a\tb")
    // format(): %-patterns are String.format, others date patterns
    assert(eval1("3.14159.format('%.2f')") == "3.14")
    // asDecimal keeps exact decimal semantics (no binary double rounding)
    val d = eval1("'0.1'.asDecimal() + '0.2'.asDecimal()")
    assert(d.toString.toDouble == 0.3)
  }

  test("stringy +: a string operand concatenates; pure numerics still add") {
    assert(eval1("'a' + 'b'") == "ab")
    assert(eval1("'n=' + 5") == "n=5")
    assert(eval1("5 + '!'") == "5!")
    assert(eval1("'x' + 1 + 2") == "x12") // left-assoc: concat stays concat
    assert(eval1("1 + 2") == 3)
    assert(eval1("1 + 2 + 'm'") == "3m") // numeric prefix folds FIRST
    // string-returning method chains participate
    assert(eval1("'ab'.toUpperCase() + 'c'") == "ABc")
    assert(eval1("5.asString() + 'x'") == "5x")
    // a numeric-returning method keeps numeric +
    assert(eval1("'7'.asLong() + 1") == 8L)
    // math functions (round-11 dialect additions)
    assert(eval1("floor(3.9)") == 3L)
    assert(eval1("ceil(3.1)") == 4L)
    assert(eval1("sqrt(16)") == 4.0)
    assert(eval1("pow(2, 10)") == 1024.0)
    assert(eval1("sign(-9)") == -1.0)
    assert(eval1("round(2.567, 2)") == 2.57)
    // negated literals keep their literal payload: negative round
    // scales work; a negative slice index fails LOUD (silent off-by-one
    // from Spark's from-end substr otherwise)
    assert(eval1("round(1234.5, -2)") == 1200.0)
    val e = intercept[Exception](eval1("'ABCDEF'.slice(-3)"))
    assert(e.getMessage.contains("negative"), e.getMessage)
    // ES5 global conversions (the JS shim surface)
    assert(eval1("String(42)") == "42")
    assert(eval1("Number('2.5')") == 2.5)
    assert(eval1("parseFloat('1.25')") == 1.25)
    assert(eval1("parseInt('7.9')") == 7L)  // truncates toward zero
    assert(eval1("parseInt(-3.7)") == -3L)
    assert(eval1("String(5) + 'x'") == "5x") // String(...) is stringy
  }

  test("JS array surface: literals, 0-based indexing, map/filter, join") {
    // literals — empty, expression elements, nesting
    assert(eval1("[]") == Seq())
    assert(eval1("[1 + 1, 2 * 2]") == Seq(2, 4))
    assert(eval1("[10, 20, 30][0]") == 10)
    assert(eval1("[10, 20, 30][2]") == 30)
    // out-of-range and negative indices → null (JS undefined), even
    // under Spark 4's default ANSI mode — functions.get, not element_at
    assert(eval1("[10, 20, 30][5]") == null)
    assert(eval1("[10, 20, 30][-1]") == null)
    // dynamic index, including a dynamic value that lands out of range
    assert(eval1("[10, 20, 30][$i]", Map("i" -> 1)) == 20)
    assert(eval1("[10, 20, 30][$i]", Map("i" -> 9)) == null)
    // a string index is a named error, not silent weirdness
    val ie = intercept[Exception](eval1("[1, 2]['a']"))
    assert(ie.getMessage.contains("0-based numeric"), ie.getMessage)
    // map/filter lambdas → Catalyst transform/filter (codegen'd)
    assert(eval1("[1, 2, 3].map(x -> x * 2)") == Seq(2, 4, 6))
    assert(eval1("[1, 2, 3, 4].filter(x -> x % 2 = 0)") == Seq(2, 4))
    // chains, column references inside the body, nested lambdas
    assert(eval1("[1, 2, 3].map(x -> x + 10).filter(y -> y > 11)") == Seq(12, 13))
    assert(eval1("[1, 2, 3].map(x -> x + id)") == Seq(1, 2, 3)) // id = 0
    assert(eval1("[[1, 2], [3]].map(a -> a.filter(y -> y > 1))") ==
      Seq(Seq(2), Seq(3)))
    // the lambda parameter shadows an outer column name, then unwinds
    assert(eval1("[5].map(id -> id * 2)[0]") == 10)
    // join: JS semantics — default ',', null elements keep separators
    assert(eval1("['a', 'b'].join('-')") == "a-b")
    assert(eval1("['a', 'b'].join()") == "a,b")
    assert(eval1("['a', null, 'b'].join('-')") == "a--b")
    assert(eval1("[1, 2, 3].map(x -> x * x).join('+')") == "1+4+9")
  }

  test("JS array surface: typed method dispatch, reduce, chains") {
    // array-typed dispatch on statically-known arrays: includes/indexOf/
    // length take JS Array semantics, not the string table's
    assert(eval1("[1, 2, 3].includes(2)") == true)
    assert(eval1("[1, 2, 3].includes(9)") == false)
    assert(eval1("['a', 'b'].indexOf('b')") == 1L)
    assert(eval1("['a', 'b'].indexOf('z')") == -1L)
    assert(eval1("[4, 5, 6].length()") == 3)
    // slice/concat/sort/reverse/flat/distinct — array results chain
    assert(eval1("[10, 20, 30, 40].slice(1)") == Seq(20, 30, 40))
    assert(eval1("[10, 20, 30, 40].slice(1, 3)") == Seq(20, 30))
    // full JS slice semantics: negatives count from the end, end clamps
    // to length, crossed/out-of-range indices yield [] (not an error)
    assert(eval1("[1, 2, 3].slice(-2)") == Seq(2, 3))
    assert(eval1("[1, 2, 3].slice(0, -1)") == Seq(1, 2))
    assert(eval1("[1, 2, 3].slice(-2, -1)") == Seq(2))
    assert(eval1("[1, 2, 3].slice(2, 1)") == Seq())
    assert(eval1("[1, 2, 3].slice(5)") == Seq())
    assert(eval1("[1, 2, 3].slice(-9, 2)") == Seq(1, 2))
    assert(eval1("[1, 2, 3].slice(1, 99)") == Seq(2, 3))
    assert(eval1("[1, 2].concat([3, 4])") == Seq(1, 2, 3, 4))
    assert(eval1("[3, 1, 2].sort()") == Seq(1, 2, 3))
    assert(eval1("[1, 2, 3].reverse()") == Seq(3, 2, 1))
    assert(eval1("[[1], [2, 3]].flat()") == Seq(1, 2, 3))
    assert(eval1("[1, 1, 2].distinct()") == Seq(1, 2))
    assert(eval1("[3, 1, 2].sort().reverse().join('-')") == "3-2-1")
    // split's result is an array — array dispatch kicks in
    assert(eval1("'a,b,c'.split(',').length()") == 3)
    assert(eval1("'a,b,c'.split(',').includes('b')") == true)
    assert(eval1("'a,b,c'.split(',').slice(1).join('')") == "bc")
    // reduce: two-param lambda folds via Catalyst aggregate()
    assert(eval1("[1, 2, 3, 4].reduce((a, x) -> a + x, 0)") == 10)
    assert(eval1("[2, 3, 4].reduce((a, x) -> a * x, 1)") == 24)
    assert(eval1("[1, 2, 3].map(x -> x * 2).reduce((a, x) -> a + x, 100)") == 112)
    assert(eval1("['x', 'y'].reduce((a, s) -> a.append(s), '')") == "xy")
    // string methods still dispatch stringwise on strings
    assert(eval1("'hello'.includes('ell')") == true)
    assert(eval1("'hello'.slice(1, 3)") == "el")
    // some/every/find/flatMap lambdas → exists/forall/get∘filter/flatten
    assert(eval1("[1, 2, 3].some(x -> x > 2)") == true)
    assert(eval1("[1, 2, 3].some(x -> x > 9)") == false)
    assert(eval1("[2, 4, 6].every(x -> x % 2 = 0)") == true)
    assert(eval1("[2, 3, 6].every(x -> x % 2 = 0)") == false)
    assert(eval1("[1, 7, 3, 9].find(x -> x > 2)") == 7)
    assert(eval1("[1, 2].find(x -> x > 9)") == null) // JS undefined
    assert(eval1("[1, 2, 3].flatMap(x -> [x, x * 10])") ==
      Seq(1, 10, 2, 20, 3, 30))
    assert(eval1("[1, 2].flatMap(x -> [x, x + 1]).distinct().join('-')") == "1-2-3")
  }
}
