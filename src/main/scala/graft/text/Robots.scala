package graft.text

/** robots.txt evaluation (RFC 9309, public) — the third leg of crawl
  * hygiene next to `urlnormalize`/`urlfilter`: a fetched corpus is
  * joined to its per-host robots cache and every URL gets an
  * allowed/blocked verdict for the configured agent.
  *
  * Parsing: line-oriented `field: value` records; `user-agent` lines
  * open a group (consecutive agent lines share the following rules);
  * the MOST SPECIFIC matching group wins outright (exact agent name,
  * case-insensitive, else `*`; a page governed by a specific group
  * ignores `*` entirely — RFC 9309 §2.2.1). Comments (`#`) strip.
  *
  * Matching: `allow`/`disallow` values are path patterns with `*`
  * (any span) and a final `$` (end anchor); the LONGEST matching
  * pattern wins, `allow` winning length ties (§2.2.2); an empty
  * `disallow:` matches nothing; no matching rule → allowed.
  */
object Robots {

  final case class Rule(allow: Boolean, pattern: String)

  /** Rules of the group governing `agent` (lowercased), RFC precedence. */
  def rulesFor(robotsTxt: String, agent: String): Seq[Rule] = {
    val a = agent.toLowerCase(java.util.Locale.ROOT)
    var exact = List.empty[Rule]
    var star = List.empty[Rule]
    var sawExact = false
    var current: List[String] = Nil       // agents of the OPEN group
    var collecting = false                // rules seen since the agent lines
    // RFC 9309 §2.2.1 token match, tightened to TOKEN boundaries: the
    // group's token must equal the agent or be a whole-token prefix of
    // it (next agent char not alphanumeric — `googlebot` governs
    // `googlebot-images` but `g` does NOT govern `graftbot`)
    def isMine(agents: List[String]): (Boolean, Boolean) =
      (agents.exists(g => g.nonEmpty && g != "*" &&
        (g == a || (a.startsWith(g) &&
          !Character.isLetterOrDigit(a.charAt(g.length))))),
       agents.contains("*"))
    for (raw <- robotsTxt.split("\r?\n")) {
      val line = raw.indexOf('#') match {
        case -1 => raw.trim
        case h => raw.substring(0, h).trim
      }
      val c = line.indexOf(':')
      if (c > 0) {
        val field = line.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(c + 1).trim
        field match {
          case "user-agent" =>
            if (collecting) { current = Nil; collecting = false }
            current ::= value.toLowerCase(java.util.Locale.ROOT)
          case "allow" | "disallow" =>
            collecting = true
            val (mine, isStar) = isMine(current)
            // empty patterns match nothing (§2.2.2) — but the group
            // still EXISTS (an agent with only `disallow:` is allow-all
            // and must eclipse the `*` group)
            val rule = Rule(field == "allow", value)
            if (mine) { sawExact = true; if (value.nonEmpty) exact ::= rule }
            else if (isStar && value.nonEmpty) star ::= rule
          case _ => collecting = true // sitemap/crawl-delay etc end agent runs
        }
      }
    }
    if (sawExact) exact.reverse else star.reverse
  }

  /** Does `pattern` (with `*` spans and optional trailing `$`) match a
    * prefix of `path`? Greedy backtracking scan — patterns are tiny. */
  private[text] def matches(pattern: String, path: String): Boolean = {
    val anchored = pattern.endsWith("$")
    val p = if (anchored) pattern.dropRight(1) else pattern
    val parts = p.split("\\*", -1)
    var pos = 0
    var i = 0
    while (i < parts.length) {
      val part = parts(i)
      if (i == 0) {
        if (!path.startsWith(part)) return false
        pos = part.length
      } else {
        val at = path.indexOf(part, pos)
        if (at < 0) return false
        pos = at + part.length
      }
      i += 1
    }
    // a final '*' already consumed the tail; otherwise an anchored
    // pattern must land exactly at the end — including the bare `$`
    // pattern, which matches ONLY the empty path (an `isEmpty` escape
    // here would turn `Disallow: $` into disallow-everything)
    if (anchored && !p.endsWith("*")) pos == path.length
    else true
  }

  /** RFC 9309 §2.2.2 verdict: longest matching pattern wins, allow
    * wins ties, no match → allowed. */
  def allowed(rules: Seq[Rule], path: String): Boolean = {
    var bestLen = -1
    var bestAllow = true
    for (r <- rules if matches(r.pattern, path)) {
      val l = r.pattern.length
      if (l > bestLen || (l == bestLen && r.allow && !bestAllow)) {
        bestLen = l; bestAllow = r.allow
      }
    }
    bestAllow
  }

  def check(robotsTxt: String, agent: String, path: String): Boolean =
    allowed(rulesFor(robotsTxt, agent), path)

  // per-executor parse cache: robots bodies repeat once per HOST while
  // rows repeat per PAGE — parsing per row would re-tokenize the same
  // few thousand bodies millions of times. Bounded; cleared when full.
  private val cache = new java.util.concurrent.ConcurrentHashMap[(String, String), Seq[Rule]]()
  def checkCached(robots: org.apache.spark.unsafe.types.UTF8String,
                  agent: String,
                  path: org.apache.spark.unsafe.types.UTF8String): Boolean = {
    val key = (robots.toString, agent)
    var rules = cache.get(key)
    if (rules == null) {
      if (cache.size() > 10000) cache.clear()
      rules = rulesFor(key._1, agent)
      cache.put(key, rules)
    }
    allowed(rules, path.toString)
  }
}

/** Codegen'd RFC 9309 verdict: `graft_robots_allowed(path, robotsTxt)`
  * with the agent a plan-time literal — see [[Robots]]. */
case class RobotsAllowed(path: org.apache.spark.sql.catalyst.expressions.Expression,
                         robots: org.apache.spark.sql.catalyst.expressions.Expression,
                         agent: String)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  import org.apache.spark.sql.catalyst.expressions.Expression
  import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
  import org.apache.spark.sql.types._

  override def left: Expression = path
  override def right: Expression = robots
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (path.dataType == StringType && robots.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string path, string robots)")
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_robots_allowed"
  override def nullSafeEval(p: Any, r: Any): Any =
    Robots.checkCached(r.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      agent, p.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val a = ctx.addReferenceObj("robotsAgent", agent, "java.lang.String")
    defineCodeGen(ctx, ev, (p, r) =>
      s"graft.text.Robots.checkCached($r, $a, $p)")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RobotsAllowed =
    copy(path = newLeft, robots = newRight)
}
