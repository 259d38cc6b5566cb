package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** robots.txt compliance gating (RFC 9309, the Robots Exclusion
  * Protocol) — the legal/etiquette filter every crawl-derived corpus
  * runs before anything else: drop documents whose URL the origin's
  * robots.txt disallowed for your agent.
  *
  * Two layers:
  *  - [[parse]] / [[matches]] / [[isAllowed]]: a spec-faithful
  *    evaluator (group selection by longest user-agent match with `*`
  *    fallback; longest-match rule precedence; allow wins ties; `*`
  *    wildcards and `$` end-anchor; empty-pattern rules ignored) for
  *    per-document use against raw robots.txt payloads — e.g. the
  *    `robotstxt` records a crawl snapshot ships.
  *  - [[gate]]: the DISTRIBUTED shape — rules already extracted to a
  *    (host, rule_path, allow) table (robots files are a per-host dim
  *    table, thousands of rows where the crawl has billions), gated
  *    against the corpus with one broadcast prefix-match join and an
  *    argmax by (match length, allow): no shuffle on the corpus side,
  *    fully declarative, Catalyst-optimizable, and replayable in SQL —
  *    which is what makes [[graft.queries.WarcQueries]]'s robots gate
  *    oracle-checkable. Wildcard rules are the rare case in real
  *    robots data; route hosts that use them through [[isAllowed]].
  */
object Robots {

  /** One access rule: `allow=false` is `Disallow`. */
  final case class Rule(pattern: String, allow: Boolean)

  /** Caps: a hostile robots.txt cannot inflate state (RFC 9309 itself
    * requires parsers to accept at least 500 KiB; we stop there).
    */
  val MaxRules: Int = 4096
  val MaxBytes: Int = 512 * 1024

  /** Parse a robots.txt body into the rule list for `agent`: groups
    * are runs of `User-agent:` lines followed by rules; the group
    * whose agent token is the LONGEST case-insensitive substring of
    * our agent wins, `*` is the fallback, and multiple user-agent
    * lines naming the same group share its rules (RFC 9309 §2.2.1).
    * Unknown directives are ignored; malformed input yields whatever
    * rules parse — never throws.
    */
  def parse(robotsTxt: String, agent: String): Seq[Rule] = {
    if (robotsTxt == null) return Nil
    val body =
      if (robotsTxt.length > MaxBytes) robotsTxt.substring(0, MaxBytes)
      else robotsTxt
    val agentLc = Option(agent).getOrElse("*").toLowerCase
    // (specificity, rules) per group; specificity = matched UA length,
    // -1 for groups that do not apply, 0 for the `*` group
    var best = -1
    var bestRules = List.empty[Rule]
    var curSpec = -1
    var curRules = List.empty[Rule]
    var inAgentRun = false
    def closeGroup(): Unit = {
      if (curSpec > best ||
        (curSpec == best && curSpec >= 0 && bestRules.isEmpty)) {
        best = curSpec; bestRules = curRules.reverse
      }
      curSpec = -1; curRules = Nil
    }
    body.split("\r?\n").iterator.takeWhile(_ => curRules.size < MaxRules)
      .foreach { raw =>
        val line = raw.takeWhile(_ != '#').trim
        val i = line.indexOf(':')
        if (i > 0) {
          val key = line.substring(0, i).trim.toLowerCase
          val value = line.substring(i + 1).trim
          key match {
            case "user-agent" =>
              if (!inAgentRun) { closeGroup(); inAgentRun = true }
              val tok = value.toLowerCase
              val spec =
                if (tok == "*") 0
                else if (agentLc.contains(tok)) tok.length
                else -1
              if (spec > curSpec) curSpec = spec
            case "allow" | "disallow" =>
              inAgentRun = false
              // empty pattern = no rule (an empty Disallow allows all)
              if (value.nonEmpty && curSpec >= 0)
                curRules ::= Rule(value, key == "allow")
            case _ => inAgentRun = false
          }
        }
      }
    closeGroup()
    bestRules
  }

  /** RFC 9309 pattern match: literal except `*` (any run, including
    * empty) and a trailing `$` (end anchor). Greedy two-pointer walk —
    * linear in `path` per star, no regex, no backtracking blowup.
    */
  def matches(pattern: String, path: String): Boolean = {
    if (pattern == null || path == null) return false
    val anchored = pattern.endsWith("$")
    val pat = if (anchored) pattern.dropRight(1) else pattern
    val segs = pat.split("\\*", -1)
    var pos = 0
    var first = true
    for (seg <- segs.dropRight(1)) {
      if (first) {
        if (!path.startsWith(seg, pos)) return false
        pos += seg.length
        first = false
      } else if (seg.nonEmpty) {
        val j = path.indexOf(seg, pos)
        if (j < 0) return false
        pos = j + seg.length
      }
    }
    val last = segs.last
    if (first) {
      // no stars at all: plain prefix (or exact when anchored)
      if (anchored) path == pat else path.startsWith(pat)
    } else if (anchored) {
      last.isEmpty || (path.endsWith(last) &&
        path.length - last.length >= pos)
    } else {
      last.isEmpty || path.indexOf(last, pos) >= 0
    }
  }

  /** Longest-match evaluation (RFC 9309 §2.2.2): among the agent's
    * rules whose pattern matches the path, the longest pattern wins;
    * an allow/disallow tie at the same length resolves to ALLOW; no
    * matching rule means allowed.
    */
  def isAllowed(rules: Seq[Rule], path: String): Boolean = {
    var bestLen = -1
    var allow = true
    rules.foreach { r =>
      if (r.pattern.length >= bestLen && matches(r.pattern, path)) {
        if (r.pattern.length > bestLen) {
          bestLen = r.pattern.length; allow = r.allow
        } else if (r.allow) allow = true // tie -> allow wins
      }
    }
    allow
  }

  /** One-call convenience: parse + evaluate. */
  def isAllowed(robotsTxt: String, agent: String, path: String): Boolean =
    isAllowed(parse(robotsTxt, agent), path)

  /** Distributed robots gate over literal-prefix rules: `urls`
    * (…, hostCol, pathCol) gated against `rules`
    * (hostCol, `rule_path`, `allow`) — broadcast prefix join, then the
    * per-URL longest match via one struct-max aggregate (allow breaks
    * ties per the RFC). URLs whose host has no matching rule are
    * allowed. Output: `urls`' columns + `allowed`.
    *
    * 100 TB shape: robots rules are per-HOST state (a dim table),
    * so the corpus never shuffles — the rules broadcast, the prefix
    * condition runs in the join, and the aggregate's key is the URL
    * row id. Wildcard-using hosts (rare) go through [[isAllowed]].
    */
  def gate(urls: DataFrame, rules: DataFrame, hostCol: String = "host",
      pathCol: String = "path", idCol: String = "doc_id"): DataFrame = {
    val matched = urls
      .join(broadcast(rules),
        urls(hostCol) === rules(hostCol) &&
          startswith(col(pathCol), col("rule_path")),
        "left")
      .drop(rules(hostCol))
    val verdict: Column = max(
      when(col("rule_path").isNotNull,
        struct(length(col("rule_path")).as("len"),
          col("allow").cast("int").as("allow_i"))))
    matched
      .groupBy(idCol, hostCol, pathCol)
      .agg(verdict.as("__best"))
      .withColumn("allowed",
        coalesce(col("__best.allow_i") === 1, lit(true)))
      .drop("__best")
  }
}
