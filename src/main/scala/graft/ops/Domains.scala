package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-domain document caps — the crawl-curation op that keeps one host
  * from dominating a pretraining mix (a handful of mega-domains can be
  * half a raw crawl). Deterministic: within a domain the `cap` smallest
  * doc ids are kept, so reruns and resumes agree.
  *
  * Scale shape: "keep the first `cap` per domain" is windowed top-k, and
  * a `row_number() over (partition by domain)` window would sort EVERY
  * row of a mega-domain in one task. The keep set is instead built with
  * the bounded-heap aggregate ([[TopK]]): map-side partial combine caps
  * each task's state at `cap` ids per domain before the shuffle, so the
  * exchange carries O(cap · domains · partitions) ids and no
  * single-domain hotspot exists. Flags then come back via a keyed join
  * on the unique id.
  */
object Domains {

  /** Registrable host of a URL, lowercased: scheme and userinfo stripped,
    * port/path/query/fragment cut. Empty string for non-URLs (RE2-safe
    * pattern — anchors + character classes only, no backreferences — so
    * the DuckDB oracle evaluates it identically).
    */
  def domainOf(url: Column): Column =
    lower(regexp_extract(url,
      "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)", 1))

  /** SURT key (Sort-friendly URI Reordering Transform — the Internet
    * Archive's canonical crawl-index key, the first field of every CDX
    * line): host labels reversed and comma-joined, `)`, then the path —
    * `https://www.example.org/page/1` → `org,example,www)/page/1`.
    * Reversing the labels makes one registrable domain's URLs sort
    * CONTIGUOUSLY, so a crawl index laid out by SURT range-prunes
    * per-domain scans at 100 TB (the same reason the Z-order/Hilbert
    * keys exist for numeric dims). Scheme, userinfo and port are
    * dropped per the public SURT convention; lowercased; query string
    * kept (it distinguishes resources). RE2-safe patterns shared
    * verbatim with the oracle.
    */
  def surtKey(url: Column): Column = {
    val rest = regexp_replace(lower(coalesce(url, lit(""))),
      "^[a-z][a-z0-9+.-]*://(?:[^/@]*@)?", "")
    val host = regexp_extract(rest, "^([^/:?#]+)", 1)
    val tail = regexp_replace(rest, "^[^/:?#]+(:[0-9]+)?", "")
    concat(array_join(reverse(split(host, "\\.")), ","), lit(")"), tail)
  }

  /** URL canonicalization for dedup keys (the CCNet/RefinedWeb-style
    * pre-dedup step): lowercase, drop the fragment, strip tracking
    * parameters (utm_*, gclid, fbclid), drop `www.` and the
    * scheme-matched default port, trim a trailing slash. This is a
    * DEDUP KEY, not a display URL — lowercasing the path is deliberate
    * (case-variant duplicates should collide).
    *
    * Anchoring matters: a tracking name must sit immediately after its
    * `?`/`&` delimiter (`?my_gclid=1` is NOT gclid; a `utm_x=` inside a
    * param VALUE is data), the port strip applies only to the authority
    * and only to the scheme's own default (`http://x:443` stays — that
    * is a different resource), and `www.` only at the host front. All
    * patterns are RE2-safe (no lookaround/backrefs in the PATTERN) so
    * the DuckDB oracle runs the same strings; only the replacement
    * backreference syntax differs (`$1` Java, `\1` RE2).
    */
  def canonicalizeUrl(url: Column): Column = {
    val lowered = lower(coalesce(url, lit("")))
    val noFrag = regexp_replace(lowered, "#.*$", "")
    // strip each delimiter-anchored tracking param, keeping the delimiter
    val noTrack = regexp_replace(noFrag,
      "([?&])(utm_[a-z0-9]+|gclid|fbclid)=[^&#]*", "$1")
    // collapse delimiter runs the removals left behind, then bare tails
    val tidy = regexp_replace(regexp_replace(regexp_replace(noTrack,
      "\\?&+", "?"), "&&+", "&"), "[?&]+$", "")
    val noWww = regexp_replace(tidy, "^(https?://)www\\.", "$1")
    val noP80 = regexp_replace(noWww,
      "^(http://(?:[^/?#]*@)?[^/:?#]+):80([/?]|$)", "$1$2")
    val noP443 = regexp_replace(noP80,
      "^(https://(?:[^/?#]*@)?[^/:?#]+):443([/?]|$)", "$1$2")
    regexp_replace(noP443, "/$", "")
  }

  /** Adds `domain`, `domain_rank` (1-based among kept rows, null for
    * dropped) and `kept`; rows beyond `cap` in a domain get dropped with
    * first-match-wins semantics left to the caller ([[Filters]] chains).
    */
  def capPerDomain(df: DataFrame, urlCol: String, idCol: String,
                   cap: Int): DataFrame = {
    require(cap > 0, "cap must be positive")
    val withDom = df.withColumn("domain", domainOf(col(urlCol)))
    // TopK orders by (score DESC, id ASC); a constant score makes it
    // exactly "cap smallest ids per domain"
    val kept = withDom
      .groupBy("domain")
      .agg(TopK.topK(cap)(lit(0.0), col(idCol).cast("long")).as("t"))
      .select(col("domain"), posexplode(col("t.items")))
      .select(col("col.vec_id").as("__kept_id"),
        (col("pos") + 1).cast("long").as("domain_rank"))
    withDom
      .join(kept, col(idCol).cast("long") === col("__kept_id"), "left")
      .withColumn("kept", col("__kept_id").isNotNull)
      .drop("__kept_id")
  }

  /** RefinedWeb-style domain-level quality gating: aggregate a per-doc
    * boolean quality verdict (e.g. the Gopher gate) to its domain and
    * block domains whose pass RATE falls below the threshold — the
    * step that removes a spam farm wholesale where per-doc rules only
    * trim it. Emitting the decision as a (domain, blocked) table is
    * deliberate: it broadcast-joins back to the corpus as a filter, and
    * it IS the artifact curation teams review and version.
    *
    * One keyed aggregate (map-side partial: count + sum of 0/1), output
    * rows = |domains| — a sliver at any corpus size.
    */
  def domainQualityBlocklist(df: DataFrame, urlCol: String,
                             keepCol: String,
                             minKeepRateQ: Long = 5000L): DataFrame =
    df.select(domainOf(col(urlCol)).as("domain"),
        when(col(keepCol), 1L).otherwise(0L).as("__k"))
      .groupBy("domain")
      .agg(count(lit(1)).as("n_docs"), sum("__k").as("n_keep"))
      .withColumn("keep_rate_q",
        floor(col("n_keep").cast("double") * 10000.0 /
          col("n_docs").cast("double")).cast("long"))
      .withColumn("blocked", col("keep_rate_q") < minKeepRateQ)
}
