package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection & masking (SURVEY.md §2.3 M7/M8).
  *
  * Patterns are behavioral data from the reference:
  *  - stage-2 simple hits: text_clean_and_filter.py:239-261
  *  - stage-3 detect/mask: deep_clean_and_pii.py:266-334
  *
  * Masking order matters and is preserved: email -> phone -> cc -> iban,
  * each replacement running over the already-masked text.
  */
object Pii {

  /** The email pattern stays the literal operator contract (and the
    * DuckDB oracle still runs it verbatim), but the Spark side
    * evaluates it through [[graft.plans.EmailScan]] — a linear-time
    * exact-semantics kernel — because under java.util.regex this is
    * the engine's one super-linear pattern (O(n²) on '@'-free runs of
    * local-part chars; see the kernel scaladoc and tools/RegexAudit).
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Stage-2 rough phone pattern. */
  val PhoneSimpleRe = "\\+?\\d[\\d\\- ]{7,}\\d"

  /** Stage-3 phone pattern (optional country/area prefixes). */
  val PhoneRe =
    "\\b(?:\\+?\\d{1,3}[\\s\\-\\.]?)?(?:\\(?\\d{2,4}\\)?[\\s\\-\\.]?)?\\d{3,4}[\\s\\-\\.]?\\d{3,4}\\b"

  val CreditCardRe = "\\b(?:\\d[ -]*?){13,16}\\b"

  val IbanRe = "\\b[A-Z]{2}\\d{2}[A-Z0-9]{10,30}\\b"

  private def hits(c: Column, pattern: String): Column =
    coalesce(regexp_count(c, lit(pattern)), lit(0))

  /** M7: stage-2 family — email/phone counts on the normalized text. */
  def emailHits(c: Column): Column =
    coalesce(graft.plans.EmailCount(c), lit(0))
  def phoneHitsSimple(c: Column): Column = hits(c, PhoneSimpleRe)

  /** M8: stage-3 family counts (run on text_deep_clean). */
  def piiEmailHits(c: Column): Column =
    coalesce(graft.plans.EmailCount(c), lit(0))
  def piiPhoneHits(c: Column): Column = hits(c, PhoneRe)
  def piiCcHits(c: Column): Column    = hits(c, CreditCardRe)
  def piiIbanHits(c: Column): Column  = hits(c, IbanRe)

  /** M8: mask chain in reference order over progressively-masked text. */
  def maskPii(c: Column): Column = {
    val e = graft.plans.EmailMask(c)
    val p = regexp_replace(e, PhoneRe, "<PHONE>")
    val cc = regexp_replace(p, CreditCardRe, "<CREDIT_CARD>")
    regexp_replace(cc, IbanRe, "<IBAN>")
  }

  /** has_pii = any of the four counters > 0. */
  def hasPii(email: Column, phone: Column, cc: Column, iban: Column): Column =
    (email + phone + cc + iban) > 0

  // ---- extended types (beyond ref: production pipelines also mask
  // network identifiers and national-id formats). RE2-safe (no
  // backrefs), so the DuckDB oracle runs the identical pattern.

  val IpRe = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
  val SsnRe = "\\b\\d{3}-\\d{2}-\\d{4}\\b"

  def piiIpHits(c: Column): Column  = hits(c, IpRe)
  def piiSsnHits(c: Column): Column = hits(c, SsnRe)

  /** Extended mask chain: email, then the SPECIFIC digit shapes (ip,
    * ssn), then the reference's general ones (phone, cc, iban).
    * Specific-before-general is load-bearing: PhoneRe accepts '.'
    * separators, so run after it an IP like 192.168.0.1 becomes
    * "<PHONE>.0.1" — masked placeholders contain no digits, so the
    * later general patterns can't re-match them (TextOpsSpec pins
    * these interactions). [[maskPii]] keeps the reference's exact
    * 4-type order; this chain is the beyond-ref superset.
    */
  def maskPiiExtended(c: Column): Column = {
    val e = graft.plans.EmailMask(c)
    val ip = regexp_replace(e, IpRe, "<IP>")
    val ssn = regexp_replace(ip, SsnRe, "<SSN>")
    val p = regexp_replace(ssn, PhoneRe, "<PHONE>")
    val cc = regexp_replace(p, CreditCardRe, "<CREDIT_CARD>")
    regexp_replace(cc, IbanRe, "<IBAN>")
  }
}
