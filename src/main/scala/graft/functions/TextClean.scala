package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Corpus-cleaning primitives for training-data pipelines: PII
  * redaction, HTML/boilerplate stripping, URL parsing/filtering.
  * The reference pipelines documents through scio's map/filter verbs
  * with user lambdas (reference: scio-core SCollection map/filter);
  * graft ships the common cleaning verbs themselves as builtin
  * column expressions — every one is a regexp/string expr chain that
  * stays inside whole-stage codegen, no UDF serialization boundary.
  *
  * Pattern dialect note: every regex here restricts itself to the
  * syntax subset shared by java.util.regex (Spark executors) and RE2
  * (DuckDB oracle, Go/C++ tooling): no backreferences, no lookaround.
  * That keeps the semantics portable — the exact same pattern text is
  * embedded in the correctness oracle SQL.
  */
object TextClean {

  /** Email addresses (pragmatic RFC-5322 subset). */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** North-American-style phone numbers: optional +1/1 prefix,
    * optional parens on the area code, an optional separator after
    * it, and a MANDATORY ., - or space before the last 4 digits —
    * that final separator is the guard that keeps arbitrary 10+-digit
    * runs (ids, hashes, timestamps) from being redacted, at the cost
    * of missing fully separator-less phones ("4155551234"). The
    * pattern is deliberately unanchored (RE2 has no \b), so a
    * phone-shaped substring INSIDE a longer mixed token still
    * redacts; [[piiCounts]] audits exactly what [[redactPii]] did.
    */
  val PhoneRe = "(\\+?1[ .-]?)?(\\([0-9]{3}\\)|[0-9]{3})[ .-]?[0-9]{3}[ .-][0-9]{4}"

  /** IPv4 dotted quads (octet range enforced: 0-255). */
  val Ipv4Re =
    "(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])(\\.(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}"

  /** US-SSN-shaped ids: 3-2-4 digit groups with - separators. */
  val SsnRe = "[0-9]{3}-[0-9]{2}-[0-9]{4}"

  /** Replace each PII family with a typed placeholder token. Order
    * matters: SSN before phone (a 3-2-4 group must not be half-eaten
    * by the phone pattern), email before IP (a host part may embed
    * digit runs).
    */
  def redactPii(text: Column): Column = {
    val e = regexp_replace(text, EmailRe, "<EMAIL>")
    val s = regexp_replace(e, SsnRe, "<SSN>")
    val p = regexp_replace(s, PhoneRe, "<PHONE>")
    regexp_replace(p, Ipv4Re, "<IP>")
  }

  /** Per-family match counts (the audit row a redaction pass reports
    * alongside the rewrite): struct(n_emails, n_ssns, n_phones, n_ips).
    * Counted on the SAME progressively-redacted text the replacement
    * chain sees, so counts always agree with what [[redactPii]] did.
    */
  def piiCounts(text: Column): Column = {
    val e = regexp_replace(text, EmailRe, "<EMAIL>")
    val s = regexp_replace(e, SsnRe, "<SSN>")
    val p = regexp_replace(s, PhoneRe, "<PHONE>")
    struct(
      size(regexp_extract_all(text, lit(EmailRe), lit(0))).cast("long").as("n_emails"),
      size(regexp_extract_all(e, lit(SsnRe), lit(0))).cast("long").as("n_ssns"),
      size(regexp_extract_all(s, lit(PhoneRe), lit(0))).cast("long").as("n_phones"),
      size(regexp_extract_all(p, lit(Ipv4Re), lit(0))).cast("long").as("n_ips"))
  }

  /** Strip HTML down to visible text: drop script/style subtrees
    * (their text is code, not prose), then all remaining tags, then
    * HTML comments, decode the common entities, and collapse runs of
    * whitespace to single spaces. `(?s)` (dot-matches-newline) and
    * `(?i)` are both java.util.regex- and RE2-portable.
    */
  def stripHtml(html: Column): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTag = regexp_replace(noComment, "<[^>]+>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&") // &amp; LAST: it may produce '&' of other entities' text forms
      .foldLeft(noTag) { case (c, (ent, ch)) => regexp_replace(c, ent, ch) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** scheme://authority path ?query (fragment excluded by callers). */
  val UrlRe = "^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)\\??([^#]*)"

  /** Decompose a URL column into struct(scheme, host, path, query,
    * domain, tld). `domain` is the registrable-suffix heuristic
    * (last two host labels) — the shape a blocklist keys on.
    * Pure regexp_extract chain (codegen'd, portable dialect).
    */
  def urlParts(url: Column): Column = {
    val host = lower(regexp_extract(url, UrlRe, 2))
    // strip :port and userinfo@ from the authority
    val bare = regexp_extract(host, "([^@]*@)?([^:]*)", 2)
    val domain = regexp_extract(bare, "([^.]+\\.[^.]+)$", 1)
    struct(
      lower(regexp_extract(url, UrlRe, 1)).as("scheme"),
      bare.as("host"),
      regexp_extract(url, UrlRe, 3).as("path"),
      regexp_extract(url, UrlRe, 4).as("query"),
      domain.as("domain"),
      regexp_extract(bare, "\\.([^.]+)$", 1).as("tld"))
  }

  /** Canonicalize a URL into its dedup key: drop the fragment,
    * lowercase scheme and host, strip userinfo and the scheme's
    * default port (:80 http / :443 https — a NON-default port stays),
    * trim trailing slashes off the path (bare root stays "/"),
    * and drop tracking query params (utm_*, gclid, fbclid, ref)
    * preserving the order of the rest. Pure regexp/array exprs in the
    * shared java.regex/RE2 dialect — codegen'd, oracle-reproducible.
    */
  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*", "")
    val scheme = lower(regexp_extract(noFrag, UrlRe, 1))
    val auth = lower(regexp_extract(noFrag, UrlRe, 2))
    val hostport = regexp_extract(auth, "([^@]*@)?(.*)", 2)
    val host = when(scheme === "http", regexp_replace(hostport, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostport, ":443$", ""))
      .otherwise(hostport)
    val trimmed = regexp_replace(regexp_extract(noFrag, UrlRe, 3), "/+$", "")
    val path = when(trimmed === "", lit("/")).otherwise(trimmed)
    val params = filter(split(regexp_extract(noFrag, UrlRe, 4), "&"), p =>
      !(p.startsWith("utm_") || p.startsWith("gclid=") ||
        p.startsWith("fbclid=") || p.startsWith("ref=") || p === ""))
    val q = array_join(params, "&")
    concat(scheme, lit("://"), host, path,
      when(q === "", lit("")).otherwise(concat(lit("?"), q)))
  }

  /** Keep rows whose url's registrable domain is NOT in the blocklist
    * (C4-style source filtering). The blocklist is a literal array —
    * for big lists broadcast a frame and anti-join instead.
    */
  def filterByDomainBlocklist(urlCol: Column, blocked: Seq[String]): Column =
    !urlParts(urlCol).getField("domain").isin(blocked.map(_.toLowerCase): _*)

  /** Main-content extraction from HTML (boilerpipe/trafilatura-style
    * density heuristic, deterministic and regex-only): split the page
    * into blocks at block-level tags, strip inline markup per block,
    * and keep only TEXT-DENSE blocks — at least `minWords` words and
    * a link-to-word ratio of at most 1/3 (navigation/footer blocks
    * are short and link-saturated; prose is long and link-sparse).
    * Kept blocks join with newlines. Entities are NOT decoded here —
    * compose [[stripHtml]] downstream if needed. Script/style/comment
    * subtrees drop first (their text is code). Pure builtin
    * split/transform/filter chain in the java∩RE2 dialect, so the
    * oracle replays it exactly.
    */
  def extractMainContent(html: Column, minWords: Int = 5): Column = {
    val noScript = regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?is)<style[^>]*>.*?</style>", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val blocks = split(noComment,
      "(?i)</?(p|div|td|li|h[1-6]|section|article|header|footer|nav|table|ul|ol|blockquote)[^>]*>|<br[^>]*>")
    val kept = filter(blocks, b => {
      val text = regexp_replace(regexp_replace(b, "<[^>]+>", " "), "\\s+", " ")
      val words = size(split(trim(text), " ")) - when(trim(text) === "", 1).otherwise(0)
      val links = size(regexp_extract_all(b, lit("(?i)<a[ >]"), lit(0)))
      words >= minWords && links * 3 <= words
    })
    val texts = transform(kept,
      b => trim(regexp_replace(regexp_replace(b, "<[^>]+>", " "), "\\s+", " ")))
    array_join(texts, "\n")
  }

  /** Unicode NFC normalization (native codegen expression): the same
    * logical text arrives precomposed or decomposed from different
    * crawls — dedup keys built on raw bytes treat "é" (U+00E9) and
    * "é" as different documents. `graft_normalize(text, 'NFC')`
    * in SQL. Other forms via [[graft.expressions.UnicodeNormalize]].
    */
  def nfc(text: Column): Column =
    graft.expressions.UnicodeNormalize.normalizeF(text, "NFC")

  /** High-confidence cross-script homoglyphs → Latin (the Unicode
    * confusables pairs spam uses to evade dedup/filters: Cyrillic
    * а/е/о/р/с/у/х/і/ѕ/ј and uppercase, Greek Α-row capitals and
    * omicron). NFKC does NOT touch these — they are distinct letters,
    * not compatibility forms — so [[normalizeText]] alone leaves
    * "sраm" ≠ "spam". Paired `from`/`to` strings drive one builtin
    * `translate` (codegen'd, codepoint-wise in both engines).
    */
  val homoglyphFrom: String =
    "аеорсухіѕјАВЕКМНОРСТХУІЅЈ" + "οΑΒΕΖΗΙΚΜΝΟΡΤΥΧ"
  val homoglyphTo: String =
    "aeopcyxisjABEKMHOPCTXYISJ" + "oABEZHIKMNOPTYX"

  /** Fold cross-script homoglyphs to their Latin lookalikes — run
    * before/with [[normalizeText]] when building dedup keys for
    * adversarial corpora.
    */
  def foldHomoglyphs(text: Column): Column =
    translate(text, homoglyphFrom, homoglyphTo)

  /** Strip zero-width/invisible code points (ZWSP, ZWNJ, ZWJ, BOM,
    * word joiner, soft hyphen) — the other dedup-evasion vector
    * beside homoglyphs: invisible insertions change every hash while
    * rendering identically. Plain RE2-safe char class, codegen'd.
    */
  def stripInvisible(text: Column): Column =
    regexp_replace(text,
      "[\\x{200B}\\x{200C}\\x{200D}\\x{FEFF}\\x{2060}\\x{00AD}]", "")

  /** Full dedup-key canonicalization: NFKC-fold compatibility
    * variants (ﬁ → fi, fullwidth → ASCII), lowercase, strip
    * diacritics (NFD then drop combining marks — \p{Mn} is in the
    * java∩RE2 shared dialect), collapse whitespace runs, trim.
    * Everything after the two native normalize calls is builtin
    * regexp/string exprs — the whole chain codegens.
    */
  def normalizeText(text: Column): Column = {
    val folded = lower(graft.expressions.UnicodeNormalize.normalizeF(text, "NFKC"))
    val stripped = regexp_replace(
      graft.expressions.UnicodeNormalize.normalizeF(folded, "NFD"), "\\p{Mn}", "")
    trim(regexp_replace(stripped, "\\s+", " "))
  }
}
