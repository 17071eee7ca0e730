package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.functions.TextClean
import QueryDsl._

/** Corpus-cleaning queries (PII redaction, HTML stripping, URL
  * parsing/filtering) over the `documents` table. The synthetic corpus
  * contains no PII/HTML/URLs, so each query first SYNTHESIZES the dirty
  * text deterministically from (doc_id, text) — with the exact same
  * string-building expression reproduced in the DuckDB oracle — then
  * applies the [[graft.functions.TextClean]] verbs. Every pattern in
  * TextClean restricts itself to the java.util.regex ∩ RE2 dialect, so
  * the oracle embeds the same pattern text verbatim.
  */
object TextCleanQueries extends QueryPack {

  /** doc_id as string, shared by both engines' concat chains. */
  private def id: Column = col("doc_id").cast("string")

  /** The synthesized PII-laden text: base text plus an email, a phone
    * (3-3-4 with parens), an every-third-row alt phone (+1 dotted), an
    * SSN-shaped id, and a valid dotted-quad IP — all derived from
    * doc_id so the oracle can rebuild the identical string.
    */
  private def dirtyPii: Column = concat(
    coalesce(col("text"), lit("")),
    lit(" contact user"), id, lit("@mail.example.com or call (415) 555-"),
    lpad((col("doc_id") % 10000).cast("string"), 4, "0"),
    when(col("doc_id") % 3 === 0, lit(" or +1 212.555.6789")).otherwise(lit("")),
    lit(" ssn "), (col("doc_id") % 900 + 100).cast("string"), lit("-45-6789 from 10."),
    (col("doc_id") % 256).cast("string"), lit(".0."), (col("doc_id") % 200).cast("string"))

  /** Same construction in DuckDB SQL (kept adjacent so drift is visible). */
  private val dirtyPiiSql: String =
    """coalesce(text, '') || ' contact user' || CAST(doc_id AS VARCHAR)
      | || '@mail.example.com or call (415) 555-'
      | || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
      | || CASE WHEN doc_id % 3 = 0 THEN ' or +1 212.555.6789' ELSE '' END
      | || ' ssn ' || CAST(doc_id % 900 + 100 AS VARCHAR) || '-45-6789 from 10.'
      | || CAST(doc_id % 256 AS VARCHAR) || '.0.' || CAST(doc_id % 200 AS VARCHAR)"""
      .stripMargin.replace("\n", "")

  /** Deterministic HTML wrapper: style + title in head, heading,
    * the document text as a paragraph, a comment, a script whose body
    * contains raw `<`/`&&` (must vanish with the subtree, not leak),
    * and entity-encoded trailing text.
    */
  private def dirtyHtml: Column = concat(
    lit("<html><head><style>p{color:red}</style><title>Doc "), id,
    lit("</title></head><body><h1>Doc "), id, lit("</h1><p>"),
    coalesce(col("text"), lit("")),
    lit("</p><!-- trailer "), id,
    lit(" --><script type=\"text/javascript\">var x = 1 < 2 && y > 0;</script>"),
    lit("&amp; &lt;fin&gt;&nbsp;&quot;q&quot; &#39;s&#39;</body></html>"))

  private val dirtyHtmlSql: String =
    """'<html><head><style>p{color:red}</style><title>Doc ' || CAST(doc_id AS VARCHAR)
      | || '</title></head><body><h1>Doc ' || CAST(doc_id AS VARCHAR) || '</h1><p>'
      | || coalesce(text, '')
      | || '</p><!-- trailer ' || CAST(doc_id AS VARCHAR)
      | || ' --><script type="text/javascript">var x = 1 < 2 && y > 0;</script>'
      | || '&amp; &lt;fin&gt;&nbsp;&quot;q&quot; &#39;s&#39;</body></html>'"""
      .stripMargin.replace("\n", "")

  /** Synthetic URL with scheme/userinfo/case/port/path/query/fragment
    * variety, including an every-fourth-row blocklisted tracker domain.
    */
  private def dirtyUrl: Column = concat(
    when(col("doc_id") % 3 === 0, lit("https"))
      .when(col("doc_id") % 3 === 1, lit("http")).otherwise(lit("ftp")),
    lit("://"),
    when(col("doc_id") % 5 === 0, concat(lit("user"), id, lit(":pw@"))).otherwise(lit("")),
    when(col("doc_id") % 4 === 0, concat(lit("www.site"), (col("doc_id") % 50).cast("string"), lit(".example.com")))
      .when(col("doc_id") % 4 === 1, concat(lit("Site"), (col("doc_id") % 50).cast("string"), lit(".Example.COM")))
      .when(col("doc_id") % 4 === 2, concat(lit("cdn.site"), (col("doc_id") % 50).cast("string"), lit(".co.uk")))
      .otherwise(lit("bad-ads.tracker.net")),
    when(col("doc_id") % 7 === 0, lit(":8443")).otherwise(lit("")),
    lit("/p/"), id,
    when(col("doc_id") % 2 === 0, lit("/index.html")).otherwise(lit("")),
    when(col("doc_id") % 2 === 0, concat(lit("?q="), (col("doc_id") % 7).cast("string"), lit("&lang=en"))).otherwise(lit("")),
    when(col("doc_id") % 6 === 0, concat(lit("#sec"), (col("doc_id") % 3).cast("string"))).otherwise(lit("")))

  private val dirtyUrlSql: String =
    """CASE WHEN doc_id % 3 = 0 THEN 'https' WHEN doc_id % 3 = 1 THEN 'http' ELSE 'ftp' END
      | || '://'
      | || CASE WHEN doc_id % 5 = 0 THEN 'user' || CAST(doc_id AS VARCHAR) || ':pw@' ELSE '' END
      | || CASE WHEN doc_id % 4 = 0 THEN 'www.site' || CAST(doc_id % 50 AS VARCHAR) || '.example.com'
      |         WHEN doc_id % 4 = 1 THEN 'Site' || CAST(doc_id % 50 AS VARCHAR) || '.Example.COM'
      |         WHEN doc_id % 4 = 2 THEN 'cdn.site' || CAST(doc_id % 50 AS VARCHAR) || '.co.uk'
      |         ELSE 'bad-ads.tracker.net' END
      | || CASE WHEN doc_id % 7 = 0 THEN ':8443' ELSE '' END
      | || '/p/' || CAST(doc_id AS VARCHAR)
      | || CASE WHEN doc_id % 2 = 0 THEN '/index.html' ELSE '' END
      | || CASE WHEN doc_id % 2 = 0 THEN '?q=' || CAST(doc_id % 7 AS VARCHAR) || '&lang=en' ELSE '' END
      | || CASE WHEN doc_id % 6 = 0 THEN '#sec' || CAST(doc_id % 3 AS VARCHAR) ELSE '' END"""
      .stripMargin.replace("\n", "")

  /** URL with case/userinfo/port/trailing-slash/tracking-param/
    * fragment variety for the canonicalization query.
    */
  private def messyUrl: Column = concat(
    when(col("doc_id") % 4 === 0, lit("https"))
      .when(col("doc_id") % 4 === 1, lit("HTTP"))
      .when(col("doc_id") % 4 === 2, lit("http")).otherwise(lit("HTTPS")),
    lit("://"),
    when(col("doc_id") % 5 === 0, lit("User:Pw@")).otherwise(lit("")),
    lit("WWW.Site"), (col("doc_id") % 30).cast("string"), lit(".Example.com"),
    when(col("doc_id") % 3 === 0, lit(":443"))
      .when(col("doc_id") % 3 === 1, lit(":80")).otherwise(lit(":8080")),
    lit("/Path/"), (col("doc_id") % 20).cast("string"),
    when(col("doc_id") % 2 === 0, lit("/")).otherwise(lit("")),
    when(col("doc_id") % 2 === 0,
      concat(lit("?utm_source=x&q="), (col("doc_id") % 7).cast("string"),
        lit("&utm_medium=y&gclid=abc")))
      .when(col("doc_id") % 3 === 0, lit("?ref=home")).otherwise(lit("")),
    when(col("doc_id") % 6 === 0, lit("#frag")).otherwise(lit("")))

  private val messyUrlSql: String =
    """CASE WHEN doc_id % 4 = 0 THEN 'https' WHEN doc_id % 4 = 1 THEN 'HTTP'
      |      WHEN doc_id % 4 = 2 THEN 'http' ELSE 'HTTPS' END
      | || '://'
      | || CASE WHEN doc_id % 5 = 0 THEN 'User:Pw@' ELSE '' END
      | || 'WWW.Site' || CAST(doc_id % 30 AS VARCHAR) || '.Example.com'
      | || CASE WHEN doc_id % 3 = 0 THEN ':443' WHEN doc_id % 3 = 1 THEN ':80' ELSE ':8080' END
      | || '/Path/' || CAST(doc_id % 20 AS VARCHAR)
      | || CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END
      | || CASE WHEN doc_id % 2 = 0
      |        THEN '?utm_source=x&q=' || CAST(doc_id % 7 AS VARCHAR) || '&utm_medium=y&gclid=abc'
      |        WHEN doc_id % 3 = 0 THEN '?ref=home' ELSE '' END
      | || CASE WHEN doc_id % 6 = 0 THEN '#frag' ELSE '' END"""
      .stripMargin.replace("\n", "")

  /** Multi-line text: the doc body plus a corpus-wide footer, an
    * every-other-doc banner, and a per-doc unique line.
    */
  private def multiLine: Column = concat(
    coalesce(col("text"), lit("")), lit("\nCOMMON FOOTER\n"),
    when(col("doc_id") % 2 === 0, lit("EVEN BANNER\n")).otherwise(lit("")),
    lit("unique "), id)

  private val multiLineSql: String =
    """coalesce(text, '') || chr(10) || 'COMMON FOOTER' || chr(10)
      | || CASE WHEN doc_id % 2 = 0 THEN 'EVEN BANNER' || chr(10) ELSE '' END
      | || 'unique ' || CAST(doc_id AS VARCHAR)"""
      .stripMargin.replace("\n", "")

  /** Accent/compatibility-laden text: decomposed e+acute (NFC composes
    * to é), precomposed é (stays), A+combining ring (→ Å), the
    * Angstrom sign U+212B (NFC maps it to Å U+00C5), and on even rows
    * a ﬁ ligature (NFC must PRESERVE it — compatibility folding is
    * NFKC's job). Oracle rebuilds the identical string via chr().
    */
  private def dirtyUni: Column = concat(
    coalesce(col("text"), lit("")),
    lit(" cafe\u0301 \u00e9 A\u030a \u212b"),
    when(col("doc_id") % 2 === 0, lit(" ligature \ufb01n")).otherwise(lit("")))

  private val dirtyUniSql: String =
    """coalesce(text, '') || ' caf' || chr(101) || chr(769) || ' ' || chr(233)
      | || ' A' || chr(778) || ' ' || chr(8491)
      | || CASE WHEN doc_id % 2 = 0 THEN ' ligature ' || chr(64257) || 'n' ELSE '' END"""
      .stripMargin.replace("\n", "")

  override val queries: Map[String, Q] = Map(

    // Unicode NFC canonicalization (native codegen expression) —
    // byte-level dedup keys for text that arrives precomposed vs
    // decomposed. Length shrink proves real composition happened.
    // cross-script homoglyph folding: text seeded with Cyrillic
    // lookalikes folds back to clean Latin; the oracle carries the
    // SAME from/to table (interpolated from the Scala constants, so
    // the two can never drift).
    "q_homoglyph" -> { (s, dir) =>
      tables(s, dir).documents
        .select(col("doc_id"),
          TextClean.foldHomoglyphs(
            translate(col("text"), "aeopc", "аеорс")).as("restored"))
        .orderBy(col("doc_id"))
    },

    // main-content extraction: the doc text wrapped in a page with a
    // link-saturated nav and footer; only the dense prose block
    // survives the density filter.
    "q_main_content" -> { (s, dir) =>
      val page = concat(
        lit("<html><body><nav><a href=\"/\">Home</a> <a href=\"/a\">About</a> " +
          "<a href=\"/b\">More</a></nav><p>"),
        coalesce(col("text"), lit("")),
        lit("</p><div><a href=\"/1\">one</a> <a href=\"/2\">two</a></div>" +
          "<footer>(c) site footer</footer></body></html>"))
      tables(s, dir).documents
        .select(col("doc_id"), TextClean.extractMainContent(page).as("main"))
        .orderBy(col("doc_id"))
    },

    // zero-width-evasion strip: ZWSP seeded before every space
    // disappears; cleaned text equals the original.
    "q_invisible" -> { (s, dir) =>
      tables(s, dir).documents
        .select(col("doc_id"),
          TextClean.stripInvisible(
            regexp_replace(col("text"), " ", "\u200B ")).as("cleaned"))
        .orderBy(col("doc_id"))
    },

    "q_normalize" -> { (s, dir) =>
      tables(s, dir).documents
        .filter(col("doc_id") <= 400)
        .select(col("doc_id"),
          TextClean.nfc(dirtyUni).as("norm"),
          length(dirtyUni).cast("long").as("raw_len"),
          length(TextClean.nfc(dirtyUni)).cast("long").as("norm_len"))
        .orderBy(col("doc_id"))
    },

    // URL canonicalization → dedup keys: per-row canonical form plus
    // the corpus-level collapse count the dedup pass would key on.
    "q_url_canon" -> { (s, dir) =>
      tables(s, dir).documents
        .filter(col("doc_id") <= 400)
        .select(col("doc_id"), TextClean.canonicalizeUrl(messyUrl).as("canon"))
        .orderBy(col("doc_id"))
    },

    // incremental corpus diff: the "new crawl" drops every 10th doc,
    // edits every 7th, and adds shifted ids for every 13th — each
    // reconstruction deterministic in both engines.
    "q_corpus_diff" -> { (s, dir) =>
      val docs = tables(s, dir).documents
      val newCrawl = docs
        .filter(col("doc_id") % 10 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 7 === 0, concat(coalesce(col("text"), lit("")), lit(" edited")))
            .otherwise(col("text")).as("text"))
        .union(docs.filter(col("doc_id") % 13 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      graft.dedup.Dedup.corpusDiff(docs, newCrawl, "doc_id", "text")
        .groupBy(col("status")).agg(count(lit(1)).as("n"),
          min(col("id")).as("min_id"), max(col("id")).as("max_id"))
        .orderBy(col("status"))
    },

    // C4-style line-level dedup over synthesized multi-line docs:
    // corpus-duplicated lines survive only in the min-id owner doc.
    "q_line_dedup" -> { (s, dir) =>
      val docs = tables(s, dir).documents
        .select(col("doc_id"), multiLine.as("text"))
      graft.dedup.Dedup.dedupLines(docs, "doc_id", "text")
        .orderBy(col("id"))
    },

    // PII redaction + per-family audit counts. Codegen'd regexp chain,
    // no shuffle besides the final presentation sort.
    "q_pii_redact" -> { (s, dir) =>
      val c = TextClean.piiCounts(dirtyPii)
      tables(s, dir).documents
        .filter(col("doc_id") <= 400)
        .select(col("doc_id"), TextClean.redactPii(dirtyPii).as("redacted"),
          c.getField("n_emails").as("n_emails"), c.getField("n_ssns").as("n_ssns"),
          c.getField("n_phones").as("n_phones"), c.getField("n_ips").as("n_ips"))
        .orderBy(col("doc_id"))
    },

    // HTML → visible text: script/style subtrees dropped, tags and
    // comments stripped, common entities decoded, whitespace collapsed.
    "q_strip_html" -> { (s, dir) =>
      tables(s, dir).documents
        .filter(col("doc_id") <= 400)
        .select(col("doc_id"), TextClean.stripHtml(dirtyHtml).as("clean"))
        .orderBy(col("doc_id"))
    },

    // URL decomposition + registrable-domain blocklist flag.
    "q_url_parts" -> { (s, dir) =>
      val u = TextClean.urlParts(dirtyUrl)
      tables(s, dir).documents
        .filter(col("doc_id") <= 400)
        .select(col("doc_id"),
          u.getField("scheme").as("scheme"), u.getField("host").as("host"),
          u.getField("path").as("path"), u.getField("query").as("query"),
          u.getField("domain").as("domain"), u.getField("tld").as("tld"),
          TextClean.filterByDomainBlocklist(dirtyUrl, Seq("tracker.net")).as("kept"))
        .orderBy(col("doc_id"))
    }
  )

  override val oracles: Map[String, String] = Map(
    "q_main_content" ->
      """WITH page AS (
        |  SELECT doc_id,
        |    '<html><body><nav><a href="/">Home</a> <a href="/a">About</a> '
        |    || '<a href="/b">More</a></nav><p>' || coalesce(text, '')
        |    || '</p><div><a href="/1">one</a> <a href="/2">two</a></div>'
        |    || '<footer>(c) site footer</footer></body></html>' AS h
        |  FROM documents),
        |blocks AS (
        |  SELECT doc_id, regexp_split_to_array(h,
        |    '(?i)</?(p|div|td|li|h[1-6]|section|article|header|footer|nav|table|ul|ol|blockquote)[^>]*>|<br[^>]*>')
        |    AS bs
        |  FROM page)
        |SELECT doc_id, array_to_string(list_transform(list_filter(bs, b ->
        |    (len(string_split(trim(regexp_replace(regexp_replace(b, '<[^>]+>', ' ', 'g'),
        |       '\s+', ' ', 'g')), ' '))
        |     - CASE WHEN trim(regexp_replace(regexp_replace(b, '<[^>]+>', ' ', 'g'),
        |       '\s+', ' ', 'g')) = '' THEN 1 ELSE 0 END) >= 5
        |    AND len(regexp_extract_all(b, '(?i)<a[ >]')) * 3 <=
        |    (len(string_split(trim(regexp_replace(regexp_replace(b, '<[^>]+>', ' ', 'g'),
        |       '\s+', ' ', 'g')), ' '))
        |     - CASE WHEN trim(regexp_replace(regexp_replace(b, '<[^>]+>', ' ', 'g'),
        |       '\s+', ' ', 'g')) = '' THEN 1 ELSE 0 END)),
        |  b -> trim(regexp_replace(regexp_replace(b, '<[^>]+>', ' ', 'g'),
        |    '\s+', ' ', 'g'))), chr(10)) AS main
        |FROM blocks ORDER BY doc_id""".stripMargin,
    "q_invisible" ->
      """SELECT doc_id, regexp_replace(
        |    regexp_replace(text, ' ', chr(8203) || ' ', 'g'),
        |    '[\x{200B}\x{200C}\x{200D}\x{FEFF}\x{2060}\x{00AD}]', '', 'g') AS cleaned
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_homoglyph" ->
      s"""SELECT doc_id, translate(translate(text, 'aeopc', 'аеорс'),
         |  '${TextClean.homoglyphFrom}', '${TextClean.homoglyphTo}') AS restored
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q_normalize" ->
      s"""WITH u AS (
         |  SELECT doc_id, $dirtyUniSql AS raw FROM documents WHERE doc_id <= 400)
         |SELECT doc_id, nfc_normalize(raw) AS norm,
         |  CAST(length(raw) AS BIGINT) AS raw_len,
         |  CAST(length(nfc_normalize(raw)) AS BIGINT) AS norm_len
         |FROM u ORDER BY doc_id""".stripMargin,
    "q_url_canon" ->
      s"""WITH u AS (
         |  SELECT doc_id, $messyUrlSql AS url FROM documents WHERE doc_id <= 400),
         |nf AS (SELECT doc_id, regexp_replace(url, '#.*', '', 'g') AS nf FROM u),
         |parts AS (
         |  SELECT doc_id,
         |    lower(regexp_extract(nf, '${TextClean.UrlRe}', 1)) AS scheme,
         |    regexp_extract(lower(regexp_extract(nf, '${TextClean.UrlRe}', 2)),
         |                   '([^@]*@)?(.*)', 2) AS hostport,
         |    regexp_extract(nf, '${TextClean.UrlRe}', 3) AS path0,
         |    regexp_extract(nf, '${TextClean.UrlRe}', 4) AS q0
         |  FROM nf),
         |canon AS (
         |  SELECT doc_id, scheme,
         |    CASE WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$$', '')
         |         WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$$', '')
         |         ELSE hostport END AS host,
         |    CASE WHEN regexp_replace(path0, '/+$$', '') = '' THEN '/'
         |         ELSE regexp_replace(path0, '/+$$', '') END AS path,
         |    coalesce(array_to_string(list_filter(string_split(q0, '&'),
         |      p -> NOT (starts_with(p, 'utm_') OR starts_with(p, 'gclid=')
         |                OR starts_with(p, 'fbclid=') OR starts_with(p, 'ref=')
         |                OR p = '')), '&'), '') AS q
         |  FROM parts)
         |SELECT doc_id,
         |  scheme || '://' || host || path
         |    || CASE WHEN q = '' THEN '' ELSE '?' || q END AS canon
         |FROM canon ORDER BY doc_id""".stripMargin,
    "q_corpus_diff" ->
      """WITH old AS (SELECT doc_id, md5(coalesce(text, '')) AS h FROM documents),
        |newc AS (
        |  SELECT doc_id,
        |    md5(CASE WHEN doc_id % 7 = 0 THEN coalesce(text, '') || ' edited'
        |             ELSE coalesce(text, '') END) AS h
        |  FROM documents WHERE doc_id % 10 <> 0
        |  UNION ALL
        |  SELECT doc_id + 1000000 AS doc_id, md5(coalesce(text, '')) AS h
        |  FROM documents WHERE doc_id % 13 = 0),
        |j AS (
        |  SELECT coalesce(old.doc_id, newc.doc_id) AS id,
        |    CASE WHEN old.doc_id IS NULL THEN 'added'
        |         WHEN newc.doc_id IS NULL THEN 'removed'
        |         WHEN old.h = newc.h THEN 'unchanged' ELSE 'changed' END AS status
        |  FROM old FULL OUTER JOIN newc ON old.doc_id = newc.doc_id)
        |SELECT status, count(*) AS n, min(id) AS min_id, max(id) AS max_id
        |FROM j GROUP BY status ORDER BY status""".stripMargin,
    "q_line_dedup" ->
      s"""WITH d AS (SELECT doc_id, $multiLineSql AS t FROM documents),
         |ls AS (SELECT doc_id, string_split(t, chr(10)) AS ls FROM d),
         |l AS (SELECT doc_id, unnest(range(1, len(ls) + 1)) AS lineno,
         |             unnest(ls) AS line FROM ls),
         |census AS (SELECT line, min(doc_id) AS owner FROM l
         |           GROUP BY line HAVING count(*) > 1),
         |kept AS (SELECT l.doc_id, l.lineno, l.line
         |         FROM l LEFT JOIN census ON l.line = census.line
         |         WHERE census.line IS NULL OR l.doc_id = census.owner),
         |reb AS (SELECT doc_id, array_to_string(list(line ORDER BY lineno), chr(10)) AS text,
         |               count(*) AS n_kept
         |        FROM kept GROUP BY doc_id)
         |SELECT d.doc_id AS id, coalesce(reb.text, '') AS text,
         |  CAST(len(string_split(d.t, chr(10))) AS BIGINT) AS n_lines,
         |  CAST(len(string_split(d.t, chr(10))) - coalesce(reb.n_kept, 0) AS BIGINT) AS n_removed
         |FROM d LEFT JOIN reb ON d.doc_id = reb.doc_id ORDER BY id""".stripMargin,
    "q_pii_redact" ->
      s"""WITH dirty AS (
         |  SELECT doc_id, $dirtyPiiSql AS d FROM documents WHERE doc_id <= 400),
         |steps AS (
         |  SELECT doc_id, d,
         |    regexp_replace(d, '${TextClean.EmailRe}', '<EMAIL>', 'g') AS e,
         |    regexp_replace(regexp_replace(d, '${TextClean.EmailRe}', '<EMAIL>', 'g'),
         |                   '${TextClean.SsnRe}', '<SSN>', 'g') AS s
         |  FROM dirty),
         |steps2 AS (
         |  SELECT doc_id, d, e, s,
         |    regexp_replace(s, '${TextClean.PhoneRe}', '<PHONE>', 'g') AS p
         |  FROM steps)
         |SELECT doc_id,
         |  regexp_replace(p, '${TextClean.Ipv4Re}', '<IP>', 'g') AS redacted,
         |  CAST(len(regexp_extract_all(d, '${TextClean.EmailRe}')) AS BIGINT) AS n_emails,
         |  CAST(len(regexp_extract_all(e, '${TextClean.SsnRe}')) AS BIGINT) AS n_ssns,
         |  CAST(len(regexp_extract_all(s, '${TextClean.PhoneRe}')) AS BIGINT) AS n_phones,
         |  CAST(len(regexp_extract_all(p, '${TextClean.Ipv4Re}')) AS BIGINT) AS n_ips
         |FROM steps2 ORDER BY doc_id""".stripMargin,
    "q_strip_html" ->
      s"""WITH dirty AS (
         |  SELECT doc_id, $dirtyHtmlSql AS h FROM documents WHERE doc_id <= 400),
         |stripped AS (
         |  SELECT doc_id,
         |    regexp_replace(regexp_replace(regexp_replace(regexp_replace(h,
         |      '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
         |      '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
         |      '(?s)<!--.*?-->', ' ', 'g'),
         |      '<[^>]+>', ' ', 'g') AS t
         |  FROM dirty)
         |SELECT doc_id,
         |  trim(regexp_replace(
         |    replace(replace(replace(replace(replace(replace(t,
         |      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
         |      '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&'),
         |    '\\s+', ' ', 'g')) AS clean
         |FROM stripped ORDER BY doc_id""".stripMargin,
    "q_url_parts" ->
      s"""WITH u AS (
         |  SELECT doc_id, $dirtyUrlSql AS url FROM documents WHERE doc_id <= 400),
         |parts AS (
         |  SELECT doc_id, url,
         |    lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)\\??([^#]*)', 1)) AS scheme,
         |    regexp_extract(lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)\\??([^#]*)', 2)),
         |                   '([^@]*@)?([^:]*)', 2) AS host,
         |    regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)\\??([^#]*)', 3) AS path,
         |    regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)\\??([^#]*)', 4) AS query
         |  FROM u)
         |SELECT doc_id, scheme, host, path, query,
         |  regexp_extract(host, '([^.]+\\.[^.]+)$$', 1) AS domain,
         |  regexp_extract(host, '\\.([^.]+)$$', 1) AS tld,
         |  regexp_extract(host, '([^.]+\\.[^.]+)$$', 1) <> 'tracker.net' AS kept
         |FROM parts ORDER BY doc_id""".stripMargin
  )
}
