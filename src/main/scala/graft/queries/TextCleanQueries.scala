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

  override val queries: Map[String, Q] = Map(
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
