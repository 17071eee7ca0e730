package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Edge-case behavior of the corpus-cleaning verbs; the oracle gate
  * (q_pii_redact / q_strip_html / q_url_parts) covers engine parity,
  * this spec pins the semantics on hand-picked inputs.
  */
class TextCleanSpec extends SparkSpec {
  import spark.implicits._

  private def redact(s: String): String =
    Seq(s).toDF("t").select(TextClean.redactPii(col("t"))).as[String].head()

  private def counts(s: String): (Long, Long, Long, Long) =
    Seq(s).toDF("t").select(TextClean.piiCounts(col("t")).as("c"))
      .selectExpr("c.n_emails", "c.n_ssns", "c.n_phones", "c.n_ips")
      .as[(Long, Long, Long, Long)].head()

  private def strip(s: String): String =
    Seq(s).toDF("t").select(TextClean.stripHtml(col("t"))).as[String].head()

  private def parts(s: String): (String, String, String, String, String, String) =
    Seq(s).toDF("t").select(TextClean.urlParts(col("t")).as("c"))
      .selectExpr("c.scheme", "c.host", "c.path", "c.query", "c.domain", "c.tld")
      .as[(String, String, String, String, String, String)].head()

  test("redactPii replaces every family with its typed token") {
    assert(redact("mail a.b+c@x-y.example.com now") == "mail <EMAIL> now")
    assert(redact("call (415) 555-1234 or +1 212.555.9999") == "call <PHONE> or <PHONE>")
    assert(redact("ssn 078-05-1120") == "ssn <SSN>")
    assert(redact("host 10.0.255.7 up") == "host <IP> up")
  }

  test("redaction order: SSN not half-eaten by the phone pattern") {
    // 3-2-4 digits would prefix-match a sloppy phone regex; SSN runs first.
    assert(redact("id 123-45-6789.") == "id <SSN>.")
  }

  test("long digit runs and out-of-range octets are not redacted whole") {
    assert(redact("txn 1234567890123") == "txn 1234567890123")
    // 999 is not a valid octet; the tail that IS a valid quad still matches.
    assert(redact("v 999.1.1.1") == "v 9<IP>")
  }

  test("piiCounts agrees with what redactPii did") {
    val (e, s, p, i) =
      counts("a@b.co c@d.org 111-22-3333 (415) 555-1234 10.0.0.1 8.8.8.8")
    assert((e, s, p, i) == (2L, 1L, 1L, 2L))
  }

  test("stripHtml drops script/style subtrees including raw < inside") {
    val h = "<p>keep</p><script>if (1 < 2 && x > 0) bad()</script><style>a{b:c}</style>tail"
    assert(strip(h) == "keep tail")
  }

  test("stripHtml decodes entities after tag removal, amp last") {
    // &lt;fin&gt; decodes to literal <fin> and must survive (tags were
    // already stripped); &amp;lt; decodes to the TEXT "&lt;", not "<".
    assert(strip("x &lt;fin&gt; y &amp;lt; z") == "x <fin> y &lt; z")
    assert(strip("a&nbsp;&quot;q&quot;&#39;s&#39;") == "a \"q\"'s'")
  }

  test("stripHtml strips comments and collapses whitespace") {
    assert(strip("a <!-- hidden\nmultiline --> b\n\n  c") == "a b c")
  }

  test("urlParts full decomposition") {
    val (scheme, host, path, query, domain, tld) =
      parts("HTTPS://user:pw@Sub.Example.COM:8443/a/b?x=1&y=2#frag")
    assert(scheme == "https")
    assert(host == "sub.example.com")
    assert(path == "/a/b")
    assert(query == "x=1&y=2")
    assert(domain == "example.com")
    assert(tld == "com")
  }

  test("urlParts minimal url and single-label host") {
    val (scheme, host, path, query, domain, tld) = parts("http://localhost/x")
    assert((scheme, host, path, query) == ("http", "localhost", "/x", ""))
    assert(domain == "" && tld == "") // no registrable suffix on a bare label
  }

  private def canon(s: String): String =
    Seq(s).toDF("u").select(TextClean.canonicalizeUrl(col("u"))).as[String].head()

  test("canonicalizeUrl: case, userinfo, default ports, slashes, tracking params, fragment") {
    assert(canon("HTTPS://User:Pw@WWW.Site.COM:443/A/B/?utm_source=x&q=1&gclid=z#frag")
      == "https://www.site.com/A/B?q=1")
    // non-default port survives; default port for the OTHER scheme survives
    assert(canon("http://h.com:8080/x") == "http://h.com:8080/x")
    assert(canon("https://h.com:80/x") == "https://h.com:80/x")
    assert(canon("http://h.com:80/x") == "http://h.com/x")
    // bare host canonicalizes to the root path; all-tracking query drops the '?'
    assert(canon("http://h.com") == "http://h.com/")
    assert(canon("http://h.com/?utm_medium=a&ref=b") == "http://h.com/")
    // path case is preserved (paths are case-sensitive)
    assert(canon("http://h.com/CaseSensitive") == "http://h.com/CaseSensitive")
  }

  test("canonicalizeUrl is a dedup key: variants of one page collapse") {
    val variants = Seq(
      "https://www.example.com/page?utm_source=tw",
      "HTTPS://www.Example.com:443/page",
      "https://www.example.com/page/",
      "https://www.example.com/page#sec2")
    val keys = variants.toDF("u")
      .select(TextClean.canonicalizeUrl(col("u"))).as[String].collect().toSet
    assert(keys == Set("https://www.example.com/page"))
  }

  test("filterByDomainBlocklist keys on the registrable domain, case-insensitive") {
    val df = Seq(
      "https://ads.Tracker.NET/x",     // blocked (domain tracker.net)
      "https://tracker.net.safe.org/x", // kept: domain is safe.org
      "https://ok.example.com/x").toDF("u")
    val kept = df.filter(TextClean.filterByDomainBlocklist(col("u"), Seq("tracker.net")))
      .as[String].collect().toSet
    assert(kept == Set("https://tracker.net.safe.org/x", "https://ok.example.com/x"))
  }

  private def nfc1(s: String): String =
    Seq(s).toDF("t").select(TextClean.nfc(col("t"))).as[String].head()

  test("nfc composes decomposed sequences and canonical singletons, keeps ligatures") {
    assert(nfc1("cafe\u0301") == "caf\u00e9")   // e + combining acute composes
    assert(nfc1("A\u030a") == "\u00c5")         // A + combining ring composes
    assert(nfc1("\u212b") == "\u00c5")          // Angstrom sign -> canonical singleton
    assert(nfc1("\ufb01n") == "\ufb01n")        // fi ligature is COMPATIBILITY - NFC keeps it
    assert(nfc1("plain ascii 123") == "plain ascii 123")
  }

  test("graft_normalize matches java.text.Normalizer through codegen for every form") {
    val samples = Seq("caf\u00e9", "e\u0301\u0301x", "\u212b\ufb01",
      "ascii only", "", "g\u00e4rten \u1100\u1161\uac00", "\ufeffbom\u00a0nbsp",
      "\uff26\uff35\uff2cwide")
    for (form <- Seq("NFC", "NFD", "NFKC", "NFKD")) {
      val got = samples.toDF("t")
        .select(expr(s"graft_normalize(t, '$form')")).as[String].collect().toSeq
      val want = samples.map(java.text.Normalizer.normalize(_,
        java.text.Normalizer.Form.valueOf(form)))
      assert(got == want, s"form $form")
    }
  }

  test("graft_normalize null propagates; bad form fails at plan time") {
    val out = Seq[Option[String]](None, Some("\u00e1")).toDF("t")
      .select(TextClean.nfc(col("t"))).as[Option[String]].collect().toSeq
    assert(out == Seq(None, Some("\u00e1")))
    intercept[Exception] {
      Seq("x").toDF("t").select(expr("graft_normalize(t, 'NFX')")).collect()
    }
  }

  test("normalizeText folds compatibility forms, case, accents, and whitespace") {
    val out = Seq(" Caf\u00e9  \ufb01ne\n\t\uff26\uff35\uff2c\uff2c ").toDF("t")
      .select(TextClean.normalizeText(col("t"))).as[String].head()
    assert(out == "cafe fine full")
  }

  test("foldHomoglyphs maps Cyrillic/Greek lookalikes that NFKC leaves alone") {
    // "s\u0440\u0430m" with Cyrillic \u0430/\u0440, "\u0397\u0435ll\u03bf" with Greek \u0397, omicron + Cyrillic \u0435
    val spam = "s\u0440\u0430m"
    val hello = "\u0397\u0435ll\u03bf"
    val rows = Seq(spam, hello, "plain ascii stays").toDF("t")
    val folded = rows.select(TextClean.foldHomoglyphs(col("t"))).as[String].collect()
    assert(folded(0) == "spam")
    assert(folded(1) == "Hello")
    assert(folded(2) == "plain ascii stays")
    // NFKC alone does NOT fold these (they're distinct letters)
    val nfkc = rows.select(
      graft.expressions.UnicodeNormalize.normalizeF(col("t"), "NFKC")).as[String].collect()
    assert(nfkc(0) != "spam" && nfkc(1) != "Hello")
    // from/to tables stay paired
    assert(TextClean.homoglyphFrom.length == TextClean.homoglyphTo.length)
  }

  test("extractMainContent keeps dense prose, drops nav/footer link clusters") {
    val page = """<html><head><style>p{}</style><title>T</title></head><body>
      |<nav><a href="/">Home</a> <a href="/x">About</a> <a href="/y">Contact</a></nav>
      |<p>This is the long main article paragraph with plenty of real words in it
      | and even one inline <a href="z">reference link</a> which is fine.</p>
      |<div><a href="/1">one</a> <a href="/2">two</a></div>
      |<p>Second substantial paragraph of honest content continues here today.</p>
      |<footer>Copyright</footer></body></html>""".stripMargin.replace("\n", "")
    val out = Seq(page).toDF("h")
      .select(TextClean.extractMainContent(col("h"))).as[String].head()
    assert(out.contains("long main article paragraph"))
    assert(out.contains("Second substantial paragraph"))
    assert(out.contains("reference link")) // inline link inside prose survives
    assert(!out.contains("Home"), s"nav survived: $out")
    assert(!out.contains("Copyright"), s"footer survived: $out")
    assert(out.split("\n").length == 2)
  }

  test("stripInvisible removes zero-width/invisible code points only") {
    val evasive = "s​p‌a‍m﻿ ⁠w­ord"
    val out = Seq(evasive, "clean text").toDF("t")
      .select(TextClean.stripInvisible(col("t"))).as[String].collect()
    assert(out(0) == "spam word")
    assert(out(1) == "clean text")
  }
}
