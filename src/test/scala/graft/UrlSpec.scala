package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Url

/** Pins the canonicalization semantics of [[graft.ops.Url]] — the same
  * constant-generated rules the DuckDB oracle runs. */
class UrlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def canon(url: String): (String, String, Int) = {
    val r = Url.canonicalizeUrls(Seq((1L, url)).toDF("doc_id", "url"))
      .collect()(0)
    (r.getString(2), r.getString(3), r.getInt(4))
  }

  test("full fixture: every rule fires") {
    val docs = Seq((5L, "x", "en", "src3")).toDF("doc_id", "text", "lang", "source")
    val r = Url.canonicalizeUrls(
      docs.select(col("doc_id"), Url.renderUrl.as("url"))).collect()(0)
    assert(r.getString(2) == "https://example-src3.com/Docs/en/page-5?id=5&ref=abc",
      r.getString(2))
    assert(r.getString(3) == "example-src3.com")
    assert(r.getInt(4) == 2)
  }

  test("scheme and host lowercase; path case preserved") {
    val (c, d, _) = canon("HTTP://EXAMPLE.COM/CaseSensitive/Path")
    assert(c == "http://example.com/CaseSensitive/Path")
    assert(d == "example.com")
  }

  test("default ports strip, non-default ports survive") {
    assert(canon("https://a.com:443/x")._1 == "https://a.com/x")
    assert(canon("http://a.com:80/x")._1 == "http://a.com/x")
    assert(canon("http://a.com:8080/x")._1 == "http://a.com:8080/x")
    // a default-for-the-OTHER-scheme port is a distinct origin
    assert(canon("http://a.com:443/x")._1 == "http://a.com:443/x")
    assert(canon("https://a.com:80/x")._1 == "https://a.com:80/x")
  }

  test("path rewrites never touch query parameter values") {
    // dot segments and index.html inside a query VALUE are data
    assert(canon("https://a.com/view?path=/x/../s/")._1
      == "https://a.com/view?path=/x/../s/")
    assert(canon("https://a.com/p?next=/index.html")._1
      == "https://a.com/p?next=/index.html")
    // while the same substrings in the PATH are still rewritten
    assert(canon("https://a.com/x/../view?id=1")._1
      == "https://a.com/view?id=1")
  }

  test("utm params strip in every position, other params survive") {
    assert(canon("https://a.com/p?utm_source=x")._1 == "https://a.com/p")
    assert(canon("https://a.com/p?utm_source=x&id=1")._1 == "https://a.com/p?id=1")
    assert(canon("https://a.com/p?id=1&utm_medium=m&ref=r")._1
      == "https://a.com/p?id=1&ref=r")
    assert(canon("https://a.com/p?id=1&utm_medium=m")._3 == 1)
  }

  test("dot segments collapse, fragment drops, index leaf strips") {
    assert(canon("https://a.com/x/../y/./z#frag")._1 == "https://a.com/y/z")
    assert(canon("https://a.com/a/index.html")._1 == "https://a.com/a")
    assert(canon("https://a.com/a/index.html?q=1")._1 == "https://a.com/a?q=1")
  }

  test("scheme-less garbage passes through (minus fragment) instead of collapsing") {
    assert(canon("not a url at all") == ("not a url at all", "", 0))
    assert(canon("relative/path?a=1#f") == ("relative/path?a=1", "", 1))
  }

  test("dedupByUrl collapses tracking-param/fragment/port/www variants of one page") {
    val rows = Seq(
      (1L, "HTTPS://WWW.A.COM:443/x/index.html?utm_s=1&id=7#f"),
      (2L, "https://a.com/x?id=7"),
      (3L, "https://a.com/x?id=8") // different resource
    ).toDF("doc_id", "url")
    val out = Url.dedupByUrl(rows).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, "https://a.com/x?id=7", 2L),
      (3L, "https://a.com/x?id=8", 1L)))
  }

  test("urlFilter: domain block wins over path rule; kept rows pass both") {
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      (1L, "https://bad.com/Docs/zh/a"),   // domain AND path → 'domain'
      (2L, "https://ok.com/Docs/zh/a"),    // path only
      (3L, "https://ok.com/Docs/en/a"),    // kept
      (4L, "https://WWW.BAD.com/clean")    // canonicalized domain match
    ).toDF("doc_id", "url")
    val block = Seq("bad.com").toDF("domain")
    val out = Url.urlFilter(rows, block, Seq("://[^/]*/Docs/zh/"))
      .select("doc_id", "reason", "kept").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSeq
    assert(out == Seq(
      (1L, "domain", false), (2L, "path", false),
      (3L, "kept", true), (4L, "domain", false)))
    assert(Url.urlFilter(rows, block, Seq("://[^/]*/Docs/zh/"))
      .filter(col("kept")).count() === 1)
  }

  test("idempotent: canonicalizing a canonical URL is a no-op") {
    val urls = Seq(
      "HTTPS://WWW.A-b.COM:443/x/../y/index.html?utm_s=1&id=2#f",
      "http://plain.org/path?a=1&b=2",
      "https://a.com/")
    urls.foreach { u =>
      val once = canon(u)._1
      assert(canon(once)._1 == once, s"not idempotent for $u: $once")
    }
  }
}
