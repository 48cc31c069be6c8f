package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Html

/** Pins the naive-regex extraction semantics of [[graft.ops.Html]] —
  * the same rules the DuckDB oracle runs (both generated from one
  * constant set), exercised here on hand-built pages including the
  * nested/malformed cases the synthetic fixture can't contain. */
class HtmlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def extract(html: String): (String, String, Int, Int) = {
    val r = Html.htmlExtract(
      Seq((1L, html)).toDF("doc_id", "html")).collect()(0)
    (r.getString(1), r.getString(2), r.getInt(3), r.getInt(4))
  }

  test("full synthetic fixture: title and main content recovered") {
    val docs = Seq((7L, "hello world", "en", "srcX"))
      .toDF("doc_id", "text", "lang", "source")
    val row = Html.htmlExtract(
      docs.select(col("doc_id"), Html.renderHtml.as("html"))).collect()(0)
    assert(row.getString(1) == "srcX / en")
    assert(row.getString(2) ==
      "Doc <7> hello world Rock & Roll 'n' blues forever bold and italic tails")
    assert(row.getInt(3) == row.getString(2).length)
    assert(row.getInt(4) == row.getString(2).split(" ").length)
  }

  test("nested inline tags strip to their text") {
    val (_, c, _, _) = extract("<div><p>a <b>b</b> c</p></div>")
    assert(c == "a b c")
  }

  test("script content with embedded closing tags and < is dropped") {
    val (_, c, _, _) =
      extract("""<script>if (1<2) { var s = "</p>"; }</script><p>kept</p>""")
    assert(c == "kept")
  }

  test("comments hide markup entirely") {
    val (_, c, _, _) = extract("<!-- <p>hidden</p> -->visible")
    assert(c == "visible")
  }

  test("boilerplate blocks (nav/header/footer/aside/style/title) drop wholesale") {
    val (t, c, _, _) = extract(
      "<head><title>T</title><style>p{}</style></head>" +
        "<nav>n</nav><header>h</header><p>body</p>" +
        "<aside>a</aside><footer>f</footer>")
    assert(t == "T")
    assert(c == "body")
  }

  test("entities decode, double-escapes stay text") {
    val (_, c, _, _) = extract(
      "<p>&lt;tag&gt; &quot;q&quot; &#39;a&#39; x&nbsp;y &amp; &amp;lt;</p>")
    assert(c == "<tag> \"q\" 'a' x y & &lt;")
  }

  test("malformed: unclosed script tag is stripped, its text survives (pinned naive semantics)") {
    val (_, c, _, _) = extract("<p>x</p><script>bad")
    assert(c == "x bad")
  }

  test("malformed: quoted > ends a tag early (pinned naive semantics)") {
    val (_, c, _, _) = extract("<p>pre</p><a title=\"a > b\">link</a>")
    assert(c == "pre b\">link")
  }

  test("all-boilerplate page yields empty content") {
    val (_, c, n, _) = extract("<nav>only chrome</nav>")
    assert(c == "" && n == 0)
  }
}
