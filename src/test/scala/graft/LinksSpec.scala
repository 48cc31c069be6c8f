package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Links

/** Link extraction: hand-built pages (multiple links, attributes
  * around href, entity-escaped and whitespace-mangled anchors,
  * linkless pages), and the per-target rollup bound. */
class LinksSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("extractLinks: hand-computed edges, attrs and entities handled") {
    val page =
      """<html><body>
        |<a href="https://a.com/x" class="big">First &amp; best</a>
        |<p>mid <a rel="nofollow" href="https://b.com/">  spaced
        |   anchor  </a></p>
        |<a href="https://a.com/x">repeat</a>
        |</body></html>""".stripMargin
    val out = Links.extractLinks(Seq((1L, page)).toDF("doc_id", "html"))
      .orderBy("href", "anchor")
      .collect().map(r => (r.getString(1), r.getString(2)))
    assert(out.toSeq == Seq(
      ("https://a.com/x", "First & best"),
      ("https://a.com/x", "repeat"),
      ("https://b.com/", "spaced anchor")))
  }

  test("extractLinks: page with no anchors yields no rows") {
    val df = Seq((1L, "<html><body><p>plain</p></body></html>"))
      .toDF("doc_id", "html")
    assert(Links.extractLinks(df).count() === 0)
  }

  test("anchorStats: counts, distinct docs, sorted bounded text set") {
    val links = Seq(
      (1L, "https://hub/", "go"),
      (2L, "https://hub/", "zz"),
      (2L, "https://hub/", "go"),
      (3L, "https://solo/", "only")
    ).toDF("doc_id", "href", "anchor")
    val rows = Links.anchorStats(links).collect()
    val hub = rows.find(_.getString(0) == "https://hub/").get
    assert(hub.getLong(1) === 3)      // n_links counts every edge
    assert(hub.getLong(2) === 2)      // n_docs distinct sources
    assert(hub.getString(3) === "go|zz") // sorted distinct anchors
    val solo = rows.find(_.getString(0) == "https://solo/").get
    assert((solo.getLong(1), solo.getLong(2), solo.getString(3)) == (1L, 1L, "only"))
  }

  test("anchorStats: text set is capped at MaxTexts for a hub target") {
    val many = (1 to 100).map(i => (i.toLong, "https://hub/", f"t$i%03d"))
      .toDF("doc_id", "href", "anchor")
    val texts = Links.anchorStats(many).collect().head.getString(3)
    assert(texts.split("\\|").length === Links.MaxTexts)
    assert(texts.startsWith("t001|t002"))
  }
}
