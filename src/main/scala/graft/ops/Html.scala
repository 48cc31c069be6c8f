package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Raw-HTML main-content extraction — the first step of every
  * web-crawl training-data pipeline: strip boilerplate blocks
  * (script/style/nav/header/footer/aside/comments), strip remaining
  * markup, decode the common entities, and normalize whitespace, so
  * the other text operators (lang-ID, quality, dedup, …) can consume
  * crawl output instead of pre-cleaned text.
  *
  * Everything is a pure narrow expression pipeline — codegen'd
  * `RegExpReplace` chains, no UDF, no shuffle: at 100 TB this is one
  * full scan and nothing else, exactly the shape a markup strip
  * needs. The regexes stay inside the Java-regex ∩ RE2 common subset
  * (inline `(?is)` flags, lazy `.*?`, character classes — no
  * backreferences, no lookaround) so the DuckDB oracle can run the
  * LITERALLY SAME patterns; both sides are generated from the
  * constants below and cannot drift.
  *
  * Extraction semantics are the standard naive-regex ones (shared by
  * both sides and pinned in HtmlSpec): a quoted `>` inside an
  * attribute ends the tag early, and unclosed block elements drop to
  * the end of input — acceptable for boilerplate stripping, where a
  * mangled nav fragment is dropped either way.
  *
  * Reference has no crawl-input analog (the corpus fixtures are
  * pre-cleaned; see reference census in SURVEY.md) — this fills the
  * north-star "text analysis on raw corpora" gap.
  */
object Html {

  /** Block elements whose CONTENT is boilerplate: dropped wholesale
    * (lazy match to the closing tag). Order matters only for the
    * comment rule (first, so commented-out markup can't survive). */
  private[graft] val BlockDrops: Seq[String] = Seq(
    "(?s)<!--.*?-->",
    "(?is)<script[^>]*>.*?</script>",
    "(?is)<style[^>]*>.*?</style>",
    "(?is)<title[^>]*>.*?</title>",
    "(?is)<nav[^>]*>.*?</nav>",
    "(?is)<header[^>]*>.*?</header>",
    "(?is)<footer[^>]*>.*?</footer>",
    "(?is)<aside[^>]*>.*?</aside>")

  /** Any remaining tag (naive: first `>` ends it). */
  private[graft] val TagRe = "<[^>]+>"

  /** Title text (first match; lazy). */
  private[graft] val TitleRe = "(?is)<title[^>]*>(.*?)</title>"

  /** Entity decode map. `&amp;` LAST: chained literal replaces then
    * give the HTML-correct result for double-escapes — `&amp;lt;`
    * contains no `&lt;` substring, so it decodes to the text `&lt;`,
    * not to `<`. */
  private[graft] val Entities: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
    "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")

  /** Main-content extraction over any (doc_id, html) DataFrame — the
    * library entry point ([[graft.Graft.htmlExtract]]). Returns
    * (doc_id, title, content, n_chars, n_words), ordered. */
  def htmlExtract(rows: DataFrame): DataFrame =
    htmlExtractCols(rows).orderBy("doc_id")

  /** [[htmlExtract]] minus the total order — the projection-only form
    * (pure narrow, stateless), directly usable on a STREAMING
    * DataFrame: crawl ingest is a stream in production, and a markup
    * strip has no reason to force a sort. */
  def htmlExtractCols(rows: DataFrame): DataFrame = {
    val content = contentCol(col("html"))
    rows
      .select(col("doc_id"),
              squash(regexp_extract(col("html"), TitleRe, 1)).as("title"),
              content.as("content"))
      .select(col("doc_id"), col("title"), col("content"),
              length(col("content")).as("n_chars"),
              // split("") is [""] (size 1) — an all-boilerplate page
              // must report 0 words, and the oracle carries the same
              // guard so the artifact can't hide behind parity
              when(col("content") === "", 0)
                .otherwise(size(split(col("content"), " "))).as("n_words"))
  }

  /** The strip/decode/normalize chain as a bare Column — for callers
    * that need to carry extra columns through (e.g. the streaming
    * curation composition, which keeps `ts` for its watermark). */
  private[graft] def contentColumn(html: Column): Column = contentCol(html)

  /** The whole strip/decode/normalize chain as one expression. */
  private def contentCol(html: Column): Column = {
    val deblocked = BlockDrops.foldLeft(html)((c, re) => regexp_replace(c, re, " "))
    val untagged = regexp_replace(deblocked, TagRe, " ")
    val decoded = Entities.foldLeft(untagged) { case (c, (e, v)) =>
      replace(c, lit(e), lit(v))
    }
    squash(decoded)
  }

  /** Collapse runs of whitespace and trim. */
  private def squash(c: Column): Column =
    trim(regexp_replace(c, "\\s+", " "))

  // ------------------------------------------------------------------
  // q_html_extract: the corpus has no raw HTML (pre-cleaned text), so
  // the query first RENDERS a deterministic synthetic page per
  // document from structured columns — the in-query-constructed-input
  // pattern q_pii_redact uses — then runs the actual operator. The
  // page exercises every rule: comment, script (with a fake closing
  // tag and a `<` inside code), style, nav/header/aside/footer
  // boilerplate, entities (&lt; &gt; &amp; &#39; &nbsp;), void tags
  // (img/br), and inline markup around the real text.
  // ------------------------------------------------------------------

  // Fixture pieces. NO single quotes anywhere (so they embed verbatim
  // in the SQL oracle); entity apostrophe comes via &#39;.
  private[graft] val F1 =
    "<html><!-- graft synthetic page --><head><title> "
  private[graft] val F2 = // … after "source / lang"
    " </title><style>p {margin: 0}</style>" +
      "<script>if (1<2) { var s = \"</p>\"; }</script></head>" +
      "<body><nav><a href=\"/\">Home &amp; Index</a></nav>" +
      "<header><h2>site chrome</h2></header>" +
      "<div id=\"main\"><h1>Doc &lt;"
  private[graft] val F3 = // … after doc_id
    "&gt;</h1><p>"
  private[graft] val F4 = // … after text
    "</p><p>Rock &amp; Roll &#39;n&#39; blues&nbsp;forever " +
      "<b>bold</b> and <i>italic</i> tails</p>" +
      "<img src=\"x.png\"><br></div>" +
      "<aside>ad unit</aside><footer>(c) 2026 example corp</footer>" +
      "</body></html>"

  /** Render the synthetic page for a documents row. */
  private[graft] def renderHtml: Column =
    concat(lit(F1), col("source"), lit(" / "), col("lang"), lit(F2),
           col("doc_id").cast("string"), lit(F3), col("text"), lit(F4))

  // Minimal wrapper for the q_curate_web composition: no doc-unique
  // markup inside the content (the corpus's planted duplicate
  // structure must survive extraction so the dedup stage has work).
  private[graft] val W1 =
    "<html><head><title>t</title></head><body><nav>chrome &amp; nav</nav><p>"
  private[graft] val W2 = "</p><footer>foot</footer></body></html>"

  /** Render the minimal page (text-only content). */
  private[graft] def renderPlainPage: Column =
    concat(lit(W1), col("text"), lit(W2))

  private[graft] def plainPageSql: String =
    s"${sqlLit(W1)} || text || ${sqlLit(W2)}"

  /** q_html_extract: render + extract over the documents table. */
  def qHtmlExtract(spark: SparkSession, dir: String): DataFrame =
    htmlExtract(
      // widen (r16): the strip/decode regex chain is the whole query;
      // one-split scans would run it single-threaded
      Tables.widen(Tables.documents(spark, dir)
        .select(col("doc_id"), renderHtml.as("html"))))

  // ------------------------------------------------------------------
  // DuckDB oracle, generated from the SAME constants. DuckDB regexp_*
  // is RE2 with inline flags; `replace` is literal, like Spark's.
  // ------------------------------------------------------------------

  private def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"

  /** The strip/decode/normalize chain as DuckDB SQL over `src` — the
    * oracle twin of [[contentCol]], reused by every oracle that embeds
    * the extraction (q_html_extract, q_curate_web). */
  private[graft] def contentSqlExpr(src: String): String = {
    val deblocked = BlockDrops.foldLeft(src) { (acc, re) =>
      s"regexp_replace($acc, ${sqlLit(re)}, ' ', 'g')"
    }
    val untagged = s"regexp_replace($deblocked, ${sqlLit(TagRe)}, ' ', 'g')"
    val decoded = Entities.foldLeft(untagged) { case (acc, (e, v)) =>
      s"replace($acc, ${sqlLit(e)}, ${sqlLit(v)})"
    }
    s"trim(regexp_replace($decoded, '\\s+', ' ', 'g'))"
  }

  private[graft] def oracleSql: String = {
    val fixture =
      s"${sqlLit(F1)} || source || ' / ' || lang || ${sqlLit(F2)} || " +
        s"doc_id::VARCHAR || ${sqlLit(F3)} || text || ${sqlLit(F4)}"
    val content = contentSqlExpr("html")
    val title =
      s"trim(regexp_replace(regexp_extract(html, ${sqlLit(TitleRe)}, 1), '\\s+', ' ', 'g'))"
    s"""WITH h AS (SELECT doc_id, $fixture AS html FROM documents),
       |e AS (SELECT doc_id, $title AS title, $content AS content FROM h)
       |SELECT doc_id, title, content,
       |  len(content)::INT AS n_chars,
       |  CASE WHEN content = '' THEN 0
       |       ELSE len(string_split(content, ' ')) END::INT AS n_words
       |FROM e ORDER BY doc_id""".stripMargin
  }
}
