package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** URL canonicalization — the crawl-pipeline step between "raw crawl
  * record" and every URL-keyed operation (URL dedup, domain
  * aggregation, frontier management): lowercase scheme+host, strip
  * `www.`, default ports, fragments, tracking (`utm_*`) parameters,
  * dot path segments and the directory-index leaf, and expose the
  * registrable domain and query-parameter count.
  *
  * Same engineering contract as [[Html]]: a pure narrow expression
  * chain (codegen'd regex/replace, no UDF, no shuffle — a full scan
  * and nothing else at 100 TB), with every pattern inside the
  * Java-regex ∩ RE2 common subset and NO replacement backreferences
  * (Spark spells them `$1`, RE2 `\1` — the one syntax split that
  * could silently diverge the two sides), so the DuckDB oracle is
  * generated from the same constants and cannot drift.
  *
  * Scope: syntactic canonicalization only — no IDN/punycode, no
  * percent-encoding normalization, no scheme-relative resolution;
  * dot-segment collapse applies two fixed passes (identical both
  * sides), enough for any sane crawl URL depth of `..` nesting.
  */
object Url {

  /** Ordered rewrite steps applied to the PATH (the part after
    * `scheme://host`, BEFORE any `?`) — path rewrites must never
    * touch query-parameter VALUES (a `?next=/a/../b` param is data,
    * not a path to resolve). */
  private[graft] val PathSteps: Seq[(String, String)] = Seq(
    // dot segments: /a/../ -> / and /./ -> / (two passes each — a
    // fixed, engine-identical approximation of RFC 3986 remove_dot_segments)
    ("/[^/?#]+/\\.\\./", "/"),
    ("/[^/?#]+/\\.\\./", "/"),
    ("/\\./", "/"),
    ("/\\./", "/"),
    // directory-index leaf
    ("/index\\.html$", ""))

  /** Ordered rewrite steps applied to the QUERY (`?...` tail):
    * tracking params — interior &utm_..., then leading ?utm_...&,
    * then a ?utm_... tail. */
  private[graft] val QuerySteps: Seq[(String, String)] = Seq(
    ("&utm_[^&#]*", ""),
    ("\\?utm_[^&#]*&", "?"),
    ("\\?utm_[^&#]*$", ""))

  /** Host cleanup after lowercasing: www strip always; default-port
    * strip only for the scheme the port is actually default FOR
    * (`http://a.com:443` is a distinct origin and must survive). */
  private[graft] val WwwRe = "^www\\."
  private[graft] val PortSteps: Seq[(String, String)] =
    Seq("https" -> ":443$", "http" -> ":80$")

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private val HostRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
  private val RestRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$"
  private val PathPartRe = "^([^?#]*)"
  private val QueryPartRe = "(\\?.*)$"

  /** Canonicalize any (doc_id, url) DataFrame →
    * (doc_id, url, canon, domain, n_params), ordered — the library
    * entry point ([[graft.Graft.canonicalizeUrls]]). */
  def canonicalizeUrls(rows: DataFrame): DataFrame =
    canonicalizeUrlCols(rows).orderBy("doc_id")

  /** Projection-only form (streaming-safe, like
    * [[Html.htmlExtractCols]]). */
  /** The canonical form and domain as bare Columns over a url column
    * — for callers that carry extra columns through (the streaming
    * frontier dedup keeps `ts` for its watermark). */
  private def schemeOf(defragged: Column): Column =
    lower(regexp_extract(defragged, SchemeRe, 1))

  private def hostOf(defragged: Column): Column = {
    val scheme = schemeOf(defragged)
    val hostBase = regexp_replace(
      lower(regexp_extract(defragged, HostRe, 1)), WwwRe, "")
    PortSteps.foldLeft(hostBase) { case (c, (sch, p)) =>
      when(scheme === sch, regexp_replace(c, p, "")).otherwise(c)
    }
  }

  private[graft] def canonCol(url: Column): Column = {
    // fragment off first — it is never part of the resource identity
    val defragged = regexp_replace(url, "#.*$", "")
    val scheme = schemeOf(defragged)
    val rest = regexp_extract(defragged, RestRe, 1)
    val path = PathSteps.foldLeft(regexp_extract(rest, PathPartRe, 1)) {
      case (c, (p, r)) => regexp_replace(c, p, r)
    }
    val query = QuerySteps.foldLeft(regexp_extract(rest, QueryPartRe, 1)) {
      case (c, (p, r)) => regexp_replace(c, p, r)
    }
    // a row with no scheme://host shape passes through unchanged
    // (minus fragment) rather than collapsing to garbage — garbage-in
    // pass-through-out is the right library contract for crawl data;
    // the guard never fires on the oracle fixture, so parity holds
    when(scheme === "", defragged)
      .otherwise(concat(scheme, lit("://"), hostOf(defragged), path, query))
  }

  private[graft] def domainCol(url: Column): Column = {
    val defragged = regexp_replace(url, "#.*$", "")
    when(schemeOf(defragged) === "", lit(""))
      .otherwise(hostOf(defragged))
  }

  def canonicalizeUrlCols(rows: DataFrame): DataFrame = {
    val url = col("url")
    val canon = canonCol(url)
    val qpart = regexp_extract(canon, "\\?(.*)$", 1)
    rows.select(col("doc_id"), url.as("url"), canon.as("canon"),
                domainCol(url).as("domain"),
                when(qpart === "", 0)
                  .otherwise(size(split(qpart, "&"))).as("n_params"))
  }

  // ------------------------------------------------------------------
  // q_url_canon: the corpus has no URL column, so the query RENDERS a
  // deterministic messy URL per document from structured columns (the
  // q_pii_redact / q_html_extract constructed-input pattern), then
  // canonicalizes it. The fixture exercises every rule: uppercase
  // scheme+host, www, default port, .. and . segments, utm params at
  // head/interior, an index.html leaf, and a fragment.
  // ------------------------------------------------------------------

  private[graft] val U1 = "HTTPS://WWW.Example-" // + source
  private[graft] val U2 = ".COM:443/Docs/" // + lang
  private[graft] val U3 = "/../" // + lang
  private[graft] val U4 = "/./page-" // + doc_id
  private[graft] val U5 =
    "/index.html?utm_source=feed&id=" // + doc_id
  private[graft] val U6 = "&utm_campaign=spring&ref=abc#section-2"

  private[graft] def renderUrl: Column =
    concat(lit(U1), col("source"), lit(U2), col("lang"), lit(U3),
           col("lang"), lit(U4), col("doc_id").cast("string"), lit(U5),
           col("doc_id").cast("string"), lit(U6))

  /** q_url_canon: render + canonicalize over the documents table. */
  def qUrlCanon(spark: SparkSession, dir: String): DataFrame =
    canonicalizeUrls(
      Tables.documents(spark, dir)
        .select(col("doc_id"), renderUrl.as("url")))

  /** URL-keyed dedup over any (doc_id, url) DataFrame — the crawl
    * step BEFORE content dedup (re-crawls and tracking-param variants
    * of one page collapse without touching the body): group by the
    * canonical form, keep the min doc_id, count the variants. One
    * hash shuffle on the canonical URL ([[graft.Graft.dedupByUrl]]). */
  def dedupByUrl(rows: DataFrame): DataFrame =
    canonicalizeUrlCols(rows)
      .groupBy(col("canon"))
      .agg(min(col("doc_id")).as("keeper_id"),
           count(lit(1)).as("n_variants"),
           // domain is a pure function of canon, identical group-wide;
           // min() keeps the aggregate order-insensitive for the oracle
           min(col("domain")).as("domain"))
      .select(col("keeper_id"), col("canon"), col("domain"), col("n_variants"))
      .orderBy("keeper_id")

  /** q_dedup_url: [[dedupByUrl]] with PLANTED variants — each doc's
    * rendered URL plus (for doc_id % 10 == 0) a variant of the SAME
    * page differing only in tracking params and fragment, which must
    * collapse onto the canonical form. */
  /** A differently-written URL that canonicalizes to the SAME form as
    * [[renderUrl]] for the same document — the tracking-param/casing
    * re-crawl variant (shared by q_dedup_url and q_crawl_triad). */
  private[graft] def renderVariantUrl: Column =
    concat(lit(V1), col("source"), lit(V2), col("lang"), lit(V3),
           col("lang"), lit(V4), col("doc_id").cast("string"),
           lit(V5), col("doc_id").cast("string"), lit(V6))

  def qDedupUrl(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"), renderUrl.as("url"))
    val variants = Tables.documents(spark, dir)
      .filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + lit(1000000L)).as("doc_id"),
              renderVariantUrl.as("url"))
    dedupByUrl(base.unionByName(variants))
  }

  /** URL filtering against a domain blocklist plus path-pattern rules
    * — the frontier-hygiene step of a crawl pipeline (porn/SEO-spam
    * domain lists, login/calendar/faceted-search path traps). Joins
    * the canonicalized URLs against the blocklist (BROADCAST: real
    * blocklists are ~1M domains, far under the broadcast threshold,
    * so the corpus never shuffles) and tags every row with its
    * verdict: 'domain' (blocklisted registrable domain), 'path'
    * (first matching path rule), or 'kept'. Keeping the verdict
    * instead of dropping rows makes the filter auditable (the kept
    * stream is `.filter(col("kept"))`); the whole thing is one scan +
    * one broadcast hash join.
    */
  def urlFilter(rows: DataFrame, blockedDomains: DataFrame,
                pathRules: Seq[String]): DataFrame = {
    val c = canonicalizeUrlCols(rows)
    // foldLeft, not reduce: an empty rule list means "no path hits",
    // not an empty-reduce crash (domain-blocklist-only is a natural call)
    val pathHit = pathRules.map(col("canon").rlike(_))
      .foldLeft(lit(false))(_ || _)
    c.join(broadcast(blockedDomains.select(col("domain"))
             .withColumn("dom_blocked", lit(true))),
           Seq("domain"), "left")
      .withColumn("reason",
        when(coalesce(col("dom_blocked"), lit(false)), lit("domain"))
          .when(pathHit, lit("path"))
          .otherwise(lit("kept")))
      .select(col("doc_id"), col("canon"), col("domain"), col("reason"),
              (col("reason") === "kept").as("kept"))
      .orderBy("doc_id")
  }

  // q_url_filter fixture rules: three blocklisted source domains and
  // one path trap (the zh docs subtree), over the renderUrl corpus.
  private[graft] val BlockedDomains: Seq[String] =
    Seq("example-src3.com", "example-src7.com", "example-src13.com")
  private[graft] val PathRules: Seq[String] = Seq("://[^/]*/Docs/zh/")

  /** q_url_filter: [[urlFilter]] with the fixture blocklist. */
  def qUrlFilter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val blocklist = BlockedDomains.toDF("domain")
    urlFilter(
      Tables.documents(spark, dir)
        .select(col("doc_id"), renderUrl.as("url")),
      blocklist, PathRules)
  }

  // Variant fixture: same resource as renderUrl after canonicalization
  // (no www, lowercase, no port, resolved path, no utm/fragment noise
  // — but DIFFERENT raw bytes everywhere the canonicalizer normalizes)
  private[graft] val V1 = "https://example-" // + source
  private[graft] val V2 = ".com/Docs/" // + lang (no dots to resolve)
  private[graft] val V3 = "/../" // + lang
  private[graft] val V4 = "/page-" // + doc_id (no /. segment)
  private[graft] val V5 =
    "?id=" // + doc_id — utm params dropped entirely here
  private[graft] val V6 = "&ref=abc&utm_term=zz#other-frag"

  // DuckDB oracle from the SAME constants.
  private def sqlLit(s: String): String = "'" + s.replace("'", "''") + "'"

  private[graft] val baseUrlSql: String =
    s"${sqlLit(U1)} || source || ${sqlLit(U2)} || lang || ${sqlLit(U3)} || " +
      s"lang || ${sqlLit(U4)} || doc_id::VARCHAR || ${sqlLit(U5)} || " +
      s"doc_id::VARCHAR || ${sqlLit(U6)}"
  private[graft] val variantUrlSql: String =
    s"${sqlLit(V1)} || source || ${sqlLit(V2)} || lang || ${sqlLit(V3)} || " +
      s"lang || ${sqlLit(V4)} || doc_id::VARCHAR || ${sqlLit(V5)} || " +
      s"doc_id::VARCHAR || ${sqlLit(V6)}"

  private[graft] val defraggedSql = s"regexp_replace(url, '#.*$$', '', 'g')"

  /** DuckDB canon/domain expressions over a defragged column `d` —
    * generated from the SAME step constants as the Spark side. */
  private[graft] def schemeSql: String =
    s"lower(regexp_extract(d, ${sqlLit(SchemeRe)}, 1))"
  private[graft] def hostSql: String = {
    val base = s"regexp_replace(lower(regexp_extract(d, ${sqlLit(HostRe)}, 1)), " +
      s"${sqlLit(WwwRe)}, '', 'g')"
    PortSteps.foldLeft(base) { case (acc, (sch, p)) =>
      s"CASE WHEN $schemeSql = ${sqlLit(sch)} " +
        s"THEN regexp_replace($acc, ${sqlLit(p)}, '', 'g') ELSE $acc END"
    }
  }
  private[graft] def canonSql: String = {
    val rest = s"regexp_extract(d, ${sqlLit(RestRe)}, 1)"
    val path = PathSteps.foldLeft(
      s"regexp_extract($rest, ${sqlLit(PathPartRe)}, 1)") {
      case (acc, (p, r)) =>
        s"regexp_replace($acc, ${sqlLit(p)}, ${sqlLit(r)}, 'g')"
    }
    val query = QuerySteps.foldLeft(
      s"regexp_extract($rest, ${sqlLit(QueryPartRe)}, 1)") {
      case (acc, (p, r)) =>
        s"regexp_replace($acc, ${sqlLit(p)}, ${sqlLit(r)}, 'g')"
    }
    s"$schemeSql || '://' || $hostSql || $path || $query"
  }

  private[graft] def oracleSql: String =
    s"""WITH h AS (SELECT doc_id, $baseUrlSql AS url FROM documents),
       |d0 AS (SELECT doc_id, url, $defraggedSql AS d FROM h),
       |c AS (SELECT doc_id, url, $canonSql AS canon, $hostSql AS domain
       |      FROM d0),
       |q AS (SELECT doc_id, url, canon, domain,
       |        regexp_extract(canon, '\\?(.*)$$', 1) AS query FROM c)
       |SELECT doc_id, url, canon, domain,
       |  CASE WHEN query = '' THEN 0
       |       ELSE len(string_split(query, '&')) END::INT AS n_params
       |FROM q ORDER BY doc_id""".stripMargin

  private[graft] def filterOracleSql: String = {
    val domList = BlockedDomains.map(sqlLit).mkString("(", ", ", ")")
    val pathCond = PathRules
      .map(p => s"regexp_matches(canon, ${sqlLit(p)})").mkString(" OR ")
    s"""WITH h AS (SELECT doc_id, $baseUrlSql AS url FROM documents),
       |d0 AS (SELECT doc_id, $defraggedSql AS d FROM h),
       |c AS (SELECT doc_id, $canonSql AS canon, $hostSql AS domain FROM d0),
       |v AS (SELECT doc_id, canon, domain,
       |        CASE WHEN domain IN $domList THEN 'domain'
       |             WHEN $pathCond THEN 'path'
       |             ELSE 'kept' END AS reason FROM c)
       |SELECT doc_id, canon, domain, reason, reason = 'kept' AS kept
       |FROM v ORDER BY doc_id""".stripMargin
  }

  private[graft] def dedupOracleSql: String =
    s"""WITH b AS (SELECT doc_id, $baseUrlSql AS url FROM documents),
       |v AS (SELECT doc_id + 1000000 AS doc_id, url FROM
       |        (SELECT doc_id, $variantUrlSql AS url FROM documents
       |         WHERE doc_id % 10 = 0)),
       |u AS (SELECT * FROM b UNION ALL SELECT * FROM v),
       |d0 AS (SELECT doc_id, $defraggedSql AS d FROM u),
       |c AS (SELECT doc_id, $canonSql AS canon, $hostSql AS domain FROM d0)
       |SELECT min(doc_id)::BIGINT AS keeper_id, canon, min(domain) AS domain,
       |  count(*)::BIGINT AS n_variants
       |FROM c GROUP BY canon ORDER BY keeper_id""".stripMargin
}
