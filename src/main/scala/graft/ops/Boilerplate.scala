package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML/markup boilerplate extraction — the first stage of every
  * web-scale corpus pipeline (C4, CCNet, RefinedWeb) and the one that
  * runs BEFORE the quality / langid / dedup tiers in this repo: strip
  * non-content machinery (`script` / `style` / comments), delete site
  * chrome blocks (`nav` / `header` / `footer` / `aside`), convert
  * block-level tag boundaries into line breaks, decode entities, and
  * keep only content-dense lines — jusText's link-density idea reduced
  * to an all-integer rule (`n_anchors · anchorDenom ≤ n_words` and
  * `n_words ≥ minWords`), so the keep decision can never flip on a
  * float ulp between engines.
  *
  * Contract: this is a REGEX pass over the markup, not a DOM parse —
  * exactly the C4/CCNet posture (their extractors are line-level
  * heuristics too). Chrome blocks are assumed non-nested (`<nav>`
  * inside `<nav>` cuts at the first close); inline tags of any nesting
  * depth strip correctly because stripping doesn't pair them. Every
  * pattern is in the RE2-safe subset (no backrefs, no lookaround), so
  * the DuckDB oracle ([[extractMainTextSql]]) runs the IDENTICAL rule
  * table — shared here as data, not duplicated prose.
  *
  * Scale: pure per-row expression work (regexp chains + array HOFs) —
  * zero shuffle, fully codegen-friendly, trivially parallel at 100 TB.
  * Reference anchor: the reference has no web-corpus stage at all
  * (closest analogue is the bronze text feeders under spark/bronze/);
  * this extends the engine the way its curation tier (q97) expects.
  */
object Boilerplate {

  /** Ordered structural rule table: (RE2-safe pattern, replacement).
    * Order matters — machinery and chrome blocks must vanish BEFORE
    * block-boundary tags become newlines, or a nav's anchors would leak
    * into the line pool.
    */
  val blockRules: Seq[(String, String)] = Seq(
    "(?is)<script[^>]*>.*?</script>" -> " ",
    "(?is)<style[^>]*>.*?</style>" -> " ",
    "(?s)<!--.*?-->" -> " ",
    "(?is)<nav[^>]*>.*?</nav>" -> " ",
    "(?is)<header[^>]*>.*?</header>" -> " ",
    "(?is)<footer[^>]*>.*?</footer>" -> " ",
    "(?is)<aside[^>]*>.*?</aside>" -> " ",
    // block-level boundaries become newlines so the keep rule sees lines
    ("(?i)</?(p|div|br|li|ul|ol|h1|h2|h3|h4|h5|h6|tr|td|th|table|section" +
      "|article|blockquote|title|pre)\\b[^>]*>") -> "\n")

  /** Ordered entity decode map — `&amp;` LAST, or `&amp;lt;` would
    * double-decode into `<`.
    */
  val entityRules: Seq[(String, String)] = Seq(
    "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'",
    "&apos;" -> "'", "&nbsp;" -> " ", "&copy;" -> "(c)", "&amp;" -> "&")

  /** Anchor-tag detector (`<a ...>` / `<a>`), counted per line BEFORE
    * tags are stripped — the numerator of the link-density rule.
    */
  val anchorPattern = "(?i)<a[\\s>]"

  private def entityDecode(c: Column): Column =
    entityRules.foldLeft(c) { case (acc, (e, r)) =>
      replace(acc, lit(e), lit(r))
    }

  /** line markup → visible text: strip remaining (inline) tags, decode
    * entities, collapse whitespace, trim.
    */
  private def lineText(l: Column): Column =
    trim(regexp_replace(entityDecode(regexp_replace(l, "<[^>]*>", " ")),
      "\\s+", " "))

  /** Extract the main text of an HTML document column.
    *
    * Keep rule (all-integer): a line survives iff `n_words ≥ minWords`
    * AND `n_anchors · anchorDenom ≤ n_words` (link density) AND — when
    * `stopwords` is non-empty — `n_stopwords · stopDenom ≥ n_words`
    * (jusText's other half: real prose carries function words at a
    * floor rate; navigation/boilerplate text doesn't). Stopword match is
    * case-insensitive.
    *
    * Output per row: `idCol`, `outCol` (kept lines joined by \n),
    * `n_lines_kept`, `n_lines_dropped` (non-blank lines the keep rule
    * rejected), `n_words` (word total across kept lines) — the counters
    * downstream quality gates filter on.
    */
  def extractMainText(df: DataFrame, idCol: String, htmlCol: String,
                      minWords: Int = 3, anchorDenom: Int = 4,
                      outCol: String = "main_text",
                      stopwords: Seq[String] = Nil,
                      stopDenom: Int = 4): DataFrame = {
    // minWords=0 would let blank lines (nw=0) pass the keep rule while
    // the nonblank counter excludes them: n_lines_dropped goes negative
    // and main_text gains empty lines (round-10 ADVICE).
    require(minWords >= 1, s"minWords must be >= 1, got $minWords")
    val cleaned = blockRules.foldLeft(col(htmlCol)) {
      case (acc, (p, r)) => regexp_replace(acc, p, r)
    }
    val lines = split(cleaned, "\n")
    val feats0 = transform(lines, l => struct(
      lineText(l).alias("txt"),
      size(regexp_extract_all(l, lit(anchorPattern), lit(0))).alias("na")))
    val feats = transform(feats0, f => struct(
      f("txt").alias("txt"), f("na").alias("na"),
      when(f("txt") === "", 0)
        .otherwise(size(split(f("txt"), " "))).alias("nw"),
      (if (stopwords.isEmpty) lit(0)
       else size(filter(split(f("txt"), " "),
         w => array_contains(typedLit(stopwords), lower(w))))).alias("ns")))
    val kept = filter(feats, f =>
      f("nw") >= minWords && f("na") * anchorDenom <= f("nw") &&
        (if (stopwords.isEmpty) lit(true)
         else f("ns") * stopDenom >= f("nw")))
    val nonblank = filter(feats, f => f("nw") > 0)
    df.select(col(idCol),
      array_join(transform(kept, f => f("txt")), "\n").alias(outCol),
      size(kept).cast("long").alias("n_lines_kept"),
      (size(nonblank) - size(kept)).cast("long").alias("n_lines_dropped"),
      coalesce(aggregate(kept, lit(0), (a, f) => a + f("nw")), lit(0))
        .cast("long").alias("n_words"))
  }

  // ---- DuckDB mirror ------------------------------------------------

  private def sqlEntityDecode(e: String): String =
    entityRules.foldLeft(e) { case (acc, (ent, r)) =>
      s"replace($acc, '$ent', '${r.replace("'", "''")}')"
    }

  /** DuckDB SQL running the IDENTICAL rule table over `htmlExpr` rows of
    * `fromClause` — same structural rules, same entity order, same
    * integer keep rule — so agreement gates the rules themselves.
    */
  def extractMainTextSql(fromClause: String, idCol: String, htmlExpr: String,
                         minWords: Int = 3, anchorDenom: Int = 4,
                         outCol: String = "main_text",
                         stopwords: Seq[String] = Nil,
                         stopDenom: Int = 4): String = {
    val cleaned = blockRules.foldLeft(htmlExpr) { case (acc, (p, r)) =>
      val rep = if (r == "\n") "e'\\n'" else s"'$r'"
      s"regexp_replace($acc, '$p', $rep, 'g')"
    }
    val lineTxt = "trim(regexp_replace(" +
      sqlEntityDecode("regexp_replace(l, '<[^>]*>', ' ', 'g')") +
      ", '\\s+', ' ', 'g'))"
    val nsExpr =
      if (stopwords.isEmpty) "0"
      else "len(list_filter(string_split(f.txt, ' '), w -> list_contains([" +
        stopwords.map(s => s"'${s.replace("'", "''")}'").mkString(", ") +
        "], lower(w))))"
    val stopRule =
      if (stopwords.isEmpty) "" else s" AND f.ns * $stopDenom >= f.nw"
    s"""WITH f0 AS (
       |  SELECT $idCol,
       |    list_transform(string_split($cleaned, e'\\n'), l -> struct_pack(
       |      txt := $lineTxt,
       |      na  := len(regexp_extract_all(l, '$anchorPattern')))) AS f0
       |  FROM $fromClause),
       |f1 AS (
       |  SELECT $idCol,
       |    list_transform(f0, f -> struct_pack(
       |      txt := f.txt, na := f.na,
       |      nw  := CASE WHEN f.txt = '' THEN 0
       |                  ELSE len(string_split(f.txt, ' ')) END,
       |      ns  := $nsExpr)) AS feats
       |  FROM f0),
       |k AS (
       |  SELECT $idCol, feats,
       |    list_filter(feats,
       |      f -> f.nw >= $minWords AND f.na * $anchorDenom <= f.nw$stopRule)
       |      AS kept
       |  FROM f1)
       |SELECT $idCol,
       |  coalesce(array_to_string(list_transform(kept, f -> f.txt), e'\\n'), '')
       |    AS $outCol,
       |  CAST(len(kept) AS BIGINT) AS n_lines_kept,
       |  CAST(len(list_filter(feats, f -> f.nw > 0)) - len(kept) AS BIGINT)
       |    AS n_lines_dropped,
       |  CAST(coalesce(list_sum(list_transform(kept, f -> f.nw)), 0)
       |    AS BIGINT) AS n_words
       |FROM k""".stripMargin
  }

  // ---- URL canonicalization + URL-keyed dedup -----------------------

  /** Tracking query parameters [[canonicalUrl]] drops — the shared rule
    * list (rendered into both engines) every web-corpus pipeline strips
    * before URL-keyed dedup.
    */
  val trackingParams: Seq[String] = Seq("utm_source", "utm_medium",
    "utm_campaign", "utm_term", "utm_content", "fbclid", "gclid", "ref")

  /** Canonical form of a URL column — the normalization CommonCrawl-style
    * pipelines apply BEFORE URL-keyed document dedup, stated as a pure
    * RE2-safe expression chain (identical in [[canonicalUrlSql]]):
    *
    *  1. drop the fragment;
    *  2. lowercase scheme and host (path/query stay case-sensitive);
    *  3. strip a leading `www.` and the scheme-default port
    *     (`http:80` / `https:443`; other ports survive);
    *  4. collapse duplicate slashes in the path, strip one trailing
    *     slash (`/` alone → empty);
    *  5. drop [[trackingParams]] and empty query params, SORT the rest
    *     (param order never distinguishes documents).
    *
    * Non-URLs (no `scheme://host`) canonicalize to NULL. Zero shuffle,
    * codegen end-to-end.
    */
  def canonicalUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    // userinfo (user:pass@) is STRIPPED, not parsed — credentials never
    // belong in a dedup key, and leaving them in would corrupt the host
    val hostport = regexp_replace(
      regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)", 1),
      "^[^@]*@", "")
    val host = regexp_replace(
      lower(regexp_replace(hostport, ":[0-9]+$", "")), "^www\\.", "")
    val port = regexp_extract(hostport, ":([0-9]+)$", 1)
    val portPart = when(port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"), lit(""))
      .otherwise(concat(lit(":"), port))
    val path = regexp_replace(
      regexp_replace(
        regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*([^?]*)", 1),
        "/{2,}", "/"),
      "/$", "")
    val keepParams = filter(split(regexp_extract(noFrag, "\\?(.*)$", 1), "&"),
      p => p =!= "" &&
        !array_contains(typedLit(trackingParams), split(p, "=").getItem(0)))
    val q = array_join(array_sort(keepParams), "&")
    when(scheme === "" || host === "", lit(null).cast("string"))
      .otherwise(concat(scheme, lit("://"), host, portPart, path,
        when(q === "", lit("")).otherwise(concat(lit("?"), q))))
  }

  /** DuckDB statement of [[canonicalUrl]] over `urlExpr` — generated from
    * the same [[trackingParams]] list and the same regex chain.
    */
  def canonicalUrlSql(urlExpr: String): String = {
    val tracking = trackingParams.map(p => s"'$p'").mkString(", ")
    val noFrag = s"regexp_replace($urlExpr, '#.*$$', '')"
    val scheme = s"lower(regexp_extract($noFrag, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    val hostport = s"regexp_replace(regexp_extract($noFrag, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?]*)', 1), '^[^@]*@', '')"
    val host = s"regexp_replace(lower(regexp_replace($hostport, ':[0-9]+$$', '')), '^www\\.', '')"
    val port = s"regexp_extract($hostport, ':([0-9]+)$$', 1)"
    val portPart = s"""CASE WHEN $port = '' OR ($scheme = 'http' AND $port = '80')
                      |  OR ($scheme = 'https' AND $port = '443') THEN ''
                      |  ELSE ':' || $port END""".stripMargin
    val path = s"""regexp_replace(regexp_replace(
                  |  regexp_extract($noFrag, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*([^?]*)', 1),
                  |  '/{2,}', '/', 'g'), '/$$', '')""".stripMargin
    // coalesce: DuckDB's array_to_string of an EMPTY list is NULL where
    // Spark's array_join is '' — without it every query-less URL
    // canonicalizes to NULL through the || chain
    val q = s"""coalesce(array_to_string(list_sort(list_filter(
               |  string_split(regexp_extract($noFrag, '\\?(.*)$$', 1), '&'),
               |  p -> p <> '' AND NOT list_contains([$tracking],
               |         string_split(p, '=')[1]))), '&'), '')""".stripMargin
    s"""CASE WHEN $scheme = '' OR $host = '' THEN NULL
       |  ELSE $scheme || '://' || $host || $portPart || $path ||
       |    (CASE WHEN $q = '' THEN '' ELSE '?' || $q END) END""".stripMargin
  }

  /** URL-keyed keep-first dedup: every row annotated with its canonical
    * URL and `kept` = (canonical is NULL, i.e. not a URL — never grouped)
    * OR (lowest id among that canonical's rows). ONE hash shuffle on the
    * canonical key (window min); at corpus scale pre-filter non-URL rows
    * so the NULL partition cannot become the hot key.
    *
    * Input columns PASS THROUGH (plus `canonical_url`, `kept`), so a
    * pipeline filters `kept` and continues without re-joining the corpus
    * to itself — the q228 composition's shape.
    */
  def urlDedup(df: DataFrame, idCol: String, urlCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    df.withColumn("canonical_url", canonicalUrl(col(urlCol)))
      .withColumn("__minid",
        min(col(idCol)).over(Window.partitionBy(col("canonical_url"))))
      .withColumn("kept",
        col("canonical_url").isNull || col(idCol) === col("__minid"))
      .drop("__minid")
  }
}
