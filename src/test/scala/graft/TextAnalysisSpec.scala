package graft

import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("bigramLmSignals computes closed-form MLE probabilities") {
    // corpus: unigrams a:3 b:3 c:1 z:1; bigrams "a b":3 "b a":1 "b c":1
    // p(a b)=3/3=1.0, p(b a)=1/3≈0.333333, p(b c)=1/3≈0.333333
    val df = docs(1L -> "a b a b", 2L -> "a b c", 3L -> "z")
    val out = TextAnalysis.bigramLmSignals(df, "doc_id", "text", rareThreshold = 0.4)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getLong(1) == 3L)    // bigrams: a b, b a, a b
    assert(math.abs(out(1L).getDouble(2) - 0.777778) < 1e-9) // (1+1/3+1)/3
    assert(math.abs(out(1L).getDouble(3) - 0.333333) < 1e-9) // 1 of 3 rare at t=0.4
    assert(out(2L).getLong(1) == 2L)
    assert(math.abs(out(2L).getDouble(2) - 0.666667) < 1e-9) // (1+1/3)/2
    assert(math.abs(out(2L).getDouble(3) - 0.5) < 1e-9)
    assert(out(3L).getLong(1) == 0L && out(3L).isNullAt(2) && out(3L).isNullAt(3))
  }

  test("tokenStats computes counts on a known sentence") {
    val df = docs(1L -> "The cat sat, the cat ran!")
    val r = TextAnalysis.tokenStats(df, "text").head()
    assert(r.getAs[Long]("n_tokens") == 6L)
    assert(r.getAs[Long]("n_uniq_tokens") == 4L) // {the, cat, "sat,", "ran!"}
    assert(r.getAs[Long]("punct_count") == 2L)
  }

  test("languageId picks the right lexicon on crafted sentences") {
    val df = docs(
      1L -> "the cat and the dog sat in a corner of the house",
      2L -> "der hund und die katze ist nicht mit der maus",
      3L -> "el perro y la casa de que los gatos es una",
      4L -> "le chien et les chats est une grande maison pour",
      5L -> "qqq www eee rrr")
    val out = TextAnalysis.languageId(df, "text")
      .select("doc_id", "lang_pred").as[(Long, String)].collect().toMap
    assert(out(1L) == "en")
    assert(out(2L) == "de")
    assert(out(3L) == "es")
    assert(out(4L) == "fr")
    assert(out(5L) == "und")
  }

  test("qualityScore stays in [0,1] over the fixture corpus") {
    val scores = TextAnalysis.qualityScore(
      graft.sources.Tables.documents(spark, sf001), "text")
      .select("quality_score").as[Double].collect()
    assert(scores.nonEmpty)
    assert(scores.forall(s => s >= 0.0 && s <= 1.0))
  }

  test("repetitionStats: fully repeated doc ≈ 1, all-distinct doc = 0, short docs null") {
    val df = docs(
      1L -> "spam spam spam spam spam",   // 4 identical 2-grams → 3/4 dup
      2L -> "one two three four five",    // all grams distinct → 0
      3L -> "solo",                       // no 2-gram → null
      4L -> "")                           // empty-ish (one "" token) → null
    val r = TextAnalysis.repetitionStats(df, "doc_id", "text")
      .collect().map(x => x.getLong(0) ->
        (Option(x.get(2)).map(_.asInstanceOf[Double]),
          Option(x.get(3)).map(_.asInstanceOf[Double]))).toMap
    assert(r(1L)._1.contains(0.75))
    assert(r(1L)._2.contains(0.666667)) // round(1 - 1/3, 6)
    assert(r(2L) == (Some(0.0), Some(0.0)))
    assert(r(3L) == (None, None))
    assert(r(4L) == (None, None))
  }

  test("vocabulary counts cf/df and orders by the total (cf, token) key") {
    val df = docs(
      1L -> "alpha beta alpha",
      2L -> "beta gamma",
      3L -> "alpha")
    val rows = TextAnalysis.vocabulary(df, "doc_id", "text", topK = 10)
      .select("token", "cf", "df").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.head == ("alpha", 3L, 2L)) // highest cf first
    assert(rows.toSet == Set(("alpha", 3L, 2L), ("beta", 2L, 2L), ("gamma", 1L, 1L)))
    // ties on cf must order by token: construct a tie and check
    val tie = TextAnalysis.vocabulary(docs(1L -> "b a"), "doc_id", "text", topK = 1)
      .select("token").head().getString(0)
    assert(tie == "a", "tie on cf must break by token ascending")
  }

  test("redaction applies rules in order: URL digits are not re-counted as IP/phone") {
    import graft.ops.Redaction
    val df = docs(
      1L -> "mail me at bob.smith+x@corp.example.co or see https://h.example.com/a?x=10.0.0.1 from 10.1.2.3 call 555-0199",
      2L -> "no pii here at all")
    val r = Redaction.scrub(df, "doc_id", "text").orderBy("doc_id").collect()
    val row1 = r(0)
    assert(row1.getLong(1) == 1L, "one URL")        // n_url
    assert(row1.getLong(2) == 1L, "one email")      // n_email
    assert(row1.getLong(3) == 1L,                   // n_ipv4
      "the IP inside the URL must be consumed by URL redaction, not counted again")
    assert(row1.getLong(4) == 1L, "one phone")      // n_phone
    val red = row1.getString(5)
    assert(red == "mail me at <EMAIL> or see <URL> from <IP> call <PHONE>", red)
    assert(r(1).getString(5) == "no pii here at all")
    assert((1 to 4).forall(i => r(1).getLong(i) == 0L))
  }

  test("tfIdfTopTerms ranks corpus-rare terms above common ones") {
    val df = docs(
      1L -> "common common rare1",
      2L -> "common rare2 rare2",
      3L -> "common other")
    val top = TextAnalysis.tfIdfTopTerms(df, "doc_id", "text", topK = 1)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // 'common' appears in every doc (df=3, idf=1); the doc-unique terms
    // carry idf=3 and must win even at lower tf
    assert(top == Map(1L -> "rare1", 2L -> "rare2", 3L -> "other"))
  }

  test("fingerprints are deterministic and content-sensitive") {
    val df = graft.sources.Tables.documents(spark, sf001).limit(100)
    val a = TextAnalysis.fingerprints(df, "text").select("doc_id", "fingerprint")
      .as[(Long, Long)].collect().toMap
    val b = TextAnalysis.fingerprints(df, "text").select("doc_id", "fingerprint")
      .as[(Long, Long)].collect().toMap
    assert(a == b) // deterministic across runs
    val two = docs(1L -> "alpha beta gamma delta epsilon", 2L -> "totally different words here now")
    val fp = TextAnalysis.fingerprints(two, "text").select("fingerprint").as[Long].collect()
    assert(fp(0) != fp(1))
  }

  test("phraseSearch aligns positions exactly, including repeated-token phrases") {
    val df = docs(
      1L -> "a b a b a",
      2L -> "a a b",
      3L -> "b a",
      4L -> "a b b a")
    def hits(phrase: String*): Set[Long] =
      TextAnalysis.phraseSearch(df, "doc_id", "text", phrase)
        .as[Long].collect().toSet
    assert(hits("a", "b", "a") == Set(1L))       // needs the exact triple
    assert(hits("a", "a") == Set(2L))            // consecutive only — not doc 1
    assert(hits("b", "a") == Set(1L, 3L, 4L)) // doc 2 "a a b" has no "b a"
    assert(hits("b", "b") == Set(4L))
    assert(hits("c") == Set.empty)
  }

  test("bm25TopK matches the closed-form rational-idf scores") {
    // N=3, Σdl=9, avgdl=3; df(a)=df(b)=2 → idf=1.5/2.5=0.6
    // doc1 (a a b, dl 3): 0.6·(2·2.25/3.25) + 0.6·(2.25/2.25) = 1.430769
    // doc3 (b b b b, dl 4): 0.6·(9/5.5625)              = 0.970787
    // doc2 (a c, dl 2):   0.6·(2.25/1.9375)             = 0.696774
    val df = docs(1L -> "a a b", 2L -> "a c", 3L -> "b b b b")
    val out = TextAnalysis.bm25TopK(df, "doc_id", "text", Seq("a", "b"), k = 3)
      .select("doc_id", "n_terms", "score")
      .as[(Long, Long, Double)].collect()
    assert(out.map(_._1).toSeq == Seq(1L, 3L, 2L)) // rank order
    assert(out(0)._2 == 2L && out(1)._2 == 1L && out(2)._2 == 1L)
    assert(math.abs(out(0)._3 - 1.430769) < 1e-9)
    assert(math.abs(out(1)._3 - 0.970787) < 1e-9)
    assert(math.abs(out(2)._3 - 0.696774) < 1e-9)
  }

  test("bm25TopK honors k with the (score desc, id asc) total order") {
    val df = docs(1L -> "a", 2L -> "a", 3L -> "b")
    val top = TextAnalysis.bm25TopK(df, "doc_id", "text", Seq("a"), k = 1)
      .select("doc_id").as[Long].collect()
    assert(top.toSeq == Seq(1L)) // tie on score → lower doc_id wins
  }

  test("gopherRules evaluates each rule on crafted violations") {
    val df = docs(
      // 1: clean — 8 distinct stopwords + 44 alpha words = 52 words, keep
      1L -> ("the be to of and that have with " +
        (1 to 44).map(i => s"word$i").mkString(" ")),
      // 2: too short (3 words) and only 1 stopword
      2L -> "the quick fox",
      // 3: bullet-heavy — 10 of 11 lines bullet-initial (10/11 > 0.9)
      3L -> ("intro line\n" + (1 to 8).map(i => s"- item $i").mkString("\n")
        + "\n* item nine\n  • item ten"),
      // 4: ellipsis-heavy — 2 of 4 lines trail off (2/4 > 0.3); one via …
      4L -> "first trails...\nsecond stays\nthird also goes…\nfourth stays",
      // 5: symbol-heavy — 3 '#' + 1 '...' + 1 '…' = 5 hits over 4 words
      5L -> "# ## tag... rest…",
      // 6: digit words — 4 of 5 words carry no alphabetic char (1/5 < 0.8)
      6L -> "12345 67890 999 111 cat",
      // 7: two-char words — mean word length 2 < 3
      7L -> "aa bb cc dd ee")
    val out = TextAnalysis.gopherRules(df, "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Boolean]("keep_gopher"),
      "the clean 52-word doc must pass every rule")
    assert(out(1L).getAs[Long]("n_stop_hits") == 8L)
    assert(!out(2L).getAs[Boolean]("r_word_count"))
    assert(!out(2L).getAs[Boolean]("r_stopwords")) // only 'the'
    assert(out(3L).getAs[Long]("n_bullet_lines") == 10L) // -, *, indented •
    assert(!out(3L).getAs[Boolean]("r_bullet"))
    assert(out(4L).getAs[Long]("n_ellipsis_lines") == 2L) // ... and …
    assert(!out(4L).getAs[Boolean]("r_ellipsis"))
    assert(out(5L).getAs[Long]("n_symbol_hits") == 5L)
    assert(!out(5L).getAs[Boolean]("r_symbol_ratio"))
    assert(out(6L).getAs[Long]("n_alpha_words") == 1L)
    assert(!out(6L).getAs[Boolean]("r_alpha"))
    assert(out(7L).getAs[Double]("mean_word_len") == 2.0)
    assert(!out(7L).getAs[Boolean]("r_word_len"))
  }

  test("gopherRules word-count bounds are parameters (both ends)") {
    val df = docs(1L -> "a b c d e", 2L -> "a b")
    val out = TextAnalysis.gopherRules(df, "text", minWords = 3, maxWords = 4)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Boolean]("r_word_count")).toMap
    assert(out == Map(1L -> false, 2L -> false)) // 5 > max, 2 < min
  }

  test("dsirSignals computes the closed-form smoothed importance ratios") {
    // target doc "x x x" (grams x·3, "x x"·2), raw-only doc "y y y".
    // TT = 5, TR = 10, B = 64; buckets (md5-derived) are distinct:
    // x→20, "x x"→34, y→18, "y y"→51. Every x-gram bucket has ct = cr,
    // so ratio = (TR+64)/(TT+64) = 74/69 ≈ 1.072464; y buckets have
    // ct = 0: y → 74/276 ≈ 0.268116, "y y" → 74/207 ≈ 0.357488.
    val df = Seq((1L, "x x x", true), (2L, "y y y", false))
      .toDF("doc_id", "text", "is_en")
    val out = TextAnalysis.dsirSignals(df, "doc_id", "text", col("is_en"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Boolean]("is_target"))
    assert(out(1L).getAs[Long]("n_grams") == 5L)
    assert(math.abs(out(1L).getAs[Double]("mean_ratio") - 1.072464) < 1e-9)
    assert(out(1L).getAs[Long]("n_target_leaning") == 5L)
    assert(out(2L).getAs[Long]("n_grams") == 5L)
    // mean of (0.268116·3 + 0.357488·2)/5 = 0.303865 after 6-dp rounds
    assert(math.abs(out(2L).getAs[Double]("mean_ratio") - 0.303865) < 1e-9)
    assert(out(2L).getAs[Long]("n_target_leaning") == 0L)
  }

  test("fixMojibake repairs every rule-table key and is idempotent") {
    // broken forms written as \u escapes so the test fails LOUDLY if an
    // editor ever "fixes" the fixture or the rule table
    val broken =
      "cafÃ© â€œqâ€" +      // cafÃ© â€œqâ€(9d)
        " â€” itâ€™s â€¦" + // â€” itâ€™s â€¦
        " niÃ±oÂ xy  z"                      // niÃ±o Â(nbsp) ctl dbl-space
    val out = TextAnalysis.fixMojibake(
      Seq((1L, broken)).toDF("doc_id", "text"), "text").head()
    assert(out.getAs[String]("text_fixed") ==
      "café \"q\" - it's ... niño xy z")
    assert(out.getAs[Boolean]("changed"))
    // idempotence: a fixed text is a fixed point
    val twice = TextAnalysis.fixMojibake(
      Seq((1L, out.getAs[String]("text_fixed"))).toDF("doc_id", "text"), "text").head()
    assert(!twice.getAs[Boolean]("changed"))
    // every rule key's VALUE is itself stable under the table (no
    // surrounding spaces — the NBSP rule's fixed form IS a space, and
    // padding it would manufacture a run the collapse step rewrites)
    TextAnalysis.mojibakeRules.foreach { case (_, fixed) =>
      val r = TextAnalysis.fixMojibake(
        Seq((1L, s"a${fixed}b")).toDF("doc_id", "text"), "text").head()
      assert(!r.getAs[Boolean]("changed"), s"fixed form not a fixed point: $fixed")
    }
    // NUL and CR are in the strip class (full C0 minus \t\n, plus DEL);
    // \t and \n survive
    val ctl = TextAnalysis.fixMojibake(
      Seq((1L, "a\u0000b\rc\td\ne")).toDF("doc_id", "text"), "text").head()
    assert(ctl.getAs[String]("text_fixed") == "abc\td\ne")
  }

  test("c4Rules applies line and page rules exactly") {
    val df = docs(
      // 6 proper sentences, no lorem/brace → page kept; the bare line drops
      1L -> ("no terminal punct here\nOne clean sentence lands.\n" +
        "Two more sentences follow!\nDoes three ask nicely?\n" +
        "Four keeps the page going.\nFive is almost there.\nSix closes it."),
      // clean lines but the RAW page plants lorem ipsum → page dropped
      2L -> "A fine sentence here.\nBut lorem ipsum dolor lurks.",
      // a brace anywhere on the page drops it
      3L -> "Perfectly good sentence.\nconfig = { a: 1 }",
      // javascript drops the LINE (not the page); page then starves
      4L -> "This site uses javascript today.\nOnly one honest sentence stays.",
      // short line (< 3 words) drops even with terminal punctuation
      5L -> "No.\nYes it does.")
    val out = TextAnalysis.c4Rules(df, "text")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Boolean]("keep_c4"))
    assert(out(1L).getAs[Long]("n_lines_kept") == 6L)
    assert(out(1L).getAs[Long]("n_sentences") == 6L)
    assert(out(2L).getAs[Boolean]("has_lorem") && !out(2L).getAs[Boolean]("keep_c4"))
    assert(out(2L).getAs[Long]("n_lines_kept") == 2L) // lines fine, page not
    assert(out(3L).getAs[Boolean]("has_brace") && !out(3L).getAs[Boolean]("keep_c4"))
    assert(out(4L).getAs[Long]("n_lines_kept") == 1L) // javascript line gone
    assert(!out(4L).getAs[Boolean]("keep_c4"))        // 1 sentence < 5
    assert(out(5L).getAs[Long]("n_lines_kept") == 1L) // "No." is 1 word
    assert(out(5L).getAs[String]("clean_text") == "Yes it does.")
  }

  test("dsirSignals ranks target-like docs above off-target docs") {
    val df = Seq(
      (1L, "spark table join window agg", true),
      (2L, "spark table join window agg", false), // same text, raw slice
      (3L, "der hund und die katze", false))
      .toDF("doc_id", "text", "is_en")
    val out = TextAnalysis.dsirSignals(df, "doc_id", "text", col("is_en"))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Double]("mean_ratio")).toMap
    assert(out(1L) == out(2L), "scoring depends on grams, not the label")
    assert(out(1L) > out(3L), "target-vocabulary docs must score higher")
  }
}
