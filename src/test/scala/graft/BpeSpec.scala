package graft

import org.apache.spark.sql.functions._

import graft.ops.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("fit learns the textbook merges on 'aaabdaaabac'") {
    // Sennrich/Gage closed form. Symbols: a a a b d a a a b a c </w>.
    // Round 1: (a,a) count 4 wins → aa.        [aa a b d aa a b a c </w>]
    // Round 2: (aa,a) and (a,b) tie at 2; the (lhs, rhs) tie-break
    //          picks (a,b) ("a" < "aa") → ab.  [aa ab d aa ab a c </w>]
    // Round 3: (aa,ab) count 2 wins → aaab.    [aaab d aaab a c </w>]
    val df = Seq((1L, "aaabdaaabac")).toDF("doc_id", "text")
    val merges = Bpe.fit(df, "text", 3)
    assert(merges.map(m => (m.rank, m.lhs, m.rhs, m.merged, m.pairCount)) ==
      Seq((1L, "a", "a", "aa", 4L),
        (2L, "a", "b", "ab", 2L),
        (3L, "aa", "ab", "aaab", 2L)))
  }

  test("encode applies merges in rank order, greedy left-to-right") {
    val df = Seq((1L, "aaabdaaabac")).toDF("doc_id", "text")
    val merges = Bpe.fit(df, "text", 3)
    val enc = Seq("aaabdaaabac", "aaaa", "ab", "xyz", "")
      .toDF("word")
      .select(col("word"), Bpe.encode(col("word"), merges).alias("syms"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    assert(enc("aaabdaaabac") == Seq("aaab", "d", "aaab", "a", "c", "</w>"))
    // greedy fixpoint inside one merge: aaaa → [aa, aa] then no (a,b)
    assert(enc("aaaa") == Seq("aa", "aa", "</w>"))
    assert(enc("ab") == Seq("ab", "</w>"))
    // unseen symbols pass through untouched
    assert(enc("xyz") == Seq("x", "y", "z", "</w>"))
    // empty word = bare end-of-word marker (no descending-sequence trap)
    assert(enc("") == Seq("</w>"))
  }

  test("encodeDict equals the fit's incrementally-merged vocabulary") {
    // rank-order each-to-fixpoint encoding must reproduce training's
    // incremental application for every training word (the equivalence
    // argued in Bpe's scaladoc) — check on a multi-word corpus
    val df = Seq((1L, "low lower lowest low low newer new"),
      (2L, "wider new newer widest low")).toDF("doc_id", "text")
    val merges = Bpe.fit(df, "text", 8)
    val words = df.select(explode(graft.functions.TextFunctions.tokens(col("text")))
      .alias("word"))
    val dict = Bpe.encodeDict(words, "word", merges)
      .select("word", "n_subwords").as[(String, Long)].collect().toMap
    // re-encode each distinct word one-shot and compare
    val oneShot = words.distinct()
      .select(col("word"), size(Bpe.encode(col("word"), merges)).cast("long"))
      .as[(String, Long)].collect().toMap
    assert(dict == oneShot)
    assert(dict.keySet == Set("low", "lower", "lowest", "newer", "new",
      "wider", "widest"))
    // every count in [1, len+1]
    assert(dict.forall { case (w, n) => n >= 1 && n <= w.length + 1 })
  }

  test("fertilityByLang sums exact integers per language") {
    val df = Seq(
      (1L, "en", "aa aa bb"),
      (2L, "en", "aa"),
      (3L, "de", "ccc")).toDF("doc_id", "lang", "text")
    // round 1: (a,a) and (a,</w>) tie at 3; "<" sorts before "a", so
    // (a,</w>) wins → a</w>.  aa→[a, a</w>]
    // round 2: (a, a</w>) count 3 wins → aa</w>.  aa→[aa</w>] (1 subword)
    val merges = Bpe.fit(df, "text", 2)
    assert(merges.map(m => (m.lhs, m.rhs)) ==
      Seq(("a", "</w>"), ("a", "a</w>")))
    val out = Bpe.fertilityByLang(df, "lang", "text", merges)
      .orderBy("lang").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    // en: aa,aa,aa → 1 subword each, bb → [b,b,</w>] = 3; de: ccc →
    // [c,c,c,</w>] = 4
    assert(out("en") == ((4L, 6L, 1.5)))
    assert(out("de") == ((1L, 4L, 4.0)))
  }
}
