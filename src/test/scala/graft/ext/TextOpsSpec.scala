package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class TextOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def one[T](c: org.apache.spark.sql.Column, text: String): T =
    Seq(text).toDF("text").select(c.as("r")).collect().head.getAs[T]("r")

  test("tokenCount counts whitespace tokens") {
    assert(one[Long](TextOps.tokenCount(col("text")), "a b c") == 3L)
    assert(one[Long](TextOps.tokenCount(col("text")), "solo") == 1L)
  }

  test("shingles: positional word n-grams; short docs yield empty") {
    assert(one[collection.Seq[String]](TextOps.shingles(col("text"), 3), "a b c d")
      .toList == List("a b c", "b c d"))
    assert(one[collection.Seq[String]](TextOps.shingles(col("text"), 3), "a b").isEmpty)
  }

  test("langId picks the language with most stopword hits; first wins ties; und when none") {
    assert(one[String](TextOps.langId(col("text")), "the cat and the dog is here") == "en")
    assert(one[String](TextOps.langId(col("text")), "der hund und die katze") == "de")
    assert(one[String](TextOps.langId(col("text")), "xyz qrs tuv") == "und")
    // 'la' is in both es and fr lists -> es declared first wins
    assert(one[String](TextOps.langId(col("text")), "la casa") == "es")
  }

  test("qualityScore is in (0,1] and rewards length/diversity") {
    val short = one[Double](TextOps.qualityScore(col("text")), "a a a a")
    val rich = one[Double](TextOps.qualityScore(col("text")),
      (1 to 60).map(i => s"word$i").mkString(" "))
    assert(short > 0 && short <= 1.0)
    assert(rich > short)
  }

  test("fingerprints: md5 is stable; rollingFingerprint survives prefix edits") {
    val doc = "alpha beta gamma delta epsilon zeta eta theta"
    val fp1 = one[String](TextOps.fingerprint(col("text")), doc)
    val fp2 = one[String](TextOps.fingerprint(col("text")), doc)
    assert(fp1 == fp2 && fp1.length == 32)
    val r1 = one[Long](TextOps.rollingFingerprint(col("text")), doc)
    // same doc with a new prefix: min-shingle-hash often unchanged (the
    // winnowing property); identical suffix must at least keep r1 reachable
    val r2 = one[Long](TextOps.rollingFingerprint(col("text")), "zzz " + doc)
    assert(r2 <= r1) // adding shingles can only lower or keep the min
  }

  test("approxSubwordCount adds length penalty beyond 6 chars") {
    assert(one[Long](TextOps.approxSubwordCount(col("text")), "short words here") == 3L)
    assert(one[Long](TextOps.approxSubwordCount(col("text")), "internationalization") == 1L + 3L)
  }

  test("tokenStats aggregates corpus frequencies") {
    val df = Seq("a b a", "b c").toDF("text")
    val stats = TextOps.tokenStats(df).as[(String, Long)].collect().toMap
    assert(stats == Map("a" -> 2L, "b" -> 2L, "c" -> 1L))
  }

  test("normalize lowercases, folds punctuation, collapses whitespace") {
    assert(one[String](TextOps.normalize(col("text")),
      "  Hello,   WORLD!! (really) \"quoted\"; it's-fine  ") ==
      "hello world really quoted it s fine")
    // non-ASCII letters pass through untouched
    assert(one[String](TextOps.normalize(col("text")), "的是 了!") == "的是 了")
  }

  test("blocklistStats: occurrence counts and integer ppm, one pass") {
    val df = Seq(
      (1L, "bad word here bad again"),  // 2 hits of 5 tokens -> 400000 ppm
      (2L, "clean text only"),
      (3L, "bad bad bad")               // all 3 -> 1000000 ppm
    ).toDF("doc_id", "text")
    val (hits, ppm) = TextOps.blocklistStats(col("text"), Seq("bad", "worse"))
    val out = df.select(col("doc_id"), hits, ppm)
      .as[(Long, Long, Long)].collect().sortBy(_._1).toList
    assert(out == List((1L, 2L, 400000L), (2L, 0L, 0L), (3L, 3L, 1000000L)))
  }

  test("repetitionStats: dup fractions and mean word length, integer-exact") {
    def stats(text: String): (Long, Long, Long, Long) = {
      val (a, b, c, d) = TextOps.repetitionStats(col("text"))
      val r = Seq(text).toDF("text")
        .select(a.as("nt"), b.as("dw"), c.as("db"), d.as("ml")).collect().head
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    // "a a a b": 4 tokens, 2 distinct -> dup_word = 2/4 = 500000 ppm;
    // bigrams [a a, a a, a b]: 3 total, 2 distinct -> 333333 ppm;
    // 7 chars - 3 spaces = 4 letters / 4 tokens -> 100 centichars
    assert(stats("a a a b") == (4L, 500000L, 333333L, 100L))
    // no repetition at all
    assert(stats("one two three") == (3L, 0L, 0L, 366L))
    // single token: no bigrams -> 0 ppm (not NULL/division error)
    assert(stats("solo") == (1L, 0L, 0L, 400L))
  }

  test("urls + urlDomain: extraction and registrable-domain folding") {
    val us = one[collection.Seq[String]](TextOps.urls(col("text")),
      "go to https://a.b.example.com/x/y_1.png then http://plain.org stop")
    assert(us.toList == List("https://a.b.example.com/x/y_1.png", "http://plain.org"))
    assert(one[String](TextOps.urlDomain(lit("https://a.b.example.com/x")), "") == "example.com")
    assert(one[String](TextOps.urlDomain(lit("http://plain.org")), "") == "plain.org")
  }

  test("bigramLmScore: templated text scores more predictable than rare transitions") {
    // corpus: "a b" dominates after 'a'; one doc takes the rare "a z" path
    val docs = Seq(
      (1L, "a b a b a b a b"),
      (2L, "a b a b a b a b"),
      (3L, "a b a b a b a b"),
      (4L, "a z a z"),
      (5L, "x")) // single token: no bigrams -> absent
      .toDF("doc_id", "text")
    val m = TextOps.bigramLmScore(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(!m.contains(5L))
    // p(b|a) = 12/14, p(z|a) = 2/14: rare-path docs must score higher
    assert(m(4L)._2 > m(1L)._2,
      s"rare transitions must score above templated text: $m")
    // identical docs score identically; score is deterministic
    assert(m(1L) == m(2L) && m(2L) == m(3L))
    // exact pin: doc 1 bigrams = 4x(a b) + 3x(b a), all p known
    val pAB = 12.0 / 14.0; val pBA = 9.0 / 9.0
    val expect = math.floor((4 * math.floor(-math.log(pAB) * 1e6) +
      3 * math.floor(-math.log(pBA) * 1e6)) / 7).toLong
    assert(m(1L) == (7L, expect))
  }

  test("chunkTokens windows with stride and a short final chunk") {
    def chunks(s: String, size: Int, overlap: Int): List[String] =
      one[collection.Seq[String]](TextOps.chunkTokens(col("text"), size, overlap), s).toList
    // 7 tokens, size 3, no overlap: 3 + 3 + 1
    assert(chunks("a b c d e f g", 3, 0) == List("a b c", "d e f", "g"))
    // overlap 1 -> stride 2: windows at 0,2,4 cover all 7 tokens
    assert(chunks("a b c d e f g", 3, 1) == List("a b c", "c d e", "e f g"))
    // exact multiple: no dangling window
    assert(chunks("a b c d", 2, 0) == List("a b", "c d"))
    // shorter than one window: the doc is its own chunk
    assert(chunks("a b", 5, 2) == List("a b"))
    assert(chunks("", 4, 0) == Nil)
    // reconstruction at overlap 0: concatenating chunks restores the text
    val doc = (1 to 23).map(i => s"w$i").mkString(" ")
    assert(chunks(doc, 5, 0).mkString(" ") == doc)
    // every chunk except the last is exactly `size` tokens
    val cs = chunks(doc, 5, 2)
    assert(cs.init.forall(_.split(" ").length == 5) && cs.last.split(" ").length <= 5)
    assert(intercept[IllegalArgumentException](
      TextOps.chunkTokens(col("text"), 3, 3)).getMessage.contains("overlap"))
  }

  test("lmScoreBuckets: CCNet-style quantile bands over the bigram LM score") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = TextOps.lmScoreBuckets(docs, nBuckets = 3)
      .select("id", "lm_score_unats", "bucket").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    assert(out.map(_._3).toSet.subsetOf(Set(1L, 2L, 3L)))
    // banding is monotone in the score: every head doc scores <= every
    // tail doc
    val byBucket = out.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
    assert(byBucket.keySet == Set(1L, 2L, 3L), s"bands seen: ${byBucket.keySet}")
    assert(byBucket(1L).max <= byBucket(3L).min)
    assert(byBucket(1L).max <= byBucket(2L).min || byBucket(2L).isEmpty)
    // roughly balanced thirds (ties at a cutoff may skew populations)
    val n = out.length
    byBucket.values.foreach(b =>
      assert(b.length > n / 6 && b.length < n / 2, s"band sizes: ${byBucket.view.mapValues(_.length).toMap}"))
    // deterministic
    val again = TextOps.lmScoreBuckets(docs, nBuckets = 3)
      .select("id", "bucket").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out.forall { case (id, _, b) => again(id) == b })
    // empty input: no cutoffs exist; must return an empty frame, not NPE
    assert(TextOps.lmScoreBuckets(docs.filter(lit(false)), nBuckets = 3).isEmpty)
  }

  test("sentences: splits after terminal punctuation, drops empty tails") {
    assert(one[collection.Seq[String]](TextOps.sentences(col("text")),
      "First one. Second two! Third three? tail").toList ==
      List("First one.", "Second two!", "Third three?", "tail"))
    // trailing punctuation leaves no empty segment
    assert(one[collection.Seq[String]](TextOps.sentences(col("text")),
      "Only one sentence.").toList == List("Only one sentence."))
    // no punctuation -> the whole doc is one sentence
    assert(one[collection.Seq[String]](TextOps.sentences(col("text")),
      "no punctuation here").toList == List("no punctuation here"))
    // abbreviation-style periods split too (documented naive heuristic)
    val (n, meanC) = TextOps.sentenceStats(col("text"))
    assert(one[Long](n, "a b. c d. e f.") == 3L)
    assert(one[Long](meanC, "a b. c d. e f.") == 200L) // 6 tokens / 3 = 2.00
  }

  test("sentences: RE2-safe sentinel split equals the lookbehind formulation") {
    // the previous implementation, kept here as the behavioral reference
    val reference = org.apache.spark.sql.functions.filter(
      split(col("text"), "(?<=[.!?])\\s+"),
      s => length(trim(s)) > 0)

    // tricky hand cases: terminator runs, tabs/newlines, abbreviations,
    // unicode, punctuation-only docs, empty-ish strings
    val tricky = Seq(
      "Dr. No! Right? yes.. end", "a.. b", "a.\t\nb", "x!?  y", "...",
      "one. two.  three.", " leading. ", "no terminators at all",
      "¿qué? sí. 好。中文! ok", "a . b", "e.g. i.e. etc.", "!bang", "")
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val trickyDf = tricky.toDF("doc_id", "text")
    val trickyOut = trickyDf.select(col("doc_id"),
      TextOps.sentences(col("text")).as("now"), reference.as("ref"))
      .collect()
    trickyOut.foreach { r =>
      assert(r.getAs[collection.Seq[String]]("now") == r.getAs[collection.Seq[String]]("ref"),
        s"doc ${r.getLong(0)}: '${tricky(r.getLong(0).toInt)._2}'")
    }

    // property: equality over the whole fixture corpus
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val mismatches = docs.select(
      TextOps.sentences(col("text")).as("now"), reference.as("ref"))
      .filter(col("now") =!= col("ref")).count()
    assert(mismatches == 0L, s"$mismatches fixture docs segment differently")
  }

  test("stripMarkup removes tags, unescapes one entity level, collapses whitespace") {
    assert(one[String](TextOps.stripMarkup(col("text")),
      "<div id=\"x\"><p>a  b</p> c <br/> d</div>") == "a b c d")
    assert(one[String](TextOps.stripMarkup(col("text")),
      "x &lt;tag&gt; &amp; &quot;q&quot; &#39;s&#39; y") == "x <tag> & \"q\" 's' y")
    // escaped escape unescapes exactly ONE level: &amp;lt; -> &lt;
    assert(one[String](TextOps.stripMarkup(col("text")), "a &amp;lt;b y") == "a &lt;b y")
    // markup-free text passes through (modulo whitespace collapse)
    assert(one[String](TextOps.stripMarkup(col("text")), "plain  text") == "plain text")
  }

  test("lexicalDiversity: TTR and hapax fractions, integer-exact") {
    val docs = Seq((1L, "a b a c b a"), (2L, "x y z"), (3L, "w w w w")).toDF("doc_id", "text")
    val m = TextOps.lexicalDiversity(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(m(1L) == (6L, 3L, 1L, 500000L, 166666L)) // a×3 b×2 c×1: hapax = c
    assert(m(2L) == (3L, 3L, 3L, 1000000L, 1000000L)) // all distinct
    assert(m(3L) == (4L, 1L, 0L, 250000L, 0L)) // one type, no hapax
  }

  test("scrubPii redacts every email and phone, emails first") {
    val in = "mail a.b+c@ex-1.org or bob@x.io, call +1 (555) 010-1234 / 555 010 2244 end"
    assert(one[String](TextOps.scrubPii(col("text")), in) ==
      "mail <EMAIL> or <EMAIL>, call <PHONE> / <PHONE> end")
    // 7 digits is below the pattern's 9-digit minimum — left alone
    assert(one[String](TextOps.scrubPii(col("text")), "id 5550102 end") ==
      "id 5550102 end")
    // ISO dates (8 digits) and small thousand-separated numbers escape
    assert(one[String](TextOps.scrubPii(col("text")), "on 2024-01-01 pay 1 000 000") ==
      "on 2024-01-01 pay 1 000 000")
    // a bare 9-digit run still redacts (documented over-match toward safety)
    assert(one[String](TextOps.scrubPii(col("text")), "acct 123456789 end") ==
      "acct <PHONE> end")
    // no false positive on clean text
    assert(one[String](TextOps.scrubPii(col("text")), "plain words only") ==
      "plain words only")
  }

  test("importanceWeights: target-like docs upweight, alien docs downweight, clamps hold") {
    import spark.implicits._
    // target: alpha ALWAYS continues to beta (a->b, b->g, g->a all 1e6)
    val target = (0L until 10L)
      .map(i => (i, "alpha beta gamma alpha beta gamma alpha beta"))
      .toDF("doc_id", "text")
    // corpus: half target-like, half continuing alpha to DELTA instead —
    // the SAME head words with different continuations, so the corpus
    // conditionals split (a->b = a->d = 500000) while the target's stay
    // certain; disjoint vocabularies would NOT separate the weights,
    // conditional models are per-head
    val corpus = (
      (100L until 120L).map(i => (i, "alpha beta gamma alpha beta gamma alpha beta")) ++
      (200L until 220L).map(i => (i, "alpha delta zeta alpha delta zeta alpha delta"))
    ).toDF("doc_id", "text")
    val w = TextOps.importanceWeights(corpus, target)
      .as[(Long, Long)].collect().toMap
    // target-like docs: a->b diff +500000 on 3 of 7 bigrams -> upweight
    (100L until 120L).foreach(i => assert(w(i) > 1000L, s"doc $i: ${w(i)}"))
    // alien docs: every bigram unseen in target -> mean diff ~ -785k
    (200L until 220L).foreach(i => assert(w(i) < 1000L, s"doc $i: ${w(i)}"))
    // clamp floor: with scaleDiv=100 the alien mean (~ -1e6 ppm) maps far
    // below minMilli and must clamp exactly there
    assert((200L until 220L).forall(i => w(i) == 200L), s"$w")

    // determinism + partition invariance
    val w2 = TextOps.importanceWeights(corpus.repartition(7), target.repartition(3))
      .as[(Long, Long)].collect().toMap
    assert(w == w2)

    // end-to-end: resampling keeps >= the alien floor share and repeats
    // no alien doc; docs with < 2 tokens pass through at neutral weight
    val withTiny = corpus.union(Seq((300L, "solo")).toDF("doc_id", "text"))
    val out = Sampling.importanceResample(withTiny, target)
    val tiny = out.filter(col("doc_id") === 300L)
      .select("weight_milli").as[Long].collect()
    assert(tiny.toSeq == Seq(1000L), "bigram-less doc must resample neutrally")
    val alienMax = out.filter(col("doc_id") >= 200L && col("doc_id") < 300L)
      .groupBy("doc_id").agg(max(col("copy")).as("m"))
      .select("m").as[Long].collect()
    assert(alienMax.forall(_ == 1L), "downweighted docs never emit extra copies")
  }

  test("sourceReputation: verdict follows the SOURCE mean, not the document") {
    import spark.implicits._
    // goodsite: long varied docs; spamfarm: short repetitive ones — but
    // each hosts ONE document of the opposite character
    val docs = (
      (0L until 20L).map(i => (i, s"alpha beta gamma delta epsilon zeta eta theta text$i longer words", "goodsite")) ++
      Seq((20L, "spam spam", "goodsite")) ++
      (21L until 41L).map(i => (i, "buy buy buy", "spamfarm")) ++
      Seq((41L, "alpha beta gamma delta epsilon zeta eta theta unique longer words", "spamfarm")) ++
      Seq((42L, "orphan doc with a null source and plenty of distinct words", null))
    ).toDF("doc_id", "text", "source")
    // threshold = midpoint of the two observed source means, so the test
    // pins the RELATIVE ordering rather than the absolute formula value
    val probe = TextOps.sourceReputation(docs, minMeanPpm = 0L)
      .select("source", "src_quality_ppm").distinct()
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    val midPpm = (probe(Some("goodsite")) + probe(Some("spamfarm"))) / 2
    val out = TextOps.sourceReputation(docs, minMeanPpm = midPpm)
    val verdicts = out.select("doc_id", "kept").as[(Long, Boolean)].collect().toMap
    assert(verdicts.size == 43, "one verdict row per document, nulls included")
    // the spam doc on the good site survives; the good doc on the farm dies
    assert(verdicts(20L), "source reputation overrides the bad document")
    assert(!verdicts(41L), "source reputation overrides the good document")
    // source mean is an exact integer and constant within a source
    val means = out.select("source", "src_quality_ppm").distinct()
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(means.size == 3, s"one mean per source incl. null: $means")
    assert(means(Some("goodsite")) > means(Some("spamfarm")))
  }

  test("percentileRankPpm: per-key integer percentiles, ties share, singletons zero") {
    import spark.implicits._
    val df = Seq(
      (0L, "en", 100L), (1L, "en", 200L), (2L, "en", 200L),
      (3L, "en", 300L), (4L, "en", 400L),
      (5L, "de", 999L) // singleton group
    ).toDF("doc_id", "lang", "score")
    val got = TextOps.percentileRankPpm(df, col("lang"), col("score"))
      .select("doc_id", "pct_ppm").as[(Long, Long)].collect().toMap
    // en ranks: 100->1, 200->2 (both), 300->4, 400->5; n-1 = 4
    assert(got == Map(
      0L -> 0L, 1L -> 250000L, 2L -> 250000L,
      3L -> 750000L, 4L -> 1000000L, 5L -> 0L))
  }

  test("canonicalUrl: case, ports, tracking params, fragments, slashes") {
    def canon(u: String): String =
      one[String](TextOps.canonicalUrl(col("text")), u)
    // authority lowercases + default https port drops; PATH case survives
    assert(canon("HTTPS://WWW.Ex.COM:443/Path/?utm_source=a&b=1#f")
      == "https://www.ex.com/Path/?b=1")
    // default http port; trailing slash
    assert(canon("http://Ex.com:80/a/") == "http://ex.com/a")
    // sole tracking param leaves no dangling '?'
    assert(canon("http://ex.com/a?gclid=z123") == "http://ex.com/a")
    // tracking param LAST leaves no dangling '&'
    assert(canon("http://ex.com/a?x=1&utm_campaign=c") == "http://ex.com/a?x=1")
    // tracking param FIRST keeps the following real param
    assert(canon("http://ex.com/a?fbclid=q&x=1") == "http://ex.com/a?x=1")
    // non-default port survives; path case preserved
    assert(canon("http://EX.com:8080/CaseSensitive") ==
      "http://ex.com:8080/CaseSensitive")
    // already-canonical URLs are fixpoints
    val fix = "http://ex.com/a?x=1"
    assert(canon(canon(fix)) == canon(fix))
    // anchored matching: a param NAMED xutm_source is not a tracking
    // param, and 'fbclid=' inside a PATH segment is untouched
    assert(canon("http://ex.com/a?xutm_source=5") == "http://ex.com/a?xutm_source=5")
    assert(canon("http://ex.com/p/fbclid=2/x") == "http://ex.com/p/fbclid=2/x")
    // CONSECUTIVE tracking params all strip in one pass
    assert(canon("http://ex.com/a?utm_a=1&utm_b=2&c=3") == "http://ex.com/a?c=3")
    assert(canon("http://ex.com/a?c=3&utm_a=1&gclid=2") == "http://ex.com/a?c=3")
  }

  test("bm25TopK: disjunctive match, rare-term weight dominates, deterministic ranks") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma delta"), // both query terms
      (2L, "alpha common words here"), // common term only
      (3L, "beta something else entirely"), // rare term only
      (4L, "alpha alpha alpha alpha"), // common term, high tf
      (5L, "no match at all")
    ).toDF("doc_id", "text")
    // 'beta' appears in 2 docs, 'alpha' in 3 -> beta is rarer, higher idf
    val queries = Seq((1L, "alpha"), (1L, "beta")).toDF("qid", "term")
    val got = TextOps.bm25TopK(docs, queries, k = 5)
      .orderBy("rnk")
      .select("id", "n_matched").as[(Long, Long)].collect().toList
    assert(got.map(_._1).toSet == Set(1L, 2L, 3L, 4L), "doc 5 never matches")
    assert(got.head._1 == 1L, "the both-terms doc ranks first")
    assert(got.toMap.apply(1L) == 2L, "n_matched counts distinct matched terms")
  }

  test("phraseStats: adjacency required, overlaps count, short docs safe") {
    import spark.implicits._
    def stats(text: String, phrase: Seq[String]): (Long, Option[Long]) = {
      val (n, p) = TextOps.phraseStats(col("text"), phrase)
      val r = Seq(text).toDF("text").select(n.as("n"), p.as("p")).collect().head
      (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long]))
    }
    assert(stats("a b c d", Seq("b", "c")) == (1L, Some(1L)))
    assert(stats("a b x c d", Seq("b", "c")) == (0L, None)) // not adjacent
    assert(stats("b b b", Seq("b", "b")) == (2L, Some(0L))) // overlapping
    assert(stats("x", Seq("b", "c")) == (0L, None)) // doc shorter than phrase
    assert(stats("a b c", Seq("a", "b", "c")) == (1L, Some(0L))) // 3-gram
  }

  test("percentileRankPpm survives key groups past the int-overflow boundary") {
    import spark.implicits._
    // 3000 rows in one group: rank*1e6 overflows Int unless widened
    val big = (0 until 3000).map(i => (i.toLong, "en", i.toLong)).toDF("doc_id", "lang", "score")
    val got = TextOps.percentileRankPpm(big, col("lang"), col("score"))
      .agg(min("pct_ppm"), max("pct_ppm")).as[(Long, Long)].collect().head
    assert(got == (0L, 1000000L))
  }

  test("collocations: Dice and conditional ppm exact; minCount filters; ranked cut") {
    // "new york" appears 3x; "new" also starts "new day" once (left
    // marginal 4); "york" only ever follows "new" (right marginal 3).
    // "a b" appears 2x with both marginals 2 — perfect association.
    val docs = Seq(
      "new york new york a b",
      "new york new day a b"
    ).toDF("text")
    val rows = TextOps.collocations(docs, minCount = 2L, topN = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    // bigrams per doc are positional: doc1 has [new york, york new,
    // new york, york a, a b]; doc2 [new york, york new, new day, day a, a b]
    val (n, dice, c, rc) = rows(("new", "york"))
    assert(n == 3L)
    // left marginal new• = 4 (3x "new york" + "new day"); right •york = 3
    assert(dice == 3L * 2000000L / 7L)
    assert(c == 3L * 1000000L / 4L && rc == 1000000L)
    val (n2, dice2, c2, rc2) = rows(("a", "b"))
    assert(n2 == 2L && dice2 == 1000000L && c2 == 1000000L && rc2 == 1000000L)
    // "york new" (n=2): left york• = 3 ("york new" x2 + "york a"), right •new = 2
    assert(rows(("york", "new"))._1 == 2L)
    // below minCount: "new day", "york a", "day a" (n=1) are absent
    assert(!rows.contains(("new", "day")) && !rows.contains(("york", "a")))
    // perfect association ranks first
    val first = TextOps.collocations(docs, minCount = 2L, topN = 1)
      .select("w1", "w2").as[(String, String)].collect().head
    assert(first == ("a", "b"))
  }

  test("oovStats: boundary ties break to the smaller token; multiplicity counts") {
    // freqs: a=4, b=3, c=3, d=1 — vocab of 2 is {a, b}: b beats c on
    // the lexicographic tie at count 3
    val docs = Seq(
      (1L, "a a a b b"), // all in vocab -> 0/5
      (2L, "a c c d"),   // c,c,d oov -> 3/4
      (3L, "b c"),       // c oov -> 1/2
      (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = TextOps.oovStats(docs, col("doc_id"), col("text"), 2)
      .select("id", "n_tokens", "n_oov", "oov_ppm")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 5L, 0L, 0L)))
    assert(got(2L) == ((2L, 4L, 3L, 750000L)))
    assert(got(3L) == ((3L, 2L, 1L, 500000L)))
    assert(!got.contains(4L), "NULL text emits no row")
  }

  test("distinctiveTokens: rate lift surfaces each key's own words; uniform words lift nowhere") {
    val docs = Seq(
      ("s1", "common common alpha alpha alpha"),
      ("s2", "common common beta beta beta")
    ).toDF("source", "text")
    val got = TextOps.distinctiveTokens(docs, col("source"), col("text"), topK = 1)
      .select("key", "tok", "lift_ppm", "rk")
      .as[(String, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    // per key: own word 3/5 vs corpus 3/10 -> +300000; common 2/5 vs
    // 4/10 -> 0; the other key's word never appears in this key's cells
    assert(got("s1") == (("s1", "alpha", 300000L, 1L)), s"got ${got("s1")}")
    assert(got("s2") == (("s2", "beta", 300000L, 1L)), s"got ${got("s2")}")
  }

  test("sourceNovelty: unique shingles per source, cross-source repeats excluded") {
    val docs = Seq(
      ("s1", "a b c d"),     // trigrams: "a b c", "b c d"
      ("s2", "a b c x"),     // shares "a b c"; unique "b c x"
      ("s2", "a b c x")      // duplicate doc adds nothing
    ).toDF("source", "text")
    val got = TextOps.sourceNovelty(docs, col("source"), col("text"), shingleN = 3)
      .select("key", "n_distinct", "n_unique", "unique_ppm")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got("s1") == (("s1", 2L, 1L, 500000L)), s"got ${got("s1")}")
    assert(got("s2") == (("s2", 2L, 1L, 500000L)), s"got ${got("s2")}")
  }

  test("tvDrift: symmetric disjoint sources, coarsened __other bucket, exact floors") {
    // source token counts: same {x:4, y:3}, diff {z:4, w:3}; corpus
    // {x:4, z:4, w:3, y:3} over 14 -> vocab(2) = {x, z} (count tie at 4,
    // lexicographic), y/w collapse into __other
    val docs = Seq(
      ("same", "x x x y y"), ("same", "x y"),
      ("diff", "z z z w w"), ("diff", "z w")
    ).toDF("source", "text")
    val got = TextOps.tvDrift(docs, col("source"), col("text"), vocabSize = 2)
      .select("key", "n_tokens", "tv_ppm")
      .as[(String, Long, Long)].collect().map(r => r._1 -> r).toMap
    // corpus ppm: x 285714, z 285714, __other 428571
    // same ppm:   x 571428, z 0,      __other 428571
    // -> sum|diff| = 571428, tv = 285714; symmetric for diff
    assert(got("same") == (("same", 7L, 285714L)), s"got ${got("same")}")
    assert(got("diff") == (("diff", 7L, 285714L)), s"got ${got("diff")}")
  }

  test("syllableStats: vowel RUNS count once; integer Flesch variant") {
    // "queue table" -> runs: 'ueue'(1) + 'a','e'(2) = 3 groups, 2 words
    val docs = Seq(
      (1L, "queue table"),
      (2L, "xyz zz"), // y is a vowel here: 1 group, 2 words
      (3L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val got = TextOps.syllableStats(docs, col("doc_id"), col("text"))
      .select("id", "n_words", "n_groups", "syll_per_word_ppm", "ease_milli")
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 2L, 3L, 1500000L,
      206835L - 1015L * 2 - (84600L * 3) / 2)))
    assert(got(2L) == ((2L, 2L, 1L, 500000L,
      206835L - 1015L * 2 - 84600L / 2)))
    assert(!got.contains(3L))
  }

  test("encodingAudit: counts each corruption signature; tab/LF/CR are not control hits") {
    val docs = Seq(
      (1L, Some("plain clean text")),
      (2L, Some("caf\u00c3\u00a9 na\u00c3\u00afve")), // 2 mojibake leaders
      (3L, Some("a\ufffdb\ufffd\ufffd")), // 3 replacement chars
      (4L, Some("xyz ")),                  // BEL, ESC, NUL = 3
      (5L, Some("tab\there\nand\rthere")),                  // whitespace controls OK
      (6L, None)                                            // NULL excluded
    ).toDF("doc_id", "text")
    val got = TextOps.encodingAudit(docs, col("doc_id"), col("text"))
      .as[(Long, Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 0L, 0L, 0L, "clean")))
    assert(got(2L) == ((2L, 0L, 0L, 2L, "suspect")))
    assert(got(3L) == ((3L, 3L, 0L, 0L, "suspect")))
    assert(got(4L) == ((4L, 0L, 3L, 0L, "suspect")))
    assert(got(5L) == ((5L, 0L, 0L, 0L, "clean")), s"got ${got(5L)}")
    assert(!got.contains(6L))
  }

  test("langConfidence: margin separates decisive from mixed; no evidence -> NULL") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      (1L, "the cat of the house is big and the dog is small"), // en, decisive
      (2L, "the der cat und dog the und la"), // en 3 vs de 2: mixed
      (3L, "xyzzy plugh quux")                 // no stopwords at all
    ).toDF("doc_id", "text")
    val out = TextOps.langConfidence(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2),
        r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4)))).toMap
    // doc 1: en hits: the x3, of, is x2, and -> 7; runner-up 0
    assert(out(1L) == (("en", 7L, 0L, 1000000L)))
    // doc 2: en: the x2 -> wait: the,the=2 + und? en list: the,a,of,and,is
    // en hits = 2 (the,the); de hits = und,und,der = 3 -> de wins 3 vs 2
    assert(out(2L)._1 == "de" && out(2L)._2 == 3L)
    assert(out(2L)._4 == ((3L - out(2L)._3) * 1000000L) / (3L + out(2L)._3))
    assert(out(3L) == (("und", 0L, 0L, -1L)))
  }

  test("sourceAblation: LOO means reconcile with direct recomputation; single source -> NULLs") {
    import org.apache.spark.sql.functions.col
    val docs = Seq(
      ("web", "alpha beta gamma delta"), ("web", "one two three"),
      ("books", "the quick brown fox jumps over the lazy dog"))
      .toDF("source", "text")
    val out = TextOps.sourceAblation(docs, col("source"), col("text"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))).toMap

    // direct recomputation of the additive identities
    val q = docs.select(TextOps.qualityScorePpm(col("text")).as("q"),
        col("source")).as[(Long, String)].collect()
    val tQ = q.map(_._1).sum
    val webQ = q.filter(_._2 == "web").map(_._1).sum
    val booksQ = tQ - webQ
    assert(out("web")._1 == 2L && out("web")._2 == 7L)
    assert(out("books")._1 == 1L && out("books")._2 == 9L)
    assert(out("web")._3 == 7L * 1000000L / 16L)
    assert(out("web")._4 == webQ / 2L)
    assert(out("web")._5 == booksQ) // corpus without web = books alone
    assert(out("web")._6 == tQ / 3L - booksQ)

    val solo = TextOps.sourceAblation(
      Seq(("only", "just one doc")).toDF("source", "text"),
      col("source"), col("text")).collect().head
    assert(solo.isNullAt(5) && solo.isNullAt(6))
  }

  test("rakeKeyphrases: hand-scored deg/freq phrases, identical phrases collapse") {
    // stopword "of" splits runs. freq: red 1, green 1, apple 4;
    // deg: red 2, green 2, apple 6 -> wscores 2000/2000/1500;
    // phrases: "red apple" 3500, "green apple" 3500, "apple" x2 @1500
    val docs = Seq(
      (1L, "red apple of green apple"),
      (2L, "apple of apple")).toDF("doc_id", "text")
    val got = TextOps.rakeKeyphrases(docs, topK = 10)
      .as[(String, Long, Long, Long)].collect().toList
    assert(got == List(
      ("green apple", 2L, 1L, 3500L),
      ("red apple", 2L, 1L, 3500L),
      ("apple", 1L, 2L, 1500L)), s"got $got")
  }

  test("rakeKeyphrases: double spaces ignored, all-stopword doc contributes nothing") {
    val docs = Seq(
      (1L, "the of and"), (2L, "big  data")).toDF("doc_id", "text")
    val got = TextOps.rakeKeyphrases(docs, topK = 10)
      .as[(String, Long, Long, Long)].collect().toList
    // "big data" is one phrase (the empty token vanishes): deg 2 each,
    // freq 1 each -> phrase score 4000
    assert(got == List(("big data", 2L, 1L, 4000L)), s"got $got")
  }
}
