package graft

import org.apache.spark.sql.functions._
import graft.text.Text

class TextSpec extends SparkSpec {

  test("tokens: whitespace split, empties filtered") {
    import spark.implicits._
    val df = Seq("  the quick   brown ", "").toDF("text")
    val n = df.select(size(Text.tokens(col("text")))).collect().map(_.getInt(0))
    assert(n.toSeq == Seq(3, 0))
  }

  test("langGuess picks the marker list with most hits, 'und' when none") {
    import spark.implicits._
    val df = Seq(
      "the cat sat on a mat", "der hund und die katze",
      "le chat et la maison", "xyzzy plugh")
      .toDF("text")
    val got = df.select(Text.langGuess(Text.tokens(col("text")))).collect().map(_.getString(0))
    assert(got.toSeq == Seq("en", "de", "fr", "und"))
  }

  test("fingerprint matches a hand-computed rolling hash") {
    import spark.implicits._
    val df = Seq("ab").toDF("text")
    // h = ((0*31 + 97) * 31 + 98) % 1e9+7 = 97*31 + 98 = 3105
    val got = df.select(Text.fingerprint(spark, "text")).collect()(0).getLong(0)
    assert(got == 3105L)
  }

  test("shingles produce n-token windows; short docs yield none") {
    import spark.implicits._
    val df = Seq("a b c d", "a b").toDF("text")
    val got = df.select(Text.shingles(Text.tokens(col("text")), 3))
      .collect().map(_.getSeq[String](0))
    assert(got(0) == Seq("a b c", "b c d"))
    assert(got(1) == Seq.empty)
  }

  test("charShingles emit every substring position, ANSI-substr tails") {
    import spark.implicits._
    val df = Seq("abcde", "ab", "").toDF("text")
    val got = df.select(Text.charShingles(col("text"), 3))
      .collect().map(_.getSeq[String](0))
    assert(got(0) == Seq("abc", "bcd", "cde"))
    // shorter than n: one whole-text shingle (substr truncates)
    assert(got(1) == Seq("ab"))
    // empty text: single empty shingle, kept so the row survives
    assert(got(2) == Seq(""))
  }

  test("chunk produces overlapping windows covering every token") {
    import spark.implicits._
    val text = (1 to 90).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val chunks = Text.chunk(df, chunkTokens = 40, strideTokens = 20)
      .collect().map(r => (r.getLong(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1)
    assert(chunks.length == 4) // starts at tokens 1, 21, 41, 61
    assert(chunks.head._2.startsWith("w1 ") && chunks.head._3 == 40)
    assert(chunks.last._2.startsWith("w61") && chunks.last._3 == 30)
    // overlap: chunk 1 begins mid-chunk-0
    assert(chunks(1)._2.startsWith("w21"))
  }

  test("qualityFilter keeps only documents meeting all thresholds") {
    import spark.implicits._
    val good = ("good", (1 to 40).map(_ => "the word").mkString(" "))
    val short = ("short", "the a")
    val longTokens = ("longtok", (1 to 40).map(_ => "supercalifragilistic").mkString(" "))
    val df = Seq(good, short, longTokens).map { case (id, t) => (id, t) }
      .toDF("doc_id", "text")
    val kept = Text.qualityFilter(df, minTokens = 30, maxAvgTokenLen = 6.0,
      minStopwordRatio = 0.01).select(col("doc_id")).collect().map(_.getString(0))
    assert(kept.toSeq == Seq("good"))
  }

  test("features computes consistent ratios") {
    import spark.implicits._
    val df = Seq((1L, "the the xyzzy")).toDF("doc_id", "text")
    val r = Text.features(df).head()
    assert(r.getAs[Long]("n_tokens") == 3L)
    assert(r.getAs[Long]("n_distinct_tokens") == 2L)
    assert(r.getAs[Long]("stopword_hits") == 2L)
    assert(r.getAs[Double]("stopword_ratio") == 0.6667)
    assert(r.getAs[String]("lang_guess") == "en")
  }

  test("repetitionFeatures flags boilerplate and handles tiny docs") {
    import spark.implicits._
    val df = Seq(
      (1L, "spam spam spam spam spam spam"), // all 3-grams identical
      (2L, "one two three four five six"),   // no repetition
      (3L, "ab"),                            // < 3 tokens: zero 3-grams
      (4L, "")).toDF("doc_id", "text")
    val r = Text.repetitionFeatures(df).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getAs[Double]("dup_3gram_frac") == 0.75) // 4 grams, 1 distinct
    assert(r(1L).getAs[Double]("top_token_frac") == 1.0)
    assert(r(2L).getAs[Double]("dup_3gram_frac") == 0.0)
    assert(r(3L).getAs[Long]("n_3grams") == 0L)
    assert(r(3L).getAs[Double]("dup_3gram_frac") == 0.0)
    assert(r(4L).getAs[Double]("top_token_frac") == 0.0)
  }

  test("hashSplit is deterministic, complete, and roughly proportioned") {
    import spark.implicits._
    val df = (1L to 1000L).map(i => (i, s"doc$i")).toDF("doc_id", "text")
    val a = graft.ops.Relational.hashSplit(df, "doc_id")
      .select(col("doc_id"), col("split")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = graft.ops.Relational.hashSplit(df.repartition(7), "doc_id")
      .select(col("doc_id"), col("split")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a == b, "split must not depend on partitioning")
    assert(a.size == 1000)
    val frac = a.values.groupBy(identity).view.mapValues(_.size / 1000.0).toMap
    assert(frac("train") > 0.7 && frac("train") < 0.9)
    assert(frac("val") > 0.04 && frac("val") < 0.2)
    assert(frac("test") > 0.04 && frac("test") < 0.2)
  }

  test("stratifiedSampleByHash is deterministic and rate-respecting per stratum") {
    import spark.implicits._
    val df = (1L to 2000L).map(i => (i, if (i % 2 == 0) "en" else "de"))
      .toDF("doc_id", "lang")
    val a = graft.ops.Relational.stratifiedSampleByHash(
      df, "doc_id", "lang", Map("en" -> 50), defaultPct = 80)
    val b = graft.ops.Relational.stratifiedSampleByHash(
      df.repartition(13), "doc_id", "lang", Map("en" -> 50), defaultPct = 80)
    val ka = a.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ka == b.select("doc_id").collect().map(_.getLong(0)).toSet,
      "sample must not depend on partitioning")
    val byLang = a.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("en") > 350 && byLang("en") < 650)  // ~50% of 1000
    assert(byLang("de") > 650 && byLang("de") < 950)  // ~80% of 1000
  }

  test("normalizeRedact scrubs emails and digit runs and collapses space") {
    import spark.implicits._
    val df = Seq(
      (1L, "  Contact Bob.Smith+x@Example.COM  or call 5551234567 now \t"),
      (2L, "short 123456 stays")).toDF("doc_id", "text")
    val r = df.select(col("doc_id"), Text.normalizeRedact(col("text")).as("c"))
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r(1L) == "contact <EMAIL> or call <NUM> now")
    assert(r(2L) == "short 123456 stays") // 6 digits: below the 7+ threshold
  }

  test("packSequences: per-shard cumulative assignment, straddle flags, empties dropped") {
    import spark.implicits._
    val docs = Seq(
      (1L, "s1", "a b c"),          // 3 toks, before=0, seq 0
      (2L, "s1", "d e f g"),        // 4 toks, before=3, ends at 6 → straddles the 5-cut
      (3L, "s1", ""),               // empty → dropped
      (4L, "s1", "h i j"),          // before=7, seq 1, ends 9 → inside seq 1
      (5L, "s2", "x y")             // other shard restarts at 0
    ).toDF("doc_id", "source", "text")
    val got = Text.packSequences(docs, budgetTokens = 5)
      .collect().map(r => r.getLong(1) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    assert(!got.contains(3L))
    assert(got(1L) == ((3L, 0L, 0L, false)))
    assert(got(2L) == ((4L, 3L, 0L, true)))   // spans tokens 3..6 across the cut at 5
    assert(got(4L) == ((3L, 7L, 1L, false)))
    assert(got(5L) == ((2L, 0L, 0L, false)))  // shard s2 independent
  }

  test("unigramLogProb: uniform corpus scores ln(1/V) per token") {
    import spark.implicits._
    // 4 tokens total, each distinct → p = 1/4 each, avg = ln(0.25)
    val docs = Seq((1L, "a b"), (2L, "c d")).toDF("doc_id", "text")
    val got = Text.unigramLogProb(docs)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    val expected = BigDecimal(math.log(0.25)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == ((2L, expected)))
    assert(got(2L) == ((2L, expected)))
    // frequent tokens score higher (less negative) than rare ones
    val skew = Seq((1L, "a a a b")).toDF("doc_id", "text")
    val row = Text.unigramLogProb(skew).collect()(0)
    assert(row.getDouble(2) > math.log(0.25)) // 3/4 mass on 'a' beats uniform
  }

  test("bigramLogProb: repeated bigrams outscore rare ones; short docs " +
      "get zero bigrams and a null score") {
    import spark.implicits._
    // corpus: (a,b) seen twice, (a,c) once; unigrams a:3 b:2 c:1 x:1, N=7
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c"), (4L, "x"))
      .toDF("doc_id", "text")
    val got = Text.bigramLogProb(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double])))).toMap
    // identical docs score identically; exact value: λ=0.75,
    // p(b|a) = 0.75*2/3 + 0.25*2/7
    val pAB = BigDecimal(math.log(0.75 * 2.0 / 3.0 + 0.25 * 2.0 / 7.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(1L) == ((1L, Some(pAB))))
    assert(got(1L) == got(2L))
    // the rarer (a,c) bigram with the rarer tail scores strictly lower
    assert(got(3L)._2.get < got(1L)._2.get)
    // a single-token doc has no bigram positions
    assert(got(4L) == ((0L, None)))
  }

  test("dsirImportance: target-like pool docs carry positive log weight " +
      "and get selected; target docs never appear in the output") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a a b", "tgt"),  // target distribution: a:2 b:1
      (2L, "a a", "pool"),   // looks like the target
      (3L, "z z", "pool"))   // target has never seen z
      .toDF("doc_id", "text", "source")
    val got = Text.dsirImportance(docs, col("source") === "tgt").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getBoolean(3))))
      .toMap
    assert(got.keySet == Set(2L, 3L)) // doc 1 is target-side, excluded
    // vocab {a,b,z}: cnt_t a=2 b=1 z=0 (tot 3), cnt_p a=2 z=2 (tot 4), V=3
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val wA = r6(math.log(3.0 / 6.0)) - r6(math.log(3.0 / 7.0))
    val wZ = r6(math.log(1.0 / 6.0)) - r6(math.log(3.0 / 7.0))
    assert(got(2L) == ((2L, (wA * 2).toDouble, true)))
    assert(got(3L) == ((2L, (wZ * 2).toDouble, false)))
  }

  test("CdcBoundaries: the rolling pass equals the per-window poly_hash " +
      "recompute, and cdcChunks reassemble to the document") {
    import spark.implicits._
    graft.functions.CdcBoundaries.register(spark)
    graft.functions.PolyHash.register(spark)
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and then " * 8),
      (2L, "short"), // shorter than the window -> one whole-doc chunk
      (3L, ""))      // empty -> no chunks
      .toDF("doc_id", "text")
    // native rolling scan == O(n*w) HOF recompute, per position
    val both = docs.filter(length(col("text")) > 0).select(col("doc_id"),
      expr("graft_cdc_boundaries(text, 8, 64)").as("fast"),
      expr("filter(sequence(8, length(text)), i -> " +
        "graft_poly_hash(substring(text, i - 7, 8), 31, 1000000007) % 64 = 0)")
        .as("slow"))
    assert(both.filter(expr(
      "fast <> transform(slow, x -> CAST(x AS INT))")).count() == 0)
    val chunks = graft.text.Text.cdcChunks(docs, window = 8, divisor = 64)
    val byDoc = chunks.collect().groupBy(_.getLong(0))
    assert(!byDoc.contains(3L)) // empty doc yields no chunks
    assert(byDoc(2L).map(r => (r.getLong(2), r.getLong(3))).toSeq ==
      Seq((1L, 5L))) // sub-window doc is one whole chunk
    // doc 1 splits into multiple chunks that tile the text exactly
    val d1 = byDoc(1L).sortBy(_.getLong(1))
    assert(d1.length > 1)
    val text1 = "the quick brown fox jumps over the lazy dog and then " * 8
    assert(d1.head.getLong(2) == 1L)
    assert(d1.map(_.getLong(3)).sum == text1.length)
    d1.sliding(2).foreach { case Array(a, b) =>
      assert(b.getLong(2) == a.getLong(2) + a.getLong(3)) }
    // content-defined: the SAME repeated run yields repeated chunk digests
    assert(d1.map(_.getString(4)).distinct.length < d1.length)
  }

  test("bm25 matches the hand-computed Okapi formula on a 3-doc corpus") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark join spark x"), // tf(spark)=2, dl=4
      (2L, "join y z"),           // tf(join)=1,  dl=3
      (3L, "a b c d e")           // no query terms, but counts in N/avgdl
    ).toDF("doc_id", "text")
    val out = Text.bm25(docs, "doc_id", "text", Seq("spark", "join"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap

    val avgdl = 4.0   // (4 + 3 + 5) / 3
    def idf(df: Long) = math.rint(
      math.log((3.0 - df + 0.5) / (df + 0.5) + 1.0) * 1e6) / 1e6
    def tfc(tf: Double, dl: Long) = (tf * (1.2 + 1.0)) /
      (tf + 1.2 * ((1.0 - 0.75) + 0.75 * (dl / avgdl)))
    def contrib(tf: Double, dl: Long, df: Long) =
      math.rint(idf(df) * tfc(tf, dl) * 1e6) / 1e6

    assert(out.keySet === Set(1L, 2L))   // doc 3 matches no term
    assert(out(1L)._1 === 2L)
    assert(math.abs(out(1L)._2 -
      (contrib(2.0, 4, 1) + contrib(1.0, 4, 2))) < 1e-9)
    assert(out(2L) === ((1L, contrib(1.0, 3, 2))))
  }

  test("sentenceSplit: terminators close sentences, offsets are cumulative") {
    import spark.implicits._
    val df = Seq((1L, "Hi there. How? Fine! end"), (2L, "")).toDF("doc_id", "text")
    val out = Text.sentenceSplit(df).orderBy("doc_id", "sent_idx")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(4)))
    assert(out.toSeq === Seq(
      (1L, 1L, "Hi there.", 0L), (1L, 2L, " How?", 9L),
      (1L, 3L, " Fine!", 14L), (1L, 4L, " end", 20L)))
  }

  test("hashedLinearScore: exact integer mean, empty doc keeps nothing") {
    import spark.implicits._
    val df = Seq((1L, "alpha alpha alpha"), (2L, " ")).toDF("doc_id", "text")
    val out = Text.hashedLinearScore(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getBoolean(3)))).toMap
    // one distinct token repeated: the mean IS that token's bucket weight
    val h = graft.functions.PolyHash.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("alpha"), 31, 2147483647L)
    val wm = 2654435761L * ((h % 64) + 1) % 2000001L - 1000000L
    assert(out(1L) === ((3L, Some(wm), wm > 0)))
    assert(out(2L) === ((0L, None, false)))
  }

  test("gopherRepetition: repetitive docs drop, diverse docs keep, " +
    "fractions are exact micro-unit roundings") {
    import spark.implicits._
    val df = Seq(
      (1L, "a a a a a a a a"), // one token: distinct 1/8, top-2-gram covers all
      (2L, "the quick brown fox jumps over one lazy dog while rain falls " +
        "softly upon green hills near silver lakes under bright autumn " +
        "skies today"), // 24 distinct tokens
      (3L, "x y x y x y x y x y"), // 'x y' 2-gram dominates
      (4L, ""), // empty: all fractions 0, keep (vacuous)
      (5L, "one two three")).toDF("doc_id", "text")
    val out = Text.gopherRepetition(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(5),
        r.getDouble(6), r.getBoolean(7)))).toMap
    // doc 1: 7 2-grams all "a a" → dup 6/7; top-2-gram 2*7/8; distinct 1/8
    assert(out(1L)._1 == 8L)
    assert(out(1L)._2 == math.floor((6 * 2000000.0 + 7) / 14) / 1e6)
    assert(out(1L)._3 == 1.75) // 2*max2/n = 14/8
    assert(out(1L)._4 == 0.125)
    assert(!out(1L)._5)
    // doc 2: 24 distinct tokens, no repeated grams → keep
    // (top-2-gram coverage 2/24 rounds to 83333 micro-units exactly)
    assert(out(2L) === ((24L, 0.0, 0.083333, 1.0, true)))
    // doc 3: alternating pair → dup-heavy, top-2-gram-heavy, low distinct
    assert(!out(3L)._5)
    // doc 4: empty is vacuous-keep with all-zero fractions
    assert(out(4L) === ((0L, 0.0, 0.0, 0.0, true)))
    // doc 5: 3 tokens — too short for the 1/10 coverage rule (any 2-gram
    // covers 2/3 of it), so the verdict drops it
    assert(!out(5L)._5)
  }

  test("GramStats: native one-pass counts equal the HOF " +
    "array_distinct/filter chain on real corpus docs") {
    val s = spark
    import s.implicits._
    graft.functions.GramStats.register(s)
    val docs = Tables.documents(s, sf0001).select("text")
      .union(Seq("", "a", "a a", "a a a a", "x y x y").toDF("text"))
    for (n <- Seq(1, 2, 3, 4)) {
      val both = docs
        .withColumn("toks", Text.tokens(col("text")))
        .withColumn("g", Text.shingles(col("toks"), n))
        .select(
          expr(s"${graft.functions.GramStats.FnName}(toks, $n)").as("native"),
          size(col("g")).cast("long").as("h_n"),
          (size(col("g")) - size(array_distinct(col("g")))).cast("long").as("h_dup"),
          when(size(col("g")) === 0, lit(0L)).otherwise(
            array_max(transform(array_distinct(col("g")),
              gg => size(filter(col("g"), x => x === gg)))).cast("long"))
            .as("h_max"))
        .collect()
      both.foreach { r =>
        val nat = r.getSeq[Long](0)
        assert(nat == Seq(r.getLong(1), r.getLong(2), r.getLong(3)),
          s"n=$n: native $nat vs hof (${r.getLong(1)}, ${r.getLong(2)}, ${r.getLong(3)})")
      }
    }
  }

  test("bpeTokenize: the native merge-apply loop matches a reference BPE " +
    "on every corpus word, handles overlap runs and no-merge words") {
    import spark.implicits._
    import graft.functions.BpeEncode

    // independent reference implementation of the same algorithm
    def refEncode(word: String, merges: Seq[(String, String)]): Seq[String] = {
      val ranks = merges.zipWithIndex.toMap
      var syms = word.map(_.toString).toVector
      var done = false
      while (!done && syms.length >= 2) {
        val present = syms.zip(syms.tail).flatMap(p => ranks.get(p))
        if (present.isEmpty) done = true
        else {
          val (sx, sy) = merges(present.min)
          val out = Vector.newBuilder[String]
          var k = 0
          while (k < syms.length) {
            if (k + 1 < syms.length && syms(k) == sx && syms(k + 1) == sy) {
              out += sx + sy; k += 2
            } else { out += syms(k); k += 1 }
          }
          syms = out.result()
        }
      }
      syms
    }

    val merges = Text.BpeMerges
    // hand-picked edges: rank order matters ('the' = t+h first, NOT t+a),
    // overlap run, untokenizable word, single char
    val words = Seq("the", "table", "scan", "data", "window", "thth",
      "aaa", "zzz", "q", "tatata") ++
      Tables.documents(spark, sf0001).select("text").as[String].collect()
        .flatMap(_.split("\\s+")).filter(_.nonEmpty).distinct
    val df = words.toDF("word")
    val got = df.select(col("word"),
        BpeEncode(spark, col("word"), merges).as("pieces"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    words.foreach { w =>
      assert(got(w) == refEncode(w, merges), s"word '$w'")
    }
    // spot-pin a few results so the reference itself is checked
    assert(got("the") == Seq("the"))
    assert(got("scan") == Seq("scan"))
    assert(got("table") == Seq("table"))
    assert(got("data") == Seq("data"))
    // (a,n) at rank 2: "aaa" has no (a,a) merge → stays chars
    assert(got("aaa") == Seq("a", "a", "a"))
    // merge-all is non-overlapping left-to-right: t+h fuses twice
    assert(got("thth") == Seq("th", "th"))

    // corpus aggregate: piece counts equal the reference's counts
    val docs = Tables.documents(spark, sf0001)
    val agg = Text.bpeTokenize(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val refCounts = docs.select("text").as[String].collect()
      .flatMap(_.split("\\s+")).filter(_.nonEmpty)
      .flatMap(w => refEncode(w, merges))
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    assert(agg == refCounts)
  }

  test("phraseSearch finds every occurrence with 1-based start positions") {
    import spark.implicits._
    val df = Seq(
      (1L, "a b c a b c a b"), // "a b c" at 1 and 4
      (2L, "a a b c"),         // at 2
      (3L, "c b a"),           // none
      (4L, "a b")              // too short
    ).toDF("doc_id", "text")
    val got = Text.phraseSearch(df, Seq("a", "b", "c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == Set((1L, 1L), (1L, 4L), (2L, 2L)))
    // single-term phrase degenerates to the term's postings list
    val one = Text.phraseSearch(df, Seq("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(one == Set((1L, 3L), (1L, 6L), (2L, 4L), (3L, 1L)))
  }

  test("sourceKlDivergence: zero for identical distributions, positive for drift") {
    import spark.implicits._
    val df = Seq(
      ("s1", "x x y"), ("s2", "x x y"), // both near the corpus blend
      ("s3", "z")                       // disjoint rare token → large KL
    ).toDF("source", "text")
    val got = Text.sourceKlDivergence(df)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(got("s1")._1 == 3L && got("s2")._1 == 3L && got("s3")._1 == 1L)
    // KL is always >= 0 (Gibbs), and s3 (disjoint support) must dominate
    assert(got.values.forall(_._2 >= 0.0))
    assert(got("s3")._2 > got("s1")._2)
    assert(got("s1")._2 == got("s2")._2) // symmetric inputs, identical value
    // hand checks: corpus c(x)=4, c(y)=2, c(z)=1, N=7
    // s1: 2/3*ln(2*7/(3*4)) + 1/3*ln(1*7/(3*2)) = ln(7/6)
    // s3: 1*ln(1*7/(1*1)) = ln 7
    assert(math.abs(got("s1")._2 - math.log(7.0 / 6.0)) < 1e-6)
    assert(math.abs(got("s3")._2 - math.log(7.0)) < 1e-6)
  }

  test("bpeTrain fuses symbol runs canonically (Sennrich), not alternately") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "aaaa aaaa")).toDF("doc_id", "text")
    val merges = graft.text.Text.bpeTrain(docs, rounds = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3))).toList
    // round 1: 'a a a a' has 3 adjacent (a,a) pairs × word freq 2 = 6;
    // the CANONICAL fuse merges BOTH disjoint pairs in one pass →
    // 'aa aa', so round 2's best pair is (aa, aa) with count 2. A
    // boundary-consuming (alternating) fuse would leave 'aa a a' and
    // learn (a, a) or (aa, a) instead.
    assert(merges == List(
      (1L, "a a", "aa", 6L),
      (2L, "aa aa", "aaaa", 2L)), s"got $merges")
  }

  test("batched BPE training equals sequential when the round's picks " +
      "don't interact, and defers interacting picks to a recount") {
    val s = spark
    import s.implicits._
    // top pairs by count: (p,q)×6, (r,s)×4, (u,v)×3, (q,r)... — the top
    // picks are symbol-disjoint BY CONSTRUCTION, so a 2-per-round batch
    // must reproduce the sequential table exactly
    val disjoint = Seq(
      "pq pq pq rs rs uv", "pq pq pq rs rs uv", "uv").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    def table(df: org.apache.spark.sql.DataFrame, rounds: Int, k: Int) =
      graft.text.Text.bpeTrain(df, rounds, pairsPerRound = k)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getLong(3))).toList
    val seq4 = table(disjoint, rounds = 4, k = 1)
    val bat4 = table(disjoint, rounds = 2, k = 2)
    assert(bat4 == seq4,
      s"disjoint picks must reproduce sequential training:\n$seq4\nvs\n$bat4")
    // interacting top pairs: 'aaaa' makes (a,a) rank 1 and every other
    // candidate touch 'a' or the new 'aa' — the batch must DEFER them
    // (emit only the clean pick) rather than fuse on stale counts
    val runs = Seq((0L, "aaaa aaaa aaaa")).toDF("doc_id", "text")
    val batRuns = table(runs, rounds = 1, k = 3)
    assert(batRuns == List((1L, "a a", "aa", 9L)),
      s"interacting candidates must defer to the next recount: $batRuns")
    // ...and the deferred pair surfaces next round with RECOUNTED counts,
    // matching sequential training end to end
    assert(table(runs, rounds = 2, k = 3) == table(runs, rounds = 2, k = 1))
  }

  test("property: BPE segmentation is lossless and piece counts shrink " +
      "monotonically with more merges") {
    val s = spark
    import s.implicits._
    // adversarial vocabulary: runs, alternations, singletons, punctuation
    val docs = Seq(
      "aaaa abab banana mississippi x",
      "aaaa banana coool ... ..",
      "abab abab mississippi aaaa").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val merges = graft.text.Text.bpeTrain(docs, rounds = 6)
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    var prevTotal = Long.MaxValue
    for (k <- 0 to merges.length) {
      val seg = graft.text.Text.bpeApply(docs, merges.take(k))
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
      seg.foreach { case (word, nPieces, encoded) =>
        val pieces = encoded.split(' ')
        assert(pieces.mkString("") == word,
          s"lossless: pieces of '$word' must concatenate back, got '$encoded'")
        assert(pieces.length == nPieces, s"count mismatch for '$word'")
      }
      val total = seg.map(_._2).sum
      assert(total <= prevTotal,
        s"piece totals must shrink monotonically: $prevTotal -> $total at k=$k")
      prevTotal = total
    }
  }
}
