package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** The two native gram loops that replaced exploded
  * `xxhash64(substring(...))` pipelines in round 17 (d11 gram multiset,
  * d16 window digests) must be BIT-IDENTICAL to the SQL formulations they
  * replaced — same XXH64 over the same UTF-8 byte slices — including on
  * multi-byte codepoints, strings shorter than the width, and empty text.
  */
class CharWindowFunctionsSpec extends SparkSpec {

  private val texts = Seq(
    "the quick brown fox jumps over the lazy dog",
    "ααββγ δδεε ζζ",          // multi-byte greek, mixed with spaces
    "añejo café über 日本語テキスト", // 2- and 3-byte codepoints
    "ab",                      // shorter than any width ≥ 3
    "aaaa",                    // maximal gram multiplicity
    "")                        // empty: single whole-text gram

  test("charwindow_hash64(text, w)[i] == xxhash64(substring(text, i+1, w))") {
    for (w <- Seq(1, 3, 40)) {
      val df = spark.createDataFrame(texts.map(Tuple1(_))).toDF("t")
      val rows = df.selectExpr(
        "t",
        s"graft_charwindow_hash64(t, $w) AS got",
        s"transform(sequence(1, greatest(length(t) - ${w - 1}, 1)), " +
          s"p -> xxhash64(substring(t, p, $w))) AS want")
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[Long](1) == r.getSeq[Long](2),
          s"width $w over '${r.getString(0)}'")
      }
    }
  }

  test("chargram_counts64 equals the exploded groupBy multiset, seed folded") {
    for (n <- Seq(2, 4); seed <- Seq(0L, 42L, -7L)) {
      val df = spark.createDataFrame(texts.map(Tuple1(_))).toDF("t")
      // native: (key, cnt) pairs in one loop, keys hashed with `seed`
      val got = df.selectExpr("t",
        s"graft_chargram_counts64(t, $n, ${seed}L) AS kc")
        .selectExpr("t", "explode(kc) AS kc")
        .groupBy("t").agg(sort_array(collect_list(struct(
          col("kc.key"), col("kc.cnt")))).as("m"))
      // reference: explode every gram occurrence, hash with the SAME
      // composition (XXH64 of the gram bytes seeded by `seed` =
      // xxhash64 cannot express a custom seed, so compute per-gram via
      // the window function at width n, whose seed-42 hashes pin the
      // BYTES; multiset equality is then checked through counts of the
      // native keys themselves on a second native pass at n=1..)
      // Simpler and strict: rebuild counts from the POSITIONAL grams —
      // substring explode — and native-hash each gram string standalone.
      val want = df.selectExpr("t",
        s"explode(transform(sequence(1, greatest(length(t) - ${n - 1}, 1)), " +
          s"p -> substring(t, p, $n))) AS gram")
        .selectExpr("t", s"graft_chargram_counts64(gram, $n, ${seed}L) AS kc")
        // gram has length ≤ n, so counts64 over it yields its single
        // whole-text hash with cnt 1 — i.e. XXH64(gram bytes, seed)
        .selectExpr("t", "kc[0].key AS key")
        .groupBy("t", "key").count()
        .groupBy("t").agg(sort_array(collect_list(struct(
          col("key"), col("count").as("cnt")))).as("m"))
      val g = got.collect().map(r => r.getString(0) -> r.getSeq[Row](1)).toMap
      val w2 = want.collect().map(r => r.getString(0) -> r.getSeq[Row](1)).toMap
      assert(g == w2, s"n=$n seed=$seed")
    }
  }

  test("editDistancePairs routes stay exact around the short/long boundary") {
    // docs straddling g = k·n (k=1, n=2 → kn=2): 'abc' has g=2 (short),
    // 'abcd' g=3 (long) — a short/long qualifying pair must come from the
    // gram route, short/short from the banded route, and no pair may be
    // emitted twice now that the union carries no distinct.
    val docs = spark.createDataFrame(Seq(
      (1L, "s", "x", "abc"), (2L, "s", "x", "abd"),   // short-short, ed 1
      (3L, "s", "x", "abcd"), (4L, "s", "x", "abce"), // long-long, ed 1
      (5L, "s", "x", "abc"),                          // dup of 1: ed 0
      (6L, "s", "x", "zzzz"),                         // far from everything
      (7L, "t", "x", "abc")                           // other block
    )).toDF("doc_id", "source", "lang", "text")
    val got = graft.dedup.Dedup.editDistancePairs(
      docs, Seq("source", "lang"), n = 2, maxDist = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    // brute force within block, id-ordered pairs, banded ed ≤ 1
    def ed(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val rows = Seq((1L, "s", "abc"), (2L, "s", "abd"), (3L, "s", "abcd"),
      (4L, "s", "abce"), (5L, "s", "abc"), (6L, "s", "zzzz"), (7L, "t", "abc"))
    val want = (for {
      (ia, ba, ta) <- rows; (ib, bb, tb) <- rows
      if ba == bb && ia < ib && ed(ta, tb) <= 1
    } yield (ia, ib, ed(ta, tb).toLong)).sorted
    assert(got.toSeq == want, "exact pair set with multiplicity 1")
  }
}
