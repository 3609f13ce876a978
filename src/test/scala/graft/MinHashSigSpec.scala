package graft

import org.apache.spark.sql.functions._
import graft.functions.{MinHashSig, PolyHash}

/** The native MinHashSig expression must be BIT-IDENTICAL to the HOF
  * formulation it replaced (transform(sequence(0,k-1), i -> aggregate(hs,
  * p, (acc,h) -> least(acc, (i*40503+1299721)*h + i*7919+104729 % p)))) —
  * d04's DuckDB oracle replicates that exact formula, so any divergence
  * is a correctness break, not just a perf delta.
  */
class MinHashSigSpec extends SparkSpec {

  private val p = 2147483647L

  test("native signature equals the HOF fold on real token arrays") {
    val s = spark
    import s.implicits._
    PolyHash.register(s); MinHashSig.register(s)
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "spark table scan merge window",
      "one",
      "", // empty: zero tokens → every slot is the init p
      "dup dup dup dup").toDF("text")
    val hs = expr(
      s"transform(array_distinct(filter(split(trim(text), '\\\\s+'), t -> t <> ''))," +
        s" t -> ${PolyHash.FnName}(t, 31, $p))")
    val both = docs.select(hs.as("hs"))
      .select(
        expr(s"${MinHashSig.FnName}(hs, 16, $p)").as("native"),
        expr(
          s"""transform(sequence(0, 15), i ->
             |  aggregate(hs, cast($p as bigint), (acc, h) ->
             |    least(acc, ((cast(i as bigint) * 40503 + 1299721) * h + i * 7919 + 104729) % $p)))""".stripMargin)
          .as("hof"))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[Long](0) == r.getSeq[Long](1))
      assert(r.getSeq[Long](0).length == 16)
    }
    // the empty-token row really is all-init
    assert(both(3).getSeq[Long](0).forall(_ == p))
  }

  test("native simhash equals the HOF bit-count fold on real token arrays") {
    val s = spark
    import s.implicits._
    PolyHash.register(s); graft.functions.SimHashSig.register(s)
    val docs = Seq(
      "the quick brown fox the quick",
      "spark table scan",
      "solo",
      "").toDF("text")
    val hs = expr(
      s"transform(filter(split(trim(text), '\\\\s+'), t -> t <> '')," +
        s" t -> ${PolyHash.FnName}(t, 31, $p))")
    val both = docs.select(hs.as("hs"))
      .select(
        expr(s"${graft.functions.SimHashSig.FnName}(hs, 31)").as("native"),
        expr(
          """aggregate(sequence(0, 30), cast(0 as bigint), (acc, j) ->
            |  acc + if(
            |    size(filter(hs, h -> (h div shiftleft(cast(1 as bigint), j)) % 2 = 1)) * 2
            |      > size(hs),
            |    shiftleft(cast(1 as bigint), j), cast(0 as bigint)))""".stripMargin)
          .as("hof"))
      .collect()
    both.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    assert(both(3).getLong(0) == 0L) // empty doc → empty multiset → 0
  }

  test("native shingle hashes equal the HOF xxhash64-over-gram chain") {
    val s = spark
    import s.implicits._
    graft.functions.ShingleHash64.register(s)
    val docs = Seq(
      "the quick brown fox jumps",
      "a b a b a b", // repeated grams: dedup must keep first occurrence
      "one two",     // shorter than n=3: empty result
      "").toDF("text")
    val toks = "filter(split(trim(text), '\\\\s+'), t -> t <> '')"
    val both = docs.select(
        expr(s"${graft.functions.ShingleHash64.FnName}($toks, 3)").as("native"),
        // sequence(1, 0) is DESCENDING in Spark, so the short-doc case
        // needs an explicit empty guard in the HOF formulation
        expr(s"""CASE WHEN size($toks) < 3 THEN array()
          |ELSE array_distinct(transform(
          |  sequence(1, size($toks) - 2),
          |  i -> xxhash64(concat_ws(' ', slice($toks, i, 3))))) END""".stripMargin)
          .as("hof"))
      .collect()
    both.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
    assert(both(2).getSeq[Long](0).isEmpty)
    assert(both(3).getSeq[Long](0).isEmpty)
  }

  test("native poly-gram hashes equal the HOF PolyHash-over-gram chain") {
    val s = spark
    import s.implicits._
    graft.functions.PolyGramHash.register(s)
    graft.functions.PolyHash.register(s)
    val docs = Seq(
      "the quick brown fox jumps",
      "a b a b a b", // repeated grams: dedup must keep first occurrence
      "one two",     // shorter than n=3: empty result
      "").toDF("text")
    val toks = "filter(split(trim(text), '\\\\s+'), t -> t <> '')"
    val both = docs.select(
        expr(s"${graft.functions.PolyGramHash.FnName}($toks, 3)").as("native"),
        expr(s"""CASE WHEN size($toks) < 3 THEN array()
          |ELSE array_distinct(transform(
          |  sequence(1, size($toks) - 2),
          |  i -> ${graft.functions.PolyHash.FnName}(
          |    array_join(slice($toks, i, 3), ' '), 31, 2147483647))) END""".stripMargin)
          .as("hof"))
      .collect()
    both.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
    assert(both(2).getSeq[Long](0).isEmpty)
    assert(both(3).getSeq[Long](0).isEmpty)
  }

  test("null input array yields null, not a crash") {
    val s = spark
    import s.implicits._
    MinHashSig.register(s)
    val r = Seq(Tuple1(Option.empty[Seq[Long]]), Tuple1(Some(Seq(7L, 9L))))
      .toDF("hs")
      .select(expr(s"${MinHashSig.FnName}(hs, 4, $p)").as("sig"))
      .collect()
    assert(r(0).isNullAt(0))
    assert(r(1).getSeq[Long](0).length == 4)
  }
}
