package graft

/** The injected scalar-function surface (GraftFunctions via
  * GraftExtensions): every graft_* expression must resolve in ad-hoc SQL
  * on a session that never ran a DataFrame helper — `newSession()` gives
  * exactly that (fresh session state, extensions re-applied from conf,
  * temp functions NOT inherited), so these calls can only resolve through
  * the injection, never through a companion's lazy temp registration left
  * behind by another suite.
  */
class GraftFunctionsSpec extends SparkSpec {

  test("every injected graft_* function resolves and evaluates in a fresh session") {
    val s2 = spark.newSession()
    val r = s2.sql(
      """SELECT
        |  graft_poly_hash('ab', 31, 2147483647) AS ph,
        |  graft_simhash_sig(array(1L, 3L), 2) AS sh,
        |  graft_minhash_sig(array(5L), 2, 2147483647) AS mh,
        |  graft_shingle_hash64(array('a', 'b', 'c'), 2) AS sg,
        |  graft_chargram_hash64('abc', 2, 1) AS cg,
        |  graft_gram_stats(array('a', 'a', 'b'), 1) AS gs,
        |  graft_cosine_sim(array(3.0D, 4.0D), array(3.0D, 4.0D)) AS cos,
        |  graft_l2sq(array(1.0D, 2.0D), array(4.0D, 6.0D)) AS l2,
        |  size(graft_jl_project(array(1.0D), 4)) AS jl,
        |  graft_intersect_card_sorted(array(1L, 2L, 3L), array(2L, 3L, 9L)) AS ic,
        |  graft_zorder(3, 5) AS zo,
        |  graft_le_uint(X'0102', 0, 2) AS le
        |""".stripMargin).collect().head

    assert(r.getLong(0) == 97L * 31 + 98, "poly_hash('ab')")
    // hashes 1 (0b01) and 3 (0b11): bit 0 set in both (majority), bit 1 in one
    assert(r.getLong(1) == 1L, "simhash_sig")
    // perm i: ((i*40503+1299721)*5 + i*7919+104729) mod p
    assert(r.getSeq[Long](2) == Seq(1299721L * 5 + 104729,
      1340224L * 5 + 112648), "minhash_sig")
    assert(r.getSeq[Long](3).length == 2, "shingle_hash64: 'a b', 'b c'")
    assert(r.getSeq[Long](4).length == 2, "chargram_hash64: 'ab', 'bc'")
    // [n_grams, dups, max occurrence] over unigrams of (a, a, b)
    assert(r.getSeq[Long](5) == Seq(3L, 1L, 2L), "gram_stats")
    assert(math.abs(r.getDouble(6) - 1.0) < 1e-9, "cosine_sim self")
    assert(math.abs(r.getDouble(7) - 25.0) < 1e-9, "l2sq (3,4)")
    assert(r.getInt(8) == 4, "jl_project out dims")
    assert(r.getLong(9) == 2L, "intersect_card_sorted")
    // 3=0b011 interleaved with 5=0b101: bits y1x1 y0x0... = 0b100111 = 39
    assert(r.getLong(10) == 39L, "zorder(3,5)")
    assert(r.getLong(11) == 0x0201L, "le_uint little-endian")
  }

  test("count-min sketch merge + estimate compose through SQL only") {
    val s2 = spark.newSession()
    // build per-group sketches with Spark's builtin, merge + probe purely
    // through the injected graft names — the qa5 pipeline as ad-hoc SQL
    val est = s2.sql(
      """WITH g AS (SELECT id % 3 AS grp, id % 7 AS item FROM range(0, 100)),
        |sk AS (SELECT grp,
        |  count_min_sketch(item, 0.001d, 0.99d, 42) AS sk
        |  FROM g GROUP BY grp),
        |m AS (SELECT graft_cms_merge(sk) AS sk FROM sk)
        |SELECT graft_cms_estimate(sk, 0L) AS est0 FROM m
        |""".stripMargin).collect().head.getLong(0)
    // item 0 appears 15 times (0, 7, ..., 98); CMS at this eps is exact
    assert(est == 15L, s"cms merge+estimate through SQL, got $est")
  }

  test("the injected surface is discoverable: SHOW/DESCRIBE FUNCTION") {
    val s2 = spark.newSession()
    val shown = s2.sql("SHOW FUNCTIONS LIKE 'graft_*'")
      .collect().map(_.getString(0)).toSet
    val expected = graft.functions.GraftFunctions.all
      .map(_._1.funcName).toSet
    assert(expected.subsetOf(shown),
      s"missing from SHOW FUNCTIONS: ${expected -- shown}")
    val desc = s2.sql("DESCRIBE FUNCTION graft_minhash_sig")
      .collect().map(_.getString(0)).mkString("\n")
    assert(desc.contains("minhash"), desc)
  }

  test("injected builders reject wrong arity with a clear message") {
    val s2 = spark.newSession()
    val e = intercept[Exception] {
      s2.sql("SELECT graft_poly_hash('a')").collect()
    }
    assert(e.getMessage.contains("graft_poly_hash") ||
      e.getCause != null && e.getCause.getMessage.contains("graft_poly_hash"))
  }

  test("the injected route and the companion temp registration agree") {
    // on an extensions session register() is a no-op (the injected entry
    // already resolves — registerIfAbsent skips, no shadow, no WARN);
    // either way both routes share ONE companion builder, so values agree
    val s2 = spark.newSession()
    graft.functions.PolyHash.register(s2)
    val viaTemp = s2.sql(
      "SELECT graft_poly_hash('graft', 31, 2147483647)").collect().head.getLong(0)
    val s3 = spark.newSession()
    val viaInjected = s3.sql(
      "SELECT graft_poly_hash('graft', 31, 2147483647)").collect().head.getLong(0)
    assert(viaTemp == viaInjected)
  }
}
