package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.ops.Relational
import graft.weather.Weather

/** Property-based invariants (SURVEY.md §5): upsert idempotency and
  * last-write-wins, aggregation merge laws, pad-policy invariants.
  * ScalaCheck generators driven deterministically (fixed seeds) so runs
  * are reproducible; the scalatest/scalacheck bridge isn't on the
  * classpath, so cases are materialized explicitly.
  */
class PropertySpec extends SparkSpec {

  private val rowGen: Gen[(String, String, Long, Double)] = for {
    city <- Gen.oneOf("Warsaw", "Berlin", "Paris")
    hour <- Gen.choose(0, 5)
    ingest <- Gen.choose(0L, 3L)
    temp <- Gen.choose(-30.0, 40.0)
  } yield (city, f"2025-10-30 0$hour%d:00:00", ingest, math.round(temp * 10) / 10.0)

  private def cases[A](g: Gen[A], n: Int): Seq[A] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("property: upsert is idempotent and keeps the newest row per key") {
    for (rows <- cases(Gen.listOfN(12, rowGen), 10)) {
      val s = spark
      import s.implicits._
      val df = rows.toDF("city", "ts_s", "ingest_seq", "temperature_2m")
        .select(col("city"), col("ts_s").cast("timestamp").as("timestamp"),
          timestamp_seconds(col("ingest_seq") + 1700000000L).as("_ingested_at"),
          col("temperature_2m"))
      val once = Weather.dedupUpsert(df)
      val twice = Weather.dedupUpsert(once)
      val keys = once.select(col("city"), col("timestamp")).collect().toSeq
      assert(keys.length == keys.distinct.length)
      assert(once.collect().toSet == twice.collect().toSet)
      val maxIngest = df.groupBy(col("city"), col("timestamp"))
        .agg(max(col("_ingested_at")).as("m")).collect()
        .map(r => (r.getString(0), r.getTimestamp(1)) -> r.getTimestamp(2)).toMap
      once.select(col("city"), col("timestamp"), col("_ingested_at"))
        .collect().foreach { r =>
          assert(r.getTimestamp(2) == maxIngest((r.getString(0), r.getTimestamp(1))))
        }
    }
  }

  test("property: agg-of-union equals merge of partial aggs (sum/count)") {
    val pair = for {
      xs <- Gen.listOfN(10, rowGen); ys <- Gen.listOfN(10, rowGen)
    } yield (xs, ys)
    for ((xs, ys) <- cases(pair, 10)) {
      val s = spark
      import s.implicits._
      val a = xs.toDF("city", "ts_s", "seq", "v")
      val b = ys.toDF("city", "ts_s", "seq", "v")
      def key(d: org.apache.spark.sql.DataFrame) = d.collect()
        .map(r => r.getString(0) -> (math.round(r.getDouble(1) * 1e6), r.getLong(2))).toMap
      val whole = key(a.unionByName(b).groupBy(col("city"))
        .agg(sum(col("v")).as("s"), count(lit(1)).as("n")))
      val partial = key(
        a.groupBy(col("city")).agg(sum(col("v")).as("s"), count(lit(1)).as("n"))
          .unionByName(b.groupBy(col("city")).agg(sum(col("v")).as("s"), count(lit(1)).as("n")))
          .groupBy(col("city")).agg(sum(col("s")).as("s"), sum(col("n")).as("n")))
      assert(whole == partial)
    }
  }

  test("property: zipExplode output length is the max input array length " +
      "(all-empty rows survive as one null row — pad, don't drop)") {
    val arrGen = Gen.listOf(Gen.choose(0, 9))
    val pair = for { xs <- arrGen; ys <- arrGen } yield (xs, ys)
    for ((xs, ys) <- cases(pair, 20)) {
      val s = spark
      import s.implicits._
      val df = Seq((xs, ys)).toDF("a", "b")
      val n = Relational.zipExplode(df, Seq("a", "b"), Nil).count()
      assert(n == math.max(1, math.max(xs.length, ys.length)))
    }
  }

  test("property: salted join and salted agg equal their plain forms under skew") {
    // adversarial distribution: one hot key dominates (the case the salt
    // exists for), plus a dim key with no fact rows and fact keys missing
    // from the dim — the equivalence must hold row-for-row (multiset), not
    // just per key
    val skewRow = for {
      key <- Gen.frequency((20, Gen.const("hot")), (3, Gen.oneOf("a", "b", "c", "d")))
      v <- Gen.choose(-1000L, 1000L)
    } yield (key, v)
    def multiset(rows: Array[org.apache.spark.sql.Row]) =
      rows.toSeq.groupBy(identity).view.mapValues(_.size).toMap
    for (rows <- cases(Gen.listOfN(60, skewRow), 8); buckets <- Seq(1, 7)) {
      val s = spark
      import s.implicits._
      val df = rows.toDF("k", "v")
      // agg law: saltedSumCount ≡ groupBy.agg(sum, count)
      val salted = Relational.saltedSumCount(df, "k", "v", buckets)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      val plain = df.groupBy("k")
        .agg(sum("v").as("s"), count(lit(1)).cast("long").as("n"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(salted == plain, s"salted agg diverged (buckets=$buckets)")
      // join law: saltedJoin ≡ plain equi-join (dim has an unmatched key,
      // facts have keys the dim lacks)
      val dim = Seq(("hot", 1L), ("a", 2L), ("b", 3L), ("z", 9L)).toDF("k", "w")
      val sj = multiset(Relational.saltedJoin(df, dim, "k", buckets).collect())
      val pj = multiset(df.join(dim, Seq("k")).collect())
      assert(sj == pj, s"salted join diverged (buckets=$buckets)")
    }
  }

  test("property: PolyGramHash equals the string-building reference fold") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    import org.apache.spark.unsafe.types.UTF8String
    // pure-JVM check (no Spark plan): the native rolling fold must equal
    // PolyHash over the materialized gram string for arbitrary tokens
    val tokGen = Gen.listOfN(8,
      Gen.oneOf(Gen.alphaNumStr.map(_.take(5)), Gen.const("")))
    for (toks <- cases(tokGen, 40); n <- Seq(1, 2, 3)) {
      val arr = new GenericArrayData(
        toks.map(t => UTF8String.fromString(t): Any).toArray)
      val native = graft.functions.PolyGramHash.compute(arr, n)
        .toLongArray().toSeq
      val expected = toks.sliding(n).filter(_.length == n)
        .map(w => graft.functions.PolyHash.compute(
          UTF8String.fromString(w.mkString(" ")), 31L, 2147483647L))
        .toSeq.distinct
      assert(native == expected, s"toks=$toks n=$n")
    }
  }

  test("property: phraseSearch equals the brute-force sliding-window scan") {
    // small alphabet forces overlaps and repeated phrase terms — the cases
    // where a join-based formulation could double-count or miss
    val docGen = Gen.listOfN(12, Gen.oneOf("a", "b", "c")).map(_.mkString(" "))
    val corpusGen = Gen.listOfN(6, docGen)
    val phraseGen = Gen.choose(1, 3)
      .flatMap(n => Gen.listOfN(n, Gen.oneOf("a", "b", "c")))
    val pair = for { c <- corpusGen; p <- phraseGen } yield (c, p)
    for ((docsRaw, phrase) <- cases(pair, 15)) {
      val s = spark
      import s.implicits._
      val docs = docsRaw.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = graft.text.Text.phraseSearch(docs, phrase)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expected = docsRaw.zipWithIndex.flatMap { case (t, i) =>
        val toks = t.split("\\s+").filter(_.nonEmpty)
        toks.sliding(phrase.length).zipWithIndex.collect {
          case (w, p) if w.toSeq == phrase => (i.toLong, (p + 1).toLong)
        }
      }.toSet
      assert(got == expected, s"phrase=$phrase docs=$docsRaw")
    }
  }

  test("property: native as-of join equals the brute-force scan in all three directions") {
    // adversarial shape for a merge exec: few keys (long runs), duplicate
    // timestamps (ties), keys present on only one side, NULL ordering
    // values on BOTH sides (they must match nothing in any direction —
    // the nulls-first child sort puts them at each group's head, exactly
    // where an unguarded forward lookahead would spuriously match), and
    // every (direction, strict, tolerance) combination — compared
    // row-for-row against a reference computed by brute force
    import graft.plans.AsOfDirection
    val rowGen = for {
      k <- Gen.oneOf("a", "b", "c")
      t <- Gen.frequency(8 -> Gen.choose(0L, 20L).map(Option(_)),
        1 -> Gen.const(Option.empty[Long]))
    } yield (k, t)
    val caseGen = for {
      ls <- Gen.listOfN(14, rowGen)
      rs <- Gen.listOfN(14, rowGen)
      strict <- Gen.oneOf(true, false)
      tol <- Gen.oneOf(Option.empty[Long], Some(3L), Some(0L))
      dir <- Gen.oneOf[AsOfDirection](AsOfDirection.Backward,
        AsOfDirection.Forward, AsOfDirection.Nearest)
    } yield (ls, rs, strict, tol, dir)
    for ((lsRaw, rsRaw, strict, tol, dir) <- cases(caseGen, 18)) {
      val s = spark
      import s.implicits._
      // unique per-side ids double as deterministic tie-breaks
      val ls = lsRaw.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
      val rs = rsRaw.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
      def run(bcast: Boolean): Map[Long, Long] =
        graft.plans.AsOfJoinPlan.asofJoin(
            ls.toDF("k", "t", "id"), rs.toDF("k", "t", "id"),
            keys = Seq("k" -> "k"), order = Seq("t" -> "t", "id" -> "id"),
            strict = strict, tolerance = tol, direction = dir,
            broadcast = if (bcast) graft.plans.AsOfBroadcast.Force
              else graft.plans.AsOfBroadcast.Never)
          .select(col("id"), col("id_r"))
          .collect().map(r => r.getLong(0) ->
            (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
      val got = run(bcast = false)
      // the broadcast-index form must agree with the merge form exactly
      val gotBcast = run(bcast = true)
      // brute-force reference: candidates by full-tuple comparison, the
      // nearest pick by head distance with ties going backward; a NULL
      // ordering value disqualifies its row outright on either side
      val expected = ls.map { case (lk, ltOpt, lid) =>
        val m = ltOpt match {
          case None => None // null-ordered left: unmatched, all directions
          case Some(lt) =>
            def tupLt(rt: Long, rid: Long, strictCmp: Boolean): Boolean =
              rt < lt || (rt == lt && (if (strictCmp) rid < lid else rid <= lid))
            // backward: max tuple <= (or <) the left's, within lookBACK window
            val b = rs.filter { case (rk, rtO, rid) =>
              rk == lk && rtO.exists(rt =>
                tupLt(rt, rid, strict) && tol.forall(w => lt - rt <= w))
            }.sortBy { case (_, rtO, rid) => (rtO.get, rid) }.lastOption
            // forward: min tuple strictly past the non-matching set, within
            // the lookAHEAD window; non-strict admits tuple-equal rows
            val f = rs.filter { case (rk, rtO, rid) =>
              rk == lk && rtO.exists { rt =>
                val after = rt > lt || (rt == lt &&
                  (if (strict) rid > lid else rid >= lid))
                after && tol.forall(w => rt - lt <= w)
              }
            }.sortBy { case (_, rtO, rid) => (rtO.get, rid) }.headOption
            dir match {
              case AsOfDirection.Backward => b
              case AsOfDirection.Forward => f
              case AsOfDirection.Nearest => (b, f) match {
                case (Some((_, bt, _)), Some((_, ft, _))) =>
                  if (lt - bt.get <= ft.get - lt) b else f
                case _ => b.orElse(f)
              }
            }
        }
        lid -> m.map(_._3).getOrElse(-1L)
      }.toMap
      assert(got == expected,
        s"dir=$dir strict=$strict tol=$tol ls=$ls rs=$rs")
      assert(gotBcast == expected,
        s"BROADCAST dir=$dir strict=$strict tol=$tol ls=$ls rs=$rs")
    }
  }

  test("property: time-sliced as-of equals the plain tolerance as-of, all directions") {
    // the skew escape hatch must be a pure plan transformation: for any
    // tolerance <= slice width, any direction, any strictness, the
    // composite-key + replicated-right form returns row-for-row what the
    // plain operator returns — slice-boundary-straddling candidates
    // (t just under a multiple of the width) are the adversarial case
    import graft.plans.{AsOfBroadcast, AsOfDirection, AsOfJoinPlan}
    val rowGen = for {
      k <- Gen.oneOf("a", "b")
      t <- Gen.choose(0L, 40L)
    } yield (k, t)
    val caseGen = for {
      ls <- Gen.listOfN(12, rowGen)
      rs <- Gen.listOfN(12, rowGen)
      strict <- Gen.oneOf(true, false)
      tol <- Gen.choose(0L, 6L)
      pad <- Gen.choose(0L, 5L)
      dir <- Gen.oneOf[AsOfDirection](AsOfDirection.Backward,
        AsOfDirection.Forward, AsOfDirection.Nearest)
    } yield (ls, rs, strict, tol, math.max(1L, tol) + pad, dir)
    for ((lsRaw, rsRaw, strict, tol, slice, dir) <- cases(caseGen, 15)) {
      val s = spark
      import s.implicits._
      val ls = lsRaw.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
      val rs = rsRaw.zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
      def collect(df: org.apache.spark.sql.DataFrame): Map[Long, Long] =
        df.select(col("id"), col("id_r"))
          .collect().map(r => r.getLong(0) ->
            (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
      val plain = collect(AsOfJoinPlan.asofJoin(
        ls.toDF("k", "t", "id"), rs.toDF("k", "t", "id"),
        keys = Seq("k" -> "k"), order = Seq("t" -> "t", "id" -> "id"),
        strict = strict, tolerance = Some(tol), direction = dir,
        broadcast = AsOfBroadcast.Never))
      val sliced = collect(AsOfJoinPlan.asofJoinTimeSliced(
        ls.toDF("k", "t", "id"), rs.toDF("k", "t", "id"),
        keys = Seq("k" -> "k"), order = Seq("t" -> "t", "id" -> "id"),
        toleranceUs = tol, sliceUs = slice,
        strict = strict, direction = dir,
        broadcast = AsOfBroadcast.Never))
      assert(sliced == plain,
        s"dir=$dir strict=$strict tol=$tol slice=$slice ls=$ls rs=$rs")
    }
  }

  test("property: as-of join with COMPOSITE keys and null key parts equals brute force") {
    // two-column equi-keys with occasional nulls: null-keyed rows match
    // nothing on either side (SQL join semantics), non-null composites
    // compare component-wise — the merge's multi-column key projection
    // and nulls-first consume path both get exercised
    val rowGen = for {
      k1 <- Gen.oneOf("a", "b")
      k2 <- Gen.frequency(4 -> Gen.choose(0L, 1L).map(Option(_)),
        1 -> Gen.const(Option.empty[Long]))
      t <- Gen.choose(0L, 12L)
    } yield (k1, k2, t)
    val caseGen = for {
      ls <- Gen.listOfN(12, rowGen)
      rs <- Gen.listOfN(12, rowGen)
      strict <- Gen.oneOf(true, false)
    } yield (ls, rs, strict)
    for ((lsRaw, rsRaw, strict) <- cases(caseGen, 10)) {
      val s = spark
      import s.implicits._
      val ls = lsRaw.zipWithIndex.map { case ((k1, k2, t), i) => (k1, k2, t, i.toLong) }
      val rs = rsRaw.zipWithIndex.map { case ((k1, k2, t), i) => (k1, k2, t, i.toLong) }
      val got = graft.plans.AsOfJoinPlan.asofJoin(
          ls.toDF("k1", "k2", "t", "id"), rs.toDF("k1", "k2", "t", "id"),
          keys = Seq("k1" -> "k1", "k2" -> "k2"),
          order = Seq("t" -> "t", "id" -> "id"), strict = strict)
        .select(col("id"), col("id_r"))
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
      val expected = ls.map { case (lk1, lk2, lt, lid) =>
        val m =
          if (lk2.isEmpty) None
          else rs.filter { case (rk1, rk2, rt, rid) =>
            rk1 == lk1 && rk2.nonEmpty && rk2 == lk2 &&
              (rt < lt || (rt == lt && (if (strict) rid < lid else rid <= lid)))
          }.sortBy { case (_, _, rt, rid) => (rt, rid) }.lastOption
        lid -> m.map(_._4).getOrElse(-1L)
      }.toMap
      assert(got == expected, s"strict=$strict ls=$ls rs=$rs")
    }
  }

  test("property: systematicSample equals the sequential tick scan") {
    // the distributed form (window prefix-sum + broadcast joins) must
    // select exactly the rows a sequential walk of each stratum's number
    // line selects, for any weights (zeros included), any k, and
    // DUPLICATE ids within a stratum (the ROWS-frame fix: peer rows must
    // each own a disjoint slice of the line, never share one)
    val rowGen = for {
      st <- Gen.oneOf("a", "b")
      w <- Gen.choose(0L, 7L)
    } yield (st, w)
    val caseGen = for {
      rows <- Gen.listOfN(10, rowGen)
      k <- Gen.choose(1, 4)
    } yield (rows, k)
    for ((rowsRaw, k) <- cases(caseGen, 12)) {
      val s = spark
      import s.implicits._
      // i/2 halves the id space: adjacent generated rows share an id
      val rows = rowsRaw.zipWithIndex.map { case ((st, w), i) =>
        (st, (i / 2).toLong, w) }
      val got = Relational.systematicSample(
          rows.toDF("src", "id", "w"), "src", "w", "id", k)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val expected = rows.filter(_._3 > 0).groupBy(_._1).toSeq.flatMap {
        case (st, rs) =>
          val sorted = rs.sortBy(r => (r._2, r._3))
          val total = sorted.map(_._3).sum
          val cums = sorted.scanLeft(0L)(_ + _._3).tail
          for {
            j <- 0 until k
            ((_, id, w), cum) <- sorted.zip(cums)
            if (cum - w) * 2 * k <= (2L * j + 1) * total &&
              (2L * j + 1) * total < cum * 2 * k
          } yield (st, j.toLong, id)
      }.toSet
      assert(got == expected, s"k=$k rows=$rows")
    }
  }

  test("property: sourceKlDivergence is non-negative and zero iff no drift") {
    // Gibbs' inequality: KL(P_s || corpus) >= 0, with equality only when
    // the source's distribution equals the blend — e.g. a single-source
    // corpus, where the blend IS the source
    val docGen = Gen.listOfN(6, Gen.oneOf("x", "y", "z")).map(_.mkString(" "))
    val rowGen = for {
      src <- Gen.oneOf("s1", "s2", "s3"); t <- docGen
    } yield (src, t)
    for (rows <- cases(Gen.listOfN(9, rowGen), 15)) {
      val s = spark
      import s.implicits._
      val kl = graft.text.Text.sourceKlDivergence(rows.toDF("source", "text"))
        .collect().map(r => r.getDouble(2))
      assert(kl.forall(_ >= 0.0), s"negative KL for rows=$rows")
      val single = graft.text.Text.sourceKlDivergence(
        rows.map { case (_, t) => ("only", t) }.toDF("source", "text"))
        .collect().map(r => r.getDouble(2))
      assert(single.toSeq == Seq(0.0), "single-source corpus must have KL 0")
    }
  }
}
