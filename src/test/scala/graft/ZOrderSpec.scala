package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.ZOrderEncode

/** ZOrderEncode parity (native expression vs the HOF interleave fold it
  * compiles away) and the claim that justifies the operator: a z-ordered
  * range-partitioned layout gives every file a tight bounding BOX over both
  * key columns, so a two-dimensional box predicate prunes strictly more
  * files than the same predicate over a single-column-sorted layout.
  */
class ZOrderSpec extends SparkSpec {

  test("native z-order equals the HOF interleave fold and the Scala reference") {
    val s = spark
    import s.implicits._
    ZOrderEncode.register(s)
    val rows = Seq[(java.lang.Long, java.lang.Long)](
      (0L, 0L), (1L, 0L), (0L, 1L), (65535L, 0L), (0L, 65535L),
      (65535L, 65535L), (12345L, 54321L), (1L, 65536L), // y truncates
      (null, 3L), (3L, null)).toDF("x", "y")
    val out = rows.select(
      expr(s"${ZOrderEncode.FnName}(x, y)").as("native"),
      expr("""aggregate(sequence(0, 15), 0L, (acc, i) ->
        | acc | shiftleft(shiftright(x, i) & 1, 2*i)
        |     | shiftleft(shiftright(y, i) & 1, 2*i + 1))""".stripMargin)
        .as("hof"),
      col("x"), col("y")).collect()
    out.foreach { r =>
      if (r.isNullAt(2) || r.isNullAt(3)) {
        assert(r.isNullAt(0) && r.isNullAt(1))
      } else {
        assert(r.getLong(0) == r.getLong(1))
        assert(r.getLong(0) == ZOrderEncode.compute(r.getLong(2), r.getLong(3)))
      }
    }
    // interleave basics: x fills even bits, y odd bits
    assert(ZOrderEncode.compute(1L, 0L) == 1L)
    assert(ZOrderEncode.compute(0L, 1L) == 2L)
    assert(ZOrderEncode.compute(65535L, 65535L) == 0xFFFFFFFFL)
    // bits above 16 truncate
    assert(ZOrderEncode.compute(65536L, 0L) == 0L)
  }

  /** Per-file (min,max) of both keys for a written layout — what a lake
    * format's file-statistics index stores, and all a reader needs for
    * min/max skipping.
    */
  private def fileBounds(df: DataFrame): Array[(Long, Long, Long, Long)] =
    df.groupBy(input_file_name())
      .agg(min("l_orderkey").as("o_min"), max("l_orderkey").as("o_max"),
        min("l_partkey").as("p_min"), max("l_partkey").as("p_max"))
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))

  private def candidates(bounds: Array[(Long, Long, Long, Long)],
      oLo: Long, oHi: Long, pLo: Long, pHi: Long): Int =
    bounds.count { case (oMin, oMax, pMin, pMax) =>
      oMax >= oLo && oMin <= oHi && pMax >= pLo && pMin <= pHi
    }

  test("z-ordered layout prunes a 2-D box on min/max stats; single-column sort cannot") {
    val s = spark
    val li = Tables.lineitem(s, sf0001)
      .select(col("l_orderkey").cast("long").as("l_orderkey"),
        col("l_partkey").cast("long").as("l_partkey"))
    val files = 32
    val base = Files.createTempDirectory("zorder").toString

    val zed = li.withColumn("zval",
      ZOrderEncode(s, col("l_orderkey"), col("l_partkey")))
    zed.repartitionByRange(files, col("zval")).sortWithinPartitions("zval")
      .write.mode("overwrite").parquet(s"$base/zorder")
    li.repartitionByRange(files, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").parquet(s"$base/linear")

    val zBounds = fileBounds(s.read.parquet(s"$base/zorder"))
    val linBounds = fileBounds(s.read.parquet(s"$base/linear"))
    assert(zBounds.length >= files - 1 && linBounds.length >= files - 1)

    // a power-of-2-aligned box in each dimension (the favorable-but-fair
    // case for the curve; unaligned boxes cost at most a constant factor)
    val boxes = Seq((512L, 767L, 64L, 95L), (256L, 511L, 0L, 63L),
      (1024L, 1279L, 96L, 127L))
    val (zTotal, linTotal) = boxes.foldLeft((0, 0)) {
      case ((zAcc, lAcc), (oLo, oHi, pLo, pHi)) =>
        val z = candidates(zBounds, oLo, oHi, pLo, pHi)
        val l = candidates(linBounds, oLo, oHi, pLo, pHi)
        // the linear layout can only prune on l_orderkey: every surviving
        // file spans the full l_partkey range, so the partkey half of the
        // predicate never removes a file
        assert(linBounds.filter(b => b._2 >= oLo && b._1 <= oHi)
          .forall(b => b._4 >= pLo && b._3 <= pHi))
        (zAcc + z, lAcc + l)
    }
    // across the boxes the bounding-box index over the z-layout must read
    // strictly fewer files than over the orderkey-sorted layout
    assert(zTotal < linTotal,
      s"z-order candidates $zTotal not below linear $linTotal")
  }

  test("k-field z-order: 3- and 4-key interleaves are exact (round-robin " +
      "bit placement, SQL rendering bit-identical), 2-key behavior is " +
      "unchanged, and >4 keys refuse loudly") {
    val s = spark
    import s.implicits._
    ZOrderEncode.register(s)
    // placement basics: key j owns bit positions k*i + j
    assert(ZOrderEncode.compute3(1L, 0L, 0L) == 1L)
    assert(ZOrderEncode.compute3(0L, 1L, 0L) == 2L)
    assert(ZOrderEncode.compute3(0L, 0L, 1L) == 4L)
    assert(ZOrderEncode.compute3(0L, 2L, 0L) == 16L) // bit 1 of key 1 → 3*1+1
    assert(ZOrderEncode.compute4(0L, 0L, 0L, 1L) == 8L)
    assert(ZOrderEncode.compute4(1L, 1L, 1L, 1L) == 15L)
    // full-width keys stay inside a non-negative BIGINT
    assert(ZOrderEncode.compute3(65535L, 65535L, 65535L) ==
      (1L << 48) - 1)
    assert(ZOrderEncode.compute4(32767L, 32767L, 32767L, 32767L) ==
      (1L << 60) - 1)
    // the registered SQL function dispatches by arity; Spark evaluates
    // the sqlK rendering to the same value (the DuckDB-oracle parity leg)
    val row = Seq((5L, 9L, 3L)).toDF("a", "b", "c")
      .select(expr(s"${ZOrderEncode.FnName}(a, b, c)").as("native"),
        expr(ZOrderEncode.sqlK(Seq("a", "b", "c"))).as("rendered"))
      .head
    assert(row.getLong(0) == row.getLong(1))
    assert(row.getLong(0) == ZOrderEncode.compute3(5L, 9L, 3L))
    val e = intercept[Exception](
      Seq((1L, 1L, 1L, 1L, 1L)).toDF("a", "b", "c", "d", "e")
        .select(expr(s"${ZOrderEncode.FnName}(a, b, c, d, e)")).collect())
    val chain = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(t => Option(t.getMessage).getOrElse(""))
      .mkString(" | ")
    assert(chain.contains("2 to 4"), chain)
  }

  test("a 3-field z-ordered layout prunes a 3-D box on min/max stats " +
      "strictly better than the 2-field curve over the same keys — " +
      "OPTIMIZE ZORDER BY (a, b, c) clusters ALL three dimensions") {
    val s = spark
    // a dense 32x32x32 grid: every file under the 3-field curve gets a
    // tight bounding box in ALL dimensions, while the 2-field curve's
    // files (sorted only on a, b) each span the whole c range
    val grid = s.range(32L * 32 * 32).select(
      (col("id") % 32).as("a"),
      expr("(id div 32) % 32").as("b"),
      expr("id div 1024").as("c"))
    val files = 32
    val base = Files.createTempDirectory("zorder3").toString
    val z3 = grid.withColumn("zval", expr(s"${ZOrderEncode.FnName}(a, b, c)"))
    z3.repartitionByRange(files, col("zval")).sortWithinPartitions("zval")
      .write.mode("overwrite").parquet(s"$base/z3")
    val z2 = grid.withColumn("zval", expr(s"${ZOrderEncode.FnName}(a, b)"))
    z2.repartitionByRange(files, col("zval")).sortWithinPartitions("zval")
      .write.mode("overwrite").parquet(s"$base/z2")
    def bounds(dir: String): Array[(Long, Long, Long, Long, Long, Long)] =
      s.read.parquet(dir).groupBy(input_file_name())
        .agg(min("a"), max("a"), min("b"), max("b"), min("c"), max("c"))
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5), r.getLong(6)))
    def hits(bs: Array[(Long, Long, Long, Long, Long, Long)],
        box: (Long, Long, Long, Long, Long, Long)): Int =
      bs.count { case (aMin, aMax, bMin, bMax, cMin, cMax) =>
        aMax >= box._1 && aMin <= box._2 && bMax >= box._3 &&
          bMin <= box._4 && cMax >= box._5 && cMin <= box._6
      }
    val b3 = bounds(s"$base/z3")
    val b2 = bounds(s"$base/z2")
    // every 2-field file spans the full c range (c never participated in
    // its sort key) — the structural reason a 3-D predicate cannot prune
    assert(b2.forall { case (_, _, _, _, cMin, cMax) =>
      cMin == 0L && cMax == 31L })
    // slab predicates — wide in (a, b), narrow in c: the workload shape
    // that MOTIVATES adding the third field. The 2-field layout reads
    // every (a,b)-matching file regardless of c; the 3-field layout's
    // per-file c-boxes cut the candidates down
    val boxes = Seq(
      (0L, 31L, 0L, 31L, 0L, 3L), (0L, 31L, 0L, 31L, 28L, 31L),
      (0L, 15L, 0L, 31L, 8L, 11L), (16L, 31L, 0L, 31L, 16L, 19L))
    val (t3, t2) = boxes.foldLeft((0, 0)) { case ((acc3, acc2), box) =>
      (acc3 + hits(b3, box), acc2 + hits(b2, box))
    }
    assert(t3 < t2,
      s"3-field z-order candidates $t3 not below 2-field $t2 — the third " +
        "dimension did not cluster")
  }
}
