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
}
