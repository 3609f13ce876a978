package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{TypedLake, WeatherLakeV2Sink}

/** The CHANGE-FEED RETENTION CONTRACT (`cdfRetentionMs` table property,
  * round 16): a declared bootstrap/replay window that vacuum — even a
  * forced zero-age vacuum — honors for the whole metadata envelope, so
  * a change-feed consumer whose lag is inside the window can never lose
  * its horizon to maintenance. Outside the window (or without the
  * property) the existing LOUD vacuum-horizon failure stands — the
  * contract turns "how far behind can a consumer fall" from a race
  * against the maintenance schedule into a declared table property.
  */
class TypedLakeCdfRetentionSpec extends SparkSpec {

  private val schema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("v",
      org.apache.spark.sql.types.LongType)))

  private def drain(lake: String, cursor: String): Seq[(String, Long)] = {
    val (df, view) = TypedLake.readNewChangesTyped(spark, lake, schema,
      keyCols = Seq("id"), cursorPath = cursor)
    val rows = df.select(col("_change"), col("id")).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    WeatherLakeV2Sink.replaceCursor(cursor, view)
    rows
  }

  test("a forced zero-age vacuum INSIDE the declared window preserves a " +
      "lagging consumer's drain; the same lag WITHOUT the property hits " +
      "the loud vacuum-horizon failure") {
    val w = Files.createTempDirectory("cdfret").toString
    spark.conf.set("spark.sql.catalog.cdfr", "graft.sources.LakeCatalog")
    spark.conf.set("spark.sql.catalog.cdfr.warehouse", w)

    // WITH the contract: one hour of declared replay window
    spark.sql("""CREATE TABLE cdfr.t (id BIGINT, v BIGINT) USING lake
      TBLPROPERTIES ('cdfRetentionMs' = '3600000')""")
    val cursorT = s"$w/cursor_t"
    spark.sql("INSERT INTO cdfr.t SELECT id, id FROM range(10)")
    assert(drain(s"$w/t", cursorT).count(_._1 == "insert") == 10)
    // the consumer lags: more data + a checkpoint superseding its
    // cursor's manifests + an aggressive forced vacuum
    spark.sql("INSERT INTO cdfr.t SELECT id, id FROM range(10, 14)")
    spark.sql("INSERT INTO cdfr.t SELECT id, id FROM range(14, 16)")
    spark.sql("CALL cdfr.system.checkpoint('t')").collect()
    spark.sql("CALL cdfr.system.vacuum('t', min_age_ms => 0, " +
      "force => true)").collect()
    // inside the window: history survived, the drain nets the new rows
    val lateRows = drain(s"$w/t", cursorT)
    assert(lateRows.count(_._1 == "insert") == 6, lateRows)
    assert(lateRows.filter(_._1 == "insert").map(_._2).sorted ==
      (10L until 16L), lateRows)

    // WITHOUT the property: the same lag pattern loses its horizon —
    // loudly, never a silent partial feed
    spark.sql("CREATE TABLE cdfr.u (id BIGINT, v BIGINT) USING lake")
    val cursorU = s"$w/cursor_u"
    spark.sql("INSERT INTO cdfr.u SELECT id, id FROM range(10)")
    assert(drain(s"$w/u", cursorU).count(_._1 == "insert") == 10)
    spark.sql("INSERT INTO cdfr.u SELECT id, id FROM range(10, 14)")
    spark.sql("CALL cdfr.system.checkpoint('u')").collect()
    spark.sql("CALL cdfr.system.vacuum('u', min_age_ms => 0, " +
      "force => true)").collect()
    val e = intercept[IllegalStateException](drain(s"$w/u", cursorU))
    assert(e.getMessage.contains("vacuum horizon"), e.getMessage)

    spark.sql("DROP TABLE cdfr.t")
    spark.sql("DROP TABLE cdfr.u")
  }
}
