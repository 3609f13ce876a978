package graft

import java.nio.file.Files

import graft.sources.TypedLake

/** `MERGE WITH SCHEMA EVOLUTION` (Delta's clause on the typed lake):
  * source-only columns are ADDED through the same metadata-only ALTER
  * path as explicit evolution — nullable, appended before the partition
  * suffix, zero data files rewritten — and the merge's `SET *` /
  * `INSERT *` then carry them through. Old rows null-fill; the change
  * feed emits the widened shape.
  */
class TypedLakeMergeEvolutionSpec extends SparkSpec {

  private def freshCat(tag: String): String = {
    val w = Files.createTempDirectory(s"mrgevo$tag").toString
    spark.conf.set(s"spark.sql.catalog.me$tag", "graft.sources.LakeCatalog")
    spark.conf.set(s"spark.sql.catalog.me$tag.warehouse", w)
    w
  }

  test("MERGE WITH SCHEMA EVOLUTION widens the table with the source's " +
      "new column (metadata-only), updates/inserts carry it, untouched " +
      "rows null-fill, and the change feed emits the widened shape") {
    val w = freshCat("a")
    spark.sql("CREATE TABLE mea.t (id BIGINT, v BIGINT) USING lake")
    spark.sql("INSERT INTO mea.t SELECT id, id * 10 FROM range(10)")
    val schema0 = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v",
        org.apache.spark.sql.types.LongType)))
    val before = graft.sources.WeatherLakeV2Sink.liveManifests(s"$w/t")

    spark.sql("""MERGE WITH SCHEMA EVOLUTION INTO mea.t t
      USING (SELECT id, id * 100 AS v, concat('n', id) AS note
             FROM range(5, 15)) s
      ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")

    // schema widened: note appended, nullable
    val widened = spark.table("mea.t").schema
    assert(widened.fieldNames.toSeq == Seq("id", "v", "note"), widened)
    assert(widened("note").nullable)
    val rows = spark.sql(
      "SELECT id, v, note FROM mea.t ORDER BY id").collect()
    assert(rows.length == 15)
    // untouched rows (0-4): old values, note null-filled
    (0 until 5).foreach { i =>
      assert(rows(i).getLong(1) == i * 10 && rows(i).isNullAt(2), rows(i))
    }
    // matched (5-9) and inserted (10-14): source values + note
    (5 until 15).foreach { i =>
      assert(rows(i).getLong(1) == i * 100 &&
        rows(i).getString(2) == s"n$i", rows(i))
    }

    // the widened-merge changes: old-shape preimages null-fill note, the
    // postimages and inserts carry it — the feed speaks the NEW schema
    val widenedTyped = org.apache.spark.sql.types.StructType(
      widened.fields.map(f => f.copy()))
    val changes = TypedLake.changesBetweenTyped(spark, s"$w/t",
        widenedTyped, keyCols = Seq("id"), from = before,
        to = graft.sources.WeatherLakeV2Sink.liveManifests(s"$w/t"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(3)) null else r.getString(3)))
    assert(changes.count(_._1 == "insert") == 5)
    assert(changes.filter(_._1 == "update_postimage")
      .forall(c => c._3 == s"n${c._2}"), changes.toSeq)
    assert(changes.filter(_._1 == "update_preimage")
      .forall(_._3 == null), changes.toSeq)

    // a SECOND evolution merge with no new columns degrades to a plain
    // merge (no schema change)
    spark.sql("""MERGE WITH SCHEMA EVOLUTION INTO mea.t t
      USING (SELECT 100 AS id, 1 AS v, 'x' AS note) s
      ON t.id = s.id
      WHEN NOT MATCHED THEN INSERT *""")
    assert(spark.table("mea.t").schema.fieldNames.length == 3)
    assert(spark.sql("SELECT count(*) FROM mea.t").head.getLong(0) == 16)

    // the classic JSON lake refuses the clause loudly
    spark.sql(s"""CREATE TEMPORARY VIEW evo_classic
      USING graft.sources.WeatherLakeV2StreamSource
      OPTIONS (path '${Files.createTempDirectory("mrgevoc")}/lake')""")
    val e = intercept[Exception](spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO evo_classic t
        USING (SELECT 'c' AS city, '2024-01-01' AS ds, '00' AS hour,
               '{}' AS raw_json) s
        ON get_json_object(t.raw_json, '$.k') =
           get_json_object(s.raw_json, '$.k')
        WHEN MATCHED THEN UPDATE SET raw_json = s.raw_json"""))
    assert(e.getMessage.contains("typed lake tables only"), e.getMessage)
    assert(schema0.fieldNames.toSeq == Seq("id", "v")) // (sanity anchor)
    spark.sql("DROP TABLE mea.t")
  }
}
