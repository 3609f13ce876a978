package graft

import java.nio.file.Files

import graft.sources.{TypedLake, WeatherLakeV2Sink}

/** WRITABLE BRANCHES / WRITE-AUDIT-PUBLISH (Iceberg wap.branch +
  * fast_forward, re-expressed over the manifest-set format):
  *
  *  - a branch is `_refs/branch-<name>` (immutable BASE = the live
  *    manifest set at the fork) plus a staging dir of append-only
  *    manifests OUTSIDE the main manifest namespace — main's liveness,
  *    history, conflict scans and vacuum structurally never see them;
  *  - `spark.graft.wap.branch = <name>` reroutes the catalog surface:
  *    V2 appends stage on the branch (auto-created at first write),
  *    reads of a table CARRYING the branch resolve base + staged (other
  *    tables read main, so a staged fact joins un-staged dims), and
  *    every non-append main publish refuses LOUDLY while staging;
  *  - `CALL lake.system.fast_forward(t, b)` publishes the staged
  *    appends in ONE atomic main commit, refusing unless main is still
  *    EXACTLY the branch's base (strict ancestry — any main data, DML
  *    or maintenance commit since the fork means rebase: re-create);
  *  - branches are vacuum retention roots; staged files survive
  *    sweep_orphans until drop_branch orphans them for real.
  */
class TypedLakeBranchSpec extends SparkSpec {

  private def freshCat(tag: String): String = {
    val w = Files.createTempDirectory(s"branch$tag").toString
    spark.conf.set(s"spark.sql.catalog.br$tag", "graft.sources.LakeCatalog")
    spark.conf.set(s"spark.sql.catalog.br$tag.warehouse", w)
    w
  }

  private def staging[T](branch: String)(body: => T): T = {
    spark.conf.set(WeatherLakeV2Sink.WapBranchConf, branch)
    try body finally spark.conf.unset(WeatherLakeV2Sink.WapBranchConf)
  }

  test("WAP end-to-end: stage appends on a branch (auto-created), gate " +
      "on the branch view while main stays untouched, fast_forward " +
      "publishes atomically, a second fast_forward refuses") {
    val w = freshCat("a")
    spark.sql("""CREATE TABLE bra.t (id BIGINT, v BIGINT) USING lake
      TBLPROPERTIES ('statsFields' = 'id')""")
    spark.sql("INSERT INTO bra.t SELECT id, id * 10 FROM range(100)")

    staging("audit") {
      spark.sql("INSERT INTO bra.t SELECT id, id * 10 FROM range(100, 130)")
      spark.sql("INSERT INTO bra.t SELECT id, id * 10 FROM range(130, 150)")
      // the GATE query reads base + staged
      assert(spark.sql("SELECT count(*) FROM bra.t").head.getLong(0) == 150)
      assert(spark.sql("SELECT CAST(sum(v) AS BIGINT) FROM bra.t WHERE " +
        "id >= 100").head.getLong(0) == (100L until 150L).map(_ * 10).sum)
    }
    // main untouched until publish
    assert(spark.sql("SELECT count(*) FROM bra.t").head.getLong(0) == 100)
    assert(WeatherLakeV2Sink.branchNames(s"$w/t") == Seq("audit"))
    val br = spark.sql("CALL bra.system.branches('t')").collect()
    assert(br.length == 1 && br.head.getString(0) == "audit" &&
      br.head.getInt(2) == 2, br.toSeq)
    // observability: detail's appended branches column counts it
    val det = spark.sql("CALL bra.system.detail('t')").head
    assert(det.getInt(det.fieldIndex("branches")) == 1)

    // PUBLISH: one atomic commit; main now serves the full view
    val published =
      spark.sql("CALL bra.system.fast_forward('t', 'audit')").head.getInt(0)
    assert(published > 0)
    assert(spark.sql("SELECT count(*) FROM bra.t").head.getLong(0) == 150)
    // exactly ONE new main commit, op-stamped
    val hist = spark.sql("CALL bra.system.history('t')")
      .select("op").collect().map(_.getString(0)).toSeq
    assert(hist.count(_ == "fastforward") == 1, hist)
    // strict ancestry: the publish itself advanced main, so replaying
    // the fast-forward refuses rather than double-appending
    val again = intercept[java.util.ConcurrentModificationException](
      spark.sql("CALL bra.system.fast_forward('t', 'audit')").collect())
    assert(again.getMessage.contains("advanced"))
    assert(spark.sql("CALL bra.system.drop_branch('t', 'audit')")
      .head.getBoolean(0))
    assert(spark.sql("SELECT count(*) FROM bra.t").head.getLong(0) == 150)
    spark.sql("DROP TABLE bra.t")
  }

  test("the WAP fence is LOUD: DML rewrites, overwrites and maintenance " +
      "refuse to touch main while the session stages; un-staged tables " +
      "still read main (a staged fact joins clean dims)") {
    freshCat("b")
    spark.sql("CREATE TABLE brb.t (id BIGINT, v BIGINT) USING lake")
    spark.sql("CREATE TABLE brb.dim (id BIGINT, name STRING) USING lake")
    spark.sql("INSERT INTO brb.t SELECT id, id FROM range(5)")
    spark.sql("INSERT INTO brb.t SELECT id, id FROM range(5, 10)")
    spark.sql("INSERT INTO brb.dim SELECT id, concat('d', id) FROM range(10)")
    staging("audit") {
      spark.sql("INSERT INTO brb.t SELECT id, id FROM range(10, 15)")
      // staged fact joins the un-staged dim (dim reads main)
      assert(spark.sql("""SELECT count(*) FROM brb.t f
        JOIN brb.dim d ON f.id = d.id""").head.getLong(0) == 10)
      val del = intercept[Exception](
        spark.sql("DELETE FROM brb.t WHERE id = 3"))
      assert(del.getMessage.contains("APPEND-ONLY"), del.getMessage)
      val ow = intercept[Exception](
        spark.sql("INSERT OVERWRITE brb.t SELECT id, id FROM range(5)"))
      assert(ow.getMessage.contains("APPEND-ONLY"), ow.getMessage)
      val mnt = intercept[Exception](
        spark.sql("CALL brb.system.checkpoint('t')").collect())
      assert(mnt.getMessage.contains("staging on WAP branch"),
        mnt.getMessage)
      // the fence protects even tables with no branch yet: a DELETE on
      // the dim would land on MAIN while the user believes it is staged
      val dimDel = intercept[Exception](
        spark.sql("DELETE FROM brb.dim WHERE id = 1"))
      assert(dimDel.getMessage.contains("APPEND-ONLY"), dimDel.getMessage)
    }
    // conf unset: everything works again
    spark.sql("DELETE FROM brb.t WHERE id = 3")
    assert(spark.sql("SELECT count(*) FROM brb.t").head.getLong(0) == 9)
    spark.sql("DROP TABLE brb.t")
    spark.sql("DROP TABLE brb.dim")
  }

  test("strict ancestry: any main commit after the fork — data or " +
      "maintenance — fails fast_forward with a rebase message") {
    freshCat("c")
    spark.sql("CREATE TABLE brc.t (id BIGINT) USING lake")
    spark.sql("INSERT INTO brc.t SELECT id FROM range(10)")
    spark.sql("CALL brc.system.create_branch('t', 'audit')").collect()
    staging("audit") {
      spark.sql("INSERT INTO brc.t SELECT id FROM range(10, 20)")
    }
    spark.sql("INSERT INTO brc.t SELECT id FROM range(100, 105)") // main moved
    val e = intercept[java.util.ConcurrentModificationException](
      spark.sql("CALL brc.system.fast_forward('t', 'audit')").collect())
    assert(e.getMessage.contains("rebase"), e.getMessage)
    // branch view is unaffected by the divergence (base is pinned)
    staging("audit") {
      assert(spark.sql("SELECT count(*) FROM brc.t").head.getLong(0) == 20)
    }
    spark.sql("CALL brc.system.drop_branch('t', 'audit')").collect()

    // maintenance divergence: checkpoint rewrites manifest identity
    spark.sql("CALL brc.system.create_branch('t', 'audit2')").collect()
    staging("audit2") {
      spark.sql("INSERT INTO brc.t SELECT id FROM range(200, 210)")
    }
    spark.sql("CALL brc.system.checkpoint('t')").collect()
    val e2 = intercept[java.util.ConcurrentModificationException](
      spark.sql("CALL brc.system.fast_forward('t', 'audit2')").collect())
    assert(e2.getMessage.contains("rebase"), e2.getMessage)
    spark.sql("DROP TABLE brc.t")
  }

  test("branches are retention roots: vacuum keeps a superseded base " +
      "alive for the branch, sweep_orphans keeps staged files; " +
      "drop_branch releases both") {
    val w = freshCat("d")
    spark.sql("CREATE TABLE brd.t (id BIGINT) USING lake")
    spark.sql("INSERT INTO brd.t SELECT id FROM range(10)")
    spark.sql("CALL brd.system.create_branch('t', 'keep')").collect()
    staging("keep") {
      spark.sql("INSERT INTO brd.t SELECT id FROM range(10, 25)")
    }
    val stagedFiles = WeatherLakeV2Sink.branchFiles(s"$w/t", "keep")
    assert(stagedFiles.nonEmpty)
    // main REWRITES the base (overwrite supersedes it), then vacuums
    // aggressively — the branch must still read its full view
    spark.sql("INSERT OVERWRITE brd.t SELECT id FROM range(5)")
    spark.sql(
      "CALL brd.system.vacuum('t', min_age_ms => 0, force => true)")
      .collect()
    spark.sql("CALL brd.system.sweep_orphans('t', min_age_ms => 1)")
      .collect()
    staging("keep") {
      assert(spark.sql("SELECT count(*) FROM brd.t").head.getLong(0) == 25,
        "branch view must survive main vacuum (base is a retention root)")
    }
    val fs = new org.apache.hadoop.fs.Path(s"$w/t")
      .getFileSystem(new org.apache.hadoop.conf.Configuration())
    assert(stagedFiles.forall(f =>
      fs.exists(new org.apache.hadoop.fs.Path(f))),
      "staged files must survive sweep_orphans while the branch lives")
    // divergence killed the publish path — drop releases everything
    spark.sql("CALL brd.system.drop_branch('t', 'keep')").collect()
    Thread.sleep(5)
    spark.sql("CALL brd.system.sweep_orphans('t', min_age_ms => 1)")
      .collect()
    assert(stagedFiles.forall(f =>
      !fs.exists(new org.apache.hadoop.fs.Path(f))),
      "dropped branch's staged files are true orphans — swept")
    assert(spark.sql("SELECT count(*) FROM brd.t").head.getLong(0) == 5)
    spark.sql("DROP TABLE brd.t")
  }

  test("composition: WAP over live position deletes resolves the branch " +
      "view as base-with-deletions + staged appends; VERSION AS OF " +
      "ignores the staging conf (main history by contract); name guards " +
      "are loud") {
    val w = freshCat("e")
    spark.sql("""CREATE TABLE bre.t (id BIGINT, v BIGINT) USING lake
      TBLPROPERTIES ('dmlMode' = 'mor')""")
    spark.sql("INSERT INTO bre.t SELECT id, id FROM range(50)")
    spark.sql("DELETE FROM bre.t WHERE id IN (7, 13)")
    assert(WeatherLakeV2Sink.committedMorDeleteFiles(s"$w/t")
      .forall(TypedLake.isPosDelete))
    staging("stage") {
      spark.sql("INSERT INTO bre.t SELECT id, id FROM range(50, 60)")
      assert(spark.sql("SELECT count(*) FROM bre.t").head.getLong(0) == 58)
      assert(spark.sql("SELECT count(*) FROM bre.t WHERE id IN (7, 13)")
        .head.getLong(0) == 0)
      // time travel pins MAIN history even while staging (version 0 =
      // the base insert, before the mor delete)
      assert(spark.sql("SELECT count(*) FROM bre.t VERSION AS OF 0")
        .head.getLong(0) == 50)
    }
    spark.sql("CALL bre.system.fast_forward('t', 'stage')").collect()
    assert(spark.sql("SELECT count(*) FROM bre.t").head.getLong(0) == 58)

    // a brand-new table's FIRST commits can be staged (empty base) and
    // published — the bootstrap WAP flow
    spark.sql("CREATE TABLE bre.fresh (id BIGINT) USING lake")
    staging("boot") {
      spark.sql("INSERT INTO bre.fresh SELECT id FROM range(7)")
      assert(spark.sql("SELECT count(*) FROM bre.fresh").head.getLong(0) == 7)
    }
    assert(spark.sql("SELECT count(*) FROM bre.fresh").head.getLong(0) == 0)
    spark.sql("CALL bre.system.fast_forward('fresh', 'boot')").collect()
    assert(spark.sql("SELECT count(*) FROM bre.fresh").head.getLong(0) == 7)
    spark.sql("CALL bre.system.drop_branch('fresh', 'boot')").collect()
    spark.sql("DROP TABLE bre.fresh")

    // VERSION AS OF '<branch>' reads the branch VIEW with NO staging
    // conf — the gate-query surface for a reviewer session; mor debt
    // resolves at the branch's base, and a TAG of the same name wins
    // the ref namespace (immutable pins first)
    spark.sql("CALL bre.system.create_branch('t', 'review')").collect()
    staging("review") {
      spark.sql("INSERT INTO bre.t SELECT id, id FROM range(200, 207)")
    }
    assert(spark.sql("SELECT count(*) FROM bre.t VERSION AS OF 'review'")
      .head.getLong(0) == 65) // 58 published + 7 staged
    assert(spark.sql("SELECT count(*) FROM bre.t VERSION AS OF 'review' " +
      "WHERE id IN (7, 13)").head.getLong(0) == 0,
      "branch view must resolve the base's mor deletions")
    assert(spark.sql("SELECT count(*) FROM bre.t").head.getLong(0) == 58)
    spark.sql("CALL bre.system.tag('t', 'review2')").collect()
    spark.sql("CALL bre.system.create_branch('t', 'review2')").collect()
    staging("review2") {
      spark.sql("INSERT INTO bre.t SELECT id, id FROM range(300, 310)")
    }
    assert(spark.sql("SELECT count(*) FROM bre.t VERSION AS OF 'review2'")
      .head.getLong(0) == 58,
      "a tag and a branch sharing a name resolve to the TAG")
    spark.sql("CALL bre.system.drop_branch('t', 'review')").collect()
    spark.sql("CALL bre.system.drop_branch('t', 'review2')").collect()
    spark.sql("CALL bre.system.drop_tag('t', 'review2')").collect()

    val digits = intercept[Exception](
      spark.sql("CALL bre.system.create_branch('t', '123')").collect())
    assert(digits.getMessage.contains("all digits"))
    val unknown = intercept[IllegalArgumentException](
      WeatherLakeV2Sink.readBranchBase(s"$w/t", "nope"))
    assert(unknown.getMessage.contains("existing branches"))
    spark.sql("CALL bre.system.create_branch('t', 'dup')").collect()
    val dup = intercept[Exception](
      spark.sql("CALL bre.system.create_branch('t', 'dup')").collect())
    assert(dup.getMessage.contains("already exists"))
    spark.sql("CALL bre.system.drop_branch('t', 'dup')").collect()
    spark.sql("DROP TABLE bre.t")
  }
}
