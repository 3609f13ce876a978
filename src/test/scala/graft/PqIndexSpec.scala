package graft

import org.apache.spark.sql.functions._
import graft.similarity.PqIndex

class PqIndexSpec extends SparkSpec {

  private def fixture = {
    import spark.implicits._
    // two well-separated clusters in 4-d; PQ with M=2 subspaces must rank
    // same-cluster vectors above cross-cluster ones for every probe
    val a = (0 until 8).map(i =>
      (i.toLong, Seq(1f + i * 0.01f, 1f, 1f, 1f + i * 0.01f), 0))
    val b = (8 until 16).map(i =>
      (i.toLong, Seq(9f + i * 0.01f, 9f, 9f, 9f + i * 0.01f), 1))
    (a ++ b).toDF("vec_id", "embedding", "label")
  }

  test("trainCodebooks emits one centroid per (subspace, code)") {
    val cb = PqIndex.trainCodebooks(fixture, m = 2, k = 2)
    val rows = cb.collect()
    assert(rows.length == 4)
    assert(rows.map(r => (r.getInt(0), r.getInt(1))).toSet ==
      Set((0, 0), (0, 1), (1, 0), (1, 1)))
    assert(rows.forall(_.getSeq[Double](2).length == 2))
  }

  test("encode assigns every vector exactly one code per subspace") {
    val docs = fixture
    val cb = PqIndex.trainCodebooks(docs, m = 2, k = 2)
    val codes = PqIndex.encode(docs, cb, m = 2).collect()
    assert(codes.length == 16 * 2)
    // (nid, m, code): every code within [0, k)
    assert(codes.forall(r => r.getInt(2) >= 0 && r.getInt(2) < 2))
    // and exactly one row per (vector, subspace)
    val perVec = codes.groupBy(_.getLong(0)).view.mapValues(_.map(_.getInt(1)).sorted)
    assert(perVec.values.forall(_.toSeq == Seq(0, 1)))
  }

  test("ADC search keeps probes inside their own cluster and is deterministic") {
    val docs = fixture
    val out = PqIndex.searchAdc(docs, m = 2, k = 2,
        isProbe = col("vec_id").isin(0L, 15L), topK = 3,
        exportPath = "/tmp/graft_pq_codebooks_spec")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length == 6)
    // probe 0 lives in cluster [0,8); probe 15 in [8,16)
    assert(out.filter(_._1 == 0L).forall(_._2 < 8L))
    assert(out.filter(_._1 == 15L).forall(r => r._2 >= 8L && r._2 < 15L))
    // ranks are 1..3 with ascending integer distance
    for (pid <- Seq(0L, 15L)) {
      val rs = out.filter(_._1 == pid).sortBy(_._4)
      assert(rs.map(_._4).toSeq == Seq(1L, 2L, 3L))
      assert(rs.map(_._3).toSeq == rs.map(_._3).sorted.toSeq)
    }
    val again = PqIndex.searchAdc(docs, m = 2, k = 2,
        isProbe = col("vec_id").isin(0L, 15L), topK = 3,
        exportPath = "/tmp/graft_pq_codebooks_spec")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.sorted.toSeq == again.sorted.toSeq)
  }

  test("IVFADC at nProbe = nCells degenerates to the full PQ ADC scan") {
    // with every cell probed the coarse pruning admits every candidate,
    // so the composed index must reproduce searchAdc exactly (same
    // codebook seed, same integer ADC sums, same tie-breaks)
    val docs = fixture
    val full = PqIndex.searchAdc(docs, m = 2, k = 2,
        isProbe = col("vec_id").isin(0L, 15L), topK = 3,
        exportPath = "/tmp/graft_pq_codebooks_spec2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val ivfadc = PqIndex.ivfAdcSearch(docs, nCells = 4, nProbe = 4,
        m = 2, k = 2, isProbe = col("vec_id").isin(0L, 15L), topK = 3,
        exportPath = "/tmp/graft_pq_codebooks_spec2")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(ivfadc.sorted.toSeq == full.sorted.toSeq)
  }

  test("IVFADC scores only candidates from probed cells") {
    import graft.similarity.IvfIndex
    val docs = fixture
    val nCells = 4; val nProbe = 1
    val out = PqIndex.ivfAdcSearch(docs, nCells = nCells, nProbe = nProbe,
        m = 2, k = 2, isProbe = col("vec_id").isin(0L, 15L), topK = 8,
        exportPath = "/tmp/graft_pq_codebooks_spec3")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // recompute the coarse structure independently: every returned
    // neighbor must live in its probe's single probed cell
    // seeded cells are keyed by the seed vector's id, so `cell` is LONG
    val assigned = IvfIndex.seededAssign(docs, nCells)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val probeCell = Map(0L -> assigned(0L), 15L -> assigned(15L))
    // nProbe=1 probes the probe's own best cell (it contains the probe
    // itself, cosine 1.0 with its centroid's cell by construction here)
    assert(out.nonEmpty)
    for ((pid, nid) <- out)
      assert(assigned(nid) == probeCell(pid),
        s"neighbor $nid of probe $pid is outside the probed cell")
  }
}
