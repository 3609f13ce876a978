package graft

import org.apache.spark.sql.functions._
import graft.similarity.{IvfIndex, ModelExport, Similarity}

class IvfIndexSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf0001).cache()
  private lazy val probes = emb.filter(col("vec_id") < 10)

  test("nProbe = k degenerates to exact brute-force search") {
    val ix = IvfIndex.build(emb, k = 8)
    val ivf = IvfIndex.search(ix, probes, k = 5, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    val exact = Similarity.bruteForceTopK(emb, col("vec_id") < 10, 5)
      .collect().map(r => (r.getAs[Long]("pid"), r.getAs[Long]("nid"),
        r.getAs[Long]("rank"))).toSet
    assert(ivf == exact)
  }

  test("partial probing trades recall for a bounded scan, recall stays high") {
    val ix = IvfIndex.build(emb, k = 8)
    val ivf = IvfIndex.search(ix, probes, k = 5, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Similarity.bruteForceTopK(emb, col("vec_id") < 10, 5)
      .collect().map(r => (r.getAs[Long]("pid"), r.getAs[Long]("nid"))).toSet
    val recall = (ivf & exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"recall $recall too low for nProbe=3 of 8 cells")
    assert(ivf.size == exact.size) // still returns k per probe
  }

  test("seeded IVF: nProbe = nCells degenerates to exact brute-force search") {
    val ivf = IvfIndex.seededSearch(emb, nCells = 8, col("vec_id") < 10,
        k = 5, nProbe = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    val exact = Similarity.bruteForceTopK(emb, col("vec_id") < 10, 5)
      .collect().map(r => (r.getAs[Long]("pid"), r.getAs[Long]("nid"),
        r.getAs[Long]("rank"))).toSet
    assert(ivf == exact)
  }

  test("seeded IVF assignment is total and deterministic across evaluations") {
    val a1 = IvfIndex.seededAssign(emb, nCells = 8)
      .select(col("nid"), col("cell"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val a2 = IvfIndex.seededAssign(emb, nCells = 8)
      .select(col("nid"), col("cell"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a1 == a2)
    assert(a1.size == emb.count())
    assert(a1.map(_._1).size == a1.size) // one cell per vector
  }

  test("drift monitor: in-distribution appends keep the flag down; a " +
      "shifted arrival distribution trips it, and the histogram shows why") {
    val initial = emb.filter(col("vec_id") < 400)
    val cent = IvfIndex.seededCentroids(initial, 8)
    // in-distribution arrivals: the held-out tail of the same corpus
    val healthy = emb.filter(col("vec_id") >= 400)
    val (t1, a1, flag1) =
      IvfIndex.assignmentDriftFlag(initial, healthy, cent, tolerance = 0.1)
    assert(!flag1, s"in-distribution append must not flag (train=$t1, arrive=$a1)")
    // drifted arrivals: vectors ORTHOGONAL to the whole centroid span —
    // semantically new content no frozen cell represents (every
    // assignment cosine ~0, so the winning one is too). Built by
    // Gram-Schmidt: orthonormalize the centroids, then strip their
    // projections from a unit axis vector.
    val centArr = cent.collect()
      .map(_.getSeq[Double](1).toArray)
    val dim = centArr.head.length
    def dot(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    def minus(a: Array[Double], b: Array[Double], s: Double): Array[Double] =
      a.zip(b).map { case (x, y) => x - s * y }
    val basis = centArr.foldLeft(Vector.empty[Array[Double]]) { (bs, c) =>
      val r = bs.foldLeft(c)((v, b) => minus(v, b, dot(v, b)))
      val n = math.sqrt(dot(r, r))
      if (n > 1e-9) bs :+ r.map(_ / n) else bs
    }
    val ortho = (0 until dim).iterator.map { i =>
      val e = Array.tabulate(dim)(j => if (j == i) 1.0 else 0.0)
      basis.foldLeft(e)((v, b) => minus(v, b, dot(v, b)))
    }.find(v => math.sqrt(dot(v, v)) > 1e-6).get
    val drifted = healthy.select(col("vec_id"),
      typedLit(ortho.toSeq).as("embedding"))
    val (t2, a2, flag2) =
      IvfIndex.assignmentDriftFlag(initial, drifted, cent, tolerance = 0.1)
    assert(flag2,
      s"out-of-span arrivals must trip the flag (train=$t2, arrive=$a2)")
    assert(a2 < a1, "drifted mean must sit below the healthy mean")
    // the histogram accounts every vector once per cohort and localizes
    // the drifted mass in strictly lower buckets on average
    val h = IvfIndex.assignmentDriftHistogram(initial, drifted, cent, buckets = 20)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val byCohort = h.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(byCohort("train") == initial.count())
    assert(byCohort("arrive") == healthy.count())
    def meanBucket(c: String): Double = {
      val rows = h.filter(_._1 == c)
      rows.map(r => r._2 * r._3).sum.toDouble / rows.map(_._3).sum
    }
    assert(meanBucket("arrive") < meanBucket("train"),
      "drifted arrivals must occupy lower cosine buckets")
  }

  test("every corpus vector is assigned to exactly one cell") {
    val ix = IvfIndex.build(emb, k = 8)
    assert(ix.assigned.count() == emb.count())
    assert(ix.assigned.select(col("cell")).distinct().count() <= 8)
  }

  test("learnedSearch at nProbe = k equals brute force and exports its centroids") {
    val dir = java.nio.file.Files.createTempDirectory("cent").toString + "/c"
    val ivf = IvfIndex.learnedSearch(emb, k = 8, col("vec_id") < 10,
        topK = 5, nProbe = 8, exportPath = dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    val exact = Similarity.bruteForceTopK(emb, col("vec_id") < 10, 5)
      .collect().map(r => (r.getAs[Long]("pid"), r.getAs[Long]("nid"),
        r.getAs[Long]("rank"))).toSet
    assert(ivf == exact)
    // the export is content-addressed under a corpus-signature hive
    // partition (ModelExport.sigPath) so multi-SF runs never clobber each
    // other; reading the base dir surfaces `sig` as a partition column
    val cent = spark.read.parquet(dir)
    assert(cent.columns.toSeq == Seq("cell", "cv", "sig"))
    assert(cent.select(col("sig")).distinct().collect().map(_.getString(0))
      .toSeq == Seq(ModelExport.corpusSig(emb)))
    assert(cent.count() == 8)
    assert(cent.select(col("cell")).collect().map(_.getInt(0)).toSet
      == (0 until 8).toSet)
  }

  test("semDedup flags the LATER twin of a near-identical pair and keeps " +
      "orthogonal vectors") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("semdedup").toString + "/c"
    val tiny = Seq(
      (1L, Array(1f, 0f, 0f, 0f)),
      (2L, Array(0.999f, 0.01f, 0f, 0f)), // twin of 1 -> dup (first wins)
      (3L, Array(0f, 1f, 0f, 0f)))        // far from both -> kept
      .toDF("vec_id", "embedding")
    val out = IvfIndex.semDedup(tiny, k = 2, threshold = 0.9, exportPath = dir)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out == Map(1L -> false, 2L -> true, 3L -> false))
    // threshold above max pairwise cosine -> nothing flagged
    val none = IvfIndex.semDedup(tiny, k = 2, threshold = 0.999999,
        exportPath = dir)
      .filter(col("is_dup")).count()
    assert(none == 0L)
  }
}
