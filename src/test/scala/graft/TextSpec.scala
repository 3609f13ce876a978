package graft

import org.apache.spark.sql.functions._
import graft.text.Text

class TextSpec extends SparkSpec {

  test("tokens: whitespace split, empties filtered") {
    import spark.implicits._
    val df = Seq("  the quick   brown ", "").toDF("text")
    val n = df.select(size(Text.tokens(col("text")))).collect().map(_.getInt(0))
    assert(n.toSeq == Seq(3, 0))
  }

  test("langGuess picks the marker list with most hits, 'und' when none") {
    import spark.implicits._
    val df = Seq(
      "the cat sat on a mat", "der hund und die katze",
      "le chat et la maison", "xyzzy plugh")
      .toDF("text")
    val got = df.select(Text.langGuess(Text.tokens(col("text")))).collect().map(_.getString(0))
    assert(got.toSeq == Seq("en", "de", "fr", "und"))
  }

  test("fingerprint matches a hand-computed rolling hash") {
    import spark.implicits._
    val df = Seq("ab").toDF("text")
    // h = ((0*31 + 97) * 31 + 98) % 1e9+7 = 97*31 + 98 = 3105
    val got = df.select(Text.fingerprint(spark, "text")).collect()(0).getLong(0)
    assert(got == 3105L)
  }

  test("features computes consistent ratios") {
    import spark.implicits._
    val df = Seq((1L, "the the xyzzy")).toDF("doc_id", "text")
    val r = Text.features(df).head()
    assert(r.getAs[Long]("n_tokens") == 3L)
    assert(r.getAs[Long]("n_distinct_tokens") == 2L)
    assert(r.getAs[Long]("stopword_hits") == 2L)
    assert(r.getAs[Double]("stopword_ratio") == 0.6667)
    assert(r.getAs[String]("lang_guess") == "en")
  }
}
