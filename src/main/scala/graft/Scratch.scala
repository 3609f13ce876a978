package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.text.Text

/** Throwaway perf bisection. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")

    def time(label: String)(f: => Long): Unit = {
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        val n = f
        println(f"$label run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
    }

    val postings = docs.select(col("source").as("block"), col("doc_id").as("id"),
      explode(array_distinct(Text.tokens(col("text")))).as("tok"))
    time("postings")(postings.count())
    val cached = postings.cache(); cached.count()
    time("join-on-cached") {
      cached.as("a").join(cached.as("b"),
        col("a.block") === col("b.block") && col("a.tok") === col("b.tok") &&
          col("a.id") < col("b.id"))
        .groupBy(col("a.id"), col("b.id")).count().count()
    }
    time("join-uncached") {
      postings.as("a").join(postings.as("b"),
        col("a.block") === col("b.block") && col("a.tok") === col("b.tok") &&
          col("a.id") < col("b.id"))
        .groupBy(col("a.id"), col("b.id")).count().count()
    }
    val tokensOnly = docs.select(explode(split(trim(col("text")), "\\s+")).as("tok"))
    time("tokens-no-lambda")(tokensOnly.count())
    val lam = docs.select(explode(Text.tokens(col("text"))).as("tok"))
    time("tokens-lambda")(lam.count())
    spark.stop()
  }
}
