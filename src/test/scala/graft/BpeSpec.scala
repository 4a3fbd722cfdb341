package graft

import org.apache.spark.sql.functions._

import graft.ops.BpeOps
import graft.queries.PipelineQueries
import graft.sources.Tables

/** BPE tokenizer training: textbook-scan semantics on adversarial runs,
  * driver-local vs distributed-round parity, and multi-round symbol
  * growth (merged tokens re-merging). */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("mergeOnce follows the textbook greedy scan on adversarial runs") {
    def m(s: String, a: String, b: String) =
      BpeOps.mergeOnce(s.split(" "), a, b).mkString(" ")
    assert(m("a a a a", "a", "a") == "aa aa")
    assert(m("a a a", "a", "a") == "aa a")
    assert(m("a b a b", "a", "b") == "ab ab")
    assert(m("a a b", "a", "b") == "a ab")
    // a merged token never re-matches lhs within the same pass
    assert(m("aa a a", "a", "a") == "aa aa")
    assert(m("x a b y", "a", "b") == "x ab y")
    assert(m("b a b", "a", "b") == "b ab")
  }

  test("distributed rounds are bit-identical to the driver-local textbook loop") {
    def vocab = Tables.documents(spark, sf0001)
      .selectExpr("explode(filter(split(trim(text), ' '), x -> x <> '')) AS word")
      .groupBy("word").agg(count(lit(1)).as("freq"))
    def run(localMax: Long) =
      BpeOps.learnMerges(vocab, PipelineQueries.BpeRounds, localMax)
        .collect().map(_.toSeq).toSeq
    val local = run(Long.MaxValue)
    val dist = run(0L)
    assert(local.size == PipelineQueries.BpeRounds && local == dist)
  }

  test("later rounds merge previously merged symbols, with the stated tie-break") {
    // round 1: (a,a)=13 beats (a,b)=8; round 2: (a,b)=5 ties (aa,a)=5 and
    // wins on lhs byte order; round 3 merges two MERGED symbols
    val vocab = Seq(("aaab", 5L), ("aab", 3L)).toDF("word", "freq")
    val expected = Seq(
      (1L, "a", "a", "aa", 13L),
      (2L, "a", "b", "ab", 5L),
      (3L, "aa", "ab", "aaab", 5L))
    def got(localMax: Long) = BpeOps.learnMerges(vocab, 3, localMax).collect()
      .map(r => (r.getAs[Long]("round"), r.getAs[String]("lhs"),
        r.getAs[String]("rhs"), r.getAs[String]("merged"), r.getAs[Long]("cnt"))).toSeq
    assert(got(Long.MaxValue) == expected)
    assert(got(0L) == expected)
  }

  test("bpe_encode counts equal direct per-document merge replay") {
    val merges = PipelineQueries.bpeLearn(spark, sf0001).collect()
      .sortBy(_.getAs[Long]("round"))
      .map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs")))
    val expected = Tables.documents(spark, sf0001).selectExpr("doc_id", "text")
      .collect().map { r =>
        val words = r.getString(1).trim.split(" ").filter(_.nonEmpty)
        val nTok = words.map { w =>
          var s = w.map(_.toString).toArray
          merges.foreach { case (a, b) => s = BpeOps.mergeOnce(s, a, b) }
          s.length.toLong
        }.sum
        r.getLong(0) -> ((words.length.toLong, nTok, words.map(_.length.toLong).sum))
      }.toMap
    val got = PipelineQueries.bpeEncode(spark, sf0001).collect()
      .map(r => r.getAs[Long]("doc_id") -> ((r.getAs[Long]("n_words"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("n_chars")))).toMap
    assert(got == expected)
    // subword counts sit between word and character granularity
    assert(got.values.forall { case (w, t, c) => w <= t && t <= c })
  }
}
