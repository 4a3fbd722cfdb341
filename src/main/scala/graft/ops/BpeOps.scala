package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * BPE tokenizer TRAINING (Sennrich et al., ACL 2016, "Neural Machine
 * Translation of Rare Words with Subword Units") — the merge-learning loop
 * whose single-round statistics pass is `PipelineQueries.bpePairs`: start
 * from characters, repeatedly take the most frequent adjacent symbol pair
 * (freq-weighted over the word table; ties broken by (lhs, rhs) byte
 * order) and merge it greedily left-to-right in every word.
 *
 * Scale shape: after the ONE corpus-sized aggregation that builds the
 * word-frequency table, every merge round touches only the VOCABULARY —
 * the property that makes tokenizer training tractable at 100 TB. Below
 * `localMaxWords` the rounds run as a driver-local textbook loop (the
 * [[ClusterOps.pagerankFixed]] discipline: per-round distributed jobs are
 * pure scheduling floor at vocab scale, and the collect is bounded,
 * corpus-independent driver memory); above it, the same recurrence runs
 * distributed — pair counts via a vocab-sized explode+aggregate, the
 * argmax a 1-row bounded collect, the merge application a narrow
 * `aggregate` fold per word. Both paths are bit-identical by construction
 * (the fold merges x into the accumulator top exactly when the textbook
 * scan would: a merged token `lhs||rhs` can never re-match `lhs`, so
 * greedy left-to-right and fold order coincide) and are parity-checked in
 * BpeSpec with the distributed path force-covered at localMaxWords=0.
 *
 * Symbols are single characters initially (ASCII corpus contract — the
 * splitter is `substring(word, i, 1)`, mirrored by the oracle), then
 * concatenations; merge identity is by full string equality.
 */
object BpeOps {

  /** Vocabularies at or below this size train driver-locally; a word table
    * above it (a real web-scale tokenizer corpus) takes the distributed
    * rounds. 2^16 words × ~32 B is ~2 MB of driver memory — broadcast-
    * threshold discipline. */
  val DefaultLocalMaxWords: Long = 1L << 16

  /** The first `rounds` merges learned from a (word, freq) table, as rows
    * (round, lhs, rhs, merged, cnt). Stops early if no pair remains. */
  def learnMerges(vocab: DataFrame, rounds: Int,
                  localMaxWords: Long = DefaultLocalMaxWords): DataFrame = {
    val spark = vocab.sparkSession
    import spark.implicits._
    train(vocab, rounds, localMaxWords)._1.toDF("round", "lhs", "rhs", "merged", "cnt")
  }

  /** Tokenizer APPLY at the vocabulary level: train `rounds` merges, then
    * emit each word's post-merge subword count as (word, n_tok) — the
    * model-sized table a corpus-wide token-count pass joins against
    * ([[graft.queries.PipelineQueries.bpeEncode]]). Segmenting the VOCAB
    * instead of the corpus is the standard trick: the corpus never pays
    * the per-character merge scan, only a word-key join. */
  def segmentCounts(vocab: DataFrame, rounds: Int,
                    localMaxWords: Long = DefaultLocalMaxWords): DataFrame = {
    val spark = vocab.sparkSession
    import spark.implicits._
    train(vocab, rounds, localMaxWords)._2
  }

  /** Shared training loop: merges + the segmented vocabulary (word, n_tok). */
  private def train(vocab: DataFrame, rounds: Int, localMaxWords: Long)
      : (Seq[(Long, String, String, String, Long)], DataFrame) = {
    val spark = vocab.sparkSession
    import spark.implicits._
    val base = vocab.localCheckpoint(true)
    if (base.count() <= localMaxWords) {
      val words = base.select(col("word"), col("freq").cast("long"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      val (merges, seqs) = localLearn(words, rounds)
      (merges, seqs.map { case (w, s) => (w, s.length.toLong) }.toDF("word", "n_tok"))
    } else {
      val (merges, cur) = distributedLearn(base, rounds)
      (merges, cur.select(col("word"), size(col("syms")).cast("long").as("n_tok")))
    }
  }

  /** Textbook reference loop over a collected vocabulary; returns the
    * merges and each word's final symbol sequence. */
  private[graft] def localLearn(words: Seq[(String, Long)], rounds: Int)
      : (Seq[(Long, String, String, String, Long)], Seq[(String, Array[String])]) = {
    var seqs: Seq[(Array[String], Long)] =
      words.map { case (w, f) => (w.map(_.toString).toArray, f) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      seqs.foreach { case (s, f) =>
        var i = 0
        while (i < s.length - 1) {
          counts.updateWith((s(i), s(i + 1)))(c => Some(c.getOrElse(0L) + f))
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val ((a, b), c) = counts.minBy { case ((l, rr), n) => (-n, l, rr) }
        out += ((r.toLong, a, b, a + b, c))
        seqs = seqs.map { case (s, f) => (mergeOnce(s, a, b), f) }
        r += 1
      }
    }
    (out.toSeq, words.map(_._1).zip(seqs.map(_._1)))
  }

  /** One greedy left-to-right merge pass — the published apply step. */
  private[graft] def mergeOnce(s: Array[String], a: String, b: String): Array[String] = {
    val buf = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < s.length) {
      if (i + 1 < s.length && s(i) == a && s(i + 1) == b) { buf += a + b; i += 2 }
      else { buf += s(i); i += 1 }
    }
    buf.toArray
  }

  /** The same recurrence with vocab-sized distributed rounds: per round one
    * explode+aggregate for pair counts, a 1-row argmax collect, and a
    * narrow fold projection applying the merge (checkpointed so plan depth
    * stays constant across rounds). */
  private def distributedLearn(vocab: DataFrame, rounds: Int)
      : (Seq[(Long, String, String, String, Long)], DataFrame) = {
    var cur = vocab
      .selectExpr("word", "freq",
        "transform(sequence(1, length(word)), i -> substring(word, i, 1)) AS syms")
      .localCheckpoint(true)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, String, Long)]
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      // sequence(1, 0) would DESCEND — exclude single-symbol words first
      val best = cur.filter(size(col("syms")) > 1)
        .select(col("freq"), explode(expr(
          "transform(sequence(1, size(syms) - 1), " +
            "i -> struct(element_at(syms, i) AS l, element_at(syms, i + 1) AS r))")).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (a, b, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        out += ((r.toLong, a, b, a + b, c))
        cur = cur.withColumn("syms", mergeFold(col("syms"), a, b)).localCheckpoint(true)
        r += 1
      }
    }
    (out.toSeq, cur)
  }

  /** Greedy merge as a fold: append each symbol, except that `b` arriving
    * while the accumulator top is exactly `a` replaces the top with the
    * merged token. Literals go through `lit` (no SQL-string escaping). */
  private def mergeFold(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) => when(
        size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - lit(1)), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))
}
