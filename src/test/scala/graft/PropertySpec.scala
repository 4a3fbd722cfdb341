package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.cep.Cep
import graft.streaming.Detectors
import graft.streaming.Detectors.{KeyedEvent, TxEvent}

/**
 * Property-based invariants (SURVEY.md §5): random event streams from
 * ScalaCheck generators, engine-level invariants that must hold for every
 * interleaving.
 */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val genEvents: Gen[List[KeyedEvent]] = for {
    n <- Gen.choose(50, 200)
    evs <- Gen.listOfN(n, for {
      key <- Gen.choose(0L, 4L)
      ts <- Gen.choose(1000L, 2500L)
      hit <- Gen.prob(0.55)
    } yield (key, ts, hit))
  } yield evs.zipWithIndex.map { case ((k, t, h), i) => KeyedEvent(k, t, i.toLong, h) }

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, org.scalacheck.rng.Seed(i.toLong)))

  test("property: spanScrub invariants on random corpora") {
    import graft.ops.DedupOps
    val genDocs: Gen[List[(Long, String)]] = for {
      n <- Gen.choose(4, 12)
      docs <- Gen.listOfN(n, for {
        len <- Gen.choose(1, 20)
        toks <- Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d", "e"))
      } yield toks.mkString(" "))
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    samples(genDocs, 5).foreach { docs =>
      val df = docs.toDF("doc_id", "text")
      val out = DedupOps.spanScrub(df, "text", 3)
        .select("doc_id", "n_tok", "n_removed", "text_clean")
        .as[(Long, Long, Long, String)].collect()
      val byId = docs.toMap
      assert(out.length == docs.size)
      out.foreach { case (id, nTok, nRemoved, clean) =>
        val orig = byId(id).split(" ").filter(_.nonEmpty)
        val kept = clean.split(" ").filter(_.nonEmpty)
        // token accounting is exact and clean is a subsequence of the original
        assert(nTok == orig.length && kept.length == nTok - nRemoved)
        var j = 0
        kept.foreach { t => j = orig.indexOf(t, j); assert(j >= 0); j += 1 }
        // docs shorter than the span width are never modified
        if (orig.length < 3) assert(nRemoved == 0L && kept.sameElements(orig))
      }
    }
  }

  test("property: cep-lite(n=2) ≡ lag formulation for random streams") {
    samples(genEvents, 5).foreach { evs =>
      val df = evs.toDF()
      val lag = Cep.adjacentHits(df, col("key"), col("tsSec"), col("id"),
        col("hit"), 120).select("key", "first_id", "last_id").as[(Long, Long, Long)]
        .collect().toSet
      val det = Detectors.consecutive(evs.toDS(), 2, 120, streaming = false)
        .select("key", "first_id", "last_id").as[(Long, Long, Long)]
        .collect().toSet
      assert(lag == det)
    }
  }

  test("property: reconcile partitions pays into matched ∪ unmatched exactly") {
    val genTx: Gen[List[TxEvent]] = genEvents.map(_.map(e =>
      TxEvent(e.key, e.tsSec, e.id, e.hit)))
    samples(genTx, 5).foreach { evs =>
      val out = Detectors.reconcile(evs.toDS(), 5, 3, streaming = false).collect()
      val pays = evs.count(_.hit)
      val matched = out.count(_.tag == "matched")
      val unmatchedPays = out.count(_.tag == "unmatched_pay")
      assert(matched + unmatchedPays == pays,
        s"pays=$pays matched=$matched unmatched=$unmatchedPays")
      val receipts = evs.count(!_.hit)
      assert(matched + out.count(_.tag == "unmatched_receipt") == receipts)
      // no pay/receipt consumed twice
      val payIds = out.filter(o => o.tag == "matched" || o.tag == "unmatched_pay")
        .map(_.pay_id)
      assert(payIds.distinct.length == payIds.length)
    }
  }

  test("property: top-N count never exceeds its window total") {
    samples(genEvents, 3).foreach { evs =>
      val df = evs.toDF().withColumn("ts", timestamp_seconds(col("tsSec")))
      val counts = graft.ops.WindowOps.epochWindow(
        graft.ops.WindowOps.slidingCount(df, col("ts"), "10 minutes", "5 minutes", col("key")))
      val ranked = graft.ops.RankOps.topN(counts, 3, Seq(col("window_start")),
        Seq(col("cnt").desc, col("key").asc))
      val totals = counts.groupBy("window_start").agg(sum("cnt").as("total"))
      val bad = ranked.join(totals, "window_start").filter(col("cnt") > col("total"))
      assert(bad.count() == 0)
      // rank is dense per window starting at 1
      val rns = ranked.groupBy("window_start").agg(min("rn").as("mn"))
        .filter(col("mn") =!= 1L)
      assert(rns.count() == 0)
    }
  }
}
