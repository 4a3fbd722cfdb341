package graft

import graft.streaming.IngestBloom

/**
 * Unit contract of the bloom-routed idempotency filter: no false
 * negatives ever (a bloom property), exact truth on the maybe path
 * (re-delivery drops, remove-then-re-add re-admits), empty-state and
 * empty-delivery bootstraps, and literal-only routing (the returned
 * frame is stable under lazy re-evaluation after later admissions).
 */
class IngestBloomSpec extends SparkSpec {
  import spark.implicits._

  test("fresh keys admit; replayed keys drop; remove-then-re-add re-admits") {
    val ids0 = Seq.empty[Long].toDF("doc_id")
    val b = new IngestBloom(ids0, "doc_id", 1L << 16, 0.001)
    // batch 1: all fresh against empty state
    var view = Seq.empty[Long].toDF("doc_id").localCheckpoint()
    val d1 = b.admitFresh(Seq((1L, "a"), (2L, "b"), (4L, "hi")).toDF("doc_id", "text"),
      IngestBloom.viewProbe(view, "doc_id")).localCheckpoint()
    assert(d1.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 4L))
    view = view.unionByName(d1.select("doc_id")).localCheckpoint()
    // batch 2: re-delivery of 1 must drop (maybe path, present in view);
    // keep the UNCHECKPOINTED frame to re-evaluate after later batches
    val d2lazy = b.admitFresh(Seq((1L, "a"), (3L, "c")).toDF("doc_id", "text"),
      IngestBloom.viewProbe(view, "doc_id"))
    assert(d2lazy.select("doc_id").as[Long].collect().toSeq == Seq(3L),
      s"re-delivered key must drop, fresh key must admit")
    view = view.unionByName(d2lazy.select("doc_id")).localCheckpoint()
    // batch 3: remove 2 from the view, then re-add → must re-admit
    view = view.filter("doc_id <> 2").localCheckpoint()
    val d3 = b.admitFresh(Seq((2L, "b2"), (4L, "hi")).toDF("doc_id", "text"),
      IngestBloom.viewProbe(view, "doc_id")).localCheckpoint()
    assert(d3.select("doc_id").as[Long].collect().toSeq == Seq(2L),
      "a removed-then-re-added key is bloom-positive but absent from the view: re-admit")
    // the batch-2 frame re-evaluates to the same rows (literal routing:
    // later admissions cannot leak into an earlier batch's plan)
    assert(d2lazy.select("doc_id").as[Long].collect().toSeq == Seq(3L),
      "routing must be immutable under lazy re-evaluation")
  }

  test("empty deliveries and non-empty bootstrap state") {
    val ids0 = Seq(10L, 11L).toDF("doc_id").localCheckpoint()
    val b = new IngestBloom(ids0, "doc_id", 1L << 16, 0.001)
    assert(b.admitFresh(Seq.empty[(Long, String)].toDF("doc_id", "text"),
      IngestBloom.viewProbe(ids0, "doc_id"))
      .count() == 0L) // heartbeat delivery: no keys, no probe
    val d = b.admitFresh(Seq((10L, "x"), (12L, "y")).toDF("doc_id", "text"),
      IngestBloom.viewProbe(ids0, "doc_id")).localCheckpoint()
    assert(d.select("doc_id").as[Long].collect().toSeq == Seq(12L),
      "bootstrap ids must be bloom-known and view-present")
  }
}
