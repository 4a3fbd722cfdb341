package graft

import org.apache.spark.sql.DataFrame

import graft.streaming.SegmentedState

/** The LSM-style maintained table under the exact operation orders the
  * lifecycle contract produces: remove-then-re-add across batches
  * (content updates), within-batch remove+append (the press's touched-
  * cluster rebuild), tombstones over never-appended keys, and the
  * geometric compaction's physical-equals-logical invariant. */
class SegmentedStateSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: DataFrame): Set[(Long, String)] =
    df.as[(Long, String)].collect().toSet

  private def frame(xs: (Long, String)*): DataFrame = xs.toDF("doc_id", "v")

  test("append/remove/re-add sequence resolves in operation order") {
    val st = new SegmentedState(frame(1L -> "a", 2L -> "b"), Seq("doc_id"))
    assert(rows(st.view) == Set(1L -> "a", 2L -> "b"))
    st.append(frame(3L -> "c"))
    st.remove(frame(2L -> "").select("doc_id").toDF("doc_id"))
    assert(rows(st.view) == Set(1L -> "a", 3L -> "c"))
    // the content-update contract: remove-then-add across batches — the
    // re-added row must NOT be masked by the older tombstone
    st.append(frame(2L -> "b2"))
    assert(rows(st.view) == Set(1L -> "a", 2L -> "b2", 3L -> "c"),
      "a tombstone masks only rows appended before it")
    // and a NEWER tombstone kills the re-add
    st.remove(frame(2L -> "").select("doc_id").toDF("doc_id"))
    assert(rows(st.view) == Set(1L -> "a", 3L -> "c"))
  }

  test("within-batch rebuild (remove touched + append rebuilt) upserts") {
    val st = new SegmentedState(
      frame(10L -> "old10", 11L -> "old11", 12L -> "keep"), Seq("doc_id"))
    // the press idiom: retire the touched keys, append their rebuilt rows
    st.remove(Seq(10L, 11L).toDF("doc_id"))
    st.append(frame(10L -> "new10", 11L -> "new11"))
    assert(rows(st.view) == Set(10L -> "new10", 11L -> "new11", 12L -> "keep"))
  }

  test("removing a never-appended key is a harmless no-op mask") {
    val st = new SegmentedState(frame(1L -> "a"), Seq("doc_id"))
    st.remove(Seq(99L).toDF("doc_id"))
    assert(rows(st.view) == Set(1L -> "a"))
    st.append(frame(99L -> "late"))
    assert(rows(st.view) == Set(1L -> "a", 99L -> "late"),
      "a later append of a tombstoned key must not be masked")
  }

  test("a returned view is an immutable snapshot") {
    val st = new SegmentedState(frame(1L -> "a"), Seq("doc_id"))
    val snap = st.view
    st.append(frame(2L -> "b"))
    st.remove(Seq(1L).toDF("doc_id"))
    assert(rows(snap) == Set(1L -> "a"), "later ops must not leak into a snapshot")
    assert(rows(st.view) == Set(2L -> "b"))
  }

  test("compaction (forced and geometric) preserves the logical content") {
    val st = new SegmentedState(frame(), Seq("doc_id"))
    val reference = scala.collection.mutable.Map[Long, String]()
    val rnd = new scala.util.Random(7)
    (0 until 24).foreach { i =>
      val adds = (0 until 5).map(j => (i * 10L + j, s"v$i-$j"))
      adds.foreach { case (k, v) => reference(k) = v }
      st.append(frame(adds: _*))
      if (i % 3 == 2) {
        val victims = rnd.shuffle(reference.keys.toSeq).take(4)
        victims.foreach(reference.remove)
        st.remove(victims.toDF("doc_id"))
      }
      // 24 appends at MaxSegments=8 forces promotions and geometric passes
      assert(rows(st.view) == reference.toSet.map((kv: (Long, String)) => kv),
        s"after batch $i the view must equal the reference fold")
    }
    st.compact()
    assert(rows(st.view) == reference.toSet.map((kv: (Long, String)) => kv),
      "a forced compaction must be a logical no-op")
  }

  test("compactTo/fromParquet round-trips the maintained state across a restart") {
    val dir = java.nio.file.Files.createTempDirectory("graft-segstate")
      .toFile.getAbsolutePath + "/base"
    val st = new SegmentedState(frame(1L -> "a", 2L -> "b"), Seq("doc_id"))
    st.append(frame(3L -> "c"))
    st.remove(Seq(2L).toDF("doc_id"))
    val logical = rows(st.view)
    st.compactTo(dir)
    // a persisted base IS the full logical content
    assert(rows(spark.read.parquet(dir)) == logical)
    // the restarted maintainer resumes from it and keeps folding
    val st2 = SegmentedState.fromParquet(spark, dir, Seq("doc_id"))
    assert(rows(st2.view) == logical)
    st2.append(frame(4L -> "d"))
    st2.remove(Seq(1L).toDF("doc_id"))
    assert(rows(st2.view) == Set(3L -> "c", 4L -> "d"),
      "post-restart folds must compose with the persisted base")
  }
}
