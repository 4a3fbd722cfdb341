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
    // a persisted base IS the full logical content (the published
    // version CURRENT points at)
    assert(rows(spark.read.parquet(s"$dir/base-000001")) == logical)
    // the restarted maintainer resumes from it and keeps folding
    val st2 = SegmentedState.fromParquet(spark, dir, Seq("doc_id"))
    assert(rows(st2.view) == logical)
    st2.append(frame(4L -> "d"))
    st2.remove(Seq(1L).toDF("doc_id"))
    assert(rows(st2.view) == Set(3L -> "c", 4L -> "d"),
      "post-restart folds must compose with the persisted base")
    // a second persistence boundary bumps the version; the superseded
    // directory survives ONE more cycle (the r16 snapshot grace window —
    // plans captured before the publish stay executable) and retires at
    // the publish after that
    st2.compactTo(dir)
    assert(SegmentedState.currentVersion(dir) == 2)
    assert(new java.io.File(dir, "base-000001").exists(),
      "the immediately superseded base version survives one publish cycle")
    assert(rows(SegmentedState.fromParquet(spark, dir, Seq("doc_id")).view) ==
      Set(3L -> "c", 4L -> "d"))
    val st3 = SegmentedState.fromParquet(spark, dir, Seq("doc_id"))
    st3.append(frame(5L -> "e"))
    st3.compactTo(dir)
    assert(SegmentedState.currentVersion(dir) == 3)
    assert(!new java.io.File(dir, "base-000001").exists(),
      "superseded base versions retire at the NEXT publish")
    assert(new java.io.File(dir, "base-000002").exists())
  }

  test("compactTo interruption matrix: every crash point leaves a bootable state") {
    // mirrors CdcFeedContractSpec's journal sweep: the publish protocol is
    // write-new-version → atomic CURRENT rename → sweep, so a crash at any
    // point must leave fromParquet reading a COMPLETE base
    val dir = java.nio.file.Files.createTempDirectory("graft-segcrash")
      .toFile.getAbsolutePath + "/base"
    val st = new SegmentedState(frame(1L -> "a", 2L -> "b"), Seq("doc_id"))
    st.compactTo(dir)
    val v1 = rows(SegmentedState.fromParquet(spark, dir, Seq("doc_id")).view)
    assert(v1 == Set(1L -> "a", 2L -> "b"))

    // CRASH 1: died mid-write of the NEXT version (partial directory, no
    // publish) — the half-written version is inert, restart reads v1
    val partial = new java.io.File(dir, "base-000002")
    partial.mkdirs()
    val junk = new java.io.FileOutputStream(new java.io.File(partial, "part-00000.parquet"))
    try junk.write("not parquet".getBytes) finally junk.close()
    assert(rows(SegmentedState.fromParquet(spark, dir, Seq("doc_id")).view) == v1,
      "a half-written unpublished version must be invisible to restart")

    // CRASH 2: died between staging the pointer and renaming it — the
    // stray .CURRENT.tmp is ignored
    val tmp = new java.io.FileOutputStream(new java.io.File(dir, ".CURRENT.tmp"))
    try tmp.write("base-000002\n".getBytes) finally tmp.close()
    assert(rows(SegmentedState.fromParquet(spark, dir, Seq("doc_id")).view) == v1,
      "a staged-but-unrenamed pointer must not publish")

    // the next real publish OVERWRITES the junk version dir, publishes
    // atomically, and sweeps the old one — the producer self-heals
    val st2 = SegmentedState.fromParquet(spark, dir, Seq("doc_id"))
    st2.append(frame(3L -> "c"))
    st2.compactTo(dir)
    assert(SegmentedState.currentVersion(dir) == 2)
    assert(rows(SegmentedState.fromParquet(spark, dir, Seq("doc_id")).view) ==
      Set(1L -> "a", 2L -> "b", 3L -> "c"),
      "a re-run publish must converge over any crash residue")

    // CRASH 3: died AFTER the pointer rename but BEFORE the sweep — both
    // versions on disk, CURRENT already at the new one; restart reads the
    // new version and the next publish retires the leftover
    val resurrected = new java.io.File(dir, "base-000001")
    resurrected.mkdirs() // simulate the unswept superseded dir
    assert(rows(SegmentedState.fromParquet(spark, dir, Seq("doc_id")).view) ==
      Set(1L -> "a", 2L -> "b", 3L -> "c"),
      "an unswept superseded version must not shadow the published one")
    val st3 = SegmentedState.fromParquet(spark, dir, Seq("doc_id"))
    st3.compactTo(dir)
    assert(!resurrected.exists() && SegmentedState.currentVersion(dir) == 3,
      "the next publish must sweep crash leftovers")
  }

  test("fromParquet boots the pre-versioned (bare parquet) layout") {
    val dir = java.nio.file.Files.createTempDirectory("graft-seglegacy")
      .toFile.getAbsolutePath + "/base"
    frame(7L -> "x", 8L -> "y").write.parquet(dir) // r13-style layout
    assert(rows(SegmentedState.fromParquet(spark, dir, Seq("doc_id")).view) ==
      Set(7L -> "x", 8L -> "y"))
  }

  test("bucketed mode: probe equals a view lookup, skips segments, and prunes base partitions at plan time") {
    import org.apache.spark.sql.functions.{col, hash, lit, pmod}
    val b = 16
    // pick keys in PROVABLY different buckets (hash() is Spark's
    // murmur3 — computed, not assumed)
    def bucketOf(k: Long): Int = Seq(k).toDF("doc_id")
      .select(pmod(hash(col("doc_id")), lit(b))).collect()(0).getInt(0)
    val k1 = 100L
    val k2 = (101L to 200L).find(k => bucketOf(k) != bucketOf(k1)).get
    val root = java.nio.file.Files.createTempDirectory("graft-segkb")
      .toFile.getAbsolutePath
    val st = new SegmentedState(frame(1L -> "base"), Seq("doc_id"),
      bucketed = Some((b, root)))
    st.append(frame(k1 -> "a"))
    st.append(frame(k2 -> "c"))
    // view schema stays external (no _kb), content correct
    assert(rows(st.view) == Set(1L -> "base", k1 -> "a", k2 -> "c"))
    // probe == the view restricted to the keys
    val keys = Seq(k1).toDF("doc_id")
    assert(rows(st.probe(keys)) == Set(k1 -> "a"))
    // skip evidence: k2's segment lives in a different bucket and never
    // enters the probe plan (k1's bucket may or may not coincide with
    // the base row's — the SEGMENT count is the deterministic part)
    assert(st.lastProbeSegments <= 1,
      s"probe unioned ${st.lastProbeSegments} segments; expected the k1 segment only")
    // compaction re-roots the base on a _kb-partitioned parquet read:
    // the probe's bucket filter must prune base DIRECTORIES at plan time
    st.compact()
    assert(rows(st.probe(keys)) == Set(k1 -> "a"))
    val plan = st.probe(keys).queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
        l.contains("PartitionFilters: [") && l.contains("_kb") &&
          !l.contains("PartitionFilters: []")),
      "bucketed probe must carry a non-empty _kb partition filter on the base scan")
    // tombstones keep working through the bucketed read path
    st.remove(Seq(k1).toDF("doc_id"))
    assert(rows(st.probe(keys)) == Set.empty[(Long, String)])
    assert(rows(st.view) == Set(1L -> "base", k2 -> "c"))
    // and the logical content survives another compaction
    st.compact()
    assert(rows(st.view) == Set(1L -> "base", k2 -> "c"))
  }

  test("bucketed mode: a view captured before a compaction stays readable after it") {
    // the snapshot contract bucketed mode silently weakened before r16
    // (ADVICE r15): compaction re-roots the base on a parquet read and
    // the publish used to DELETE the superseded base directory — a
    // view/probe plan captured earlier (rooted at the old version) then
    // threw FileNotFoundException on execution. The publish now retires
    // a superseded version only on the NEXT publish (one-cycle grace
    // window, disk bounded at 2× the base).
    val root = java.nio.file.Files.createTempDirectory("graft-segkb2")
      .toFile.getAbsolutePath
    val st = new SegmentedState(frame(1L -> "base"), Seq("doc_id"),
      bucketed = Some((4, root)))
    st.append(frame(2L -> "a"))
    st.compact()
    val snapshot = st.view   // plan rooted at the just-published base
    val probeSnap = st.probe(Seq(2L).toDF("doc_id"))
    st.append(frame(3L -> "b"))
    st.compact() // publishes the next version; the prior one must SURVIVE
    assert(rows(snapshot) == Set(1L -> "base", 2L -> "a"),
      "a pre-compaction view must stay executable after one compaction")
    assert(rows(probeSnap) == Set(2L -> "a"))
    assert(rows(st.view) == Set(1L -> "base", 2L -> "a", 3L -> "b"))
    // the grace window is ONE publish wide: after any further publish
    // only the newest two versions remain on disk (bounded at 2× base)
    st.append(frame(4L -> "c"))
    st.compact()
    def baseDirs = new java.io.File(root).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("base-"))
      .map(_.getName).sorted.toSeq
    val dirs = baseDirs
    val cur = SegmentedState.currentVersion(root)
    assert(dirs.length == 2 &&
      dirs == Seq(f"base-${cur - 1}%06d", f"base-$cur%06d"),
      s"exactly the current and superseded versions may remain, got $dirs")
  }
}
