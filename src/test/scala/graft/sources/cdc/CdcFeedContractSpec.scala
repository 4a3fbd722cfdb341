package graft.sources.cdc

import java.io.{File, FileOutputStream}
import java.nio.charset.StandardCharsets
import java.nio.file.Files

import graft.SparkSpec
import graft.sources.cdc.CdcFeed.CdcEvent

/**
 * Feed-format contract hardening (r13 advisory closures), tested at the
 * codec/commit layer the package exposes to itself:
 *
 *  - slice planning must cover every line for ANY line count (ceil
 *    division used to index past the line-start table for 5/6/9-line
 *    files at maxSlicesPerFile=4 — an IndexOutOfBounds that killed the
 *    plan);
 *  - hand-written CRLF feeds must read each row exactly once (readLine
 *    hid the terminator width, letting a slice overrun into its
 *    neighbor);
 *  - feed order must be numeric on the batch index, not lexicographic
 *    on the padded name (batch-100000 sorts before batch-99999 as a
 *    string);
 *  - a re-executed streaming epoch must publish its delivery ONCE
 *    (driver failure between sink publish and Spark's commit-log write
 *    re-runs the epoch);
 *  - staging temps orphaned by attempts that die without commit/abort
 *    must be swept at the next successful commit.
 */
class CdcFeedContractSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft-cdcfeed-$tag").toFile.getAbsolutePath

  private def events(n: Int): Seq[CdcEvent] =
    (0 until n).map(i => CdcEvent("add", i.toLong, i.toLong, 1000L + i, s"line $i"))

  test("slice planning covers every line for every small line count") {
    // 5, 6 and 9 lines at the default maxSlicesPerFile=4 used to crash
    // planInputPartitions (slice start index past the line table); sweep
    // all counts 1..12 and assert full, duplicate-free coverage
    (1 to 12).foreach { n =>
      val dir = tmpDir(s"lines$n")
      CdcFeed.writeBatch(dir, 0, events(n))
      val got = spark.read.format("graft-cdc").load(dir)
        .select("seq").as[Long].collect().sorted.toSeq
      assert(got == (0L until n.toLong),
        s"$n-line delivery must read back exactly once per line, got $got")
      val slices = CdcFeed.slicesOf(CdcFeed.listBatchFiles(dir).head, 4)
      assert(slices.forall(s => s.endByte > s.startByte),
        s"no empty slices may be planned for $n lines")
    }
  }

  test("hand-written CRLF feed reads each row exactly once across slices") {
    val dir = tmpDir("crlf")
    new File(dir).mkdirs()
    val evs = events(10)
    val crlf = evs.map(e =>
        CdcFeed.formatLine(e.op, e.seq, e.docId, e.tsSec, e.text))
      .mkString.replace("\n", "\r\n")
    val f = new File(dir, "batch-00000.cdc")
    val out = new FileOutputStream(f)
    try out.write(crlf.getBytes(StandardCharsets.US_ASCII)) finally out.close()
    // no sidecar: this is the hand-written path, planner scan fallback
    val df = spark.read.format("graft-cdc").load(dir)
    assert(df.rdd.getNumPartitions >= 2,
      "a 10-line file must still plan as multiple slices")
    val got = df.selectExpr("seq", "text").as[(Long, String)].collect().toSeq.sorted
    assert(got == evs.map(e => (e.seq, e.text)).sorted,
      "CRLF terminators must not duplicate or drop rows at slice boundaries")
  }

  test("feed order is numeric on the batch index beyond the name padding") {
    val dir = tmpDir("order")
    CdcFeed.writeBatch(dir, 100000, events(1).map(_.copy(docId = 100000L)))
    CdcFeed.writeBatch(dir, 99999, events(1).map(_.copy(docId = 99999L)))
    CdcFeed.writeBatch(dir, 7, events(1).map(_.copy(docId = 7L)))
    assert(CdcFeed.listBatchFiles(dir).map(f => new File(f).getName) ==
      Seq("batch-00007.cdc", "batch-99999.cdc", "batch-100000.cdc"),
      "feed order must follow the parsed batch index, not the padded name")
    // stray non-feed names never enter the listing (or the sink's
    // next-index derivation, which shares the same parse)
    new File(dir, "batch-notes.cdc").createNewFile()
    assert(CdcFeed.listBatchFiles(dir).length == 3)
  }

  /** Stage one task temp holding `evs` and return its commit message —
    * what a completed [[CdcDataWriter]] hands the driver. */
  private def stagedCommit(dir: String, evs: Seq[CdcEvent]): CdcTaskCommit = {
    val staging = new File(dir, ".staging")
    staging.mkdirs()
    val t = File.createTempFile("part-0-", ".tmp", staging)
    val out = new FileOutputStream(t)
    try evs.foreach(e => out.write(
      CdcFeed.formatLine(e.op, e.seq, e.docId, e.tsSec, e.text)
        .getBytes(StandardCharsets.US_ASCII)))
    finally out.close()
    CdcTaskCommit(t.getAbsolutePath, 0, evs.length.toLong)
  }

  test("a re-executed streaming epoch publishes its delivery exactly once") {
    val dir = tmpDir("epoch")
    val w = new CdcStreamingWrite(dir, "q1")
    w.commit(41L, Array(stagedCommit(dir, events(3))))
    // driver dies AFTER the sink published but BEFORE Spark's commit log
    // recorded epoch 42 → the restarted query re-executes epoch 42
    w.commit(42L, Array(stagedCommit(dir, events(4).map(e => e.copy(seq = 100 + e.seq)))))
    w.commit(42L, Array(stagedCommit(dir, events(4).map(e => e.copy(seq = 100 + e.seq)))))
    w.commit(43L, Array(stagedCommit(dir, events(2).map(e => e.copy(seq = 200 + e.seq)))))
    val files = CdcFeed.listBatchFiles(dir)
    assert(files.length == 3,
      s"re-executed epoch must no-op, got ${files.map(new File(_).getName)}")
    val seqs = spark.read.format("graft-cdc").load(dir)
      .select("seq").as[Long].collect().toSeq.sorted
    assert(seqs == (Seq(0L, 1L, 2L) ++ (100L to 103L) ++ Seq(200L, 201L)),
      "the delivery must exist once, with no rows double-published")
    assert(files.forall(f => CdcFeed.epochFileOf(new File(f)).isFile),
      "every streaming delivery must carry its epoch marker")
    // the guard is O(1) on purpose: only the LATEST published epoch can
    // legally re-execute (Spark re-runs only the last uncommitted epoch),
    // so it reads the newest file's marker (plus the base's merged one)
    assert(CdcFeed.epochPublished(dir, "q1/43") && !CdcFeed.epochPublished(dir, "q1/44"))
    // retention preserves idempotency: the folded deliveries' epoch
    // markers carry onto the merged base, so a re-executed old epoch
    // still no-ops after compaction
    CdcFeed.compact(dir, 3)
    assert(CdcFeed.listBatchFiles(dir).length == 1)
    assert(Seq("q1/41", "q1/42", "q1/43").forall(CdcFeed.epochPublished(dir, _)) &&
      !CdcFeed.epochPublished(dir, "q1/44"))
    w.commit(42L, Array(stagedCommit(dir, events(4))))
    assert(CdcFeed.listBatchFiles(dir).length == 1,
      "a re-executed epoch must still no-op after retention folded its delivery")
  }

  test("a fresh-checkpoint restart (or second query) restarting epochs at 0 " +
      "does NOT collide with existing markers — its deliveries publish") {
    val dir = tmpDir("epoch_ns")
    // first producer run: epochs 0..1 under query q1
    val w1 = new CdcStreamingWrite(dir, "q1")
    w1.commit(0L, Array(stagedCommit(dir, events(3))))
    w1.commit(1L, Array(stagedCommit(dir, events(2).map(e => e.copy(seq = 10 + e.seq)))))
    assert(CdcFeed.listBatchFiles(dir).length == 2)
    // the ops action the source side explicitly supports: restart the
    // producer with a FRESH checkpoint (new query id, epoch ids restart
    // at 0 — batch-00000 already carries epoch marker 0). A bare-id
    // guard silently no-opped these deliveries: data loss.
    val w2 = new CdcStreamingWrite(dir, "q2")
    w2.commit(0L, Array(stagedCommit(dir, events(4).map(e => e.copy(seq = 20 + e.seq)))))
    w2.commit(1L, Array(stagedCommit(dir, events(1).map(e => e.copy(seq = 30 + e.seq)))))
    assert(CdcFeed.listBatchFiles(dir).length == 4,
      "fresh-checkpoint deliveries must publish, not silently no-op on a bare epoch-id match")
    // while the SAME query's re-executed epoch still no-ops
    w2.commit(1L, Array(stagedCommit(dir, events(1).map(e => e.copy(seq = 30 + e.seq)))))
    assert(CdcFeed.listBatchFiles(dir).length == 4,
      "the same query's re-executed epoch must still no-op")
    val seqs = spark.read.format("graft-cdc").load(dir)
      .select("seq").as[Long].collect().toSeq.sorted
    assert(seqs == (Seq(0L, 1L, 2L) ++ Seq(10L, 11L) ++ (20L to 23L) ++ Seq(30L)),
      "every distinct delivery exactly once across both query incarnations")
  }

  private def catBytes(dir: String): Seq[Byte] =
    CdcFeed.listBatchFiles(dir).flatMap(p =>
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)).toSeq)

  test("compaction folds the prefix into one byte-identical base snapshot") {
    val dir = tmpDir("compact")
    val batches = (0 until 5).map(i => events(3).map(e =>
      e.copy(seq = i * 10L + e.seq, docId = i * 10L + e.docId)))
    batches.zipWithIndex.foreach { case (b, i) => CdcFeed.writeBatch(dir, i, b) }
    val before = catBytes(dir)
    CdcFeed.compact(dir, 3)
    assert(CdcFeed.listBatchFiles(dir).map(new File(_).getName) ==
      Seq("batch-00002.cdc", "batch-00003.cdc", "batch-00004.cdc"),
      "indices < 3 must fold into one base named for the highest folded index")
    assert(catBytes(dir) == before,
      "a fresh consumer must read the folded feed byte-identically end to end")
    val got = spark.read.format("graft-cdc").load(dir)
      .select("seq").as[Long].collect().toSet
    assert(got == batches.flatten.map(_.seq).toSet,
      "every event of the full history must survive, exactly once")
    // idempotent re-run, and a second fold over the base composes
    CdcFeed.compact(dir, 3)
    assert(catBytes(dir) == before)
    CdcFeed.compact(dir, 5)
    assert(CdcFeed.listBatchFiles(dir).map(new File(_).getName) ==
      Seq("batch-00004.cdc") && catBytes(dir) == before,
      "compacting over an existing base must fold it forward")
  }

  test("interrupted compactions recover from the journal at every crash point") {
    def feed(tag: String): String = {
      val dir = tmpDir(tag)
      (0 until 4).foreach(i => CdcFeed.writeBatch(dir, i,
        events(2).map(e => e.copy(seq = i * 10L + e.seq))))
      dir
    }
    val want = catBytes(feed("crash-ref")) // the byte truth, from any copy

    // crash point A: .ready journal written (fully — its rename is
    // atomic), inputs NOT yet retired, base NOT yet published
    val a = feed("crash-a")
    val readyA = new File(a, ".compact-00002.cdc.ready")
    val outA = new FileOutputStream(readyA)
    try CdcFeed.listBatchFiles(a).take(3).foreach(p =>
      outA.write(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))))
    finally outA.close()
    CdcFeed.compact(a, 3)
    assert(CdcFeed.listBatchFiles(a).map(new File(_).getName) ==
      Seq("batch-00002.cdc", "batch-00003.cdc") && catBytes(a) == want,
      "a re-run must finish the journaled fold, byte-identically")

    // crash point B: journal written AND some inputs already retired
    val b = feed("crash-b")
    val readyB = new File(b, ".compact-00002.cdc.ready")
    val outB = new FileOutputStream(readyB)
    try CdcFeed.listBatchFiles(b).take(3).foreach(p =>
      outB.write(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))))
    finally outB.close()
    Seq("batch-00000.cdc", "batch-00000.cdc.idx", "batch-00001.cdc")
      .foreach(n => new File(b, n).delete())
    CdcFeed.compact(b, 3)
    assert(catBytes(b) == want,
      "recovery must not lose the retired inputs' bytes — they live in the journal")

    // crash point C: interrupted mid-BUILD — a partial .building file is
    // garbage by construction and must simply be rebuilt, never published
    val c = feed("crash-c")
    val partial = new FileOutputStream(new File(c, ".compact-00002.cdc.building"))
    try partial.write("add\t0\t".getBytes(StandardCharsets.US_ASCII))
    finally partial.close()
    CdcFeed.compact(c, 3)
    assert(catBytes(c) == want,
      "a partial build must be rebuilt from the intact inputs")
    assert(spark.read.format("graft-cdc").load(c).count() == 8,
      "every original event must survive the rebuilt fold exactly once")
  }

  test("readers fail loudly on a pending compaction journal; producers self-heal") {
    val dir = tmpDir("guard")
    (0 until 3).foreach(i => CdcFeed.writeBatch(dir, i,
      events(2).map(e => e.copy(seq = i * 10L + e.seq))))
    // a compaction died after journaling: the listing may be missing the
    // folded prefix — indistinguishable from a legit compacted feed, so
    // reading must FAIL, not silently serve a partial history
    val ready = new File(dir, ".compact-00001.cdc.ready")
    val out = new FileOutputStream(ready)
    try CdcFeed.listBatchFiles(dir).take(2).foreach(p =>
      out.write(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))))
    finally out.close()
    val ex = intercept[Exception] {
      spark.read.format("graft-cdc").load(dir).count()
    }
    assert(ex.getMessage != null)
    // any producer publish self-heals the journal, after which reads work
    CdcFeed.writeBatch(dir, 3, events(1).map(e => e.copy(seq = 99L)))
    assert(!ready.exists(), "the producer publish must resume the journal")
    assert(spark.read.format("graft-cdc").load(dir).count() == 7)
  }

  test("a checkpoint inside the compacted prefix fails loudly instead of re-ingesting") {
    val dir = tmpDir("inprefix"); val cp = tmpDir("inprefix-cp")
    (0 until 3).foreach(i => CdcFeed.writeBatch(dir, i,
      events(2).map(e => e.copy(seq = i * 10L + e.seq))))
    def run(): Unit = {
      val q = spark.readStream.format("graft-cdc")
        .option("path", dir).option("filesPerTrigger", "1").load()
        .writeStream.outputMode("append")
        .option("checkpointLocation", cp)
        .foreachBatch { (_: org.apache.spark.sql.DataFrame, _: Long) => () }
        .start()
      try q.processAllAvailable() finally q.stop()
    }
    run() // offset now 3
    CdcFeed.writeBatch(dir, 3, events(1).map(e => e.copy(seq = 90L)))
    CdcFeed.writeBatch(dir, 4, events(1).map(e => e.copy(seq = 91L)))
    CdcFeed.compact(dir, 5) // base index 4 — offset 3 is INSIDE the fold
    val ex = intercept[Exception] { run() }
    // the guard's message survives Spark's streaming-exception wrapping
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("compacted prefix")),
      s"expected the in-prefix guard, got: ${messages(ex)}")
  }

  test("index-based offsets survive compaction: a checkpointed consumer resumes past the base") {
    val dir = tmpDir("cpt-feed"); val cp = tmpDir("cpt-cp")
    (0 until 5).foreach(i => CdcFeed.writeBatch(dir, i,
      events(2).map(e => e.copy(seq = i * 10L + e.seq))))
    def consume(): Set[Long] = {
      val seen = scala.collection.mutable.Set[Long]()
      val q = spark.readStream.format("graft-cdc")
        .option("path", dir).option("filesPerTrigger", "1").load()
        .writeStream.outputMode("append")
        .option("checkpointLocation", cp)
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          seen.synchronized { seen ++= b.select("seq").as[Long].collect() }
          ()
        }.start()
      try q.processAllAvailable() finally q.stop()
      seen.toSet
    }
    assert(consume() == (0 until 5).flatMap(i => Seq(i * 10L, i * 10L + 1)).toSet)
    // the feed grows, then retention folds the consumed prefix
    CdcFeed.writeBatch(dir, 5, events(2).map(e => e.copy(seq = 50L + e.seq)))
    CdcFeed.compact(dir, 4)
    assert(consume() == Set(50L, 51L),
      "the restarted consumer must read ONLY the new delivery — never re-read the base")
  }

  test("orphaned staging temps are swept at the next successful commit — " +
      "but only past the grace window (a live attempt's temp is spared)") {
    val dir = tmpDir("sweep")
    val staging = new File(dir, ".staging")
    staging.mkdirs()
    // an attempt that died without commit or abort leaves its temp behind;
    // age it past the grace window (a real orphan's mtime stops moving)
    val orphan = new File(staging, "part-3-deadbeef.tmp")
    val out = new FileOutputStream(orphan)
    try out.write("add\t0\t0\t0\t\n".getBytes(StandardCharsets.US_ASCII))
    finally out.close()
    assert(orphan.setLastModified(
      System.currentTimeMillis() - CdcCommit.StagingSweepGraceMs - 60000))
    // a STILL-RUNNING attempt (recent mtime — e.g. a speculative writer
    // of the next epoch) must NOT be unlinked mid-write: the sweep would
    // otherwise need POSIX unlink-while-open semantics to be harmless
    val live = new File(staging, "part-7-cafebabe.tmp")
    val out2 = new FileOutputStream(live)
    try out2.write("add\t9\t9\t9\t\n".getBytes(StandardCharsets.US_ASCII))
    finally out2.close()
    Seq(("add", 0L, 1L, 100L, "x"))
      .toDF("op", "seq", "doc_id", "sec", "text")
      .selectExpr("op", "seq", "doc_id", "timestamp_seconds(sec) AS ts", "text")
      .write.format("graft-cdc").mode("append").save(dir)
    val left = Option(staging.listFiles()).toSeq.flatten.map(_.getName)
    assert(!left.contains(orphan.getName),
      s"commit must sweep aged orphaned temps, found $left")
    assert(left.contains(live.getName),
      "a young (possibly live) temp must survive the sweep")
    assert(CdcFeed.listBatchFiles(dir).length == 1)
  }
}
