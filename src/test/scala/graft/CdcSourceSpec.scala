package graft

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.{PipelineQueries, StreamingJobs}
import graft.sources.cdc.CdcFeed
import graft.sources.cdc.CdcFeed.CdcEvent

/**
 * The `graft-cdc` DataSourceV2 (format("graft-cdc")) driven end to end:
 * batch read with executor-side byte-range slices, admission-controlled
 * micro-batch pacing (one delivery per trigger), the BM25 and serving
 * lifecycles consuming the real source, and a CHECKPOINT RESTART
 * mid-feed — the capability the Kafka contract (SURVEY §2.1 S2/S4)
 * could never exercise in this sandbox.
 */
class CdcSourceSpec extends SparkSpec {
  import spark.implicits._

  private def tmpDir(tag: String): String =
    Files.createTempDirectory(s"graft-cdc-$tag").toFile.getAbsolutePath

  private def feedOf(dir: String, batches: Seq[Seq[CdcEvent]]): Unit =
    batches.zipWithIndex.foreach { case (b, i) => CdcFeed.writeBatch(dir, i, b) }

  private def docs(): Array[(Long, String)] =
    graft.sources.Tables.documents(spark, sf0001)
      .select("doc_id", "text").as[(Long, String)].collect()

  private def addsOf(c: Seq[(Long, String)], seq0: Long): Seq[CdcEvent] =
    c.zipWithIndex.map { case ((i, t), k) =>
      CdcEvent("add", seq0 + k, i, seq0 + k, t) }

  private def remsOf(ids: Seq[Long], seq0: Long): Seq[CdcEvent] =
    ids.zipWithIndex.map { case (i, k) =>
      CdcEvent("remove", seq0 + k, i, seq0 + k, "") }

  private def stream(dir: String): DataFrame =
    spark.readStream.format("graft-cdc")
      .option("path", dir).option("filesPerTrigger", "1").load()
      .selectExpr("doc_id", "text", "op", "seq")

  test("batch read round-trips the feed through executor-side byte slices") {
    val dir = tmpDir("batch")
    // non-ASCII payload proves the base64 line codec (lines stay ASCII,
    // text round-trips UTF-8); 10 rows per file forces multi-slice plans
    val evs = (0L until 10L).map(i =>
      CdcEvent(if (i % 3 == 0) "remove" else "add", i, i, 1700000000L + i,
        s"döc £$i naïve"))
    feedOf(dir, Seq(evs.take(10), evs.take(4).map(e => e.copy(seq = e.seq + 100))))
    val df = spark.read.format("graft-cdc").option("path", dir).load()
    assert(df.schema == CdcFeed.schema)
    assert(df.count() == 14)
    // slices: 10-line file at maxSlicesPerFile=4 → 4 ranges; 4-line → 4
    assert(df.rdd.getNumPartitions >= 4,
      "a multi-line batch file must split into multiple byte-range slices")
    val got = df.selectExpr("doc_id", "text", "op", "seq",
        "CAST(ts AS LONG) AS sec")
      .as[(Long, String, String, Long, Long)].collect().toSet
    val exp = (evs ++ evs.take(4).map(e => e.copy(seq = e.seq + 100))).map(e =>
      (e.docId, e.text, e.op, e.seq, e.tsSec)).toSet
    assert(got == exp)
  }

  test("batch write publishes one atomic delivery per commit, round-trips") {
    val dir = tmpDir("write")
    def frame(rows: Seq[(String, Long, Long, Long, String)]) =
      rows.toDF("op", "seq", "doc_id", "sec", "text")
        .selectExpr("op", "seq", "doc_id", "timestamp_seconds(sec) AS ts", "text")
    val d1 = Seq(("add", 0L, 1L, 100L, "päy load"), ("add", 1L, 2L, 101L, "b"),
      ("remove", 2L, 3L, 102L, ""))
    val d2 = Seq(("add", 10L, 4L, 200L, "later"))
    frame(d1).write.format("graft-cdc").mode("append").save(dir)
    frame(d2).write.format("graft-cdc").mode("append").save(dir)
    assert(CdcFeed.listBatchFiles(dir).map(new java.io.File(_).getName) ==
      Seq("batch-00000.cdc", "batch-00001.cdc"),
      "each batch write commit must publish exactly one new feed file")
    assert(new java.io.File(dir, ".staging").listFiles().forall(_ => false),
      "committed staging temps must be deleted")
    assert(Seq("batch-00000.cdc.idx", "batch-00001.cdc.idx")
        .forall(n => new java.io.File(dir, n).isFile),
      "sink commits must publish the line-index sidecar too")
    val got = spark.read.format("graft-cdc").load(dir)
      .selectExpr("op", "seq", "doc_id", "CAST(ts AS LONG) AS sec", "text")
      .as[(String, Long, Long, Long, String)].collect().toSet
    assert(got == (d1 ++ d2).toSet,
      "the sink's lines must round-trip through the source codec")
    // the published feed drives a consumer like any hand-written one
    // a mis-shaped producer frame is rejected before any line is encoded
    // (Spark's by-name resolution against the table schema catches a
    // missing column; the WriteBuilder's own require backstops types)
    intercept[Exception] {
      Seq(("add", 1L)).toDF("op", "seq").write
        .format("graft-cdc").mode("append").save(dir)
    }
  }

  test("line-index planning slices exactly like the scan fallback") {
    // a published delivery carries its sidecar index (the planner's
    // O(lines) path); deleting it must not change ONE byte of any
    // slice — hand-written or legacy feeds keep working, and the two
    // planning paths can never diverge silently
    val dir = tmpDir("idx")
    CdcFeed.writeBatch(dir, 0,
      (0L until 10L).map(i => CdcEvent("add", i, i, i, s"payload number $i")))
    val idx = new java.io.File(dir, "batch-00000.cdc.idx")
    assert(idx.isFile, "writeBatch must publish the line index")
    def partitions(): Seq[Seq[Long]] = spark.read.format("graft-cdc").load(dir)
      .select("seq").rdd.glom().collect()
      .map(_.map(_.getLong(0)).toSeq).toSeq
    val viaIndex = partitions()
    assert(idx.delete())
    assert(partitions() == viaIndex && viaIndex.flatten.size == 10,
      "index-planned and scan-planned slices must be identical")
  }

  test("streaming write forwards a feed delivery-for-delivery") {
    // read dir A one delivery per trigger, write dir B one delivery per
    // EPOCH: the feed round-trips through the sink with its delivery
    // boundaries intact — the relay shape (mirror a feed across
    // storage domains) every CDC deployment eventually needs
    val a = tmpDir("relay-a"); val b = tmpDir("relay-b"); val cp = tmpDir("relay-cp")
    val evs = (0L until 9L).map(i =>
      CdcEvent(if (i % 4 == 0) "remove" else "add", i, i, 1000L + i, s"t $i"))
    feedOf(a, evs.grouped(3).toSeq)
    val q = spark.readStream.format("graft-cdc")
      .option("path", a).option("filesPerTrigger", "1").load()
      .writeStream.format("graft-cdc")
      .option("path", b).option("checkpointLocation", cp)
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    assert(CdcFeed.listBatchFiles(b).length == 3,
      "one epoch = one published delivery; boundaries must not merge")
    val read = (d: String) => spark.read.format("graft-cdc").load(d)
      .selectExpr("op", "seq", "doc_id", "CAST(ts AS LONG) AS sec", "text")
      .as[(String, Long, Long, Long, String)].collect().toSet
    assert(read(b) == read(a) && read(a).size == 9,
      "the relayed feed must carry every event bit-identically")
  }

  test("admission control paces one feed file per micro-batch") {
    val dir = tmpDir("pace")
    val evs = (0L until 9L).map(i => CdcEvent("add", i, i, i, s"t $i"))
    feedOf(dir, evs.grouped(3).toSeq)
    val batches = new AtomicInteger(0)
    val seen = scala.collection.mutable.ArrayBuffer[Set[Long]]()
    val q = stream(dir).writeStream.outputMode("append")
      .foreachBatch { (b: DataFrame, _: Long) =>
        batches.incrementAndGet()
        seen.synchronized { seen += b.select("doc_id").as[Long].collect().toSet }
        ()
      }.start()
    try {
      q.processAllAvailable()
      assert(batches.get() == 3,
        s"3 feed files at filesPerTrigger=1 must run as 3 micro-batches, got ${batches.get()}")
      assert(seen.toSeq == Seq(Set(0L, 1L, 2L), Set(3L, 4L, 5L), Set(6L, 7L, 8L)),
        "micro-batch boundaries must be the feed-file boundaries, in feed order")
    } finally q.stop()
  }

  test("BM25 lifecycle through the real source converges to the survivors' index") {
    val dd = docs()
    val chunks = dd.grouped(math.max(dd.length / 3, 1)).toSeq
    val takedown = dd.map(_._1).filter(_ % 10 == 0)
    val dir = tmpDir("bm25")
    feedOf(dir, Seq(
      addsOf(chunks(0), 0),
      addsOf(chunks(1), 1000) ++ remsOf(takedown.filter(chunks(0).map(_._1).contains), 2000),
      addsOf(chunks.drop(2).flatten.toSeq, 3000),
      remsOf(takedown, 5000)))
    @volatile var lastPost: Set[(Long, String, Long)] = Set.empty
    val q = StreamingJobs.runBm25Lifecycle(spark, stream(dir)) { (post, _, _) =>
      lastPost = post.as[(Long, String, Long)].collect().toSet
    }
    try {
      q.processAllAvailable()
      val surv = dd.filterNot(d => takedown.contains(d._1)).toSeq.toDF("doc_id", "text")
      val exp = PipelineQueries.bm25Postings(surv)
        .as[(Long, String, Long)].collect().toSet
      assert(lastPost == exp && exp.nonEmpty,
        "postings maintained through graft-cdc must equal a from-scratch survivors' index")
    } finally q.stop()
  }

  test("checkpoint restart mid-feed resumes from the committed offset") {
    val dd = docs()
    val chunks = dd.grouped(math.max(dd.length / 4, 1)).toSeq
    val takedown = chunks(1).map(_._1).filter(_ % 5 == 0)
    val dir = tmpDir("restart-feed")
    val cp = tmpDir("restart-cp")
    // phase 1: two deliveries on disk
    CdcFeed.writeBatch(dir, 0, addsOf(chunks(0), 0))
    CdcFeed.writeBatch(dir, 1, addsOf(chunks(1), 1000))
    @volatile var st: Option[Set[(Long, String, Long)]] = None
    val run1Batches = new AtomicInteger(0)
    // production persistence: after each delivery the maintained views
    // land in parquet — EXACTLY what a restarted maintainer boots from
    // (no driver collect anywhere on the restart path)
    val postP = tmpDir("restart-post"); val idsP = tmpDir("restart-ids")
    val q1 = StreamingJobs.runBm25Lifecycle(spark, stream(dir),
        checkpoint = Some(cp)) { (post, _, _) =>
      run1Batches.incrementAndGet()
      post.write.mode("overwrite").parquet(postP)
      post.select("doc_id").distinct().write.mode("overwrite").parquet(idsP)
      st = Some(post.as[(Long, String, Long)].collect().toSet)
    }
    try { q1.processAllAvailable() } finally q1.stop()
    assert(run1Batches.get() == 2)

    // phase 2: the feed grows while the job is DOWN
    CdcFeed.writeBatch(dir, 2,
      addsOf(chunks.drop(2).flatten.toSeq, 2000) ++ remsOf(takedown, 3000))
    val run2Batches = new AtomicInteger(0)
    // restart: same checkpoint (source offset resumes — committed files
    // are NOT re-read), maintained state bootstrapped from the PERSISTED
    // parquet (through the one-split-scan guard)
    val q2 = StreamingJobs.runBm25Lifecycle(spark, stream(dir),
        initialPostings = Some(graft.ops.Parallelism.ensureMin(
          spark.read.parquet(postP))),
        initialIds = Some(graft.ops.Parallelism.ensureMin(
          spark.read.parquet(idsP))),
        checkpoint = Some(cp)) { (post, _, _) =>
      run2Batches.incrementAndGet()
      st = Some(post.as[(Long, String, Long)].collect().toSet)
    }
    try { q2.processAllAvailable() } finally q2.stop()
    assert(run2Batches.get() == 1,
      s"the restarted run must process ONLY the one new delivery, ran ${run2Batches.get()} batches")
    val surv = dd.filterNot(d => takedown.contains(d._1)).toSeq.toDF("doc_id", "text")
    val exp = PipelineQueries.bm25Postings(surv)
      .as[(Long, String, Long)].collect().toSet
    assert(st.get == exp && exp.nonEmpty,
      "stop + restart through the checkpoint must converge to the uninterrupted result")
  }

  test("the full corpus pipeline on one CDC feed: manifest + both retrievers converge") {
    // ONE graft-cdc feed drives runCorpusPipeline: per delivery the
    // press maintains clusters + the keep/split manifest while the
    // serving folds maintain the BM25 triple + the dense store. Final
    // survivors are the takedown query's residue class, so BOTH truths
    // are checkable: manifest == batch corpus_manifest over survivors,
    // fusion over the maintained quadruple == hybrid_rrf_takedown.
    val td = PipelineQueries.Bm25TakedownMod
    val dd = docs()
    val chunks = dd.grouped(math.max(dd.length / 3, 1)).toSeq
    val dir = tmpDir("plant")
    feedOf(dir, Seq(
      addsOf(chunks(0), 0),
      addsOf(chunks(1), 1000) ++
        remsOf(chunks(0).map(_._1).filter(_ % td == 0), 2000),
      addsOf(chunks.drop(2).flatten.toSeq, 3000),
      remsOf(dd.map(_._1).filter(_ % td == 0), 5000)))
    @volatile var press: Option[StreamingJobs.PressState] = None
    @volatile var serve: Option[(DataFrame, DataFrame, DataFrame, DataFrame)] = None
    val q = StreamingJobs.runCorpusPipeline(spark, stream(dir),
        graft.sources.Tables.embeddings(spark, sf0001)) { (st, p, dl, df, s) =>
      press = Some(st); serve = Some((p, dl, df, s))
    }
    try {
      q.processAllAvailable()
      val surviving = dd.filter(_._1 % td != 0).toSeq
      val man = press.get.manifest
        .select("doc_id", "cluster_id", "quality", "rep_pass", "canonical",
          "keep", "split")
        .as[(Long, Long, Double, Boolean, Boolean, Boolean, String)].collect().toSet
      val expMan = PipelineQueries.corpusManifestOf(surviving.toDF("doc_id", "text"))
        .select("doc_id", "cluster_id", "quality", "rep_pass", "canonical",
          "keep", "split")
        .as[(Long, Long, Double, Boolean, Boolean, Boolean, String)].collect().toSet
      assert(man == expMan && expMan.nonEmpty,
        "the plant's manifest must equal the batch manifest of the survivors")
      val (post, dl, df, store) = serve.get
      val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
      val lex = PipelineQueries.rrfLexRank(
        PipelineQueries.bm25Rank(post, dl, df, stats, 8, 21), 20)
      val dns = graft.ops.SimilarityOps.cosineTopKOfVecs(store, "vec_id < 8", 20)
        .selectExpr("q_id", "c_id AS doc_id", "rn AS rank_dense")
      val fused = PipelineQueries.rrfFuse(lex, dns, 5)
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
      val expected = PipelineQueries.hybridRrfTakedown(spark, sf0001)
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
      assert(fused == expected && expected.nonEmpty,
        "the plant's maintained retrievers must serve the survivors' fusion")
    } finally q.stop()
  }

  test("serving lifecycle through the real source equals the takedown fusion") {
    val td = PipelineQueries.Bm25TakedownMod
    val dd = docs()
    val chunks = dd.grouped(math.max(dd.length / 3, 1)).toSeq
    val dir = tmpDir("serve")
    feedOf(dir, Seq(
      addsOf(chunks(0), 0),
      addsOf(chunks(1), 1000) ++
        remsOf(chunks(0).map(_._1).filter(_ % td == 0), 2000),
      addsOf(chunks.drop(2).flatten.toSeq, 3000),
      remsOf(dd.map(_._1).filter(_ % td == 0), 5000)))
    @volatile var st: Option[(DataFrame, DataFrame, DataFrame, DataFrame)] = None
    val q = StreamingJobs.runServingLifecycle(spark, stream(dir),
        graft.sources.Tables.embeddings(spark, sf0001)) { (p, dl, df, s) =>
      st = Some((p, dl, df, s))
    }
    try {
      q.processAllAvailable()
      val (post, dl, df, store) = st.get
      val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
      val lex = PipelineQueries.rrfLexRank(
        PipelineQueries.bm25Rank(post, dl, df, stats, 8, 21), 20)
      val dns = graft.ops.SimilarityOps.cosineTopKOfVecs(store, "vec_id < 8", 20)
        .selectExpr("q_id", "c_id AS doc_id", "rn AS rank_dense")
      val fused = PipelineQueries.rrfFuse(lex, dns, 5)
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
      val expected = PipelineQueries.hybridRrfTakedown(spark, sf0001)
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSet
      assert(fused == expected && expected.nonEmpty,
        "serving maintained through graft-cdc must equal the from-scratch survivors' fusion")
    } finally q.stop()
  }
}
