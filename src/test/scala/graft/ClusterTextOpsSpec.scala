package graft

import org.apache.spark.sql.functions._

import graft.ops.{ClusterOps, DedupOps, TextOps}
import graft.queries.PipelineQueries
import graft.sources.Tables

/** Connected-components dedup resolution + PII scrubbing. */
class ClusterTextOpsSpec extends SparkSpec {
  import spark.implicits._

  test("connectedComponents labels a multi-hop chain by its component min") {
    // 1-2-3-4-5 is a 4-hop chain (forces >1 propagation round), 10-11 a
    // pair, 20-21-22 a triangle; 99 appears in no pair
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L),
      (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)
    ).toDF("a", "b")
    val got = ClusterOps.connectedComponents(pairs, "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("star-contraction CC equals propagation CC on random graphs — " +
      "local fast path AND distributed rounds") {
    val rnd = new scala.util.Random(17)
    for (trial <- 0 until 3) {
      val n = 30 + trial * 10
      val pairs = (0 until 45).map { _ =>
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong)
      }.filter { case (a, b) => a != b }.toDF("a", "b")
      val prop = ClusterOps.connectedComponents(pairs, "a", "b")
        .as[(Long, Long)].collect().toSet
      // default: every test-sized graph takes the driver-local union-find
      val local = ClusterOps.connectedComponentsStar(pairs, "a", "b")
        .as[(Long, Long)].collect().toSet
      // localMaxEdges = 0 forces the distributed large/small-star rounds,
      // keeping them covered now that the local path owns small graphs
      val dist = ClusterOps.connectedComponentsStar(pairs, "a", "b",
          localMaxEdges = 0)
        .as[(Long, Long)].collect().toSet
      assert(local == prop, s"trial $trial: local star and propagation differ")
      assert(dist == prop, s"trial $trial: distributed star and propagation differ")
    }
  }

  test("star-contraction CC converges on a chain propagation cannot") {
    // a 64-hop path: diameter 64, so min-label propagation needs ~64
    // rounds and fails fast at maxIter=10; star contraction is
    // diameter-independent (O(log^2 n) rounds) and labels the whole
    // chain by its minimum inside the same budget — forced onto the
    // DISTRIBUTED rounds (localMaxEdges = 0), since the diameter argument
    // is about the round recurrence, not the trivial local path
    val chain = (0L until 64L).map(i => (i, i + 1)).toDF("a", "b")
    intercept[IllegalArgumentException] {
      ClusterOps.connectedComponents(chain, "a", "b", maxIter = 10).collect()
    }
    val got = ClusterOps.connectedComponentsStar(chain, "a", "b", maxIter = 10,
        localMaxEdges = 0)
      .as[(Long, Long)].collect().toMap
    assert(got == (0L to 64L).map(_ -> 0L).toMap)
  }

  test("connectedComponents fails fast when maxIter is too small") {
    val chain = (1L until 8L).map(i => (i, i + 1)).toDF("a", "b")
    intercept[IllegalArgumentException] {
      ClusterOps.connectedComponents(chain, "a", "b", maxIter = 1).collect()
    }
  }

  test("dedup_clusters covers every doc; clusters agree with minhash pairs") {
    val docs = Tables.documents(spark, sf0001)
    val out = PipelineQueries.dedupClusters(spark, sf0001)
    assert(out.count() == docs.count())
    // every verified near-dup pair must land in the same cluster
    val cluster = out.select("doc_id", "cluster_id")
      .as[(Long, Long)].collect().toMap
    val pairs = DedupOps.minhashPairs(
        DedupOps.allShingles(docs, "text", 3), 16, 4, 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) => assert(cluster(a) == cluster(b)) }
    // canonical = cluster minimum, exactly one per cluster
    val canonical = out.filter(col("is_canonical"))
      .select("cluster_id").as[Long].collect()
    assert(canonical.length == canonical.distinct.length)
    assert(cluster.values.toSet == canonical.toSet)
  }

  test("train_split_safe never splits a near-dup cluster across splits") {
    val out = PipelineQueries.trainSplitSafe(spark, sf0001)
      .select("doc_id", "cluster_id", "split")
      .as[(Long, Long, String)].collect()
    assert(out.length == Tables.documents(spark, sf0001).count())
    // the leakage guarantee: one split per cluster
    out.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).distinct.length == 1)
    }
    // and the per-doc split does NOT have this property on the same data
    // (the clusters are real, so doc-hash bucketing must straddle at least
    // one of them — the bug this query exists to fix)
    val docSplit = PipelineQueries.trainSplit(spark, sf0001)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val straddled = out.groupBy(_._2).exists { case (_, rows) =>
      rows.length > 1 && rows.map(r => docSplit(r._1)).distinct.length > 1
    }
    assert(straddled, "expected at least one multi-doc cluster straddling " +
      "the per-doc split (sanity of the leakage scenario)")
  }

  test("incrementalDedup classifies exact, near, and new deliveries") {
    val words = (1 to 40).map(i => s"w$i").mkString(" ")
    val nearWords = ((1 to 39).map(i => s"w$i") :+ "CHANGED").mkString(" ")
    val base = Seq((10L, words), (11L, "completely different text here"))
      .toDF("doc_id", "text")
    val delivery = Seq(
      (100L, words),      // exact copy of base 10
      (101L, nearWords),  // 39/40 words shared with base 10
      (102L, "nothing like anything in the base corpus at all"))
      .toDF("doc_id", "text")
    val out = graft.ops.DedupOps
      .incrementalDedup(base, delivery, "text", 3, 16, 4, 0.5)
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(100L) == (("exact", 10L)))
    assert(out(101L) == (("near", 10L)))
    assert(out(102L) == (("new", -1L)))
  }

  test("redactPii counts and replaces emails, IPs, and phone runs") {
    val df = Seq(
      "contact bob@example.com or +1 555 123 4567 now",
      "server at 10.0.0.1 and 192.168.1.255 up",
      "no pii here at all",
      "alice.smith+tag@sub.domain.org again bob@example.com"
    ).toDF("text")
    val got = TextOps.redactPii(df, "text")
      .select("n_emails", "n_ips", "n_phones", "text_redacted")
      .as[(Long, Long, Long, String)].collect()
    assert(got(0) == ((1L, 0L, 1L, "contact <EMAIL> or <PHONE> now")))
    assert(got(1) == ((0L, 2L, 0L, "server at <IP> and <IP> up")))
    assert(got(2) == ((0L, 0L, 0L, "no pii here at all")))
    assert(got(3) == ((2L, 0L, 0L, "<EMAIL> again <EMAIL>")))
  }

  test("seq_pack bins are contiguous within each shard") {
    val rows = PipelineQueries.seqPack(spark, sf0001)
      .select("shard", "tok_start", "n_tok", "bin_first", "bin_last")
      .as[(Long, Long, Long, Long, Long)].collect()
    rows.groupBy(_._1).foreach { case (_, docs) =>
      val sorted = docs.sortBy(_._2)
      // stream offsets tile the shard exactly: next start = prev start + len
      sorted.sliding(2).foreach {
        case Array((_, s1, n1, _, _), (_, s2, _, _, _)) => assert(s1 + n1 == s2)
        case _ =>
      }
      sorted.foreach { case (_, s, n, bf, bl) =>
        assert(bf == s / 512 && bl == (s + n - 1) / 512 && bf <= bl)
      }
    }
    // the shard count is the parallelism knob: a wider packing must keep
    // the same per-doc token counts and the same per-shard tiling
    val wide = PipelineQueries.seqPack(spark, sf0001, shards = 32)
      .select("shard", "tok_start", "n_tok")
      .as[(Long, Long, Long)].collect()
    assert(wide.map(_._1).distinct.length > 8)
    assert(wide.map(_._3).sum == rows.map(_._3).sum) // token mass invariant
    wide.groupBy(_._1).foreach { case (_, docs) =>
      docs.sortBy(_._2).sliding(2).foreach {
        case Array((_, s1, n1), (_, s2, _)) => assert(s1 + n1 == s2)
        case _ =>
      }
    }
  }

  test("domain_mix upsamples minority langs with bounded integer repeats") {
    val out = PipelineQueries.domainMix(spark, sf0001)
      .select("lang", "repeats", "copy_ix").as[(String, Long, Long)].collect()
    assert(out.forall { case (_, r, c) => r >= 1 && r <= 4 && c >= 1 && c <= r })
    val perLang = out.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    assert(perLang.values.max > 1, "skewed corpus should trigger upsampling")
    // majority language is never repeated
    val counts = Tables.documents(spark, sf0001)
      .groupBy("lang").count().as[(String, Long)].collect()
    val majority = counts.maxBy(_._2)._1
    assert(perLang(majority) == 1)
  }

  test("incrementalClusters merges base clusters through delivery chains") {
    // existing base state: {1,2,3} labeled 1, {10,11} labeled 10, and
    // singleton 20. New delivery {30,31,32}: 30-31 inside the delivery,
    // 31 hits base doc 3, 30 hits base doc 10 — so clusters 1 and 10 must
    // MERGE through the delivery chain 3—31—30—10; 32 and 20 stay alone.
    val baseAssign = Seq(
      (1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L), (20L, 20L)
    ).toDF("doc_id", "cluster_id")
    val delivery = Seq(30L, 31L, 32L).toDF("doc_id")
    val dd = Seq((30L, 31L)).toDF("doc_a", "doc_b")
    val db = Seq((31L, 3L), (30L, 10L)).toDF("doc_id", "base_id")
    val got = ClusterOps.incrementalClusters(baseAssign, delivery, dd, db)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 1L, 11L -> 1L,
      30L -> 1L, 31L -> 1L, 20L -> 20L, 32L -> 32L))
    // the delta graph never contains untouched base docs: only delivery
    // ids and touched cluster REPS may appear in the rewired edge set
    val touched = got.keySet -- Set(2L, 3L, 11L, 20L, 32L)
    assert(touched.forall(got.keySet.contains)) // shape sanity
  }

  test("dedup_clusters_delta equals the from-scratch resolution") {
    // splitting the band join into base/delivery cross-parts loses no
    // pair, so incremental maintenance must reproduce dedup_clusters
    // row for row — the same invariant the shared oracle enforces at the
    // driver gate, asserted here directly
    val full = PipelineQueries.dedupClusters(spark, sf0001)
      .as[(Long, Long, Boolean, Long)].collect().toSet
    val delta = PipelineQueries.dedupClustersDelta(spark, sf0001)
      .as[(Long, Long, Boolean, Long)].collect().toSet
    assert(delta == full && full.nonEmpty)
  }

  test("multi-delivery fold converges to the from-scratch resolution") {
    // the production lifecycle: deliveries arrive one at a time, each is
    // folded into the accumulated assignment while the signature index
    // accretes - after ALL deliveries the maintained assignment must equal
    // resolving the whole corpus from scratch, whatever the arrival order
    // interleaves
    import org.apache.spark.sql.DataFrame
    val docs = Tables.documents(spark, sf0001)
    val deliveries: Seq[DataFrame] =
      (0 until 3).map(r => docs.filter(col("doc_id") % 3 === r))
    val emptyAssign = Seq.empty[(Long, Long)].toDF("doc_id", "cluster_id")
    var sets = DedupOps.setsOfShingles(
      DedupOps.allShingles(docs.limit(0), "text", 3)).localCheckpoint()
    var assign = emptyAssign
    deliveries.foreach { d =>
      val dSets = DedupOps.setsOfShingles(
        DedupOps.allShingles(d, "text", 3)).localCheckpoint()
      val dd = DedupOps.minhashPairsOfSets(dSets, 16, 4, 0.5)
      val db = DedupOps.crossNearPairsOfSets(sets, dSets, 16, 4, 0.5)
      assign = ClusterOps.incrementalClusters(
        assign, d.select("doc_id"), dd, db).localCheckpoint()
      sets = sets.union(dSets).localCheckpoint() // the accreting index
    }
    val folded = assign.as[(Long, Long)].collect().toMap
    val full = PipelineQueries.dedupClusters(spark, sf0001)
      .select("doc_id", "cluster_id").as[(Long, Long)].collect().toMap
    assert(folded == full && full.nonEmpty)
  }

  test("removeFromClusters splits a cluster when its bridge doc is removed") {
    // cluster 1 = chain 1-2-3-4-5 (3 is the only bridge), cluster 10 =
    // pair 10-11, singleton 20. Removing 3 must SPLIT cluster 1 into
    // {1,2} and {4,5}; removing 11 shrinks 10 to a singleton; 20 and the
    // untouched docs pass through verbatim.
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L)
    ).toDF("doc_a", "doc_b")
    val assign = Seq(
      (1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (5L, 1L),
      (10L, 10L), (11L, 10L), (20L, 20L)
    ).toDF("doc_id", "cluster_id")
    val removed = Seq(3L, 11L).toDF("doc_id")
    val got = ClusterOps.removeFromClusters(
      assign, pairs, "doc_a", "doc_b", removed)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(
      1L -> 1L, 2L -> 1L, 4L -> 4L, 5L -> 4L, 10L -> 10L, 20L -> 20L))
  }

  test("delta-reported CC folds: applying (retired, rows) reproduces the full fold") {
    // the delta variants move REPORTING from full-frame to
    // (tombstoned cluster ids, replacement rows) so a maintained store
    // rewrites only touched clusters — the algebra must be unchanged:
    // retire + append over the base equals the full-fold output, row
    // for row, on both lifecycle directions
    def applied(base: org.apache.spark.sql.DataFrame,
                delta: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame)) =
      base.join(delta._1, Seq("cluster_id"), "left_anti")
        .select("doc_id", "cluster_id")
        .union(delta._2.select("doc_id", "cluster_id"))
        .as[(Long, Long)].collect().toMap
    // adds direction: the merge-through-delivery-chain case above
    val baseAssign = Seq(
      (1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L), (20L, 20L)
    ).toDF("doc_id", "cluster_id")
    val delivery = Seq(30L, 31L, 32L).toDF("doc_id")
    val dd = Seq((30L, 31L)).toDF("doc_a", "doc_b")
    val db = Seq((31L, 3L), (30L, 10L)).toDF("doc_id", "base_id")
    val fullAdd = ClusterOps.incrementalClusters(baseAssign, delivery, dd, db)
      .as[(Long, Long)].collect().toMap
    val dAdd = ClusterOps.incrementalClustersDelta(baseAssign, delivery, dd, db)
    assert(applied(baseAssign, dAdd) == fullAdd)
    // untouched clusters must NOT re-emit (20 stays out; cluster 1's
    // rep kept its label, so it stays too); delivery-node ids may
    // appear — harmless no-op tombstones, since a fresh doc id can
    // never name an existing base cluster (cluster ids are ingested
    // component minima)
    val retired = dAdd._1.as[Long].collect().toSet
    assert(retired.contains(10L) && !retired.contains(20L) &&
      !retired.contains(1L))
    // removes direction: the bridge-split case above
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L)
    ).toDF("doc_a", "doc_b")
    val assign = Seq(
      (1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (5L, 1L),
      (10L, 10L), (11L, 10L), (20L, 20L)
    ).toDF("doc_id", "cluster_id")
    val removed = Seq(3L, 11L).toDF("doc_id")
    val fullRem = ClusterOps.removeFromClusters(
      assign, pairs, "doc_a", "doc_b", removed)
      .as[(Long, Long)].collect().toMap
    val dRem = ClusterOps.removeFromClustersDelta(
      assign, pairs, "doc_a", "doc_b", removed)
    assert(applied(assign, dRem) == fullRem)
    assert(dRem._1.as[Long].collect().toSet == Set(1L, 10L))
  }

  test("dedup_clusters_takedown equals from-scratch on the surviving corpus") {
    val survivors = Tables.documents(spark, sf0001)
      .filter(col("doc_id") % 17 =!= 0)
    val pairs = DedupOps.minhashPairs(
      DedupOps.allShingles(survivors, "text", 3), 16, 4, 0.5)
    val cc = ClusterOps.connectedComponentsStar(pairs, "doc_a", "doc_b")
      .withColumnRenamed("id", "doc_id")
    val fresh = survivors.select("doc_id")
      .join(cc, Seq("doc_id"), "left")
      .selectExpr("doc_id", "coalesce(cluster_id, doc_id) AS cluster_id")
      .as[(Long, Long)].collect().toSet
    val takedown = PipelineQueries.dedupClustersTakedown(spark, sf0001)
      .select("doc_id", "cluster_id").as[(Long, Long)].collect().toSet
    assert(takedown == fresh && fresh.nonEmpty)
  }

  test("lifecycle composition: fold a delivery, then take down docs") {
    // the primitives must COMPOSE: the assignment incrementalClusters
    // emits is a valid input to removeFromClusters (with the accumulated
    // edge table), and the result equals resolving the final corpus from
    // scratch - the full add -> remove lifecycle a production pipeline runs
    val docs = Tables.documents(spark, sf0001)
    val base = docs.filter(col("doc_id") % 5 =!= 0)
    val delivery = docs.filter(col("doc_id") % 5 === 0)
    val bSets = DedupOps.setsOfShingles(
      DedupOps.allShingles(base, "text", 3)).localCheckpoint()
    val dSets = DedupOps.setsOfShingles(
      DedupOps.allShingles(delivery, "text", 3)).localCheckpoint()
    val basePairs = DedupOps.minhashPairsOfSets(bSets, 16, 4, 0.5)
    val baseCc = ClusterOps.connectedComponentsStar(basePairs, "doc_a", "doc_b")
      .withColumnRenamed("id", "doc_id")
    val baseAssign = base.select("doc_id").join(baseCc, Seq("doc_id"), "left")
      .selectExpr("doc_id", "coalesce(cluster_id, doc_id) AS cluster_id")
    val dd = DedupOps.minhashPairsOfSets(dSets, 16, 4, 0.5)
    val db = DedupOps.crossNearPairsOfSets(bSets, dSets, 16, 4, 0.5)
    val afterAdd = ClusterOps.incrementalClusters(
      baseAssign, delivery.select("doc_id"), dd, db).localCheckpoint()
    // accumulated edge table, the artifact a pipeline persists
    val allEdges = basePairs.select("doc_a", "doc_b")
      .union(dd.select("doc_a", "doc_b"))
      .union(db.selectExpr("doc_id AS doc_a", "base_id AS doc_b"))
      .localCheckpoint()
    val removed = docs.filter(col("doc_id") % 7 === 0).select("doc_id")
    val got = ClusterOps.removeFromClusters(
        afterAdd, allEdges, "doc_a", "doc_b", removed)
      .as[(Long, Long)].collect().toSet
    // from-scratch resolution of the FINAL corpus
    val fin = docs.filter(col("doc_id") % 7 =!= 0)
    val finPairs = DedupOps.minhashPairs(
      DedupOps.allShingles(fin, "text", 3), 16, 4, 0.5)
    val finCc = ClusterOps.connectedComponentsStar(finPairs, "doc_a", "doc_b")
      .withColumnRenamed("id", "doc_id")
    val expected = fin.select("doc_id").join(finCc, Seq("doc_id"), "left")
      .selectExpr("doc_id", "coalesce(cluster_id, doc_id) AS cluster_id")
      .as[(Long, Long)].collect().toSet
    assert(got == expected && expected.nonEmpty)
  }

  test("property: lifecycle equals driver union-find on random graphs") {
    // independent oracle: a driver-side union-find (not another CC run)
    // checks both maintenance primitives on random graphs - random
    // base/delivery splits for the add path, random removals for the
    // remove path
    def unionFind(nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map(nodes.map(n => n -> n): _*)
      def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); r }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      nodes.map(n => n -> find(n)).toMap
    }
    val rnd = new scala.util.Random(23)
    for (trial <- 0 until 3) {
      val n = 36
      val nodes = (0L until n.toLong)
      val edges = (0 until 50)
        .map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2).distinct
      val inDelivery = nodes.filter(_ => rnd.nextBoolean()).toSet
      val baseNodes = nodes.filterNot(inDelivery)
      val baseEdges = edges.filter(e => !inDelivery(e._1) && !inDelivery(e._2))
      val ddEdges = edges.filter(e => inDelivery(e._1) && inDelivery(e._2))
      val dbEdges = edges.collect {
        case (a, b) if inDelivery(a) && !inDelivery(b) => (a, b)
        case (a, b) if !inDelivery(a) && inDelivery(b) => (b, a)
      }
      val baseAssign = unionFind(baseNodes, baseEdges).toSeq
        .toDF("doc_id", "cluster_id")
      val afterAdd = ClusterOps.incrementalClusters(
          baseAssign, inDelivery.toSeq.toDF("doc_id"),
          ddEdges.toDF("doc_a", "doc_b"), dbEdges.toDF("doc_id", "base_id"))
        .localCheckpoint()
      val expectAdd = unionFind(nodes, edges)
      assert(afterAdd.as[(Long, Long)].collect().toMap == expectAdd,
        s"trial $trial: add path diverged from union-find")
      val removedSet = nodes.filter(_ => rnd.nextInt(4) == 0).toSet
      val survivors = nodes.filterNot(removedSet)
      val got = ClusterOps.removeFromClusters(
          afterAdd, edges.toDF("doc_a", "doc_b"), "doc_a", "doc_b",
          removedSet.toSeq.toDF("doc_id"))
        .as[(Long, Long)].collect().toMap
      val expectRm = unionFind(survivors,
        edges.filter(e => !removedSet(e._1) && !removedSet(e._2)))
      assert(got == expectRm, s"trial $trial: remove path diverged")
    }
  }

  test("dedup_soft: unique content keeps full weight, duplicated content decays") {
    val rows = PipelineQueries.dedupSoft(spark, sf0001)
      .select("doc_id", "n_sh", "mean_lndf_micro", "weight_micro")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, n, m, w) =>
      assert(n > 0 && m >= 0 && w > 0 && w <= 1000000L, s"doc $id out of range")
      // weight is exactly exp(-mean) in micro-units — the shared statement
      assert(w == math.round(1000000.0 * math.exp(-(m.toDouble / 1000000.0))),
        s"doc $id weight disagrees with its own mean")
    }
    // the generated corpus shares vocabulary: every doc carries SOME
    // common trigram, so weights spread strictly below 1e6 (the exact
    // w=1e6 unique case is proven on the hand fixture below), and the
    // seeded near-dup mass must push the minimum well under the maximum
    assert(rows.map(_._4).max < 1000000L)
    assert(rows.map(_._4).min < rows.map(_._4).max,
      "commonness must differentiate docs")
    // hand fixture: exact duplicates split df=2 evenly — both weighted
    // exp(-ln 2) = 1/2; the unique doc keeps 1e6
    val fix = Seq(
      (1L, "aa bb cc dd ee"), (2L, "aa bb cc dd ee"), (3L, "ff gg hh ii jj"))
      .toDF("doc_id", "text")
    val sh = graft.ops.DedupOps.shingleHashes(fix, "text", 3)
      .select("doc_id", "h").distinct()
    val dfT = sh.groupBy("h").agg(count(lit(1)).as("df"))
    val got = sh.join(dfT, "h").groupBy("doc_id")
      .agg(sum(expr("CAST(round(1000000.0 * ln(CAST(df AS DOUBLE))) AS BIGINT)")).as("s"),
        count(lit(1)).as("n"))
      .selectExpr("doc_id",
        "CAST(round(1000000.0 * exp(-(CAST(s div n AS DOUBLE) / 1000000.0))) AS BIGINT) AS w")
      .as[(Long, Long)].collect().toMap
    assert(got(3L) == 1000000L)
    assert(got(1L) == got(2L) && got(1L) == 500000L,
      s"exact-duplicate pair must halve, got ${got(1L)}")
  }

  test("quality_drift bins recompose the corpus with exact ppm shares") {
    val rows = PipelineQueries.qualityDrift(spark, sf0001)
      .select("bin", "n_ref", "n_cur", "ref_ppm", "cur_ppm", "drift_ppm")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val total = PipelineQueries.textQuality(spark, sf0001).count()
    assert(rows.map(r => r._2 + r._3).sum == total,
      "every scored doc lands in exactly one bin")
    rows.foreach { case (bin, nr, nc, rp, cp, dp) =>
      assert(bin >= 0 && bin <= 9)
      assert(dp == math.abs(rp - cp), s"bin $bin drift_ppm inconsistent")
    }
    // integer-floored shares sum to at most 1e6 and within bin-count slack
    val rps = rows.map(_._4).sum
    assert(rps <= 1000000L && rps > 1000000L - rows.length,
      s"ref ppm shares sum $rps out of the floor-rounding envelope")
  }

  test("dedup_canonical keeps exactly the quality-argmax member of every cluster") {
    val rows = PipelineQueries.dedupCanonical(spark, sf0001)
      .select("doc_id", "cluster_id", "quality", "keep")
      .as[(Long, Long, Double, Boolean)].collect()
    val byCluster = rows.groupBy(_._2)
    byCluster.foreach { case (cid, members) =>
      val kept = members.filter(_._4)
      assert(kept.length == 1, s"cluster $cid kept ${kept.length} members")
      // argmax by (quality desc, doc_id asc): nothing strictly better exists
      val k = kept.head
      members.foreach { m =>
        assert(m._3 < k._3 || (m._3 == k._3 && m._1 >= k._1),
          s"cluster $cid: member ${m._1} (q=${m._3}) beats keeper ${k._1} (q=${k._3})")
      }
    }
  }

  test("corpus_manifest agrees with its parent passes doc by doc") {
    val man = PipelineQueries.corpusManifest(spark, sf0001)
      .select("doc_id", "quality", "rep_pass", "canonical", "keep", "split")
      .as[(Long, Double, Boolean, Boolean, Boolean, String)].collect()
    // keep is exactly the conjunction of its three gates
    man.foreach { case (id, q, rep, canon, keep, _) =>
      assert(keep == (q >= 0.5 && rep && canon), s"doc $id keep flag inconsistent")
    }
    // the split column IS trainSplitSafe's split (same cluster hash)
    val safe = PipelineQueries.trainSplitSafe(spark, sf0001)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    man.foreach { case (id, _, _, _, _, split) =>
      assert(safe(id) == split, s"doc $id split diverges from trainSplitSafe")
    }
    // canonical = the quality-argmax among the cluster's GATE-SURVIVING
    // members (the rank runs after the repetition join): every cluster
    // present in the manifest has exactly one canonical row, and it is
    // beaten by no other surviving member — even when dedup_canonical's
    // pure-policy keeper was too short to be repetition-scored (the
    // promote-next-best fallback ADVICE r9 prescribed)
    val manFull = PipelineQueries.corpusManifest(spark, sf0001)
      .select("doc_id", "cluster_id", "quality", "canonical")
      .as[(Long, Long, Double, Boolean)].collect()
    manFull.groupBy(_._2).foreach { case (cid, members) =>
      val canon = members.filter(_._4)
      assert(canon.length == 1, s"cluster $cid has ${canon.length} canonical rows")
      val k = canon.head
      members.foreach { m =>
        assert(m._3 < k._3 || (m._3 == k._3 && m._1 >= k._1),
          s"cluster $cid: survivor ${m._1} (q=${m._3}) beats canonical ${k._1} (q=${k._3})")
      }
    }
    // and wherever dedup_canonical's keeper DID survive the gate, the two
    // policies agree doc-for-doc
    val keepers = PipelineQueries.dedupCanonical(spark, sf0001)
      .filter("keep").select("doc_id").as[Long].collect().toSet
    val survivingKeeperClusters = manFull.filter(m => keepers(m._1)).map(_._2).toSet
    manFull.filter(m => survivingKeeperClusters(m._2)).foreach {
      case (id, _, _, canon) =>
        assert(canon == keepers(id),
          s"doc $id canonical flag diverges though the policy keeper survived")
    }
  }
}
