package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * Graph clustering for dedup resolution: connected components over a
 * near-duplicate pair list (the output of [[DedupOps.minhashPairs]] or
 * [[SimilarityOps.cosineDupPairs]]), so each duplicate group can elect one
 * canonical survivor — the step that turns pairwise near-dup evidence into
 * an actual keep/drop decision.
 *
 * Algorithm: min-label propagation to fixpoint. Every node's label starts
 * at its own id; each round a node takes the min of its own and its
 * neighbors' labels; at the fixpoint every component is labeled by its
 * minimum id. Scale shape:
 *  - each round is ONE aggregation shuffle keyed by node id over the
 *    EDGE-TOUCHED nodes only — singleton documents (the dominant mass of a
 *    100 TB corpus) never enter the loop and are attached afterwards with
 *    a left join;
 *  - rounds needed = component diameter. Near-dup components are dense
 *    short-diameter clumps (every pair shares >= threshold of its
 *    shingles), so a handful of rounds converges; for adversarial
 *    long-chain graphs use [[connectedComponentsStar]] (alternating
 *    large-star/small-star contraction, O(log^2 n) rounds regardless of
 *    diameter — same output contract, parity-specced);
 *  - `localCheckpoint` truncates lineage each round so the plan (and its
 *    codegen) stays constant-size regardless of iteration count.
 *
 * The driver-side loop is control flow only — per-round data movement is
 * entirely distributed; the only driver-visible values are the empty-check
 * of the convergence join.
 */
object ClusterOps {

  /** Fixpoint forensics: every CC invocation records its variant, round
    * count, and per-round wall millis here; [[graft.Bench]] drains the
    * buffer per query into `CC_ROUNDS.json` so the GATE artifact shows
    * where iterative queries' time actually goes (the r7 verdict's open
    * question — driver-measured dedup_clusters cost was 5× its builder-
    * local cost with identical plans, and only per-round evidence from
    * the gate environment can name the mechanism). Recording is a few
    * appends per QUERY (not per row); zero cost at any data scale. */
  object CcStats {
    final case class Run(variant: String, rounds: Int, totalMillis: Long,
                         roundMillis: Seq[Long])
    /** Undrained entries beyond this are dropped oldest-first: only
      * graft.Bench drains, so a long-lived process that never does (a
      * streaming maintainer folding deliveries for weeks) must not grow
      * driver memory without bound. */
    private val MaxBuffered = 512
    private val buf = scala.collection.mutable.ArrayBuffer[Run]()
    private[ClusterOps] def record(r: Run): Unit = synchronized {
      if (buf.size >= MaxBuffered) buf.remove(0)
      buf += r
    }
    /** Returns and clears everything recorded since the last drain. */
    def drain(): Seq[Run] = synchronized { val r = buf.toList; buf.clear(); r }
  }

  /** Edge-count bound for [[connectedComponentsStar]]'s driver-local fast
    * path: 2^18 deduplicated edges ≈ 4 MB of long pairs on the driver —
    * corpus-independent memory in the same class as a broadcast threshold,
    * while far above the delta graphs the incremental fold produces at any
    * test SF. */
  val DefaultLocalMaxEdges: Long = 1L << 18

  /** Driver-local union-find over a BOUNDED, already-deduplicated edge
    * list — the small-graph terminal of [[connectedComponentsStar]].
    * Min-root union (the larger root is always attached under the smaller)
    * keeps every set's root equal to its minimum id, so after path
    * compression the final find IS the component minimum: the identical
    * (id, cluster_id = component min) contract as the distributed rounds,
    * with one collect job where each distributed round costs several.
    * `edges` is the checkpointed distinct (u,v) set whose count the
    * caller's witness already established to be ≤ the local bound, so the
    * collect is bounded by construction (same discipline as the ANN
    * codebook collects). */
  private def localComponents(edges: DataFrame): DataFrame = {
    val t0 = System.nanoTime()
    val es = edges.select(col("u").cast("long"), col("v").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.HashMap[Long, Long]()
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      var c = x
      while (parent(c) != r) { val nx = parent(c); parent(c) = r; c = nx }
      r
    }
    es.foreach { case (u, v) =>
      parent.getOrElseUpdate(u, u); parent.getOrElseUpdate(v, v)
      val ru = find(u); val rv = find(v)
      if (ru != rv) parent(math.max(ru, rv)) = math.min(ru, rv)
    }
    val rows = parent.keysIterator.map(id => (id, find(id))).toSeq
    CcStats.record(CcStats.Run("local", 0,
      (System.nanoTime() - t0) / 1000000L, Nil))
    val session = edges.sparkSession
    import session.implicits._
    rows.toDF("id", "cluster_id")
  }

  /** Connected components of the undirected graph given by (`aCol`,`bCol`)
    * pairs. Returns one row per node appearing in any pair:
    * (id, cluster_id) with cluster_id = min node id of its component.
    * Fails fast (like the dedup guards) if `maxIter` rounds don't reach a
    * fixpoint rather than silently returning partial components. */
  def connectedComponents(pairs: DataFrame, aCol: String, bCol: String,
                          maxIter: Int = 50): DataFrame = {
    val edges = pairs.select(col(aCol).as("s"), col(bCol).as("d"))
      .union(pairs.select(col(bCol).as("s"), col(aCol).as("d")))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    // round 0 folded into init: own id min direct neighbors
    var labels = edges.groupBy(col("s"))
      .agg(min(col("d")).as("mn"))
      .select(col("s").as("id"), least(col("s"), col("mn")).as("label"))
      .localCheckpoint()
    // convergence witness: labels are non-negative and only ever decrease,
    // so an unchanged label SUM proves the fixpoint — one cheap aggregate
    // per round instead of a full labels-to-labels join. DECIMAL(38,0)
    // accumulation cannot overflow at any corpus size that fits in BIGINT
    // ids (10^19 ids × 10^19 max id < 10^38).
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("label").cast("decimal(38,0)"))).head.getDecimal(0)
    var prevSum = labelSum(labels)
    var converged = false
    var rounds = 0
    val roundMs = scala.collection.mutable.ArrayBuffer[Long]()
    val t0 = System.nanoTime()
    while (!converged && rounds < maxIter) {
      val rt0 = System.nanoTime()
      val msgs = edges.join(labels, col("s") === col("id"))
        .select(col("d").as("id"), col("label"))
      val next = labels.union(msgs)
        .groupBy("id").agg(min("label").as("label"))
        .localCheckpoint()
      val nextSum = labelSum(next)
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      labels = next
      rounds += 1
      roundMs += (System.nanoTime() - rt0) / 1000000L
    }
    edges.unpersist()
    CcStats.record(CcStats.Run("propagation", rounds,
      (System.nanoTime() - t0) / 1000000L, roundMs.toList))
    require(converged,
      s"connectedComponents: no fixpoint after $maxIter rounds - component " +
        "diameter exceeds the bound; raise maxIter or use a star-contraction scheme")
    labels.select(col("id"), col("label").as("cluster_id"))
  }

  /** Connected components by ALTERNATING STAR CONTRACTION (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC'14): the
    * adversarial-graph path [[connectedComponents]]'s scaladoc points at.
    * Min-label propagation needs rounds = component DIAMETER, so a
    * 10^6-node chain (crawl-chain duplicates, quote chains) blows any
    * round budget; large-star/small-star contracts in O(log² n) rounds
    * regardless of diameter.
    *
    * Round shape (each = two grouped aggregations + joins, all keyed
    * shuffles over the CURRENT edge set, which only shrinks toward the
    * star forest):
    *  - large-star: per node u with m = min(N(u) ∪ {u}), rewire every
    *    LARGER neighbor v > u to (v, m);
    *  - small-star: per node u over smaller neighbors N⁻(u) = {v < u}
    *    with m = min(N⁻(u)), rewire (u, m) and (v, m) for v ∈ N⁻(u)\{m}.
    * At the fixpoint every component is a star centered at its minimum
    * id — the SAME output contract as [[connectedComponents]] (a parity
    * spec asserts equality on random graphs), so callers can swap freely.
    * One edge nuance: self-loop pairs are dropped here, so a node
    * appearing ONLY in self-loops yields no row (the propagation CC would
    * label it a singleton); the dedup pair producers emit doc_a < doc_b,
    * so the contracts coincide on every in-repo input.
    * Convergence: a cheap (count, Σhash) witness pre-filters; a matching
    * witness is then CONFIRMED exactly with one edge-set anti-join, so
    * the declared fixpoint is never hash-probabilistic.
    *
    * SMALL-GRAPH FAST PATH: when the deduplicated edge count — already on
    * the driver from the initial convergence witness, no extra job — is at
    * most `localMaxEdges`, the fixpoint runs as a driver-local union-find
    * over the collected edge list instead of distributed rounds. Every
    * distributed round costs a fixed number of job launches regardless of
    * data volume (the r9 forensics priced 2 star rounds over a ~100-edge
    * delta graph at ~1.0 s — identical to the same rounds over the full
    * corpus graph, i.e. pure scheduling floor); below the threshold that
    * floor dominates the actual work by orders of magnitude. The bound is
    * CORPUS-INDEPENDENT driver memory (≤ localMaxEdges edge tuples,
    * default ~4 MB) — the same bounded-collect discipline as broadcast
    * thresholds and the ANN codebook collects; graphs past the bound
    * (corpus-scale resolutions, large deliveries) take the distributed
    * rounds unchanged. Both paths emit the identical min-label contract
    * (parity-specced); node ids must be integral (BIGINT everywhere in
    * this repo). */
  def connectedComponentsStar(pairs: DataFrame, aCol: String, bCol: String,
                              maxIter: Int = 50,
                              localMaxEdges: Long = DefaultLocalMaxEdges): DataFrame = {
    // one orientation per undirected edge; self-loops dropped
    var edges = pairs
      .select(col(aCol).as("u"), col(bCol).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint()
    // set-identity witness: row count + Σ xxhash64(u,v). This is a FAST
    // PRE-FILTER only — when it matches, the fixpoint is CONFIRMED exactly
    // below with an except().isEmpty anti-join (count equality from the
    // witness + empty next∖edges ⇒ set equality on distinct sets), so a
    // hash-sum collision can never declare a false fixpoint; it only costs
    // one extra cheap job in the terminal round.
    def witness(e: DataFrame): (Long, java.math.BigDecimal) = {
      val r = e.agg(count(lit(1)),
        sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)"))).head
      (r.getLong(0), r.getDecimal(1))
    }
    var prev = witness(edges)
    if (prev._1 <= localMaxEdges) return localComponents(edges)
    var converged = false
    var rounds = 0
    val roundMs = scala.collection.mutable.ArrayBuffer[Long]()
    val t0 = System.nanoTime()
    while (!converged && rounds < maxIter) {
      val rt0 = System.nanoTime()
      val nbrs = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
      // large-star: m = min over N(u) ∪ {u}; rewire larger neighbors
      val mLarge = nbrs.groupBy("u").agg(min(col("v")).as("mnv"))
        .select(col("u"), least(col("u"), col("mnv")).as("m"))
      val large = nbrs.join(mLarge, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v"))
        .distinct()
      // small-star over the large-star output
      val nbrs2 = large.union(large.select(col("v").as("u"), col("u").as("v")))
      val sm = nbrs2.filter(col("v") < col("u"))
      val mSmall = sm.groupBy("u").agg(min(col("v")).as("m"))
      val next = sm.join(mSmall, "u")
        .select(col("v").as("u"), col("m").as("v"))
        .union(mSmall.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct()
        .localCheckpoint()
      val w = witness(next)
      // exact confirm runs only when the cheap witness already matches:
      // both sides are distinct and localCheckpointed, so the anti-join is
      // one small terminal job, not a per-round tax
      converged = w == prev && next.except(edges).isEmpty
      prev = w
      edges = next
      rounds += 1
      roundMs += (System.nanoTime() - rt0) / 1000000L
    }
    CcStats.record(CcStats.Run("star", rounds,
      (System.nanoTime() - t0) / 1000000L, roundMs.toList))
    require(converged,
      s"connectedComponentsStar: no fixpoint after $maxIter rounds - " +
        "pathological input; raise maxIter")
    // converged star forest: every edge is (node, component-min center)
    edges.select(col("u").as("id"), col("v").as("cluster_id"))
      .union(edges.select(col("v").as("id"), col("v").as("cluster_id")))
      .distinct()
  }

  /** INCREMENTAL cluster maintenance: fold a new delivery's near-dup
    * evidence into an EXISTING cluster assignment without re-resolving the
    * base corpus — the production shape for a growing 100 TB corpus, where
    * re-running connected components over everything per delivery is the
    * cost ceiling this method removes.
    *
    * Inputs:
    *  - `baseAssign` (doc_id, cluster_id): the persisted assignment of the
    *    previous run, cluster_id = min doc id of its component (exactly
    *    what [[connectedComponents]]/[[connectedComponentsStar]] emit and
    *    the dedup_clusters queries persist), EVERY base doc covered
    *    (singletons as their own id);
    *  - `deliveryIds` (doc_id): the new delivery's doc ids;
    *  - `ddPairs` (doc_a, doc_b): near-dup pairs WITHIN the delivery
    *    ([[DedupOps.minhashPairs]] on the delivery alone);
    *  - `dbPairs` (doc_id, base_id): verified pairs BETWEEN delivery and
    *    base ([[DedupOps.crossNearPairs]] — candidates scale with the
    *    delivery, not the corpus).
    *
    * Method: quotient-graph contraction. Each base cluster is contracted
    * to its representative (its cluster_id, the component MINIMUM), so
    * delivery→base edges rewire to (delivery doc, rep) and the component
    * resolution runs over the DELTA GRAPH only — delivery docs plus the
    * reps their edges touch — via [[connectedComponentsStar]]. Because
    * contraction is a components-preserving graph quotient and every rep
    * is its component's minimum id, the delta labels ARE the global
    * minima: relabeling each touched base cluster through its rep
    * reproduces EXACTLY the from-scratch assignment over
    * base ∪ delivery edges (the spec asserts equality; the
    * dedup_clusters_delta query hash-matches the same oracle as
    * dedup_clusters).
    *
    * Scale shape: one broadcast-or-hash join to rewire db edges, star CC
    * over a delivery-sized graph, one join back onto `baseAssign` keyed by
    * cluster_id. The base corpus is never rescanned beyond that relabel
    * join — and a production run can push the rep-map join down to only
    * clusters present in the delta (it is a broadcast at any sane delivery
    * size). Output: (doc_id, cluster_id) for base ∪ delivery. */
  def incrementalClusters(baseAssign: DataFrame, deliveryIds: DataFrame,
                          ddPairs: DataFrame, dbPairs: DataFrame,
                          maxIter: Int = 50): DataFrame = {
    val repEdges = dbPairs
      .join(baseAssign.select(col("doc_id").as("base_id"),
        col("cluster_id").as("rep")), "base_id")
      .select(col("doc_id").as("u"), col("rep").as("v"))
    val edges = ddPairs.select(col("doc_a").as("u"), col("doc_b").as("v"))
      .union(repEdges)
    // delta resolution: O(log² n) rounds over the delta graph only
    val delta = connectedComponentsStar(edges, "u", "v", maxIter)
    val dAssign = deliveryIds.select("doc_id")
      .join(delta.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .selectExpr("doc_id", "coalesce(cluster_id, doc_id) AS cluster_id")
    // base relabel: only clusters whose REP appears in the delta move;
    // everything else keeps its assignment untouched
    val repMap = delta.select(col("id").as("rep"), col("cluster_id").as("new_cid"))
    val bAssign = baseAssign
      .join(repMap, baseAssign("cluster_id") === repMap("rep"), "left")
      .selectExpr("doc_id", "coalesce(new_cid, cluster_id) AS cluster_id")
    dAssign.union(bAssign)
  }

  /** Incremental DOC REMOVAL from a cluster assignment (takedowns,
    * robots.txt retractions, licensing pulls — the other half of the
    * corpus lifecycle next to [[incrementalClusters]]): drop `removed`
    * docs and re-resolve ONLY the clusters they belonged to. Removal is
    * the operation quotient contraction cannot absorb — deleting a doc
    * can SPLIT its cluster (it may have been the only bridge between two
    * clumps) — so the affected clusters' surviving edges are re-run
    * through star CC while every untouched cluster passes through
    * verbatim.
    *
    * Inputs: `assign` (doc_id, cluster_id) covering all docs; `pairs`
    * (`aCol`,`bCol`) the near-dup edge list the assignment was built from
    * (the table a production pipeline persists next to the assignment);
    * `removed` (doc_id). Output: (doc_id, cluster_id) over the SURVIVING
    * docs — identical to resolving the surviving corpus from scratch
    * (edges between surviving docs are unaffected by removals: band keys
    * are per-doc, verification per-pair — so the restricted edge set IS
    * the surviving corpus' edge set; the takedown query hash-matches the
    * restricted from-scratch oracle on this invariant).
    *
    * Scale shape: affected-cluster membership and their edges come from
    * two joins keyed by cluster/doc id; the re-resolution runs over the
    * affected clusters' edges only — takedown batches touch a vanishing
    * fraction of a 100 TB corpus, so the fixpoint input is tiny. */
  def removeFromClusters(assign: DataFrame, pairs: DataFrame,
                         aCol: String, bCol: String, removed: DataFrame,
                         maxIter: Int = 50): DataFrame = {
    val rem = removed.select(col("doc_id").as("rid"))
    val affected = assign.join(rem, col("doc_id") === col("rid"))
      .select("cluster_id").distinct()
    val members = assign.join(affected, Seq("cluster_id"))
    val survivors = members.join(rem, col("doc_id") === col("rid"), "left_anti")
    // scoped surviving edges: an edge's component is its endpoints'
    // cluster (components never span clusters), so scoping by the a-side
    // membership catches exactly the affected clusters' edges
    val scoped = pairs.select(col(aCol).as("u"), col(bCol).as("v"))
      .join(members.select(col("doc_id").as("u")), Seq("u"))
      .join(rem, col("u") === col("rid"), "left_anti")
      .join(rem.withColumnRenamed("rid", "rid2"), col("v") === col("rid2"), "left_anti")
      .select("u", "v")
    val recc = connectedComponentsStar(scoped, "u", "v", maxIter)
    val reassigned = survivors.select("doc_id")
      .join(recc.select(col("id").as("doc_id"), col("cluster_id").as("new_cid")),
        Seq("doc_id"), "left")
      .selectExpr("doc_id", "coalesce(new_cid, doc_id) AS cluster_id")
    assign.join(affected, Seq("cluster_id"), "left_anti")
      .select("doc_id", "cluster_id")
      .union(reassigned.select("doc_id", "cluster_id"))
  }

  /** [[incrementalClusters]] reported as a DELTA — (retired cluster
    * ids, replacement rows) instead of the full rewritten assignment:
    * only base clusters whose representative RELABELS (new_cid ≠ rep —
    * a merge pulled a smaller id in) retire and re-emit; every other
    * assignment row carries by reference in whatever store holds it
    * (the press keeps the assignment in a cluster_id-keyed
    * [[graft.streaming.SegmentedState]], so a delivery's state write is
    * tombstones + appends, O(delivery + touched-cluster rows) — the r14
    * verdict's last measured per-delivery growth term was exactly the
    * full-frame re-checkpoint this replaces). Applying the delta
    * (retire retired ids, append rows) to `baseAssign` reproduces
    * [[incrementalClusters]]'s output EXACTLY (spec-asserted): the
    * quotient algebra is unchanged, only the REPORTING moved from
    * full-frame to delta. */
  def incrementalClustersDelta(baseAssign: DataFrame, deliveryIds: DataFrame,
                               ddPairs: DataFrame, dbPairs: DataFrame,
                               maxIter: Int = 50,
                               membersOf: Option[DataFrame => DataFrame] = None)
      : (DataFrame, DataFrame) = {
    val repEdges = dbPairs
      .join(baseAssign.select(col("doc_id").as("base_id"),
        col("cluster_id").as("rep")), "base_id")
      .select(col("doc_id").as("u"), col("rep").as("v"))
    val edges = ddPairs.select(col("doc_a").as("u"), col("doc_b").as("v"))
      .union(repEdges)
    val delta = connectedComponentsStar(edges, "u", "v", maxIter)
    val dAssign = deliveryIds.select("doc_id")
      .join(delta.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .selectExpr("doc_id", "coalesce(cluster_id, doc_id) AS cluster_id")
    // only BASE reps whose label MOVED force their cluster to re-emit:
    // a delivery doc joining a cluster whose rep stays minimal touches
    // nothing, and delivery-node ids are EXCLUDED from the retired set
    // (they could only be no-op tombstones — fresh ids never name an
    // existing cluster — but a maintained store pays every tombstone
    // row on every later read: the first cut emitted them and the
    // 100-delivery press probe measured the accumulated masks as a
    // monotone per-delivery growth term)
    val baseReps = repEdges.select(col("v").as("rep")).distinct()
    val moved0 = delta
      .select(col("id").as("rep"), col("cluster_id").as("new_cid"))
      .filter(col("new_cid") =!= col("rep"))
      .join(broadcast(baseReps), Seq("rep"), "left_semi")
    // the moved-rep set is re-read by the membership lookup AND the
    // retired output — touched-cluster-sized, checkpoint when a point
    // read will consume it (the probe collects its bucket set)
    val moved = if (membersOf.isDefined) moved0.localCheckpoint() else moved0
    // members of the moved clusters: a bounded cluster-id point read —
    // `membersOf` routes it through a key-bucketed store's probe()
    // (plan-time directory pruning; the r15 verdict #2 wiring) instead
    // of a scan of the corpus-sized assignment
    val movedMembers = membersOf match {
      case Some(lookup) =>
        lookup(moved.select(col("rep").as("cluster_id")))
          .select("doc_id", "cluster_id")
          .join(broadcast(moved), col("cluster_id") === col("rep"))
          .select(col("doc_id"), col("new_cid").as("cluster_id"))
      case None =>
        baseAssign
          .join(broadcast(moved), baseAssign("cluster_id") === moved("rep"))
          .select(col("doc_id"), col("new_cid").as("cluster_id"))
    }
    (moved.select(col("rep").as("cluster_id")),
      dAssign.select("doc_id", "cluster_id")
        .union(movedMembers.select("doc_id", "cluster_id")))
  }

  /** [[removeFromClusters]] reported as a DELTA — (retired cluster ids,
    * replacement rows): the affected clusters (those holding a removed
    * doc) retire whole, their surviving members re-emit under the
    * re-resolved labels; untouched clusters carry by reference. Same
    * algebra, delta reporting — applying the delta to `assign`
    * reproduces [[removeFromClusters]] exactly (spec-asserted). */
  def removeFromClustersDelta(assign: DataFrame, pairs: DataFrame,
                              aCol: String, bCol: String, removed: DataFrame,
                              maxIter: Int = 50,
                              membersOf: Option[DataFrame => DataFrame] = None,
                              edgesOf: Option[DataFrame => DataFrame] = None)
      : (DataFrame, DataFrame) = {
    val rem = removed.select(col("doc_id").as("rid"))
    // the affected-cluster NAMES are a doc-keyed lookup of the
    // assignment (the state is cluster-keyed, so this leg stays a
    // broadcast-probe scan — takedown batches only); checkpoint when
    // point reads will consume it downstream
    val affected0 = assign.join(rem, col("doc_id") === col("rid"))
      .select("cluster_id").distinct()
    val affected = if (membersOf.isDefined || edgesOf.isDefined)
      affected0.localCheckpoint() else affected0
    // affected-cluster MEMBERSHIP is a bounded cluster-id point read —
    // `membersOf` routes it through a bucketed store's probe()
    val members = membersOf match {
      case Some(lookup) => lookup(affected).select("doc_id", "cluster_id")
      case None => assign.join(broadcast(affected), Seq("cluster_id"))
    }
    val survivors = members.join(rem, col("doc_id") === col("rid"), "left_anti")
    // the affected clusters' surviving EDGES: scoping by the a-side
    // membership catches them all (components never span clusters) —
    // a bounded doc-id point read of the pair list when `edgesOf` is a
    // bucketed probe
    val scopedIn = edgesOf match {
      case Some(lookup) =>
        lookup(members.select(col("doc_id").as(aCol)))
          .select(col(aCol).as("u"), col(bCol).as("v"))
      case None =>
        pairs.select(col(aCol).as("u"), col(bCol).as("v"))
          .join(members.select(col("doc_id").as("u")), Seq("u"))
    }
    val scoped = scopedIn
      .join(rem, col("u") === col("rid"), "left_anti")
      .join(rem.withColumnRenamed("rid", "rid2"), col("v") === col("rid2"), "left_anti")
      .select("u", "v")
    val recc = connectedComponentsStar(scoped, "u", "v", maxIter)
    val reassigned = survivors.select("doc_id")
      .join(recc.select(col("id").as("doc_id"), col("cluster_id").as("new_cid")),
        Seq("doc_id"), "left")
      .selectExpr("doc_id", "coalesce(new_cid, doc_id) AS cluster_id")
    (affected, reassigned.select("doc_id", "cluster_id"))
  }

  /** PageRank with a FIXED iteration count in exact integer arithmetic:
    * ranks live in 1e-6 units, each round is
    * `rank' = 0.15 + 0.85 × Σ_in (rank_src div outdeg_src)` with floored
    * integer division — bit-deterministic on any cluster size and
    * restatable in SQL (an unrolled CTE per round), unlike float PageRank
    * whose sum order drifts. Dangling-node mass is dropped (the standard
    * simplified formulation).
    *
    * Iteration shape (same discipline as [[connectedComponents]]): the
    * edge list, out-degrees and node set are computed ONCE and cached —
    * they are loop-invariant — and `ranks` is `localCheckpoint`ed per
    * round, so round k's plan is one join + one aggregation over
    * materialized inputs instead of a k-deep replay of rounds 1..k−1.
    * Without the checkpoint the final plan grows linearly in `iters`
    * (38 shuffle exchanges at iters=5 in the round-3 audit) and every
    * round re-reads and re-deduplicates the raw edges.
    *
    * Input: directed (`src`, `dst`) edge list (deduplicated here).
    * Output: (id, rank) for every node appearing in any edge.
    *
    * SMALL-GRAPH FAST PATH (same discipline as
    * [[connectedComponentsStar]]'s): when the deduplicated edge count is
    * at most `localMaxEdges`, the fixed rounds run as a driver-local loop
    * over the collected edge list — every distributed round costs a fixed
    * number of job launches (join + aggregate + relabel + checkpoint)
    * regardless of data volume, a pure scheduling floor when the graph is
    * thousands of edges (item co-occurrence graphs are bounded by the
    * catalog, not the event volume). The arithmetic is the identical
    * exact integer recurrence, so both paths are bit-equal
    * (parity-specced); the bound is corpus-independent driver memory and
    * larger graphs take the distributed rounds unchanged. */
  def pagerankFixed(edges: DataFrame, iters: Int,
                    localMaxEdges: Long = DefaultLocalMaxEdges): DataFrame = {
    val ed = edges.select(col("src"), col("dst")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    if (ed.count() <= localMaxEdges) {
      val es = ed.select(col("src").cast("long"), col("dst").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      ed.unpersist()
      val out = es.groupBy(_._1).map { case (s, a) => (s, a.length.toLong) }
      val nodes = (es.map(_._1) ++ es.map(_._2)).distinct
      // ranks stay positive, so Long division IS the floored `div` of the
      // distributed recurrence — bit-identical rounds
      var rank = nodes.map(_ -> 1000000L).toMap
      (1 to iters).foreach { _ =>
        val contrib = scala.collection.mutable.HashMap[Long, Long]()
        es.foreach { case (s, d) =>
          contrib(d) = contrib.getOrElse(d, 0L) + rank(s) / out(s)
        }
        rank = nodes.map(n => n -> (150000L + 85L * contrib.getOrElse(n, 0L) / 100)).toMap
      }
      val session = edges.sparkSession
      import session.implicits._
      return rank.toSeq.toDF("id", "rank")
    }
    val out = ed.groupBy("src").agg(count(lit(1)).as("outdeg"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = ed.select(col("src").as("id"))
      .union(ed.select(col("dst").as("id"))).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    var ranks = nodes.withColumn("rank", lit(1000000L)).localCheckpoint()
    (1 to iters).foreach { _ =>
      val contrib = ed
        .join(ranks, col("src") === col("id"))
        .join(out, "src")
        .selectExpr("dst", "rank div outdeg AS c")
        .groupBy("dst").agg(sum(col("c")).as("s"))
      ranks = nodes.join(contrib, col("id") === col("dst"), "left")
        .selectExpr("id", "150000L + 85L * coalesce(s, 0L) div 100 AS rank")
        .localCheckpoint()
    }
    // the final ranks are materialized by the last checkpoint, so the
    // loop-invariant caches can be released before handing the result back
    ed.unpersist(); out.unpersist(); nodes.unpersist()
    ranks
  }
}
