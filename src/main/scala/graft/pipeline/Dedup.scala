package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{functions => gf}

/**
 * The ONE definition of the engine's MinHash-LSH banding scheme, shared by
 * the batch pair query (q25), the batch first-wins retention (q63), the
 * curation funnel's near-dup stage (q65), and the streaming form
 * ([[graft.streaming.NearDup]]) — a parameter change here changes all four
 * together, so batch and stream can never silently diverge.
 */
object Dedup {

  val ShingleN = 3
  val MinhashK = 64
  val MinhashSeed = 7L
  val RowsPerBand = 4

  /**
   * One row per (passthrough columns, `band`): the 16 LSH band keys of the
   * doc's 64-slot minhash signature over word 3-shingles of `text`.
   *
   * Docs with NO shingles (fewer than [[ShingleN]] tokens) are EXCLUDED:
   * `TextOps.minHash` gives an empty shingle set the all-`Long.MaxValue`
   * sentinel signature, so every short doc would band-collide with every
   * other short doc — not a similarity judgment at all. Excluding them
   * also matches the DuckDB replays (whose shingle CTE generates no rows
   * for them); short docs are simply not candidates for near-dup logic.
   */
  def banded(docs: DataFrame, passthrough: String*): DataFrame =
    docs
      .withColumn("__sh", gf.word_shingles(col("text"), lit(ShingleN)))
      .filter(size(col("__sh")) > 0)
      .select(passthrough.map(col) :+
        explode(gf.lsh_bands(
          gf.minhash(col("__sh"), lit(MinhashK), lit(MinhashSeed)),
          lit(RowsPerBand))).as("band"): _*)

  /**
   * Incremental first-wins retention (q87): dedup a NEW crawl increment
   * against the already-ingested corpus using only its BAND STATE — the
   * shape an incremental 100-TB pipeline actually runs, because the old
   * corpus's text never needs to be touched again (state is one row per
   * distinct seen band, exactly the streaming NearDup state, here in
   * batch form). A new doc is kept iff every one of its bands is (a)
   * absent from `seenBands` and (b) first-claimed BY IT among the new
   * batch (min id). When old ids precede new ids this equals the global
   * first-wins rule restricted to the new docs — which is how the q87
   * oracle independently re-derives it from the full corpus.
   */
  def incrementalKept(newDocs: DataFrame, seenBands: DataFrame): DataFrame = {
    val nb = banded(newDocs, "doc_id")
    val owner = nb.groupBy(col("band")).agg(min(col("doc_id")).as("owner"))
    nb.join(owner, Seq("band"))
      .join(seenBands.select(col("band")).distinct().withColumn("__seen", lit(1)),
        Seq("band"), "left")
      .groupBy(col("doc_id"))
      .agg(min(when(col("owner") === col("doc_id") && col("__seen").isNull, 1)
        .otherwise(0)).as("k"))
      .select(col("doc_id"), (col("k") === 1).as("kept"))
  }

  /**
   * Connected components of the near-dup pair graph — the CLUSTER-level
   * retention a production dedup pass runs (keep one representative per
   * component of the verified-pair graph), complementing the greedy
   * first-wins rule. Iterative min-label propagation to fixpoint:
   * label(doc) := min(label(doc), min label over neighbors), repeated
   * until no label changes — deterministic at any partitioning (min is
   * order-free), converging to component = min doc id reachable.
   *
   * Scale shape: each iteration is one equi-join (edges x labels) + one
   * groupBy-min + one left join — all shuffles on doc-id keys, state is
   * the (docs-in-pairs)-sized label frame, lineage broken per iteration
   * by the same size-gated localize the kNN stages use (q62's iterative
   * k-means discipline). Iteration count is the graph diameter, which
   * for LSH near-dup clusters is small; `maxIter` is a guard, not a
   * tuning knob — hitting it throws rather than returning a
   * half-converged labeling. (The large-star/small-star variant halves
   * the iteration count at extreme diameters; min-propagation is the
   * right default while diameters stay single-digit.)
   *
   * Returns `(doc_id, component)` for every doc appearing in `pairs`.
   */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20,
                          maxLocalRows: Int = 1 << 20): DataFrame = {
    // SIZE-GATED LOCAL FINISH (r6, guide §1.2 "the distributed algorithm
    // first"): the loop below already probe-collects the whole edge set
    // every round (localizeOrCheckpoint's size gate). When the canonical
    // edge set fits that same gate, the fixpoint is computable from the
    // ALREADY-COLLECTED rows in one union-find pass (component = min
    // reachable id — exactly the loop's fixpoint), replacing
    // diameter-many (join + groupBy + left-join + convergence-count)
    // micro-job rounds with zero extra jobs. The at-scale path — edge
    // sets past the gate, the only kind a 100-TB corpus produces — is
    // the unchanged relational loop; this is the standard "contract,
    // then finish the tail locally" CC pattern, not a fixture shortcut:
    // the gate is on data size, not on which query is running.
    val probe = pairs.select(col("doc_a"), col("doc_b"))
      .limit(maxLocalRows + 1).collect()
    if (probe.length <= maxLocalRows)
      return localComponents(pairs.sparkSession, probe, pairs.schema("doc_a").dataType)
    // materialize the edge list ONCE: every iteration references it, and
    // without a lineage break the whole pair-generation upstream (the
    // minhash banding in q78's case) would re-execute per round —
    // measured 3.9s -> the edges are the loop's working set, exactly like
    // q62's centroids
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .localCheckpoint()
    var labels = graft.sources.Storage.localizeOrCheckpoint(
      edges.select(col("src").as("doc_id")).distinct()
        .withColumn("component", col("doc_id")), maxLocalRows)
    var it = 0
    while (it < maxIter) {
      val nbrMin = edges
        .join(labels.select(col("doc_id").as("dst"), col("component").as("dst_c")), Seq("dst"))
        .groupBy(col("src").as("doc_id")).agg(min(col("dst_c")).as("nbr_c"))
      val next = graft.sources.Storage.localizeOrCheckpoint(
        labels.join(nbrMin, Seq("doc_id"), "left")
          .select(col("doc_id"),
            least(col("component"), coalesce(col("nbr_c"), col("component"))).as("component")),
        maxLocalRows)
      val changed = next.as("n")
        .join(labels.as("o"), col("n.doc_id") === col("o.doc_id"))
        .filter(col("n.component") < col("o.component")).count()
      labels = next
      if (changed == 0L) return labels
      it += 1
    }
    throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter iterations — " +
        "graph diameter exceeds the guard; raise maxIter deliberately")
  }

  /**
   * Union-find over a size-gated, already-collected edge array — the
   * local finish shared by [[connectedComponents]] and
   * [[connectedComponentsStar]]. Component = min vertex id of the
   * component (the fixpoint both relational forms converge to; union
   * keeps the smaller root as parent so the final root IS the min).
   * Output: one row per distinct vertex of the edge set,
   * `(doc_id, component)`, id column typed like the input.
   */
  private def localComponents(spark: org.apache.spark.sql.SparkSession,
                              edgeRows: Array[org.apache.spark.sql.Row],
                              idType: org.apache.spark.sql.types.DataType): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val parent = new java.util.HashMap[Long, Long](edgeRows.length * 2)
    def ensure(x: Long): Unit = if (!parent.containsKey(x)) parent.put(x, x)
    def find(x: Long): Long = {
      var r = x
      while (parent.get(r) != r) r = parent.get(r)
      var c = x
      while (parent.get(c) != c) { val n = parent.get(c); parent.put(c, r); c = n }
      r
    }
    def longOf(v: Any): Long = v.asInstanceOf[Number].longValue()
    edgeRows.foreach { r =>
      val a = longOf(r.get(0)); val b = longOf(r.get(1))
      ensure(a); ensure(b)
      val ra = find(a); val rb = find(b)
      if (ra != rb) parent.put(math.max(ra, rb), math.min(ra, rb))
    }
    import scala.jdk.CollectionConverters._
    def boxed(v: Long): Any = idType match {
      case LongType => java.lang.Long.valueOf(v)
      case org.apache.spark.sql.types.IntegerType => java.lang.Integer.valueOf(v.toInt)
      case other => throw new IllegalArgumentException(s"unsupported id type $other")
    }
    val out: java.util.List[org.apache.spark.sql.Row] =
      parent.keySet().asScala.toSeq.sorted.map { v =>
        org.apache.spark.sql.Row(boxed(v), boxed(find(v)))
      }.asJava
    spark.createDataFrame(out, StructType(Seq(
      StructField("doc_id", idType), StructField("component", idType))))
  }

  /**
   * Connected components by alternating LARGE-STAR / SMALL-STAR rounds
   * (the two-phase star-contraction scheme of Kiveris et al., "Connected
   * Components in MapReduce and Beyond", SoCC'14) — the scale path for
   * HIGH-DIAMETER graphs, where [[connectedComponents]]'s min-label
   * propagation needs one round per hop (a 10^6-hop chain in a 100-TB
   * pair graph would mean 10^6 shuffles; star contraction converges in
   * O(log^2 n) rounds — single digits in practice, diameter-independent).
   *
   * Each round is pure relational algebra, no collect_list (so a
   * high-degree node never materializes its neighborhood in one task):
   *   large-star: m(u) = min(N(u) ∪ {u}); every neighbor v > u re-links
   *     to m(u);
   *   small-star: every neighbor v < u, and u itself, re-links to m(u).
   * Edges stay canonical (lo < hi) + distinct per round, so the edge set
   * monotonically contracts toward per-component stars rooted at the
   * component minimum. Convergence: the canonical edge set is a fixed
   * point exactly when it is a STAR FOREST (no root appears as a leaf, no
   * leaf has two roots) — tested driver-side for free on the size-gate
   * probe rows; the checkpointed big-graph path falls back to
   * (count, bit_xor of a mix64 edge hash) stability, one extra round
   * (order-independent, ANSI-overflow-safe; a checksum collision is
   * guarded by the equivalence spec vs the propagation form).
   *
   * Output shape matches [[connectedComponents]]: one row per vertex of
   * the pair graph, (doc_id, component = component min).
   */
  def connectedComponentsStar(pairs: DataFrame, maxIter: Int = 25,
                              maxLocalRows: Int = 1 << 20): DataFrame = {
    def sym(e: DataFrame): DataFrame =
      e.unionByName(e.select(col("v").as("u"), col("u").as("v")))
    // m(center) = min over the closed neighborhood
    def mins(s: DataFrame): DataFrame = s
      .groupBy(col("u").as("c")).agg(min(col("v")).as("mn"))
      .select(col("c"), least(col("c"), col("mn")).as("m"))
    // large-star: every neighbor v > center re-links to m; since
    // m <= center < v the emit is already canonical, and duplicates are
    // tolerated (the following small-star's groupBy-min absorbs them —
    // one distinct per round, not two)
    def largeStar(e: DataFrame): DataFrame = {
      val s = sym(e)
      s.filter(col("v") > col("u")).join(mins(s), col("u") === col("c"))
        .select(col("m").as("u"), col("v"))
    }
    def smallStar(e: DataFrame): DataFrame = {
      val s = sym(e)
      s.filter(col("v") < col("u")).join(mins(s), col("u") === col("c"))
        .select(least(col("v"), col("m")).as("u"), greatest(col("v"), col("m")).as("v"))
        .unionByName(mins(s).select(least(col("c"), col("m")).as("u"),
          greatest(col("c"), col("m")).as("v")))
        .filter(col("u") =!= col("v")).distinct()
    }
    // One materialization per star phase: each phase's plan references its
    // input from BOTH the filter side and the mins side (and sym doubles
    // it again) — left unmaterialized, one round's tree re-evaluates the
    // previous phase 4x (measured 17.6s for the q96 fixture at sf0.1).
    // The size-gate probe already collects the rows, so convergence is
    // detected driver-side from the SAME collect: the canonical edge set
    // is a FIXED POINT exactly when it is a star forest — no (u, v)
    // chains (roots never appear as leaves) and no leaf shared by two
    // roots — which ends the loop the round convergence happens instead
    // of one checksum-equality round later. The checkpointed big-graph
    // fallback keeps checksum stability (one extra round).
    def materialize(df: DataFrame): (DataFrame, Option[Array[org.apache.spark.sql.Row]]) = {
      val spark = df.sparkSession
      val probe = df.limit(maxLocalRows + 1).collect()
      if (probe.length <= maxLocalRows)
        (spark.createDataFrame(java.util.Arrays.asList(probe: _*), df.schema), Some(probe))
      else (df.localCheckpoint(), None)
    }
    def checksum(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)),
        coalesce(bit_xor(gf.mix64(gf.mix64(col("u")).bitwiseXOR(col("v")))), lit(0L)))
        .collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    var (edges, local0) = materialize(
      pairs.select(least(col("doc_a"), col("doc_b")).as("u"),
          greatest(col("doc_a"), col("doc_b")).as("v"))
        .filter(col("u") =!= col("v")).distinct())
    // SIZE-GATED LOCAL FINISH (r6): when the canonical edge set fits the
    // probe gate, its rows are ALREADY on the driver — one union-find
    // pass yields the identical fixpoint (component = min id) without
    // the per-round micro-jobs (measured ~0.6s/round x ~13 rounds on the
    // q96 fixture even at 1 partition). Past the gate — the 100-TB
    // regime — the star rounds below run unchanged; they are what
    // CONTRACTS a huge graph down to (eventually) local size.
    local0 match {
      case Some(rows) =>
        return localComponents(pairs.sparkSession, rows,
          pairs.schema("doc_a").dataType)
      case None => ()
    }
    val spark = edges.sparkSession
    var chk = checksum(edges)
    var it = 0
    var converged = false
    while (!converged && it < maxIter) {
      val (large, _) = materialize(largeStar(edges))
      val (small, localRows) = materialize(smallStar(large))
      edges = small
      localRows match {
        case Some(rows) =>
          // contraction brought the edge set under the local gate:
          // finish with the same union-find the front gate uses
          // (connectivity and the vertex set are contraction
          // invariants — the final star-forest extraction below
          // relies on exactly the same property)
          return localComponents(spark, rows, pairs.schema("doc_a").dataType)
        case None =>
          val next = checksum(edges)
          converged = next == chk
          chk = next
      }
      it += 1
    }
    if (!converged) throw new IllegalStateException(
      s"connectedComponentsStar did not converge in $maxIter rounds")
    // fixed point = disjoint stars rooted at each component's min: a
    // non-root's sole neighbor is its root; a root keeps itself
    graft.sources.Storage.localizeOrCheckpoint(
      sym(edges).groupBy(col("u").as("doc_id"))
        .agg(min(col("v")).as("mn"))
        .select(col("doc_id"), least(col("doc_id"), col("mn")).as("component")),
      maxLocalRows)
  }

  /**
   * Leakage-safe train/val/test split (q86): assignment is a hash of the
   * near-dup COMPONENT id, not the doc id — near-duplicates can never
   * straddle the train/eval boundary (the contamination a doc-keyed
   * split invites at corpus scale). Docs outside every pair are their
   * own singleton component (component = doc_id). Thresholds are
   * percentage points of `mix64(component) pmod 100`.
   */
  /**
   * Incremental connected components (q110): fold a corpus INCREMENT into
   * existing near-dup component labels without recomputing — or even
   * touching — the old corpus's pair graph. State persisted by the
   * previous run: `oldLabels` (doc_id, component), `oldBands`
   * (doc_id, band — the same state q87 keeps), `oldSh` (doc_id, sh —
   * the per-doc feature state candidate verification needs; at 100 TB
   * this would be hashed shingles, same machinery — q27 proves the hash
   * replay). New edges are only new↔new (band self-join WITHIN the
   * increment) and old↔new (increment bands joined against the old band
   * state); old↔old connectivity is carried by LABEL EDGES
   * (doc -> its component min), so the merge shuffles O(increment edges
   * + old labels) — never the old pair graph, never old text. The
   * result provably equals the direct components over the full corpus
   * (contraction argument: label edges preserve exactly the old
   * components' connectivity), which is what the q110 oracle certifies
   * by closing the FULL verified pair graph recursively.
   */
  def incrementalComponents(oldLabels: DataFrame, oldBands: DataFrame, oldSh: DataFrame,
                            newDocs: DataFrame, threshold: Double = 0.5,
                            maxLocalRows: Int = 1 << 20): DataFrame = {
    val nb = banded(newDocs, "doc_id")
    val nsh = shingleState(newDocs)
    def verify(cand: DataFrame, fa: DataFrame, fb: DataFrame): DataFrame =
      cand.join(fa.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
        .join(fb.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
        .filter(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double") >= threshold)
        .select(col("doc_a"), col("doc_b"))
    val nn = verify(
      nb.as("a").join(nb.as("b"),
          col("a.band") === col("b.band") && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct(),
      nsh, nsh)
    val on = verify(
      oldBands.as("o").join(nb.as("n"), col("o.band") === col("n.band"))
        .select(col("o.doc_id").as("doc_a"), col("n.doc_id").as("doc_b")).distinct(),
      oldSh, nsh)
    val labelEdges = oldLabels.filter(col("doc_id") =!= col("component"))
      .select(col("doc_id").as("doc_a"), col("component").as("doc_b"))
    connectedComponents(nn.unionByName(on).unionByName(labelEdges))
  }

  /** The per-doc feature state [[incrementalComponents]] verifies with:
    * word-[[ShingleN]]-shingle arrays, shingle-less docs excluded (the
    * same rule as [[banded]] — they are never near-dup candidates). */
  def shingleState(docs: DataFrame): DataFrame =
    docs.withColumn("sh", gf.word_shingles(col("text"), lit(ShingleN)))
      .filter(size(col("sh")) > 0).select(col("doc_id"), col("sh"))

  /**
   * The jaccard-verified near-dup pair graph — the shared front half of
   * q78 (component retention), q86 (leakage-safe split) and q105
   * (best-of-cluster): [[banded]] LSH candidates (band-keyed ids-only
   * self-join) -> exact word-[[ShingleN]]-shingle jaccard on candidates
   * only. Deliberately LAZY (r6 measurement): the self-join evaluates the
   * minhash kernel twice and the two verify joins the shingle kernel
   * twice more, but materializing either frame adds a job (~0.3-0.5 s)
   * that buys back only ~50-100 ms of kernel re-evaluation at bench
   * scale — measured net-negative (OPTIMIZATION_r06.md "Negative
   * results"); at production scale the caller persists the banded frame
   * across its consumers instead.
   */
  def verifiedPairs(docs: DataFrame, threshold: Double = 0.5,
                    maxLocalRows: Int = 1 << 20): DataFrame = {
    val bands = banded(docs, "doc_id")
    val feat = shingleState(docs)
    val cand = bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b")).distinct()
    cand
      .join(feat.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(feat.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .filter(size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
        size(array_union(col("sh_a"), col("sh_b"))).cast("double") >= threshold)
      .select(col("doc_a"), col("doc_b"))
  }

  def leakageSafeSplit(docs: DataFrame, pairs: DataFrame,
                       trainPct: Int = 90, valPct: Int = 5): DataFrame = {
    require(trainPct + valPct < 100, "need a nonempty test slice")
    val comps = connectedComponents(pairs)
    val bucket = pmod(graft.functions.mix64(col("component")), lit(100L))
    docs.select(col("doc_id"))
      .join(comps, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("component"), col("doc_id")).as("component"))
      .withColumn("split",
        when(bucket < trainPct, "train")
          .when(bucket < trainPct + valPct, "val")
          .otherwise("test"))
  }

  // -------------------------------------------------------------------
  // Embedding-space near-dup retention (r4 verdict top item): the same
  // candidates -> exact-verify -> component-retention funnel the minhash
  // family has (banded -> firstWins/components), over an embedding column
  // instead of text shingles. No stage is all-pairs.
  // -------------------------------------------------------------------

  /** q89's hyperplane-LSH table/bit/seed constants — q31's exact scheme
    * (seed base 100, bit stride in `TextOps.hyperplaneLsh`), so the
    * DuckDB replay reuses the same published hyperplane literals. */
  val EmbTables = 4
  val EmbBits = 8
  val EmbSeed = 100L

  /** One row per (vec_id, bucket): the vector's LSH bucket in each of
    * `nTables` hyperplane tables ("tbl:signBits"). The q31 candidate
    * scheme as a reusable frame.
    *
    * Sizing at scale: expected bucket size is n / 2^nBits per table, and
    * the candidate join below is quadratic IN THE BUCKET — `nBits` must
    * grow with log2(corpus) (e.g. 2^40 vectors -> ~30+ bits keeps buckets
    * ~1k) exactly as minhash band width tracks target similarity. The
    * parameters are explicit so the 10^12-row deployment sets them; the
    * fixture uses q31's 4x8 so the oracle's hyperplane constants are
    * shared. */
  def embeddingBuckets(emb: DataFrame, nTables: Int = EmbTables,
                       nBits: Int = EmbBits, seed: Long = EmbSeed): DataFrame =
    emb.select(col("vec_id"),
      explode(array((0 until nTables).map(i =>
        concat(lit(i), lit(":"),
          gf.hyperplane_lsh(col("embedding"), lit(nBits), lit(seed + i)))): _*))
        .as("bucket"))

  /** Distinct candidate pairs (vec_a < vec_b) sharing any table's bucket —
    * a bucket-keyed equi-join (shuffles ids only, never embeddings), the
    * embedding analog of minhash band collision. Recall < 1 by
    * construction; DedupSpec pins measured candidate recall vs the brute
    * anchor on the fixture. */
  def embeddingCandidates(emb: DataFrame, nTables: Int = EmbTables,
                          nBits: Int = EmbBits, seed: Long = EmbSeed,
                          maxLocalRows: Int = 1 << 20): DataFrame = {
    val b = embeddingBuckets(emb, nTables, nBits, seed)
    b.select(col("bucket"), col("vec_id").as("vec_a"))
      .join(b.select(col("bucket"), col("vec_id").as("vec_b")), Seq("bucket"))
      .filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"))
      .distinct()
  }

  /**
   * Scalable embedding near-dup retention (q89): LSH candidates ->
   * exact-cosine verify ON CANDIDATES ONLY -> connected-component
   * retention (keep = smallest vec_id of its component; singletons keep
   * themselves). Returns one row per input vector:
   * `(vec_id, component, kept)`.
   *
   * Scale shape, stage by stage: candidate generation shuffles (bucket,
   * id) pairs — embeddings never leave their map side until the verify
   * join; the verify stage joins the (sparse) candidate set back to the
   * embedding table by id (two id-keyed shuffles of only candidate rows);
   * retention reuses [[connectedComponents]]'s iterative min-label
   * propagation with size-gated lineage breaks. Driver state is O(1).
   * The all-pairs brute form exists only as q32's labeled anchor.
   */
  def embeddingKept(emb: DataFrame, threshold: Double = 0.8,
                    nTables: Int = EmbTables, nBits: Int = EmbBits,
                    seed: Long = EmbSeed, maxLocalRows: Int = 1 << 20): DataFrame = {
    val cand = embeddingCandidates(emb, nTables, nBits, seed, maxLocalRows)
    val verified = cand
      .join(emb.select(col("vec_id").as("vec_a"), col("embedding").as("__ea")), Seq("vec_a"))
      .join(emb.select(col("vec_id").as("vec_b"), col("embedding").as("__eb")), Seq("vec_b"))
      .filter(gf.cosine_sim(col("__ea"), col("__eb")) >= threshold)
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
    val comps = connectedComponents(verified, maxLocalRows = maxLocalRows)
      .withColumnRenamed("doc_id", "vec_id")
    emb.select(col("vec_id"))
      .join(comps, Seq("vec_id"), "left")
      .select(col("vec_id"), coalesce(col("component"), col("vec_id")).as("component"))
      .withColumn("kept", col("component") === col("vec_id"))
  }

  /**
   * First-wins retention over a [[banded]] frame: `(doc_id, kept)` where
   * kept = the doc is the smallest-id claimant of EVERY band it occupies
   * ("dedup against seen" — the greedy order-respecting rule a single
   * streaming pass can honor). Band-keyed groupBy + equi-join + doc-keyed
   * groupBy: no all-pairs stage, partial aggregation map-side throughout.
   */
  def firstWinsKept(banded: DataFrame): DataFrame = {
    val owner = banded.groupBy(col("band")).agg(min(col("doc_id")).as("owner"))
    banded.join(owner, Seq("band"))
      .groupBy(col("doc_id"))
      .agg(min(when(col("owner") === col("doc_id"), 1).otherwise(0)).as("k"))
      .select(col("doc_id"), (col("k") === 1).as("kept"))
  }

  /**
   * Exact-substring duplicated spans (q101) — the "dedup of repeated
   * sequences" stage (word-level analog of suffix-array substring dedup):
   * every word `n`-gram occurring ≥ 2 times ANYWHERE in the corpus
   * (cross-doc or self-repetition) marks its span; overlapping-or-
   * adjacent marked spans merge per doc into maximal
   * `[span_start, span_end]` word ranges — the ranges a curation pass
   * cuts before training. Returns (doc_id, span_start, span_end,
   * span_words); docs with no duplicated span are absent.
   *
   * Scale shape: gram hashes leave the scan as (doc_id, pos, g) — the
   * text never shuffles; the duplicate-gram set is one ids-only groupBy;
   * the join back is g-keyed; the merge is a lag + running-sum window
   * INSIDE each doc's partition (docs are bounded, the window never
   * spans a corpus). Identical semantics replay in the DuckDB oracle via
   * the q70 tokenization parity forms + gaps-and-islands windows.
   */
  def duplicatedSpans(docs: DataFrame, n: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grams = docs
      .select(col("doc_id"), posexplode(gf.word_shingles(col("text"), lit(n))))
      .select(col("doc_id"), col("pos"), gf.hash_text(col("col")).as("g"))
    // duplicated-gram detection as ONE count-over-window pass instead of
    // groupBy + join-back (r6, guide §2.3): the join form evaluates the
    // gram explode/hash subtree twice (once under the aggregate, once on
    // the probe side) and shuffles it twice; a count() over the g
    // partition shuffles the (doc_id, pos, g) longs ONCE and filters in
    // place — identical surviving (doc_id, pos) rows, one gram-kernel
    // evaluation, one g-keyed exchange.
    val wg = Window.partitionBy(col("g"))
    val hits = grams.withColumn("cnt", count(lit(1)).over(wg))
      .where(col("cnt") >= 2).select(col("doc_id"), col("pos"))
    // positions sort ascending per doc, so lag(pos) IS the running max of
    // prior span starts; a new island begins when this span cannot touch
    // the previous one (start > prev_start + n ⇔ start > prev_end + 1)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val lagged = hits.withColumn("prev", lag(col("pos"), 1).over(w))
      .withColumn("isn",
        when(col("prev").isNull || col("pos") > col("prev") + n, 1).otherwise(0))
      .withColumn("island",
        sum(col("isn")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    lagged.groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + lit(n - 1)).as("span_end"))
      .select(col("doc_id"), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + lit(1)).as("span_words"))
  }
}
