package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables.load

/** Similarity search over the `embeddings` table (64-dim float vectors,
  * unit-normalized by the generator).
  *
  * Scale design (100 TB): brute-force top-k is the *per-query* baseline —
  * a broadcast of the (small) query set against a scan of the corpus, one
  * shuffle for the per-query top-k. That is linear in corpus size and the
  * right plan when the query set is small. The scale path is
  * [[q_ann_lsh]]: random-hyperplane LSH buckets both sides, so candidate
  * scoring touches only same-bucket vectors (the shuffle keys on bucket
  * id); recall is tested against the brute-force oracle in ScalaTest.
  * All arithmetic is double-precision with a sequential left-fold, which
  * DuckDB's list functions reproduce exactly.
  */
object VectorOps {

  /** Sequential-left-fold dot product of two double arrays (codegen'd
    * higher-order functions; deterministic summation order).
    */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** Cosine similarity (vectors need not be normalized). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Deterministic pseudo-random hyperplanes: weight(p, d) derived from a
    * splitmix64-style integer mix of (p, d) — reproducible across runs
    * and engines, no RNG state.
    */
  // 4 planes → 16 buckets: sized for the testdata corpus (500–2000
  // vectors → ~30–125 candidates/bucket). At 100 TB you'd raise this so
  // the expected bucket population stays in the 10³–10⁴ range (each
  // +1 plane halves it) — the plan shape is unchanged.
  private val NumPlanes = 4
  private val Dim = 64

  /** Aggregate recall floor for the LSH-bucketed near-dup path on this
    * corpus (isotropic random vectors — hyperplane LSH's worst case:
    * a cos-0.3 pair sits at ~72°, P(plane agrees) ≈ 0.6). Measured
    * 0.47–0.49 across every testdata sf; deterministic for the fixed
    * planes + corpus, pinned with margin at 0.4.
    */
  private val EmbedLshRecallFloor = 0.4
  // SemDeDup same-cell recall of exactly-dominated vectors; isotropic
  // random vectors are the worst case (see q_semdedup). Measured 0.52 /
  // 0.57 / 0.80 at sf0.001/0.01/0.1; pinned with margin.
  private val SemDedupRecallFloor = 0.35
  private def planeWeight(p: Int, d: Int): Double = {
    var z = (p.toLong * 0x9E3779B97F4A7C15L) + (d.toLong * 0xBF58476D1CE4E5B9L) + 0x94D049BB133111EBL
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    // map to [-1, 1)
    (z >>> 11).toDouble / (1L << 52).toDouble - 1.0
  }

  /** Sign-bit bucket id of a vector under the fixed hyperplanes. */
  def lshBucket(vec: Column): Column = {
    val bits = (0 until NumPlanes).map { p =>
      val plane = array((0 until Dim).map(d => lit(planeWeight(p, d))): _*)
      when(dot(vec, plane) >= 0.0, lit(1L << p)).otherwise(0L)
    }
    bits.reduce(_ + _)
  }

  /** Corpus as (vec_id, v: array<double>). */
  private def corpusOf(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "embeddings")
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))

  /** The fixed small default query set (vec_id < 3). */
  private val DefaultQueryPred: Column = col("vec_id") < 3

  /** Scale-tier ANN fixture (VERDICT r9 #7: the 2000-vector sf0.1
    * embeddings table makes the ANN contracts honest but toy): each base
    * vector replicated [[AnnScaleRep]]× with a tiny deterministic
    * integer-derived per-dimension perturbation — 100k vectors at
    * sf0.1, 25k at the sf0.01 gate. The perturbation (≤ ±0.008/dim) is
    * small enough that a base vector's replicas form a tight cluster
    * (the realistic ANN regime: near-duplicate density, not pure
    * isotropy) and large enough that replicas separate: the modulus
    * 1009 is prime, exceeds every replication this fixture runs at
    * (50 for the gate, 500 for the 1M bench tier), and is coprime to
    * any plausible id stride, so two replicas of one base get identical
    * perturbations only if their vec_ids collide mod 1009 — never for
    * r ≠ r' < 1009 unless nBase ≡ 0 (mod 1009) (ADVICE r10: the old
    * mod-17 scheme collapsed replicas 17 apart). Pure
    * integer arithmetic — no RNG state, deterministic across runs; the
    * oracle never recomputes vectors (its anchors are ids and corpus
    * counts), so only in-engine determinism is load-bearing.
    */
  private val AnnScaleRep = 50
  private val AnnScaleQueries = 20
  private val AnnScaleCells = 256
  private val AnnScaleProbes = 8

  /** Replica-MAJOR ids (vec_id = r·nBase + base): the low id range is
    * replica 0 of DISTINCT bases, so the first-k seeding of both the
    * coarse Lloyd quantizer and the PQ codebooks sees k different
    * clusters. Base-major ids put 50 copies of base 0 in the seed set —
    * the coarse quantizer collapsed and both scale contracts failed.
    * nBase is the fixture table's row count — a bounded driver scalar,
    * same class as the Lloyd argmax.
    */
  private[queries] def scaledCorpus(s: SparkSession, dir: String,
                                    rep: Int = AnnScaleRep): DataFrame = {
    val base = load(s, dir, "embeddings")
      .select(col("vec_id").cast("long").as("base_id"),
        asDouble(col("embedding")).as("bv"))
    val nBase = base.count()
    // The fixture parquet is ONE file → ONE partition, and explode
    // preserves partitioning — without this repartition the entire
    // rep×-replicated corpus (1M rows at the 1M tier) sat in a single
    // partition and every downstream pass (coarse assign, residual
    // explode, PQ encode) ran on ONE of the 32 cores (r12 measured the
    // 1M coarse assignment at 50.8 s single-threaded vs ~2 s parallel).
    // Shuffling the BASE is the cheap side of the fan-out: nBase rows
    // move, the ×rep explosion happens after, already spread. Hash
    // partitioning by base_id makes the partition ASSIGNMENT
    // deterministic; within-partition row order is NOT (shuffle block
    // fetch order varies run over run). Downstream consumers don't
    // depend on it: seed selection is order-insensitive
    // (orderBy(vec_id).limit), and the recall contracts carry slack.
    base.repartition(col("base_id"))
      .withColumn("r", explode(sequence(lit(0), lit(rep - 1))))
      .withColumn("vec_id", col("r") * nBase + col("base_id"))
      .select(col("vec_id"),
        transform(sequence(lit(1), lit(Dim)), d =>
          element_at(col("bv"), d) +
            (pmod(col("vec_id") * 31 + d.cast("long") * 7, lit(1009)) - lit(504))
              .cast("double") / lit(60000.0)).as("v"))
  }

  /** The query set under `pred` as (query_id, qv). */
  private def querySetOf(emb: DataFrame,
                         pred: Column = DefaultQueryPred): DataFrame =
    emb.where(pred)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))

  private def topK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("query_id").orderBy(desc("cos"), asc("vec_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"))
  }

  /** Brute-force cosine top-k: broadcast queries × corpus scan, per-query
    * top-k via window. Linear in corpus size — the per-query baseline.
    */
  def annBruteForce(emb: DataFrame, k: Int): DataFrame = {
    val scored = emb.join(broadcast(querySetOf(emb)), col("vec_id") =!= col("query_id"))
      .withColumn("cos", dot(col("qv"), col("v")))
    topK(scored, k)
  }

  /** LSH-bucketed ANN with multi-probe: corpus vectors hashed to sign-bit
    * buckets once; each query probes its own bucket plus every Hamming-1
    * neighbor. Scoring touches only probed buckets — candidate set ≈
    * (1+planes)/2^planes of the corpus, the scale path vs a full scan.
    */
  def annLsh(emb: DataFrame, k: Int): DataFrame = {
    val bucketed = emb.withColumn("bucket", lshBucket(col("v")))
    val probes = (0 until NumPlanes).map(p => col("bucket").bitwiseXOR(1L << p))
    val queriesDf = bucketed.where(col("vec_id") < 3)
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        explode(array((col("bucket") +: probes): _*)).as("bucket"))
    val scored = bucketed.join(broadcast(queriesDf), Seq("bucket"))
      .where(col("vec_id") =!= col("query_id"))
      // a neighbor can surface via several probes — dedup before ranking
      .dropDuplicates("query_id", "vec_id")
      .withColumn("cos", dot(col("qv"), col("v")))
    topK(scored, k)
  }

  /** IVF-style ANN: deterministic coarse quantizer (first-k vectors as
    * seeds, two Lloyd refinement passes — all DataFrame ops, only the k
    * centroids ever touch the driver), corpus assigned to its nearest
    * centroid, each query probes the `nprobe` closest cells. The scale
    * path when hyperplane LSH recall is poor: cells adapt to the data.
    */
  /** Deterministic k-means fit: seed = first `cells` vectors by id, two
    * Lloyd passes (assign → element-wise mean). Only ever `cells` rows —
    * broadcastable by construction; each pass is one corpus-linear
    * assignment plus a (cell, dim)-keyed mean, no driver math.
    *
    * CONTRACT: the returned frame is eagerly localCheckpointed (the
    * trailing pin of the final Lloyd pass), so every downstream
    * re-evaluation — however many subplans reference it — reads the SAME
    * materialized centroid values, bitwise. Without the pin, a re-run of
    * the mean aggregation could fold floats in a different shuffle
    * arrival order and yield bitwise-different centroids per subplan
    * (ADVICE r13 #4).
    */
  private[queries] def lloydCentroids(cached: DataFrame, cells: Int): DataFrame = {
    var centroids = cached.orderBy(col("vec_id")).limit(cells)
      .select(col("vec_id").cast("int").as("cell"), col("v").as("cv"))
    for (_ <- 0 until 2) {
      val assigned = assignCells(cached, centroids)
      centroids = assigned
        .select(col("cell"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy(col("cell"), col("pos")).agg(avg(col("x")).as("mx"))
        .groupBy(col("cell"))
        .agg(array_sort(collect_list(struct(col("pos"), col("mx")))).as("pairs"))
        .select(col("cell"), transform(col("pairs"), p => p.getField("mx")).as("cv"))
        // k rows — materialize so the next Lloyd pass (and the final
        // assignment) doesn't re-execute this pass's whole lineage
        .localCheckpoint(true)
    }
    centroids
  }

  /** Nearest-cell assignment as a NARROW map (the pqAssign pattern):
    * the centroid frame packs to ONE cell-sorted entry array,
    * broadcast, and the argmax runs inline per corpus row via
    * transform + array_max over (similarity, -cell) structs — max
    * similarity, ties to the LOWEST cell id, bit-identical to the
    * crossJoin + row_number form it replaces. The old form blew each
    * corpus row up ×cells and pushed the blowup through a
    * vec_id-keyed sort window: at the 100k-vector scale fixture with
    * 256 cells that was a 25.6M-row shuffle per Lloyd/assignment pass
    * (~5/6 of q_ann_ivfpq_scale's 344 s); the narrow form shuffles
    * nothing.
    */
  private[queries] def assignCells(cached: DataFrame, cents: DataFrame): DataFrame = {
    val packed = cents.agg(
      array_sort(collect_list(struct(col("cell"), col("cv")))).as("es"))
    cached.crossJoin(broadcast(packed))
      .select(col("vec_id"), col("v"),
        graft.functions.NearestCell(col("v"), col("es")).as("cell"))
  }

  /** Two-level (hierarchical) coarse assignment — the IMI/coarse-of-
    * coarse trick that removes the n × cells term from IVF builds at
    * large cell counts: cluster the CENTROIDS into ~√cells super-cells,
    * route each vector to its nearest super (superK dots), then argmax
    * only over the cells whose top-`memberR` supers include it
    * (≈ memberR·cells/superK dots). At the 10M tier (2048 cells, 64
    * supers) that is ~128 dot-equivalents per vector instead of 2048 —
    * the stage that measured 103 s of the 152 s build. Assignment
    * becomes approximate (a vector lands in its true best cell iff that
    * cell's membership covers the vector's super — overwhelmingly true
    * for clustered data since nearby cells share supers), which IVF
    * tolerates by construction: the index stays internally consistent
    * (queries probe the same assignment), and the tier's recall +
    * scanned-fraction contracts gate the approximation. Rows whose
    * super has an empty membership list (possible if a degenerate super
    * is in no cell's top-R) fall back to the exact full argmax via a
    * per-row CASE — never dropped, never null. sortWithinPartitions on
    * the super id keeps NearestCell's per-task unpack memo hot (runs of
    * equal super reuse one unpacked member array). Small cell counts
    * (< 4 × superK) keep the exact single-level form — the hierarchy
    * only pays past that.
    */
  private[queries] def assignCellsHierarchical(
      cached: DataFrame, cents: DataFrame,
      superK: Int = 64, memberR: Int = 4): DataFrame = {
    val nCells = cents.count()
    if (nCells < 4L * superK) return assignCells(cached, cents)
    val superCents = lloydCentroids(
      cents.select(col("cell").cast("long").as("vec_id"), col("cv").as("v")),
      superK)
      .select(col("cell").as("super"), col("cv").as("scv"))
    // membership: every cell joins its memberR nearest supers, so a
    // vector routed to super s sees all cells for which s is a top-R
    // super — the overlap that makes near-boundary assignments agree
    // with the exact argmax
    val member = cents.crossJoin(broadcast(superCents))
      .withColumn("d", graft.functions.CosineSimilarity(col("cv"), col("scv")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("cell").orderBy(desc("d"), asc("super"))))
      .where(col("rn") <= memberR)
      .select(col("super"), col("cell"), col("cv"))
    val packedBySuper = member.groupBy(col("super"))
      .agg(array_sort(collect_list(struct(col("cell"), col("cv")))).as("sub_es"))
    val superPacked = superCents.agg(array_sort(collect_list(
      struct(col("super").as("cell"), col("scv").as("cv")))).as("ses"))
    val fullPacked = cents.agg(
      array_sort(collect_list(struct(col("cell"), col("cv")))).as("full_es"))
    // No row clustering needed before the membership join: NearestCell's
    // per-thread unpack memo is an LRU sized for the whole superK-way
    // member-array working set, so rows can interleave supers freely.
    // (Two rejected alternatives, both measured: sorting AFTER the join
    // materializes each row WITH its joined ~66 KB member array into the
    // sort buffer — a ~660 GB spill that filled the disk at the 10M
    // tier; sorting BEFORE it spills a 5.5 GB sorter per pass just to
    // keep a one-slot memo hot.) The final projection consumes sub_es
    // from the broadcast row without ever copying it into an output row.
    cached.crossJoin(broadcast(superPacked))
      .withColumn("super", graft.functions.NearestCell(col("v"), col("ses")))
      .drop("ses")
      .join(broadcast(packedBySuper), Seq("super"), "left")
      .crossJoin(broadcast(fullPacked))
      .select(col("vec_id"), col("v"),
        when(col("sub_es").isNotNull,
          graft.functions.NearestCell(col("v"), col("sub_es")))
          .otherwise(graft.functions.NearestCell(col("v"), col("full_es")))
          .as("cell"))
  }

  def annIvf(emb: DataFrame, k: Int, cells: Int = 8, nprobe: Int = 3): DataFrame = {
    val cached = emb.cache()
    val cents = broadcast(lloydCentroids(cached, cells))

    val corpus = assignCells(cached, cents)

    // NARROW probe routing (r17, same as ivfPqQuery): centroids pack to
    // one broadcast cell-sorted array and each query row sorts its
    // per-cell (−similarity, cell) structs inline, keeping the first
    // nprobe — identical selection and tie-break (max similarity, ties
    // to the lowest cell) as the row_number window it replaces, with
    // zero shuffle instead of an exchange + sort on queries×cells rows.
    val centsPacked = cents.agg(
      array_sort(collect_list(struct(col("cell"), col("cv")))).as("pes"))
    val queryProbes = cached.where(col("vec_id") < 3).crossJoin(broadcast(centsPacked))
      .select(col("vec_id").as("query_id"), col("v").as("qv"),
        slice(array_sort(transform(col("pes"), e => struct(
          (-graft.functions.CosineSimilarity(col("v"), e.getField("cv"))).as("negd"),
          e.getField("cell").as("cell")))), 1, nprobe).as("probes"))
      .select(col("query_id"), col("qv"), explode(col("probes")).as("p"))
      .select(col("query_id"), col("qv"), col("p.cell").as("cell"))

    val scored = corpus.join(broadcast(queryProbes), Seq("cell"))
      .where(col("vec_id") =!= col("query_id"))
      .dropDuplicates("query_id", "vec_id")
      .withColumn("cos", graft.functions.CosineSimilarity(col("qv"), col("v")))
    topK(scored, k)
  }

  /** Product quantization (Jégou et al. 2011): 64 dims → PqM subspaces
    * of PqSubDim dims, PqK centroids each — vectors code to PqM small
    * ints (32× memory compression at these parameters), queries score
    * codes through a per-query PqM×PqK partial-dot lookup table (ADC).
    * The memory-scale path past IVF: a billion-vector corpus scan reads
    * codes, never raw floats.
    */
  private val PqM = 8
  private val PqSubDim = 8
  private val PqK = 32
  private val PqRerank = 50

  /** (vec_id, m, sv): each vector split into its PqM sub-vectors. */
  private[queries] def subVectors(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("v"),
        explode(sequence(lit(0), lit(PqM - 1))).as("m"))
      .select(col("vec_id"), col("m"),
        slice(col("v"), col("m") * PqSubDim + 1, lit(PqSubDim)).as("sv"))

  /** Nearest-codebook-cell assignment as a NARROW map: the (m, cell,
    * cv) codebook packs to one cell-sorted entry array per subspace
    * (PqM rows), broadcast-joined on m, and the argmin runs inline via
    * a codegen'd transform + array_min over (distance, cell) structs —
    * each entry's squared distance is computed exactly ONCE (the fold
    * form this replaces evaluated it twice per entry, in the WHEN and
    * again in the THEN — ADVICE r8), and struct ordering (d, then c)
    * keeps the lowest cell on ties. No shuffle, no per-candidate row
    * blowup — the join+window form this replaces shuffled corpus×PqK
    * rows through three sort windows and measured ~3× slower
    * end-to-end.
    */
  private[queries] def pqAssign(sub: DataFrame, books: DataFrame): DataFrame = {
    val packed = books.groupBy(col("m"))
      .agg(array_sort(collect_list(struct(col("cell"), col("cv")))).as("es"))
    sub.join(broadcast(packed), Seq("m"))
      // fused native argmin (NearestCellSpec pins bit-parity with the
      // transform+array_min chain this replaces — the composed HOF paid
      // an interpreted lambda + struct alloc per (row, entry): ~80 s of
      // q_ann_ivfpq_scale's encode passes at 800k×32 entries)
      .withColumn("cell", graft.functions.NearestCell.l2(col("sv"), col("es")))
      .drop("es")
  }

  /** Per-subspace deterministic k-means codebooks (m, cell, cv): seeds
    * are the first PqK vectors' sub-vectors, two Lloyd passes, all M
    * subspaces trained in ONE frame. Only ever PqM×PqK rows —
    * broadcastable by construction; assignment is the narrow
    * [[pqAssign]] fold, so each pass shuffles only the (m, cell, pos)
    * mean aggregate.
    */
  private[queries] def pqCodebooks(sub: DataFrame): DataFrame = {
    // seeds stay LAZY (r17): they are a narrow filter+select over the
    // caller's (cached/pinned) frame — bitwise-deterministic on
    // re-evaluation, unlike the per-pass mean aggregates below whose
    // checkpoints ARE load-bearing (ADVICE r13 #4). The checkpoint here
    // bought nothing but one more serial driver job in a query whose
    // gate-scale cost is almost entirely job-chain latency.
    var cents = sub.where(col("vec_id") < PqK)
      .select(col("m"), col("vec_id").cast("int").as("cell"), col("sv").as("cv"))
    for (_ <- 0 until 2) {
      val assigned = pqAssign(sub, cents)
      cents = assigned
        .select(col("m"), col("cell"), posexplode(col("sv")).as(Seq("pos", "x")))
        .groupBy(col("m"), col("cell"), col("pos")).agg(avg(col("x")).as("mx"))
        .groupBy(col("m"), col("cell"))
        .agg(array_sort(collect_list(struct(col("pos"), col("mx")))).as("pairs"))
        .select(col("m"), col("cell"),
          transform(col("pairs"), p => p.getField("mx")).as("cv"))
        .localCheckpoint(true)
    }
    cents
  }

  /** PQ-ADC ANN with exact re-rank: encode the corpus once (nearest
    * codebook cell per subspace, ties to the lowest cell), build each
    * query's partial-dot table against the same codebooks, then approx
    * dot(q, x) = Σ_m table(m, code_x[m]) — a (m, code)-keyed equi-join
    * of the narrow code table against the broadcast 3×PqM×PqK lookup,
    * summed per (query, vector) with map-side partial aggregation. The
    * corpus-wide scan touches only codes; full-precision vectors are
    * read solely for the per-query PqRerank shortlist.
    */
  def annPq(emb: DataFrame, k: Int,
            queryPred: Column = DefaultQueryPred): DataFrame = {
    val sub = subVectors(emb)
    val books = pqCodebooks(sub)
    val codes = pqAssign(sub, books)
      .select(col("vec_id"), col("m"), col("cell").as("code"))
    val table = subVectors(emb.where(queryPred))
      .select(col("vec_id").as("query_id"), col("m"), col("sv"))
      .join(broadcast(books), Seq("m"))
      .select(col("query_id"), col("m"), col("cell").as("code"),
        dot(col("sv"), col("cv")).as("pdot"))
    val approx = codes.join(broadcast(table), Seq("m", "code"))
      .where(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("pdot")).as("adc"))
    // shortlist + exact re-rank (the standard ADC+re-rank design): the
    // code scan nominates PqRerank candidates per query, raw vectors are
    // read ONLY for that bounded shortlist — at a billion vectors the
    // full-precision reads drop from N to queries×PqRerank.
    val shortlist = approx
      .withColumn("rr", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("adc"), asc("vec_id"))))
      .where(col("rr") <= PqRerank)
      .select(col("query_id"), col("vec_id"))
    val scored = shortlist
      .join(emb, Seq("vec_id"))
      .join(broadcast(querySetOf(emb, queryPred)), Seq("query_id"))
      .withColumn("cos", graft.functions.CosineSimilarity(col("qv"), col("v")))
    topK(scored, k)
  }

  /** IVF-PQ composition (Jégou et al. 2011 §IV — the actual
    * billion-vector design): the coarse IVF quantizer bounds the SCAN
    * (a query touches only its `nprobe` probed cells), per-vector
    * RESIDUAL product-quantization codes bound the MEMORY (the probed
    * scan reads PqM byte-sized codes per vector, never raw floats), and
    * ADC scores codes through per-query lookup tables with one exact
    * re-rank over the PqRerank shortlist. Decomposition: dot(q, x) =
    * dot(q, c_cell) + dot(q, r_x) ≈ dot(q, c_cell) + Σ_m dot(q_m,
    * codebook(m, code_x_m)) — the residual tables are the same
    * broadcast-sized frames as [[annPq]]'s, the cell restriction is the
    * same equi-join as [[annIvf]]'s. At a billion vectors this is the
    * only composition where BOTH the bytes read and the rows scanned
    * per query stay bounded.
    */
  def annIvfPq(emb: DataFrame, k: Int, cells: Int = 8, nprobe: Int = 3): DataFrame =
    annIvfPqWithScan(emb, k, cells, nprobe, DefaultQueryPred)._1

  /** [[annIvfPq]] plus its per-query SCAN diagnostic: (top-k frame,
    * (query_id, n_scanned) frame), where n_scanned is the number of
    * corpus vectors in the query's probed cells — the rows whose codes
    * the ADC join reads. n_scanned / corpus is the scanned fraction the
    * scale contract (q_ann_ivfpq_scale) bounds: the property that makes
    * IVF-PQ a billion-vector design is precisely that this stays ≈
    * nprobe/cells instead of 1.
    */
  /** The trained IVF-PQ index: broadcast-sized coarse centroids and PQ
    * codebooks plus the corpus-cardinality code table and per-cell
    * sizes — everything a query needs, nothing of the raw vectors.
    * `stageSec` carries the build-phase attribution when the build was
    * materialized (coarse train / corpus assign / residual explode /
    * codebook train / encode), empty for the lazy registry-gate build.
    */
  private[queries] case class IvfPqIndex(cents: DataFrame, books: DataFrame,
                                         codes: DataFrame, cellSizes: DataFrame,
                                         stageSec: Seq[(String, Double)] = Nil,
                                         scratchDir: Option[String] = None)

  /** Index-build phase (train + encode). `materialize = true`
    * checkpoints the code table and cell sizes — the scale-tier bench
    * uses it to time build and query separately; the registry gate
    * keeps the single lazy plan. With `trainPred`, BOTH quantizers
    * train on the sampled rows only (the faiss regime — coarse
    * centroids AND PQ codebooks train on ≤10⁵-ish sampled vectors /
    * residuals regardless of corpus size; VERDICT r11 #6): training
    * cost is sample-bounded and only the two assignment passes (coarse
    * cell + PQ encode, both the fused narrow NearestCell kernel) stay
    * corpus-linear. Without `trainPred`, training covers the corpus —
    * the small-gate path, bit-identical to previous rounds.
    */
  private def ivfPqBuild(cached: DataFrame, cells: Int,
                         trainPred: Option[Column],
                         materialize: Boolean,
                         nHint: Long = -1L): IvfPqIndex = {
    // (The 10M-tier OOM history, for the next reader: in-memory pins of
    // the 10M-row assigned table and its ×PqM exploded residuals OOM'd
    // the 8 GB heap twice — first in MemoryStore unroll, then in the
    // Java-serialized read-back of spilled localCheckpoint blocks, even
    // with data-sized 50k-row partitions. The parquet scratch pin below
    // is the fix: columnar, streamed, off-heap both ways.)
    val stages = scala.collection.mutable.ArrayBuffer[(String, Double)]()
    // In materialize mode every stage below ends in an EAGER node
    // (localCheckpoint), so wrapping it in stage() yields an honest
    // per-stage wall split; in lazy mode stage() just labels zero-cost
    // plan construction and the Seq stays out of the artifact.
    def stage[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      stages += name -> (System.nanoTime() - t0) / 1e9
      r
    }
    // coarse quantizer trains on the sample (assignment covers the
    // corpus). Pinned ONCE here (cells × dim rows — tiny): the
    // hierarchical super-Lloyd, membership join, empty-membership
    // fallback array, residual subtraction, and the caller's probe join
    // all re-read this frame in separate subplans, and identical
    // centroid VALUES across those reads is what keeps the index
    // internally consistent (ADVICE r13 #4). lloydCentroids already
    // returns an eagerly localCheckpointed frame; the explicit pin makes
    // the invariant a property of THIS function, not of its helper's
    // implementation detail.
    // lloydCentroids CONTRACTS (scaladoc) that its return is already
    // eagerly localCheckpointed — re-pinning it here was one more
    // serial driver job on an 8-row frame in a query path whose
    // gate-scale cost is job-chain latency (r17). The consistency
    // invariant (every subplan reads the SAME centroid bytes) rides on
    // the helper's pin.
    val cents = stage("coarse_train") {
      broadcast(lloydCentroids(trainPred.map(cached.where).getOrElse(cached), cells))
    }
    // In the materialized (scale-tier) build, pin the two expensive
    // intermediates: without this, the full-corpus coarse assignment
    // (the n × cells × dim argmax — 65 GMACs at the 1M tier) and the
    // residual sub-vector explode re-run FOUR times — once per
    // pqCodebooks Lloyd pass, once for the final code table, once for
    // cell sizes (measured: 4× of the 1M tier's 23-minute build was
    // exactly this recomputation). The registry gate keeps the single
    // lazy plan (its exchange counts are snapshot-pinned and its corpus
    // is small enough that recomputation is cheaper than pinning). Pin
    // MECHANISM matters at the 10M tier: localCheckpoint blocks that
    // spill round-trip through Java object serialization on read-back,
    // whose transient object graphs OOM'd the 8 GB heap even at 50k-row
    // partitions — big tiers (nHint > 4M vectors) pin through a parquet
    // scratch round-trip instead (columnar, streamed, off-heap — how a
    // production job materializes a stage), deleted by the caller via
    // IvfPqIndex.scratchDir. Tiers at ≤1M keep the faster in-memory
    // localCheckpoint (measured: parquet pins cost the 100k tier +8 s).
    val scratch: Option[String] =
      if (materialize && nHint > 4000000L)
        Some(java.nio.file.Files.createTempDirectory("graft_ivfpq_pin").toString)
      else None
    var pinN = 0
    def pin(df: DataFrame): DataFrame =
      if (!materialize) df
      else scratch match {
        case Some(dir) =>
          pinN += 1
          val p = s"$dir/pin_$pinN"
          // 16 MB row groups: each of the 32 concurrent writer tasks
          // buffers one row group on-heap before flushing — the default
          // 128 MB × 32 writers was itself an OOM at the 10M tier.
          // Scratch pins are re-read once sequentially, so row-group
          // granularity costs nothing here.
          df.write.option("parquet.block.size", 16L * 1024 * 1024).parquet(p)
          df.sparkSession.read.parquet(p)
        case None => df.localCheckpoint(true)
      }
    val assigned = stage("corpus_assign") {
      // big tiers route through the two-level assignment (superK dots +
      // member-cell argmax instead of the full n × cells wall); the
      // tier contracts gate the approximation. No repartition on the
      // parquet-pin path: columnar read-back streams, so partition
      // width no longer risks read-back OOM, and the shuffle would
      // move the full 64-dim vectors (~6 GB at 10M) for nothing.
      val a = if (scratch.isDefined) assignCellsHierarchical(cached, cents)
              else assignCells(cached, cents)
      pin(a)
    }
    // residuals r = v - centroid(cell): the PQ trains on what the coarse
    // quantizer could NOT explain — the variance left per cell is far
    // smaller than the raw corpus variance, which is why residual codes
    // quantize better than raw-vector codes at the same bit budget
    val resid = assigned.join(cents, Seq("cell"))
      .select(col("vec_id"), col("cell").as("ivf_cell"),
        zip_with(col("v"), col("cv"), (x, c) => x - c).as("v"))
    // Exploded residual sub-vectors stay LAZY (VERDICT r14 #6): pinning
    // the full ×PqM exploded table was the largest 10M build stage
    // (16.6 s — an O(n·PqM) parquet round-trip of sub-vector arrays
    // written once and read once). Both consumers do better without it:
    // codebook training only ever reads the SAMPLE's residuals (pinned
    // below, so the two Lloyd passes don't recompute it), and the final
    // encode fuses residual-subtract → slice → NearestCell argmin into
    // ONE narrow streamed pass over the already-pinned `assigned` —
    // recomputing the subtraction per row is pure codegen'd arithmetic,
    // strictly cheaper than materializing it through scratch parquet.
    // Determinism holds because both reads derive from the SAME pinned
    // frames (assigned + localCheckpointed cents).
    val subR = resid.select(col("vec_id"), col("ivf_cell"),
        explode(sequence(lit(0), lit(PqM - 1))).as("m"), col("v"))
      .select(col("vec_id"), col("ivf_cell"), col("m"),
        slice(col("v"), col("m") * PqSubDim + 1, lit(PqSubDim)).as("sv"))
    // codebooks train on the SAMPLE's residuals only (trainPred rides on
    // vec_id, which subR retains) — at the 1M tier this removes three
    // corpus-wide pqAssign/mean passes, leaving the single final encode.
    // The stage pins sample-sized data, so its cost is bounded by the
    // training-sample budget, not the corpus.
    val subRTrain = stage("residual_explode") {
      pin(trainPred.map(subR.where).getOrElse(subR))
    }
    val books = stage("books_train") {
      pqCodebooks(subRTrain.select(col("vec_id"), col("m"), col("sv")))
    }
    // (vec_id, ivf_cell, m, code): the complete on-disk representation —
    // PqM small ints + one cell id per vector
    val codes = stage("encode") {
      pin(pqAssign(subR, books)
        .select(col("vec_id"), col("ivf_cell"), col("m"), col("cell").as("code")))
    }
    val cellSizes = stage("cell_sizes") {
      pin(assigned.groupBy(col("cell").as("ivf_cell"))
        .agg(count(lit(1)).as("cell_n")))
    }
    IvfPqIndex(cents, books, codes, cellSizes,
      if (materialize) stages.toSeq else Nil, scratch)
  }

  def annIvfPqWithScan(emb: DataFrame, k: Int, cells: Int, nprobe: Int,
                       queryPred: Column,
                       trainPred: Option[Column] = None): (DataFrame, DataFrame) = {
    val cached = emb.cache()
    val idx = ivfPqBuild(cached, cells, trainPred, materialize = false)
    ivfPqQuery(cached, idx, k, nprobe, queryPred)
  }

  /** Query phase over a built index: probe routing, ADC over probed
    * codes, exact re-rank of the shortlist, and the per-query scanned
    * count.
    */
  private def ivfPqQuery(cached: DataFrame, idx: IvfPqIndex, k: Int,
                         nprobe: Int, queryPred: Column,
                         rerank: Int = PqRerank)
      : (DataFrame, DataFrame) = {
    val cents = idx.cents
    val books = idx.books
    val codes = idx.codes
    // each query probes its nprobe nearest cells, carrying the exact
    // dot(q, centroid) term of the decomposition. NARROW form (r17):
    // the centroids pack to one broadcast cell-sorted array (the
    // assignCells pattern) and each query row sorts its per-cell
    // (−similarity, cell, qcdot) structs inline and keeps the first
    // nprobe — same selection and tie-break (max similarity, ties to
    // the lowest cell) as the row_number window it replaces, with zero
    // shuffle; the windowed form paid an exchange + sort round trip on
    // a queries×cells frame in every query run.
    val centsPacked = cents.agg(
      array_sort(collect_list(struct(col("cell"), col("cv")))).as("pes"))
    val queryProbes = cached.where(queryPred).crossJoin(broadcast(centsPacked))
      .select(col("vec_id").as("query_id"),
        slice(array_sort(transform(col("pes"), e => struct(
          (-graft.functions.CosineSimilarity(col("v"), e.getField("cv"))).as("negd"),
          e.getField("cell").as("cell"),
          dot(col("v"), e.getField("cv")).as("qcdot")))), 1, nprobe).as("probes"))
      .select(col("query_id"), explode(col("probes")).as("p"))
      .select(col("query_id"), col("p.cell").as("ivf_cell"),
        col("p.qcdot").as("qcdot"))
    // per-(query, subspace, code) partial dots vs the RAW query
    // sub-vectors (dot(q, r) decomposes directly — no query residual
    // needed per cell, so one table serves every probed cell)
    val table = subVectors(cached.where(queryPred))
      .select(col("vec_id").as("query_id"), col("m"), col("sv"))
      .join(broadcast(books), Seq("m"))
      .select(col("query_id"), col("m"), col("cell").as("code"),
        dot(col("sv"), col("cv")).as("pdot"))

    val approx = codes
      .join(broadcast(queryProbes), Seq("ivf_cell")) // probed cells only
      .join(broadcast(table), Seq("query_id", "m", "code"))
      .where(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg((max(col("qcdot")) + sum(col("pdot"))).as("adc"))
    val shortlist = approx
      .withColumn("rr", row_number().over(
        Window.partitionBy("query_id").orderBy(desc("adc"), asc("vec_id"))))
      .where(col("rr") <= rerank)
      .select(col("query_id"), col("vec_id"))
    val scored = shortlist
      .join(cached, Seq("vec_id"))
      .join(broadcast(querySetOf(cached, queryPred)), Seq("query_id"))
      .withColumn("cos", graft.functions.CosineSimilarity(col("qv"), col("v")))
    val scan = queryProbes.join(idx.cellSizes, Seq("ivf_cell"))
      .groupBy(col("query_id")).agg(sum(col("cell_n")).as("n_scanned"))
    (topK(scored, k), scan)
  }

  /** Scale-tier IVF-PQ measurement with a build/query time split
    * (VERDICT r10 #5): replicate the sf's embeddings `rep`× (100k at
    * rep=50, 1M at rep=500 over sf0.1), TIME the index build (coarse
    * train on the replica-0 sample + full-corpus assignment + residual
    * codebooks + code table, materialized) separately from the query
    * pass (probe routing + ADC over probed codes + re-rank,
    * materialized), then CHECK — untimed — the same two contracts as
    * q_ann_ivfpq_scale: per-query recall ≥ `minHits` of the exact
    * cosine top-k, and the integer-exact scanned-fraction bound
    * n_scanned × cells ≤ 2 × nprobe × n. Returns (n_corpus, build_sec,
    * query_sec, recall_failures, scan_failures, build_stage_split). The
    * caller treats any failure as a bench error — a fast broken index
    * measures nothing.
    */
  /** Measured per-tier evidence beyond the pass/fail contracts (VERDICT
    * r14 #3): the numbers a reviewer needs to judge the approximation,
    * not just trust it. `recallAtK` is the measured mean fraction of
    * each query's true top-k the index returned (vs the in-run
    * brute-force baseline); `scannedFrac` the mean fraction of corpus
    * codes a query's probes actually read; `assignAgreement` the
    * fraction of a ~20k-vector corpus sample whose hierarchical
    * two-level coarse assignment lands in the SAME cell as the exact
    * full argmax (the 10M tier's one approximation).
    */
  case class AnnTierStats(n: Long, buildSec: Double, querySec: Double,
                          recallFailures: Long, scanFailures: Long,
                          split: Seq[(String, Double)],
                          recallAtK: Double, scannedFrac: Double,
                          assignAgreement: Double)

  def annIvfPqScaleTier(s: SparkSession, dir: String, rep: Int,
                        cells: Int, nprobe: Int,
                        nQueries: Int = AnnScaleQueries, k: Int = 5,
                        minHits: Int = 3): AnnTierStats = {
    // Storage level scales with the tier: the deserialized columnar
    // cache is right up to ~1M vectors, but a 10M × 64-double corpus is
    // ~5 GB raw — at that size BOTH in-memory levels OOM'd the 8 GB
    // bench heap in MemoryStore unroll (putIteratorAsBytes buffers each
    // partition's serialized batches in memory before spilling; 32
    // concurrent ~160 MB unrolls > heap). DISK_ONLY streams batches to
    // disk with one bounded builder per task — the corpus materializes
    // once and every subsequent scan reads the (page-cached) local
    // blocks, which is exactly how a 100-TB corpus behaves: you don't
    // pin it in RAM, you re-read columnar storage.
    val emb = scaledCorpus(s, dir, rep).persist(
      if (rep >= 1000) org.apache.spark.storage.StorageLevel.DISK_ONLY
      else org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = emb.count() // fixture materialization, outside both timings
    val nBase = load(s, dir, "embeddings").count()
    val pred = col("vec_id") < nQueries.toLong
    def sec(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    var idx: IvfPqIndex = null
    // Training sample: at least one full replica (every distinct base
    // location represented), and at least 2 points per requested cell so
    // Lloyd never has more centroids than training vectors (the 10M
    // tier's 2048 cells vs the 2000-vector replica-0 sample).
    val trainN = math.max(nBase, 2L * cells)
    val buildSec = sec {
      idx = ivfPqBuild(emb, cells, trainPred = Some(col("vec_id") < trainN),
        materialize = true, nHint = n)
    }
    // Re-rank depth must cover the near-tie multiplicity: the fixture
    // puts `rep` near-identical replicas in every base's cluster, and
    // the exact top-k among them is decided by perturbation-scale
    // differences BELOW PQ's quantization error — no ADC ordering can
    // rank them, so the shortlist must contain the whole tie set and
    // let the exact re-rank resolve it (the efSearch/rerank ≥ duplicate-
    // multiplicity rule production ANN deployments apply). At rep=50
    // the default 50 already covers it (the gate's regime); at rep=500
    // a 50-candidate shortlist holds ~10% of the tie set and recall
    // collapses to ~chance — measured: 20/20 queries below the floor.
    val rerank = math.max(PqRerank, 2 * rep)
    var ann: DataFrame = null
    var scan: DataFrame = null
    val querySec = sec {
      val (a, sc) = ivfPqQuery(emb, idx, k, nprobe, pred, rerank)
      ann = a.localCheckpoint(true)
      scan = sc.localCheckpoint(true)
    }
    val bf = topK(
      emb.join(broadcast(querySetOf(emb, pred)),
        col("vec_id") =!= col("query_id"))
        .withColumn("cos",
          graft.functions.CosineSimilarity(col("qv"), col("v"))), k)
    val recallFailures = recallContract(ann, bf, minHits)
      .where(!col("recall_ok")).count()
    val scanFailures = scan
      .where(col("n_scanned") * cells.toLong > lit(2L) * nprobe.toLong * n)
      .count()
    // Measured tier texture (untimed — evidence, not cost). recall@k:
    // mean fraction of the true top-k retrieved across queries.
    val bfPairs = bf.select(col("query_id"), col("neighbor_id"))
    val nq = ann.select(col("query_id")).distinct().count()
    val hitTotal = ann.join(bfPairs, Seq("query_id", "neighbor_id"),
      "left_semi").count()
    val recallAtK = if (nq == 0) 0.0 else hitTotal.toDouble / (nq * k)
    val scannedFrac =
      scan.agg(avg(col("n_scanned"))).head().getDouble(0) / n
    // hierarchical-vs-exact coarse-assignment agreement over a ~20k
    // corpus sample (the full exact argmax at 10M is the n × cells wall
    // the hierarchy exists to avoid — a spread sample measures the
    // approximation at bounded cost). Both paths read the SAME pinned
    // centroids, so disagreement isolates the routing approximation.
    val step = math.max(1L, n / 20000L)
    val sample = emb.where(pmod(col("vec_id"), lit(step)) === lit(0L))
    val exactA = assignCells(sample, idx.cents)
      .select(col("vec_id"), col("cell").as("c_exact"))
    val hierA = assignCellsHierarchical(sample, idx.cents)
      .select(col("vec_id"), col("cell").as("c_hier"))
    val agreeRow = exactA.join(hierA, Seq("vec_id"))
      .agg(sum(when(col("c_exact") === col("c_hier"), 1L).otherwise(0L))
        .as("agree"), count(lit(1)).as("total")).head()
    val assignAgreement =
      if (agreeRow.getLong(1) == 0) 0.0
      else agreeRow.getLong(0).toDouble / agreeRow.getLong(1)
    emb.unpersist()
    idx.scratchDir.foreach(d =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(d)))
    AnnTierStats(n, buildSec, querySec, recallFailures, scanFailures,
      idx.stageSec, recallAtK, scannedFrac, assignAgreement)
  }

  /** Production SemDeDup path (Abbas et al. 2023): Lloyd cells → the
    * same-cell cosine-domination prune, pair join keyed on cell id. The
    * cell count ADAPTS to corpus size — cells = max(8, ⌈n / 256⌉) — so
    * expected same-cell pair work stays n·cellSize/2 (linear in n),
    * never n²/cells with a fixed cell count: the round-10 scale bench
    * measured the fixed-8-cell form at 60× time for 10× data, the
    * defining quadratic smell. Every gate sf still resolves to 8 cells
    * (≤2048 vectors), so the oracle contracts are count-identical; the
    * corpus count feeding the cell formula is a bounded driver scalar.
    */
  def semDedupRemoved(emb: DataFrame, targetCellSize: Long = 256): DataFrame = {
    val n = emb.count()
    val cells = math.max(8L, (n + targetCellSize - 1) / targetCellSize).toInt
    val cents = broadcast(lloydCentroids(emb, cells))
    val assigned = assignCells(emb, cents)
    val a = assigned.select(col("cell"), col("vec_id").as("id_a"), col("v").as("va"))
    val b = assigned.select(col("cell"), col("vec_id").as("id_b"), col("v").as("vb"))
    a.join(b, Seq("cell"))
      .where(col("id_b") < col("id_a"))
      .where(graft.functions.CosineSimilarity(col("va"), col("vb")) >= 0.3)
      .select(col("id_a").as("vec_id")).distinct()
  }

  /** The production path over the raw corpus, for scale benching apart
    * from q_semdedup's fenced all-pairs exact baseline (the baseline is
    * the CONTRACT's oracle anchor and is quadratic by definition — at
    * scale tiers only the production path's cost is the claim).
    */
  def semDedupProduction(s: SparkSession, dir: String): DataFrame =
    semDedupRemoved(corpusOf(s, dir).cache())

  /** Recall contract vs the in-query brute-force baseline: per query,
    * the ANN path must return exactly k rows and hit at least `minHits`
    * of the true top-k. DuckDB can compute the query set but not the
    * ANN internals, so the boolean (plus the pinned k) is the
    * cross-engine contract — the q_approx_dau pattern.
    */
  private def recallContract(ann: DataFrame, bf: DataFrame, minHits: Int): DataFrame = {
    val hits = ann
      .join(bf.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
    ann.groupBy("query_id").agg(count(lit(1)).as("k"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"), col("k"),
        (coalesce(col("n_hits"), lit(0L)) >= minHits).as("recall_ok"))
      .orderBy("query_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Brute-force cosine top-5. Output ids only — rank order is
    // float-robust (neighbor gaps >> ulp), values are not.
    "q_ann_topk" -> { (s, dir) =>
      annBruteForce(corpusOf(s, dir), 5).orderBy(col("query_id"), col("rank"))
    },

    // LSH ANN recall contract: ≥1 of the true top-5 per query. Random
    // 64-dim unit vectors are near-orthogonal, so 4 hyperplanes +
    // Hamming-1 probing recalls 20–80% here — the floor pins "the bucket
    // routing finds true neighbors", the plane count is the scaling knob.
    "q_ann_lsh" -> { (s, dir) =>
      val emb = corpusOf(s, dir)
      recallContract(annLsh(emb, 5), annBruteForce(emb, 5), minHits = 1)
    },

    // IVF ANN recall contract: ≥4 of the true top-5 per query (the
    // data-adaptive quantizer recalls far better than hyperplane LSH on
    // this corpus — that is the point of having both).
    "q_ann_ivf" -> { (s, dir) =>
      val emb = corpusOf(s, dir)
      recallContract(annIvf(emb, 5), annBruteForce(emb, 5), minHits = 4)
    },

    // PQ-ADC+re-rank ANN recall contract vs the exact top-5: 8×32
    // product quantization compresses 64-dim vectors 32×, the code scan
    // nominates a 50-candidate shortlist, exact re-rank recovers the
    // final order. Measured per-query hits 3–5/5 across sf0.001/0.01/0.1
    // (isotropic vectors spread quantization error evenly — the hard
    // case); floor pinned at 2 with margin. PqK/PqM/PqRerank are the
    // recall-vs-memory knobs.
    "q_ann_pq" -> { (s, dir) =>
      val emb = corpusOf(s, dir).cache()
      recallContract(annPq(emb, 5), annBruteForce(emb, 5), minHits = 2)
    },

    // IVF-PQ composed ANN recall contract vs the exact top-5: coarse
    // cells bound the rows scanned per query (nprobe/cells of the
    // corpus), residual PQ codes bound the bytes read per row — the
    // composition that holds at a billion vectors where IVF alone
    // still reads floats and PQ alone still scans everything. Floor
    // pinned at the PQ floor (2): isotropic vectors are the worst case
    // for both stages at once (measured 2-5/5 across sfs — cell
    // truncation loses what flat-PQ ADC would re-find).
    "q_ann_ivfpq" -> { (s, dir) =>
      val emb = corpusOf(s, dir).cache()
      recallContract(annIvfPq(emb, 5), annBruteForce(emb, 5), minHits = 2)
    },

    // IVF-PQ at SCALE-TIER parameters on the replicated AnnScaleRep×
    // fixture (100k vectors at sf0.1, 25k at the sf0.01 gate — VERDICT
    // r9 #7): AnnScaleCells coarse cells / AnnScaleProbes probes,
    // AnnScaleQueries queries, and TWO pinned contracts
    // per query: (a) recall ≥ 3 of the exact top-5 (the replicas of a
    // query's base vector form its true neighborhood — the realistic
    // clustered regime), and (b) the SCANNED FRACTION — corpus vectors
    // in probed cells over corpus size — stays ≤ 2 × nprobe/cells
    // (i.e. ≤ 25%: the bound that makes IVF-PQ a bounded-scan design;
    // a centroid collapse or probe-routing regression breaks it even
    // when recall happens to survive). Integer-exact bound: n_scanned ×
    // cells ≤ 2 × nprobe × n_corpus.
    "q_ann_ivfpq_scale" -> { (s, dir) =>
      val emb = scaledCorpus(s, dir).cache()
      // replica 0 of the first AnnScaleQueries bases (replica-major ids)
      val pred = col("vec_id") < AnnScaleQueries.toLong
      // train the coarse quantizer on the replica-0 base sample (the
      // first nBase ids) — the faiss regime: training cost is sample-
      // bounded, only the single assignment pass is corpus-linear
      val nBase = load(s, dir, "embeddings").count()
      val (ann, scan) = annIvfPqWithScan(emb, 5,
        cells = AnnScaleCells, nprobe = AnnScaleProbes, pred,
        trainPred = Some(col("vec_id") < nBase))
      // baseline ranks by the SAME similarity the ANN re-rank uses
      // (cosine): the replicas are near-ties with non-unit norms, so a
      // dot-ranked baseline diverges for reasons unrelated to the ANN
      // path — the ADVICE-r9 q_hard_negatives_ann lesson, which this
      // fixture is deliberately sensitive enough to expose
      val bf = topK(
        emb.join(broadcast(querySetOf(emb, pred)),
          col("vec_id") =!= col("query_id"))
          .withColumn("cos",
            graft.functions.CosineSimilarity(col("qv"), col("v"))), 5)
      val n = emb.agg(count(lit(1)).as("n_corpus"))
      recallContract(ann, bf, minHits = 3)
        .join(scan, Seq("query_id"), "left")
        .crossJoin(broadcast(n))
        .select(col("query_id"), col("k"), col("n_corpus"), col("recall_ok"),
          (coalesce(col("n_scanned"), lit(0L)) * AnnScaleCells.toLong <=
            lit(2L) * AnnScaleProbes.toLong * col("n_corpus"))
            .as("scanned_frac_ok"))
        .orderBy(col("query_id"))
    },

    // LSH-bucketed embedding near-dup — the PRODUCTION-path twin of
    // q_embed_neardup: vectors are hashed to sign-bit buckets once, each
    // vector probes its own + Hamming-1 buckets, and only same-bucket
    // candidates are scored — the pair shuffle keys on bucket id, never
    // all-pairs. Output is a recall contract vs the exact baseline
    // (computed in-query): random isotropic 64-dim vectors are the
    // worst case for hyperplane LSH (neighbors at cos 0.3 sit at ~72°),
    // so the pinned floor is modest; on clustered real embeddings the
    // same plan recalls far higher, and the plane count is the knob.
    "q_embed_neardup_lsh" -> { (s, dir) =>
      val emb = corpusOf(s, dir).withColumn("bucket", lshBucket(col("v")))
      val probes = (0 until NumPlanes).map(p => col("bucket").bitwiseXOR(1L << p))
      val left = emb.select(col("vec_id").as("id_a"), col("v").as("va"),
        explode(array((col("bucket") +: probes): _*)).as("bucket"))
      val right = emb.select(col("vec_id").as("id_b"), col("v").as("vb"), col("bucket"))
      val lshPairs = left.join(right, Seq("bucket"))
        .where(col("id_a") < col("id_b"))
        // score BEFORE deduping: a pair surfaces via at most a few probes,
        // so re-scoring duplicates in codegen is cheaper than shuffling
        // the full candidate stream through a dedup first
        .where(graft.functions.CosineSimilarity(col("va"), col("vb")) >= 0.3)
        .dropDuplicates("id_a", "id_b")
        .select(col("id_a"), col("id_b"))
      val a = emb.select(col("vec_id").as("id_a"), col("v").as("va"))
      val b = emb.select(col("vec_id").as("id_b"), col("v").as("vb"))
      val exact = a.join(b, col("id_a") < col("id_b"))
        .where(graft.functions.CosineSimilarity(col("va"), col("vb")) >= 0.3)
        .select(col("id_a"), col("id_b"))
      val hits = lshPairs.join(exact, Seq("id_a", "id_b"), "left_semi")
      exact.agg(count(lit(1)).as("n_exact"))
        .crossJoin(hits.agg(count(lit(1)).as("n_hits")))
        // n_exact = 0 would make the ratio null (Spark's x/0), not TRUE —
        // an empty exact pair set is vacuously recalled on both engines
        .select(col("n_exact"),
          when(col("n_exact") > 0,
            col("n_hits") * 1.0 / col("n_exact") >= EmbedLshRecallFloor)
            .otherwise(lit(true)).as("recall_ok"))
    },

    // Embedding-cosine near-dup: exact all-pairs baseline scored by the
    // native codegen'd CosineSimilarity expression (graft.functions) —
    // the oracle-checkable twin of the LSH-bucketed scale path above.
    // Output is ids only; membership at the threshold is float-robust
    // because both engines compute the identical sequential fold.
    "q_embed_neardup" -> { (s, dir) =>
      import s.implicits._
      val emb = load(s, dir, "embeddings")
        .select($"vec_id", asDouble($"embedding").as("v"))
      val a = emb.select($"vec_id".as("id_a"), $"v".as("va"))
      val b = emb.select($"vec_id".as("id_b"), $"v".as("vb"))
      a.join(b, $"id_a" < $"id_b")
        .where(graft.functions.CosineSimilarity($"va", $"vb") >= 0.3)
        .select($"id_a", $"id_b")
        .orderBy($"id_a", $"id_b")
    },

    // Semantic-dup CLUSTER assignment — the embedding-space twin of
    // TextOps' q_dup_clusters: pair detection says "A≈B", the corpus
    // decision is "keep ONE vector per transitive similarity cluster".
    // Pairs here are the exact ≥0.3-cosine set (the same fenced all-pairs
    // oracle baseline q_embed_neardup pins; the production candidate
    // generator at scale is the LSH-bucketed plan of q_embed_neardup_lsh
    // feeding the identical downstream), then connected components by
    // min-label propagation labels every vector with the smallest
    // reachable vec_id. Output: one row per vector with cluster rep,
    // cluster size, and the keep flag a semantic-dedup pass acts on.
    "q_embed_dup_clusters" -> { (s, dir) =>
      import s.implicits._
      val emb = corpusOf(s, dir)
      val a = emb.select($"vec_id".as("id_a"), $"v".as("va"))
      val b = emb.select($"vec_id".as("id_b"), $"v".as("vb"))
      val pairs = a.join(b, $"id_a" < $"id_b")
        .where(graft.functions.CosineSimilarity($"va", $"vb") >= 0.3)
        .select($"id_a".as("src"), $"id_b".as("dst"))
      val comp = TextOps.connectedComponents(pairs)
      val asg = emb.select($"vec_id")
        .join(comp, emb("vec_id") === comp("id"), "left")
        .select($"vec_id", coalesce($"component", $"vec_id").as("cluster_rep"))
        .localCheckpoint(true) // read twice: size agg + final join
      val sizes = asg.groupBy($"cluster_rep").agg(count(lit(1)).as("cluster_size"))
      asg.join(sizes, "cluster_rep")
        .select($"vec_id", $"cluster_rep", $"cluster_size",
          ($"vec_id" === $"cluster_rep").as("kept"))
        .orderBy($"vec_id")
    },

    // SemDeDup (Abbas et al. 2023): semantic dedup at corpus scale by
    // clustering FIRST, then pruning only WITHIN clusters — a vector is
    // removed iff a smaller-id vector in its OWN k-means cell sits at
    // cosine ≥ τ. The pair join keys on cell id (k bounded partitions,
    // never all-pairs) — the shape that lets semantic dedup run on 100 TB
    // of embeddings where the exact all-pairs graph cannot. Output is
    // the cross-engine contract: the exact dominated-vector count (DuckDB
    // recomputes it), precision_ok — every SemDeDup removal is exactly
    // dominated, true by construction since same-cell pairs ⊆ all pairs
    // at the same τ — and recall_ok vs the pinned floor (the fenced
    // all-pairs baseline exists in-query only; isotropic random vectors
    // scatter true pairs across cells, the worst case — clustered real
    // embeddings concentrate them, which is the paper's premise).
    "q_semdedup" -> { (s, dir) =>
      val emb = corpusOf(s, dir).cache()
      val semRemoved = semDedupRemoved(emb)
      val ea = emb.select(col("vec_id").as("id_a"), col("v").as("va"))
      val eb = emb.select(col("vec_id").as("id_b"), col("v").as("vb"))
      val exactRemoved = ea.join(eb, col("id_b") < col("id_a"))
        .where(graft.functions.CosineSimilarity(col("va"), col("vb")) >= 0.3)
        .select(col("id_a").as("vec_id")).distinct()
      val falsePos = semRemoved.join(exactRemoved, Seq("vec_id"), "left_anti")
      exactRemoved.agg(count(lit(1)).as("n_exact"))
        .crossJoin(semRemoved.agg(count(lit(1)).as("n_sem")))
        .crossJoin(falsePos.agg(count(lit(1)).as("n_fp")))
        .select(col("n_exact"),
          (col("n_fp") === 0).as("precision_ok"),
          when(col("n_exact") > 0,
            col("n_sem") * 1.0 / col("n_exact") >= SemDedupRecallFloor)
            .otherwise(lit(true)).as("recall_ok"))
    },

    // Per-label centroids over EVERY dimension (the k-means/IVF building
    // block as a first-class op, and the class-prototype step of
    // embedding-space analysis): posexplode to (label, dim) grain, snap
    // each element to integer NANO-UNITS via floor(v·1e9) AFTER the
    // exact float→double widen — floor has NO rounding-tie behavior, so
    // it is bit-deterministic on identical doubles (a decimal(18,9)
    // snap hit a half-up vs half-even tie at sf0.1) — sum the bigints
    // exactly (order-free), divide once in double. One shuffle on
    // label×dim keys with partial aggregation — linear, no collect; the
    // output frame is labels × dims, never corpus-sized.
    "q_embed_centroids" -> { (s, dir) =>
      import s.implicits._
      load(s, dir, "embeddings")
        .select($"label".cast("long").as("label"),
          posexplode(asDouble($"embedding")).as(Seq("idx0", "v")))
        .select($"label", ($"idx0" + 1).cast("long").as("idx"),
          floor($"v" * 1e9).as("vs_nano"))
        .groupBy($"label", $"idx")
        .agg(count(lit(1)).as("n"), sum($"vs_nano").as("sum_nano"))
        .select($"label", $"idx", $"n", $"sum_nano",
          ($"sum_nano".cast("double") / 1e9 / $"n").as("mean_v"))
        .orderBy($"label", $"idx")
    },

    // Per-label embedding stats: element means via per-row decimal snap
    // (order-free exact sums), plus vector norms — the "is my embedding
    // column sane" profiling pass.
    "q_embed_stats" -> { (s, dir) =>
      import s.implicits._
      val emb = load(s, dir, "embeddings")
        .withColumn("v", asDouble($"embedding"))
        .withColumn("e0", element_at($"v", 1).cast("decimal(18,9)"))
        .withColumn("e1", element_at($"v", 2).cast("decimal(18,9)"))
        .withColumn("norm_snap", sqrt(dot($"v", $"v")).cast("decimal(18,9)"))
      emb.groupBy($"label".cast("long").as("label"))
        .agg(
          count(lit(1)).as("n"),
          sum($"e0").cast("double").as("sum_e0"),
          sum($"e1").cast("double").as("sum_e1"),
          sum($"norm_snap").cast("double").as("sum_norm"))
        .orderBy($"label")
    },

    // Contrastive HARD-NEGATIVE mining — the training-pair step of
    // embedding-model pipelines (triplet/InfoNCE batches): for each
    // query vector, the nearest SAME-label neighbor (positive) and the
    // nearest OTHER-label neighbor (the hard negative — close in space,
    // wrong in label). Output is ids only: argmax identities are
    // float-robust (neighbor gaps >> ulp, the q_ann_topk argument),
    // raw cosines are not. The 20-query broadcast × corpus scan is the
    // same linear per-query baseline as q_ann_topk; at scale the
    // LSH/IVF/PQ candidate generators feed the identical selection
    // windows.
    "q_hard_negatives" -> { (s, dir) =>
      val emb = load(s, dir, "embeddings")
        .select(col("vec_id"), asDouble(col("embedding")).as("v"),
          col("label").cast("long").as("label"))
      val q = emb.where(col("vec_id") < 20)
        .select(col("vec_id").as("query_id"), col("v").as("qv"),
          col("label").as("qlabel"))
      val scored = emb.crossJoin(broadcast(q))
        .where(col("vec_id") =!= col("query_id"))
        .withColumn("cos", dot(col("qv"), col("v")))
        .withColumn("same", col("label") === col("qlabel"))
      val w = Window.partitionBy(col("query_id"), col("same"))
        .orderBy(desc("cos"), asc("vec_id"))
      scored.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .groupBy(col("query_id"))
        .agg(
          max(when(col("same"), col("vec_id"))).as("pos_id"),
          max(when(!col("same"), col("vec_id"))).as("neg_id"))
        .orderBy(col("query_id"))
    },

    // Hard-negative mining through the ANN candidate path (VERDICT r8
    // #9 — the production-path twin of q_hard_negatives): the PQ-ADC
    // shortlist generates each query's 50 candidates, the SAME
    // per-(query, same-label) selection windows pick the positive /
    // hard negative from the candidates, and the in-query exact
    // baseline pins agreement floors — at a billion vectors the
    // brute-force scan is impossible and this composition (candidate
    // generator → label-split argmax) is what a contrastive-training
    // pipeline actually runs. Output rows carry the EXACT pos/neg ids
    // (the oracle recomputes them — the hash anchor) plus two
    // corpus-level contract booleans: candidate-derived picks must
    // agree with the exact picks on ≥ the pinned fraction of queries
    // (isotropic vectors + 32× code compression are the worst case;
    // measured agreement 16-20/20 pos, 13-20/20 neg across sfs —
    // floors pinned with margin at 12 and 8 of 20).
    "q_hard_negatives_ann" -> { (s, dir) =>
      val emb = load(s, dir, "embeddings")
        .select(col("vec_id"), asDouble(col("embedding")).as("v"),
          col("label").cast("long").as("label"))
      val pred = col("vec_id") < 20
      val q = emb.where(pred)
        .select(col("vec_id").as("query_id"), col("v").as("qv"),
          col("label").as("qlabel"))
      // exact baseline — q_hard_negatives' shape, but ranked by COSINE
      // (the same similarity annPq's candidate re-rank orders by), so the
      // agreement floors measure candidate-generation quality only: with
      // dot on one side and cosine on the other, the contract would hold
      // on unit-norm fixtures and silently degrade on any non-normalized
      // corpus for a reason unrelated to the ANN path (ADVICE r9).
      val scored = emb.crossJoin(broadcast(q))
        .where(col("vec_id") =!= col("query_id"))
        .withColumn("cos", graft.functions.CosineSimilarity(col("qv"), col("v")))
        .withColumn("same", col("label") === col("qlabel"))
      val w = Window.partitionBy(col("query_id"), col("same"))
        .orderBy(desc("cos"), asc("vec_id"))
      val exact = scored.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .groupBy(col("query_id"))
        .agg(max(when(col("same"), col("vec_id"))).as("pos_id"),
          max(when(!col("same"), col("vec_id"))).as("neg_id"))
      // ANN candidates: the PQ code scan nominates, exact re-rank
      // orders — so min rank per (query, label-side) IS the candidate
      // argmax by true cosine, no re-scoring needed
      val cand = annPq(emb.select(col("vec_id"), col("v")), PqRerank, pred)
      val wa = Window.partitionBy(col("query_id"), col("same"))
        .orderBy(asc("rank"))
      val ann = cand
        .join(emb.select(col("vec_id").as("neighbor_id"), col("label")),
          Seq("neighbor_id"))
        .join(broadcast(q.select(col("query_id"), col("qlabel"))), Seq("query_id"))
        .withColumn("same", col("label") === col("qlabel"))
        .withColumn("rn", row_number().over(wa))
        .where(col("rn") === 1)
        .groupBy(col("query_id"))
        .agg(max(when(col("same"), col("neighbor_id"))).as("ann_pos"),
          max(when(!col("same"), col("neighbor_id"))).as("ann_neg"))
      // Floors as FRACTIONS of the query-set size (ADVICE r9 / VERDICT
      // r9 #4: `>= 12 of a hardcoded 20` silently weakens if the fixture
      // grows): ≥60% positive agreement, ≥40% hard-negative agreement —
      // the same 12/20 and 8/20 margins, now fixture-size-invariant.
      val joined = exact.join(ann, Seq("query_id"), "left")
      val floors = joined.agg(
        count(lit(1)).as("n_q"),
        sum(when(col("ann_pos") === col("pos_id"), 1L).otherwise(0L)).as("n_pos"),
        sum(when(col("ann_neg") === col("neg_id"), 1L).otherwise(0L)).as("n_neg"))
      joined.crossJoin(broadcast(floors))
        .select(col("query_id"), col("pos_id"), col("neg_id"),
          (col("n_pos") * 10L >= col("n_q") * 6L).as("pos_floor_ok"),
          (col("n_neg") * 10L >= col("n_q") * 4L).as("neg_floor_ok"))
        .orderBy(col("query_id"))
    },

    // Embedding-space PCA — the variance-accounting step of embedding
    // curation (DataComp-style SVD analysis, whitening precursors):
    // the 64×64 second-moment matrix via a (i, j)-keyed aggregate over
    // the upper-triangle product explode. The ×d²/2 row blowup is
    // PRE-map-side-combine: each task collapses to ≤2080 partial rows
    // before the shuffle, so at 100 TB the shuffle carries
    // tasks×2080 rows and the FLOPs are the unavoidable rows×d²
    // multiply-adds. Only the d²-entry matrix (and the d-entry mean)
    // ever reaches the driver — bounded like the Lloyd centroids —
    // where 200 power-iteration rounds (plus one deflation) extract
    // λ1, λ2 of the CENTERED covariance. Output: per-dim exact
    // nano-snapped second moments (DuckDB recomputes them — the hash
    // anchor) + engine-side contract booleans the oracle pins TRUE:
    // the top eigenpair's relative residual under 0.05 and 5%-banded
    // eigenvalue ordering (measured residuals ~1e-6 across sfs;
    // isotropic data's tiny eigengap is the worst case for power
    // iteration and makes strict ordering meaningless).
    "q_embed_pca" -> { (s, dir) =>
      val emb = corpusOf(s, dir).cache()
      val n = emb.count().toDouble
      val e1 = emb.select(col("v"), posexplode(col("v")).as(Seq("i", "x")))
      val upper = e1.select(col("i"), col("x"), posexplode(col("v")).as(Seq("j", "y")))
        .where(col("j") >= col("i"))
        .groupBy("i", "j").agg(sum(col("x") * col("y")).as("m2"))
        .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
      val means = e1.groupBy("i").agg(sum(col("x")).as("sx"))
        .collect().map(r => (r.getInt(0), r.getDouble(1) / n)).toMap
      val d = means.size
      val cov = Array.tabulate(d, d) { (i, j) =>
        val (a, b) = (math.min(i, j), math.max(i, j))
        upper((a, b)) / n - means(i) * means(j)
      }
      def powerIter(m: Array[Array[Double]]): (Double, Array[Double]) = {
        var v = Array.fill(d)(1.0 / math.sqrt(d))
        for (_ <- 0 until 200) {
          val mv = Array.tabulate(d)(i => (0 until d).map(j => m(i)(j) * v(j)).sum)
          val nrm = math.sqrt(mv.map(x => x * x).sum)
          v = mv.map(_ / nrm)
        }
        val mv = Array.tabulate(d)(i => (0 until d).map(j => m(i)(j) * v(j)).sum)
        ((0 until d).map(i => v(i) * mv(i)).sum, v)
      }
      val (l1, v1) = powerIter(cov)
      val deflated = Array.tabulate(d, d)((i, j) => cov(i)(j) - l1 * v1(i) * v1(j))
      val (l2, _) = powerIter(deflated)
      val resid = {
        val mv = Array.tabulate(d)(i => (0 until d).map(j => cov(i)(j) * v1(j)).sum)
        math.sqrt((0 until d).map(i => { val r = mv(i) - l1 * v1(i); r * r }).sum)
      }
      val residOk = resid <= 0.05 * math.abs(l1)
      // tolerance-banded ordering: with near-equal eigenvalues
      // (isotropic data) the deflated estimate can land a hair above
      // λ1 — strict ordering is numerically meaningless there, the
      // 5%-band form is the honest invariant (sf0.1 measured
      // l2/l1 ≈ 1.004 under a ~1e-6 residual)
      val orderOk = l1 >= l2 - 0.05 * math.abs(l1) && l2 >= -0.05 * math.abs(l1)
      // exact per-dim second moments re-aggregated in nano units — the
      // cross-engine hash anchor (the double matrix above is Spark-only)
      import s.implicits._
      // Spark posexplode positions are 0-based (DuckDB's oracle indices
      // are 1-based and subtract 1)
      e1.select(col("i").cast("long").as("dim"),
          floor(col("x") * col("x") * 1e9).cast("long").as("p"))
        .groupBy($"dim").agg(sum($"p").as("m2_nano"))
        .withColumn("resid_ok", lit(residOk))
        .withColumn("order_ok", lit(orderOk))
        .orderBy($"dim")
    }
  )

  val oracles: Map[String, String] = Map(
    "q_ann_topk" ->
      """WITH emb AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |), q AS (
        |  SELECT vec_id AS query_id, v AS qv FROM emb WHERE vec_id < 3
        |), scored AS (
        |  SELECT q.query_id, e.vec_id,
        |    list_inner_product(q.qv, e.v) AS cos
        |  FROM emb e JOIN q ON e.vec_id <> q.query_id
        |), ranked AS (
        |  SELECT query_id, vec_id,
        |    row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, vec_id ASC) AS rank
        |  FROM scored
        |)
        |SELECT query_id, CAST(rank AS BIGINT) AS rank, vec_id AS neighbor_id
        |FROM ranked WHERE rank <= 5
        |ORDER BY query_id, rank""".stripMargin,

    // Recall contracts: DuckDB pins the query set, the returned k, and
    // the recall boolean — the ANN internals (hyperplane buckets / Lloyd
    // cells) are Spark-side only.
    "q_ann_lsh" ->
      """SELECT vec_id AS query_id, CAST(5 AS BIGINT) AS k, TRUE AS recall_ok
        |FROM embeddings WHERE vec_id < 3 ORDER BY query_id""".stripMargin,

    "q_ann_ivf" ->
      """SELECT vec_id AS query_id, CAST(5 AS BIGINT) AS k, TRUE AS recall_ok
        |FROM embeddings WHERE vec_id < 3 ORDER BY query_id""".stripMargin,

    "q_ann_pq" ->
      """SELECT vec_id AS query_id, CAST(5 AS BIGINT) AS k, TRUE AS recall_ok
        |FROM embeddings WHERE vec_id < 3 ORDER BY query_id""".stripMargin,

    "q_ann_ivfpq" ->
      """SELECT vec_id AS query_id, CAST(5 AS BIGINT) AS k, TRUE AS recall_ok
        |FROM embeddings WHERE vec_id < 3 ORDER BY query_id""".stripMargin,

    // DuckDB pins the query-id spine (replica 0 of the first
    // AnnScaleQueries base vectors), the replicated corpus size,
    // exactly-5 result rows, and the recall/scanned-fraction booleans
    // TRUE; the fixture replication and ANN internals are Spark-side.
    // Constants interpolated from the Scala knobs so a knob change
    // surfaces here, not as an opaque hash mismatch (ADVICE r10).
    "q_ann_ivfpq_scale" ->
      s"""SELECT CAST(vec_id AS BIGINT) AS query_id,
        |  CAST(5 AS BIGINT) AS k,
        |  (SELECT CAST(COUNT(*) * $AnnScaleRep AS BIGINT) FROM embeddings) AS n_corpus,
        |  TRUE AS recall_ok, TRUE AS scanned_frac_ok
        |FROM embeddings WHERE vec_id < $AnnScaleQueries ORDER BY query_id""".stripMargin,

    // DuckDB computes the exact pair count (expressible) and pins the
    // recall boolean; the LSH bucketing itself is Spark-side only.
    "q_embed_neardup_lsh" ->
      """WITH emb AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_exact, TRUE AS recall_ok
        |FROM emb a JOIN emb b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.v, b.v) >= 0.3""".stripMargin,

    // DuckDB recomputes the exact dominated-vector count (distinct
    // vectors with a smaller-id ≥0.3-cosine partner) and pins both
    // contract booleans; the k-means cells are Spark-side only.
    "q_semdedup" ->
      """WITH emb AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |)
        |SELECT CAST(COUNT(DISTINCT a.vec_id) AS BIGINT) AS n_exact,
        |  TRUE AS precision_ok, TRUE AS recall_ok
        |FROM emb a JOIN emb b ON b.vec_id < a.vec_id
        |WHERE list_cosine_similarity(a.v, b.v) >= 0.3""".stripMargin,

    "q_embed_neardup" ->
      """WITH emb AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |)
        |SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |FROM emb a JOIN emb b ON a.vec_id < b.vec_id
        |WHERE list_cosine_similarity(a.v, b.v) >= 0.3
        |ORDER BY id_a, id_b""".stripMargin,

    // Transitive closure over the exact ≥0.3-cosine pair set (the same
    // pair contract the q_embed_neardup oracle pins), min-label per node,
    // then every vector joins its cluster — the recursive CTE is
    // quadratic per component, which is fine at oracle scale and exactly
    // why the Spark side propagates labels linearly per round.
    "q_embed_dup_clusters" ->
      """WITH RECURSIVE emb AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |), j AS (
        |  SELECT a.vec_id AS u, b.vec_id AS w
        |  FROM emb a JOIN emb b ON a.vec_id < b.vec_id
        |  WHERE list_cosine_similarity(a.v, b.v) >= 0.3
        |), e AS (
        |  SELECT u, w FROM j UNION SELECT w, u FROM j
        |), reach AS (
        |  SELECT u, w FROM e
        |  UNION
        |  SELECT r.u, e2.w FROM reach r JOIN e e2 ON r.w = e2.u
        |), lbl AS (
        |  SELECT u AS vec_id, LEAST(u, MIN(w)) AS cluster_rep
        |  FROM reach GROUP BY u
        |), asg AS (
        |  SELECT m.vec_id, COALESCE(l.cluster_rep, m.vec_id) AS cluster_rep
        |  FROM emb m LEFT JOIN lbl l ON m.vec_id = l.vec_id
        |)
        |SELECT a.vec_id, a.cluster_rep, CAST(c.n AS BIGINT) AS cluster_size,
        |  (a.vec_id = a.cluster_rep) AS kept
        |FROM asg a JOIN (
        |  SELECT cluster_rep, COUNT(*) AS n FROM asg GROUP BY cluster_rep
        |) c ON a.cluster_rep = c.cluster_rep
        |ORDER BY a.vec_id""".stripMargin,

    "q_embed_centroids" ->
      """WITH flat AS (
        |  SELECT CAST(label AS BIGINT) AS label,
        |    CAST(generate_subscripts(embedding, 1) AS BIGINT) AS idx,
        |    CAST(floor(unnest(CAST(embedding AS DOUBLE[])) * 1e9) AS BIGINT) AS vs_nano
        |  FROM embeddings
        |)
        |SELECT label, idx, COUNT(*) AS n,
        |  CAST(SUM(vs_nano) AS BIGINT) AS sum_nano,
        |  CAST(SUM(vs_nano) AS DOUBLE) / 1e9 / COUNT(*) AS mean_v
        |FROM flat GROUP BY label, idx ORDER BY label, idx""".stripMargin,

    // DuckDB recomputes the exact pos/neg picks (the hash anchor) and
    // pins the ANN-candidate agreement floors; the PQ candidate path is
    // Spark-side only.
    "q_hard_negatives_ann" ->
      """WITH emb AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |    CAST(label AS BIGINT) AS label
        |  FROM embeddings
        |), q AS (
        |  SELECT vec_id AS query_id, v AS qv, label AS qlabel
        |  FROM emb WHERE vec_id < 20
        |), scored AS (
        |  SELECT q.query_id, e.vec_id,
        |    list_inner_product(q.qv, e.v)
        |      / (sqrt(list_inner_product(q.qv, q.qv))
        |         * sqrt(list_inner_product(e.v, e.v))) AS cos,
        |    e.label = q.qlabel AS same
        |  FROM emb e CROSS JOIN q
        |  WHERE e.vec_id <> q.query_id
        |), best AS (
        |  SELECT query_id, vec_id, same,
        |    row_number() OVER (PARTITION BY query_id, same
        |      ORDER BY cos DESC, vec_id) AS rn
        |  FROM scored
        |)
        |SELECT query_id,
        |  MAX(CASE WHEN same THEN vec_id END) AS pos_id,
        |  MAX(CASE WHEN NOT same THEN vec_id END) AS neg_id,
        |  TRUE AS pos_floor_ok, TRUE AS neg_floor_ok
        |FROM best WHERE rn = 1
        |GROUP BY query_id ORDER BY query_id""".stripMargin,

    "q_hard_negatives" ->
      """WITH emb AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
        |    CAST(label AS BIGINT) AS label
        |  FROM embeddings
        |), q AS (
        |  SELECT vec_id AS query_id, v AS qv, label AS qlabel
        |  FROM emb WHERE vec_id < 20
        |), scored AS (
        |  SELECT q.query_id, e.vec_id,
        |    list_inner_product(q.qv, e.v) AS cos,
        |    e.label = q.qlabel AS same
        |  FROM emb e CROSS JOIN q
        |  WHERE e.vec_id <> q.query_id
        |), best AS (
        |  SELECT query_id, vec_id, same,
        |    row_number() OVER (PARTITION BY query_id, same
        |      ORDER BY cos DESC, vec_id) AS rn
        |  FROM scored
        |)
        |SELECT query_id,
        |  MAX(CASE WHEN same THEN vec_id END) AS pos_id,
        |  MAX(CASE WHEN NOT same THEN vec_id END) AS neg_id
        |FROM best WHERE rn = 1
        |GROUP BY query_id ORDER BY query_id""".stripMargin,

    // DuckDB recomputes the exact nano-snapped per-dim second moments
    // (the hash anchor); the eigen extraction is driver-side with
    // oracle-pinned contract booleans.
    "q_embed_pca" ->
      """WITH e AS (
        |  SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        |), x AS (
        |  SELECT i, v[i] AS x
        |  FROM (SELECT v, unnest(generate_series(1, len(v))) AS i FROM e)
        |)
        |SELECT CAST(i - 1 AS BIGINT) AS dim,
        |  CAST(SUM(CAST(floor(x * x * 1e9) AS BIGINT)) AS BIGINT) AS m2_nano,
        |  TRUE AS resid_ok, TRUE AS order_ok
        |FROM x GROUP BY 1 ORDER BY dim""".stripMargin,

    "q_embed_stats" ->
      """WITH emb AS (
        |  SELECT CAST(label AS BIGINT) AS label,
        |    CAST(CAST(embedding AS DOUBLE[])[1] AS DECIMAL(18,9)) AS e0,
        |    CAST(CAST(embedding AS DOUBLE[])[2] AS DECIMAL(18,9)) AS e1,
        |    CAST(sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
        |      CAST(embedding AS DOUBLE[]))) AS DECIMAL(18,9)) AS norm_snap
        |  FROM embeddings
        |)
        |SELECT label, COUNT(*) AS n,
        |  CAST(SUM(e0) AS DOUBLE) AS sum_e0,
        |  CAST(SUM(e1) AS DOUBLE) AS sum_e1,
        |  CAST(SUM(norm_snap) AS DOUBLE) AS sum_norm
        |FROM emb GROUP BY label ORDER BY label""".stripMargin
  )
}
