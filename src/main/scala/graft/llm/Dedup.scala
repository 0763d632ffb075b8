package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale training-data pipelines.
  *
  * Scale design: everything is per-row expressions + one shuffle on the
  * blocking key (hash / LSH bucket). No driver-side data movement. MinHash
  * signatures are computed WITHOUT exploding shingles (array_min over
  * transform), so signature cost is a narrow map; only candidate generation
  * shuffles, keyed by (band, bandHash) — at 100 TB that shuffle carries
  * (numBands × numDocs) small rows, not the text.
  */
object Dedup {

  /** Lower-cased whitespace tokens. */
  def tokens(text: Column): Column = split(lower(text), "\\s+")

  /** Spread a (possibly single-file) input across the executor threads for
    * the narrow signature pass WITHOUT forcing a full-corpus shuffle at
    * scale: an input already at/above the default parallelism keeps its
    * layout — at 100 TB the scan arrives in thousands of partitions and a
    * blanket repartition would shuffle the whole text corpus for nothing —
    * while the tiny single-partition parquet inputs of the gates still fan
    * out. Output values never depend on the layout chosen
    * (PartitionInvariance is the hard gate for that).
    */
  private def spreadNarrow(df: DataFrame): DataFrame = {
    // a streaming frame keeps its micro-batch layout (probing partitions
    // would throw; values never depend on layout anyway)
    if (df.isStreaming) return df
    val par = df.sparkSession.sparkContext.defaultParallelism
    // toRdd, not .rdd: same partition count, without wrapping the plan in
    // the external-row deserializer the probe would otherwise build
    if (df.queryExecution.toRdd.getNumPartitions >= par) df
    else df.repartition(par)
  }

  /** Word n-grams of a token array, in order, duplicates kept. Built as a
    * zip_with chain over shifted slices so every array is referenced a
    * CONSTANT number of times — higher-order lambdas re-evaluate captured
    * expressions per element, so the "obvious" indexing form
    * (`element_at(w, i+j)` under a transform) re-splits the text O(len)
    * times, O(len²) per row. Token arrays shorter than `n` yield an empty
    * array (the slices are empty).
    */
  def ngrams(w: Column, n: Int): Column = {
    val m = greatest(size(w) - (n - 1), lit(0))
    (1 until n).foldLeft(slice(w, lit(1), m))((acc, j) =>
      zip_with(acc, slice(w, lit(j + 1), m), (a, b) => concat(a, lit(" "), b)))
  }

  /** Distinct word n-gram shingles of a text column. Texts with fewer than
    * `n` tokens yield an EMPTY set (no partial shingles) — matches the
    * oracle's generate_series(1, len-n+1) which is empty for short docs.
    */
  def shingles(text: Column, n: Int = 3): Column =
    array_distinct(ngrams(tokens(text), n))

  /** Exact dedup: keep the lowest-id row per identical text (hash groupBy —
    * one shuffle on the 128-bit text hash, not the text itself).
    */
  def exactDedup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol).cast("binary")).as("text_hash"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))

  /** Canonical token-set fingerprint (md5 of sorted distinct tokens) —
    * catches reorder/duplicate-word near-dups exactly.
    */
  def fingerprint(text: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(tokens(text)))).cast("binary"))

  /** MinHash signature as a single Column: numHashes values, each the min
    * over shingles of a seeded xxhash64.
    *
    * NOTE: expression form only — Catalyst inlines the shingle subtree into
    * every hash lane, so cost grows numHashes × shingling. Fine for a few
    * rows / tests; pipelines use [[minhashSignatures]] (explode + aggregate),
    * which hashes each shingle once and map-side-combines the mins.
    */
  def minhashSignature(text: Column, numHashes: Int, shingleN: Int = 3): Column = {
    val sh = shingles(text, shingleN)
    array((0 until numHashes).map(i =>
      array_min(transform(sh, s => xxhash64(s, lit(i))))): _*)
  }

  /** Per-document MinHash signatures via the [[graft.functions.vector.MinhashSig]]
    * codegen kernel — one narrow pass per document, NO explode, NO
    * 128-column aggregation buffer, NO shuffle. Lane values are
    * bit-identical to the exploded `min(xxhash64(shingle, i))` aggregation
    * this replaces (the kernel replays Spark's own XxHash64 chain), and
    * each shingle costs 1 string hash + numHashes int-hash chains instead
    * of numHashes string hashes.
    *
    * The lanes stay genuinely independent xxhash64 chains: cheaper lane
    * families were tried and MEASURED WORSE on recall — sequential-
    * coefficient double hashing (h1 + i·h2) dropped 3 of 46 gate pairs and
    * multiply-shift ((aᵢ·h + bᵢ) >> 31) still dropped 1 of 46; with r=4
    * bands the banding probability needs min-wise-independent lanes.
    * Documents with fewer than `shingleN` tokens are dropped, matching the
    * exploded form (no shingles → no group row).
    */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int, shingleN: Int = 3): DataFrame =
    df.select(col(idCol).as("id"),
      graft.functions.vector.minhash_sig(tokens(col(textCol)), numHashes, shingleN).as("sig"))
      .filter(col("sig").isNotNull)

  /** Pick (numBands, rowsPerBand) for a target Jaccard threshold by
    * minimizing the weighted false-positive + false-negative area under the
    * banding S-curve P(hit | j) = 1-(1-j^r)^b (Mining of Massive Datasets
    * §3.4.3; the same optimization datasketch's MinHashLSH runs). Driver-side
    * pure math over the divisor pairs of `numPerm` — no job. Returns the
    * (b, r) whose integrated error is smallest; `fpWeight`/`fnWeight` bias
    * toward precision (candidates are verified exactly downstream, so the
    * default leans slightly FN-averse like the verify-then-threshold
    * pipeline wants).
    */
  def lshParams(threshold: Double, numPerm: Int,
      fpWeight: Double = 0.5, fnWeight: Double = 0.5): (Int, Int) = {
    require(threshold > 0 && threshold < 1, s"lshParams: threshold in (0,1), got $threshold")
    require(numPerm >= 2, s"lshParams: numPerm >= 2, got $numPerm")
    val steps = 1000
    def hit(j: Double, b: Int, r: Int): Double = 1.0 - math.pow(1.0 - math.pow(j, r), b)
    def areas(b: Int, r: Int): Double = {
      var fp = 0.0; var fn = 0.0
      var i = 0
      while (i < steps) {
        val j = (i + 0.5) / steps
        val p = hit(j, b, r)
        if (j < threshold) fp += p else fn += (1.0 - p)
        i += 1
      }
      (fp * fpWeight + fn * fnWeight) / steps
    }
    val candidates = for {
      r <- 1 to numPerm
      b = numPerm / r
      if b >= 1
    } yield (b, r)
    candidates.minBy { case (b, r) => areas(b, r) }
  }

  /** Per-band hashes of a MinHash signature — the LSH blocking key. One
    * array element per band: xxhash64 of that band's signature slice.
    * Shared by the batch pair pipeline and the streaming near-dup flagger
    * so the blocking scheme cannot drift between them.
    */
  def bandHashes(sig: Column, numBands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(numBands - 1)),
      b => xxhash64(slice(sig, b * rowsPerBand + 1, lit(rowsPerBand))
        .cast("string"), b))

  /** MinHash-LSH near-duplicate pairs, verified with exact shingle Jaccard.
    *
    * Pipeline (all distributed): signature (narrow) → explode bands →
    * shuffle on (band, bandHash) → self-join per bucket → distinct candidate
    * pairs → exact-Jaccard verify on the pair's shingle sets → threshold.
    * With numBands×rowsPerBand hashes, P(miss | j≥τ) = (1-τ^r)^b — for
    * r=4, b=32, τ=0.8 that is ~5e-8, so the verified output is exactly the
    * τ-threshold pair set (what the DuckDB oracle computes exhaustively).
    */
  /** `byCols` (optional) scopes dedup to groups: every blocking key —
    * band buckets AND the identical-signature rescue — gains the by
    * columns, so candidates can only pair within a group (the
    * dedup-within-language / within-source recipe). Empty = corpus-wide,
    * byte-identical to the unscoped behavior.
    */
  def minhashDupPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, numBands: Int = 32, rowsPerBand: Int = 4,
      shingleN: Int = 3, maxBucketSize: Int = 100000,
      byCols: Seq[String] = Nil): DataFrame = {
    val numHashes = numBands * rowsPerBand
    // small parquet inputs arrive as one partition; shingle hashing is the
    // dominant narrow cost — spread it across the executor threads (layout-
    // conditional: see spreadNarrow)
    val docs = spreadNarrow(df).select(
      (col(idCol).as("id") +: col(textCol).as("text") +:
        byCols.map(c => col(s"`$c`").as(s"__by_$c"))): _*)
    val byKeys = byCols.map(c => s"__by_$c")
    // sig rides in the same projection as the text (the signature kernel is
    // a per-row expression) — no signatures⋈docs join, no extra shuffle
    val base = docs
      .withColumn("sig",
        graft.functions.vector.minhash_sig(tokens(col("text")), numHashes, shingleN))
      .filter(col("sig").isNotNull)
      .localCheckpoint(eager = false)
    // band rows carry only (id, band, bandhash) — the shuffle stays tiny no
    // matter how long the documents are
    val banded = base.select(
      (col("id") +: byKeys.map(col)) :+
        posexplode(bandHashes(col("sig"), numBands, rowsPerBand))
          .as(Seq("band", "bandhash")): _*)
    val bandJoinKeys = Seq("band", "bandhash") ++ byKeys
    // hot-bucket guard: boilerplate text (license headers, templated pages)
    // lands thousands of docs in one (band, bandhash) bucket, turning the
    // pair space quadratic. Buckets over `maxBucketSize` are dropped from
    // candidate generation; a pair sharing a hot bucket is usually still
    // found through its other numBands-1 bands (OR-amplification).
    // Pair enumeration shuffles the band rows ONCE (explicit hash
    // repartition on the bucket key — the exchange is shared by both
    // aggregations below via ReusedExchange) and then bounds per-group
    // aggregation state BEFORE anything wide is built: a constant-state
    // count aggregate finds the over-cap buckets (a tiny table — at most
    // |band rows| / maxBucketSize keys), the band rows anti-join those
    // keys away, and only then does collect_list materialize a bucket's
    // membership — so the largest possible aggregation buffer is
    // maxBucketSize ids BY CONSTRUCTION. The former shape collected the
    // FULL membership first and capped on the collected size: one
    // degenerate boilerplate bucket (the exact thing the cap exists to
    // kill) became an unbounded, non-spillable buffer inside the
    // aggregation (guide §5 — a single group's list cannot spill
    // partially). The two chained Generates keep per-row memory O(bucket)
    // (member × tail-slice), never an O(bucket²) in-memory pair array;
    // per-bucket work is Σ|bucket|², identical to the self-join this
    // replaced in r21. Dropped-bucket set and pair set are unchanged.
    val keyedBand = banded.repartition(bandJoinKeys.map(col): _*)
    val hotBuckets = keyedBand.groupBy(bandJoinKeys.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxBucketSize)
      .select(bandJoinKeys.map(col): _*)
    val coldCands = keyedBand.join(hotBuckets, bandJoinKeys, "left_anti")
      .groupBy(bandJoinKeys.map(col): _*)
      .agg(collect_list(col("id")).as("__ids"))
      .filter(size(col("__ids")) >= 2)
      .select(col("__ids"), posexplode(col("__ids")).as(Seq("__i", "__x")))
      .select(col("__x").as("__a"),
        explode(slice(col("__ids"), col("__i") + lit(2),
          size(col("__ids")) - col("__i") - lit(1))).as("__b"))
      .select(least(col("__a"), col("__b")).as("id1"),
        greatest(col("__a"), col("__b")).as("id2"))
    // The one case OR-amplification canNOT cover: a family of >maxBucketSize
    // documents with IDENTICAL signatures makes ALL its buckets hot at once,
    // so every family pair vanishes from the cold path. Such families are
    // visible directly in the signatures — no bucket join needed: group by a
    // hash of the full signature (8-byte key, map-side combinable) and emit
    // a representative-vs-rest star (min-id vs each other id) per family
    // larger than the cap. O(family) candidates, still exact-Jaccard
    // verified (sig-hash collisions just add candidates the verify filters
    // out). RESIDUAL TRADE: identical signatures only ESTIMATE J=1 — if a
    // rep-vs-x star pair fails exact verification, any x-vs-y pair that
    // would have passed is never generated (only rep pairs exist), so an
    // over-cap family whose members straddle the threshold can split into
    // more clusters than exhaustive pairing would give. Accepted: for the
    // caps and thresholds used here an identical-signature family is
    // near-duplicate boilerplate where rep pairs pass uniformly, and the
    // alternative (within-family all-pairs) is exactly the quadratic
    // blow-up the cap exists to avoid.
    // Smaller families inside buckets made hot by OTHERS keep the standard
    // guarantee: a pair is lost only if all numBands of its buckets are hot,
    // which for non-identical signatures means numBands independent
    // collisions with foreign boilerplate — the documented residual trade.
    val sigKeys = "sigkey" +: byKeys
    val sigged = base.select(
      col("id") +: xxhash64(col("sig").cast("string")).as("sigkey") +:
        byKeys.map(col): _*)
    val famRep = sigged.groupBy(sigKeys.map(col): _*)
      .agg(min(col("id")).as("rep"), count(lit(1)).as("fam"))
      .filter(col("fam") > maxBucketSize).drop("fam")
    val starCands = sigged.join(famRep, sigKeys)
      .filter(col("id") =!= col("rep"))
      .select(col("rep").as("id1"), col("id").as("id2"))
    val cands = coldCands.unionAll(starCands).dropDuplicates("id1", "id2")
    // cheap estimated-Jaccard prefilter from the signatures, then exact
    // verification on the shingle sets. Both payloads (sig + sorted
    // shingles) ride ONE side table attached in one join per pair end —
    // half the joins and half the base-table passes of the former
    // sigs-then-shingles two-stage attach; the est filter still sits below
    // the intersect projection (Catalyst pushes it through), so the exact
    // kernel only runs on estimate-passing pairs.
    val margin = math.max(0.0, threshold - 0.15)
    val side = base.select(col("id"), col("sig"),
      array_sort(shingles(col("text"), shingleN)).as("sh"))
    cands
      .join(side.select(col("id").as("id1"), col("sig").as("sig1"),
        col("sh").as("sh1")), Seq("id1"))
      .join(side.select(col("id").as("id2"), col("sig").as("sig2"),
        col("sh").as("sh2")), Seq("id2"))
      .withColumn("est", size(filter(zip_with(col("sig1"), col("sig2"),
        (x, y) => x === y), b => b)).cast("double") / numHashes)
      .filter(col("est") >= margin)
      .withColumn("inter", graft.functions.vector.sorted_intersect_count(col("sh1"), col("sh2")))
      .withColumn("j", col("inter").cast("double") /
        (size(col("sh1")) + size(col("sh2")) - col("inter")))
      .filter(col("j") >= threshold)
      .select("id1", "id2", "j")
  }

  /** Cross-corpus near-duplicate pairs — "dedup the new crawl against the
    * corpus we already trained on": every (probe, ref) pair with exact
    * n-gram Jaccard ≥ threshold, candidates from a MinHash band join
    * BETWEEN the two tables (same LSH design as [[minhashDupPairs]], but
    * the join is probe⋈ref on (band, bandhash) — never a self-join, never
    * probe×ref). Per-side hot-bucket caps bound boilerplate blowup; on top
    * of the band path, an unconditional identical-signature equi-join (one
    * 8-byte sigkey per doc) catches exact/near-exact copies even when
    * every one of their buckets is hot — the cross-corpus analogue of the
    * self-join star rescue, and cheap because it is a plain equi-join on a
    * scalar key. Candidates are estimated-Jaccard prefiltered then
    * exact-verified, so precision is exact. Returns (id1 = probe id,
    * id2 = ref id, j) — fixed names, same pair convention as the other
    * dedup ops (the two input id columns may share a name).
    */
  /** One side's pinned signature base for [[crossCorpusDupPairs]] —
    * exposed (package-private) so a composition whose driver is blocked on
    * an independent sub-job (addShard's within-shard election) can
    * materialize the corpus side CONCURRENTLY (guide §2.6) and pass it to
    * [[crossCorpusDupPairsPrepped]]. numHashes/shingleN must match the
    * pair call's numBands·rowsPerBand/shingleN.
    */
  private[graft] def crossCorpusPrep(df: DataFrame, idCol: String,
      textCol: String, numHashes: Int = 128, shingleN: Int = 3): DataFrame =
    spreadNarrow(df).select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("sig",
        graft.functions.vector.minhash_sig(tokens(col("text")), numHashes, shingleN))
      .filter(col("sig").isNotNull)
      .localCheckpoint(eager = false)

  def crossCorpusDupPairs(probe: DataFrame, probeIdCol: String, probeTextCol: String,
      ref: DataFrame, refIdCol: String, refTextCol: String,
      threshold: Double, numBands: Int = 32, rowsPerBand: Int = 4,
      shingleN: Int = 3, maxBucketSize: Int = 100000): DataFrame = {
    val numHashes = numBands * rowsPerBand
    crossCorpusDupPairsPrepped(
      crossCorpusPrep(probe, probeIdCol, probeTextCol, numHashes, shingleN),
      crossCorpusPrep(ref, refIdCol, refTextCol, numHashes, shingleN),
      threshold, numBands, rowsPerBand, shingleN, maxBucketSize)
  }

  /** [[crossCorpusDupPairs]] over pre-prepped sides (see [[crossCorpusPrep]]). */
  private[graft] def crossCorpusDupPairsPrepped(pBase: DataFrame, rBase: DataFrame,
      threshold: Double, numBands: Int = 32, rowsPerBand: Int = 4,
      shingleN: Int = 3, maxBucketSize: Int = 100000): DataFrame = {
    val numHashes = numBands * rowsPerBand
    def bandRows(base: DataFrame, tag: Int): DataFrame =
      base.select(col("id"),
        posexplode(bandHashes(col("sig"), numBands, rowsPerBand))
          .as(Seq("band", "bandhash")))
        .withColumn("__side", lit(tag))
    // probe-vs-ref prune (the fuzzyJoin r20 scheme): only buckets present
    // on the PROBE side can produce pairs, so the ref (corpus) band
    // explosion is semi-joined against the probe's distinct bucket set
    // before the aggregate. Whole absent buckets only — surviving buckets
    // keep their exact per-side counts, so every cap decision is unchanged.
    // This is the new-shard-vs-corpus shape (addShard): a small probe's
    // bucket set broadcasts and the corpus band stream is cut scan-side
    // instead of aggregated at full width.
    val pBand = bandRows(pBase, 0)
    // the using-columns semi-join moves (band, bandhash) to the front —
    // re-select the original order, the union below aligns POSITIONALLY
    val rBand = bandRows(rBase, 1)
      .join(pBand.select("band", "bandhash").distinct(),
        Seq("band", "bandhash"), "left_semi")
      .select("id", "band", "bandhash", "__side")
    // cogrouped candidate generation: ONE exchange over the unioned band
    // rows (explicit repartition shared by both aggregations via
    // ReusedExchange). Per-group state is bounded BEFORE the wide
    // aggregate: a constant-state pair of conditional counts finds buckets
    // over EITHER side's cap (tiny table), the band rows anti-join them
    // away, and collect_list then materializes at most 2·maxBucketSize ids
    // per bucket by construction — the former collect-then-cap shape let
    // one boilerplate bucket build an unbounded non-spillable aggregation
    // buffer (guide §5). Same dropped buckets, same probe×ref pair set;
    // the chained Generates keep per-row memory O(bucket).
    val unioned = pBand.unionAll(rBand)
      .repartition(col("band"), col("bandhash"))
    val hotBuckets = unioned.groupBy("band", "bandhash")
      .agg(count(when(col("__side") === 0, lit(1))).as("__np"),
        count(when(col("__side") === 1, lit(1))).as("__nr"))
      .filter(col("__np") > maxBucketSize || col("__nr") > maxBucketSize)
      .select("band", "bandhash")
    val bandCands = unioned.join(hotBuckets, Seq("band", "bandhash"), "left_anti")
      .groupBy("band", "bandhash")
      .agg(collect_list(when(col("__side") === 0, col("id"))).as("__pids"),
        collect_list(when(col("__side") === 1, col("id"))).as("__rids"))
      .filter(size(col("__pids")) >= 1 && size(col("__rids")) >= 1)
      .select(col("__rids"), explode(col("__pids")).as("pid"))
      .select(col("pid"), explode(col("__rids")).as("rid"))
    val sigCands = pBase
      .select(xxhash64(col("sig").cast("string")).as("sigkey"), col("id").as("pid"))
      .join(rBase.select(xxhash64(col("sig").cast("string")).as("sigkey"),
        col("id").as("rid")), Seq("sigkey"))
      .select("pid", "rid")
    val cands = bandCands.unionAll(sigCands).dropDuplicates("pid", "rid")
    // one payload attach per pair end (sig + sorted shingles together),
    // same est-prefilter-below-exact-verify shape as minhashDupPairs
    val margin = math.max(0.0, threshold - 0.15)
    cands
      .join(pBase.select(col("id").as("pid"), col("sig").as("sig1"),
        array_sort(shingles(col("text"), shingleN)).as("sh1")), Seq("pid"))
      .join(rBase.select(col("id").as("rid"), col("sig").as("sig2"),
        array_sort(shingles(col("text"), shingleN)).as("sh2")), Seq("rid"))
      .withColumn("est", size(filter(zip_with(col("sig1"), col("sig2"),
        (x, y) => x === y), b => b)).cast("double") / numHashes)
      .filter(col("est") >= margin)
      .withColumn("inter",
        graft.functions.vector.sorted_intersect_count(col("sh1"), col("sh2")))
      .withColumn("j", col("inter").cast("double") /
        (size(col("sh1")) + size(col("sh2")) - col("inter")))
      .filter(col("j") >= threshold)
      .select(col("pid").as("id1"), col("rid").as("id2"), col("j"))
  }

  /** Exact all-pairs n-gram Jaccard above a threshold — result-identical
    * to the quadratic all-pairs baseline, computed with prefix filtering
    * (Bayardo et al., WWW 2007 "Scaling Up All Pairs Similarity Search";
    * Chaudhuri et al., ICDE 2006): under ANY fixed total order of the
    * shingle universe, two sets with |A∩B| ≥ α must both contain their
    * smallest shared element within their first |x| − α + 1 elements
    * (everything after that window is only α − 1 elements). J(A,B) ≥ t
    * implies |A∩B| ≥ t·max(|A|,|B|) ≥ t·|x| for each side, so emitting
    * index postings only for the first |x| − ⌊t·|x|⌋ + 1 sorted shingles
    * of each document (⌊·⌋, not ⌈·⌉ — one element longer than optimal,
    * immune to FP rounding in t·|x|, never shorter than the pigeonhole
    * needs) generates EVERY qualifying pair as a candidate. Exact-Jaccard
    * verification then makes precision exact too — same pair set, same j
    * arithmetic as the all-pairs join this replaces (PairsJaccardSpec pins
    * the equivalence property).
    *
    * Scale shape: candidates come from an equi-join-style bucket unnest on
    * the prefix shingle (one shuffle keyed on the shingle, pair work
    * quadratic per posting list — lists are short because prefixes are the
    * ~(1−t) rarest-position slice of each doc), then one verify join per
    * pair end. Nothing is corpus-quadratic, unlike the former broadcast
    * nested loop (n²/2 intersect kernels). No hot-bucket cap: dropping a
    * bucket here would LOSE pairs — a boilerplate-heavy corpus at a low
    * threshold degrades toward all-pairs, which is this operator's honest
    * worst case (the LSH path is the 100 TB plan).
    */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, shingleN: Int = 3): DataFrame = {
    require(threshold > 0 && threshold <= 1,
      s"ngramJaccardPairs: threshold in (0,1], got $threshold")
    // sorted-distinct shingles once per doc -> prefix slicing is a narrow
    // projection and the verify step can use the allocation-free
    // sorted-merge intersect kernel. Pinned: feeds the posting explode and
    // both verify attaches.
    val sh = spreadNarrow(df).select(col(idCol).as("id"),
        array_sort(shingles(col(textCol), shingleN)).as("sh"))
      .localCheckpoint(eager = false)
    val prefLen = greatest(
      size(col("sh")) - floor(lit(threshold) * size(col("sh"))).cast("int") + 1,
      lit(0))
    val postings = sh.select(col("id"),
      explode(slice(col("sh"), lit(1), prefLen)).as("g"))
    // i<j pair unnest per posting list — the bounded-memory chained-
    // Generate shape of the other generators (no cap: see doc note)
    val cands = postings.groupBy("g")
      .agg(collect_list(col("id")).as("__ids"))
      .filter(size(col("__ids")) >= 2)
      .select(col("__ids"), posexplode(col("__ids")).as(Seq("__i", "__x")))
      .select(col("__x").as("__a"),
        explode(slice(col("__ids"), col("__i") + lit(2),
          size(col("__ids")) - col("__i") - lit(1))).as("__b"))
      // strict <: the all-pairs form never paired a row with itself, so a
      // duplicated id must not self-pair here either
      .filter(col("__a") =!= col("__b"))
      .select(least(col("__a"), col("__b")).as("id1"),
        greatest(col("__a"), col("__b")).as("id2"))
      .dropDuplicates("id1", "id2")
    cands
      .join(sh.select(col("id").as("id1"), col("sh").as("sh1")), Seq("id1"))
      .join(sh.select(col("id").as("id2"), col("sh").as("sh2")), Seq("id2"))
      .withColumn("inter", graft.functions.vector.sorted_intersect_count(col("sh1"), col("sh2")))
      .withColumn("j", col("inter").cast("double") /
        (size(col("sh1")) + size(col("sh2")) - col("inter")))
      .filter(col("j") >= threshold)
      .select("id1", "id2", "j")
  }

  /** Connected components over near-duplicate pairs → cluster id = the
    * minimum reachable doc id. This is the step after pair generation in a
    * real dedup pipeline: clusters → keep one canonical doc per cluster.
    *
    * Distributed min-label propagation: every iteration joins current labels
    * across the (symmetrized) edge list and takes the min of neighbor
    * labels; converges in graph-diameter iterations (near-dup clusters are
    * shallow — chains longer than `maxIters` would leave stale labels, so
    * we iterate to a fixpoint with a bounded driver loop; each check is one
    * tiny count).
    */
  def dupClusters(ids: DataFrame, idCol: String, pairs: DataFrame,
      maxIters: Int = 10, smallEdgeThreshold: Long = 100000L): DataFrame = {
    // symmetrize in ONE pass over pairs: the unionAll form evaluates the
    // (expensive) pair pipeline once per branch — the checkpoint sits
    // downstream of the union, so it materialized the LSH pipeline twice
    val edges = pairs.select(explode(array(
        struct(col("id1").as("a"), col("id2").as("b")),
        struct(col("id2").as("a"), col("id1").as("b")))).as("e"))
      .select(col("e.a").as("a"), col("e.b").as("b"))
      .localCheckpoint(eager = false)
    // Adaptive cutover (same pattern as ScaleWindows): near-dup edge lists
    // are tiny relative to the corpus — duplicate pairs above threshold are
    // rare even at 100 TB. Below `smallEdgeThreshold` edges, collect ONLY
    // the edges (never the ids) and run exact union-find on the driver in
    // one pass; non-edge docs are their own cluster via a broadcast
    // left-join. Above it, the distributed min-label loop below takes over.
    // The default threshold (100k symmetrized edges → a ≤200k-entry map,
    // single-digit MB) is sized for a MODEST driver heap: the collect must
    // never be what OOMs a driver that the always-distributed path would
    // have kept alive. Raise it explicitly when the driver has headroom.
    // driver path only for bigint ids — keeps the cluster column's type
    // identical to the distributed path's (cluster = least over id values)
    val integralId =
      edges.schema.fields.head.dataType == org.apache.spark.sql.types.LongType
    // one action decides the path AND fetches the edges: collect at most
    // threshold+1 rows — fewer than requested means we hold the COMPLETE
    // edge list (bounded by construction), one more means fall through to
    // the distributed loop. Replaces the former count() + collect() pair
    // (two sequential jobs over the same checkpoint).
    val probeN = (math.min(smallEdgeThreshold, Int.MaxValue - 1L) + 1L).toInt
    val edgeHead =
      if (integralId) edges.limit(probeN).collect()
      else Array.empty[org.apache.spark.sql.Row]
    if (integralId && edgeHead.length < probeN) {
      val parent = new scala.collection.mutable.HashMap[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent.getOrElse(r, r)
        var c = x // path compression
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      edgeHead.foreach { row =>
        val (a, b) = (row.getAs[Number](0).longValue(), row.getAs[Number](1).longValue())
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) // min-id root
      }
      val mapping = parent.keys.map(x => (x, find(x))).toSeq
      if (mapping.isEmpty)
        return ids.select(col(idCol).as("id"), col(idCol).as("cluster"))
      val spark = ids.sparkSession
      import spark.implicits._
      val mapDf = mapping.toDF("id", "__c")
      return ids.select(col(idCol).as("id"))
        .join(broadcast(mapDf), Seq("id"), "left")
        .select(col("id"), coalesce(col("__c"), col("id")).as("cluster"))
    }
    // The iterative state is restricted to CLUSTER MEMBERS (edge
    // endpoints): a row no edge touches can never change its label, yet
    // the corpus-wide `labels` the loop previously carried made EVERY
    // iteration shuffle the full corpus twice (edge⋈labels lookup + the
    // update join). Near-dup members are a small fraction of a corpus at
    // any scale, so the loop now shuffles |members| rows per iteration and
    // the corpus is touched exactly once, by the final left join. Labels
    // and convergence are unchanged: non-members keep cluster = own id,
    // which is exactly what iterating them produced.
    val members = edges.select(col("a").as("id")).distinct()
      .localCheckpoint(eager = false)
    var labels = members.select(col("id"), col("id").as("cluster"))
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "b").withColumnRenamed("cluster", "nc"), Seq("b"))
        .groupBy(col("a").as("id")).agg(min(col("nc")).as("nmin"))
      // carry the changed flag through the update itself: the eager
      // checkpoint materializes it for free, so the convergence probe is a
      // filter over the checkpointed frame instead of a second labels join
      val stepped = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("cluster"), coalesce(col("nmin"), col("cluster"))).as("cluster"),
          (col("nmin").isNotNull && col("nmin") < col("cluster")).as("__c1"))
      // path halving (pointer jumping): label(x) ← min(label(x),
      // label(label(x))) — labels always hold MEMBER ids (initial = own id,
      // updates take mins of member labels), so one members-sized self-join
      // follows the pointer a hop. Iterations drop from O(diameter) to
      // O(log diameter): ClusterLoopProbe measured 500 → 9 iterations /
      // 256 → 13 s on a diameter-500 chain at 100k nodes, and a wash
      // (7.3 vs 7.5 s) on the realistic shallow clique shape (sf1 ScaleGen
      // minhash pairs, diameter ≤ 2, converges in 2 iterations either
      // way) — labels identical on both. It also makes convergence within
      // `maxIters` exponentially more robust: diameter up to ~2^maxIters
      // instead of maxIters before labels go stale.
      val updated = stepped.join(
          stepped.select(col("id").as("__lk"), col("cluster").as("__gp")),
          stepped("cluster") === col("__lk"), "left")
        .select(stepped("id"),
          least(stepped("cluster"), coalesce(col("__gp"), stepped("cluster")))
            .as("cluster"),
          (stepped("__c1") ||
            (col("__gp").isNotNull && col("__gp") < stepped("cluster")))
            .as("__changed"))
        .localCheckpoint(eager = true)
      val changed = updated.filter(col("__changed")).limit(1).count()
      labels = updated.drop("__changed")
      converged = changed == 0
      iter += 1
    }
    ids.select(col(idCol).as("id"))
      .join(labels.withColumnRenamed("cluster", "__c"), Seq("id"), "left")
      .select(col("id"), coalesce(col("__c"), col("id")).as("cluster"))
  }

  /** End-to-end near-dedup — the operation a training pipeline actually
    * runs: MinHash-LSH pairs → connected components → keep ONE canonical
    * row (minimum id) per duplicate cluster, plus every row that never
    * paired. Output = the deduplicated corpus (original columns) with a
    * `cluster_size` count. Composes [[minhashDupPairs]] and [[dupClusters]],
    * so it inherits their scale design (bucketed candidate generation,
    * adaptive driver/distributed clustering).
    */
  def dedupNear(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, numBands: Int = 32, rowsPerBand: Int = 4,
      shingleN: Int = 3): DataFrame = {
    val pairs = minhashDupPairs(df, idCol, textCol, threshold,
      numBands, rowsPerBand, shingleN)
    val clusters = dupClusters(df.select(col(idCol)), idCol, pairs)
    // canonical = min reachable id = the cluster LABEL itself, and the
    // label is always a member id — so the per-cluster size aggregate IS
    // the keep set (cluster → idCol rename), no sizes⋈clusters join and no
    // id===cluster filter pass
    val keep = clusters.groupBy(col("cluster"))
      .agg(count(lit(1)).as("cluster_size"))
      .select(col("cluster").as(idCol), col("cluster_size"))
    df.join(keep, Seq(idCol))
  }

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD 2003): hash
    * every word `shingleN`-gram (md5-derived 48-bit, so the oracle can
    * reproduce it), then keep the minimum hash of each `window` consecutive
    * grams. Any shared run of at least `shingleN + window - 1` tokens is
    * guaranteed to share a fingerprint — the basis for detecting PARTIAL
    * overlap (contamination / quotation), which whole-document MinHash
    * misses. Output: one (id, fp) row per distinct selected fingerprint —
    * a distributed inverted index. Short docs (< shingleN + window - 1
    * tokens) yield no fingerprints, mirroring the empty-shingle contract.
    */
  /** Per-document winnowing fingerprint SET as a single array column — the
    * two codegen kernels (gram hashing + O(n) monotonic-deque window
    * minima) without the explode, for callers that flag per row instead of
    * building an inverted index (the streaming corpus-prep pipeline).
    */
  def winnowFpArray(text: Column, shingleN: Int = 3,
      window: Int = 4): Column = {
    val hashes = graft.functions.vector.gram_hash48(
      coalesce(tokens(text), array().cast("array<string>")), shingleN)
    array_distinct(graft.functions.vector.window_min(hashes, window))
  }

  def winnowFingerprints(df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, window: Int = 4): DataFrame = {
    // the whole per-document pipeline is two codegen kernels: gram hashing
    // (md5 straight from token bytes — no hex/conv round-trip, no
    // interpreted per-gram lambda) and O(n) monotonic-deque window minima.
    // Small parquet inputs arrive as one partition; the hashing is the
    // dominant narrow cost — spread it.
    val par = df.sparkSession.sparkContext.defaultParallelism
    val fps = winnowFpArray(col(textCol), shingleN, window)
    // streaming frames keep their micro-batch partitioning (the narrow
    // kernel pipeline runs as-is on a stream — see StreamingOps)
    val spread = if (df.isStreaming) df else df.repartition(par)
    spread.select(col(idCol).as("id"), explode(fps).as("fp"))
  }

  /** Containment pairs over winnowing fingerprints — contamination
    * detection: pairs whose shared rare fingerprints cover ≥ `threshold` of
    * the smaller side's fingerprint set. Fingerprints present in more than
    * `maxDocFreq` documents are dropped first (boilerplate n-grams carry no
    * identity — the same document-frequency cut real contamination pipelines
    * apply), which both sharpens the signal and bounds the inverted-index
    * self-join at maxDocFreq² rows per fingerprint. All shuffles are keyed
    * on fp or (id1, id2); nothing is quadratic in the corpus.
    */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, shingleN: Int = 3, window: Int = 4,
      maxDocFreq: Int = 10): DataFrame = {
    // The capped inverted index is built over ONE shuffle of the
    // fingerprint stream (explicit repartition on fp, shared by both
    // aggregations via ReusedExchange) with per-group state bounded BEFORE
    // the wide aggregate: a constant-state count finds fingerprints over
    // the document-frequency cap (boilerplate n-grams — a bounded-size
    // key set), the stream anti-joins them away, and collect_list then
    // materializes at most maxDocFreq ids per fingerprint by construction.
    // The former collect-then-filter shape materialized the FULL posting
    // list of every fingerprint — including the boilerplate ones the cut
    // exists to kill — as an unbounded non-spillable aggregation buffer
    // (guide §5). Same surviving postings; the pinned postings feed both
    // per-doc sizes and the pair explode, the chained Generates keep
    // per-row memory O(postings), per-bucket pair work ≤ maxDocFreq².
    val fpRows = winnowFingerprints(df, idCol, textCol, shingleN, window)
      .repartition(col("fp"))
    val hotFps = fpRows.groupBy("fp").agg(count(lit(1)).as("__df"))
      .filter(col("__df") > maxDocFreq)
      .select("fp")
    val postings = fpRows.join(hotFps, Seq("fp"), "left_anti")
      .groupBy("fp").agg(collect_list(col("id")).as("__ids"))
      .localCheckpoint(eager = false)
    val sizes = postings.select(explode(col("__ids")).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n"))
    val inter = postings
      .filter(size(col("__ids")) >= 2)
      .select(col("__ids"), posexplode(col("__ids")).as(Seq("__i", "__x")))
      .select(col("__x").as("__a"),
        explode(slice(col("__ids"), col("__i") + lit(2),
          size(col("__ids")) - col("__i") - lit(1))).as("__b"))
      .groupBy(least(col("__a"), col("__b")).as("id1"),
        greatest(col("__a"), col("__b")).as("id2"))
      .agg(count(lit(1)).as("m"))
    inter
      .join(sizes.select(col("id").as("id1"), col("n").as("n1")), Seq("id1"))
      .join(sizes.select(col("id").as("id2"), col("n").as("n2")), Seq("id2"))
      .withColumn("containment",
        round(col("m").cast("double") / least(col("n1"), col("n2")), 6))
      .filter(col("containment") >= threshold)
      .select("id1", "id2", "containment")
  }

  /** Batch benchmark decontamination — remove every training document that
    * shares at least `minShared` winnowing fingerprints with the benchmark
    * corpus (the eval-leakage scrub run before training; streaming
    * counterpart: [[graft.streaming.StreamingOps.contaminationFlags]]).
    * The benchmark index is tiny relative to the corpus, so its fingerprint
    * set broadcasts; the corpus side is one narrow fingerprint pass + an
    * anti join keyed on the doc id. Returns the surviving rows of `df`.
    */
  def decontaminate(df: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchIdCol: String, benchTextCol: String,
      minShared: Int = 3, shingleN: Int = 3, window: Int = 4): DataFrame = {
    val benchFps = winnowFingerprints(benchmark, benchIdCol, benchTextCol,
      shingleN, window).select("fp").distinct()
    val contaminated = winnowFingerprints(df, idCol, textCol, shingleN, window)
      .join(broadcast(benchFps), Seq("fp"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("__shared"))
      .filter(col("__shared") >= minShared)
      .select(col("id").as(idCol))
    df.join(contaminated, Seq(idCol), "left_anti")
  }

  /** Bloom-filter decontamination — result-identical to [[decontaminate]]
    * (same fingerprints, same minShared rule), with a constant-memory
    * membership prefilter in front of the exact verify. Why it exists: the
    * broadcast-index form needs the whole benchmark fingerprint set in
    * every executor; at a 10⁸-fingerprint benchmark that hash relation is
    * multiple GB, while a 1%-fpp Bloom filter is ~9.6 bits/item (~120 MB)
    * and its membership test is a narrow, codegen'd per-row probe
    * (Spark's own `BloomFilterMightContain`, the runtime-filter kernel).
    * False positives cannot leak through: the probe only PREFILTERS the
    * corpus fingerprint stream, and survivors (≈ fpp × corpus) still pass
    * through the exact semi-join before any document is dropped — so the
    * output is bit-identical to the exact operator, which is exactly what
    * the shared oracle gate asserts.
    */
  /** Boolean probe column: whether `value` (a long) might be a member of
    * the `fp` column of `fps` — a driver-built Spark sketch Bloom filter
    * riding the plan as one binary literal, tested per row by the codegen
    * `BloomFilterMightContain` kernel (the same expression Spark's runtime
    * row-group filters inject). Narrow, stateless, streaming-safe; the
    * build is one distributed aggregation + a bounded (bits/8-byte)
    * driver materialization.
    */
  def fpBloomMightContain(fps: DataFrame, value: Column,
      fpp: Double = 0.01): Column = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.graftx.Bridge
    val n = fps.count()
    // empty reference: nothing can be a member (stat.bloomFilter NPEs on
    // a zero-row build — its aggregate returns a null buffer)
    if (n == 0) return lit(false)
    val bf = fps.stat.bloomFilter("fp", n, fpp)
    val bytes = {
      val bos = new java.io.ByteArrayOutputStream()
      bf.writeTo(bos); bos.toByteArray
    }
    Bridge.column(BloomFilterMightContain(Literal(bytes),
      Bridge.expression(value.cast("long"))))
  }

  def decontaminateBloom(df: DataFrame, idCol: String, textCol: String,
      benchmark: DataFrame, benchIdCol: String, benchTextCol: String,
      minShared: Int = 3, shingleN: Int = 3, window: Int = 4,
      fpp: Double = 0.01): DataFrame = {
    val benchFps = winnowFingerprints(benchmark, benchIdCol, benchTextCol,
      shingleN, window).select("fp").distinct()
      .localCheckpoint(eager = false) // feeds count, bloom build, verify join
    val contaminated = winnowFingerprints(df, idCol, textCol, shingleN, window)
      .filter(fpBloomMightContain(benchFps, col("fp"), fpp)) // narrow probe
      .join(broadcast(benchFps), Seq("fp"))      // exact verify on survivors
      .groupBy(col("id"))
      .agg(count(lit(1)).as("__shared"))
      .filter(col("__shared") >= minShared)
      .select(col("id").as(idCol))
    df.join(contaminated, Seq(idCol), "left_anti")
  }

  /** 48-bit SimHash over distinct tokens, with md5-derived token hashes
    * (md5 so the oracle can reproduce it; 48 bits keeps the value in a
    * signed BIGINT). One narrow codegen projection — the signature is a
    * pure function of the row's own tokens, so the earlier explode +
    * groupBy(id) + 48 conditional-sum columns (a full shuffle of one row
    * per distinct token and a 48-wide agg buffer) was pure overhead; the
    * [[graft.functions.vector.simhashKernel]] form is value-identical
    * (same md5-prefix bit math) with no exchange at any corpus size.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String, bits: Int = 48): DataFrame =
    df.select(col(idCol).as("id"),
      graft.functions.vector.simhash_sig(tokens(col(textCol)), bits).as("simhash"))

  /** C4-style line-level corpus dedup (reference has no counterpart; the
    * C4 recipe — Raffel et al., arXiv:1910.10683 §2.2 — drops every
    * repeated occurrence of a line across the WHOLE corpus, keeping the
    * first). A line participates in dedup only when its trimmed length is
    * ≥ `minLineChars` (boilerplate guards like blank lines or "---" stay
    * everywhere, as in C4's three-sentence-span variant); matching is on
    * md5(lower(trim(line))) so the shuffle carries a 32-byte key, never
    * the line text. First occurrence = smallest (id, line index).
    *
    * Scale shape: split+posexplode (narrow) → ONE aggregation shuffle on
    * the line hash whose min(struct(id, idx, line)) both elects the keeper
    * and carries its text (map-side combine applies; no join back to the
    * corpus for the winner's content) → union with the always-kept short
    * lines (narrow) → ONE shuffle on id to reassemble documents in line
    * order. Documents whose every line was dropped re-enter via a left
    * join on id, which reuses the reassembly exchange. Nothing is
    * quadratic; both shuffle keys are bounded-width.
    *
    * Returns (idCol, textCol deduped, n_lines_kept).
    */
  def dedupLines(df: DataFrame, idCol: String, textCol: String,
      minLineChars: Int = 10, sep: String = "\n"): DataFrame = {
    val lines = df.select(col(idCol).as("id"),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep), -1))
          .as(Seq("idx", "line")))
    val short = lines.filter(length(trim(col("line"))) < minLineChars)
    val firstOcc = lines.filter(length(trim(col("line"))) >= minLineChars)
      .groupBy(md5(lower(trim(col("line"))).cast("binary")).as("lh"))
      .agg(min(struct(col("id"), col("idx"), col("line"))).as("f"))
      .select(col("f.id").as("id"), col("f.idx").as("idx"),
        col("f.line").as("line"))
    val rebuilt = short.unionByName(firstOcc)
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_lines_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("idx"), col("line")))),
          x => x.getField("line")), sep).as("__text"))
    df.select(col(idCol).as("id")).distinct()
      .join(rebuilt, Seq("id"), "left")
      .select(col("id").as(idCol),
        coalesce(col("__text"), lit("")).as(textCol),
        coalesce(col("n_lines_kept"), lit(0L)).as("n_lines_kept"))
  }

  /** ExactSubstr-style substring-level dedup (Lee et al., "Deduplicating
    * Training Data Makes Language Models Better", arXiv:2107.06499 §4.1):
    * remove every token span of length ≥ `minMatchTokens` that occurs
    * verbatim elsewhere in the corpus, keeping only the globally first
    * occurrence. Token-granular stand-in for the paper's suffix-array
    * scan: a span is duplicated iff it contains a duplicated L-token-gram,
    * so flagging every non-first occurrence of each duplicated L-gram and
    * dropping the L tokens it starts marks exactly the tokens inside
    * ≥ L-token repeats (overlapping flagged grams merge positionally).
    * Within-document repeats are deduplicated too, as in the paper.
    *
    * First occurrence of a gram = smallest (id, pos) under struct
    * ordering (same keeper-election pattern as [[dedupLines]] — safe for
    * the full long id range; a packed id·2³² + pos key would overflow at
    * id ≥ 2³¹). Tokenization: whitespace split, empties dropped; output
    * text is the kept tokens joined by single spaces (same normalization
    * contract as [[dedupLines]]).
    *
    * Scale shape: gram hashing is the narrow codegen [[graft.functions.vector.gram_hash48]]
    * kernel (no gram string materialized); ONE aggregation shuffle on the
    * 48-bit gram hash (count + min-key, map-side combine) elects keepers;
    * the flagged-occurrence join reuses the same hash key; ONE shuffle on
    * id collects each doc's flagged start positions; the rebuild is a
    * narrow per-row projection — each token index is checked against the
    * doc's own sorted flagged starts (exists over an attribute reference,
    * constant per PLANS.md HOF contract; spans per doc are few unless the
    * doc is one giant repeat). Nothing quadratic in the corpus; shuffle
    * keys are 8-byte hashes, never text.
    *
    * Returns (idCol, textCol deduped, n_tokens_kept, n_tokens_removed).
    */
  def dedupSubstrings(df: DataFrame, idCol: String, textCol: String,
      minMatchTokens: Int = 20): DataFrame = {
    val L = minMatchTokens
    require(L >= 2, s"dedupSubstrings: minMatchTokens must be >= 2, got $L")
    // null text ⇒ empty token array (size(null) is -1, not 0 — the counts
    // below must see a real array)
    val toked = df.select(col(idCol).as("id"),
      coalesce(filter(split(col(textCol), "\\s+"), t => length(t) > 0),
        array().cast("array<string>")).as("toks"))
    // one explicit shuffle of the gram stream, shared by the keeper
    // election AND the flagged-occurrence join via ReusedExchange — the
    // former shape exchanged the grams twice (agg + join probe) and ran
    // the gram-hash kernel over the corpus once per exchange
    val grams = toked.select(col("id"),
      posexplode(graft.functions.vector.gram_hash48(col("toks"), L))
        .as(Seq("pos", "gh")))
      .repartition(col("gh"))
    val dupGrams = grams.groupBy("gh")
      .agg(count(lit(1)).as("cnt"),
        min(struct(col("id"), col("pos"))).as("keeper"))
      .filter(col("cnt") > 1)
    val spans = grams.join(dupGrams, Seq("gh"))
      .filter(col("id") =!= col("keeper.id") || col("pos") =!= col("keeper.pos"))
      .groupBy("id").agg(sort_array(collect_list(col("pos"))).as("starts"))
    toked.join(spans, Seq("id"), "left")
      .withColumn("kept", when(col("starts").isNull, col("toks"))
        .otherwise(filter(col("toks"), (t, i) =>
          !exists(col("starts"), p => i >= p && i < p + L))))
      .select(col("id").as(idCol),
        array_join(col("kept"), " ").as(textCol),
        size(col("kept")).cast("long").as("n_tokens_kept"),
        (size(col("toks")) - size(col("kept"))).cast("long")
          .as("n_tokens_removed"))
  }

  /** Corpus-level overlap between two corpora ("how much of the new crawl
    * is already in the trained corpus?") measured on the winnowing
    * fingerprint SETS — so partial/edited overlap counts, not just
    * identical documents. Returns ONE row: distinct fingerprint counts,
    * the shared count, containment of A in B (the decision number for
    * contamination), and set Jaccard.
    *
    * Scale shape: two fingerprint pipelines (narrow codegen kernels), a
    * distinct per side (shuffle on the 8-byte fp), one full-outer
    * equi-join on fp, one combinable global aggregation. No document
    * pairs, no text in any shuffle — corpus comparison at 100 TB is
    * exactly this plan.
    */
  def corpusOverlap(a: DataFrame, b: DataFrame, idCol: String,
      textCol: String, shingleN: Int = 3, window: Int = 4): DataFrame = {
    val fa = winnowFingerprints(a, idCol, textCol, shingleN, window)
      .select(col("fp")).distinct().withColumn("ina", lit(1L))
    val fb = winnowFingerprints(b, idCol, textCol, shingleN, window)
      .select(col("fp")).distinct().withColumn("inb", lit(1L))
    fa.join(fb, Seq("fp"), "full_outer")
      .agg( // coalesce AFTER the sums too: two empty corpora must report
        // zeros, not a null row
        coalesce(sum(coalesce(col("ina"), lit(0L))), lit(0L)).as("n_fps_a"),
        coalesce(sum(coalesce(col("inb"), lit(0L))), lit(0L)).as("n_fps_b"),
        coalesce(sum(coalesce(col("ina"), lit(0L)) *
          coalesce(col("inb"), lit(0L))), lit(0L)).as("n_shared"))
      .select(col("n_fps_a"), col("n_fps_b"), col("n_shared"),
        round(col("n_shared").cast("double") /
          greatest(col("n_fps_a").cast("double"), lit(1.0d)), 6)
          .as("containment_a"),
        round(col("n_shared").cast("double") /
          greatest((col("n_fps_a") + col("n_fps_b") - col("n_shared"))
            .cast("double"), lit(1.0d)), 6).as("jaccard"))
  }
}
