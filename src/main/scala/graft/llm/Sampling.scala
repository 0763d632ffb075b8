package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / splitting for training-data pipelines.
  *
  * Everything here keys off a CONTENT hash, not a random number generator:
  * `rand(seed)` is partition-dependent (the same row samples differently
  * after a repartition, a retry, or a scale-up), which silently breaks
  * train/test hygiene in a distributed pipeline. An md5-derived uniform is
  * reproducible across engines, runs, partitionings, and cluster sizes —
  * and a row's split assignment never changes as the corpus grows, so
  * incremental ingestion can't leak yesterday's test docs into today's
  * training set. All operators are narrow projections/filters: no shuffle,
  * streaming-safe, trivially 100 TB-safe.
  */
object Sampling {

  /** Deterministic uniform in [0, 1): first 8 hex digits of
    * md5(key || "#" || seed) scaled by 2^32. md5 (not xxhash64) so an
    * external oracle can reproduce values bit-for-bit.
    */
  def hashUniform(key: Column, seed: Long = 42L): Column =
    conv(substring(md5(concat(key.cast("string"), lit(s"#$seed"))), 1, 8), 16, 10)
      .cast("double") / 4294967296.0d

  /** Deterministic Bernoulli sample: keep rows whose [[hashUniform]] over
    * `keyCol` falls below `fraction`.
    */
  def hashSample(df: DataFrame, keyCol: String, fraction: Double,
      seed: Long = 42L): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, "hash_sample: fraction in [0,1]")
    df.filter(hashUniform(col(s"`$keyCol`"), seed) < fraction)
  }

  /** Deterministic train/validation/test split: each row is assigned the
    * first named bucket whose cumulative weight exceeds its [[hashUniform]].
    * Weights must sum to ~1 (validated); assignment is stable under corpus
    * growth because it depends only on the row's own key.
    */
  def hashSplit(df: DataFrame, keyCol: String,
      weights: Seq[(String, Double)] = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
      destCol: String = "split", seed: Long = 42L): DataFrame = {
    require(weights.nonEmpty, "hash_split: no buckets")
    require(math.abs(weights.map(_._2).sum - 1.0) < 1e-9,
      s"hash_split: weights must sum to 1, got ${weights.map(_._2).sum}")
    val u = hashUniform(col(s"`$keyCol`"), seed)
    val cuts = weights.scanLeft(0.0d)(_ + _._2).tail
    // last bucket is the otherwise-branch so u in [lastCut-w, 1) can't fall
    // through on float round-off
    val expr = weights.init.zip(cuts.init).foldRight(lit(weights.last._1): Column) {
      case (((name, _), cut), acc) => when(u < cut, name).otherwise(acc)
    }
    df.withColumn(destCol, expr)
  }

  /** Leakage-safe train/val/test split: every member of a duplicate
    * CLUSTER lands in the SAME split, so a near-duplicate of an eval
    * document can never leak into train — the eval-contamination failure
    * mode of splitting by document id. The split key is the cluster label
    * when an (id, cluster) assignment is supplied (e.g. from
    * [[graft.llm.Dedup.dupClusters]] over minhash pairs); without one it
    * is the EXACT-duplicate class (md5 of the text), which needs no pair
    * generation at all. Docs absent from a supplied cluster frame are
    * their own singleton class (split on their id).
    *
    * Scale shape: exact mode is one narrow projection — the key is a hash
    * of the text, no shuffle, no join; cluster mode is one equi-join on
    * id. Determinism: the split rides [[hashUniform]] of the key, so it
    * is partition/run/engine-invariant and stable under corpus growth
    * (new docs never move an existing cluster's split).
    */
  def leakageSafeSplit(df: DataFrame, idCol: String, textCol: String,
      weights: Seq[(String, Double)] =
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
      clusters: Option[DataFrame] = None, clusterCol: String = "cluster",
      destCol: String = "split", seed: Long = 42L): DataFrame = {
    val keyed = clusters match {
      case None =>
        // a null text has no dup class — it splits on its id like a
        // cluster-mode singleton (md5(null) is null, and a null key would
        // otherwise funnel EVERY null-text row into the last bucket)
        df.withColumn("__lsk", coalesce(md5(col(s"`$textCol`").cast("binary")),
          concat(lit("__nulltext#"), col(s"`$idCol`").cast("string"))))
      case Some(c) =>
        df.join(c.select(col(s"`$idCol`"),
            col(s"`$clusterCol`").cast("string").as("__lsc")),
          Seq(idCol), "left")
          .withColumn("__lsk",
            coalesce(col("__lsc"), concat(lit("__singleton#"),
              col(s"`$idCol`").cast("string"))))
          .drop("__lsc")
    }
    hashSplit(keyed, "__lsk", weights, destCol, seed).drop("__lsk")
  }

  /** Deterministic weighted sampling without replacement (Efraimidis &
    * Spirakis 2006, the A-ES exponential-key family): every row draws
    * r = −ln(u)/w with u its content-hash uniform ([[hashUniform]] — NOT
    * rand(seed), so the draw is partition/run/engine-invariant and stable
    * under corpus growth), and the k smallest r win; P(row ranked first) =
    * w_i/Σw, the weighted-sampling-without-replacement guarantee. Rows
    * with weight ≤ 0 never sample. r is rounded BEFORE ranking (tie-break
    * on the key) so the boundary is engine-invariant.
    *
    * Scale shape: one narrow projection + orderBy+limit =
    * TakeOrderedAndProject (per-partition top-k, driver merges k·partitions
    * rows) — no global sort, no shuffle of the corpus.
    */
  def weightedHashSample(df: DataFrame, keyCol: String, weightCol: String,
      k: Int, seed: Long = 42L, roundTo: Int = 6): DataFrame = {
    val u = hashUniform(col(s"`$keyCol`"), seed)
    df.filter(col(s"`$weightCol`").cast("double") > 0)
      .withColumn("skey",
        round((-log(u)) / col(s"`$weightCol`").cast("double"), roundTo))
      .orderBy(col("skey").asc, col(s"`$keyCol`").asc)
      .limit(k)
  }

  /** Token-budget sharding: assign each row (chunk, document) a shard id so
    * every shard carries ≈ `budget` tokens — the deterministic way to cut a
    * tokenized corpus into equal-work training shards. shard =
    * floor(exclusive-prefix-sum(tokens) / budget) in `orderCol` order, via
    * the scale-safe [[graft.operators.ScaleWindows.runningSum]] (bucketed
    * two-phase prefix sum above the adaptive cutover — no single-partition
    * window at corpus size). Deterministic for a unique orderCol.
    */
  def shardByTokenBudget(df: DataFrame, orderCol: String, tokenCol: String,
      budget: Long, destCol: String = "shard"): DataFrame = {
    require(budget > 0, "shard_by_token_budget: budget must be positive")
    graft.operators.ScaleWindows.runningSum(df, orderCol, tokenCol, "__cum")
      .withColumn(destCol,
        floor((col("__cum") - col(s"`$tokenCol`")).cast("double") / budget)
          .cast("int"))
      .drop("__cum")
  }

  /** Sequence packing (concat-and-chunk, the GPT-2/3 training-prep layout,
    * arXiv:2005.14165 appendix B): lay the corpus out as ONE virtual token
    * stream in `orderCol` order — documents back to back, no padding — and
    * cut fixed `seqLen`-token training sequences from it. Emits the packing
    * MAP: one row per (sequence × document) overlap, telling the loader
    * which token range of which document lands at which offset of which
    * sequence. Documents longer than `seqLen` span several sequences;
    * short documents share one. Every sequence is exactly full (the last
    * may be partial).
    *
    * Output adds: `seq_id` (0-based), `tok_start`/`tok_end` (the doc's own
    * token range landing in this sequence, end-exclusive) and `seq_off`
    * (offset inside the sequence where that range starts).
    *
    * Scale shape: the global token offset is the scale-safe bucketed
    * prefix sum of [[shardByTokenBudget]]; the fan-out to overlapped
    * sequences is a narrow sequence+explode (each doc emits
    * ceil(tokens/seqLen)+1 rows at most). Deterministic for a unique
    * `orderCol`. Rows with zero/negative `tokenCol` are dropped (they
    * occupy no stream positions).
    */
  def packSequences(df: DataFrame, orderCol: String, tokenCol: String,
      seqLen: Int): DataFrame = {
    require(seqLen > 0, s"pack_sequences: seqLen must be positive, got $seqLen")
    val tok = col(s"`$tokenCol`").cast("long")
    // filter BEFORE the prefix sum: a dropped zero/negative row must shift
    // no later document's stream offset (docstring + oracle contract)
    graft.operators.ScaleWindows.runningSum(df.filter(tok > 0), orderCol,
      tokenCol, "__cum")
      .withColumn("__off", col("__cum").cast("long") - tok)
      .withColumn("seq_id", explode(sequence(
        floor(col("__off").cast("double") / seqLen).cast("long"),
        floor((col("__cum").cast("double") - 1d) / seqLen).cast("long"))))
      .withColumn("tok_start",
        greatest(col("seq_id") * seqLen - col("__off"), lit(0L)))
      .withColumn("tok_end",
        least((col("seq_id") + 1) * seqLen - col("__off"), tok))
      .withColumn("seq_off",
        greatest(col("__off") - col("seq_id") * seqLen, lit(0L)))
      .drop("__cum", "__off")
  }

  /** Deterministic stratified sample: per-stratum fractions over the same
    * content-hash uniform — still a pure narrow filter (the fractions map is
    * a literal CASE, no join, no per-group pass). Strata absent from the map
    * keep `defaultFraction` (0 drops them).
    */
  def stratifiedHashSample(df: DataFrame, keyCol: String, strataCol: String,
      fractions: Map[String, Double], defaultFraction: Double = 0.0,
      seed: Long = 42L): DataFrame = {
    val f = fractions.foldLeft(lit(defaultFraction)) { case (acc, (k, v)) =>
      when(col(s"`$strataCol`").cast("string") === k, lit(v)).otherwise(acc)
    }
    df.filter(hashUniform(col(s"`$keyCol`"), seed) < f)
  }

  /** Domain-mixture resampling (the Pile / DoReMi recipe, public method —
    * the reference has no equivalent): re-weight a corpus so each domain's
    * share of a `targetRows`-sized output matches `weights`, by
    * deterministic per-row REPLICATION, not just filtering. Per-domain
    * multiplier m_d = w_d · targetRows / n_d; every row emits
    * `floor(m_d)` copies plus one more when its content-hash uniform falls
    * below `frac(m_d)` — so over-represented domains down-sample
    * (m_d < 1 ⇒ Bernoulli keep) and under-represented domains up-sample
    * (m_d > 1 ⇒ whole epochs + a fractional epoch), which is exactly how
    * training mixtures express "3.2 epochs of Wikipedia". Domains absent
    * from `weights` are dropped. A `copy` index column disambiguates the
    * replicas.
    *
    * Scale shape: one tiny per-domain count aggregate (map-side
    * combinable, |domains| rows) broadcast back onto the corpus, then a
    * narrow explode — no corpus-wide shuffle, and replication happens
    * executor-side, so at 100 TB the plan is scan + broadcast-join +
    * explode. Determinism: the multiplier arithmetic `w·T/n_d` and the
    * md5-uniform are both engine-replicable bit-for-bit (same contract as
    * [[hashSample]]).
    */
  def mixDomains(df: DataFrame, keyCol: String, domainCol: String,
      weights: Seq[(String, Double)], targetRows: Long,
      copyCol: String = "copy", seed: Long = 42L): DataFrame = {
    require(weights.nonEmpty, "mix_domains: no domain weights")
    require(weights.forall(_._2 >= 0.0), "mix_domains: negative weight")
    require(weights.map(_._1).distinct.size == weights.size,
      "mix_domains: duplicate domain in weights")
    import df.sparkSession.implicits._
    mixDomainsBy(df, keyCol, domainCol,
      weights.toDF("domain", "weight"), targetRows, copyCol, seed)
  }

  /** DataFrame-weights form of [[mixDomains]]: `weights` is a
    * (domain, weight) frame applied by EQUI-JOIN, so the weight table can
    * be web-scale (one row per registered domain — millions of keys from
    * [[graft.llm.TextAnalysis.extractRegisteredDomain]]) without the
    * literal CASE chain or any driver materialization the Seq form would
    * imply at that cardinality. AQE broadcasts the weight/count side when
    * it is small; above broadcast size it is a plain shuffled equi-join —
    * either way the corpus never collects and the plan carries no
    * |domains|-sized expression. Domains absent from `weights` (and null
    * domains) drop, exactly like a zero/unlisted weight in the Seq form.
    */
  def mixDomainsBy(df: DataFrame, keyCol: String, domainCol: String,
      weights: DataFrame, targetRows: Long, copyCol: String = "copy",
      seed: Long = 42L, weightDomainCol: String = "domain",
      weightCol: String = "weight"): DataFrame = {
    require(targetRows > 0, "mix_domains: targetRows must be positive")
    val counts = df.groupBy(col(s"`$domainCol`").cast("string").as("__dom"))
      .agg(count(lit(1)).as("__n"))
    val wtab = counts.join(
      weights.select(col(s"`$weightDomainCol`").cast("string").as("__dom"),
        col(s"`$weightCol`").cast("double").as("__w")), Seq("__dom"))
    // mult is pure per-row arithmetic over the joined (w, n) pair — no
    // float aggregation, so it is partition-invariant and replicable by an
    // external oracle bit-for-bit
    expandByMult(df, keyCol, domainCol, wtab.select(col("__dom"),
      (col("__w") * lit(targetRows.toDouble) / col("__n").cast("double"))
        .as("__mult")), copyCol, seed)
  }

  /** The shared replication tail of the domain mixers: join the corpus to a
    * (__dom, __mult) table on domain, emit floor(mult) copies plus one more
    * when the row's content-hash uniform falls below frac(mult). Inner
    * join: domains without a multiplier drop, like a zero weight.
    */
  private def expandByMult(df: DataFrame, keyCol: String, domainCol: String,
      multTab: DataFrame, copyCol: String, seed: Long): DataFrame = {
    val u = hashUniform(col(s"`$keyCol`"), seed)
    val copies = (floor(col("__mult")).cast("int") +
      when(u < col("__mult") - floor(col("__mult")), 1).otherwise(0))
    df.join(multTab, col(s"`$domainCol`").cast("string") === col("__dom"))
      .withColumn("__copies", copies)
      .withColumn(copyCol, explode(when(col("__copies") > 0,
        sequence(lit(0), col("__copies") - 1)).otherwise(array().cast("array<int>"))))
      .drop("__dom", "__mult", "__copies")
  }

  /** Temperature-scaled mixture (the multilingual-pretraining sampler,
    * e.g. mBERT/XLM-R style): domain weight ∝ count^alpha, normalized —
    * alpha = 1 reproduces the natural distribution, alpha → 0 approaches
    * uniform, the usual 0.3–0.7 range up-weights low-resource domains.
    *
    * Everything stays in-engine: one per-domain count aggregate, the
    * count^alpha weight per row of THAT bounded table, and a
    * decimal-exact normalizer — then the [[mixDomainsBy]] equi-join
    * expansion. No driver collect and no per-domain literal anywhere, so
    * this composes with web-scale domain keys (temperature-mix BY
    * registered domain from
    * [[graft.llm.TextAnalysis.extractRegisteredDomain]], ~10⁷ distinct
    * eTLD+1s) exactly like any other join.
    *
    * Determinism: sqrt for alpha = 0.5 (IEEE-correctly rounded everywhere,
    * pow(x, 0.5) is not guaranteed to be), and the normalizer Z = Σ n^α is
    * summed as DECIMAL(38,18) — decimal addition is exact, hence
    * associative, hence partition/run/engine-invariant, unlike a float
    * sum whose value depends on combine order — then cast back to double
    * once. The per-term double→decimal conversion routes through the
    * double's STRING form: engines disagree on a direct double→decimal
    * cast (shortest-representation digits vs the exact binary expansion
    * rounded at scale 18), but every engine's double→string is the unique
    * shortest round-trip form, so string→decimal lands on identical
    * decimals everywhere. An external oracle replicates the whole path
    * bit-for-bit.
    *
    * An empty input (or one whose domains are all null) yields an EMPTY
    * result, not a raise — validating non-emptiness would cost an eager
    * action on the no-collect path (the same opt-in-scan trade as
    * encode_categorical's checkValues, SURVEY §7.7).
    */
  def mixDomainsTemperature(df: DataFrame, keyCol: String, domainCol: String,
      alpha: Double, targetRows: Long, copyCol: String = "copy",
      seed: Long = 42L): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0,
      s"mix_domains: temperature alpha must be in [0, 1], got $alpha")
    require(targetRows > 0, "mix_domains: targetRows must be positive")
    // null domains carry no weight (the expansion equi-join never matches
    // them) — exclude them from the normalizer too
    val nD = col("n").cast("double")
    val powed = df.filter(col(s"`$domainCol`").isNotNull)
      .groupBy(col(s"`$domainCol`").cast("string").as("domain"))
      .agg(count(lit(1)).as("n"))
      .withColumn("__p", if (alpha == 0.5) sqrt(nD) else pow(nD, alpha))
    val z = powed.agg(
      sum(col("__p").cast("string").cast("decimal(38,18)")).as("__z"))
    // the 1-row Z frame rides a one-row broadcast nested loop — the scalar
    // join shape (same documented PlanAudit category as collocations'
    // single-row totals; a constant equi-key doesn't help, Catalyst
    // constant-folds it back to a cross). O(n)·1, not quadratic. The
    // multiplier derives straight off powed's (n, p) so the corpus is
    // aggregated ONCE — w = p/Z and mult = w·T/n are pure per-row double
    // arithmetic in the same order the oracle spells out.
    val multTab = powed.crossJoin(broadcast(z))
      .select(col("domain").as("__dom"),
        (col("__p") / col("__z").cast("double") * lit(targetRows.toDouble) /
          col("n").cast("double")).as("__mult"))
    expandByMult(df, keyCol, domainCol, multTab, copyCol, seed)
  }

  /** Hashed n-gram feature buckets of a document — the DSIR feature map
    * (Xie et al., Data Selection for Language Models via Importance
    * Resampling, arXiv:2302.03169 §3: hashed unigrams + bigrams of the
    * whitespace-lowered tokens into `buckets` bins). md5 (not xxhash64)
    * keeps the bucketing reproducible by an external oracle, the same
    * spine as [[hashUniform]]. Bigrams come from the constant-reference
    * zip_with-over-shifted-slices shape (no O(len²) re-splits).
    */
  private[graft] def featureBuckets(text: Column, buckets: Int): Column = {
    val toks = Dedup.tokens(text)
    val m = greatest(size(toks) - 1, lit(0))
    val bigrams = zip_with(slice(toks, lit(1), m), slice(toks, lit(2), m),
      (a, b) => concat(a, lit(" "), b))
    transform(concat(toks, bigrams), f =>
      pmod(conv(substring(md5(f), 1, 8), 16, 10).cast("long"), lit(buckets.toLong)))
  }

  /** DSIR importance weights (arXiv:2302.03169): per raw document,
    * log w = Σ over its hashed-n-gram features of
    * [log p̂_target(bucket) − log p̂_raw(bucket)], both bucket unigram
    * models Laplace-smoothed with `smoothing`. High weight = target-like.
    *
    * Scale shape: two map-side-combinable bucket-count aggregations (≤
    * `buckets` rows each — a model-parameter budget, not a data budget),
    * two bounded scalar totals, one broadcast join of the ≤`buckets`-row
    * ratio table against the raw feature stream, one groupBy(doc). Nothing
    * quadratic; documents with no features (empty text) drop, like a
    * zero-feature doc in the reference implementation.
    */
  /** The trained DSIR model: the ≤`buckets`-row bucket log-ratio table
    * (b, lr) — train once batch-side, apply anywhere (batch weights,
    * streaming scorer). Buckets unseen in the raw corpus can never join a
    * raw feature, so the raw-side counts anchor the table.
    */
  def dsirModel(raw: DataFrame, target: DataFrame, textCol: String,
      buckets: Int = 4096, smoothing: Double = 1.0): DataFrame =
    dsirModelFromRawFeatures(
      raw.select(explode(featureBuckets(col(s"`$textCol`"), buckets)).as("b")),
      target, textCol, buckets, smoothing)

  /** [[dsirModel]] over an already-featurized raw side (one column `b` of
    * exploded bucket ids) — the seam [[dsirWeights]] uses to featurize the
    * raw corpus ONCE and share it between model training and scoring.
    *
    * The two bucket-count tables are ≤`buckets` rows (model parameters, not
    * data), so they are eagerly localCheckpoint-pinned: the totals collect
    * and the returned ratio table all read the materialized counts instead
    * of re-running the full tokenize+md5 featurization per action (the
    * unpinned form featurized raw 3× and target 2× per dsir_weights run).
    */
  private[graft] def dsirModelFromRawFeatures(rawF: DataFrame,
      target: DataFrame, textCol: String,
      buckets: Int = 4096, smoothing: Double = 1.0): DataFrame = {
    require(buckets > 0, "dsir: buckets must be positive")
    require(smoothing > 0.0, "dsir: smoothing must be positive")
    val tgtF = target.select(
      explode(featureBuckets(col(s"`$textCol`"), buckets)).as("b"))
    val tCnt = tgtF.groupBy("b").agg(count(lit(1)).as("tc")).localCheckpoint()
    val rCnt = rawF.groupBy("b").agg(count(lit(1)).as("rc")).localCheckpoint()
    val tTot = tCnt.agg(coalesce(sum(col("tc")), lit(0L))).collect()(0).getLong(0).toDouble
    val rTot = rCnt.agg(coalesce(sum(col("rc")), lit(0L))).collect()(0).getLong(0).toDouble
    val s = smoothing
    val bD = buckets.toDouble
    rCnt.join(tCnt, Seq("b"), "left")
      .select(col("b"),
        (log((coalesce(col("tc"), lit(0L)) + s) / (tTot + s * bD)) -
          log((col("rc") + s) / (rTot + s * bD))).as("lr"))
  }

  /** Score a document frame against a trained [[dsirModel]]: per doc,
    * n_features and log_weight = Σ lr over its feature buckets.
    */
  def dsirScore(docs: DataFrame, idCol: String, textCol: String,
      model: DataFrame, buckets: Int): DataFrame =
    docs.select(col(s"`$idCol`").as("id"),
        explode(featureBuckets(col(s"`$textCol`"), buckets)).as("b"))
      .join(broadcast(model), Seq("b"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_features"),
        round(sum(col("lr")), 6).as("log_weight"))
      .withColumnRenamed("id", idCol)

  /** Train + score in one pass over the raw corpus: the per-doc feature
    * arrays are materialized once (localCheckpoint) and feed BOTH the
    * model's raw bucket counts and the scoring join — the composed form
    * otherwise tokenizes and md5-hashes the raw text twice (model train,
    * then score). The checkpoint holds ~2 longs per raw token; at corpus
    * scale trade that disk/memory against the saved full featurize pass,
    * or call dsirModel + dsirScore separately to keep the recompute shape.
    */
  def dsirWeights(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, buckets: Int = 4096,
      smoothing: Double = 1.0): DataFrame = {
    val feats = raw.select(col(s"`$idCol`").as("id"),
        featureBuckets(col(s"`$textCol`"), buckets).as("__fb"))
      .localCheckpoint()
    val model = dsirModelFromRawFeatures(
      feats.select(explode(col("__fb")).as("b")),
      target, textCol, buckets, smoothing)
    feats.select(col("id"), explode(col("__fb")).as("b"))
      .join(broadcast(model), Seq("b"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_features"),
        round(sum(col("lr")), 6).as("log_weight"))
      .withColumnRenamed("id", idCol)
  }

  /** DSIR selection: Gumbel top-k over the [[dsirWeights]] log weights —
    * the distributed, deterministic form of sampling-without-replacement
    * proportionally to w (Vieira 2014 "Gumbel-max trick"; keys ride
    * [[hashUniform]] so the draw is partition/run/engine-invariant).
    *
    * Scale shape: below `thresholdCutoff` the top-k is one
    * TakeOrderedAndProject (each task keeps a k-bounded heap, the driver
    * merges p heaps — fine while p·k rows fit the driver). Above it that
    * merge is the bottleneck, so selection flips to threshold form: one
    * `approxQuantile` pass picks thr with rank error ≤ εn biased so that
    * strictly-above-thr takes AT MOST k rows (quantile at 1 − k/n + ε),
    * those pass through with no global sort at all, and only the remaining
    * k − a boundary rows (≤ 2εn + ties ≈ 0.1k) ride a small
    * TakeOrderedAndProject. The scored frame is localCheckpoint-pinned
    * first — three actions (quantile, count, trim) would otherwise re-run
    * the whole model train + score per action. Output SET is EXACTLY the
    * deterministic top-k either way (skey is hash-derived, ties break on
    * id); only the execution strategy changes — and so does row ORDER:
    * below the cutoff rows arrive (skey desc, id) sorted, above it the
    * above-union-trim is unordered. Callers needing order sort the k-row
    * result (cheap at k rows).
    */
  def dsirResample(raw: DataFrame, target: DataFrame, idCol: String,
      textCol: String, k: Int, buckets: Int = 4096, smoothing: Double = 1.0,
      seed: Long = 42L, thresholdCutoff: Int = 100000): DataFrame = {
    require(k > 0, "dsir: k must be positive")
    val w = dsirWeights(raw, target, idCol, textCol, buckets, smoothing)
    val gumbel = -log(-log(hashUniform(col(s"`$idCol`"), seed)))
    val scored = w.withColumn("skey", round(col("log_weight") + gumbel, 6))
    if (k <= thresholdCutoff)
      scored.orderBy(col("skey").desc, col(s"`$idCol`")).limit(k)
    else thresholdTopK(scored, idCol, k)
  }

  /** The large-k threshold selection of [[dsirResample]], seam'd so its
    * defensive a ≥ k branch (unreachable in exact arithmetic by the ε
    * bias, reachable only through a float edge at the q−ε boundary or
    * sketch tie behavior) can be FORCED by a spec via `thrOverride` —
    * SamplingSpec pins that the branch returns the identical top-k set.
    */
  private[graft] def thresholdTopK(scored: DataFrame, idCol: String, k: Int,
      thrOverride: Option[Double] = None): DataFrame = {
    val pinned = scored.localCheckpoint()
    val n = pinned.count()
    if (n <= k) pinned.orderBy(col("skey").desc, col(s"`$idCol`"))
    else {
      // rank error ≤ εn each side; quantile target 1 − k/n + ε biases the
      // realized rank into [n−k, n−k+2εn], so #(skey > thr) ≤ k always
      val eps = math.max(1e-7, math.min(0.05 * k / n, 0.01))
      val q = math.min(1.0, 1.0 - k.toDouble / n + eps)
      val thr = thrOverride.getOrElse(
        pinned.stat.approxQuantile("skey", Array(q), eps).head)
      val above = pinned.filter(col("skey") > thr)
      val a = above.count()
      // the ε bias makes a > k unreachable in exact arithmetic, but a
      // floating-point edge at the q−ε boundary (or sketch tie behavior)
      // must not turn into limit(negative): fall back to a plain top-k
      // over the (≈k-sized) above set — still no full-frame sort
      if (a >= k) above.orderBy(col("skey").desc, col(s"`$idCol`")).limit(k)
      else {
        val trim = pinned.filter(col("skey") <= thr)
          .orderBy(col("skey").desc, col(s"`$idCol`"))
          .limit((k - a).toInt)
        above.unionByName(trim)
      }
    }
  }
}
