package graft

import graft.llm.{Dedup, Multimodal, Sampling, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

class LlmSpec extends SparkSpec {
  import spark.implicits._

  test("exactDedup groups identical texts") {
    val d = Seq((1L, "same text"), (2L, "same text"), (3L, "other")).toDF("id", "t")
    val out = Dedup.exactDedup(d, "id", "t").orderBy("id")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 2L), (3L, 1L)))
  }

  test("fingerprint is token-order and duplicate insensitive") {
    val d = Seq("b a a c", "a b c", "a b d").toDF("t")
      .select(Dedup.fingerprint(col("t")).as("fp")).collect().map(_.getString(0))
    assert(d(0) == d(1) && d(0) != d(2))
  }

  test("minhash signatures identical for identical text, close for near-dups") {
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val d = Seq((1L, base), (2L, base), (3L, base + " extra")).toDF("id", "t")
    val sigs = d.select(col("id"), Dedup.minhashSignature(col("t"), 32)).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) == sigs(2L))
    val agree = sigs(1L).zip(sigs(3L)).count { case (a, b) => a == b }
    assert(agree > 16, s"near-dup signatures should mostly agree, got $agree/32")
  }

  test("lshParams picks S-curve-optimal banding (MMDS 3.4.3)") {
    // higher thresholds demand longer bands (steeper curve further right)
    val (b1, r1) = Dedup.lshParams(0.5, 128)
    val (b2, r2) = Dedup.lshParams(0.9, 128)
    assert(b1 * r1 <= 128 && b2 * r2 <= 128)
    assert(r2 > r1, s"threshold 0.9 should use more rows/band than 0.5: $r1 vs $r2")
    assert(b1 > b2, s"threshold 0.5 should use more bands than 0.9: $b1 vs $b2")
    // the chosen curve crosses ~50% hit probability near the threshold:
    // the S-curve midpoint (1/b)^(1/r) sits within 0.15 of the target
    for (t <- Seq(0.3, 0.5, 0.7, 0.8, 0.9); perm <- Seq(64, 128, 256)) {
      val (b, r) = Dedup.lshParams(t, perm)
      val midpoint = math.pow(1.0 / b, 1.0 / r)
      assert(math.abs(midpoint - t) < 0.15,
        s"threshold $t perm $perm chose (b=$b,r=$r) with midpoint $midpoint")
    }
    // our long-standing gate default (32 bands × 4 rows = 128 perms) has
    // S-curve midpoint (1/32)^(1/4) ≈ 0.42 — the tuner recovers it for
    // thresholds in that zone
    val (b3, r3) = Dedup.lshParams(0.42, 128, fpWeight = 0.5, fnWeight = 0.5)
    assert(r3 >= 3 && r3 <= 5 && b3 * r3 <= 128,
      s"expected ~ (32,4) for threshold 0.42, got ($b3,$r3)")
    intercept[IllegalArgumentException](Dedup.lshParams(1.0, 128))
    intercept[IllegalArgumentException](Dedup.lshParams(0.5, 1))
  }

  test("minhashDupPairs finds planted near-duplicates") {
    val base = (1 to 50).map(i => s"tok$i").mkString(" ")
    val docs = Seq((1L, base), (2L, base + " tail"), (3L, "completely different words here now"))
      .toDF("id", "t")
    val pairs = Dedup.minhashDupPairs(docs, "id", "t", threshold = 0.5)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("minhashDupPairs hot-bucket cap: identical families rescued as a star") {
    val boiler = (1 to 50).map(i => s"boiler$i").mkString(" ")
    val other = (1 to 50).map(i => s"fresh$i").mkString(" ")
    val docs = ((1L to 4L).map(i => (i, boiler)) ++
      Seq((10L, other), (11L, other + " tail"))).toDF("id", "t")
    // the 4 identical docs put 4 rows in EVERY one of their buckets — over a
    // cap of 3 all their buckets are hot at once, the case OR-amplification
    // can't cover. The signature-family rescue emits min-id-vs-rest star
    // pairs instead of dropping them; the (10,11) pair's buckets hold <= 2
    // rows and take the normal path
    val capped = Dedup.minhashDupPairs(docs, "id", "t", threshold = 0.5,
      maxBucketSize = 3)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(capped.toSeq.sorted == Seq((1L, 2L), (1L, 3L), (1L, 4L), (10L, 11L)))
    // the default cap is far above anything here: ALL pairs found
    val full = Dedup.minhashDupPairs(docs, "id", "t", threshold = 0.5)
      .select("id1", "id2").collect()
    assert(full.length == 6 + 1) // C(4,2) boiler pairs + the (10,11) pair
  }

  test("dedupNear keeps one canonical row per cluster plus singletons") {
    import graft.syntax._
    val base = (1 to 50).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, base), (2L, base), (5L, base + " tail"),   // one cluster, min id 1
      (9L, "solo words that match nothing else here")).toDF("id", "t")
    val out = docs.dedupNear("id", "t", threshold = 0.5)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 3L), (9L, 1L)))
  }

  test("int8 quantization round-trips within scale/254 per lane") {
    import graft.llm.Similarity
    val d = Seq((1L, Array(0.5f, -1.0f, 0.25f, 0.0f)), (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val q = Similarity.quantizeInt8(d, "embedding")
    val rows = q.select(col("vec_id"), col("embedding"),
      Similarity.dequantizeInt8(col("embedding_q8"), col("embedding_scale")).as("back"),
      col("embedding_scale")).orderBy("vec_id").collect()
    val (orig, back, scale) = (rows(0).getSeq[Float](1), rows(0).getSeq[Double](2),
      rows(0).getDouble(3))
    assert(scale == 1.0)
    orig.zip(back).foreach { case (o, b) =>
      assert(math.abs(o - b) <= scale / 254.0 + 1e-9, s"$o -> $b")
    }
    // all-zero vector: scale 0, zero codes, zero round-trip
    assert(rows(1).getDouble(3) == 0.0)
    assert(rows(1).getSeq[Double](2).forall(_ == 0.0))
  }

  test("prepareCorpus: clean -> filter -> dedup -> decontaminate -> split") {
    import graft.llm.Pipeline
    // 60+ common english tokens so the Gopher keep-filter passes (tokens
    // long enough that mean word length clears the >= 3 cutoff)
    val good = (1 to 60).map(i => s"wording$i the and of to in is it that for").mkString(" ")
    // stopwords interleaved between unique tokens: no 6-token run is shared
    // with `good`'s skeleton, so this only overlaps the benchmark (itself)
    val other = (1 to 60).map(i => s"uniquetok${i}a the uniquetok${i}b and").mkString(" ")
    val docs = Seq(
      (1L, good),                                   // survives
      (2L, good),                                   // exact near-dup of 1 -> dropped
      (3L, s"<p>$good</p><script>x()</script>"),    // html cleaned, then dup of 1 -> dropped
      (4L, "too short"),                            // fails quality filter
      (5L, other)                                   // survives (distinct tokens)
    ).toDF("id", "text")
    val bench = Seq((100L, other)).toDF("id", "text")
    val out = Pipeline.prepareCorpus(docs, "id", "text", benchmark = Some(bench))
    val ids = out.select("id").collect().map(_.getLong(0)).toSet
    // doc 5 is contaminated against the benchmark; docs 2-3 dedup into 1
    assert(ids == Set(1L))
    assert(out.columns.contains("cluster_size") && out.columns.contains("split"))
    assert(out.filter(col("id") === 1L).collect()(0)
      .getAs[Long]("cluster_size") == 3L)
    // no benchmark: doc 5 survives too
    val noBench = Pipeline.prepareCorpus(docs, "id", "text")
    assert(noBench.select("id").collect().map(_.getLong(0)).toSet == Set(1L, 5L))
    // full option set: line dedup + bloom decontamination + bucketing give
    // the same survivors (bloom is result-invariant; line dedup only strips
    // within-corpus repeats, which the near-dedup already removed here) and
    // add the bucket tercile
    val full = Pipeline.prepareCorpus(docs, "id", "text",
      benchmark = Some(bench), lineDedup = true, bloomDecontaminate = true,
      perplexityBucketing = true)
    assert(full.select("id").collect().map(_.getLong(0)).toSet == Set(1L))
    assert(full.columns.contains("bucket") && full.columns.contains("split"))
    // substring-dedup stage: doc 2's copy of doc 1's text loses its tokens
    // BEFORE the quality filter, so it falls out there instead of at
    // near-dedup — survivors unchanged, stage order as in the paper
    val sub = Pipeline.prepareCorpus(docs, "id", "text",
      benchmark = Some(bench), substringDedup = true,
      substringMinMatchTokens = 8)
    assert(sub.select("id").collect().map(_.getLong(0)).toSet == Set(1L))
  }

  test("corpusDrift: zero divergence on identical corpora, positive on disjoint") {
    import graft.llm.TextAnalysis
    val a = (1 to 20).map(i => (i.toLong, s"alpha beta gamma tok$i")).toDF("id", "text")
    val same = TextAnalysis.corpusDrift(a, a, "text").collect()(0)
    assert(same.getAs[Long]("js_micro") == 0L)
    assert(same.getAs[Long]("vocab_jaccard_micro") == 1000000L)
    assert(same.getAs[Long]("n_docs_a") == 20L &&
      same.getAs[Long]("n_docs_b") == 20L)
    assert(same.getAs[Long]("mean_tokens_a_micro") == 4000000L)
    val b = (1 to 20).map(i => (i.toLong, s"delta epsilon zeta oth$i")).toDF("id", "text")
    val diff = TextAnalysis.corpusDrift(a, b, "text").collect()(0)
    assert(diff.getAs[Long]("js_micro") > 0L)
    assert(diff.getAs[Long]("vocab_jaccard_micro") == 0L)
  }

  test("addShard: verdicts partition the shard; appending accepted rows closes the loop") {
    import graft.llm.Pipeline
    val mkDoc = (seed: Int) => (1 to 50)
      .map(i => s"tok${seed}x$i the and of").mkString(" ")
    val corpus = (1 to 8).map(i => (i.toLong, mkDoc(i))).toDF("id", "text")
    val shard = Seq(
      (101L, mkDoc(1)),                   // exact copy of corpus 1
      (102L, mkDoc(2) + " extraword"),    // near corpus 2
      (103L, mkDoc(50)), (104L, mkDoc(50)),          // within-shard twins
      (105L, mkDoc(60)), (106L, mkDoc(60) + " tail"), // within-shard near pair
      (107L, null.asInstanceOf[String]),             // null text: must NOT
      (108L, null.asInstanceOf[String])              // silently vanish
    ).toDF("id", "text")
    val verdicts = Pipeline.addShard(corpus, shard, "id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(verdicts == Map(
      101L -> "dup_exact_corpus", 102L -> "dup_near_corpus",
      103L -> "accepted", 104L -> "dup_exact_shard",
      105L -> "accepted", 106L -> "dup_near_shard",
      107L -> "accepted", 108L -> "dup_exact_shard"))
    // closing the loop: append the accepted rows, re-offer the same shard
    // (new ids) — nothing may be accepted twice
    val accepted = shard.join(
      Pipeline.addShard(corpus, shard, "id", "text")
        .filter(col("status") === "accepted").select("id"), Seq("id"))
    val corpus2 = corpus.unionAll(accepted)
    val reoffer = shard.select((col("id") + 1000L).as("id"), col("text"))
    val second = Pipeline.addShard(corpus2, reoffer, "id", "text")
      .collect().map(_.getString(1)).toSet
    assert(!second.contains("accepted"))
  }

  test("LLM verbs chain through the syntax surface") {
    import graft.syntax._
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val docs = Seq((1L, base), (2L, base), (3L, "other words entirely here now")).toDF("id", "t")
    assert(docs.dedupExact("id", "t").count() == 2)
    val pairs = docs.minhashDupPairs("id", "t", threshold = 0.9)
    assert(pairs.count() == 1)
    assert(docs.dupClusters("id", pairs).filter(col("cluster") === 1L).count() == 2)
    assert(docs.simhashOf("id", "t").count() == 3)
    // doc 3 has 5 tokens — under the shingleN + window - 1 = 6 minimum, so
    // only the two long docs fingerprint
    assert(docs.winnowFingerprints("id", "t").select("id").distinct().count() == 2)
    assert(docs.textAnalysis("t").columns.contains("quality"))
    // round-10 surface: the new verbs chain too
    assert(docs.dedupLines("id", "t").columns.contains("n_lines_kept"))
    assert(docs.bm25TopK("id", "t", Seq("other")).count() == 1)
    assert(docs.findCanaries("id", "t", Seq("entirely")).count() == 1)
    assert(docs.decontaminateAgainst("id", "t", docs.filter(col("id") === 3L),
      "id", "t", bloom = true).count() <= 3)
  }

  test("winnowing guarantees shared fingerprints for shared runs; containment finds partial overlap") {
    val shared = (1 to 30).map(i => s"common$i").mkString(" ")
    val docs = Seq(
      (1L, shared),                                              // fully contained in 2
      (2L, shared + " " + (1 to 30).map(i => s"tail$i").mkString(" ")),
      (3L, (1 to 40).map(i => s"other$i").mkString(" "))).toDF("id", "t")
    val fps = Dedup.winnowFingerprints(docs, "id", "t")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byDoc = fps.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // doc 1's token run appears verbatim in doc 2: every one of its
    // fingerprints must also be selected for doc 2 (windows fully inside
    // the shared run pick identical minima)
    assert(byDoc(1L).subsetOf(byDoc(2L)))
    assert((byDoc(1L) intersect byDoc(3L)).isEmpty)
    val pairs = Dedup.containmentPairs(docs, "id", "t", threshold = 0.9)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.map(p => (p._1, p._2)).toSeq == Seq((1L, 2L)))
    assert(pairs.head._3 == 1.0) // full containment of the smaller side
    // a doc shorter than shingleN + window - 1 tokens yields no fingerprints
    val short = Seq((9L, "a b c d e")).toDF("id", "t")
    assert(Dedup.winnowFingerprints(short, "id", "t").count() == 0)
  }

  test("simhash: identical texts equal; near-dups within small hamming distance") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val d = Seq((1L, base), (2L, base), (3L, base + " x y z")).toDF("id", "t")
    val sh = Dedup.simhash(d, "id", "t").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(2L))
    val ham = java.lang.Long.bitCount(sh(1L) ^ sh(3L))
    assert(ham < 12, s"near-dup hamming distance should be small, got $ham")
  }

  test("cosine: identical=1, orthogonal=0; topk excludes self and ranks") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)),
      (3L, Array(1.0f, 0.1f))).toDF("vec_id", "embedding")
    val sims = vecs.as("a").crossJoin(vecs.as("b"))
      .select(col("a.vec_id"), col("b.vec_id"),
        Similarity.cosine(col("a.embedding"), col("b.embedding")).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(math.abs(sims((1L, 1L)) - 1.0) < 1e-12)
    assert(math.abs(sims((1L, 2L))) < 1e-12)
    val topk = Similarity.cosineTopK(vecs.filter(col("vec_id") === 1), vecs,
      "vec_id", "embedding", k = 1).collect()
    assert(topk.length == 1 && topk(0).getLong(1) == 3L)
  }

  test("langId identifies stopword-bearing strings, und for none") {
    val d = Seq("the cat and the dog is here", "el perro y la casa es grande",
      "xyzzy plugh").toDF("t")
    val out = d.select(TextAnalysis.langId(col("t"))).collect().map(_.getString(0)).toSeq
    assert(out == Seq("en", "es", "und"))
  }

  test("token counts and quality bounds") {
    val d = Seq("Hello world, 42 times!").toDF("t")
    val r = d.select(TextAnalysis.tokenCount(col("t")),
      TextAnalysis.bpeishTokenCount(col("t")),
      TextAnalysis.qualityScore(col("t"))).collect()(0)
    assert(r.getInt(0) == 4)
    assert(r.getInt(1) == 7) // Hello, world, ',', 4, 2, times, '!'
    assert(r.getDouble(2) >= 0.0 && r.getDouble(2) <= 1.0)
  }

  test("dupClusters: chains collapse to the minimum reachable id") {
    // id 6 is touched by NO edge: it must come back as its own cluster on
    // BOTH paths (the distributed loop iterates only edge endpoints and
    // restores non-members via the final left join)
    val ids = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("id")
    // chain 1-2-3 (diameter 2), pair 4-5
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 5L)).toDF("id1", "id2")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 4L, 6L -> 6L)
    // driver union-find path (edges under the threshold)
    val out = Dedup.dupClusters(ids, "id", pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == expected)
    // distributed min-label loop path, forced via threshold 0 — both paths
    // must agree exactly
    val dist = Dedup.dupClusters(ids, "id", pairs, smallEdgeThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist == expected)
  }

  test("groupbyTopkSalted equals single-phase groupbyTopk") {
    val rng = new scala.util.Random(3)
    val d = (1 to 200).map(i => (i, s"g${i % 3}", rng.nextDouble())).toDF("id", "g", "v")
    val single = graft.operators.GroupedOps.groupbyTopk(d, Seq("g"), "v", 5,
      ascending = false, tiebreak = Seq("id"))
    val salted = graft.operators.GroupedOps.groupbyTopkSalted(d, Seq("g"), "v", 5,
      ascending = false, tiebreak = Seq("id"), salts = 7)
    assert(sorted(single) == sorted(salted))
  }

  test("shingles of a short text are empty, not a partial n-gram") {
    val d = Seq((1L, "two words"), (2L, "a full three token doc")).toDF("id", "text")
    val sh = d.select(col("id"), Dedup.shingles(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    assert(sh(1L).isEmpty)
    assert(sh(2L).nonEmpty && sh(2L).forall(_.split(" ").length == 3))
  }

  test("recallAtK: exact fraction of recovered neighbors per query") {
    val exact = Seq((1L, 10L), (1L, 11L), (1L, 12L), (1L, 13L), (2L, 20L), (2L, 21L))
      .toDF("qid", "nid")
    val approx = Seq((1L, 10L), (1L, 11L), (1L, 99L), (2L, 20L), (2L, 21L))
      .toDF("qid", "nid")
    val per = Similarity.recallAtK(approx, exact)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(per(1L) == 0.5 && per(2L) == 1.0)
    val gate = Similarity.recallGate(approx, exact, floor = 0.7)
      .collect()(0)
    assert(gate.getLong(0) == 2 && gate.getBoolean(2)) // mean 0.75 >= 0.7
    assert(!Similarity.recallGate(approx, exact, floor = 0.8).collect()(0).getBoolean(2))
  }

  test("centroid_sims kernel matches manual dot/norm math and scales to 1000 cells") {
    val v = Seq((1L, Array(1.0f, 2.0f, 3.0f))).toDF("id", "vec")
    val cents = Array(Array(1.0d, 0.0d, 0.0d), Array(0.5d, 0.5d, 0.5d))
    val sims = v.select(graft.functions.vector.centroid_sims(col("vec"), cents).as("s"))
      .head.getSeq[Double](0)
    assert(math.abs(sims(0) - 1.0) < 1e-6)
    assert(math.abs(sims(1) - (0.5 + 1.0 + 1.5) / math.sqrt(0.75)) < 1e-5)
    // the centroid table rides as ONE reference object: a 1000-cell plan
    // neither blows up codegen nor the driver (the unrolled-literal form
    // this replaced capped out around a few hundred cells)
    val big = Array.tabulate(1000, 3)((c, i) => (c + i + 1).toDouble)
    val wide = v.select(size(graft.functions.vector.centroid_sims(col("vec"), big)).as("n"))
      .head.getInt(0)
    assert(wide == 1000)
  }

  test("LSH and IVF top-k clear their recall floors on clustered vectors") {
    val rng = new scala.util.Random(7)
    val centers = Array.fill(4, 16)(rng.nextGaussian().toFloat * 5f)
    val vecs = (0 until 200).map { i =>
      val c = centers(i % 4)
      (i.toLong, c.map(x => x + rng.nextGaussian().toFloat * 0.3f))
    }.toDF("vec_id", "embedding")
    val q = vecs.filter(col("vec_id") < 10)
    val exact = Similarity.cosineTopK(q, vecs, "vec_id", "embedding", 5)
    val lsh = Similarity.lshCosineTopK(q, vecs, "vec_id", "embedding", 5)
    val ivf = Similarity.ivfCosineTopK(q, vecs, "vec_id", "embedding", 5,
      nCells = 8, nProbe = 2, kmeansIters = 3)
    val rl = Similarity.recallAtK(lsh, exact).agg(avg("recall")).head.getDouble(0)
    val ri = Similarity.recallAtK(ivf, exact).agg(avg("recall")).head.getDouble(0)
    assert(rl >= 0.9, s"LSH recall@5 on clustered data should be high, got $rl")
    assert(ri >= 0.9, s"IVF recall@5 on clustered data should be high, got $ri")
  }

  test("multimodal asset plumbing: payload, metadata, deterministic stub features") {
    val d = Seq((1L, "hello")).toDF("doc_id", "text")
    val a = Multimodal.featurize(Multimodal.asAsset(d, "text", "text/plain"))
    val row = a.select(col("meta.mime"), col("meta.n_bytes"), col("features")).collect()(0)
    assert(row.getString(0) == "text/plain" && row.getInt(1) == 5)
    assert(row.getSeq[Double](2).length == 4)
    val again = Multimodal.featurize(Multimodal.asAsset(d, "text", "text/plain"))
      .select("features").collect()(0).getSeq[Double](0)
    assert(row.getSeq[Double](2) == again)
  }

  test("resizeStub downsamples to ~targetBytes with a deterministic byte stride") {
    val d = Seq((1L, "abcdefghij" * 10)).toDF("doc_id", "text") // 100 bytes
    val a = Multimodal.asAsset(d, "text", "text/plain")
    val out = a.select(
      octet_length(Multimodal.resizeStub(col("payload"), 25)).as("n"),
      Multimodal.resizeStub(col("payload"), 25).cast("string").as("s"))
      .collect()(0)
    assert(out.getInt(0) == 25) // stride 4 over 100 bytes
    val expected = (0 until 100 by 4).map(("abcdefghij" * 10).charAt).mkString
    assert(out.getString(1) == expected)
    // payloads shorter than the target pass through unchanged
    val tiny = Multimodal.asAsset(Seq((2L, "xy")).toDF("doc_id", "text"), "text", "text/plain")
      .select(Multimodal.resizeStub(col("payload"), 25).cast("string").as("s"))
      .collect()(0).getString(0)
    assert(tiny == "xy")
  }

  test("frameSample strides through the payload: frames differ and start at each offset") {
    val d = Seq((1L, "abcdefghijklmnopqrstuvwxyz")).toDF("doc_id", "text")
    val frames = Multimodal.asAsset(d, "text", "video/fake")
      .select(Multimodal.frameSample(col("payload"), 4).as("frames"))
      .collect()(0).getSeq[Array[Byte]](0)
      .map(b => new String(b, java.nio.charset.StandardCharsets.UTF_8))
    // offsets 1, 5, 9, ... (1-based), 8 bytes each
    assert(frames.head == "abcdefgh" && frames(1) == "efghijkl")
    assert(frames.distinct.length == frames.length,
      "every frame must sample a different offset")
  }

  test("semDedupWithCentroids keeps the lowest id of each within-cell dup family") {
    // two well-separated directions; near-dups planted along each
    val docs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.999f, 0.01f)), // dups of 0 (cell A)
      (2L, Array(0.0f, 1.0f)), (3L, Array(0.01f, 0.999f)), // dups of 2 (cell B)
      (4L, Array(0.7f, 0.7f))                              // lone diagonal
    ).toDF("id", "vec")
    val cents = Array(Array(1.0d, 0.0d), Array(0.0d, 1.0d))
    val kept = Similarity.semDedupWithCentroids(docs, "id", "vec", cents, 0.99)
      .select("id").collect().map(_.getLong(0)).sorted
    // 1 and 3 drop (smaller-id near neighbor in-cell); 4 survives in
    // whichever cell it lands because nothing is near it
    assert(kept.toSeq == Seq(0L, 2L, 4L))
    // cell ids are 1-based first-match: id 0 -> cell 1, id 2 -> cell 2
    val cells = Similarity.semDedupWithCentroids(docs, "id", "vec", cents, 0.99)
      .select("id", "cell").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(cells(0L) == 1 && cells(2L) == 2)
  }

  test("semDedup trained path satisfies its invariant gate") {
    val docs = (0 until 40).map { i =>
      val base = i % 4
      val v = Array.tabulate(8)(j => if (j == base * 2) 1.0f else 0.001f * i)
      (i.toLong, v)
    }.toDF("id", "vec")
    val kept = Similarity.semDedup(docs, "id", "vec", threshold = 0.98,
      nCells = 4, kmeansIters = 2)
    val gate = Similarity.semDedupGate(docs, kept, "id", "vec", 0.98).collect()(0)
    assert(gate.getLong(0) == 40L)
    assert(gate.getBoolean(1), "kept set must contain no within-cell dup pair")
    assert(gate.getBoolean(2))
  }

  test("mixDomains replicates by w*T/n and drops unlisted domains") {
    import graft.llm.Sampling
    val rows = (0 until 30).map(i => (i.toLong,
      if (i < 20) "big" else if (i < 28) "small" else "out"))
    val df = rows.toDF("k", "dom")
    // big: m = 0.5*40/20 = 1.0 -> exactly 1 copy each; small: m = 0.5*40/8
    //  = 2.5 -> 2 or 3 copies each; "out" unlisted -> dropped
    val out = Sampling.mixDomains(df, "k", "dom",
      Seq("big" -> 0.5, "small" -> 0.5), targetRows = 40L)
    val byDom = out.groupBy("dom").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byDom("big") == 20L, "m=1.0 must keep every row exactly once")
    assert(byDom("small") >= 16L && byDom("small") <= 24L,
      s"m=2.5 gives 2-3 copies per row, got ${byDom("small")}")
    assert(!byDom.contains("out"))
    // copy index is dense from 0 per row
    val copies = out.filter(col("dom") === "small" && col("k") === 20L)
      .select("copy").collect().map(_.getInt(0)).sorted
    assert(copies.headOption.contains(0) && copies.toSeq == copies.indices.toSeq)
    // determinism: same input, same output
    assert(out.count() == Sampling.mixDomains(df, "k", "dom",
      Seq("big" -> 0.5, "small" -> 0.5), targetRows = 40L).count())
  }

  test("QualityClassifier learns a separable label and scores monotonically") {
    import graft.llm.QualityClassifier
    // label = long doc; lengths 5..20 (y=0) vs 80..110 (y=1)
    val docs = ((1 to 40).map { i =>
      (i.toLong, (1 to (5 + i % 16)).map(j => s"w$j").mkString(" "), 0)
    } ++ (41 to 80).map { i =>
      (i.toLong, (1 to (80 + i % 31)).map(j => s"w$j").mkString(" "), 1)
    }).toDF("id", "t", "y")
    val w = QualityClassifier.train(docs, "id", "t", "y", sampleTarget = 1000)
    assert(w.forall(x => !x.isNaN && !x.isInfinite))
    val acc = docs.select(
      avg(((QualityClassifier.score(col("t"), w) > 0.5).cast("double")
        === col("y").cast("double")).cast("double"))).head.getDouble(0)
    assert(acc >= 0.95, s"separable labels must be learned, got $acc")
    // pinned weights: the only token-count-sensitive feature dominates
    val wPinned = Array(0.0, 1.0, 0.0, 0.0, 0.0, 0.0)
    val s = Seq((1L, "a b"), (2L, "a b c d e f g h")).toDF("id", "t")
      .select(QualityClassifier.score(col("t"), wPinned)).collect().map(_.getDouble(0))
    assert(s(1) > s(0))
    // the distributed-gradient form (unbounded-training-set path) learns
    // the same label; per-step arithmetic is identical, only the sum's
    // float association differs, so accuracy must match the driver loop
    val wd = QualityClassifier.train(docs, "id", "t", "y", sampleTarget = 1000,
      distributedGradient = true)
    val accD = docs.select(
      avg(((QualityClassifier.score(col("t"), wd) > 0.5).cast("double")
        === col("y").cast("double")).cast("double"))).head.getDouble(0)
    assert(accD >= 0.95, s"distributed-gradient path regressed: $accD")
  }

  test("real PNG codec: deflate + all five filter types roundtrip; ImageIO cross-validates") {
    def ch(seed: Long, x: Int, y: Int, c: Int): Long =
      ((seed * 31 + x * 7 + y * 13 + c * 85) % 256 + 256) % 256
    // h = 7 > 5 rows forces every filter type (None/Sub/Up/Average/Paeth)
    val df = Seq(9L).toDF("seed")
    val f = df.select(Multimodal.png_features(
      Multimodal.synth_png(col("seed"), 6, 7)).as("f"))
      .collect()(0).getSeq[Double](0)
    assert(f(0) == 6.0 && f(1) == 7.0)
    for (c <- 0 until 3) {
      val exp = (for (x <- 0 until 6; y <- 0 until 7) yield ch(9, x, y, c)).sum.toDouble / 42
      assert(f(2 + c) == exp, s"channel $c mean after unfiltering")
    }
    assert(f(5) == ch(9, 0, 0, 0).toDouble)
    // authenticity: the JDK's own ImageIO PNG reader decodes our payload to
    // the same pixels — the container is REAL PNG, not a private format
    val payload = Multimodal.synthPngKernel(9L, 6, 7)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    assert(img != null && img.getWidth == 6 && img.getHeight == 7)
    for (x <- 0 until 6; y <- 0 until 7) {
      val rgb = img.getRGB(x, y)
      assert(((rgb >> 16) & 0xff) == ch(9, x, y, 0), s"R($x,$y)")
      assert(((rgb >> 8) & 0xff) == ch(9, x, y, 1), s"G($x,$y)")
      assert((rgb & 0xff) == ch(9, x, y, 2), s"B($x,$y)")
    }
    // corrupt/truncated/foreign payloads decode to null, not an exception
    val bad = Seq(
      Array[Byte](1, 2, 3),
      payload.take(40),
      payload.updated(60, (payload(60) ^ 0x55).toByte)).toDF("p")
    val decoded = bad.select(Multimodal.png_features(col("p"))).collect()
    assert(decoded(0).isNullAt(0) && decoded(1).isNullAt(0))
    // (a flipped IDAT byte either fails inflate -> null, or inflates to
    // different pixels; both are acceptable — it must not throw)
    assert(decoded.length == 3)
  }

  test("real BMP/WAV codecs: synth -> parse roundtrip matches analytic values") {
    val df = Seq(7L).toDF("seed")
    val f = df.select(Multimodal.bmp_features(
      Multimodal.synth_bmp(col("seed"), 5, 3)).as("f"))
      .collect()(0).getSeq[Double](0)
    assert(f(0) == 5.0 && f(1) == 3.0)
    def ch(seed: Long, x: Int, y: Int, c: Int): Long =
      ((seed * 31 + x * 7 + y * 13 + c * 85) % 256 + 256) % 256
    for (c <- 0 until 3) {
      val exp = (for (x <- 0 until 5; y <- 0 until 3) yield ch(7, x, y, c)).sum.toDouble / 15
      assert(f(2 + c) == exp, s"channel $c mean")
    }
    assert(f(5) == ch(7, 0, 0, 0).toDouble) // logical (0,0): bottom-up nav proof
    // nearest-neighbor resize to 2x2 re-encodes a valid BMP whose pixels
    // are the sampled source pixels
    val r = df.select(Multimodal.bmp_features(Multimodal.bmp_resize(
      Multimodal.synth_bmp(col("seed"), 4, 4), 2, 2)).as("f"))
      .collect()(0).getSeq[Double](0)
    assert(r(0) == 2.0 && r(1) == 2.0)
    val sampled = for (x <- Seq(0, 2); y <- Seq(0, 2)) yield ch(7, x, y, 0)
    assert(r(2) == sampled.sum.toDouble / 4)
    // WAV: header walk + PCM stats
    val wv = df.select(Multimodal.wav_stats(
      Multimodal.synth_wav(col("seed"), 100, 16000)).as("f"))
      .collect()(0).getSeq[Double](0)
    assert(wv(0) == 16000.0 && wv(1) == 1.0 && wv(2) == 100.0)
    def smp(i: Int): Long = (((7L * 7 + i * 11L) % 4096) + 4096) % 4096 - 2048
    val samples = (0 until 100).map(smp)
    assert(wv(3) == samples.sum.toDouble / 100)
    assert(wv(4) == math.sqrt(samples.map(s => s * s).sum.toDouble / 100))
    // decimation: every 5th sample survives, rate divides, container re-parses
    val rs = df.select(Multimodal.wav_stats(Multimodal.wav_resample(
      Multimodal.synth_wav(col("seed"), 100, 16000), 5)).as("f"))
      .collect()(0).getSeq[Double](0)
    assert(rs(0) == 3200.0 && rs(2) == 20.0)
    val dec = (0 until 100 by 5).map(smp)
    assert(rs(3) == dec.sum.toDouble / 20)
    // garbage payloads decode to null, not an exception
    val bad = Seq(Array[Byte](1, 2, 3)).toDF("p")
    assert(bad.select(Multimodal.bmp_features(col("p"))).collect()(0).isNullAt(0))
    assert(bad.select(Multimodal.wav_stats(col("p"))).collect()(0).isNullAt(0))
    assert(bad.select(Multimodal.sample_frames(col("p"), 2)).collect()(0).isNullAt(0))
    // frame stack: every stride-th frame comes back as a decodable BMP with
    // the per-frame seed fold
    val fr = df.select(posexplode(Multimodal.sample_frames(
        Multimodal.synth_frames(col("seed"), 7, 3, 2), 3)).as(Seq("pos", "frame")))
      .withColumn("f", Multimodal.bmp_features(col("frame")))
      .collect().map(r => r.getInt(0) -> r.getSeq[Double](2))
    assert(fr.map(_._1).toSeq == Seq(0, 1, 2)) // frames 0, 3, 6
    fr.foreach { case (pos, feats) =>
      val fseed = 7L * 1000 + pos * 3
      assert(feats(0) == 3.0 && feats(1) == 2.0)
      assert(feats(5) == (((fseed * 31) % 256 + 256) % 256).toDouble)
    }
  }

  test("BPE: deterministic merge training and canonical greedy encoding") {
    import graft.llm.Bpe
    // the Sennrich et al. (2016) corpus: low x5, lower x2, newest x6, widest x3
    val corpus = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val df = corpus.zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "t")
    val merges = Bpe.train(df, "t", numMerges = 10)
    // (e,s) 9 -> (es,t) 9 -> (est,</w>) 9 -> (l,o) 7 -> (lo,w) 7 (ties
    // break lexicographically per the documented rule)
    assert(merges.take(5) == Seq(("e", "s"), ("es", "t"), ("est", "</w>"),
      ("l", "o"), ("lo", "w")))
    // the canonical generalization: unseen word "lowest" encodes [low, est</w>]
    val enc = Seq((1L, "lowest")).toDF("id", "t")
      .select(Bpe.encode(Dedup.tokens(col("t")), merges).as("b"))
      .collect()(0).getSeq[String](0).toSeq
    assert(enc == Seq("low", "est</w>"))
    // lossless: stripping the markers reconstructs the words
    val joined = enc.map(_.replace("</w>", "")).mkString
    assert(joined == "lowest")
    // determinism under repartitioning
    assert(Bpe.train(df.repartition(7), "t", numMerges = 10) == merges)
  }

  test("findCanaries reports each (doc, canary) literal hit") {
    val docs = Seq(
      (1L, "clean text with CANARY-123 inside"),
      (2L, "has CANARY-123 and also CANARY-456 here"),
      (3L, "nothing to see")).toDF("id", "t")
    val hits = TextAnalysis.findCanaries(docs, "id", "t",
      Seq("CANARY-123", "CANARY-456"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(hits == Set((1L, "CANARY-123"), (2L, "CANARY-123"), (2L, "CANARY-456")))
    // case-sensitive contract
    assert(TextAnalysis.findCanaries(docs, "id", "t", Seq("canary-123")).count() == 0)
  }

  test("crossCorpusDupPairs finds probe-vs-ref near-dups; sig rescue survives hot buckets") {
    val base = (1 to 50).map(i => s"tok$i").mkString(" ")
    val ref = Seq((10L, base), (11L, "completely different material here today"))
      .toDF("rid", "rt")
    val probe = Seq((1L, base + " tail"), (2L, "nothing shared with anything"))
      .toDF("pid", "pt")
    val pairs = Dedup.crossCorpusDupPairs(probe, "pid", "pt", ref, "rid", "rt",
      threshold = 0.5)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 10L)))
    // maxBucketSize = 0 kills every band bucket; identical signatures must
    // still pair through the sigkey equi-join
    val probe2 = Seq((1L, base)).toDF("pid", "pt")
    val rescued = Dedup.crossCorpusDupPairs(probe2, "pid", "pt", ref, "rid", "rt",
      threshold = 0.9, maxBucketSize = 0)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(rescued.toSeq == Seq((1L, 10L)))
  }

  test("tokenQuantilesGate: exact percentiles ordered, sketch within tolerance") {
    val docs = (1 to 100).map(i => (i.toLong, (1 to i).map(j => s"w$j").mkString(" ")))
      .toDF("id", "t")
    val r = TextAnalysis.tokenQuantilesGate(docs, "t").collect()(0)
    val Seq(p25, p50, p75, p90) = (0 to 3).map(r.getDouble)
    assert(p25 < p50 && p50 < p75 && p75 < p90)
    // doc lengths are 1..100 -> interpolated median = 50.5
    assert(p50 == 50.5)
    assert(r.getBoolean(4))
  }

  test("bigramLogProb scores fluent-under-the-corpus sequences higher") {
    // "a b" appears 3x as a bigram; "a z" once — doc 4's repeated common
    // bigram must outscore doc 5's one-off pairing
    val docs = Seq(
      (1L, "a b c"), (2L, "a b d"), (3L, "a b e"),
      (4L, "a b a b"), (5L, "a z q w")).toDF("id", "t")
    val out = TextAnalysis.bigramLogProb(docs, "id", "t")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out(4L)._1 == 3L && out(5L)._1 == 3L)
    assert(out(4L)._2 > out(5L)._2)
    // single-token doc has no bigrams and drops
    val one = TextAnalysis.bigramLogProb(Seq((9L, "solo")).toDF("id", "t"), "id", "t")
    assert(one.count() == 0)
  }

  test("perplexityBuckets terciles the corpus by unigram LM score") {
    // doc 3 is all common tokens (highest avg logprob -> head bucket 3),
    // doc 1 is all rare tokens (tail bucket 1)
    val docs = Seq(
      (1L, "rare1 rare2 rare3"),
      (2L, "common rare4 common x1"),
      (3L, "common common common common")).toDF("id", "t")
    val out = TextAnalysis.perplexityBuckets(docs, "id", "t")
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(out(1L) == 1 && out(3L) == 3)
    assert(out(2L) == 2)
  }

  test("weightedHashSample: deterministic, weight-dominant, skips w<=0") {
    val rows = (1L to 10L).map(i => (i, 0.001)) :+ (99L, 1000.0) :+ (100L, 0.0) :+ (101L, -1.0)
    val df = rows.toDF("id", "w")
    val out = Sampling.weightedHashSample(df, "id", "w", k = 5)
      .select("id").collect().map(_.getLong(0)).toSeq
    // w=1000 vs w=0.001: worst-case exponential key of the heavy row
    // (-ln(1-2^-32)/1000) is below the best possible light-row key
    // (-ln(1-2^-32)/0.001 bounded by u granularity), so the heavy row
    // ALWAYS ranks first; zero/negative weights never appear
    assert(out.head == 99L)
    assert(!out.contains(100L) && !out.contains(101L))
    assert(out.size == 5)
    // partition-invariance: same result from a different layout
    val out2 = Sampling.weightedHashSample(df.repartition(7), "id", "w", k = 5)
      .select("id").collect().map(_.getLong(0)).toSeq
    assert(out2 == out)
  }

  test("bm25TopK ranks by term relevance with length normalization") {
    val docs = Seq(
      (1L, "spark spark spark engine"),          // high tf, short
      (2L, "spark engine and other words here"), // one hit, longer
      (3L, "nothing relevant at all"),           // no hit -> excluded
      (4L, "spark spark engine")).toDF("id", "t")
    val out = TextAnalysis.bm25TopK(docs, "id", "t", Seq("spark"), k = 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.map(_._1).toSeq == Seq(1L, 4L, 2L),
      s"tf-dominant ranking expected, got ${out.toSeq}")
    assert(out.forall(_._2 > 0))
    // multi-term query: doc hitting both terms beats single-term docs
    val docs2 = Seq(
      (1L, "alpha beta gamma"), (2L, "alpha delta words"), (3L, "beta epsilon words"))
      .toDF("id", "t")
    val both = TextAnalysis.bm25TopK(docs2, "id", "t", Seq("alpha", "beta"), k = 1)
      .collect().map(_.getLong(0)).toSeq
    assert(both == Seq(1L))
  }

  test("PQ encode/ADC: exact on centroid-aligned vectors, matches brute dot top-k") {
    // dim=8, m=2 subspaces of 4; codebook s has 2 centroids
    val cb: Array[Array[Array[Double]]] = Array(
      Array(Array(1.0, 0, 0, 0), Array(0, 1.0, 0, 0)),
      Array(Array(0, 0, 2.0, 0), Array(0, 0, 0, 2.0)))
    def v(a: Int, b: Int): Seq[Float] =
      (cb(0)(a) ++ cb(1)(b)).map(_.toFloat).toSeq
    val rows = Seq((1L, v(0, 0)), (2L, v(0, 1)), (3L, v(1, 0)), (4L, v(1, 1)))
    val df = rows.toDF("id", "vec")
    val codes = Similarity.pqEncode(df, "vec", cb)
      .select("id", "vec_pq").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1).toSeq).toMap
    assert(codes(1L) == Seq(1, 1) && codes(2L) == Seq(1, 2)
      && codes(3L) == Seq(2, 1) && codes(4L) == Seq(2, 2))
    // corpus vectors sit exactly on codebook centroids -> ADC = exact dot,
    // so PQ top-k must equal the brute-force dot ranking, scores included
    val qs = df.filter(col("id") <= 2L)
    val adc = sorted(Similarity.pqAdcTopK(qs, df, "id", "vec", k = 2, cb, refine = 1))
    val brute = sorted(Similarity.dotTopK(qs, df, "id", "vec", k = 2))
    assert(adc == brute)
    // IVF-PQ with one probe cell covering everything agrees too
    val cents = Array(Array(0.5, 0.5, 0.5, 0.5, 0.5, 0.5, 0.5, 0.5))
    val ivf = sorted(Similarity.ivfPqTopK(qs, df, "id", "vec", k = 2,
      cents, cb, nProbe = 1, refine = 1))
    assert(ivf == brute)
  }

  test("OPQ: orthonormal rotation, dot-invariance, and an anisotropic win over PQ") {
    // anisotropic corpus where plain PQ must lose: all variance lives in
    // the first 4 of 16 dims, so PQ's subspace 0 holds everything while
    // subspaces 1-3 quantize noise; OPQ's eigenvalue allocation spreads the
    // 4 strong principal directions one per subspace (Ge et al. CVPR'13 §4)
    val rnd = new scala.util.Random(7)
    val rows = (0L until 256L).map { i =>
      val v = Array.tabulate(16)(j =>
        if (j < 4) (rnd.nextDouble() * 4.0 - 2.0).toFloat
        else (rnd.nextGaussian() * 0.01).toFloat)
      (i, v.toSeq)
    }
    val df = rows.toDF("id", "vec").repartition(4).cache()
    val model = Similarity.opqTrain(df, "id", "vec", m = 4, k = 4,
      kmeansIters = 4, trainTarget = 256)
    // rotation is orthonormal: R Rt = I
    val R = model.rotation
    for (i <- R.indices; j <- R.indices) {
      val d = R(i).zip(R(j)).map { case (a, b) => a * b }.sum
      assert(math.abs(d - (if (i == j) 1.0 else 0.0)) < 1e-9,
        s"RRt($i,$j)=$d")
    }
    // rotation preserves inner products (up to float/double rounding)
    val two = Similarity.opqRotate(df.limit(2), "vec", R)
      .collect().map(_.getSeq[Double](1).toArray)
    val raw = df.limit(2).collect().map(_.getSeq[Float](1).map(_.toDouble).toArray)
    def dotA(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    assert(math.abs(dotA(two(0), two(1)) - dotA(raw(0), raw(1))) < 1e-5)
    // pure compressed-domain ranking (refine=1): OPQ must beat PQ here
    val qs = df.filter(col("id") < 16L)
    val exact = Similarity.dotTopK(qs, df, "id", "vec", k = 5)
    val cbs = Similarity.pqTrain(df, "id", "vec", m = 4, k = 4,
      kmeansIters = 4, trainTarget = 256)
    def recall(approx: org.apache.spark.sql.DataFrame): Double =
      Similarity.recallAtK(approx, exact)
        .agg(org.apache.spark.sql.functions.avg("recall")).head.getDouble(0)
    val rPq = recall(Similarity.pqAdcTopK(qs, df, "id", "vec", 5, cbs, refine = 1))
    val rOpq = recall(Similarity.opqAdcTopK(qs, df, "id", "vec", 5, model, refine = 1))
    assert(rOpq > rPq, s"OPQ $rOpq should beat PQ $rPq on anisotropic data")
    df.unpersist()
  }

  test("binarize packs sign bits into 32-bit words; Hamming top-k is exact") {
    // 64-dim vector with known signs: dims 0 and 33 positive -> word0 bit 0,
    // word1 bit 1
    val v1 = Array.tabulate(64)(j => if (j == 0 || j == 33) 1.0f else -1.0f)
    val v2 = Array.tabulate(64)(j => if (j == 0) 1.0f else -1.0f) // differs in bit 33
    val v3 = Array.fill(64)(-1.0f)
    val df = Seq((1L, v1.toSeq), (2L, v2.toSeq), (3L, v3.toSeq)).toDF("id", "vec")
    val codes = Similarity.binarize(df, "vec", "code")
      .select("id", "code").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(codes(1L) == Seq(1L, 2L))
    assert(codes(2L) == Seq(1L, 0L))
    assert(codes(3L) == Seq(0L, 0L))
    // hamming(v1, v2) = 1 (bit 33), hamming(v1, v3) = 2, hamming(v2, v3) = 1
    val top = Similarity.hammingTopK(df.filter(col("id") === 1L), df,
      "id", "vec", k = 2).orderBy("hamming", "nid").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(top.toSeq == Seq((2L, 1L), (3L, 2L)))
  }

  test("decontaminateBloom is bit-identical to the exact broadcast-index form") {
    val words = (1 to 40).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, words),                       // = benchmark doc -> contaminated
      (2L, words + " trailing extras"),  // heavy overlap -> contaminated
      (3L, (100 to 140).map(i => s"z$i").mkString(" "))) // clean
      .toDF("id", "t")
    val bench = docs.filter(col("id") === 1L)
    val exact = Dedup.decontaminate(docs, "id", "t", bench, "id", "t", minShared = 3)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    val bloom = Dedup.decontaminateBloom(docs, "id", "t", bench, "id", "t", minShared = 3)
      .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(exact == Seq(3L))
    assert(bloom == exact)
    // a deliberately high-fpp filter still cannot change the result:
    // false positives die in the exact verify join
    val sloppy = Dedup.decontaminateBloom(docs, "id", "t", bench, "id", "t",
      minShared = 3, fpp = 0.5).select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(sloppy == exact)
  }

  test("dedupLines drops repeated long lines corpus-wide, keeps first occurrence") {
    val d = Seq(
      (1L, "unique first line\nshared boilerplate line\nok"),
      (2L, "shared boilerplate line\nanother unique line"),
      (3L, "shared boilerplate line"),
      (4L, "")).toDF("id", "text")
    val out = Dedup.dedupLines(d, "id", "text", minLineChars = 10)
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    // doc 1 keeps everything ("ok" is short -> always kept; boilerplate's
    // first occurrence is (1, idx=1))
    assert(out(1L) == (("unique first line\nshared boilerplate line\nok", 3L)))
    // doc 2 loses the boilerplate copy
    assert(out(2L) == (("another unique line", 1L)))
    // doc 3 loses its only line but still appears
    assert(out(3L) == (("", 0L)))
    // doc 4: single empty line is short -> kept verbatim
    assert(out(4L) == (("", 1L)))
    // case/whitespace-insensitive matching
    val c = Seq((1L, "Shared Boilerplate Line  "), (2L, "shared boilerplate line"))
      .toDF("id", "text")
    val cOut = Dedup.dedupLines(c, "id", "text", minLineChars = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(cOut(1L) == 1L && cOut(2L) == 0L)
  }

  test("dedupSubstrings removes non-first occurrences of long shared spans") {
    def words(tag: String, n: Int) = (1 to n).map(i => s"$tag$i").mkString(" ")
    val shared = words("dup", 10) // 10-token shared run
    val d = Seq(
      (1L, s"${words("a", 3)} $shared ${words("b", 3)}"),
      (2L, s"${words("c", 4)} $shared"),   // loses the whole shared run
      (3L, words("solo", 12)),             // untouched
      (4L, shared),                        // exact copy of the run only
      (5L, "")).toDF("id", "text")
    val out = Dedup.dedupSubstrings(d, "id", "text", minMatchTokens = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    // first occurrence (doc 1) keeps everything
    assert(out(1L) == ((s"${words("a", 3)} $shared ${words("b", 3)}", 16L, 0L)))
    // docs 2 and 4 lose all 10 shared tokens (flagged 8-gram starts 0..2
    // cover positions 0..9 of the run)
    assert(out(2L) == ((words("c", 4), 4L, 10L)))
    assert(out(4L) == (("", 0L, 10L)))
    assert(out(3L) == ((words("solo", 12), 12L, 0L)))
    assert(out(5L) == (("", 0L, 0L)))
    // within-document repetition: the second copy of an 8-token run in the
    // SAME doc is removed too (ExactSubstr dedups self-repeats)
    val rep = Seq((1L, s"${words("x", 8)} mid ${words("x", 8)}")).toDF("id", "text")
    val r1 = Dedup.dedupSubstrings(rep, "id", "text", minMatchTokens = 8)
      .collect().head
    assert(r1.getString(1) == s"${words("x", 8)} mid")
    assert(r1.getLong(3) == 8L)
    // spans shorter than L survive even when repeated
    val short = Seq((1L, words("y", 5)), (2L, words("y", 5))).toDF("id", "text")
    assert(Dedup.dedupSubstrings(short, "id", "text", minMatchTokens = 8)
      .filter(col("n_tokens_removed") > 0).count() == 0)
    // null text behaves as empty (no -1 sizes)
    val withNull = Seq((1L, Some(words("n", 9))), (2L, None))
      .toDF("id", "text")
    val nOut = Dedup.dedupSubstrings(withNull, "id", "text", minMatchTokens = 8)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(nOut(2L) == (("", 0L, 0L)))
    assert(nOut(1L)._2 == 9L)
  }

  test("collocations surfaces glued bigrams by PMI and suppresses low support") {
    // "new york" always adjacent (high PMI); "the" is everywhere (low PMI
    // with anything); "rare pair" occurs once -> cut by minCount
    val docs = (1 to 20).map(i =>
      (i.toLong, s"new york the w$i the city the w${i + 100}")) :+
      (21L, "rare pair")
    val out = TextAnalysis.collocations(docs.toDF("id", "t"), "t",
      minCount = 5, k = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.head._1 == "new york" && out.head._2 == 20L)
    assert(!out.exists(_._1 == "rare pair"))
    // PMI of the perfectly-glued pair beats any "the"-anchored bigram
    val theRows = out.filter(_._1.contains("the"))
    assert(theRows.forall(_._3 < out.head._3))
  }

  test("tokenCmsGate: CMS never undercounts and stays within eps*N on probes") {
    val docs = Seq(
      (1L, ("hot " * 50) + "cold rare"),
      (2L, ("hot " * 30) + "cold mid mid")).toDF("id", "t")
    val out = TextAnalysis.tokenCmsGate(docs, "t",
      Seq("hot", "cold", "mid", "absent"), eps = 0.01)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getBoolean(2), r.getBoolean(3)))).toMap
    assert(out("hot") == ((80L, true, true)))
    assert(out("cold") == ((2L, true, true)))
    assert(out("mid") == ((2L, true, true)))
    assert(out("absent")._1 == 0L && out("absent")._2)
  }

  test("corpusReport aggregates volumes, dup rate, and mean quality per group") {
    val d = Seq(
      (1L, "alpha beta gamma", "a"),
      (2L, "alpha beta gamma", "a"),   // exact dup of 1
      (3L, "delta epsilon", "a"),
      (4L, "zeta", "b")).toDF("id", "text", "src")
    val by = TextAnalysis.corpusReport(d, "text", byCol = Some("src"))
      .collect().map(r => r.getString(0) -> r).toMap
    val a = by("a")
    assert(a.getLong(1) == 3L)                    // n_docs
    assert(a.getLong(2) == 8L)                    // n_tokens: 3+3+2
    assert(a.getLong(3) == 16 + 16 + 13)          // n_chars
    assert(a.getLong(5) == 2L)                    // distinct texts
    assert(math.abs(a.getDouble(6) - 1.0 / 3) < 1e-6) // dup_text_frac
    assert(a.getDouble(7) > 0 && a.getDouble(7) <= 1) // mean_quality
    // global form: one row, group = "all"
    val all = TextAnalysis.corpusReport(d, "text").collect()
    assert(all.length == 1 && all.head.getString(0) == "all"
      && all.head.getLong(1) == 4L)
  }

  test("corpusOverlap: identical corpora fully contain; disjoint corpora share nothing") {
    val mk = (tag: String) => (1 to 3).map(i =>
      (i.toLong, (1 to 25).map(j => s"$tag${i}w$j").mkString(" "))).toDF("id", "t")
    val a = mk("x")
    val same = Dedup.corpusOverlap(a, a, "id", "t").collect().head
    assert(same.getLong(0) == same.getLong(1) && same.getLong(0) == same.getLong(2))
    assert(same.getDouble(3) == 1.0 && same.getDouble(4) == 1.0)
    val other = Dedup.corpusOverlap(a, mk("y"), "id", "t").collect().head
    assert(other.getLong(2) == 0L && other.getDouble(3) == 0.0)
  }

  test("knnGraph: brute is the exact definition; lsh/ivf return k rows per id; bad method throws") {
    val vecs = (0 until 12).map { i =>
      (i.toLong, Array.tabulate(8)(j => math.cos(i * 0.7 + j).toFloat))
    }.toDF("id", "v")
    val brute = Similarity.knnGraph(vecs, "id", "v", k = 2, method = "brute")
    val got = brute.groupBy("qid").count().collect()
    assert(got.length == 12 && got.forall(_.getLong(1) == 2L))
    // no self edges
    assert(brute.filter(col("qid") === col("nid")).count() == 0)
    val lsh = Similarity.knnGraph(vecs, "id", "v", k = 2, method = "lsh")
    assert(lsh.groupBy("qid").count().collect().forall(_.getLong(1) <= 2L))
    intercept[IllegalArgumentException] {
      Similarity.knnGraph(vecs, "id", "v", k = 2, method = "hnsw")
    }
  }

  test("sig-only staging matches full-vector for self and cross dup pairs") {
    import spark.implicits._
    val mk = (seed: Int) => Array.tabulate(8)(d => math.sin(seed * 0.7 * (d + 1)).toFloat)
    // 40 base vectors + 10 planted exact copies => real dup structure
    // (seeds start at 1: mk(0) is the all-zero vector, norm 0); id 5 is
    // DUPLICATED — dup ids fan candidate pairs out through the sig-only
    // fetch joins, so the compare must be a multiset, not a set
    val corpus = ((1 to 40).map(i => (i.toLong, mk(i))) ++
      (1 to 10).map(i => (100L + i, mk(i * 3))) :+ (5L, mk(5))).toDF("id", "v")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        .groupBy(identity).map { case (k, vs) => k -> vs.length }
    val full = key(Similarity.lshCosineDupPairs(corpus, "id", "v", 0.99))
    val sig = key(Similarity.lshCosineDupPairs(corpus, "id", "v", 0.99,
      shuffleVectors = false))
    assert(full == sig && full.nonEmpty)
    val probe = corpus.filter($"id" >= 100L)
      .select(($"id" + 1000L).as("id"), $"v")
    val fullX = key(Similarity.crossCorpusCosineDupPairs(probe, corpus, "id", "v", 0.99))
    val sigX = key(Similarity.crossCorpusCosineDupPairs(probe, corpus, "id", "v", 0.99,
      shuffleVectors = false))
    assert(fullX == sigX && fullX.nonEmpty)
  }

  test("crossCorpusCosineDupPairs flags probe vectors already in the reference") {
    import spark.implicits._
    val mk = (seed: Int) => Array.tabulate(8)(d => math.sin(seed * 0.7 * (d + 1)).toFloat)
    val ref = (0 until 30).map(i => (i.toLong, mk(i))).toDF("id", "v")
    // probe: two exact copies of ref vectors + one novel vector
    val probe = Seq((1000L, mk(3)), (1001L, mk(17)), (1002L, mk(999)))
      .toDF("id", "v")
    val hits = Similarity.crossCorpusCosineDupPairs(probe, ref, "id", "v",
      threshold = 0.99).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSet
    assert(hits.contains(1000L -> 3L) && hits.contains(1001L -> 17L))
    assert(!hits.exists(_._1 == 1002L))
    // an empty side is a legal no-op; a DIMENSION mismatch (wrong embedding
    // model on one side) must fail loudly — "no duplicates" there would
    // silently keep every near-dup
    assert(Similarity.crossCorpusCosineDupPairs(probe.limit(0), ref, "id", "v",
      0.99).count() == 0)
    val ref4 = (0 until 5).map(i => (i.toLong, Array.fill(4)(1.0f))).toDF("id", "v")
    val dimEx = intercept[IllegalArgumentException] {
      Similarity.crossCorpusCosineDupPairs(probe, ref4, "id", "v", 0.99)
    }
    assert(dimEx.getMessage.contains("same embedding model"))
    // semantic decontamination drops the near-benchmark probes, keeps the rest
    val kept = Similarity.semDecontaminate(probe, "id", "v",
      ref.filter($"id" === 3L || $"id" === 17L), threshold = 0.99)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1002L))
  }

  test("decodePng rejects hostile chunk layouts with null, never a hang or crash") {
    import java.nio.ByteBuffer
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    def withLen(len: Int): Array[Byte] = {
      // signature + one IHDR chunk whose length field is attacker-chosen,
      // padded past the 45-byte floor
      val b = ByteBuffer.allocate(64)
      b.put(sig).putInt(len).put("IHDR".getBytes("US-ASCII"))
      b.array()
    }
    // len = -12 used to freeze the offset walk (infinite loop); other
    // negatives hit idat.write out-of-bounds
    for (len <- Seq(-12, -1, Int.MinValue, Int.MaxValue - 8, 1 << 30))
      assert(Multimodal.pngFeaturesKernel(withLen(len)) == null)
    // giant IHDR dims: w*3 / h*(1+stride) would overflow Int
    val valid = Multimodal.synthPngKernel(1L, 4, 3)
    def patched(at: Int, v: Int): Array[Byte] = {
      val c = valid.clone()
      ByteBuffer.wrap(c, at, 4).putInt(v); c
    }
    assert(Multimodal.pngFeaturesKernel(patched(16, 0x40000000)) == null) // w
    assert(Multimodal.pngFeaturesKernel(patched(20, 0x40000000)) == null) // h
    // nonzero IHDR compression / filter method bytes are unsupported
    val badComp = valid.clone(); badComp(26) = 1
    assert(Multimodal.pngFeaturesKernel(badComp) == null)
    val badFilt = valid.clone(); badFilt(27) = 1
    assert(Multimodal.pngFeaturesKernel(badFilt) == null)
    // truncated mid-chunk
    assert(Multimodal.pngFeaturesKernel(valid.take(50)) == null)
    // zlib FDICT header (0x78 0x20 passes the %31 check with the
    // preset-dictionary bit set): inflate() returns 0 forever WITHOUT
    // throwing — must return null, not spin the task
    val idatAt = valid.indexOfSlice("IDAT".getBytes("US-ASCII"))
    assert(idatAt > 0)
    val fdict = valid.clone()
    fdict(idatAt + 4) = 0x78.toByte
    fdict(idatAt + 5) = 0x20.toByte
    assert(Multimodal.pngFeaturesKernel(fdict) == null)
    // and the untouched container still decodes
    assert(Multimodal.pngFeaturesKernel(valid) != null)
  }

  test("groupSample survives values whose UTF-8 exceeds the writeUTF 64 KB limit") {
    import spark.implicits._
    // long document-sized strings + many partitions force the partial-agg
    // buffer through serialize/deserialize on the shuffle boundary
    val big = (0 until 8).map(i => (s"g${i % 2}", ("x" * 70000) + i))
      .toDF("g", "v").repartition(4)
    val out = operators.GroupedOps.groupSample(big, Seq("g"), "v", 2).collect()
    assert(out.length == 4)
    assert(out.forall(_.getString(2).length == 70001))
  }

  test("packSequences: zero/negative-token rows occupy no stream positions") {
    import spark.implicits._
    val docs = Seq((1L, 5), (2L, 0), (3L, -3), (4L, 7))
      .toDF("ord", "ntok")
    val out = Sampling.packSequences(docs, "ord", "ntok", seqLen = 4)
      .orderBy("ord", "seq_id").collect()
    // stream = doc1[0,5) ++ doc4[5,12): doc4 starts at offset 5, so its
    // sequences are 1 and 2 — a leaked zero/negative row would shift it
    assert(!out.exists(r => r.getLong(0) == 2L || r.getLong(0) == 3L))
    val d4 = out.filter(_.getLong(0) == 4L)
    assert(d4.map(_.getLong(2)).toSeq == Seq(1L, 2L))
    assert(d4.head.getLong(5) == 1L) // seq_off inside seq 1
  }

  test("heavyHitters: exact at capacity >= vocab, MG bounds at evicting capacity") {
    import spark.implicits._
    // deterministic skewed corpus: token t_i appears (i+1)*7 times, split
    // across docs so partial buffers genuinely merge
    val words = (0 until 12).flatMap(i => Seq.fill((i + 1) * 7)(s"t$i"))
    val docs = words.grouped(9).map(_.mkString(" ")).toSeq.toDF("text")
      .repartition(7) // shuffle the doc order
    val exact = (0 until 12).map(i => s"t$i" -> ((i + 1) * 7).toLong).toMap
    val n = words.size.toLong

    // capacity >= vocab: the sketch IS the exact table, top-k deterministic
    val top = TextAnalysis.heavyHitters(docs, "text", capacity = 64, k = 5)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(top == (11 to 7 by -1).map(i => (s"t$i", exact(s"t$i"))))

    // evicting capacity: every surviving estimate obeys
    // true - N/(c+1) <= est <= true, under several partitionings
    for (parts <- Seq(1, 3, 13)) {
      val cap = 4
      val sk = docs.repartition(parts)
        .agg(graft.functions.aggregates.misra_gries(
          org.apache.spark.sql.functions.split(
            org.apache.spark.sql.functions.col("text"), " "), cap).as("sk"))
        .head().getSeq[org.apache.spark.sql.Row](0)
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(sk.size <= cap)
      val err = n / (cap + 1)
      exact.foreach { case (t, ex) =>
        val est = sk.getOrElse(t, 0L)
        assert(est <= ex, s"$t est=$est > exact=$ex (parts=$parts)")
        assert(est >= ex - err, s"$t est=$est < $ex - $err (parts=$parts)")
      }
    }
  }

  test("rrfFuse: hand-computed fusion, missing-doc contribution, tie determinism") {
    import graft.llm.Similarity
    // ranking A: q1 -> d1(3.0) d2(2.0) d3(1.0); ranking B: q1 -> d2(9) d3(8)
    // (d1 absent from B — contributes only its A term)
    val a = Seq(("q1", "d1", 3.0), ("q1", "d2", 2.0), ("q1", "d3", 1.0)).toDF("q", "doc", "s")
    val b = Seq(("q1", "d2", 9.0), ("q1", "d3", 8.0)).toDF("q", "doc", "s")
    val out = Similarity.rrfFuse(Seq(a, b), "q", "doc", "s", k = 3)
      .collect().map(r => (r.getString(1), r.getDouble(2))).toMap
    val e = 1e-12
    assert(math.abs(out("d1") - 1.0 / 61) < e)              // rank 1 in A only
    assert(math.abs(out("d2") - (1.0 / 62 + 1.0 / 61)) < e) // A rank 2, B rank 1
    assert(math.abs(out("d3") - (1.0 / 63 + 1.0 / 62)) < e)
    // tied scores rank deterministically (doc asc): equal-score docs fuse
    // identically on every run and engine
    val tied = Seq(("q", "z", 1.0), ("q", "a", 1.0)).toDF("q", "doc", "s")
    val t = Similarity.rrfFuse(Seq(tied), "q", "doc", "s", k = 2)
      .orderBy(desc("rrf")).collect().map(_.getString(1)).toSeq
    assert(t == Seq("a", "z")) // 'a' wins the tie -> rank 1 -> higher rrf
    // k truncates per query by (rrf desc, doc asc)
    assert(Similarity.rrfFuse(Seq(a, b), "q", "doc", "s", k = 1)
      .collect().map(_.getString(1)).toSeq == Seq("d2"))
    // 3+ rankings: contributions fold in FIXED ranking order, so the fused
    // double is exact regardless of partition layout
    val c3 = Seq(("q1", "d2", 1.0), ("q1", "d1", 2.0)).toDF("q", "doc", "s")
    val three = Similarity.rrfFuse(Seq(a, b, c3), "q", "doc", "s", k = 3)
      .collect().map(r => (r.getString(1), r.getDouble(2))).toMap
    assert(math.abs(three("d2") - ((1.0 / 62 + 1.0 / 61) + 1.0 / 62)) < e)
    assert(math.abs(three("d1") - (1.0 / 61 + 1.0 / 61)) < e)
    // plumbing: fusing a real BM25 list with a cosine list (bm25TopK emits
    // a single global list — lift it with a constant query key)
    val docs = Seq((1L, "spark table merge"), (2L, "spark hash"),
      (3L, "other words entirely")).toDF("doc_id", "text")
    val lex = graft.llm.TextAnalysis.bm25TopK(docs, "doc_id", "text",
      Seq("spark", "table"), k = 3).select(lit("q0").as("q"),
      col("doc_id").cast("string").as("doc"), col("score").as("s"))
    val vecs = Seq((1L, Array(1f, 0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0f, 1f)), (9L, Array(1f, 0.05f))).toDF("id", "v")
    val dense = Similarity.cosineTopK(vecs.filter(col("id") === 9L),
        vecs.filter(col("id") =!= 9L), "id", "v", k = 3)
      .select(lit("q0").as("q"), col("nid").cast("string").as("doc"),
        col("sim").as("s"))
    val fused = Similarity.rrfFuse(Seq(lex, dense), "q", "doc", "s", k = 2)
    assert(fused.count() == 2)
    assert(fused.collect().map(_.getString(1)).toSet.subsetOf(Set("1", "2", "3")))
  }

  test("leakageSafeSplit: clusters split together; exact dups split together; singletons fall back") {
    import graft.llm.{Dedup, Sampling}
    // exact mode: identical texts land in the same split, always
    val docs = Seq((1L, "aaa bbb ccc"), (2L, "aaa bbb ccc"), (3L, "ddd eee"),
      (4L, "fff ggg hhh"), (5L, "fff ggg hhh")).toDF("doc_id", "text")
    val exact = Sampling.leakageSafeSplit(docs, "doc_id", "text")
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(exact(1L) == exact(2L) && exact(4L) == exact(5L))
    // cluster mode: every member of a supplied near-dup cluster gets the
    // cluster's split; docs absent from the frame are singletons
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id1", "id2")
    // dupClusters emits (id, cluster) — realign the id column to ours
    val clusters = Dedup.dupClusters(docs.select(col("doc_id")), "doc_id", pairs)
      .withColumnRenamed("id", "doc_id")
    val byCluster = Sampling.leakageSafeSplit(docs, "doc_id", "text",
        clusters = Some(clusters))
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byCluster(1L) == byCluster(2L) && byCluster(2L) == byCluster(3L))
    // a doc missing from the cluster frame still splits (on its own id)
    val partial = clusters.filter(col("doc_id") =!= 5L)
    val withGap = Sampling.leakageSafeSplit(docs, "doc_id", "text",
        clusters = Some(partial))
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(Set("train", "val", "test").contains(withGap(5L)))
    // stability: re-running yields the identical assignment
    assert(Sampling.leakageSafeSplit(docs, "doc_id", "text")
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap == exact)
  }

  test("mixDomainsTemperature: alpha=1 tracks natural shares, alpha=0 is uniform") {
    import graft.llm.Sampling
    // 300 'big' vs 30 'small' rows; target 330
    val df = ((0 until 300).map(i => (i.toLong, "big")) ++
      (300 until 330).map(i => (i.toLong, "small"))).toDF("id", "dom")
    def shares(alpha: Double): Map[String, Long] =
      Sampling.mixDomainsTemperature(df, "id", "dom", alpha, targetRows = 330L)
        .groupBy("dom").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
    val natural = shares(1.0)
    // alpha=1: weight ∝ count -> expansion preserves the 10:1 ratio (±hash
    // rounding of the fractional copy)
    assert(math.abs(natural("big") - 300L) <= 5 && math.abs(natural("small") - 30L) <= 5)
    val uniform = shares(0.0)
    // alpha=0: both domains get half the target
    assert(math.abs(uniform("big") - 165L) <= 5 && math.abs(uniform("small") - 165L) <= 5)
    val mid = shares(0.5)
    // monotone in between: small's share strictly grows as alpha falls
    assert(mid("small") > natural("small") && mid("small") < uniform("small"))
  }

  test("dsirResample threshold fallback: the a >= k branch returns the identical top-k set") {
    import graft.llm.Sampling
    // 200 rows with ties (skey = i % 37) — tie-break rides the id
    val scored = (0 until 200).map(i => (i.toLong, (i % 37).toDouble))
      .toDF("id", "skey")
    val want = scored.orderBy(col("skey").desc, col("id")).limit(10)
      .collect().map(_.getLong(0)).toSet
    // thrOverride = -1 puts every row above the threshold: a = 200 >= k —
    // the defensive branch the ε bias makes unreachable in exact arithmetic
    val forced = Sampling.thresholdTopK(scored, "id", 10,
      thrOverride = Some(-1.0)).collect().map(_.getLong(0)).toSet
    assert(forced == want)
    // and the normal a < k union-trim path agrees on the same frame
    val trimmed = Sampling.thresholdTopK(scored, "id", 10,
      thrOverride = Some(35.0)).collect().map(_.getLong(0)).toSet
    assert(trimmed == want)
    // no-override path (real approxQuantile) still the same set
    val real = Sampling.thresholdTopK(scored, "id", 10)
      .collect().map(_.getLong(0)).toSet
    assert(real == want)
  }

  test("c4LineFilter: terminal punctuation, min words, javascript word, policy phrases") {
    import graft.llm.TextAnalysis
    val doc = Seq(
      "this line ends with a period and has many words.",   // kept
      "no terminal punctuation here at all",                 // dropped: no .!?
      "short line.",                                         // dropped: < 5 words
      "Enable JavaScript to view the full content here.",    // dropped: word rule
      "this site uses cookies to improve your experience.",  // dropped: policy phrase
      "please read our privacy policy before you continue.", // dropped: policy phrase
      "he baked cookies for the fair and everyone ate them.",// KEPT: 'cookies' alone is not a C4 phrase
      "function f() { return the line rules keep this }.",   // KEPT: '{' is a PAGE rule
      "the lorem ipsum phrase is a page rule not a line rule.", // KEPT
      "does a question with enough words survive the cut?",  // kept: '?'
      "he said “the closing quote counts as terminal.”" // kept: ”
    ).mkString("\n")
    val out = Seq(doc).toDF("t")
      .select(TextAnalysis.c4LineFilter(col("t")).as("c"))
      .collect()(0).getString(0)
    val lines = out.split("\n").toSeq
    assert(lines.size == 6, lines.mkString("|"))
    assert(lines(0).startsWith("this line") && lines(1).startsWith("he baked") &&
      lines(2).startsWith("function f") && lines(3).startsWith("the lorem") &&
      lines(4).startsWith("does a") && lines(5).startsWith("he said"))
    // all-dropped and empty docs come back as the empty string
    assert(Seq("nope", "").toDF("t")
      .select(TextAnalysis.c4LineFilter(col("t")).as("c"))
      .collect().forall(_.getString(0) == ""))
    // minWords is configurable
    assert(Seq("short line.").toDF("t")
      .select(TextAnalysis.c4LineFilter(col("t"), minWords = 2).as("c"))
      .collect()(0).getString(0) == "short line.")
  }

  test("c4PageFilter: page-level lorem ipsum, curly brace, and min-sentence rules") {
    import graft.llm.TextAnalysis
    val goodPage = Seq(
      "the first retained sentence sits right here.",
      "the second retained sentence follows it closely.",
      "the third retained sentence completes the page.").mkString("\n")
    val cases = Seq(
      (goodPage, true, 3),
      // lorem ipsum anywhere on the page (even a line the LINE filter
      // keeps) drops the page
      (goodPage + "\nwe use Lorem Ipsum filler text here today.", false, 4),
      // a curly brace anywhere drops the page — including on a line the
      // line rules keep
      (goodPage + "\ncode sample { int x = 0; } appears here.", false, 4),
      // fewer than 3 sentences after the line trim drops the page
      ("only two sentences survive this cut today. here is the second and final one.", false, 2),
      // the line trim feeds the sentence count: junk lines don't count
      ("no terminal punctuation on this line\nanother bare line", false, 0))
    val out = cases.map(_._1).toDF("t")
      .select(TextAnalysis.c4PageFilter(col("t")).as("c"))
      .select(col("c.clean"), col("c.n_sentences"), col("c.keep")).collect()
    cases.zip(out).foreach { case ((page, wantKeep, wantN), r) =>
      assert(r.getInt(1) == wantN, s"n_sentences of: $page")
      assert(r.getBoolean(2) == wantKeep, s"keep of: $page")
    }
    // the struct carries the cleaned text (line stage composed in)
    assert(out(0).getString(0) == goodPage)
  }

  test("extractRegisteredDomain: schemes, userinfo, ports, 2-label suffixes, IPs, bare hosts") {
    import graft.llm.TextAnalysis
    val cases = Seq(
      "https://a.b.news.example.CO.UK/path?q=1" -> "example.co.uk",
      // uppercase SCHEME: RFC 3986 schemes are case-insensitive; a
      // case-sensitive strip would return 'http' as the domain
      "HTTP://WWW.Example.COM/x" -> "example.com",
      "http://www.site.com/x" -> "site.com",
      "ftp://user:pw@deep.sub.host.org:8080/f" -> "host.org",
      "bare.ac.uk/page" -> "bare.ac.uk",
      "http://192.168.0.1:443/x" -> "192.168.0.1",
      "localhost:8080/x" -> "localhost",
      "example.com" -> "example.com",
      "https://x.co.jp" -> "x.co.jp")
    val out = cases.map(_._1).toDF("u")
      .select(col("u"), TextAnalysis.extractRegisteredDomain(col("u")).as("d"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (u, want) => assert(out(u) == want, s"$u -> ${out(u)}") }
  }

  test("extractRegisteredDomain: PSL seam — private suffixes, wildcard, exception, trailing dot") {
    import graft.llm.TextAnalysis
    val psl = Seq("github.io", "*.ck", "!www.ck")
    val cases = Seq(
      // trailing-dot FQDN (legal in crawls): normalized before labeling —
      // pre-fix this returned 'com.'
      "example.com." -> "example.com",
      "https://deep.sub.example.co.uk./x" -> "example.co.uk",
      // private-section suffix: without the rule every *.github.io site
      // collapses into one "domain"
      "https://alice.github.io/repo" -> "alice.github.io",
      "https://pages.alice.github.io/x" -> "alice.github.io",
      "github.io" -> "github.io", // host IS the suffix: no registrable part
      // wildcard rule *.ck: any label under ck is a public suffix
      "http://shop.foo.bar.ck/x" -> "foo.bar.ck",
      "foo.bar.ck" -> "foo.bar.ck",
      // exception rule !www.ck cancels the wildcard: www.ck is registrable
      "http://foo.www.ck/x" -> "www.ck",
      "www.ck" -> "www.ck",
      // built-in rules still layered underneath
      "https://a.b.example.co.jp/x" -> "example.co.jp",
      "https://plain.example.org/x" -> "example.org")
    val out = cases.map(_._1).toDF("u")
      .select(col("u"), TextAnalysis.extractRegisteredDomain(col("u"), psl).as("d"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (u, want) => assert(out(u) == want, s"$u -> ${out(u)}") }
    // malformed wildcard rules raise, not silently misparse
    intercept[IllegalArgumentException] {
      TextAnalysis.extractRegisteredDomain(col("u"), Seq("foo.*.bar"))
    }
  }

  test("domainStats: counts, micro shares, top-k rank through the suffix seam") {
    import graft.llm.TextAnalysis
    val urls = Seq.fill(6)("https://a.github.io/x") ++
      Seq.fill(3)("http://b.github.io/y") ++
      Seq("https://c.example.com/z")
    val out = TextAnalysis.domainStats(urls.toDF("url"), "url", k = 2,
      suffixes = Seq("github.io")).collect()
    assert(out.length == 2)
    val top = out.find(_.getLong(3) == 1L).get
    assert(top.getString(0) == "a.github.io" && top.getLong(1) == 6L &&
      top.getLong(2) == 600000L)
    val second = out.find(_.getLong(3) == 2L).get
    assert(second.getString(0) == "b.github.io" && second.getLong(1) == 3L &&
      second.getLong(2) == 300000L)
  }

  test("canonicalizeUrl: fragment, case, ports, userinfo, slashes, trackers, param order") {
    import graft.llm.TextAnalysis
    val cases = Seq(
      // scheme+host lowercased, default https port dropped, utm_* dropped,
      // fragment dropped, params sorted, trailing path slash stripped;
      // path CASE preserved (paths are case-sensitive per RFC 3986)
      "HTTPS://WWW.Shop.COM:443/Item/7/?utm_source=m&b=2&a=1#frag" ->
        "https://www.shop.com/Item/7?a=1&b=2",
      // userinfo stripped, NON-default port kept, fbclid dropped
      "http://user:pw@news.co.uk:8080/story?id=4&fbclid=xyz" ->
        "http://news.co.uk:8080/story?id=4",
      // schemeless input stays schemeless; trailing host dot + path slash
      "site.org./a/b/" -> "site.org/a/b",
      // root path collapses; tracker-only query drops the '?' entirely
      "https://blog.net/?gclid=g1" -> "https://blog.net",
      // http default port 80 dropped; byte-order param sort
      "http://a.com:80/x?z=2&y=1&x=3" -> "http://a.com/x?x=3&y=1&z=2",
      // :80 is only default for http — https keeps it
      "https://a.com:80/x" -> "https://a.com:80/x",
      // '@' after the path start is data, not userinfo
      "http://h.com/p?to=a@b.com" -> "http://h.com/p?to=a@b.com",
      // empty query after '?' drops; tracker names match case-insensitively
      "http://h.com/p?" -> "http://h.com/p",
      "http://h.com/p?UTM_Source=x&FBCLID=1&k=v" -> "http://h.com/p?k=v",
      // a valueless param survives; already-canonical input is a fixpoint
      "http://h.com/p?flag" -> "http://h.com/p?flag",
      "http://news.co.uk:8080/story?id=4" -> "http://news.co.uk:8080/story?id=4",
      // IPv4 host; no parseable host passes through trimmed
      "http://10.0.4.25:80/x" -> "http://10.0.4.25/x",
      "   not a url   " -> "not a url")
    val out = cases.map(_._1).toDF("u")
      .select(col("u"), TextAnalysis.canonicalizeUrl(col("u")).as("c"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (u, want) => assert(out(u) == want, s"$u -> ${out(u)}") }
  }

  test("filterDomains: blocklist anti-join, allowlist semi-join, PSL seam, case") {
    import graft.llm.TextAnalysis
    val df = Seq(
      (1L, "https://spam.example.com/x"),
      (2L, "http://a.GOOD.org/y"),
      (3L, "https://alice.github.io/z"),
      (4L, "bob.github.io/w")).toDF("id", "url")
    // blocklist drops example.com rows only; list case-insensitive and
    // whitespace-trimmed (file-sourced lists carry stray spaces)
    val blocked = TextAnalysis.filterDomains(df, "url", Seq(" Example.COM "))
      .select("id").collect().map(_.getLong(0)).sorted
    assert(blocked.sameElements(Array(2L, 3L, 4L)))
    // allowlist keeps only the listed domain
    val kept = TextAnalysis.filterDomains(df, "url", Seq("good.org"),
      keep = true).select("id").collect().map(_.getLong(0))
    assert(kept.sameElements(Array(2L)))
    // through the PSL seam: github.io as a suffix separates alice/bob —
    // blocking alice.github.io must NOT drop bob.github.io
    val seam = TextAnalysis.filterDomains(df, "url", Seq("alice.github.io"),
      suffixes = Seq("github.io")).select("id").collect()
      .map(_.getLong(0)).sorted
    assert(seam.sameElements(Array(1L, 2L, 4L)))
    // DataFrame form: schema preserved, original columns intact
    val byDf = TextAnalysis.filterDomainsBy(df, "url",
      Seq("example.com").toDF("domain"))
    assert(byDf.columns.sameElements(df.columns) && byDf.count() == 3)
    intercept[IllegalArgumentException] {
      TextAnalysis.filterDomains(df, "url", Nil)
    }
  }
}
