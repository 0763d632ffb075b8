package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, document fingerprinting. All pure
  * codegen'd expressions — narrow transforms that stream and scale.
  */
object TextAnalysis {

  /** Tiny per-language stopword lists for the n-gram/stopword-overlap
    * language heuristic. Deliberately small and fixed so the oracle can
    * replicate scoring exactly.
    */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "it", "that", "for"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "una", "es", "por"),
    "fr" -> Seq("le", "la", "de", "et", "les", "des", "un", "une", "est", "pour"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein", "eine", "zu", "mit", "von"))

  /** Stopword-overlap language ID: argmax of per-language stopword hits over
    * the distinct token set; ties resolve in [[stopwords]] order; no hits →
    * "und" (undetermined).
    */
  def langId(text: Column): Column = {
    val toks = array_distinct(Dedup.tokens(text))
    val scores = stopwords.map { case (lang, words) =>
      lang -> size(array_intersect(toks, array(words.map(lit): _*)))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, score), acc) =>
      when(score === best && score > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(split(text, "\\s+"))

  /** BPE-ish token estimate: letter runs, single digits, and single
    * non-alphanumeric marks — the shape of a GPT-style pre-tokenizer.
    */
  def bpeishTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"))

  /** Quality heuristics: length, token stats, punctuation/digit ratios,
    * and a single blended score in [0,1] (rounded so cross-engine float
    * policy holds).
    */
  def qualityScore(text: Column): Column = {
    val nChars = length(text).cast("double")
    val nTokens = tokenCount(text).cast("double")
    val nPunct = regexp_count(text, lit("[^A-Za-z0-9\\s]")).cast("double")
    val nDigit = regexp_count(text, lit("[0-9]")).cast("double")
    val meanWordLen = nChars / greatest(nTokens, lit(1.0d))
    val punctRatio = nPunct / greatest(nChars, lit(1.0d))
    val digitRatio = nDigit / greatest(nChars, lit(1.0d))
    val lenScore = least(nChars / lit(500.0d), lit(1.0d))
    val wordScore = when(meanWordLen >= 3 && meanWordLen <= 10, 1.0d).otherwise(0.5d)
    round(lenScore * 0.4d + wordScore * 0.3d +
      (lit(1.0d) - least(punctRatio * 5d, lit(1.0d))) * 0.2d +
      (lit(1.0d) - least(digitRatio * 5d, lit(1.0d))) * 0.1d, 6)
  }

  /** Rolling-hash document fingerprint: md5 of the sorted distinct token
    * set (order-insensitive), plus a 48-bit numeric form for joins.
    */
  def docFingerprint(text: Column): Column = Dedup.fingerprint(text)

  def docFingerprint48(text: Column): Column =
    conv(substring(Dedup.fingerprint(text), 1, 12), 16, 10).cast("long")

  /** Token-window document chunking — the sequence-packing prep step of an
    * LLM training pipeline: split each document into chunks of at most
    * `chunkTokens` whitespace tokens, starting every `stride` tokens
    * (stride < chunkTokens ⇒ overlapping chunks). Chunk starts are
    * 0, stride, 2·stride, … while start < n_tokens, so the tail chunk may
    * be short. (Whitespace-split of an empty string is [''] — one empty
    * token, one empty chunk — matching string_split_regex on the oracle
    * side, same contract as [[tokenCount]].) Pure codegen
    * (sequence → transform → explode): a narrow per-row fan-out whose
    * output partitioning follows the input — no shuffle at any corpus size.
    * Output: (id, chunk_id, n_tokens, chunk_text).
    */
  def chunkDocuments(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, stride: Int): DataFrame = {
    require(chunkTokens > 0 && stride > 0, "chunk_documents: sizes must be positive")
    // tokens are materialized as a projection attribute BEFORE the fan-out:
    // a `split(...)` captured inside the transform lambda would re-split the
    // document once per chunk (per-element re-evaluation of captured
    // expressions — the dupLineStats/ngrams trap), quadratic for long docs.
    // The Generate operator evaluates over its child's output attributes,
    // so the split runs once per document here.
    val toksDf = df.select(col(s"`$idCol`").as("id"),
      split(col(s"`$textCol`"), "\\s+").as("__toks"))
    val toks = col("__toks")
    val n = size(toks)
    val starts = when(n > 0, sequence(lit(0), n - 1, lit(stride)))
      .otherwise(array().cast("array<int>"))
    val chunks = transform(starts, (start, i) => struct(
      i.as("chunk_id"),
      size(slice(toks, start + 1, lit(chunkTokens))).as("n_tokens"),
      concat_ws(" ", slice(toks, start + 1, lit(chunkTokens))).as("chunk_text")))
    toksDf.select(col("id"), explode(chunks).as("c"))
      .select(col("id"), col("c.chunk_id"), col("c.n_tokens"), col("c.chunk_text"))
  }

  /** PII patterns for [[scrubPii]] — deliberately simple, fixed regexes so
    * the oracle can replicate redaction exactly. Order matters: longer/more
    * specific patterns first so e.g. an email is redacted before its bare
    * domain could be touched by later rules.
    */
  val piiPatterns: Seq[(String, String)] = Seq(
    "email" -> "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}",
    "ssn" -> "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b",
    "phone" -> "\\b(?:\\+?1[-. ])?\\(?[0-9]{3}\\)?[-. ][0-9]{3}[-. ][0-9]{4}\\b",
    "ipv4" -> "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b")

  /** Redact PII spans with `[<KIND>]` markers — the standard scrub step
    * before training. A chain of codegen `regexp_replace`s: narrow,
    * streaming-safe, no shuffle. Pass a subset of [[piiPatterns]] keys to
    * scrub selectively.
    */
  def scrubPii(text: Column, kinds: Seq[String] = piiPatterns.map(_._1)): Column = {
    val unknown = kinds.filterNot(k => piiPatterns.exists(_._1 == k))
    require(unknown.isEmpty, s"scrub_pii: unknown kinds ${unknown.mkString(",")}")
    piiPatterns.filter(p => kinds.contains(p._1)).foldLeft(text) {
      case (c, (kind, rx)) => regexp_replace(c, rx, s"[${kind.toUpperCase}]")
    }
  }

  /** Repetition signals (the Gopher/RefinedWeb quality-filter family):
    * fraction of duplicate lines and fraction of characters sitting in
    * duplicate lines, over newline-split non-empty lines. Documents that
    * are mostly repeated boilerplate score high and get filtered before
    * training. Pure higher-order-function expressions (no explode, no
    * shuffle): duplicate detection via sorted-line adjacency.
    */
  def dupLineStats(text: Column): Column = {
    // one codegen kernel pass per document (split + trim-filter + distinct-
    // line occurrence counts; see vector.dupLineCountsKernel for the
    // value-identity argument vs the former sorted-adjacency HOF chain,
    // whose array_sort + interpreted zip_with/aggregate lambdas dominated
    // every repetition-stats consumer). The four field reads below share
    // ONE kernel evaluation via codegen subexpression elimination; the
    // fraction arithmetic and rounding stay in Catalyst, unchanged. A null
    // document keeps the exact legacy shape: null counts, 0.0 fractions.
    val k = graft.functions.vector.dup_line_counts(text)
    val n = k.getField("n")
    val dupLines = k.getField("dups")
    val dupChars = k.getField("dupChars")
    val totChars = k.getField("tot")
    struct(
      n.as("n_lines"),
      dupLines.as("n_dup_lines"),
      when(n > 0, round(dupLines.cast("double") / n, 6)).otherwise(0.0d).as("dup_line_frac"),
      when(totChars > 0, round(dupChars.cast("double") / totChars, 6))
        .otherwise(0.0d).as("dup_char_frac"))
  }

  /** Top word-n-gram character fraction (the other Gopher repetition
    * signal): the share of the document's characters covered by its single
    * most frequent word n-gram, where covered characters are
    * `freq × len(gram)` over the token stream's `concat_ws(" ")` length.
    * High values mean templated/repetitive text.
    *
    * Frequency counting is intrinsically an aggregation: the narrow
    * higher-order form (`filter`-count per distinct gram) is
    * O(distinct × grams) PER ROW and measured 150 s over sf0.1 documents.
    * This is the scale shape instead: explode grams → one map-side-
    * combinable count keyed (id, gram) → per-id max — two shuffles keyed on
    * the doc id, linear everywhere. Documents with no n-grams or no
    * characters score 0.0 (left join + coalesce).
    */
  def topNgramCharFrac(df: DataFrame, idCol: String, textCol: String,
      n: Int = 2): DataFrame = {
    val w = Dedup.tokens(col(s"`$textCol`"))
    val grams = Dedup.ngrams(w, n)
    val base = df.select(col(s"`$idCol`").as("id"),
      length(concat_ws(" ", w)).as("__tot"), explode_outer(grams).as("__gram"))
    val best = base.filter(col("__gram").isNotNull)
      .groupBy("id", "__gram").agg(count(lit(1)).as("__freq"))
      .groupBy("id").agg(max(col("__freq") * length(col("__gram"))).as("__best"))
    df.select(col(s"`$idCol`").as("id"), length(concat_ws(" ", w)).as("__tot"))
      .join(best, Seq("id"), "left")
      .select(col("id"),
        when(col("__best").isNotNull && col("__tot") > 0,
          round(col("__best").cast("double") / col("__tot"), 6))
          .otherwise(0.0d).as(s"top${n}gram_frac"))
  }

  /** Gopher-style quality-filter flags (Rae et al. 2021 §A1.1, public
    * criteria): the standard document-level cutoffs a pretraining pipeline
    * applies before near-dedup. Emits the raw signals plus one `keep`
    * boolean. All per-row expressions with constant-reference captures (the
    * HOF contract in PLANS.md): token counts, mean word length, symbol and
    * ellipsis-line ratios, alphabetic-word fraction, stopword hit count.
    */
  def gopherQualityFlags(text: Column): Column = {
    val w = Dedup.tokens(text)
    val nTok = size(w)
    val meanLen = when(nTok > 0,
      aggregate(transform(w, t => length(t)), lit(0), (a, x) => a + x)
        .cast("double") / nTok).otherwise(0.0d)
    val hashCount = size(split(text, "#")) - 1
    val ellipsisCount = size(split(text, "\\.\\.\\.")) - 1
    val symbolRatio = when(nTok > 0,
      (hashCount + ellipsisCount).cast("double") / nTok).otherwise(0.0d)
    val alphaWords = size(filter(w, t => t.rlike("[a-z]")))
    val alphaFrac = when(nTok > 0, alphaWords.cast("double") / nTok).otherwise(0.0d)
    val enStops = array(stopwords.head._2.map(lit): _*)
    val stopHits = size(array_intersect(array_distinct(w), enStops))
    val keep = nTok >= 50 && nTok <= 100000 &&
      meanLen >= 3.0 && meanLen <= 10.0 &&
      symbolRatio <= 0.1 && alphaFrac >= 0.8 && stopHits >= 2
    struct(
      nTok.as("n_tokens"),
      round(meanLen, 6).as("mean_word_len"),
      round(symbolRatio, 6).as("symbol_ratio"),
      round(alphaFrac, 6).as("alpha_word_frac"),
      stopHits.as("stop_hits"),
      keep.as("keep"))
  }

  /** The built-in suffix rules: common TWO-LABEL public suffixes. A
    * fallback, not the Mozilla PSL — production callers layer the real
    * list (or their private-section additions like `github.io`) on top via
    * [[extractRegisteredDomain]]'s `suffixes` seam.
    */
  private[graft] val builtinSuffixes: Seq[String] = Seq("co.uk", "org.uk",
    "ac.uk", "gov.uk", "com.au", "net.au", "org.au", "co.jp", "ne.jp",
    "or.jp", "com.br", "com.cn", "com.mx", "co.in", "co.kr", "com.tw",
    "com.ar", "co.za", "com.sg", "com.hk")

  /** Registered-domain (eTLD+1) extraction from a URL — the grouping key
    * for per-domain caps, per-domain dedup, and domain mixing in web-corpus
    * pipelines (CCNet/RefinedWeb shape: cap documents per registered
    * domain, not per host, or one spam domain's subdomains flood the
    * corpus).
    *
    * `suffixes` is the public-suffix seam: rules in the Mozilla PSL's own
    * syntax, layered OVER the built-in two-label list — exact rules
    * (`github.io` — exactly what a crawl cap needs, or every `*.github.io`
    * site collapses into one "domain"), wildcard rules (`*.ck`: any label
    * under ck is a public suffix), and exception rules (`!www.ck`: cancels
    * the wildcard; the rule itself is the registrable domain). Matching
    * follows the PSL algorithm: exception rules first, then longer rules
    * beat shorter ones, then the implicit `*` default (last label is the
    * suffix, registrable = last two). The rules compile to a literal
    * when-chain of codegen string ops — no lookup join, plan cost
    * O(|distinct rule lengths|), so loading the ~9k-rule PSL stays a
    * scan-side projection.
    *
    * Hosts: IPv4 literals and dotless hosts pass through whole; a
    * trailing-dot FQDN (`example.com.` — legal in crawls) is normalized
    * before labeling. A host that IS a public suffix has no registrable
    * domain and passes through whole (the PSL "no registrable part" case).
    *
    * Per-domain caps compose from existing verbs:
    * `df.withColumn("dom", extractRegisteredDomain(col("url")))` then
    * [[graft.operators.GroupedOps.groupbyTopk]] on ("dom") by quality.
    */
  def extractRegisteredDomain(url: Column, suffixes: Seq[String] = Nil): Column = {
    // lower() BEFORE the scheme strip: schemes are case-insensitive per
    // RFC 3986 and real crawl URLs carry 'HTTP://' — a case-sensitive
    // scheme regex would return the scheme itself as the host. The
    // trailing-dot strip must precede labeling: 'example.com.' would
    // otherwise split to an empty last label and defeat every rule.
    val host = regexp_replace(regexp_extract(lower(url),
      "^(?:[a-z][a-z0-9+.-]*://)?(?:[^/@]*@)?([^/:?#]+)", 1), "\\.+$", "")
    val labels = split(host, "\\.")
    val n = size(labels)
    def lastK(k: Int): Column =
      concat_ws(".", (k to 1 by -1).map(i => element_at(labels, -i)): _*)

    val userRules = suffixes.map(_.trim.toLowerCase).filter(_.nonEmpty)
    // a '*' anywhere except as the single leading label is malformed —
    // '*.x.*' would otherwise pass and then silently never match (isin
    // compares the literal string)
    require(userRules.forall(r =>
        !r.contains("*") || (r.startsWith("*.") && !r.drop(2).contains("*"))),
      "extract_registered_domain: wildcard rules must be '*.<suffix>' " +
        "with no further '*'")
    val exceptions = userRules.filter(_.startsWith("!")).map(_.drop(1))
    val wildcards = userRules.filter(_.startsWith("*.")).map(_.drop(2))
    val exacts = userRules.filterNot(r => r.startsWith("!") || r.startsWith("*."))
    val labelsOf = (r: String) => r.count(_ == '.') + 1

    // PSL precedence: exceptions beat everything; among prevailing rules
    // the longest match wins, so evaluate rule groups longest-first. Each
    // group is one isin over the rules of that label count — a literal IN,
    // codegen, no join. The isNull head keeps a null URL null: without it
    // every condition evaluates null (size(null) is null), the chain falls
    // through to the concat_ws fallback, and a null URL would surface as
    // the spurious domain "" — a real dedup/cap key.
    val base =
      when(host.isNull, lit(null).cast("string"))
        .when(host.rlike("^\\d{1,3}(\\.\\d{1,3}){3}$") || n <= 2, host)
    val withExceptions = exceptions.groupBy(labelsOf).toSeq
      .sortBy(-_._1).foldLeft(base) { case (acc, (k, rules)) =>
        // exception rule matched: the rule ITSELF is the registrable domain
        acc.when(n >= k && lastK(k).isin(rules: _*), lastK(k))
      }
    // exact and wildcard rules merge into one longest-first pass: a
    // wildcard '*.x' is an effective suffix of labelsOf(x)+1 labels
    val ruleLens = (exacts.map(labelsOf) ++ wildcards.map(labelsOf(_) + 1) ++
      Seq(2 /* builtin two-label group */)).distinct.sorted.reverse
    val chained = ruleLens.foldLeft(withExceptions) { case (acc, k) =>
      val exactK = exacts.filter(labelsOf(_) == k) ++
        (if (k == 2) builtinSuffixes else Nil)
      val wildK = wildcards.filter(labelsOf(_) == k - 1)
      val acc1 = if (exactK.isEmpty) acc else
        // suffix of k labels: registrable = last k+1; host == suffix -> whole
        acc.when(n > k && lastK(k).isin(exactK.distinct: _*), lastK(k + 1))
          .when(n === k && lastK(k).isin(exactK.distinct: _*), host)
      if (wildK.isEmpty) acc1 else
        // '*.x': any (k-1)+1-label suffix under x — registrable = last k+1
        acc1.when(n > k && lastK(k - 1).isin(wildK: _*), lastK(k + 1))
          .when(n === k && lastK(k - 1).isin(wildK: _*), host)
    }
    chained.otherwise(lastK(2))
  }

  /** Per-domain corpus monitoring over a URL column — the domain-keyed twin
    * of corpus_report: registered-domain extraction (through the `suffixes`
    * PSL seam of [[extractRegisteredDomain]]), docs per domain, each
    * domain's micro-scaled share of the corpus, and the top-`k` domains by
    * volume. The share-of-top-1 row is rank 1.
    *
    * Scale shape: one map-side-combinable count aggregate (|domains| rows),
    * one exact LONG total joined back on a constant key (1-row broadcast
    * hash join), then orderBy+limit = TakeOrderedAndProject — the global
    * rank window runs AFTER the k-row cut, so no single-partition pass
    * ever sees more than k rows.
    */
  def domainStats(df: DataFrame, urlCol: String, k: Int = 5,
      suffixes: Seq[String] = Nil): DataFrame = {
    require(k > 0, "domain_stats: k must be positive")
    val counts = df
      .select(extractRegisteredDomain(col(s"`$urlCol`"), suffixes).as("domain"))
      .groupBy("domain").agg(count(lit(1)).as("n_docs"))
    val total = counts.agg(sum(col("n_docs")).as("__t"))
    // one-row total crossed in via broadcast (the scalar-join shape,
    // PlanAudit expected category) — O(|domains|)·1
    val top = counts.crossJoin(broadcast(total))
      .withColumn("share_micro",
        round(col("n_docs").cast("double") * 1e6 / col("__t").cast("double"))
          .cast("long"))
      .orderBy(col("n_docs").desc, col("domain"))
      .limit(k)
    // rank assignment over the k-row result only (bounded post-TakeOrdered
    // window, the buildVocab pattern)
    top.withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("n_docs").desc, col("domain"))).cast("long"))
      .select("domain", "n_docs", "share_micro", "rank")
  }

  /** Query parameters stripped by [[canonicalizeUrl]] by default: the
    * common click/campaign trackers (plus any name starting `utm_`, handled
    * separately). A defined, documented list so the oracle can replicate.
    */
  val DefaultDropParams: Seq[String] = Seq("fbclid", "gclid", "msclkid",
    "mc_cid", "mc_eid", "igshid", "yclid", "dclid", "wbraid", "gbraid",
    "twclid", "ttclid")

  /** URL canonicalization for crawl dedup — the key-prep step before
    * URL-exact dedup or frontier dedup in a crawl pipeline, where
    * `HTTPS://Site.COM:443/a/?utm_source=x&b=1#frag` and
    * `https://site.com/a?b=1` are the same fetch. Normalizations, in order:
    * drop the fragment; lowercase the scheme and host (never path/query —
    * those are case-sensitive per RFC 3986); strip userinfo; strip default
    * ports (80 for http, 443 for https) and trailing host dots; strip
    * trailing path slashes (`/a/` ≡ `/a`, root `/` ≡ empty); drop tracking
    * parameters (any name starting `utm_`, plus `dropParams`,
    * case-insensitively); sort surviving parameters bytewise so parameter
    * order never splits a dedup class. Inputs with no parseable host pass
    * through trimmed. Percent-encoding and `www.` stripping are left alone
    * (both change semantics for some hosts; callers wanting them compose).
    *
    * One narrow whole-stage-codegen projection (regexp decompose + one
    * array filter/sort over the parameter list) — no shuffle,
    * streaming-safe, 100 TB cost is the scan. URL-exact dedup composes:
    * `groupBy(canonicalizeUrl(col("url")))` with any keep rule.
    */
  def canonicalizeUrl(url: Column,
      dropParams: Seq[String] = DefaultDropParams): Column = {
    val u = regexp_replace(trim(url), "#.*$", "")
    val scheme = lower(regexp_extract(u, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    val rest = regexp_replace(u, "^[a-zA-Z][a-zA-Z0-9+.-]*://", "")
    // userinfo only counts before the first /?# — '@' later is path/query data
    val rest2 = regexp_replace(rest, "^[^/@?#]*@", "")
    val hostport = regexp_extract(rest2, "^([^/?#]*)", 1)
    val host = regexp_replace(
      lower(regexp_replace(hostport, ":[0-9]*$", "")), "\\.+$", "")
    val port = regexp_extract(hostport, ":([0-9]+)$", 1)
    val portPart = when(port === "" ||
        (scheme === "http" && port === "80") ||
        (scheme === "https" && port === "443"), lit(""))
      .otherwise(concat(lit(":"), port))
    val pathq = rest2.substr(length(hostport) + 1, length(rest2))
    val path = regexp_replace(regexp_extract(pathq, "^([^?]*)", 1), "/+$", "")
    val query = when(pathq.contains("?"),
      regexp_replace(pathq, "^[^?]*\\?", "")).otherwise(lit(""))
    val dropped = dropParams.map(_.toLowerCase)
    val kept = filter(split(query, "&", -1), p => {
      val name = lower(regexp_extract(p, "^([^=]*)", 1))
      p =!= "" && !name.startsWith("utm_") &&
        (if (dropped.isEmpty) lit(true) else !name.isin(dropped: _*))
    })
    val qstr = when(size(kept) > 0,
      concat(lit("?"), array_join(array_sort(kept), "&"))).otherwise(lit(""))
    val schemePart =
      when(scheme === "", lit("")).otherwise(concat(scheme, lit("://")))
    when(host === "", trim(url))
      .otherwise(concat(schemePart, host, portPart, path, qstr))
  }

  /** Domain blocklist/allowlist filter over a URL column — the first stage
    * of a CCNet/RefinedWeb-style crawl pipeline (drop every document from a
    * blocklisted registered domain, e.g. the UT1 category lists at ~10⁶
    * entries). `domains` arrives as a one-column DataFrame so the list is
    * joined, never inlined: extract eTLD+1 (through the same `suffixes` PSL
    * seam as [[extractRegisteredDomain]]), then ONE left_anti (blocklist) or
    * left_semi (`keep = true`, allowlist) equi-join — AQE broadcasts a small
    * list, a UT1-sized one rides a plain shuffled hash join; either way no
    * |domains|-sized literal reaches the plan and nothing collects.
    */
  def filterDomainsBy(df: DataFrame, urlCol: String, domains: DataFrame,
      keep: Boolean = false, suffixes: Seq[String] = Nil,
      domainCol: String = "domain"): DataFrame = {
    val tag = "__graft_dom"
    // extractRegisteredDomain lowercases the host; lowercase + trim the
    // list for the case-insensitive match a blocklist intends (file-sourced
    // lists carry stray whitespace, and extracted domains never do)
    val list = domains
      .select(lower(trim(col(s"`$domainCol`").cast("string"))).as(tag))
      .distinct()
    df.withColumn(tag, extractRegisteredDomain(col(s"`$urlCol`"), suffixes))
      .join(list, Seq(tag), if (keep) "left_semi" else "left_anti")
      .drop(tag)
  }

  /** Seq form of [[filterDomainsBy]] for literal lists. */
  def filterDomains(df: DataFrame, urlCol: String, domains: Seq[String],
      keep: Boolean = false, suffixes: Seq[String] = Nil): DataFrame = {
    require(domains.nonEmpty, "filter_domains: empty domain list")
    val spark = df.sparkSession
    import spark.implicits._
    filterDomainsBy(df, urlCol, domains.toDF("domain"), keep, suffixes)
  }

  /** C4 LINE cleaning (Raffel et al. 2020 §2.2) — exactly the paper's
    * LINE-granular rules, no more: keep only lines that end in terminal
    * punctuation (. ! ? or closing quote), have ≥ `minWords` whitespace
    * words, don't contain the word "javascript" (case-insensitive — the
    * paper's only line-level word rule), and don't carry one of C4's six
    * boilerplate policy phrases ("terms of use", "privacy policy",
    * "cookie policy", "uses cookies", "use of cookies", "use cookies").
    * The PAGE-level rules ("lorem ipsum", curly brace, ≥ 3 sentences)
    * belong to [[c4PageFilter]], which composes this stage. One narrow
    * codegen expression: split → filter → array_join — no shuffle,
    * streaming-safe.
    */
  def c4LineFilter(text: Column, minWords: Int = 5): Column = {
    val kept = filter(split(text, "\n", -1), l => {
      val t = trim(l)
      t.rlike("[.!?\"”']$") &&
        size(split(t, "\\s+")) >= minWords &&
        !lower(t).rlike(C4LineMarkers)
    })
    array_join(kept, "\n")
  }

  /** The C4 line-removal markers (applied to the lowercased line): the word
    * "javascript" plus the six policy phrases — shared with the oracle so
    * the two regexes cannot desynchronize.
    */
  private[graft] val C4LineMarkers: String =
    "\\bjavascript\\b|terms of use|privacy policy|cookie policy|" +
      "uses cookies|use of cookies|use cookies"

  /** The faithful C4 DOCUMENT filter (Raffel et al. 2020 §2.2): the
    * [[c4LineFilter]] line trim, then the PAGE-level rules on what the
    * paper calls a page — drop the page when the raw text contains the
    * phrase "lorem ipsum" (case-insensitive) or a curly brace "{", or when
    * the cleaned text carries fewer than `minSentences` sentences
    * (sentence ≈ a terminal-punctuation run, counted on the retained
    * lines). Emits struct(clean, n_sentences, keep) rather than dropping
    * rows, so callers can audit what a filter removed before committing to
    * it; `df.filter($"c4.keep")` is the drop form. The paper's remaining
    * page rule — the "List of Dirty, Naughty …" word list — is a data
    * input, not an algorithm: apply it as a filter_string over this
    * output with the caller's own list.
    *
    * Still one narrow codegen projection per row — no shuffle,
    * streaming-safe, 100 TB-safe by construction.
    */
  def c4PageFilter(text: Column, minWords: Int = 5,
      minSentences: Int = 3): Column = {
    val clean = c4LineFilter(text, minWords)
    // sentences = terminal-punct runs in the retained lines; split -1
    // keeps trailing empties irrelevant here since the last kept line ends
    // in terminal punctuation by rule
    val nSentences = size(split(clean, "[.!?]+", -1)) - 1
    val keep = nSentences >= minSentences &&
      !lower(text).contains("lorem ipsum") && !text.contains("{")
    struct(clean.as("clean"), nSentences.as("n_sentences"), keep.as("keep"))
  }

  /** Strip HTML: drop script/style blocks wholesale, remove remaining tags,
    * unescape the five predefined XML entities, collapse runs of
    * whitespace. Chained codegen regexp_replaces — narrow, streaming-safe.
    * A real parser it is not (regex HTML handling is inherently
    * approximate); it is the standard best-effort scrub used on web text
    * before quality filtering.
    */
  def stripHtml(text: Column): Column = {
    // two separate block patterns, not one with a backreference — RE2-based
    // engines (the DuckDB oracle among them) have no backreferences
    val noScript = regexp_replace(text, "(?is)<script\\b[^>]*>.*?</script\\s*>", " ")
    val noBlocks = regexp_replace(noScript, "(?is)<style\\b[^>]*>.*?</style\\s*>", " ")
    val noTags = regexp_replace(noBlocks, "(?s)<[^>]+>", " ")
    val unescaped = Seq("&amp;" -> "&", "&lt;" -> "<", "&gt;" -> ">",
      "&quot;" -> "\"", "&apos;" -> "'").foldLeft(noTags) {
      case (c, (from, to)) => regexp_replace(c, from, to)
    }
    trim(regexp_replace(unescaped, "\\s+", " "))
  }

  /** Replace http(s)/www URLs with a marker — the usual pretraining URL
    * normalization (URLs are high-entropy tokens that bloat vocabularies).
    */
  def replaceUrls(text: Column, marker: String = "[URL]"): Column =
    regexp_replace(text, "\\bhttps?://[^\\s]+|\\bwww\\.[^\\s]+",
      java.util.regex.Matcher.quoteReplacement(marker))

  /** Cheap LM-proxy quality signal: each document's mean unigram
    * log10-probability under the CORPUS'S OWN unigram distribution — the
    * classic poor-man's perplexity filter (documents full of rare/garbled
    * tokens score low; templated common-token text scores high). Two
    * aggregations: corpus vocabulary counts (map-side combinable, keyed by
    * token), then a per-document mean over the token stream joined to the
    * vocabulary — the vocab side is |distinct tokens| rows and AQE
    * broadcasts it, so the hot-token join ("the" everywhere) never
    * shuffle-skews. Output: (id, n_tokens, avg_logprob).
    */
  def unigramLogProb(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = df.select(col(s"`$idCol`").as("id"),
      explode(Dedup.tokens(col(s"`$textCol`"))).as("t"))
    // the vocab (model parameters, |distinct tokens| rows) feeds BOTH the
    // scalar total and the scoring join — pin it or each consumer re-runs
    // the corpus tokenize+aggregate (the total's action alone was a full
    // corpus pass; same duplicated-featurize shape the DSIR family had)
    val vocab = tok.groupBy("t").agg(count(lit(1)).as("c"))
      .localCheckpoint(eager = false)
    // corpus token total: one bounded scalar action (sum over the vocab);
    // coalesce to 1 so an empty corpus yields an empty result instead of
    // an NPE on the null sum (the join is empty anyway, n is unused)
    val n = vocab.agg(coalesce(sum(col("c")), lit(1L)))
      .collect()(0).getLong(0).toDouble
    tok.join(vocab, Seq("t"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(log10(col("c") / n)), 6).as("avg_logprob"))
  }

  /** Interpolated bigram LM scoring (Jelinek–Mercer smoothing: per bigram
    * s = log10(λ·P(t|p) + (1−λ)·P(t)) with P(t|p) = c(p,t)/c(p,·) and the
    * unigram backoff P(t) = c(t)/N; avg_logprob = mean over the document's
    * bigrams) — the step up from [[unigramLogProb]] toward the KenLM-style
    * fluency scores CCNet-family pipelines filter on. Documents with fewer
    * than two tokens have no bigrams and drop from the result.
    *
    * Scale shape: bigram pairs come from a constant-reference zip_with over
    * shifted slices (PLANS HOF contract — no O(len²) re-splits), then
    * three map-side-combinable count aggregations — (p,t), (p), (t) — and
    * joins back keyed on those same vocab keys (AQE broadcasts them at
    * test scale, shuffles co-key at corpus scale). N is one bounded scalar
    * action. Nothing is quadratic; no single-partition window.
    */
  def bigramLogProb(df: DataFrame, idCol: String, textCol: String,
      lambda: Double = 0.75): DataFrame = {
    val base = df.select(col(s"`$idCol`").as("id"),
      Dedup.tokens(col(s"`$textCol`")).as("__toks"))
    val m = greatest(size(col("__toks")) - 1, lit(0))
    val pairs = base.select(col("id"), explode(
      zip_with(slice(col("__toks"), lit(1), m), slice(col("__toks"), lit(2), m),
        (a, b) => struct(a.as("p"), b.as("t")))).as("__bg"))
      .select(col("id"), col("__bg.p").as("p"), col("__bg.t").as("t"))
    val uni = base.select(explode(col("__toks")).as("t"))
    // the two count tables are the LM's parameters (vocab-sized, not
    // corpus-sized) and each feeds two consumers — pin them so the scalar
    // total reads the materialized c1 (not a second corpus tokenize) and
    // the context totals cp read the materialized c2 (not a second bigram
    // pass). Featurize passes drop 5 -> 3; N = Σc1 is the same long the
    // former count-over-occurrences action produced.
    val c1 = uni.groupBy("t").agg(count(lit(1)).as("c1"))
      .localCheckpoint(eager = false)
    val n = c1.agg(coalesce(sum(col("c1")), lit(1L)))
      .collect()(0).getLong(0).toDouble
    val c2 = pairs.groupBy("p", "t").agg(count(lit(1)).as("c2"))
      .localCheckpoint(eager = false)
    val cp = c2.groupBy("p").agg(sum(col("c2")).cast("double").as("cp"))
    pairs
      .join(c2, Seq("p", "t"))
      .join(cp, Seq("p"))
      .join(c1, Seq("t"))
      .withColumn("__s", log10(
        lit(lambda) * (col("c2") / col("cp")) +
          lit(1.0 - lambda) * (col("c1") / lit(n))))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(avg(col("__s")), 6).as("avg_logprob"))
  }

  /** CCNet-style LM-quality bucketing (Wenzek et al., arXiv:1911.00359
    * §4.3: split the corpus into head/middle/tail terciles of the LM score
    * and train preferentially on the head): each document's
    * [[unigramLogProb]] score is ranked by the corpus ECDF — computed
    * through the scale-safe bucketed prefix sum
    * ([[graft.functions.MathFunctions.ecdf]] → ScaleWindows.runningSum, no
    * single-partition window) — and bucket b ∈ 1..nBuckets is
    * ceil(ecdf·nBuckets) (1 = lowest scores = "tail", nBuckets = "head").
    * Ties share a rounded score, so they land in one bucket
    * deterministically on any engine.
    */
  def perplexityBuckets(df: DataFrame, idCol: String, textCol: String,
      nBuckets: Int = 3): DataFrame = {
    // ecdf consumes its input three times (count, per-value counts, the
    // rank join) — pin the scored table (per-doc rows, ~3 narrow columns)
    // or each consumer re-runs the whole unigram LM pipeline over the
    // corpus (tokenize + vocab join), tripling the featurize passes
    val scored = unigramLogProb(df, idCol, textCol)
      .localCheckpoint(eager = false)
    graft.functions.MathFunctions.ecdf(scored, "avg_logprob", "__e")
      .withColumn("bucket",
        least(ceil(col("__e") * nBuckets), lit(nBuckets.toLong)).cast("int"))
      .select(col("id").as(idCol), col("n_tokens"), col("avg_logprob"),
        col("bucket"))
  }

  /** Top-k TF-IDF terms per document — the keyword/fingerprint summary an
    * indexing or near-dup triage pipeline keeps per doc. tf = raw in-doc
    * count, idf = log10(N/df); ranking ties break on the term itself so the
    * result is deterministic across engines. Shapes: per-(doc, term) count
    * (map-side combinable), per-term doc frequency, both joined (the term
    * side AQE-broadcasts), then a per-doc row_number window over ≤
    * |doc terms| rows. N is one bounded scalar action.
    */
  def tfidfTopTerms(df: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    val n = df.count().toDouble
    val tok = df.select(col(s"`$idCol`").as("id"),
      explode(Dedup.tokens(col(s"`$textCol`"))).as("t"))
    val tf = tok.groupBy("id", "t").agg(count(lit(1)).as("tf"))
    val dfreq = tok.groupBy("t").agg(size(collect_set(col("id"))).as("df"))
    val scored = tf.join(dfreq, Seq("t"))
      .withColumn("score", col("tf") * log10(lit(n) / col("df")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("id")
      .orderBy(col("score").desc, col("t").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("id"), col("t").as("term"), col("rank"),
        round(col("score"), 6).as("score"))
  }

  /** BM25 top-k retrieval (Robertson/Okapi; the keyword-relevance scorer a
    * data pipeline uses to pull topic-targeted subsets out of a corpus):
    * score(d) = Σ_t idf_t · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    * with the Lucene-robust idf ln(1 + (N − df + 0.5)/(df + 0.5)).
    *
    * Scale shape: tokens are FILTERED to the query terms before any
    * shuffle (a |terms|-literal isin — the narrow pushdown that makes this
    * a keyword scan, not a corpus index build), then one (id, token) agg,
    * a broadcast join of the |terms|-row df table, and one per-doc agg.
    * N/avgdl are one bounded 1-row action. The final top-k is
    * orderBy+limit = TakeOrderedAndProject, never a global sort. Per-doc
    * term scores are folded in token order (array_sort + ascending fold)
    * so float summation order is engine-invariant — same contract as the
    * oracle's list_sum(list(s ORDER BY token)).
    */
  def bm25TopK(df: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int = 20, k1: Double = 1.2,
      b: Double = 0.75, roundTo: Int = 6): DataFrame = {
    val toks = df.select(col(s"`$idCol`").as("id"),
      Dedup.tokens(col(s"`$textCol`")).as("__toks"))
      .withColumn("dl", size(col("__toks")))
    val stats = toks.agg(count(lit(1)).cast("double").as("n"),
      avg(col("dl")).as("avgdl")).head()
    // empty corpus: avg is NULL; the term scan below is empty anyway, the
    // placeholder only keeps the plan well-typed
    val n = stats.getDouble(0)
    val avgdl = if (stats.isNullAt(1)) 1.0 else stats.getDouble(1)
    val f = toks.select(col("id"), col("dl"), explode(col("__toks")).as("token"))
      .filter(col("token").isin(queryTerms: _*))
      .groupBy("id", "dl", "token").agg(count(lit(1)).as("tf"))
    val dft = f.groupBy("token").agg(count(lit(1)).cast("double").as("dft"))
    val idf = log(lit(1.0) +
      (lit(n) - col("dft") + lit(0.5)) / (col("dft") + lit(0.5)))
    val den = col("tf").cast("double") +
      lit(k1) * (lit(1.0 - b) + (lit(b) * col("dl").cast("double")) / lit(avgdl))
    val perTerm = f.join(broadcast(dft), Seq("token"))
      .withColumn("__s", idf * ((col("tf").cast("double") * lit(k1 + 1)) / den))
    perTerm.groupBy(col("id"))
      .agg(round(aggregate(
        transform(array_sort(collect_list(struct(col("token"), col("__s")))),
          x => x.getField("__s")),
        lit(0.0d), (a, x) => a + x), roundTo).as("score"))
      .select(col("id").as(idCol), col("score"))
      .orderBy(col("score").desc, col(s"`$idCol`").asc)
      .limit(k)
  }

  /** Top-k corpus vocabulary — the tokenizer-training / OOV-audit prep
    * step: term frequency, document frequency, and cumulative corpus
    * coverage for the k most frequent tokens (ties broken on the token so
    * the ranking is deterministic across engines). One explode → one
    * map-side-combinable aggregation keyed on the token; the top-k sort
    * runs over the |vocab| aggregate, never over token instances, and the
    * coverage prefix sum is a window over k rows on the driver-bounded
    * result. Scales to any corpus: the only shuffle is the (token) agg.
    */
  def buildVocab(df: DataFrame, idCol: String, textCol: String,
      k: Int = 100): DataFrame = {
    val tok = df.select(col(s"`$idCol`").as("id"),
      explode(Dedup.tokens(col(s"`$textCol`"))).as("token"))
    val vocab = tok.groupBy("token")
      .agg(count(lit(1)).as("tf"), count_distinct(col("id")).as("df"))
    val total = vocab.agg(coalesce(sum(col("tf")), lit(1L)))
      .collect()(0).getLong(0).toDouble
    import org.apache.spark.sql.expressions.Window
    // orderBy+limit plans as TakeOrderedAndProject (per-partition top-k +
    // driver merge) — the global windows below then run over k rows, never
    // the full vocabulary
    val top = vocab.orderBy(col("tf").desc, col("token")).limit(k)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("tf").desc, col("token"))))
    top.withColumn("coverage",
        round(sum(col("tf")).over(
          Window.orderBy(col("rank")).rowsBetween(Window.unboundedPreceding, 0))
          / total, 6))
      .select("rank", "token", "tf", "df", "coverage")
  }

  /** Invariant gate for sketch-based distinct counting: HLL++
    * approx_count_distinct of the vocabulary within `tol` of the exact
    * count (same pattern as the ANN recall gates — the sketch itself is
    * engine-specific, the bound is the contract). Returns one row:
    * (n_exact, approx_ok). At 100 TB the approx path is the one you run —
    * constant memory per partition vs the exact count's full shuffle.
    */
  def vocabSizeGate(df: DataFrame, textCol: String,
      tol: Double = 0.05): DataFrame = {
    val tok = df.select(explode(Dedup.tokens(col(s"`$textCol`"))).as("token"))
    tok.agg(count_distinct(col("token")).as("n_exact"),
        approx_count_distinct(col("token")).as("n_approx"))
      .select(col("n_exact"),
        (abs(col("n_approx") - col("n_exact")).cast("double") /
          col("n_exact") <= tol).as("approx_ok"))
  }

  /** PMI collocations: the top-k word bigrams by pointwise mutual
    * information, PMI = ln(p(ab) / (p(a)·p(b))) with p over the corpus's
    * bigram / unigram distributions — the standard collocation extractor
    * (phrase mining, tokenizer-merge candidates, stopword diagnostics).
    * `minCount` suppresses the low-support noise PMI is notorious for.
    *
    * Scale shape: bigram extraction is the constant-reference zip_with
    * (PLANS.md HOF contract), counts are combinable aggregations on the
    * token/bigram hash, the two unigram joins are keyed equi joins (AQE
    * broadcasts when the vocab is small), totals ride a broadcast
    * single-row cross join, and top-k is TakeOrderedAndProject. Counts are
    * exact integers; the single ln is rounded to 6 on both engines.
    */
  def collocations(df: DataFrame, textCol: String, minCount: Long = 5,
      k: Int = 50): DataFrame = {
    val toks = Dedup.tokens(col(s"`$textCol`"))
    val uc = df.select(explode(toks).as("t"))
      .groupBy("t").agg(count(lit(1)).as("c"))
    val bc = df.select(explode(Dedup.ngrams(toks, 2)).as("bg"))
      .groupBy("bg").agg(count(lit(1)).as("cab"))
    val nu = uc.agg(sum(col("c")).cast("double").as("n_uni"))
    val nb = bc.agg(sum(col("cab")).cast("double").as("n_bi"))
    bc.filter(col("cab") >= minCount)
      .withColumn("a", split(col("bg"), " ").getItem(0))
      .withColumn("b", split(col("bg"), " ").getItem(1))
      .join(uc.select(col("t").as("a"), col("c").as("ca")), Seq("a"))
      .join(uc.select(col("t").as("b"), col("c").as("cb")), Seq("b"))
      .crossJoin(broadcast(nu)).crossJoin(broadcast(nb))
      .select(col("bg"), col("cab"),
        round(log((col("cab") / col("n_bi")) /
          ((col("ca") / col("n_uni")) * (col("cb") / col("n_uni")))), 6)
          .as("pmi"))
      .orderBy(col("pmi").desc, col("bg"))
      .limit(k)
  }

  /** Count-Min-sketch heavy-hitter gate — the third sketch family next to
    * HLL ([[vocabSizeGate]]) and quantiles ([[tokenQuantilesGate]]): token
    * frequencies estimated from ONE bounded-memory pass (Spark's native
    * `count_min_sketch` aggregate, a few hundred KB regardless of corpus
    * size) checked against exact counts for a deterministic probe set.
    * CMS guarantees estimate ≥ true and, w.h.p., estimate ≤ true + eps·N —
    * both bounds become gate booleans; the exact probe counts are returned
    * for hash comparison. The sketch is a single aggregate row (bounded
    * collect); probes are evaluated driver-side against it.
    *
    * Gate caveat: `est_within_eps` is a PROBABILISTIC bound — it holds with
    * probability ≥ `confidence` (0.99) per probe, not always. The oracle
    * pins TRUE only because the sketch is deterministic for the fixed seed
    * (42) on the frozen gate corpus; changing the data or the probe set can
    * legitimately flip it with no code regression — re-pin, don't debug.
    */
  def tokenCmsGate(df: DataFrame, textCol: String, probes: Seq[String],
      eps: Double = 0.001, confidence: Double = 0.99): DataFrame = {
    require(probes.nonEmpty, "token_cms_gate: empty probe set")
    val spark = df.sparkSession
    import spark.implicits._
    val tok = df.select(explode(Dedup.tokens(col(s"`$textCol`"))).as("token"))
    val row = tok.agg(
      expr(s"count_min_sketch(token, CAST($eps AS DOUBLE), " +
        s"CAST($confidence AS DOUBLE), 42)").as("sketch"),
      count(lit(1)).as("n")).head()
    val cms = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(row.getAs[Array[Byte]](0))
    val n = row.getLong(1)
    val exact = tok.filter(col("token").isin(probes: _*))
      .groupBy("token").agg(count(lit(1)).as("n_exact"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val slack = math.ceil(eps * n).toLong
    probes.map { p =>
      val ex = exact.getOrElse(p, 0L)
      val est = cms.estimateCount(p)
      (p, ex, est >= ex, est <= ex + slack)
    }.toDF("token", "n_exact", "est_ge_exact", "est_within_eps")
  }

  /** Misra-Gries heavy hitters — the frequent-items member of the sketch
    * family (HLL distinct / CMS point counts / percentile_approx):
    * top-k most frequent tokens via the bounded mergeable sketch
    * ([[graft.functions.aggregates.MisraGries]]). ONE narrow pass over
    * token arrays (no explode), one single-buffer-per-partition exchange
    * — the vocabulary never shuffles, the 100 TB shape. With capacity >=
    * the distinct-token count no eviction fires and the sketch IS the
    * exact frequency table (the deterministic gate setting); production
    * uses capacity << vocab and inherits the documented
    * `true - N/(capacity+1) <= est <= true` guarantee.
    */
  def heavyHitters(df: DataFrame, textCol: String, capacity: Int,
      k: Int, by: Seq[String] = Nil): DataFrame = {
    val reserved = Set("token", "est", "__sk", "__pos", "__hh")
    require(!by.exists(reserved.contains), "heavy_hitters: by column(s) " +
      s"${by.filter(reserved.contains).mkString(", ")} collide with the " +
      "output/internal names (token, est, __sk, __pos, __hh) — rename first")
    val byCols = by.map(c => col(s"`$c`"))
    val sk = graft.functions.aggregates.misra_gries(
      Dedup.tokens(col(s"`$textCol`")), capacity).as("__sk")
    val agged =
      if (by.isEmpty) df.agg(sk) else df.groupBy(byCols: _*).agg(sk)
    agged
      .select(byCols :+ posexplode(col("__sk")).as(Seq("__pos", "__hh")): _*)
      .filter(col("__pos") < k)
      .select(byCols ++ Seq(
        col("__hh.token").as("token"), col("__hh.est").as("est")): _*)
  }

  /** Order-invariant bound gate for the SMALL-capacity (evicting) sketch,
    * token_cms_gate precedent: surviving counts are processing-order-
    * dependent, but `est <= true` and `est >= true - N/(capacity+1)` hold
    * for ANY order (absent probes read est = 0), so the gate projects the
    * exact count plus the two bound booleans per probe token.
    */
  def heavyHittersBoundGate(df: DataFrame, textCol: String,
      probes: Seq[String], capacity: Int): DataFrame = {
    require(probes.nonEmpty, "heavy_hitters_bound: empty probe set")
    val spark = df.sparkSession
    import spark.implicits._
    val toks = df.select(Dedup.tokens(col(s"`$textCol`")).as("toks"))
    val row = toks.agg(
      graft.functions.aggregates.misra_gries(col("toks"), capacity).as("sk"),
      sum(size(col("toks")).cast("long")).as("n")).head()
    val est = row.getSeq[org.apache.spark.sql.Row](0)
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = row.getLong(1)
    val err = n / (capacity + 1)
    val exact = df.select(explode(Dedup.tokens(col(s"`$textCol`"))).as("token"))
      .filter(col("token").isin(probes: _*))
      .groupBy("token").agg(count(lit(1)).as("n_exact"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    probes.map { p =>
      val ex = exact.getOrElse(p, 0L)
      val e = est.getOrElse(p, 0L)
      (p, ex, e <= ex, e >= ex - err)
    }.toDF("token", "n_exact", "est_le_exact", "est_within_err")
  }

  /** Canary-string scan — the exact-substring sweep for benchmark canary
    * GUIDs (BIG-bench-style canaries, eval-set sentinel strings) that runs
    * before any training dump ships: one row per (document, canary) hit.
    * Pure narrow projection (the canary list is a constant array literal;
    * per-row cost = Σ|canary| substring scans — no tokenization, no
    * shuffle), so it streams unchanged and composes with `filter`/anti-join
    * for the drop. Case-sensitive by contract: canaries are exact literal
    * markers.
    */
  def findCanaries(df: DataFrame, idCol: String, textCol: String,
      canaries: Seq[String]): DataFrame = {
    require(canaries.nonEmpty, "findCanaries: empty canary list")
    df.select(col(s"`$idCol`").as("id"),
        explode(filter(array(canaries.map(lit): _*),
          c => col(s"`$textCol`").contains(c))).as("canary"))
  }

  /** Token-length quantile gate — the percentile twin of [[vocabSizeGate]]:
    * exact interpolated percentiles of the per-doc token count (Spark's
    * `percentile`, the same linear-interpolation definition as DuckDB's
    * quantile_cont, so the exact side hash-matches) next to the
    * `percentile_approx` sketch a 100 TB corpus-profiling pass actually
    * runs (bounded-memory KLL-style summary; the exact aggregate's
    * per-value counts map can't hold a corpus-scale cardinality). Pins the
    * exact values (rounded) and the boolean that every sketch estimate is
    * within `tol` of exact.
    */
  def tokenQuantilesGate(df: DataFrame, textCol: String,
      tol: Double = 0.05): DataFrame = {
    val counts = df.select(
      size(Dedup.tokens(col(s"`$textCol`"))).cast("double").as("n"))
    counts
      .agg(expr("percentile(n, array(0.25D, 0.5D, 0.75D, 0.9D))").as("ex"),
        percentile_approx(col("n"),
          array(lit(0.25), lit(0.5), lit(0.75), lit(0.9)), lit(1000)).as("ap"))
      .select(
        round(element_at(col("ex"), 1), 6).as("p25"),
        round(element_at(col("ex"), 2), 6).as("p50"),
        round(element_at(col("ex"), 3), 6).as("p75"),
        round(element_at(col("ex"), 4), 6).as("p90"),
        forall(zip_with(col("ex"), col("ap"), (e, a) =>
          abs(a - e) <= lit(tol) * greatest(abs(e), lit(1.0d))),
          x => x).as("approx_ok"))
  }

  /** One-call corpus health report — the first thing a data curator runs
    * on a new crawl: per-group (or whole-corpus) document/token/char
    * volumes, exact duplicate-text rate, and mean quality score. ONE
    * aggregation pass; every statistic is combinable (the duplicate rate
    * rides on count_distinct of the 128-bit text hash, so the shuffle
    * carries 16-byte keys, not text). Mean quality sums per-doc scores as
    * exact 1e-6-scaled integers, so the float total is order-invariant —
    * the whole row is hash-exact across engines.
    */
  def corpusReport(df: DataFrame, textCol: String,
      byCol: Option[String] = None): DataFrame = {
    val t = col(s"`$textCol`")
    val grouped = byCol match {
      case Some(c) => df.groupBy(col(s"`$c`").cast("string").as("group"))
      case None    => df.groupBy(lit("all").as("group"))
    }
    grouped.agg(
        count(lit(1)).as("n_docs"),
        sum(tokenCount(t).cast("long")).as("n_tokens"),
        sum(length(t).cast("long")).as("n_chars"),
        count_distinct(md5(t.cast("binary"))).as("n_distinct_texts"),
        sum(round(qualityScore(t) * 1e6d).cast("long")).as("__qsum"))
      .select(col("group"), col("n_docs"), col("n_tokens"), col("n_chars"),
        round(col("n_tokens").cast("double") / col("n_docs"), 6).as("avg_tokens"),
        col("n_distinct_texts"),
        round(lit(1.0d) - col("n_distinct_texts").cast("double") /
          col("n_docs"), 6).as("dup_text_frac"),
        round(col("__qsum").cast("double") / col("n_docs") / 1e6d, 6)
          .as("mean_quality"))
  }

  /** Corpus drift report — the distribution-shift monitor an ingest
    * pipeline runs between two corpus snapshots (last week's crawl vs this
    * week's, corpus vs candidate shard): Jensen-Shannon divergence (base
    * 10) between the two unigram distributions over the union of each
    * side's top-`topK` tokens (add-one smoothing over the union support,
    * so absent tokens contribute finitely), top-vocab Jaccard overlap, and
    * per-corpus size/length stats. Two linear passes per side
    * (a map-side-combined token-count aggregation, and a doc-level
    * size/length aggregation), a top-K each, and a K-sized join — linear
    * in the corpora, constant-size beyond those aggregates. Doubles ride the
    * round-then-integer-scale policy, so the row is driver-hash exact.
    * Emits ONE row: (n_docs_a, n_docs_b, mean_tokens_a_micro,
    * mean_tokens_b_micro, vocab_jaccard_micro, js_micro).
    */
  def corpusDrift(a: DataFrame, b: DataFrame, textCol: String,
      topK: Int = 200): DataFrame = {
    def counts(df: DataFrame) =
      df.select(explode(Dedup.tokens(col(s"`$textCol`"))).as("token"))
        .filter(length(col("token")) > 0)
        .groupBy("token").agg(count(lit(1)).as("cnt"))
    val ca = counts(a).localCheckpoint(eager = false)
    val cb = counts(b).localCheckpoint(eager = false)
    def top(c: DataFrame) =
      c.orderBy(col("cnt").desc, col("token")).limit(topK).select("token")
    val tu = top(ca).withColumn("ina", lit(1))
      .join(top(cb).withColumn("inb", lit(1)), Seq("token"), "full")
    val joined = tu
      .join(ca.withColumnRenamed("cnt", "ca"), Seq("token"), "left")
      .join(cb.withColumnRenamed("cnt", "cb"), Seq("token"), "left")
      .select(col("token"), col("ina"), col("inb"),
        coalesce(col("ca"), lit(0L)).as("ca"),
        coalesce(col("cb"), lit(0L)).as("cb"))
      .localCheckpoint(eager = false)
    val totals = joined.agg(
      sum(col("ca")).cast("double").as("sa"),
      sum(col("cb")).cast("double").as("sb"),
      count(lit(1)).cast("double").as("usz"),
      sum(when(col("ina").isNotNull && col("inb").isNotNull, 1L)
        .otherwise(0L)).as("inter"))
    val p = (col("ca") + 1).cast("double") / (col("sa") + col("usz"))
    val q = (col("cb") + 1).cast("double") / (col("sb") + col("usz"))
    val m = (p + q) / 2.0d
    val drift = joined.crossJoin(broadcast(totals)).agg(
      round(round(sum(lit(0.5d) * p * log10(p / m) +
        lit(0.5d) * q * log10(q / m)), 6) * 1e6d).cast("long").as("js_micro"),
      round(round(max(col("inter")).cast("double") / max(col("usz")), 6) * 1e6d)
        .cast("long").as("vocab_jaccard_micro"))
    def stats(df: DataFrame, tag: String) = df.agg(
      count(lit(1)).as(s"n_docs_$tag"),
      round(round(avg(size(Dedup.tokens(col(s"`$textCol`")))), 6) * 1e6d)
        .cast("long").as(s"mean_tokens_${tag}_micro"))
    stats(a, "a").crossJoin(stats(b, "b")).crossJoin(drift)
      .select("n_docs_a", "n_docs_b", "mean_tokens_a_micro",
        "mean_tokens_b_micro", "vocab_jaccard_micro", "js_micro")
  }

  /** Convenience: annotate a documents table with all analysis columns. */
  def analyze(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("lang_pred", langId(col(textCol)))
      .withColumn("n_tokens", tokenCount(col(textCol)))
      .withColumn("n_bpeish", bpeishTokenCount(col(textCol)))
      .withColumn("quality", qualityScore(col(textCol)))
      .withColumn("fp", docFingerprint(col(textCol)))
      .withColumn("rep", dupLineStats(col(textCol)))
      .withColumn("gopher", gopherQualityFlags(col(textCol)))
}
