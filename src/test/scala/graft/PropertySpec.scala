package graft

import graft.functions.Norm
import graft.operators.{JoinOps, ReshapeOps}
import graft.syntax._
import org.apache.spark.sql.functions._
import scala.util.Random

/** Seeded randomized properties, mirroring the reference's Hypothesis
  * strategy (reference: janitor/testing_utils/strategies.py:11-107 — small
  * mixed frames; conditional-join oracle = cross-join + filter,
  * tests/functions/test_conditional_join.py:642-666).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  test("cleanName is idempotent and emits only [a-z0-9_] under removeSpecial") {
    val rng = new Random(42)
    val alphabet = "aZ3 _-./:?()#é'å @"
    (1 to 200).foreach { _ =>
      val s = (1 to (1 + rng.nextInt(12))).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString
      val once = Norm.cleanName(s, removeSpecial = true, stripAccentsFlag = true)
      val twice = Norm.cleanName(once, removeSpecial = true, stripAccentsFlag = true)
      assert(once == twice, s"not idempotent on ${s.toList}")
      assert(once.matches("[a-z0-9_]*"), s"bad chars in '$once' from ${s.toList}")
    }
  }

  test("conditionalJoin inner == crossJoin + filter (random frames)") {
    val rng = new Random(7)
    (1 to 5).foreach { _ =>
      val l = (1 to 30).map(i => (i, rng.nextInt(20), rng.nextDouble() * 10)).toDF("lid", "la", "lx")
      val r = (1 to 25).map(i => (i, rng.nextInt(20), rng.nextDouble() * 10)).toDF("rid", "ra", "rx")
      val conds: Seq[JoinOps.Cond] = Seq(("la", "ra", "<="), ("lx", "rx", ">"))
      val got = JoinOps.conditionalJoin(l, r, conds).select("lid", "rid")
      val naive = l.crossJoin(r).filter(col("la") <= col("ra") && col("lx") > col("rx"))
        .select("lid", "rid")
      assert(sorted(got) == sorted(naive))
    }
  }

  test("conditionalJoin keep=first == min matching right key (random)") {
    val rng = new Random(13)
    val l = (1 to 40).map(i => (i, rng.nextDouble() * 50)).toDF("lid", "x")
    val r = (1 to 30).map(i => (i, rng.nextDouble() * 50)).toDF("rid", "lo")
    val got = JoinOps.conditionalJoin(l, r, Seq(("x", "lo", ">=")), keep = "first")
      .select("lid", "rid")
    // keep=first orders by right join column then remaining right cols
    val naive = l.crossJoin(r).filter(col("x") >= col("lo"))
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("lid").orderBy("lo", "rid")))
      .filter(col("rn") === 1).select("lid", "rid")
    assert(sorted(got) == sorted(naive))
  }

  test("conditionalJoin == crossJoin + filter across the reference's condition-shape matrix") {
    // the distinctive shapes of tests/functions/test_conditional_join.py:
    // single !=, eq+ne, ne+eq, gt_lt_ne chains, multiple eqs + le, dual
    // ranges — each held to the brute cross+filter oracle, inner AND
    // left/right outer forms
    val rng = new Random(97)
    val l = (1 to 35).map(i =>
      (i, rng.nextInt(6), rng.nextInt(6), rng.nextDouble() * 10)).toDF("lid", "la", "lb", "lx")
    val r = (1 to 30).map(i =>
      (i, rng.nextInt(6), rng.nextInt(6), rng.nextDouble() * 10)).toDF("rid", "ra", "rb", "rx")
    def cc(op: String, a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = op match {
      case "==" => a === b
      case "!=" => a =!= b
      case "<" => a < b
      case "<=" => a <= b
      case ">" => a > b
      case ">=" => a >= b
    }
    val shapes: Seq[Seq[JoinOps.Cond]] = Seq(
      Seq(("la", "ra", "!=")),
      Seq(("la", "ra", "=="), ("lb", "rb", "!=")),
      Seq(("la", "ra", "!="), ("lb", "rb", "==")),
      Seq(("lx", "rx", ">"), ("la", "ra", "<"), ("lb", "rb", "!=")),
      Seq(("la", "ra", "=="), ("lb", "rb", "=="), ("lx", "rx", "<=")),
      Seq(("lx", "rx", ">="), ("la", "ra", "<=")))
    for (conds <- shapes) {
      val pred = conds.map { case (a, b, op) => cc(op, col(a), col(b)) }.reduce(_ && _)
      val naiveInner = l.crossJoin(r).filter(pred)
      assert(sorted(JoinOps.conditionalJoin(l, r, conds).select("lid", "rid")) ==
        sorted(naiveInner.select("lid", "rid")), s"inner $conds")
      // left join: unmatched left rows appear once with null right id
      val matchedL = naiveInner.select("lid").distinct()
      val naiveLeft = naiveInner.select("lid", "rid").unionByName(
        l.select("lid").except(matchedL).withColumn("rid", lit(null).cast("int")))
      assert(sorted(JoinOps.conditionalJoin(l, r, conds, how = "left")
          .select("lid", "rid")) == sorted(naiveLeft), s"left $conds")
      val matchedR = naiveInner.select("rid").distinct()
      val naiveRight = naiveInner.select("lid", "rid").unionByName(
        r.select("rid").except(matchedR).select(
          lit(null).cast("int").as("lid"), col("rid")))
      assert(sorted(JoinOps.conditionalJoin(l, r, conds, how = "right")
          .select("lid", "rid")) == sorted(naiveRight), s"right $conds")
    }
  }

  test("asofJoin == brute-force nearest-preceding/following scan (random frames)") {
    val rng = new Random(31)
    (1 to 3).foreach { round =>
      // duplicate left timestamps allowed; right unique per (key, t) as the
      // operator pre-aggregates duplicates deterministically anyway
      val l = (1 to 60).map(i => (i, rng.nextInt(4), rng.nextInt(40).toLong)).toDF("lid", "k", "t")
      val rRows = rng.shuffle((0 until 4).flatMap(k =>
        rng.shuffle((0L until 40L).toList).take(12).map(t => (k, t, rng.nextInt(1000)))))
      val r = rRows.toDF("k", "t", "v")
      val rMap = rRows.groupBy(x => (x._1, x._2)).map { case (kt, g) => kt -> g.map(_._3).max }
      def brute(lt: Long, k: Int, dir: String): Option[Int] = {
        val ts = rMap.keys.filter(_._1 == k).map(_._2)
        val cand = dir match {
          case "backward" => ts.filter(_ <= lt).reduceOption(_ max _)
          case "forward" => ts.filter(_ >= lt).reduceOption(_ min _)
          case "nearest" =>
            val b = ts.filter(_ <= lt).reduceOption(_ max _)
            val f = ts.filter(_ >= lt).reduceOption(_ min _)
            (b, f) match {
              case (Some(bb), Some(ff)) => Some(if (lt - bb <= ff - lt) bb else ff)
              case (x, y) => x.orElse(y)
            }
        }
        cand.map(t => rMap((k, t)))
      }
      for ((dir, skew) <- Seq("backward" -> false, "backward" -> true,
          "forward" -> false, "nearest" -> true)) {
        val got = JoinOps.asofJoin(l, r, on = "t", by = Seq("k"), direction = dir,
            skewSafe = skew)
          .select("lid", "v").collect()
          .map(row => row.getInt(0) -> (if (row.isNullAt(1)) None else Some(row.getInt(1))))
          .toMap
        val lRows = l.collect().map(row => (row.getInt(0), row.getInt(1), row.getLong(2)))
        lRows.foreach { case (lid, k, t) =>
          assert(got(lid) == brute(t, k, dir),
            s"round=$round dir=$dir skew=$skew lid=$lid (k=$k t=$t)")
        }
      }
    }
  }

  test("rangeJoin == naive theta join across random band widths") {
    val rng = new Random(99)
    val l = (1 to 60).map(i => (i, rng.nextDouble() * 100)).toDF("id", "x")
    val r = (1 to 20).map { i =>
      val lo = rng.nextDouble() * 100 - 10
      (i, lo, lo + rng.nextDouble() * 30 - 5) // sometimes empty (hi < lo)
    }.toDF("rid", "lo", "hi")
    Seq(0.5, 3.0, 17.0, 100.0).foreach { w =>
      val banded = JoinOps.rangeJoin(l, r, "x", "lo", "hi", bandWidth = w).select("id", "rid")
      val naive = l.crossJoin(r).filter(col("x") >= col("lo") && col("x") <= col("hi"))
        .select("id", "rid")
      assert(sorted(banded) == sorted(naive), s"width $w differs")
    }
  }

  test("WindowMin kernel == slice+array_min; GramHash48 == md5 hex conv (random arrays)") {
    val rng = new Random(21)
    val rows = (1 to 60).map { i =>
      val n = rng.nextInt(20)
      (i.toLong, (1 to n).map(_ => rng.nextLong()), (1 to n).map(_ => s"t${rng.nextInt(9)}").mkString(" "))
    }.toDF("id", "hs", "text")
    Seq(1, 3, 5).foreach { w =>
      val got = rows.select(col("id"),
        graft.functions.vector.window_min(col("hs"), w).as("m"))
      val naive = rows.select(col("id"), when(size(col("hs")) >= w,
        transform(sequence(lit(1), size(col("hs")) - (w - 1)),
          j => array_min(slice(col("hs"), j, lit(w)))))
        .otherwise(array().cast("array<bigint>")).as("m"))
      assert(sorted(got) == sorted(naive), s"window $w differs")
    }
    val toks = split(lower(col("text")), "\\s+")
    val gotH = rows.select(col("id"),
      graft.functions.vector.gram_hash48(toks, 3).as("h"))
    val naiveH = rows.select(col("id"), when(size(toks) >= 3,
      transform(sequence(lit(1), size(toks) - 2),
        i => conv(substring(md5(concat_ws(" ",
          element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2))
          .cast("binary")), 1, 12), 16, 10).cast("long")))
      .otherwise(array().cast("array<bigint>")).as("h"))
    assert(sorted(gotH) == sorted(naiveH))
  }

  test("hash kernels agree with declarative forms on non-ASCII text") {
    // multibyte UTF-8 (accents, CJK, emoji): the kernels hash raw UTF-8
    // bytes, which must match md5/xxhash64 over the same strings
    val rows = Seq((1L, "héllo wörld 中文 текст emoji 🚀 mixé"),
      (2L, "naïve café über schön déjà vu encore"),
      (3L, "日本語 の テスト 文字列 です ね")).toDF("id", "text")
    val toks = split(lower(col("text")), "\\s+")
    val gotH = rows.select(col("id"), graft.functions.vector.gram_hash48(toks, 3).as("h"))
    val naiveH = rows.select(col("id"), when(size(toks) >= 3,
      transform(sequence(lit(1), size(toks) - 2),
        i => conv(substring(md5(concat_ws(" ",
          element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2))
          .cast("binary")), 1, 12), 16, 10).cast("long")))
      .otherwise(array().cast("array<bigint>")).as("h"))
    assert(sorted(gotH) == sorted(naiveH))
    val gotSig = rows.select(col("id"),
      graft.functions.vector.minhash_sig(toks, 8, 3).as("sig"))
    val exploded = rows.select(col("id"),
      explode(graft.llm.Dedup.shingles(col("text"), 3)).as("shingle"))
    val mins = (0 until 8).map(i => min(xxhash64(col("shingle"), lit(i))).as(s"h$i"))
    val naiveSig = exploded.groupBy("id").agg(mins.head, mins.tail: _*)
      .select(col("id"), array((0 until 8).map(i => col(s"h$i")): _*).as("sig"))
    assert(sorted(gotSig) == sorted(naiveSig))
  }

  test("MinhashSig kernel == exploded min(xxhash64(shingle, i)) aggregation (random texts)") {
    val rng = new Random(31)
    val rows = (1 to 40).map { i =>
      val n = rng.nextInt(15)
      (i.toLong, (1 to n).map(_ => s"w${rng.nextInt(7)}").mkString(" "))
    }.toDF("id", "text")
    val nH = 16
    val got = rows.select(col("id"),
      graft.functions.vector.minhash_sig(split(lower(col("text")), "\\s+"), nH, 3).as("sig"))
      .filter(col("sig").isNotNull)
    val exploded = rows.select(col("id"),
      explode(graft.llm.Dedup.shingles(col("text"), 3)).as("shingle"))
    val mins = (0 until nH).map(i => min(xxhash64(col("shingle"), lit(i))).as(s"h$i"))
    val naive = exploded.groupBy("id").agg(mins.head, mins.tail: _*)
      .select(col("id"), array((0 until nH).map(i => col(s"h$i")): _*).as("sig"))
    assert(sorted(got) == sorted(naive))
    assert(got.count() > 0)
  }

  test("pivotLonger/pivotWider round-trip on unique keys") {
    val rng = new Random(5)
    val d = (1 to 20).map(i => (i, rng.nextDouble(), rng.nextDouble())).toDF("id", "m_a", "m_b")
    val long = d.pivotLonger(index = Seq("id"), namesTo = Seq("pre", "k"), namesSep = Some("_"))
    assert(long.count() == 40)
    val wide = long.withColumn("name", concat_ws("_", col("pre"), col("k")))
      .pivotWider(index = Seq("id"), namesFrom = "name", valuesFrom = "value",
        knownValues = Seq("m_a", "m_b"))
    assert(sorted(wide.select("id", "m_a", "m_b")) == sorted(d))
  }

  test("jaroWinkler matches the textbook values, bounds, and symmetry") {
    import graft.functions.vector.jaroWinklerKernel
    import org.apache.spark.unsafe.types.UTF8String
    def jw(a: String, b: String): Double =
      jaroWinklerKernel(UTF8String.fromString(a), UTF8String.fromString(b))
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.961111) < 1e-6)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.84) < 1e-6)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.813333) < 1e-6)
    assert(jw("", "") == 0.0 && jw("a", "") == 0.0) // DuckDB's empty rule
    assert(jw("same", "same") == 1.0)
    val rng = new Random(99)
    (1 to 200).foreach { _ =>
      val a = (1 to rng.nextInt(10)).map(_ => ('a' + rng.nextInt(4)).toChar).mkString
      val b = (1 to rng.nextInt(10)).map(_ => ('a' + rng.nextInt(4)).toChar).mkString
      val x = jw(a, b)
      assert(x >= 0.0 && x <= 1.0)
      assert(x == jw(b, a), s"not symmetric on '$a','$b'")
    }
  }

  test("fuzzySelfJoin == brute-force levenshtein (random strings, unicode + empties)") {
    def lev(a: String, b: String): Int = {
      val m = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
        if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
          m(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      m(a.length)(b.length)
    }
    val rng = new Random(13)
    val alphabet = "abéλ日1"
    for (k <- 1 to 2) {
      val strs = (0 until 60).map { i =>
        val len = rng.nextInt(7) // includes empty strings
        (i.toLong, (1 to len).map(_ => alphabet(rng.nextInt(alphabet.length))).mkString)
      }
      val got = JoinOps.fuzzySelfJoin(strs.toDF("id", "s"), "id", "s", maxDist = k)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sorted.toSeq
      val expected = (for {
        (i1, s1) <- strs; (i2, s2) <- strs if i1 < i2
        d = lev(s1, s2) if d <= k
      } yield (i1, i2, d)).sorted
      assert(got == expected, s"maxDist=$k mismatch")
    }
  }

  test("dedupLines == brute-force first-occurrence scan (random corpora)") {
    val rng = new Random(29)
    val vocabLines = Vector("shared boilerplate line one", "another repeated chunk",
      "short", "x", "unique" /* placeholder, replaced per doc */)
    (1 to 3).foreach { round =>
      val docs = (0 until 25).map { i =>
        val nLines = rng.nextInt(6)
        val lines = (0 until nLines).map { j =>
          val pick = rng.nextInt(6)
          if (pick < 4) vocabLines(pick) else s"unique line $i-$j ${rng.nextInt(1000)}"
        }
        (i.toLong, lines.mkString("\n"))
      }
      val got = graft.llm.Dedup.dedupLines(docs.toDF("id", "text"), "id", "text",
        minLineChars = 10)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1).toSeq
      // brute force on the driver: first (id, idx) occurrence of each
      // normalized long line wins; short lines always kept
      val seen = scala.collection.mutable.Set.empty[String]
      val expected = docs.sortBy(_._1).map { case (id, text) =>
        val kept = text.split("\n", -1).zipWithIndex.filter { case (line, _) =>
          val t = line.trim
          if (t.length < 10) true
          else {
            val key = t.toLowerCase
            if (seen(key)) false else { seen += key; true }
          }
        }.map(_._1)
        (id, kept.mkString("\n"), kept.length.toLong)
      }
      assert(got == expected, s"round $round mismatch")
    }
  }

  test("dedupSubstrings == brute first-occurrence gram-coverage scan (random corpora)") {
    val rng = new Random(53)
    val L = 3
    (1 to 3).foreach { round =>
      val docs = (0 until 20).map { i =>
        val n = rng.nextInt(12)
        (i.toLong, (0 until n).map(_ => s"w${rng.nextInt(6)}").mkString(" "))
      }
      val got = graft.llm.Dedup.dedupSubstrings(docs.toDF("id", "text"),
          "id", "text", minMatchTokens = L)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._1).toSeq
      // brute force on the driver: per gram string, global first (id, pos);
      // every other occurrence covers its L token positions
      val all = docs.map { case (id, t) => (id, t.split("\\s+").filter(_.nonEmpty)) }
      val first = scala.collection.mutable.Map.empty[String, (Long, Int)]
      val counts = scala.collection.mutable.Map.empty[String, Int].withDefaultValue(0)
      for ((id, toks) <- all.sortBy(_._1); p <- 0 to toks.length - L) {
        val g = toks.slice(p, p + L).mkString(" ")
        if (!first.contains(g)) first(g) = (id, p)
        counts(g) += 1
      }
      val expected = all.sortBy(_._1).map { case (id, toks) =>
        val covered = Array.fill(toks.length)(false)
        for (p <- 0 to toks.length - L) {
          val g = toks.slice(p, p + L).mkString(" ")
          if (counts(g) > 1 && first(g) != ((id, p)))
            (p until p + L).foreach(covered(_) = true)
        }
        val kept = toks.indices.filterNot(covered).map(toks)
        (id, kept.mkString(" "), kept.length.toLong, (toks.length - kept.length).toLong)
      }
      assert(got == expected, s"round $round mismatch")
    }
  }

  test("sessionize == brute per-key gap scan; rollingAgg == brute O(n²) window (random events)") {
    import graft.operators.TimeseriesOps
    val rng = new Random(67)
    (1 to 3).foreach { round =>
      val events = (0 until 120).map { i =>
        val user = s"u${rng.nextInt(6)}"
        val ts = new java.sql.Timestamp(1700000000000L + rng.nextInt(500000) * 1000L)
        (i.toLong, user, ts, rng.nextInt(100).toDouble)
      }.distinct
      val df = events.toDF("id", "user", "ts", "v")
      val gap = 30 + rng.nextInt(120) // seconds
      val got = TimeseriesOps.sessionize(df, "user", "ts", gap)
        .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
      // brute: per user, sort by (ts, then nothing — ts ties excluded by
      // construction below), count strict-gap breaks
      val byUser = events.groupBy(_._2)
      val tsUnique = byUser.forall { case (_, es) =>
        es.map(_._3.getTime).distinct.size == es.size }
      if (tsUnique) { // only assert when the keyed order is total
        val expected = byUser.flatMap { case (_, es) =>
          val sorted = es.sortBy(_._3.getTime)
          var sid = 0L
          sorted.zipWithIndex.map { case (e, i) =>
            if (i > 0 && (e._3.getTime - sorted(i - 1)._3.getTime) > gap * 1000L) sid += 1
            e._1 -> sid
          }
        }.toMap
        assert(got == expected, s"sessionize round $round (gap $gap)")
      }
      // rolling: trailing (ts - W, ts] sum/count per key, brute quadratic
      val w = 60 + rng.nextInt(300)
      val roll = TimeseriesOps.rollingAgg(df, "user", "ts", w,
        Map("rs" -> sum(col("v")), "rn" -> count(lit(1))))
        .collect().map(r => r.getLong(0) -> ((r.getDouble(5), r.getLong(4)))).toMap
      events.foreach { case (id, user, ts, _) =>
        val inWin = events.filter(e => e._2 == user &&
          e._3.getTime > ts.getTime - w * 1000L && e._3.getTime <= ts.getTime)
        assert(roll(id)._2 == inWin.size.toLong, s"rolling count id=$id w=$w")
        assert(math.abs(roll(id)._1 - inWin.map(_._4).sum) < 1e-9, s"rolling sum id=$id")
      }
      // the skew-safe band-decomposed twin agrees with the keyed-window
      // form on every (id, key, agg) — same semantics, skew-split plan
      val banded = TimeseriesOps.rollingAggBanded(df, "id", "user", "ts", w,
        Map("rs" -> ("v", "sum"), "rn" -> ("v", "count"),
          "rmin" -> ("v", "min"), "rmax" -> ("v", "max")))
        .collect().map(r => r.getLong(0) -> // cols: id, user, rmax, rmin, rn, rs
          ((r.getDouble(5), r.getLong(4), r.getDouble(3), r.getDouble(2))))
        .toMap
      assert(banded.keySet == roll.keySet, s"banded row set round $round")
      events.foreach { case (id, user, ts, _) =>
        val inWin = events.filter(e => e._2 == user &&
          e._3.getTime > ts.getTime - w * 1000L && e._3.getTime <= ts.getTime)
          .map(_._4)
        val (bs, bn, bmin, bmax) = banded(id)
        assert(bn == inWin.size.toLong, s"banded count id=$id w=$w")
        assert(math.abs(bs - inWin.sum) < 1e-9, s"banded sum id=$id")
        assert(bmin == inWin.min, s"banded min id=$id")
        assert(bmax == inWin.max, s"banded max id=$id")
      }
    }
  }

  test("funnel == brute ordered first-touch scan (random event sequences)") {
    import graft.operators.EventOps
    val rng = new Random(71)
    val types = Seq("a", "b", "c")
    (1 to 3).foreach { round =>
      val events = (0 until 150).map { i =>
        (s"u${rng.nextInt(10)}",
          new java.sql.Timestamp(1700000000000L + i * 1000L), // unique ts
          types(rng.nextInt(3)))
      }
      val got = EventOps.funnel(events.toDF("user", "ts", "etype"),
          "user", "ts", "etype", types)
        .collect().map(r => r.getString(0) -> r.getLong(4)).toMap
      val expected = events.groupBy(_._1).map { case (u, es) =>
        val sorted = es.sortBy(_._2.getTime)
        var stage = 0
        var lastTs = Long.MinValue
        var done = false
        while (!done && stage < types.length) {
          sorted.find(e => e._3 == types(stage) && e._2.getTime > lastTs) match {
            case Some(e) => lastTs = e._2.getTime; stage += 1
            case None => done = true
          }
        }
        u -> stage.toLong
      }
      assert(got == expected, s"funnel round $round")
    }
  }

  test("crossCorpusDupPairs == exhaustive cross Jaccard (random corpora)") {
    val rng = new Random(41)
    def doc(seed: Int): String =
      (1 to 25).map(i => s"w${(seed * 31 + i * 7) % 40}").mkString(" ")
    val ref = (0 until 20).map(i => (i.toLong, doc(i))).toDF("rid", "rt")
    val probe = (0 until 10).map(i => (100L + i, doc(i * 2) + (if (rng.nextBoolean()) " tail" else "")))
      .toDF("pid", "pt")
    def sh(t: String): Set[String] = {
      val w = t.toLowerCase.split("\\s+")
      (0 to w.length - 3).map(i => s"${w(i)} ${w(i + 1)} ${w(i + 2)}").toSet
    }
    val refRows = ref.collect().map(r => (r.getLong(0), r.getString(1)))
    val probeRows = probe.collect().map(r => (r.getLong(0), r.getString(1)))
    val expected = (for {
      (p, pt) <- probeRows; (r, rt) <- refRows
      inter = (sh(pt) & sh(rt)).size
      j = inter.toDouble / (sh(pt).size + sh(rt).size - inter) if j >= 0.7
    } yield (p, r)).sorted.toSeq
    val got = graft.llm.Dedup.crossCorpusDupPairs(probe, "pid", "pt",
      ref, "rid", "rt", threshold = 0.7)
      .select("id1", "id2").collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(got == expected)
  }

  test("canonicalizeUrl is idempotent over randomized URL shapes") {
    // a canonical form must be a fixpoint — if canon(canon(u)) != canon(u),
    // two passes of the same pipeline stage would split a dedup class
    val rng = new Random(20)
    val schemes = Seq("", "http://", "https://", "HTTP://", "ftp://")
    val users = Seq("", "u@", "user:pw@")
    val hosts = Seq("Example.COM", "a.b.co.uk", "site.org.", "10.0.0.1", "x")
    val ports = Seq("", ":80", ":443", ":8080")
    val paths = Seq("", "/", "/A/b", "/a/b/", "//x//")
    val queries = Seq("", "?", "?b=2&a=1", "?utm_source=x", "?gclid=1&k=v",
      "?flag", "?z=1&z=0&UTM_X=q")
    val frags = Seq("", "#f", "#a?b=1")
    val urls = (1 to 300).map { _ =>
      schemes(rng.nextInt(schemes.length)) + users(rng.nextInt(users.length)) +
        hosts(rng.nextInt(hosts.length)) + ports(rng.nextInt(ports.length)) +
        paths(rng.nextInt(paths.length)) + queries(rng.nextInt(queries.length)) +
        frags(rng.nextInt(frags.length))
    }.distinct
    val out = urls.toDF("u")
      .select(col("u"),
        graft.llm.TextAnalysis.canonicalizeUrl(col("u")).as("c1"))
      .select(col("u"), col("c1"),
        graft.llm.TextAnalysis.canonicalizeUrl(col("c1")).as("c2"))
      .collect()
    out.foreach { r =>
      assert(r.getString(1) == r.getString(2),
        s"not a fixpoint: '${r.getString(0)}' -> '${r.getString(1)}' -> '${r.getString(2)}'")
    }
  }
}
