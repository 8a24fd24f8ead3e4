package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.terminology._

/** ScalaCheck property tests declared in SURVEY §5: closure is a fixpoint,
  * in_valueset membership ⊇ the explicit codes it was built from, and
  * latest-version resolution is the string-max lattice join. (Raw
  * scalacheck Gen with fixed seeds — the scalatest bridge artifact is not
  * in the offline dependency cache.) */
class PropertySpec extends SparkSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i =>
      g.apply(Gen.Parameters.default, Seed(0xB0B5L + i)))

  private val smallEdges: Gen[List[(Int, Int)]] =
    Gen.listOfN(10, Gen.zip(Gen.choose(0, 6), Gen.choose(0, 6)))
      .map(_.filter(e => e._1 != e._2).distinct)

  test("property: closure is a fixpoint (closing the closure adds nothing)") {
    import spark.implicits._
    samples(smallEdges, 5).filter(_.nonEmpty).foreach { edges =>
      val df = edges.toDF("parent", "child")
      val closed = graft.closure.TransitiveClosure.closureLong(spark, df)
        .as[(Long, Long)].collect().toSet
      val reclosed = graft.closure.TransitiveClosure.closureLong(spark,
        closed.toSeq.toDF("parent", "child"))
        .as[(Long, Long)].collect().toSet
      assert(reclosed === closed, s"edges=$edges")
    }
  }

  private val codeSets: Gen[List[(String, String)]] =
    Gen.listOfN(8, Gen.zip(Gen.oneOf("sysA", "sysB", "sysC"),
      Gen.listOfN(4, Gen.alphaLowerChar).map(_.mkString))).map(_.distinct)

  test("property: in_valueset membership contains exactly the explicit codes") {
    samples(codeSets, 10).filter(_.nonEmpty).foreach { codes =>
      val builder = BroadcastableValueSets.newBuilder()
      codes.foreach { case (s, c) => builder.addCode("ref", s, c) }
      val b = builder.build(spark, ValueSets.getEmpty(spark),
        Hierarchies.getEmpty(spark))
      codes.foreach { case (s, c) =>
        assert(b.hasCode("ref", s, c), s"missing ($s,$c)")
      }
      assert(!b.hasCode("ref", "sysA", "not-a-code-zz"))
      assert(!b.hasCode("ref", null, codes.head._2))
    }
  }

  private val versionLists: Gen[List[String]] =
    Gen.nonEmptyListOf(Gen.chooseNum(1, 30).map(_.toString)).map(_.distinct)

  test("property: latest version is the string-compare max (lattice join)") {
    import spark.implicits._
    samples(versionLists, 10).filter(_.nonEmpty).foreach { versions =>
      val meta = versions.map(v => ("urn:vs:prop", v, false))
        .toDF("url", "version", "experimental")
      val values = versions.map(v =>
        Value("urn:vs:prop", v, "s", null, "c")).toDS()
      val vs = ValueSets.getEmpty(spark).withValueSets(meta, values)
      val got = vs.getLatestVersionsMap(includeExperimental = true)
      // string max, NOT numeric max — the reference's (lexicographic)
      // semantics preserved bit-for-bit
      assert(got === Map("urn:vs:prop" -> versions.max),
        s"versions=$versions")
    }
  }

  test("property: distributed packing equals the sequential prefix sum") {
    import spark.implicits._
    // sparse ids (non-contiguous, skewed blocks) and varied token counts,
    // including zeros — the distributed two-phase prefix sum must agree
    // with a driver-side sequential scan for every (capacity, buckets)
    val gen = Gen.listOfN(60,
      Gen.zip(Gen.choose(0L, 5000L), Gen.choose(0L, 700L)))
      .map(_.distinctBy(_._1))
    samples(gen, 4).filter(_.nonEmpty).zipWithIndex.foreach {
      case (rows, i) =>
        val cap = Seq(128L, 512L, 1L)(i % 3)
        val got = graft.ops.Packing.packChunks(
          rows.toDF("id", "n_tok"),
          "id", org.apache.spark.sql.functions.col("n_tok"), cap,
          buckets = Seq(1, 7, 64)(i % 3))
          .collect().map(r => (r.getLong(0),
            (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
        var acc = 0L
        rows.sortBy(_._1).foreach { case (id, n) =>
          val first = acc / cap
          val last = if (n > 0) (acc + n - 1) / cap else first
          assert(got(id) === ((acc, first, last)),
            s"id=$id cap=$cap rows=$rows")
          acc += n
        }
    }
  }

  private val randIntervals: Gen[List[(Long, Long, Long)]] =
    Gen.listOfN(25, Gen.zip(Gen.choose(-50L, 150L), Gen.choose(0L, 40L)))
      .map(_.zipWithIndex.map { case ((s, len), i) =>
        // mix of proper, zero-length and inverted intervals
        (i.toLong, s, if (i % 7 == 0) s - 1 else s + len)
      })

  test("property: bin range/overlap joins equal the naive quadratic join") {
    import spark.implicits._
    import graft.ops.RangeJoin
    val points = (0L until 40L).map(i => (i, i * 5 - 30)).toDF("pid", "p")
    samples(randIntervals, 5).foreach { ivs =>
      val idf = ivs.toDF("iid", "s", "e")
      for (width <- Seq(3L, 10L, 64L)) {
        val got = RangeJoin.pointInInterval(points, "pid", "p",
          idf, "iid", "s", "e", binWidth = width)
          .select("point_id", "interval_id").collect()
          .map(r => (r.getLong(0), r.getLong(1)))
        val want = for {
          (pid, p) <- (0L until 40L).map(i => (i, i * 5 - 30))
          (iid, s, e) <- ivs if p >= s && p <= e
        } yield (pid, iid)
        assert(got.length === got.toSet.size, s"dupes at width=$width")
        assert(got.toSet === want.toSet, s"width=$width ivs=$ivs")
        val gotO = RangeJoin.intervalOverlap(idf, "iid", "s", "e",
          idf, "iid", "s", "e", binWidth = width)
          .collect().map(r => (r.getLong(0), r.getLong(1)))
        val wantO = for {
          (a, as, ae) <- ivs if ae >= as
          (b, bs, be) <- ivs if be >= bs && as <= be && bs <= ae
        } yield (a, b)
        assert(gotO.length === gotO.toSet.size, s"overlap dupes w=$width")
        assert(gotO.toSet === wantO.toSet, s"width=$width ivs=$ivs")
      }
    }
  }

  test("property: line dedup equals the sequential reference") {
    import spark.implicits._
    // random multi-line docs over a tiny line alphabet so cross-doc
    // repetition actually occurs; blank lines mixed in
    val lineGen = Gen.oneOf("alpha", "beta", "gamma", "delta", "", "  ")
    val docGen = Gen.listOfN(5, lineGen).map(_.mkString("\n"))
    val corpusGen = Gen.listOfN(12, docGen)
    samples(corpusGen, 5).foreach { texts =>
      val rows = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      for (minCount <- Seq(2, 4)) {
        val got = graft.ops.TextAnalysis.removeDuplicateLines(
          rows.toDF("doc_id", "text"), "doc_id", "text", minCount)
          .collect()
          .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
            r.getString(3)))).toMap
        val counts = rows.flatMap(_._2.split("\n", -1))
          .filter(_.trim.nonEmpty).groupBy(identity).map {
            case (l, o) => l -> o.size
          }
        rows.foreach { case (id, text) =>
          val lines = text.split("\n", -1)
          val removed = lines.count(l =>
            l.trim.nonEmpty && counts(l) >= minCount)
          val kept = lines.filterNot(l =>
            l.trim.nonEmpty && counts(l) >= minCount).mkString("\n")
          assert(got(id) === ((lines.length.toLong, removed.toLong, kept)),
            s"doc=$id minCount=$minCount texts=$texts")
        }
      }
    }
  }

  test("property: deterministic shuffle position is the sorted-key rank " +
      "for any bucket count") {
    import spark.implicits._
    val idGen = Gen.listOfN(80, Gen.choose(0L, 10000L)).map(_.distinct)
    samples(idGen, 4).zipWithIndex.foreach { case (ids, i) =>
      val out = graft.ops.Splits.deterministicShuffle(
        ids.toDF("id"), "id", salt = s"s$i",
        buckets = Seq(1, 5, 64, 1000)(i % 4))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val byRank = out.sortBy(t => (t._2, t._1)).map(_._1)
      out.foreach { case (id, _, pos) =>
        assert(byRank(pos.toInt) === id, s"ids=$ids")
      }
      assert(out.map(_._3).sorted === ids.indices.map(_.toLong).toArray)
    }
  }

  test("property: funnel equals the per-user sequential greedy scan") {
    import spark.implicits._
    val steps = Seq("a", "b", "c")
    val evGen = Gen.listOfN(60, Gen.zip(Gen.choose(1L, 6L),
      Gen.choose(0L, 40L), Gen.oneOf("a", "b", "c", "x")))
    samples(evGen, 5).foreach { evs =>
      val rows = evs.map { case (u, t, k) =>
        (u, new java.sql.Timestamp(t * 1000), k)
      }
      val within = 15L // seconds; ts are second-granular above
      val got = graft.ops.Sessions.funnel(
        rows.toDF("user_id", "ts", "event_type"),
        "user_id", "ts", "event_type", steps, Some(within))
        .collect().map(r => r.getLong(0) ->
          ((r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4))))
        .toMap
      // sequential reference: greedy earliest stage anchoring
      val want = evs.groupBy(_._1).flatMap { case (u, es) =>
        val byType = steps.map(s =>
          s -> es.filter(_._3 == s).map(_._2 * 1000000L).sorted)
        val t1 = byType.head._2.headOption
        t1.map { start =>
          val ts = scala.collection.mutable.ListBuffer(start)
          var prev = Option(start)
          byType.tail.foreach { case (_, cand) =>
            prev = prev.flatMap(p =>
              cand.find(t => t > p && t <= p + within * 1000000L))
            ts += prev.getOrElse(-1L)
          }
          u -> ((ts.count(_ >= 0), ts(0), ts(1), ts(2)))
        }
      }
      assert(got === want, s"evs=$evs")
    }
  }

  test("property: cohort retention equals the sequential reference") {
    import spark.implicits._
    val week = 7L * 24 * 3600
    val evGen = Gen.listOfN(50, Gen.zip(Gen.choose(1L, 8L),
      Gen.choose(0L, 5L * week), Gen.oneOf("signup", "click")))
    samples(evGen, 4).foreach { evs =>
      val rows = evs.map { case (u, t, k) =>
        (u, new java.sql.Timestamp(t * 1000), k)
      }
      val got = graft.ops.Sessions.cohortRetention(
        rows.toDF("user_id", "ts", "event_type"),
        "user_id", "ts", "event_type", "signup", week)
        .collect().map(r => (r.getLong(0), r.getLong(1)) ->
          ((r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
      // sequential reference
      val cohort = evs.filter(_._3 == "signup").groupBy(_._1)
        .map { case (u, es) => u -> es.map(_._2 / week).min }
      val sizes = cohort.groupBy(_._2).map { case (c, m) => c -> m.size }
      val active = evs.map(e => (e._1, e._2 / week)).distinct
        .flatMap { case (u, p) =>
          cohort.get(u).filter(_ <= p).map(c => (c, p - c, u))
        }
      val want = active.groupBy(t => (t._1, t._2)).map { case (k, m) =>
        val n = m.map(_._3).distinct.size
        val sz = sizes(k._1)
        k -> ((n.toLong, sz.toLong,
          BigDecimal(n.toDouble / sz)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
      }
      assert(got === want, s"evs=$evs")
    }
  }

  test("property: bigram LM score equals the sequential reference model") {
    import spark.implicits._
    val docGen = Gen.listOfN(8,
      Gen.listOfN(6, Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" ")))
    samples(docGen, 4).foreach { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      // sequential reference: count bigrams/contexts/vocab, score docs
      val allToks = docs.map(_._2.split("\\s+").toSeq)
      val bigrams = allToks.flatMap(ts => ts.zip(ts.drop(1)))
      val cb = bigrams.groupBy(identity).view.mapValues(_.size).toMap
      val cw = bigrams.groupBy(_._1).view.mapValues(_.size).toMap
      val v = allToks.flatten.distinct.size
      def term(p: (String, String)): BigDecimal =
        BigDecimal(math.log((cb(p) + 1.0) / (cw(p._1) + v)))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      val expected = docs.map { case (id, t) =>
        val ts = t.split("\\s+").toSeq
        val ps = ts.zip(ts.drop(1))
        id -> (ps.size.toLong,
          if (ps.isEmpty) None
          else Some((ps.map(term).sum / ps.size).setScale(4,
            BigDecimal.RoundingMode.HALF_UP).toDouble))
      }.toMap
      val got = graft.ops.TextAnalysis
        .bigramLmScore(docs.toDF("doc_id", "text"), "doc_id", "text")
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), Option(r.get(2)).map(_.asInstanceOf[Double])))
        .toMap
      assert(got === expected, s"texts=$texts")
    }
  }

  test("property: winsorized values stay inside the group's clip bounds " +
    "and preserve order") {
    import spark.implicits._
    val valGen = Gen.listOfN(30, Gen.choose(0L, 10000L))
    samples(valGen, 4).foreach { vals =>
      val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, "g", v) }
        .toDF("id", "grp", "v")
      val out = graft.ops.Profiling.winsorize(df, "grp", "id", "v",
        lo = 0.1, hi = 0.9)
        .collect().map(r => (r.getLong(0), r.getLong(2), r.getDouble(3),
          r.getDouble(4), r.getDouble(5)))
      out.foreach { case (_, _, pLo, pHi, clipped) =>
        assert(clipped >= pLo - 1e-9 && clipped <= pHi + 1e-9)
      }
      // clipping is monotone: order of values is preserved (weakly)
      val byVal = out.sortBy(_._2)
      byVal.sliding(2).foreach {
        case Array(a, b) => assert(a._5 <= b._5 + 1e-9)
        case _ => ()
      }
    }
  }

  test("property: source overlap is a valid Jaccard (bounds, " +
    "self-consistency vs sequential sets)") {
    import spark.implicits._
    val docGen = Gen.listOfN(9, Gen.zip(Gen.oneOf("s1", "s2", "s3"),
      Gen.listOfN(5, Gen.oneOf("x", "y", "z", "w")).map(_.mkString(" "))))
    samples(docGen, 4).foreach { rows =>
      val gramSets: Map[String, Set[String]] = rows.groupBy(_._1)
        .view.mapValues(_.flatMap { case (_, t) =>
          val ts = t.split("\\s+").toSeq
          if (ts.size < 3) Seq(ts.mkString(" "))
          else ts.sliding(3).map(_.mkString(" ")).toSeq
        }.toSet).toMap
      val got = graft.ops.TextAnalysis
        .sourceOverlap(rows.toDF("source", "text"), "source", "text", 3)
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(4), r.getDouble(5))).toMap
      got.foreach { case ((a, b), (inter, j)) =>
        val sa = gramSets.getOrElse(a, Set.empty)
        val sb = gramSets.getOrElse(b, Set.empty)
        assert(inter === (sa & sb).size.toLong, s"pair ($a,$b)")
        val expJ = if ((sa | sb).isEmpty) 0.0
          else (sa & sb).size.toDouble / (sa | sb).size
        assert(j === expJ && j >= 0.0 && j <= 1.0, s"pair ($a,$b)")
      }
    }
  }

  test("property: curriculum order equals the sequential " +
    "(band, hash, id) sort") {
    import spark.implicits._
    val valGen = Gen.listOfN(40, Gen.choose(1L, 2000L))
    def md5key(id: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"graft:$id".getBytes("UTF-8"))
      java.lang.Long.parseLong(
        d.map("%02x".format(_)).mkString.take(13), 16)
    }
    samples(valGen, 4).foreach { vals =>
      val rows = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }
      val sorted = vals.sorted.map(_.toDouble)
      val n = sorted.size
      def pct(p: Double): Double = {
        val idx = p * (n - 1)
        val lo = math.floor(idx).toInt
        val hi = math.ceil(idx).toInt
        sorted(lo) + (idx - lo) * (sorted(hi) - sorted(lo))
      }
      val bounds = Seq(0.25, 0.5, 0.75).map(pct)
      val expected = rows.map { case (id, v) =>
        (bounds.count(v.toDouble > _), md5key(id), id)
      }.sorted.zipWithIndex
        .map { case ((band, _, id), pos) => id -> (band, pos.toLong) }
        .toMap
      val got = graft.ops.Splits.curriculumOrder(
          rows.toDF("doc_id", "n_chars"), "doc_id", "n_chars", bands = 4)
        .collect().map(r => r.getLong(0) ->
          (r.getInt(2), r.getLong(3))).toMap
      assert(got === expected, s"vals=$vals")
    }
  }

  test("property: corrupted bundle JSON/XML never fails ingestion — bad " +
    "documents drop, the job completes") {
    import spark.implicits._
    val goodJson =
      """{"resourceType":"Bundle","type":"collection","entry":[
        {"resource":{"resourceType":"Patient","id":"pX","gender":"male"}}]}"""
    val goodXml =
      """<Bundle xmlns="http://hl7.org/fhir"><entry><resource>""" +
        """<Patient><id value="pX"/><gender value="male"/></Patient>""" +
        """</resource></entry></Bundle>"""
    val corruptions: Gen[String => String] = Gen.oneOf(
      Gen.choose(0, goodJson.length - 1).map(i =>
        (s: String) => s.take(math.min(i, s.length))), // truncate
      Gen.zip(Gen.choose(0, goodJson.length - 1),
        Gen.oneOf('}', '<', '"', ' ', 'q')).map { case (i, c) =>
        (s: String) =>
          if (s.isEmpty) s
          else s.updated(math.min(i, s.length - 1), c) }, // flip one char
      Gen.const((s: String) => s + s),                    // duplicate tail
      Gen.const((s: String) => s.reverse))
    samples(corruptions, 30).foreach { corrupt =>
      val rows = Seq(corrupt(goodJson), goodJson).toDF("bundle_json")
      // must not throw — malformed rows parse to null and drop
      val n = graft.fhir.Bundles.extractEntry(spark, rows, "Patient")
        .count()
      assert(n >= 1) // the intact bundle always survives
      val xrows = Seq(corrupt(goodXml), goodXml).toDF("bundle_xml")
      val xn = graft.fhir.Bundles.extractEntry(spark,
        graft.fhir.Bundles.fromXml(xrows, "bundle_xml"), "Patient").count()
      assert(xn >= 1)
    }
  }

  test("property: scd2 intervals tile each key's observed span and " +
    "compress runs exactly") {
    import spark.implicits._
    val evGen = Gen.listOfN(30, Gen.zip(Gen.choose(1L, 3L),
      Gen.choose(0L, 50L), Gen.oneOf("a", "b", "c")))
    samples(evGen, 5).filter(_.nonEmpty).foreach { raw =>
      // unique (key, ts) so the (ts, id) order is unambiguous
      val ev = raw.distinctBy(e => (e._1, e._2)).zipWithIndex.map {
        case ((u, t, a), i) =>
          (i.toLong, new java.sql.Timestamp(86400000L + t * 60000L), u, a)
      }
      val out = graft.ops.Sessions.scd2(
        ev.toDF("event_id", "ts", "user_id", "event_type"),
        "user_id", "ts", "event_id", "event_type")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          if (r.isNullAt(3)) Long.MaxValue else r.getLong(3),
          r.getInt(4))).sortBy(x => (x._1, x._5))
      // sequential reference: run-length encode per key in time order
      val ref = ev.groupBy(_._3).map { case (u, es) =>
        val sorted = es.sortBy(e => (e._2.getTime, e._1)).map(_._4)
        u -> sorted.foldLeft(List.empty[String]) {
          case (acc, a) if acc.headOption.contains(a) => acc
          case (acc, a) => a :: acc
        }.reverse
      }
      ref.foreach { case (u, runs) =>
        val rows = out.filter(_._1 == u)
        assert(rows.map(_._2).toSeq === runs, s"user $u")
        // tiling: valid_to(k) == valid_from(k+1)
        rows.sliding(2).foreach {
          case Array(x, y) => assert(x._4 === y._3, s"user $u gap")
          case _ =>
        }
        assert(rows.last._4 === Long.MaxValue) // open run
      }
    }
  }

  test("property: interval islands equal the sequential sweep-line") {
    import spark.implicits._
    val gen = Gen.listOfN(25, Gen.zip(Gen.choose(1L, 3L),
      Gen.choose(0L, 200L)))
    val dur = 30L * 1000000L
    samples(gen, 5).filter(_.nonEmpty).foreach { raw =>
      val ev = raw.distinct.zipWithIndex.map { case ((u, t), i) =>
        (i.toLong, new java.sql.Timestamp(86400000L + t * 1000L), u)
      }
      val got = graft.ops.Sessions.intervalIslands(
        ev.toDF("event_id", "ts", "user_id"),
        "user_id", "ts", "event_id", durationUs = dur)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
        .toMap
      val want = ev.groupBy(_._3).map { case (u, es) =>
        val iv = es.map(e => (e._2.getTime * 1000L,
          e._2.getTime * 1000L + dur)).sortBy(_._1)
        val merged = iv.tail.foldLeft(List(iv.head)) {
          case ((s0, e0) :: rest, (s, e)) if s <= e0 =>
            (s0, math.max(e0, e)) :: rest
          case (acc, next) => next :: acc
        }
        u -> (merged.size.toLong, merged.map(m => m._2 - m._1).sum)
      }
      assert(got === want)
    }
  }

  test("property: fixed-point pagerank equals the sequential model on " +
    "random graphs") {
    import spark.implicits._
    val S = 1000000000000L
    val gen = Gen.listOfN(14, Gen.zip(Gen.choose(0L, 7L),
      Gen.choose(0L, 7L))).map(_.filter(e => e._1 != e._2).distinct)
    samples(gen, 4).filter(_.nonEmpty).foreach { und =>
      val edges = (und ++ und.map(_.swap)).distinct
      val got = graft.ops.Graphs.pageRankFixedPoint(spark,
          edges.toDF("src", "dst"), iterations = 2)
        .select("node", "rank").as[(Long, Long)].collect().toMap
      // sequential reference with identical integral arithmetic
      val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      val n = deg.size.toLong
      val base = (15 * S) / (100 * n)
      var rank = deg.keys.map(v => v -> S / n).toMap
      for (_ <- 1 to 2) {
        val acc = edges.groupBy(_._2).view.mapValues(
          _.map { case (s, _) => rank(s) / deg(s) }.sum).toMap
        rank = deg.keys.map(v =>
          v -> (base + 85 * acc.getOrElse(v, 0L) / 100)).toMap
      }
      assert(got === rank)
    }
  }

  test("property: z-value interleave preserves per-dimension bit order") {
    import spark.implicits._
    val pairGen = Gen.listOfN(40,
      Gen.zip(Gen.choose(0L, 255L), Gen.choose(0L, 255L)))
    samples(pairGen, 3).foreach { pairs =>
      val out = pairs.toDF("a", "b")
        .select(org.apache.spark.sql.functions.col("a"),
          org.apache.spark.sql.functions.col("b"),
          graft.ops.Layout.interleaveBits(Seq(
            org.apache.spark.sql.functions.col("a"),
            org.apache.spark.sql.functions.col("b")), 8).as("z"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      out.foreach { case (a, b, z) =>
        // de-interleave recovers both inputs
        def unpick(z: Long, off: Int): Long =
          (0 until 8).map(bit => ((z >> (2 * bit + off)) & 1L) << bit).sum
        assert(unpick(z, 0) === a && unpick(z, 1) === b,
          s"a=$a b=$b z=$z")
      }
    }
  }

  private val shortStrings: Gen[String] =
    Gen.choose(0, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))

  test("property: deletion-variant superset — every ed<=1 pair shares " +
      "a variant, every variant is within ed 1") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    def variants(s: String): Set[String] = {
      import org.apache.spark.unsafe.types.UTF8String
      val arr = graft.functions.GraftHashImpl.deletionVariants(
        UTF8String.fromString(s))
      (0 until arr.numElements())
        .map(i => arr.getUTF8String(i).toString).toSet
    }
    // small alphabet + short strings → dense ed<=1 pair coverage
    val ss = samples(shortStrings, 120).distinct
    for (a <- ss) {
      val va = variants(a)
      assert(va.contains(a))
      assert(va.forall(v => lev(a, v) <= 1), s"a=$a variants=$va")
      for (b <- ss if lev(a, b) <= 1)
        assert(va.intersect(variants(b)).nonEmpty, s"a=$a b=$b")
    }
  }
}
