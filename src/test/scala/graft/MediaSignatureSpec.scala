package graft

import org.apache.spark.sql.functions._

/** Differential pin for the oracle-visible media-dedup split (q107/q108/
  * q113): the signature tables those queries construct with Spark SQL
  * expressions (md5 → conv → xor masks) must equal an INDEPENDENT JVM
  * reimplementation built on [[graft.functions.GraftHashImpl
  * .portableHash60]] (MessageDigest md5), and the production relational
  * tail must return exactly the pairs a driver-side brute-force over
  * those signatures predicts — both the planted near-dups at Hamming
  * k <= maxHamming and the k > maxHamming rejections. If either the
  * column construction or the banding tail drifts from the DuckDB
  * oracle's definition, this fails without needing DuckDB. */
class MediaSignatureSpec extends SparkSuite {

  private def base(s: String): Long =
    graft.functions.GraftHashImpl.portableHash60(s)

  /** The q107/q113 signature family, reimplemented driver-side. */
  private def imgSig(id: Long): Long =
    if (id % 10 == 0 && id > 0)
      base(s"img:${id - 1}") ^ ((1L << ((id / 10) % 14)) - 1)
    else base(s"img:$id")

  /** Two-cover 16-bit chunks (the production banding). */
  private def chunks(sig: Long): Seq[(Int, Long)] = {
    val rot = (sig >>> 8) | (sig << 56)
    (0 until 4).map(c => c -> ((sig >>> (16 * c)) & 0xFFFFL)) ++
      (0 until 4).map(c => (c + 4) -> ((rot >>> (16 * c)) & 0xFFFFL))
  }

  private def expectedPairs(ids: Seq[Long], sig: Long => Long,
      maxHamming: Int): Set[(Long, Long, Int)] = {
    val sigs = ids.map(id => id -> sig(id)).toMap
    val sorted = ids.sorted
    (for {
      i <- sorted.indices.iterator
      j <- (i + 1) until sorted.length
      a = sorted(i); b = sorted(j)
      h = java.lang.Long.bitCount(sigs(a) ^ sigs(b))
      if h <= maxHamming &&
        chunks(sigs(a)).toSet.intersect(chunks(sigs(b)).toSet).nonEmpty
    } yield (a, b, h)).toSet
  }

  private lazy val ids: Seq[Long] = spark.read
    .parquet(s"$sfDir/documents.parquet")
    .select("doc_id").collect().map(_.getLong(0)).toSeq

  test("q107: Spark-constructed signatures + banding tail equal the " +
      "independent portableHash60 brute force") {
    val got = SparkEntry.queries("q107_image_phash_dedup")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = expectedPairs(ids, imgSig, maxHamming = 10)
    assert(got === want)
    // the fixture actually plants both accept and reject cases
    assert(want.nonEmpty)
    val rejected = ids.filter(id => id % 10 == 0 && id > 0)
      .count(id => ((id / 10) % 14) > 10)
    assert(rejected > 0, "fixture must plant pairs above maxHamming too")
  }

  test("q113: the incremental stream finds exactly the cross-parity " +
      "subset of the q107 brute force") {
    val got = SparkEntry.queries("q113_stream_media_dedup")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // index side (id_a) is the even/first batch, probe side odd
    val want = expectedPairs(ids, imgSig, maxHamming = 10)
      .flatMap { case (a, b, h) =>
        if (a % 2 == 0 && b % 2 == 1) Some((a, b, h))
        else if (b % 2 == 0 && a % 2 == 1) Some((b, a, h))
        else None
      }
    assert(got === want)
    assert(want.nonEmpty)
  }
}
