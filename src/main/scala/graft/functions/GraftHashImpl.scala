package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass hash kernels behind the graft native expressions.
  *
  * Called from both interpreted `eval` and generated Java (the expressions'
  * `doGenCode` emits a static call — Scala's object static forwarders make
  * `graft.functions.GraftHashImpl.m(...)` valid generated code), so each
  * row costs exactly one virtual-free call with no boxing beyond ArrayData.
  *
  * Replaces the interpreted higher-order-function pipelines in
  * graft.ops.Dedup: the HOF form re-traverses the shingle array once per
  * hash function (16×) / once per signature bit (64×), all interpreted;
  * these kernels hash each token exactly once and derive everything else
  * arithmetically (Kirsch-Mitzenmacher double hashing for the k minhash
  * functions), which is what you want running over 100 TB of documents.
  */
object GraftHashImpl {

  private final val TokenSeed = 42L
  private final val Prime = 0x9E3779B97F4A7C15L // golden-ratio odd constant

  /** Rolling polynomial hashes of the `n`-token shingles of `tokens`.
    * Each token is xxhash64'd once; shingle j combines token hashes
    * j..j+n-1. Fewer than n tokens (including zero) → one shingle over
    * whatever is present, mirroring Dedup.wordShingles. */
  def shingleHashArray(tokens: ArrayData, n: Int): Array[Long] = {
    val cnt = tokens.numElements()
    val tok = new Array[Long](cnt)
    var i = 0
    while (i < cnt) {
      val s = tokens.getUTF8String(i)
      tok(i) = if (s == null) 0L else XXH64.hashUTF8String(s, TokenSeed)
      i += 1
    }
    val m = if (cnt < n) 1 else cnt - n + 1
    val out = new Array[Long](m)
    var j = 0
    while (j < m) {
      var h = Prime
      var t = j
      val end = if (cnt < n) cnt else j + n
      while (t < end) { h = h * Prime + tok(t); t += 1 }
      out(j) = h
      j += 1
    }
    out
  }

  /** Distinct shingle hashes as ArrayData (for exact-Jaccard verify over
    * longs instead of strings). */
  def shingleHashes(tokens: ArrayData, n: Int): ArrayData = {
    val a = shingleHashArray(tokens, n)
    java.util.Arrays.sort(a)
    var uniq = 0
    var i = 0
    while (i < a.length) {
      if (i == 0 || a(i) != a(i - 1)) { a(uniq) = a(i); uniq += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(a, uniq))
  }

  /** k-element minhash signature over the n-token shingles: one pass,
    * two derived hashes per shingle, h_i = h1 + i*h2 (odd h2). */
  def shingleMinHash(tokens: ArrayData, n: Int, k: Int): ArrayData = {
    val sh = shingleHashArray(tokens, n)
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var j = 0
    while (j < sh.length) {
      val h1 = XXH64.hashLong(sh(j), 0L)
      val h2 = XXH64.hashLong(sh(j), 1L) | 1L
      var i = 0
      var h = h1
      while (i < k) {
        if (h < mins(i)) mins(i) = h
        h += h2
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  /** The SimHash vote stage: per-bit majority over the given (already
    * finalized) hash values. Exposed separately so the vote semantics can be
    * differential-tested against the interpreted HOF formulation
    * (Dedup.simhashFromHashes) on identical inputs. */
  def simHashVotes(hashes: Array[Long]): Long = {
    val votes = new Array[Int](64)
    var j = 0
    while (j < hashes.length) {
      val h = hashes(j)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      j += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** 64-bit SimHash over the n-token shingles: per-bit majority vote of the
    * xxhash64-finalized shingle hashes, one pass. */
  def simHash64(tokens: ArrayData, n: Int): Long = {
    val sh = shingleHashArray(tokens, n)
    var j = 0
    while (j < sh.length) {
      sh(j) = XXH64.hashLong(sh(j), 0L)
      j += 1
    }
    simHashVotes(sh)
  }

  /** Band bucket hashes: the k-element minhash signature split into
    * `bands` contiguous bands, each band folded to one 64-bit bucket hash.
    * Doing this inside the kernel (instead of slicing the signature array
    * with per-band expressions) evaluates the signature exactly once. */
  def shingleMinHashBands(tokens: ArrayData, n: Int, k: Int,
      bands: Int): ArrayData =
    foldBands(shingleMinHash(tokens, n, k), k, bands)

  private def foldBands(sig: ArrayData, k: Int, bands: Int): ArrayData = {
    val mins = sig.asInstanceOf[GenericArrayData]
    val rowsPerBand = k / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 1125899906842597L
      var i = b * rowsPerBand
      val end = i + rowsPerBand
      while (i < end) { h = h * Prime + mins.getLong(i); i += 1 }
      out(b) = XXH64.hashLong(h, b.toLong)
      b += 1
    }
    new GenericArrayData(out)
  }

  /** All index-ordered pairs (i < j) of a long array as rows of
    * (id_a, id_b) — the compiled kernel behind [[IndexPairs]]. Null
    * elements cannot occur in its inputs (bounded_collect_set never
    * emits them). */
  def indexPairsL(a: ArrayData): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val n = a.numElements()
    val out = new Array[Any](n * (n - 1) / 2)
    var k = 0
    var i = 0
    while (i < n) {
      val x = a.getLong(i)
      var j = i + 1
      while (j < n) {
        out(k) = org.apache.spark.sql.catalyst.InternalRow(x, a.getLong(j))
        k += 1
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  private def hasNullElement(a: ArrayData): Boolean = {
    val n = a.numElements()
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return true
      i += 1
    }
    false
  }

  /** Random-hyperplane LSH signature: bit p of the result is the sign of
    * the projection of `vec` onto a deterministic pseudo-random ±1
    * hyperplane (sign derived by hashing (p, dim-index)). One pass per
    * plane over the raw float/double vector — no per-element lambdas.
    * A vector containing null elements yields a null signature (the
    * pre-native HOF formulation's semantics: null propagates, it does not
    * silently read as 0). */
  def hyperplaneF(vec: ArrayData, numPlanes: Int): java.lang.Long = {
    if (hasNullElement(vec)) return null
    val n = vec.numElements()
    var sig = 0L
    var p = 0
    while (p < numPlanes) {
      var s = 0.0
      var i = 0
      while (i < n) {
        val sign = if ((XXH64.hashLong(p.toLong * 1000003L + i, 7L) & 1L) == 1L) 1.0 else -1.0
        s += vec.getFloat(i).toDouble * sign
        i += 1
      }
      if (s > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  /** Hyperplane sign signature of a double vector (production hash family). */
  def hyperplaneD(vec: ArrayData, numPlanes: Int): java.lang.Long = {
    if (hasNullElement(vec)) return null
    val n = vec.numElements()
    var sig = 0L
    var p = 0
    while (p < numPlanes) {
      var s = 0.0
      var i = 0
      while (i < n) {
        val sign = if ((XXH64.hashLong(p.toLong * 1000003L + i, 7L) & 1L) == 1L) 1.0 else -1.0
        s += vec.getDouble(i) * sign
        i += 1
      }
      if (s > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  /** Dot product of two float vectors, accumulated in double. Null when the
    * lengths differ or either vector has a null element — a corrupt/short
    * embedding must surface as a null score, not a plausible partial sum
    * (the semantics of the zip_with/aggregate formulation this replaced). */
  def dotF(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements() || hasNullElement(a) || hasNullElement(b)) {
      return null
    }
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    s
  }

  /** Dot product of two double vectors; null semantics as [[dotF]]. */
  def dotD(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements() || hasNullElement(a) || hasNullElement(b)) {
      return null
    }
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  // ---- Engine-portable (md5-derived) hash mode ----------------------------
  //
  // The production kernels above hash with xxhash64 — fast, but no external
  // engine reproduces Spark's seeded xxhash64, so queries built on them could
  // only ever get a rows-only correctness check. Portable mode derives every
  // hash from md5, which every engine computes identically: the value is the
  // first 15 hex nibbles (60 bits) of md5(s), which DuckDB reproduces
  // verbatim as CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT). 60 bits
  // keeps the value non-negative in a signed 64-bit long, so min/ordering
  // can never diverge between signed and unsigned integer engines. The
  // banding / vote / projection structure is SHARED with the production
  // kernels — only the hash primitive changes — so a green DuckDB oracle on
  // the portable path pins the same code the xxhash64 path runs.

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(s) as a non-negative long (DuckDB:
    * `CAST(('0x' || substr(md5(s),1,15)) AS BIGINT)`). */
  def portableHash60(s: String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xFFL); i += 1 }
    v >>> 4
  }

  /** The n-token shingles as STRINGS (tokens joined with one space) — the
    * portable kernels hash shingle text directly, because that is what an
    * external engine can rebuild (`tk[i] || ' ' || tk[i+1] ...`); the
    * production kernels hash token-wise and combine arithmetically, which
    * nothing else reproduces. Same shingle windows as shingleHashArray:
    * fewer than n tokens (including zero) → one shingle over whatever is
    * present. */
  private def portableShingles(tokens: ArrayData, n: Int): Array[String] = {
    val cnt = tokens.numElements()
    val tok = new Array[String](cnt)
    var i = 0
    while (i < cnt) {
      val s = tokens.getUTF8String(i)
      tok(i) = if (s == null) "" else s.toString
      i += 1
    }
    if (cnt < n) Array(tok.mkString(" "))
    else {
      val out = new Array[String](cnt - n + 1)
      var j = 0
      while (j < out.length) {
        val sb = new java.lang.StringBuilder
        var t = j
        while (t < j + n) {
          if (t > j) sb.append(' ')
          sb.append(tok(t))
          t += 1
        }
        out(j) = sb.toString
        j += 1
      }
      out
    }
  }

  /** Portable k-element minhash signature with ONE md5 per shingle: the
    * digest's first two 32-bit halves seed a Kirsch-Mitzenmacher family
    * h_i = (h1 + i·h2) mod 2^32 (h2 forced odd), signature element i = min
    * over shingles — the same double-hashing structure as the production
    * kernel, in arithmetic an external engine reproduces exactly:
    *   h1 = CAST(('0x' || substr(md5(s),1,8)) AS BIGINT)
    *   h2 = CAST(('0x' || substr(md5(s),9,8)) AS BIGINT) | 1
    *   h_i = (h1 + i*h2) % 4294967296
    * Every intermediate stays below 2^36, so engines whose 64-bit integer
    * arithmetic THROWS on overflow (DuckDB) evaluate it verbatim; values
    * are non-negative, so signed/unsigned min order cannot diverge. */
  def portableShingleMinHash(tokens: ArrayData, n: Int, k: Int): ArrayData = {
    val sh = portableShingles(tokens, n)
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val md = md5Local.get()
    var j = 0
    while (j < sh.length) {
      md.reset()
      val d = md.digest(
        sh(j).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var h1 = 0L
      var h2 = 0L
      var b = 0
      while (b < 4) { h1 = (h1 << 8) | (d(b) & 0xFFL); b += 1 }
      while (b < 8) { h2 = (h2 << 8) | (d(b) & 0xFFL); b += 1 }
      h2 |= 1L
      var i = 0
      while (i < k) {
        val h = (h1 + i * h2) & 0xFFFFFFFFL // mod 2^32
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  /** Portable band bucket hashes: portable minhash signature, then the SAME
    * band fold as the production kernel. The fold itself may stay native —
    * bucket keys only ever feed equality joins, and xxhash64-folding equal
    * band slices yields equal buckets — so an external oracle joins on the
    * raw signature slices and still reproduces the bucket partition. */
  def portableMinHashBands(tokens: ArrayData, n: Int, k: Int,
      bands: Int): ArrayData =
    foldBands(portableShingleMinHash(tokens, n, k), k, bands)

  /** Distinct sorted md5-60 shingle hashes — the portable analog of
    * [[shingleHashes]]: an external engine rebuilds the identical longs
    * from the shingle text (`CAST(('0x' || substr(md5(sh),1,15)) AS
    * BIGINT)`). */
  def portableShingleHashes(tokens: ArrayData, n: Int): ArrayData = {
    val sh = portableShingles(tokens, n)
    val a = new Array[Long](sh.length)
    var j = 0
    while (j < sh.length) { a(j) = portableHash60(sh(j)); j += 1 }
    java.util.Arrays.sort(a)
    var uniq = 0
    var i = 0
    while (i < a.length) {
      if (i == 0 || a(i) != a(i - 1)) { a(uniq) = a(i); uniq += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(a, uniq))
  }

  /** Portable 64-bit SimHash: per-bit majority vote ([[simHashVotes]], the
    * exact production vote stage) over md5_60 shingle hashes. Bits 60-63 are
    * always 0 (60-bit hashes vote them strictly negative). */
  def portableSimHash64(tokens: ArrayData, n: Int): Long = {
    val sh = portableShingles(tokens, n)
    val hs = new Array[Long](sh.length)
    var j = 0
    while (j < sh.length) { hs(j) = portableHash60(sh(j)); j += 1 }
    simHashVotes(hs)
  }

  /** Plane-sign cache for the portable hyperplane signature: sign(p, i) =
    * md5_60("p:i") & 1, memoized (the table is tiny — planes × dim — and
    * identical for every row). */
  private val planeSignCache =
    new java.util.concurrent.ConcurrentHashMap[java.lang.Long, java.lang.Boolean]

  private def portablePlaneSign(p: Int, i: Int): Boolean = {
    val key = java.lang.Long.valueOf((p.toLong << 32) | i.toLong)
    var v = planeSignCache.get(key)
    if (v == null) {
      v = java.lang.Boolean.valueOf(
        (portableHash60(p.toString + ":" + i) & 1L) == 1L)
      planeSignCache.put(key, v)
    }
    v.booleanValue()
  }

  /** Element quantization shared with the exact cosine oracle variant:
    * round(x * 10000) with HALF_UP on the shortest-decimal rendering —
    * bit-identical to both Spark's `round` and DuckDB's `round` (away from
    * zero on exact .5 ties, nearest otherwise). */
  private def quant10k(x: Double): Long =
    java.math.BigDecimal.valueOf(x * 10000.0)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue()

  private def portableHyperplaneSig(q: Array[Long], numPlanes: Int): Long = {
    var sig = 0L
    var p = 0
    while (p < numPlanes) {
      var s = 0L
      var i = 0
      while (i < q.length) {
        s += (if (portablePlaneSign(p, i)) q(i) else -q(i))
        i += 1
      }
      if (s > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }

  /** Portable random-hyperplane signature: the vector is quantized to
    * integers (×10000, exact in long arithmetic), so each projection is an
    * exact integer sum — no float reduction-order sensitivity — and the
    * sign bits are reproducible on any engine. Null semantics as the
    * production kernel (null element → null signature). */
  def portableHyperplaneF(vec: ArrayData, numPlanes: Int): java.lang.Long = {
    if (hasNullElement(vec)) return null
    val n = vec.numElements()
    val q = new Array[Long](n)
    var i = 0
    while (i < n) { q(i) = quant10k(vec.getFloat(i).toDouble); i += 1 }
    portableHyperplaneSig(q, numPlanes)
  }

  /** Portable (md5-derived plane signs) hyperplane signature of a double vector. */
  def portableHyperplaneD(vec: ArrayData, numPlanes: Int): java.lang.Long = {
    if (hasNullElement(vec)) return null
    val n = vec.numElements()
    val q = new Array[Long](n)
    var i = 0
    while (i < n) { q(i) = quant10k(vec.getDouble(i)); i += 1 }
    portableHyperplaneSig(q, numPlanes)
  }

  // ---- Multi-table (OR-construction) hyperplane LSH -----------------------

  /** `numTables` independent hyperplane bucket hashes in one pass — the
    * OR-construction that makes sign-LSH usable for low-similarity
    * thresholds: a pair colliding in ANY table becomes a candidate, so
    * per-pair recall is 1-(1-p^bits)^tables (p = 1 - θ/π). Table t uses
    * global planes [t·bits, (t+1)·bits); its bits-wide signature is folded
    * with the table index into one 64-bit bucket value (equality-preserving,
    * like the minhash band fold). Null vector elements → null (whole row
    * drops out of bucketing rather than bucketing as zero). */
  def hyperplaneBandsF(vec: ArrayData, bits: Int, numTables: Int): ArrayData = {
    if (hasNullElement(vec)) return null
    val n = vec.numElements()
    val v = new Array[Double](n)
    var i = 0
    while (i < n) { v(i) = vec.getFloat(i).toDouble; i += 1 }
    hyperplaneBandsImpl(v, bits, numTables)
  }

  /** Multi-table hyperplane band hashes of a double vector. */
  def hyperplaneBandsD(vec: ArrayData, bits: Int, numTables: Int): ArrayData = {
    if (hasNullElement(vec)) return null
    val n = vec.numElements()
    val v = new Array[Double](n)
    var i = 0
    while (i < n) { v(i) = vec.getDouble(i); i += 1 }
    hyperplaneBandsImpl(v, bits, numTables)
  }

  private def hyperplaneBandsImpl(v: Array[Double], bits: Int,
      numTables: Int): ArrayData = {
    val out = new Array[Long](numTables)
    var t = 0
    while (t < numTables) {
      var sig = 0L
      var b = 0
      while (b < bits) {
        val p = t * bits + b
        var s = 0.0
        var i = 0
        while (i < v.length) {
          val sign =
            if ((XXH64.hashLong(p.toLong * 1000003L + i, 7L) & 1L) == 1L) 1.0
            else -1.0
          s += v(i) * sign
          i += 1
        }
        if (s > 0) sig |= (1L << b)
        b += 1
      }
      out(t) = XXH64.hashLong(sig, t.toLong)
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Deletion neighborhood of a string: the string itself plus every
    * single-code-point deletion, distinct, insertion-ordered. The
    * blocking key set of the edit-distance-1 join family (FastSS):
    * ed(a, b) <= 1 implies the neighborhoods intersect. Code-point
    * deletions (not UTF-16 units, not bytes) so the guarantee lines up
    * with `levenshtein`'s code-point edit distance. */
  def deletionVariants(s: UTF8String): ArrayData = {
    val cps = s.toString.codePoints().toArray
    val out = new java.util.LinkedHashSet[UTF8String]
    out.add(s)
    var i = 0
    while (i < cps.length) {
      val sb = new java.lang.StringBuilder(cps.length)
      var j = 0
      while (j < cps.length) {
        if (j != i) sb.appendCodePoint(cps(j))
        j += 1
      }
      out.add(UTF8String.fromString(sb.toString))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}
