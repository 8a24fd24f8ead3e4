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
      bands: Int): ArrayData = {
    val mins = shingleMinHash(tokens, n, k).asInstanceOf[GenericArrayData]
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
}
