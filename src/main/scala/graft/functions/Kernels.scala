package graft.functions

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Tight JVM kernels behind the custom Catalyst expressions in
  * [[expressions]]. A standalone Scala object compiles to a class with
  * static forwarders, so generated (Janino) code can call
  * `graft.functions.Kernels.dot(...)` directly — one static call per
  * row keeps the surrounding whole-stage-codegen span intact while the
  * per-element loop runs as plain JVM code instead of an interpreted
  * Catalyst higher-order-function tree (~100× less per-element
  * overhead at sf0.1, measured).
  */
object Kernels {

  /** Sequential-order double dot product of two numeric arrays.
    * Null on length mismatch or any null element — matching the
    * `aggregate(zip_with(...))` formulation it replaces (zip_with pads
    * with null, null poisons the sum).
    */
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** THE tokenization every word-gram kernel shares — lowercase, split
    * on ' ' with empty tokens (incl. trailing) kept, ≡ `split(lower(s),
    * " ", -1)`. One definition on purpose: [[wordShingles]],
    * [[wordNgrams]] and [[sharesShingle]] must never drift, because
    * the decontamination probe's oracle parity rests on its grams
    * being exactly the shingle builder's grams (r8 review).
    */
  private def splitLowerTokens(text: UTF8String): java.util.ArrayList[String] = {
    val s = text.toLowerCase.toString
    val toks = new java.util.ArrayList[String]()
    var start = 0
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == ' ') { toks.add(s.substring(start, i)); start = i + 1 }
      i += 1
    }
    toks.add(s.substring(start))
    toks
  }

  /** The `j`-th space-joined `n`-gram of `toks`, built into `sb`. */
  private def gramAt(sb: java.lang.StringBuilder,
                     toks: java.util.ArrayList[String], j: Int, n: Int): String = {
    sb.setLength(0)
    var k = 0
    while (k < n) {
      if (k > 0) sb.append(' ')
      sb.append(toks.get(j + k))
      k += 1
    }
    sb.toString
  }

  /** Distinct word n-gram shingles of `text`, reproducing exactly
    * `array_distinct(transform(..., concat_ws(" ", tok[i..i+n-1])))`
    * over `split(lower(text), " ")` (empty tokens kept, first-seen
    * order, empty array when fewer than n tokens).
    */
  def wordShingles(text: UTF8String, n: Int): ArrayData = {
    val toks = splitLowerTokens(text)
    val m = toks.size
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]()
    val sb = new java.lang.StringBuilder(64)
    var j = 0
    while (j <= m - n) {
      seen.add(gramAt(sb, toks, j, n))
      j += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = UTF8String.fromString(it.next()); o += 1 }
    new GenericArrayData(out)
  }

  /** Does ANY word `n`-gram of `text` sit in `set`? The per-row,
    * early-exit form of the decontamination probe: same tokenization
    * and gram builder as [[wordShingles]], but nothing is collected —
    * each gram is tested as it is built and the first hit returns.
    * Turns "flag docs sharing a benchmark shingle" into a scan-local
    * predicate: no explode, no shuffle, no aggregate, no join.
    */
  def sharesShingle(text: UTF8String, n: Int, set: java.util.HashSet[String]): Boolean = {
    if (set.isEmpty) return false
    val toks = splitLowerTokens(text)
    val m = toks.size
    if (m < n) return false
    val sb = new java.lang.StringBuilder(64)
    var j = 0
    while (j <= m - n) {
      if (set.contains(gramAt(sb, toks, j, n))) return true
      j += 1
    }
    false
  }

  /** ALL word n-grams of `text` in order, repeats kept — the raw-count
    * twin of [[wordShingles]] (which emits per-doc DISTINCT grams for
    * dedup). Same tokenization; empty array when fewer than n tokens.
    */
  def wordNgrams(text: UTF8String, n: Int): ArrayData = {
    val toks = splitLowerTokens(text)
    val m = toks.size
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m - n + 1)
    val sb = new java.lang.StringBuilder(64)
    var j = 0
    while (j <= m - n) {
      out(j) = UTF8String.fromString(gramAt(sb, toks, j, n))
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Per-document term frequencies: (token, count) pairs in first-seen
    * order over `split(lower(text), " ")` with empty tokens kept. Lets
    * a TF consumer skip the corpus-wide `groupBy(doc, token)` shuffle —
    * the counting happens inside the row.
    */
  def tokenCounts(text: UTF8String): ArrayData = {
    val s = text.toLowerCase.toString
    val counts = new java.util.LinkedHashMap[String, Long]()
    var start = 0
    var i = 0
    while (i <= s.length) {
      if (i == s.length || s.charAt(i) == ' ') {
        val tok = s.substring(start, i)
        counts.put(tok, counts.getOrDefault(tok, 0L) + 1L)
        start = i + 1
      }
      i += 1
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var o = 0
    while (it.hasNext) {
      val e = it.next()
      out(o) = org.apache.spark.sql.catalyst.InternalRow(
        UTF8String.fromString(e.getKey), e.getValue)
      o += 1
    }
    new GenericArrayData(out)
  }

  /** Normalized text: lowercase, trim spaces, collapse space runs, and
    * drop each token equal to its predecessor — one pass over the
    * string, reproducing exactly
    * `array_join(filter(split(regexp_replace(trim(lower(text)), " +", " "), " "),
    *   (t, i) => i === 0 || t =!= element_at(toks, i)), " ")`.
    * The HOF form re-evaluated the whole trim/regex/split subtree per
    * element inside the interpreted lambda (O(tokens²) per doc); this
    * kernel is O(chars).
    */
  /** zlib-deflated byte length of the UTF-8 text (level 6, default
    * strategy) — the numerator of the compression-ratio quality signal
    * (Gopher/FineWeb-style redundancy gates: boilerplate and template
    * spam deflate far better than natural prose). One Deflater per
    * call; for a ~KB document the setup cost is dwarfed by the deflate
    * pass itself, and the kernel stays allocation-bounded (4 KB chunk
    * buffer) regardless of document size.
    */
  def deflateLen(text: UTF8String): Long = {
    val bytes = text.getBytes
    val d = new java.util.zip.Deflater(6)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](4096)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  def normalizeText(text: UTF8String): UTF8String = {
    val s = text.toLowerCase.toString
    val n = s.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    while (i < n && s.charAt(i) == ' ') i += 1
    // previous token bounds in s (the predecessor in the collapsed token
    // array — updated for every token, emitted or not, matching filter's
    // compare-to-toks[i-1] semantics)
    var prevStart = -1
    var prevEnd = -1
    var first = true
    while (i < n) {
      var j = i
      while (j < n && s.charAt(j) != ' ') j += 1
      val dup = prevStart >= 0 && (j - i == prevEnd - prevStart) &&
        s.regionMatches(i, s, prevStart, j - i)
      if (!dup) {
        if (!first) sb.append(' ')
        sb.append(s, i, j)
        first = false
      }
      prevStart = i
      prevEnd = j
      i = j
      while (i < n && s.charAt(i) == ' ') i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  /** Per-document repetition statistics in ONE pass over the text:
    * (n_tokens, n_distinct, top_cnt, n_distinct_bigrams), with the
    * same tokenization as [[wordShingles]] — split(lower(text), " "),
    * empty tokens kept. Replaces an explode → two-level hash
    * aggregate → join (a full corpus shuffle) with a per-row map:
    * every feature is a function of one document, so nothing ever
    * needs to leave the row.
    */
  def repetitionStats(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val s = text.toLowerCase.toString
    val counts = new java.util.HashMap[String, Integer]()
    val bigrams = new java.util.HashSet[String]()
    var m = 0
    var top = 0
    var prev: String = null
    var start = 0
    var i = 0
    val n = s.length
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        val tok = s.substring(start, i)
        m += 1
        val c = counts.merge(tok, 1, (a, b) => a + b)
        if (c > top) top = c
        if (prev != null) bigrams.add(prev + " " + tok)
        prev = tok
        start = i + 1
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(
      m.toLong, counts.size.toLong, top.toLong, bigrams.size.toLong)
  }

  val HashPrime = 4294967311L // smallest prime > 2^32
  private val Fold = 4294967296L // 2^32

  /** Deterministic universal-hash parameters (a·x + b) mod P with
    * a < 2³¹ so a·x never overflows a signed Long for x < 2³². Shared
    * by the Column API (Dedup) and the SQL registry so the same seed
    * yields the same signatures on both surfaces.
    */
  def minhashParams(k: Int, seed: Long): (Array[Long], Array[Long]) = {
    val rnd = new scala.util.Random(seed)
    Array.fill(k)((rnd.nextInt(Int.MaxValue - 1).toLong + 1, rnd.nextInt(Int.MaxValue).toLong)).unzip
  }

  /** MinHash signature over a shingle array: base hash
    * x = xxhash64(s, 42) mod 2^32, then sig(i) = min over shingles of
    * (a(i)·x + b(i)) mod P — the per-doc form of the explode+groupBy
    * aggregation it replaces (bit-identical results, zero shuffle).
    */
  def minhashSig(sh: ArrayData, as: Array[Long], bs: Array[Long]): ArrayData = {
    val k = as.length
    val sig = Array.fill[Long](k)(Long.MaxValue)
    val m = sh.numElements()
    var j = 0
    while (j < m) {
      val h = XXH64.hashUTF8String(sh.getUTF8String(j), 42L)
      val x = ((h % Fold) + Fold) % Fold
      var i = 0
      while (i < k) {
        val v = (as(i) * x + bs(i)) % HashPrime
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  /** Banded LSH bucket keys straight from the shingle array: computes
    * the MinHash signature once, then packs each band's row-slice into
    * (band << 48) | (hash of the slice & 0xFFFFFFFFFFFF). One
    * expression evaluation per row — materializing the signature as a
    * separate projected column would get re-substituted (and the
    * whole MinHash recomputed) once per band reference in the
    * downstream explode.
    */
  def minhashBandKeys(sh: ArrayData, as: Array[Long], bs: Array[Long], bands: Int): ArrayData = {
    val k = as.length
    val r = k / bands
    val sig = minhashSig(sh, as, bs)
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 0xcbf29ce484222325L // FNV-1a over the band's signature longs
      var i = b * r
      val end = i + r
      while (i < end) {
        var v = sig.getLong(i)
        var byte = 0
        while (byte < 8) {
          h = (h ^ (v & 0xff)) * 0x100000001b3L
          v >>>= 8
          byte += 1
        }
        i += 1
      }
      out(b) = (b.toLong << 48) | (h & 0xffffffffffffL)
      b += 1
    }
    new GenericArrayData(out)
  }

  /** All ordered pairs (a < b) of a posting list of (doc_id, n)
    * structs, emitted as (a, na, b, nb) struct rows — the per-bucket
    * pair generator for the group-pairs near-dup shape (one explode of
    * a co-grouped posting list replaces the inverted-index self-join,
    * and carrying each doc's set size through eliminates the per-doc
    * counts join entirely). Sorts by doc_id so a < b holds regardless
    * of the upstream collect_list order; output size is m(m-1)/2, so
    * callers MUST bound m (Dedup's dfCap) before exploding this at
    * scale.
    */
  def postingPairs(ids: ArrayData): ArrayData = {
    val m = ids.numElements()
    if (m < 2) return new GenericArrayData(Array.empty[Any])
    val id = new Array[Long](m)
    val n = new Array[Long](m)
    var i = 0
    while (i < m) {
      val row = ids.getStruct(i, 2)
      id(i) = row.getLong(0)
      n(i) = row.getLong(1)
      i += 1
    }
    // insertion sort by id, carrying n (m is small — bounded by dfCap)
    i = 1
    while (i < m) {
      val ki = id(i); val kn = n(i)
      var j = i - 1
      while (j >= 0 && id(j) > ki) { id(j + 1) = id(j); n(j + 1) = n(j); j -= 1 }
      id(j + 1) = ki; n(j + 1) = kn
      i += 1
    }
    val out = new Array[Any](m * (m - 1) / 2)
    var k = 0
    i = 0
    while (i < m) {
      var j = i + 1
      while (j < m) {
        out(k) = org.apache.spark.sql.catalyst.InternalRow(id(i), n(i), id(j), n(j))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** All ordered pairs (a < b) of a long array, emitted as (a, b)
    * struct rows — the per-group edge generator of the co-occurrence
    * build: one explode of the grouped membership replaces the
    * membership self-join (see [[postingPairs]], the same move for
    * posting lists). Sorts defensively (insertion sort — k is small,
    * bounded by Graphs' maxGroupSize at the feeding aggregate);
    * duplicates are assumed already collapsed by that aggregate.
    */
  def longPairs(items: ArrayData): ArrayData = {
    val m = items.numElements()
    if (m < 2) return new GenericArrayData(Array.empty[Any])
    val a = items.toLongArray()
    java.util.Arrays.sort(a)
    val out = new Array[Any](m * (m - 1) / 2)
    var k = 0
    var i = 0
    while (i < m) {
      var j = i + 1
      while (j < m) {
        out(k) = org.apache.spark.sql.catalyst.InternalRow(a(i), a(j))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** 64-bit SimHash over a shingle array: bit b of the fingerprint is
    * set iff Σ over shingles of ±1 (sign of hash bit b) is positive.
    */
  def simhash64(sh: ArrayData): Long = {
    val sums = new Array[Int](64)
    val m = sh.numElements()
    var j = 0
    while (j < m) {
      val h = XXH64.hashUTF8String(sh.getUTF8String(j), 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) sums(b) += 1 else sums(b) -= 1
        b += 1
      }
      j += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (sums(b) > 0) fp |= 1L << b
      b += 1
    }
    fp
  }

  /** All LSH bucket keys of a vector across `tables` hyperplane
    * tables, packed as (table << 32) | bucket. With `multiprobe`,
    * each table also emits every hamming-1 neighbor bucket (the
    * query-side probe set). One expression instead of
    * tables × (1 + bits) separate signature subtrees — keeps the
    * generated code small (Janino compile time was the dominant cost
    * of the expression-tree formulation).
    */
  def lshKeys(v: ArrayData, planes: Array[Array[Array[Double]]],
              multiprobe: Boolean, vFloat: Boolean): ArrayData = {
    val tables = planes.length
    var total = 0
    var t = 0
    while (t < tables) { total += (if (multiprobe) 1 + planes(t).length else 1); t += 1 }
    val out = new Array[Long](total)
    var o = 0
    t = 0
    while (t < tables) {
      val sig = hyperplaneSig(v, planes(t), vFloat)
      val base = t.toLong << 32
      out(o) = base | sig
      o += 1
      if (multiprobe) {
        var i = 0
        while (i < planes(t).length) {
          out(o) = base | (sig ^ (1L << i))
          o += 1
          i += 1
        }
      }
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Indices of the `nprobe` centroids with the highest dot product
    * against `v` (centroids pre-normalized ⇒ cosine order), best
    * first — the IVF coarse-quantizer probe step.
    */
  def centroidProbes(v: ArrayData, cents: Array[Array[Double]],
                     nprobe: Int, vFloat: Boolean): ArrayData = {
    val k = cents.length
    val scores = new Array[Double](k)
    var c = 0
    while (c < k) {
      val p = cents(c)
      val n = math.min(v.numElements(), p.length)
      var acc = 0.0
      var j = 0
      while (j < n) {
        val x = if (vFloat) v.getFloat(j).toDouble else v.getDouble(j)
        acc += x * p(j)
        j += 1
      }
      scores(c) = acc
      c += 1
    }
    val m = math.min(nprobe, k)
    val out = new Array[Int](m)
    val taken = new Array[Boolean](k)
    var o = 0
    while (o < m) {
      var best = -1
      var bestS = Double.NegativeInfinity
      var i = 0
      while (i < k) {
        if (!taken(i) && (scores(i) > bestS || (scores(i) == bestS && best == -1))) {
          best = i; bestS = scores(i)
        }
        i += 1
      }
      taken(best) = true
      out(o) = best
      o += 1
    }
    new GenericArrayData(out)
  }

  /** Verified SimHash near-dup pairs inside one pigeonhole bucket:
    * all (a < b) pairs of the (doc_id, simhash) list whose hamming
    * distance ≤ maxHamming AND whose FIRST agreeing chunk is this
    * bucket's chunk index `ck` — the first-agreeing-chunk rule
    * deduplicates across buckets for free (a pair within distance k
    * agrees on ≥1 of the k+1 chunks and is emitted ONLY by the
    * smallest agreeing one), replacing the chunked self-join +
    * pair-wide `distinct` with a grouped-list kernel: verification
    * happens here, so no candidate row ever hits a shuffle. Output
    * (a, b, hamming) structs; callers bound the list size the same
    * way posting lists are bounded (Σ bucket² work).
    */
  def simhashBucketPairs(ids: ArrayData, ck: Int, width: Int, maxHamming: Int): ArrayData = {
    val m = ids.numElements()
    if (m < 2) return new GenericArrayData(Array.empty[Any])
    val id = new Array[Long](m)
    val h = new Array[Long](m)
    var i = 0
    while (i < m) {
      val row = ids.getStruct(i, 2)
      id(i) = row.getLong(0)
      h(i) = row.getLong(1)
      i += 1
    }
    // insertion sort by id so a < b regardless of collect_list order
    i = 1
    while (i < m) {
      val ki = id(i); val kh = h(i)
      var j = i - 1
      while (j >= 0 && id(j) > ki) { id(j + 1) = id(j); h(j + 1) = h(j); j -= 1 }
      id(j + 1) = ki; h(j + 1) = kh
      i += 1
    }
    val mask = if (width == 64) -1L else (1L << width) - 1
    val out = new scala.collection.mutable.ArrayBuffer[Any]()
    i = 0
    while (i < m) {
      var j = i + 1
      while (j < m) {
        val x = h(i) ^ h(j)
        if (java.lang.Long.bitCount(x) <= maxHamming) {
          // emit only if no chunk below ck agrees (that bucket owns it)
          var c = 0
          var owned = true
          while (owned && c < ck) {
            if (((x >>> (c * width)) & mask) == 0L) owned = false
            c += 1
          }
          if (owned)
            out += org.apache.spark.sql.catalyst.InternalRow(
              id(i), id(j), java.lang.Long.bitCount(x))
        }
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Sign-bit LSH signature: bit i set iff dot(v, planes(i)) ≥ 0. */
  def hyperplaneSig(v: ArrayData, planes: Array[Array[Double]], vFloat: Boolean): Long = {
    var sig = 0L
    val bits = planes.length
    var i = 0
    while (i < bits) {
      val p = planes(i)
      val n = math.min(v.numElements(), p.length)
      var acc = 0.0
      var j = 0
      while (j < n) {
        val x = if (vFloat) v.getFloat(j).toDouble else v.getDouble(j)
        acc += x * p(j)
        j += 1
      }
      if (acc >= 0) sig |= 1L << i
      i += 1
    }
    sig
  }

  /** Rabin-Karp rolling hashes of every `w`-token window, in document
    * order (repeats kept — window j covers tokens [j, j+w)). Tokens are
    * `split(lower(text), " ")` with empties kept, same tokenization as
    * [[wordShingles]]; each token contributes its xxhash64, combined
    * polynomially with wrapping 64-bit arithmetic:
    * wh(j) = Σ_k th(j+k)·P^(w-1-k). The roll
    * wh(j+1) = (wh(j) − th(j)·P^(w-1))·P + th(j+w) makes the cost
    * O(tokens), independent of w. Empty array when fewer than w tokens.
    */
  def windowHashes(text: UTF8String, w: Int): ArrayData = {
    val s = text.toLowerCase.toString
    val P = 0x100000001b3L
    // per-token hashes, streaming the split
    val th = new java.util.ArrayList[java.lang.Long]()
    var start = 0
    var i = 0
    while (i <= s.length) {
      if (i == s.length || s.charAt(i) == ' ') {
        th.add(XXH64.hashUTF8String(UTF8String.fromString(s.substring(start, i)), 42L))
        start = i + 1
      }
      i += 1
    }
    val m = th.size
    if (m < w) return new GenericArrayData(Array.empty[Any])
    var pw = 1L // P^(w-1), wrapping
    i = 1
    while (i < w) { pw *= P; i += 1 }
    val out = new Array[Any](m - w + 1)
    var h = 0L
    i = 0
    while (i < w) { h = h * P + th.get(i); i += 1 }
    out(0) = h
    var j = 1
    while (j <= m - w) {
      h = (h - th.get(j - 1) * pw) * P + th.get(j + w - 1)
      out(j) = h
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Product-quantization code of `v` under codebooks `cents`
    * (m × k × sub doubles, m·sub == dim): per subspace, the index of
    * the L2-nearest centroid (ties → lowest index). Null on dimension
    * mismatch. The code is m small ints — the 4–16-byte stand-in for a
    * dim-float vector in memory-bound ANN sweeps.
    */
  def pqEncode(v: ArrayData, cents: Array[Array[Array[Double]]],
               vFloat: Boolean): ArrayData = {
    val m = cents.length
    val sub = cents(0)(0).length
    if (v.numElements() != m * sub) return null
    val out = new Array[Any](m)
    var s = 0
    while (s < m) {
      val cs = cents(s)
      var best = 0
      var bestD = Double.MaxValue
      var j = 0
      while (j < cs.length) {
        val c = cs(j)
        var d = 0.0
        var i = 0
        while (i < sub) {
          val x = (if (vFloat) v.getFloat(s * sub + i).toDouble
                   else v.getDouble(s * sub + i)) - c(i)
          d += x * x
          i += 1
        }
        if (d < bestD) { bestD = d; best = j }
        j += 1
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Per-query ADC lookup table: flat m·k doubles where
    * table[s·k + j] = dot(q_sub_s, cents[s][j]) — computed ONCE per
    * query row, so each query×code score is m adds ([[pqAdc]]) instead
    * of a dim-wide dot. Null on dimension mismatch.
    */
  def pqTable(q: ArrayData, cents: Array[Array[Array[Double]]],
              qFloat: Boolean): ArrayData = {
    val m = cents.length
    val k = cents(0).length
    val sub = cents(0)(0).length
    if (q.numElements() != m * sub) return null
    val out = new Array[Any](m * k)
    var s = 0
    while (s < m) {
      var j = 0
      while (j < k) {
        val c = cents(s)(j)
        var acc = 0.0
        var i = 0
        while (i < sub) {
          acc += (if (qFloat) q.getFloat(s * sub + i).toDouble
                  else q.getDouble(s * sub + i)) * c(i)
          i += 1
        }
        out(s * k + j) = acc
        j += 1
      }
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Asymmetric-distance score: Σ_s table[s·k + code(s)] ≈ dot(q, x̂)
    * where x̂ is the PQ reconstruction of the corpus vector — m array
    * reads per pair. Null if the code is empty (encode mismatch).
    */
  def pqAdc(table: ArrayData, code: ArrayData, k: Int): java.lang.Double = {
    val m = code.numElements()
    if (m == 0 || table.numElements() != m * k) return null
    var acc = 0.0
    var s = 0
    while (s < m) {
      acc += table.getDouble(s * k + code.getInt(s))
      s += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** upper_bound over SORTED boundaries: count of boundaries <= v —
    * the z-order rank-bucket id. NaN lands in the TOP bucket: Spark's
    * SQL comparisons rank NaN greater than every double (unlike Java's
    * IEEE `<=`, which is false everywhere), and the filter-count
    * formulation this kernel replaced therefore counted ALL boundaries
    * for a NaN row — binary search must preserve that, not silently
    * move NaN rows to bucket 0 (review r10 #5).
    */
  def rankBucket(v: Double, boundaries: Array[Double]): Int = {
    if (java.lang.Double.isNaN(v)) return boundaries.length
    var lo = 0
    var hi = boundaries.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (boundaries(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo
  }

  /** Spark SQL's total order on doubles (SQLOrderingUtil): −0.0 ties
    * +0.0, NaN ties NaN and sorts above every number — the ordering
    * `array_sort` applies, which [[pqEncodeDot]] must replicate so the
    * kernel's argmax is BIT-IDENTICAL to the struct-sort expression it
    * replaces (the md5-PQ oracle parity rides on the tie rule).
    */
  private def sqlCompareDouble(x: Double, y: Double): Int =
    if (x == y) 0
    else if (x < y) -1
    else if (x > y) 1
    else if (java.lang.Double.isNaN(x)) { if (java.lang.Double.isNaN(y)) 0 else 1 }
    else -1

  /** md5-PQ ENCODE by the X235 portable rule, kernel form (r16 — the
    * Catalyst construction it replaces built m × kc structs and m
    * array_sorts PER ROW; at m=8/kc=16 that is a 128-branch expression
    * tree whose codegen dwarfed the arithmetic): per subspace, the
    * codeword index minimizing `ns = 0.0 − dot(sub, codeword)` under
    * Spark's total double order, ties → lowest index — the EXACT
    * argmax-dot-with-pinned-ties decision of the expression form, dot
    * accumulated in the same sequential element order as [[dot]].
    * Degenerate shapes replicate the expression's behavior too: a
    * subspace sliced past the vector's end yields all-NULL sort keys,
    * which the struct sort resolved to codeword 0 — so any subspace
    * not fully covered by `v` encodes 0 here as well.
    */
  def pqEncodeDot(v: ArrayData, cents: Array[Array[Array[Double]]],
                  vFloat: Boolean): ArrayData = {
    val m = cents.length
    val sub = cents(0)(0).length
    val out = new Array[Any](m)
    var j = 0
    while (j < m) {
      if ((j + 1) * sub > v.numElements()) out(j) = 0
      else {
        val cs = cents(j)
        var best = 0
        var bestNs = Double.NaN
        var first = true
        var c = 0
        while (c < cs.length) {
          val cw = cs(c)
          var acc = 0.0
          var i = 0
          while (i < sub) {
            val x = if (vFloat) v.getFloat(j * sub + i).toDouble
                    else v.getDouble(j * sub + i)
            acc += x * cw(i)
            i += 1
          }
          val ns = 0.0 - acc
          if (first || sqlCompareDouble(ns, bestNs) < 0) {
            best = c; bestNs = ns; first = false
          }
          c += 1
        }
        out(j) = best
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  /** md5-PQ DECODE: the chosen codewords concatenated — exact copies
    * of the codebook doubles, so `dot(q, pqDecode(code))` is
    * bit-identical to the `concat(element_at(typedlit…))` expression
    * it replaces. Null when any code index falls outside [0, kc), the
    * out-of-range `element_at` → NULL-array → NULL-concat behavior of
    * the expression form.
    */
  def pqDecode(code: ArrayData, cents: Array[Array[Array[Double]]]): ArrayData = {
    val m = cents.length
    if (code.numElements() != m) return null
    val kc = cents(0).length
    val sub = cents(0)(0).length
    val out = new Array[Any](m * sub)
    var j = 0
    while (j < m) {
      if (code.isNullAt(j)) return null
      val c = code.getInt(j)
      if (c < 0 || c >= kc) return null
      val cw = cents(j)(c)
      var i = 0
      while (i < sub) { out(j * sub + i) = cw(i); i += 1 }
      j += 1
    }
    new GenericArrayData(out)
  }
}
