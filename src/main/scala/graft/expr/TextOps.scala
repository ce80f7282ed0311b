package graft.expr

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Static bridge for the training-data-pipeline text/embedding operators
 * (dedup, similarity, fingerprinting). Pure, deterministic, and callable
 * from generated code. All hashing is written from scratch (no external
 * hash libs): FNV-1a 64 over UTF-8 bytes + a splitmix64 finalizer.
 */
object TextOps {

  // ---- hashing ----
  final val FnvOffset = 0xcbf29ce484222325L
  final val FnvPrime = 0x100000001b3L

  /** splitmix64 finalizer — full avalanche over FNV's weak high bits. */
  @inline def mix64(zIn: Long): Long = {
    var z = zIn + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def hashBytes(bytes: Array[Byte], from: Int, until: Int): Long = {
    var h = FnvOffset
    var i = from
    while (i < until) { h = (h ^ (bytes(i) & 0xffL)) * FnvPrime; i += 1 }
    mix64(h)
  }

  def hashText(s: UTF8String): Long = {
    val b = s.getBytes
    hashBytes(b, 0, b.length)
  }

  // ---- content-defined chunking ----
  /** Per-byte gear values: mix64 of the byte value (the only constant the
    * SQL replay shares is the published splitmix64 mixer). */
  private val GearTable: Array[Long] = Array.tabulate(256)(b => mix64(b.toLong))

  /**
   * Gear content-defined chunk cut positions (the rolling-hash family of
   * FastCDC, Xia et al., USENIX ATC'16). Rolling state
   * `h = (h << 1) + gear(byte) mod 2^64` equals the WINDOWED sum
   * `sum over the last 64 bytes of gear(b_j) << (i - j)` — bytes older
   * than 64 shift out mod 2^64 — so every position's cut decision is
   * position-LOCAL: independently replayable (the SQL oracle computes
   * each h_i as that 64-term sum, no sequential state), and a byte edit
   * re-syncs chunk boundaries within 64 bytes + one chunk — the property
   * that makes CDC dedup robust to insertions where fixed-size blocks
   * are not. Cut after byte i (1-based) when the TOP `maskBits` bits of
   * h_i are zero and i < length (expected chunk = 2^maskBits bytes).
   * The mask sits on the HIGH bits deliberately: bit k of h_i sees only
   * the last k+1 bytes, so a low-bit mask would make the cut decision a
   * function of just `maskBits` bytes — degenerate on low-entropy text
   * (measured 1-in-179 cuts on word-repetitive prose vs 1-in-65 with
   * the high mask; FastCDC's spread masks exist for the same reason).
   * FastCDC's min/max chunk bounds are deliberately omitted: they make
   * cuts sequentially dependent (greedy suppression), killing
   * independent replay; at scale they'd be a cheap per-doc post-pass.
   */
  def gearCuts(s: UTF8String, maskBits: Int): ArrayData = {
    val b = s.getBytes
    val shift = 64 - maskBits
    var h = 0L
    val buf = scala.collection.mutable.ArrayBuffer.empty[Any]
    var i = 0
    while (i < b.length) {
      h = (h << 1) + GearTable(b(i) & 0xff)
      if ((h >>> shift) == 0L && i + 1 < b.length) buf += (i + 1)
      i += 1
    }
    new GenericArrayData(buf.toArray)
  }

  // ---- tokenization ----
  /** Whitespace tokens. */
  /** Unicode NFC (canonical composition) — the text-normalization stage
    * a multilingual corpus runs before hashing/dedup, so byte-different
    * spellings of one string (e + combining acute vs é) can never defeat
    * exact or near dedup. */
  def nfcNormalize(s: UTF8String): UTF8String =
    UTF8String.fromString(
      java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFC))

  def tokens(s: UTF8String): Array[String] = {
    val str = s.toString
    val out = str.split("\\s+")
    if (out.length > 0 && out(0).isEmpty) out.drop(1) else out
  }

  /** Word n-gram shingles ("a b c", n=2 -> ["a b", "b c"]). */
  def wordShingles(s: UTF8String, n: Int): ArrayData = {
    val toks = tokens(s)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](toks.length - n + 1)
    var i = 0
    while (i <= toks.length - n) {
      out(i) = UTF8String.fromString(toks.slice(i, i + n).mkString(" "))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Character n-gram shingles over the raw string. */
  def charShingles(s: UTF8String, n: Int): ArrayData = {
    val str = s.toString
    if (str.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](str.length - n + 1)
    var i = 0
    while (i <= str.length - n) {
      out(i) = UTF8String.fromString(str.substring(i, i + n))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Sorted-distinct hashes of char n-grams, computed without
    * materializing gram strings (one UTF8String -> one long[] pass). */
  def hashedCharShingles(s: UTF8String, n: Int): ArrayData = {
    val str = s.toString
    if (str.length < n) return new GenericArrayData(Array.empty[Long])
    val raw = new Array[Long](str.length - n + 1)
    var i = 0
    while (i <= str.length - n) {
      var h = FnvOffset
      var j = 0
      while (j < n) { h = (h ^ str.charAt(i + j)) * FnvPrime; j += 1 }
      raw(i) = mix64(h)
      i += 1
    }
    sortedDistinct(raw)
  }

  /** Sorted-distinct hashes of word n-grams (token-hash rolling combine). */
  def hashedWordShingles(s: UTF8String, n: Int): ArrayData = {
    val toks = tokens(s)
    if (toks.length < n) return new GenericArrayData(Array.empty[Long])
    val tokHash = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      var h = FnvOffset
      var j = 0
      while (j < t.length) { h = (h ^ t.charAt(j)) * FnvPrime; j += 1 }
      tokHash(i) = mix64(h)
      i += 1
    }
    val raw = new Array[Long](toks.length - n + 1)
    i = 0
    while (i <= toks.length - n) {
      var h = FnvOffset
      var j = 0
      while (j < n) { h = h * 31 + tokHash(i + j); j += 1 }
      raw(i) = mix64(h)
      i += 1
    }
    sortedDistinct(raw)
  }

  private def sortedDistinct(raw: Array[Long]): ArrayData = {
    java.util.Arrays.sort(raw)
    var w = 0
    var i = 0
    while (i < raw.length) {
      if (w == 0 || raw(i) != raw(w - 1)) { raw(w) = raw(i); w += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(raw, w))
  }

  /** Jaccard of two SORTED-DISTINCT long arrays via a single merge walk —
    * no hash sets, no per-row allocation. */
  def sortedJaccard(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements(); val nb = b.numElements()
    if (na == 0 && nb == 0) return 0.0
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / (na + nb - inter).toDouble
  }

  /** Exact integer dot product of two token-count vectors, each an array
    * of (tok, c) structs SORTED ascending by tok (the order
    * `array_sort(collect_list(struct(tok, c)))` yields for per-doc
    * distinct toks — Spark's binary UTF8 string ordering, matched here by
    * `UTF8String.compareTo`). Merge walk: equal keys contribute ca*cb —
    * exactly the keyed-join `sum(ca*cb)` aggregation collapsed into one
    * kernel pass, so a pair query needs no (doc, tok)-keyed join at all. */
  def keyedDot(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var acc = 0L
    while (i < na && j < nb) {
      val ra = a.getStruct(i, 2); val rb = b.getStruct(j, 2)
      val cmp = ra.getUTF8String(0).compareTo(rb.getUTF8String(0))
      if (cmp == 0) { acc += ra.getLong(1) * rb.getLong(1); i += 1; j += 1 }
      else if (cmp < 0) i += 1
      else j += 1
    }
    acc
  }

  /** BM25 score fold for one (query, doc) pair — the (query, term, doc)
    * contribution join + qpos-pivot aggregation of q98 collapsed into one
    * kernel pass (r6). `qarr` = the query's ARRAY<STRUCT<qpos:int,
    * term:string, idf:double>> sorted ascending by qpos (qpos is unique
    * per query: one term owns each token position); `ps` = the doc's
    * ARRAY<STRUCT<term:string, tf:long>> sorted by term (Spark's binary
    * UTF8 ordering — `array_sort(collect_list(struct(term, tf)))`);
    * `kdoc` = the per-doc length normalization 1.2*(0.25+0.75*len/avglen)
    * precomputed as a Column so its float shape is the relational form's.
    * Adds idf * (tf*2.2)/(tf + kdoc) over MATCHED terms in qarr (= qpos)
    * order starting from 0.0 — exactly the c0..c5 conditional-max pivot +
    * null-skipping array fold it replaces, same doubles in the same
    * order. Returns NaN when no term matches: the relational form emits
    * no row at all for such pairs (matched contributions are strictly
    * positive, so NaN can never arise from a real match). */
  def bm25Fold(qarr: ArrayData, ps: ArrayData, kdoc: Double): Double = {
    val nq = qarr.numElements(); val np = ps.numElements()
    var acc = 0.0; var matched = false
    var i = 0
    while (i < nq) {
      val q = qarr.getStruct(i, 3)
      val term = q.getUTF8String(1)
      // binary search the term-sorted per-doc count vector
      var lo = 0; var hi = np - 1
      var found = -1
      while (found < 0 && lo <= hi) {
        val mid = (lo + hi) >>> 1
        val cmp = ps.getStruct(mid, 2).getUTF8String(0).compareTo(term)
        if (cmp == 0) found = mid
        else if (cmp < 0) lo = mid + 1
        else hi = mid - 1
      }
      if (found >= 0) {
        val tfd = ps.getStruct(found, 2).getLong(1).toDouble
        acc += q.getDouble(2) * ((tfd * 2.2) / (tfd + kdoc))
        matched = true
      }
      i += 1
    }
    if (matched) acc else Double.NaN
  }

  // ---- MinHash (k permutations via seeded remix of one base hash) ----
  def minHash(shingles: ArrayData, k: Int, seed: Long): ArrayData = {
    val mins = Array.fill(k)(Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      val h = hashText(shingles.getUTF8String(i))
      var j = 0
      while (j < k) {
        val g = mix64(h ^ mix64(seed + j))
        if (g < mins(j)) mins(j) = g
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** LSH band keys from a minhash signature: hash of each band of `rowsPerBand`
    * values, tagged with the band index in the high bits. */
  def lshBands(sig: ArrayData, rowsPerBand: Int): ArrayData = {
    val k = sig.numElements()
    val nBands = k / rowsPerBand
    val out = new Array[Long](nBands)
    var b = 0
    while (b < nBands) {
      var h = FnvOffset
      var r = 0
      while (r < rowsPerBand) {
        val v = sig.getLong(b * rowsPerBand + r)
        var s = 0
        while (s < 8) { h = (h ^ ((v >>> (8 * s)) & 0xffL)) * FnvPrime; s += 1 }
        r += 1
      }
      out(b) = (b.toLong << 56) ^ (mix64(h) >>> 8)
      b += 1
    }
    new GenericArrayData(out)
  }

  // ---- SimHash (64-bit, token-weighted) ----
  def simHash(shingles: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      val h = hashText(shingles.getUTF8String(i))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def hammingDistance(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  // ---- embeddings ----
  /** Cosine similarity of two float vectors, accumulated in float64 in
    * index order (deterministic). Returns 0 for zero-norm inputs. */
  /** Inner product of float-vector embeddings (double accumulation in
    * index order) — the similarity PQ's ADC decomposes across subspaces
    * (dot(q, v) = Σ_m dot(q_m, v_m) in exact arithmetic; in floats the
    * subspace-ordered fold is its own deterministic definition, and q99
    * pins that SAME fold order on both engines rather than comparing it
    * to the full-vector fold). */
  def dotSim(a: ArrayData, b: ArrayData): Double = {
    val n = Math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    dot
  }

  def cosineSim(a: ArrayData, b: ArrayData): Double = {
    val n = Math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (Math.sqrt(na) * Math.sqrt(nb))
  }

  /** Random-hyperplane LSH bucket for a float vector: `nBits` sign bits of
    * dot products with deterministic pseudo-random hyperplanes. */
  def hyperplaneLsh(v: ArrayData, nBits: Int, seed: Long): Long = {
    val n = v.numElements()
    var out = 0L
    var b = 0
    while (b < nBits) {
      var dot = 0.0
      var i = 0
      while (i < n) {
        // deterministic pseudo-gaussian-ish weight in [-1,1)
        val w = (mix64(seed + b * 1000003L + i).toDouble / Long.MaxValue.toDouble)
        dot += v.getFloat(i) * w
        i += 1
      }
      if (dot >= 0) out |= (1L << b)
      b += 1
    }
    out
  }

  // ---- quality / language signals ----
  /** Rolling polynomial fingerprint over whitespace tokens (document
    * fingerprinting for the training-data pipeline). */
  def fingerprint(s: UTF8String): Long = {
    val toks = tokens(s)
    var h = FnvOffset
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      var th = FnvOffset
      var j = 0
      while (j < t.length) { th = (th ^ t.charAt(j)) * FnvPrime; j += 1 }
      h = h * 31 + mix64(th)
      i += 1
    }
    mix64(h)
  }
}
