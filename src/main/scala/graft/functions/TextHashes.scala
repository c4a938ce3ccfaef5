package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** JVM-native hash kernels for the dedup family (SURVEY.md §2.10: "scalar
  * UDF — minhash only").
  *
  * Why UDFs here: higher-order array lambdas are interpreted per element in
  * Spark, so a 32-perm MinHash written as nested `transform`s costs
  * 32 × |shingles| Catalyst eval-tree walks per row (measured: the dedup
  * family was 32 s of a 76 s bench). One UDF call per row with tight JVM
  * loops removes that constant; the signatures are engine-internal (LSH
  * candidates only), so cross-engine hash equality is not required —
  * except simhash, which IS oracle-checked and therefore derives its bits
  * from md5 exactly like the DuckDB SQL twin.
  */
object TextHashes {

  /** Distinct n-gram word shingles — JVM kernel for the same reason as the
    * hashes: the `transform(sequence…, i -> concat_ws(slice…))` formulation
    * walks an interpreted eval tree per shingle. */
  def shingles(n: Int): UserDefinedFunction = udf { (toks: Seq[String]) =>
    if (toks.length <= n) Array(toks.mkString(" "))
    else {
      val out = new scala.collection.mutable.LinkedHashSet[String]
      var i = 0
      val last = toks.length - n
      while (i <= last) {
        val sb = new StringBuilder(toks(i))
        var k = 1
        while (k < n) { sb.append(' ').append(toks(i + k)); k += 1 }
        out += sb.result()
        i += 1
      }
      out.toArray
    }
  }

  /** Non-distinct n-gram word shingles (frequency-preserving — for
    * repetition metrics, where duplicate grams are the signal the distinct
    * variant above would erase). Same windowing as [[shingles]]: width n,
    * len−n+1 windows, min one (whole-doc) window. */
  def shinglesAll(n: Int): UserDefinedFunction = udf { (toks: Seq[String]) =>
    if (toks.length <= n) Array(toks.mkString(" "))
    else {
      val out = new Array[String](toks.length - n + 1)
      var i = 0
      while (i < out.length) {
        val sb = new StringBuilder(toks(i))
        var k = 1
        while (k < n) { sb.append(' ').append(toks(i + k)); k += 1 }
        out(i) = sb.result()
        i += 1
      }
      out
    }
  }

  /** 32-permutation MinHash signature (xxh64-seeded). */
  val minhash32: UserDefinedFunction = udf { (sh: Seq[String]) =>
    val mins = Array.fill(32)(Long.MaxValue)
    sh.foreach { s =>
      val u = org.apache.spark.unsafe.types.UTF8String.fromString(s)
      var p = 0
      while (p < 32) {
        val h = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, p.toLong)
        if (h < mins(p)) mins(p) = h
        p += 1
      }
    }
    mins
  }

  /** 60-bit SimHash with bits derived from md5(shingle) — bit-identical to
    * the SQL/DuckDB formulation `CAST('0x' || SUBSTR(md5(s),1,15) AS BIGINT)`
    * (first 15 hex nibbles = first 7 digest bytes + the high nibble of byte
    * 8, big-endian), so the query stays oracle-able. 60 bits rather than 64
    * because 16 hex nibbles can overflow a signed BIGINT on the SQL side.
    *
    * Why 60 and not the former 32: the band signature space is what the LSH
    * bucket sizes divide into. 32 bits banded 4×8 gives 256 signatures per
    * band — a FIXED key space, so bucket occupancy (and in-bucket pair
    * expansion) grows linearly with the corpus and candidate work grows
    * quadratically (measured 11.4× at the 10× tier). 60 bits widen each
    * band (the banding itself lives in DedupVariants.q_dedup_simhash: 5×12
    * bits); more bits per band is the scale dial. */
  /** Winnowing selection kernel (q_winnow): positional n-gram shingles →
    * 28-bit md5 prefix hashes (identical to the SQL idiom
    * `CAST('0x' || SUBSTR(md5(s), 1, 7) AS BIGINT)` — the first 7 hex
    * digits are bytes 0–2 plus the high nibble of byte 3) → per-window
    * minima over `w` consecutive hashes. One JVM loop per document; the
    * interpreted-HOF formulation (transform+md5 per gram) walks an eval
    * tree per shingle — the same reason every other hash pipeline here is
    * a kernel. Window/shingle edge semantics match [[shinglesAll]] and the
    * oracle: ≤n tokens → one whole-doc gram; ≤w hashes → one whole-list
    * window. */
  def winnowMins(n: Int, w: Int): UserDefinedFunction = udf { (toks: Seq[String]) =>
    val md = MessageDigest.getInstance("MD5")
    def h28(s: String): Long = {
      val dig = md.digest(s.getBytes("UTF-8"))
      ((dig(0) & 0xffL) << 20) | ((dig(1) & 0xffL) << 12) |
        ((dig(2) & 0xffL) << 4) | ((dig(3) >> 4) & 0xfL)
    }
    val grams: Array[String] =
      if (toks.length <= n) Array(toks.mkString(" "))
      else {
        val out = new Array[String](toks.length - n + 1)
        var i = 0
        while (i < out.length) {
          val sb = new StringBuilder(toks(i))
          var k = 1
          while (k < n) { sb.append(' ').append(toks(i + k)); k += 1 }
          out(i) = sb.result()
          i += 1
        }
        out
      }
    val hx = grams.map(h28)
    if (hx.length <= w) Array(hx.min)
    else {
      val out = new Array[Long](hx.length - w + 1)
      var i = 0
      while (i < out.length) {
        var m = hx(i)
        var k = 1
        while (k < w) { if (hx(i + k) < m) m = hx(i + k); k += 1 }
        out(i) = m
        i += 1
      }
      out
    }
  }

  /** Content-defined chunk split (q_chunk_cdc): a cut lands AFTER 1-based
    * token position i (for i in n..len-1) whenever the 28-bit md5-prefix
    * hash of the n-gram ENDING at i is ≡ 0 mod `mod` — a STATELESS gear
    * rule (each position's decision depends only on its own n-token
    * window, not on previous cut placement), which is what makes the
    * boundary function shift-robust (an insertion re-synchronizes after n
    * tokens, unlike fixed-size blocks where every later block changes) AND
    * embarrassingly parallel / SQL-expressible for the oracle. Expected
    * chunk length ≈ `mod` tokens. ≤ n tokens → one whole-doc chunk. One
    * JVM loop per document (the interpreted-HOF rule). */
  def cdcChunks(n: Int, mod: Int): UserDefinedFunction = udf { (toks: Seq[String]) =>
    val md = MessageDigest.getInstance("MD5")
    def h28(s: String): Long = {
      val dig = md.digest(s.getBytes("UTF-8"))
      ((dig(0) & 0xffL) << 20) | ((dig(1) & 0xffL) << 12) |
        ((dig(2) & 0xffL) << 4) | ((dig(3) >> 4) & 0xfL)
    }
    val arr = toks.toArray
    val len = arr.length
    val bounds = scala.collection.mutable.ArrayBuffer(0)
    var i = n
    while (i < len) { // 1-based cut position; a cut after the last token is moot
      val sb = new StringBuilder(arr(i - n))
      var k = i - n + 1
      while (k < i) { sb.append(' ').append(arr(k)); k += 1 }
      if (h28(sb.result()) % mod == 0) bounds += i
      i += 1
    }
    bounds += len
    val out = new Array[String](bounds.length - 1)
    var j = 0
    while (j < out.length) {
      out(j) = arr.slice(bounds(j), bounds(j + 1)).mkString(" ")
      j += 1
    }
    out.toSeq
  }

  /** One-pass Gopher token stats (q_quality_gopher): counts of stop-word
    * tokens and fully-alphabetic tokens, returned as (n_stop, n_alpha).
    * The SQL-lambda formulation interprets its predicate per token (the
    * interpreted-HOF rule); this is one JVM loop per document with a
    * hash-set membership probe and a charwise alpha check. */
  private val GopherStops: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("the", "be", "to", "of", "and", "that", "have", "with").foreach(s.add)
    s
  }

  val gopherStats: UserDefinedFunction = udf { (toks: Seq[String]) =>
    var nStop = 0L; var nAlpha = 0L
    val it = toks.iterator
    while (it.hasNext) {
      val t = it.next()
      if (GopherStops.contains(t)) nStop += 1
      var alpha = t.nonEmpty
      var i = 0
      while (alpha && i < t.length) {
        val c = t.charAt(i); alpha = c >= 'a' && c <= 'z'; i += 1
      }
      if (alpha) nAlpha += 1
    }
    (nStop, nAlpha)
  }

  val simhash60md5: UserDefinedFunction = udf { (sh: Seq[String]) =>
    val counts = new Array[Int](60)
    val md = MessageDigest.getInstance("MD5")
    sh.foreach { s =>
      val dig = md.digest(s.getBytes("UTF-8"))
      var h = 0L
      var b = 0
      while (b < 7) { h = (h << 8) | (dig(b) & 0xffL); b += 1 }
      h = (h << 4) | ((dig(7) >> 4) & 0xfL)
      var j = 0
      while (j < 60) {
        if (((h >> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
    }
    var sim = 0L
    var j = 0
    while (j < 60) {
      if (counts(j) > 0) sim |= (1L << (59 - j))
      j += 1
    }
    sim
  }

  /** Modulus for the banded-MinHash permutation family: the Mersenne prime
    * 2³¹−1, so `(a·x + b) mod P` products stay far under 2⁶³ for 28-bit x
    * and 31-bit coefficients on BOTH engines (DuckDB BIGINT and JVM Long
    * overflow identically at 2⁶³, but staying under it makes overflow a
    * non-question). */
  val MinHashP = 2147483647L

  /** Banded 2-row MinHash signatures over a cross-engine-deterministic
    * permutation family: each shingle is md5-hashed ONCE, x = the first 28
    * bits of the digest (7 hex nibbles — what DuckDB reads back with
    * `CAST('0x' || SUBSTR(md5(s), 1, 7) AS BIGINT)`), and permutation k is
    * `(aₖ·x + bₖ) mod (2³¹−1)`. The b-th signature packs that band's two
    * per-permutation minima into one long (`min₀·2³¹ + min₁`). An earlier
    * form salted md5 itself (16 digests per shingle) — one digest + 16
    * integer mixes measured ~2.7× cheaper at the base tier with identical
    * blocking power. One JVM kernel call per row: the `transform`-lambda
    * formulation walks an interpreted eval tree per shingle per
    * permutation. */
  def bandedMinHash(bands: Int, as: Array[Long], bs: Array[Long]): UserDefinedFunction =
    udf { (sh: Seq[String]) =>
      val n = bands * 2
      val mins = Array.fill[Long](n)(Long.MaxValue)
      val md = MessageDigest.getInstance("MD5")
      sh.foreach { s =>
        val dig = md.digest(s.getBytes("UTF-8"))
        val x = ((dig(0) & 0xffL) << 20) | ((dig(1) & 0xffL) << 12) |
                ((dig(2) & 0xffL) << 4) | ((dig(3) >> 4) & 0xfL)
        var k = 0
        while (k < n) {
          val h = (as(k) * x + bs(k)) % MinHashP
          if (h < mins(k)) mins(k) = h
          k += 1
        }
      }
      Array.tabulate(bands)(b => mins(2 * b) * 2147483648L + mins(2 * b + 1))
    }

  // Cosine scoring: see FloatDot — a native codegen Expression (the UDF
  // variant paid Seq[Float] boxing per pair, which dominated the similarity
  // bench). Norms are staged per row as sqrt(graft_float_dot(v, v)); the
  // double arithmetic (ascending sequential fold) is identical to the
  // SQL/DuckDB twins, so integer 1e-4 score encodings stay exact.
}
