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

  /** 32-bit SimHash with bits derived from md5(shingle) — bit-identical to
    * the SQL/DuckDB formulation `CONV(SUBSTR(md5(s),1,8),16,10)` (first four
    * digest bytes, big-endian), so the query stays oracle-able. */
  val simhash32md5: UserDefinedFunction = udf { (sh: Seq[String]) =>
    val counts = new Array[Int](32)
    val md = MessageDigest.getInstance("MD5")
    sh.foreach { s =>
      val dig = md.digest(s.getBytes("UTF-8"))
      val h = ((dig(0) & 0xffL) << 24) | ((dig(1) & 0xffL) << 16) |
              ((dig(2) & 0xffL) << 8) | (dig(3) & 0xffL)
      var j = 0
      while (j < 32) {
        if (((h >> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
    }
    var sim = 0L
    var j = 0
    while (j < 32) {
      if (counts(j) > 0) sim |= (1L << (31 - j))
      j += 1
    }
    sim
  }

  // Cosine scoring: see FloatDot — a native codegen Expression (the UDF
  // variant paid Seq[Float] boxing per pair, which dominated the similarity
  // bench). Norms are staged per row as sqrt(graft_float_dot(v, v)); the
  // double arithmetic (ascending sequential fold) is identical to the
  // SQL/DuckDB twins, so integer 1e-4 score encodings stay exact.
}
