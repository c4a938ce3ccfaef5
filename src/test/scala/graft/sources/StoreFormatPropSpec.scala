package graft.sources

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property checks over the store's METADATA formats — pure parsing/value
  * kernels, no Spark session: the 8-field manifest entry line (with its
  * legacy-width compatibility ladder) and the partition spec's
  * value/dir/line functions. These formats are load-bearing for every
  * commit, prune, CDF diff, and tail offset; a silent field drift would
  * corrupt tables, so the round-trip IS the contract. */
class StoreFormatPropSpec extends AnyFunSuite {

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("manifest entry lines round-trip all eight fields on random entries") {
    val entryGen = for {
      dir <- Gen.oneOf("", "grp=F/", "k_bucket=3/")
      base <- Gen.alphaNumStr.suchThat(_.nonEmpty).map(s => s"part-${s.take(12)}")
      rows <- Gen.choose(0L, 1000000L)
      zoned <- Gen.oneOf(true, false)
      mn <- Gen.choose(-100000L, 100000L)
      span <- Gen.choose(0L, 100000L)
      bloom <- Gen.oneOf(Gen.const(None), Gen.choose(Long.MinValue, Long.MaxValue).map(Some(_)))
      bytes <- Gen.oneOf(Gen.const(None), Gen.choose(0L, 1L << 40).map(Some(_)))
      dv <- Gen.oneOf(Gen.const(None), Gen.const(Some(s"$dir$base.dv-abc")))
      part <- Gen.oneOf(Gen.const(None), Gen.const(Some("F")), Gen.const(Some("3")))
      eq <- Gen.oneOf(Gen.const(None), Gen.const(Some(s"$dir$base.eq-abc")))
      zonedA <- Gen.oneOf(true, false)
      mnA <- Gen.choose(-100000L, 100000L)
      spanA <- Gen.choose(0L, 100000L)
    } yield StoreSink.StoreFileEntry(dir + base, rows,
      if (zoned) Some(mn) else None, if (zoned) Some(mn + span) else None,
      bloom, bytes, dv, part, eq,
      if (zonedA) Some(mnA) else None, if (zonedA) Some(mnA + spanA) else None)
    samples(entryGen, 200).foreach { e =>
      val back = StoreSink.parseEntry(e.line)
      assert(back == e, s"line round-trip mismatch: ${e.line} -> $back")
      // the read token is the (name, vector, eq-mask) triple — identity for
      // pruning, compaction inputs, CDF diffs, and the tail's prefix sig
      assert(back.token == e.name + e.dv.map("@" + _).getOrElse("") +
        e.eq.map("#" + _).getOrElse(""))
    }
    // legacy widths: 4-field (pre-bloom), 6-field (pre-dv), 9-field
    // (pre-amt-zones), and bare-name lines all parse with absent extras
    assert(StoreSink.parseEntry("f|10|1|9") ==
      StoreSink.StoreFileEntry("f", 10, Some(1L), Some(9L)))
    assert(StoreSink.parseEntry("f|10|1|9|ff|5") ==
      StoreSink.StoreFileEntry("f", 10, Some(1L), Some(9L), Some(255L), Some(5L)))
    assert(StoreSink.parseEntry("f|10|1|9|ff|5|-|-|f.eq-1") ==
      StoreSink.StoreFileEntry("f", 10, Some(1L), Some(9L), Some(255L), Some(5L),
        None, None, Some("f.eq-1")))
    // amt zones without an eq sidecar emit the "-" placeholder at field 9
    val amtOnly = StoreSink.StoreFileEntry("f", 10, Some(1L), Some(9L),
      Some(255L), Some(5L), None, None, None, Some(-3L), Some(44L))
    assert(amtOnly.line == "f|10|1|9|ff|5|-|-|-|-3|44")
    assert(StoreSink.parseEntry(amtOnly.line) == amtOnly)
    assert(StoreSink.parseEntry("bare-name") ==
      StoreSink.StoreFileEntry("bare-name", -1L, None, None))
  }

  test("PartSpec: bucket values cover [0, n) and dirs/values round-trip the spec") {
    val specGen = Gen.oneOf(
      Gen.choose(1, 64).map(n => StoreSink.parsePartSpec(s"bucket:$n:k")),
      Gen.const(StoreSink.parsePartSpec("identity:grp")))
    val rowGen = for {
      k <- Gen.choose(Long.MinValue + 1, Long.MaxValue)
      g <- Gen.oneOf("F", "O", "P", "weird value!", "x")
    } yield (k, g)
    samples(Gen.zip(specGen, rowGen), 200).foreach { case (sp, (k, g)) =>
      assert(StoreSink.parsePartSpec(sp.line) == sp) // spec line round-trip
      val row = org.apache.spark.sql.catalyst.InternalRow(
        k, org.apache.spark.unsafe.types.UTF8String.fromString(g), 0L)
      val v = sp.valueOf(row, 0)
      if (sp.kind == "bucket") {
        val b = v.toInt
        assert(b >= 0 && b < sp.n, s"bucket $b out of [0, ${sp.n}) for k=$k")
        assert(b == java.lang.Math.floorMod(k, sp.n.toLong).toInt)
      } else assert(v == g)
      // dir names are filesystem-safe regardless of the value
      assert(sp.dirOf(v).matches("[A-Za-z0-9_.=-]+"), sp.dirOf(v))
    }
  }
}
