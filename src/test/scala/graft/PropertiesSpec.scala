package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based checks (SURVEY §5.2) over GENERATED data — invariants the
  * fixed test tables can't probe. Drives scalacheck Gens directly with fixed
  * seeds (deterministic; each sample is a Spark job so counts stay small). */
class PropertiesSpec extends SparkSpec {

  private def samples[T](g: Gen[T], n: Int = 5): Seq[T] =
    (1 to n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val eventsGen: Gen[List[(Long, Long, Long)]] = for {
    n <- Gen.choose(1, 120)
    rows <- Gen.listOfN(n, for {
      user <- Gen.choose(0L, 3L)
      us <- Gen.choose(0L, 6L * 3600 * 1000000) // 6h span, µs
    } yield (user, us))
  } yield rows.zipWithIndex.map { case ((u, us), i) => (i.toLong, u, us) }

  test("sessionize: sessions partition events; gaps define session breaks") {
    import spark.implicits._
    samples(eventsGen).foreach { rows =>
      val df = rows.toDF("event_id", "user_id", "us")
        .withColumn("ts", timestamp_micros(col("us"))).drop("us")
      val gap = 600L * 1000000 // 10 min
      val sess = graft.ops.TimeSeries.sessionize(df, gap).collect()
      assert(sess.map(_.getLong(2)).sum == rows.length) // partition of events
      val expected = rows.groupBy(_._2).map { case (u, es) =>
        val ts = es.map(_._3).sorted
        u -> (1 + ts.zip(ts.tail).count { case (a, b) => b - a > gap })
      }
      val got = sess.groupBy(_.getLong(0)).map { case (u, ss) => u -> ss.length }
      assert(got == expected, s"sessions per user mismatch for ${rows.take(5)}…")
    }
  }

  test("cents-sum is order-independent: any repartitioning gives the same total") {
    import spark.implicits._
    val gen = for {
      xs <- Gen.listOfN(200, Gen.choose(-1e6, 1e6))
      parts <- Gen.choose(1, 16)
    } yield (xs, parts)
    samples(gen).foreach { case (xs, parts) =>
      val got = xs.toDF("x").repartition(parts)
        .agg(graft.ops.Det.moneySum(col("x"))).collect()(0).getLong(0)
      val want = xs.map(v => math.round(v * 100)).sum
      assert(got == want)
    }
  }

  test("exact dedup keeps exactly one survivor per normalized text, the min id") {
    import spark.implicits._
    val corpusGen = for {
      base <- Gen.nonEmptyListOf(Gen.alphaLowerStr.suchThat(_.nonEmpty))
      dups <- Gen.someOf(base)
    } yield (base ++ dups ++ dups).zipWithIndex.map { case (t, i) => (i.toLong, t) }
    samples(corpusGen).foreach { docs =>
      val df = docs.toDF("doc_id", "text")
      val out = df.select(expr("md5(lower(trim(text)))").as("h"), col("doc_id"))
        .groupBy(col("h"))
        .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_dups"))
        .collect()
      val byText = docs.groupBy(_._2.trim.toLowerCase)
      assert(out.length == byText.size)
      assert(out.map(_.getLong(2)).sum == docs.length)
      val expectedKeeps = byText.values.map(_.map(_._1).min).toSet
      assert(out.map(_.getLong(1)).toSet == expectedKeeps)
    }
  }

  test("label propagation AND star contraction equal union-find on random graphs") {
    import spark.implicits._
    val graphGen = for {
      n <- Gen.choose(2, 40)
      m <- Gen.choose(1, 60)
      edges <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong - 1)
        b <- Gen.choose(0L, n.toLong - 1) if a != b
      } yield (math.min(a, b), math.max(a, b)))
    } yield edges.distinct
    samples(graphGen).filter(_.nonEmpty).foreach { edges =>
      val got = graft.ops.LlmOps.labelPropagation(edges.toDF("doc_a", "doc_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val gotStar = graft.ops.LlmOps.starContraction(edges.toDF("doc_a", "doc_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // union-find reference
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val want = parent.keys.map(x => x -> find(x)).toMap
      // find() with min-merge makes every root the component minimum
      assert(got == want, s"labels diverged for edges=${edges.take(8)}…")
      assert(gotStar == want, s"star labels diverged for edges=${edges.take(8)}…")
    }
  }

  test("FloatDot (codegen) is bit-identical to the sequential double fold") {
    import spark.implicits._
    // resolves via spark.sql.extensions=graft.GraftExtensions (SparkSpec)
    val gen = for {
      n <- Gen.choose(1, 80)
      a <- Gen.listOfN(n, Gen.choose(-10f, 10f))
      b <- Gen.listOfN(n, Gen.choose(-10f, 10f))
    } yield (a, b)
    samples(gen).foreach { case (a, b) =>
      val got = Seq((a, b)).toDF("a", "b")
        .select(expr("graft_float_dot(a, b)")).collect()(0).getDouble(0)
      var want = 0.0
      a.zip(b).foreach { case (x, y) => want += x.toDouble * y.toDouble }
      assert(got == want, s"codegen dot drifted from reference fold: $got vs $want")
    }
  }

  test("GeoMean is invariant under repartitioning (merge associativity)") {
    import spark.implicits._
    val gen = for {
      xs <- Gen.nonEmptyListOf(Gen.choose(0.01, 1e4))
      parts <- Gen.choose(1, 12)
    } yield (xs, parts)
    samples(gen).foreach { case (xs, parts) =>
      val geo = udaf(graft.functions.GeoMean)
      val got = xs.toDF("v").repartition(parts)
        .agg(geo(col("v"))).collect()(0).getDouble(0)
      val want = math.exp(xs.map(math.log).sum / xs.size)
      assert(math.abs(got - want) <= 1e-9 * math.max(1.0, want))
    }
  }

  test("z-order interleave is a bijection: de-interleaving recovers both dims") {
    import spark.implicits._
    val pairGen = Gen.listOfN(50, for {
      x <- Gen.choose(0L, 65535L)
      y <- Gen.choose(0L, 65535L)
    } yield (x, y))
    samples(pairGen, 3).foreach { pairs =>
      val got = pairs.toDF("x", "y")
        .withColumn("zkey", expr(
          """aggregate(sequence(0, 15), 0L, (a, k) ->
            |  a + shiftleft(shiftright(x, k) & 1, 2 * k)
            |    + shiftleft(shiftright(y, k) & 1, 2 * k + 1))""".stripMargin))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      got.foreach { case (x, y, z) =>
        var (dx, dy) = (0L, 0L)
        for (k <- 0 until 16) {
          dx |= ((z >> (2 * k)) & 1) << k
          dy |= ((z >> (2 * k + 1)) & 1) << k
        }
        assert(dx == x && dy == y, s"($x,$y) -> $z -> ($dx,$dy)")
      }
      assert(got.map(_._3).distinct.length == got.map(p => (p._1, p._2)).distinct.length)
    }
  }

  test("int8 quantization: codes bounded, dequant error ≤ scale/2 on random vectors") {
    import spark.implicits._
    val vecGen = Gen.listOfN(20, Gen.listOfN(16, Gen.choose(-1000, 1000).map(_ / 250.0f)))
    samples(vecGen, 3).foreach { vecs =>
      val nz = vecs.filter(_.exists(_ != 0f))
      if (nz.nonEmpty) {
        val rows = nz.zipWithIndex.map { case (v, i) => (i.toLong, v) }
          .toDF("vec_id", "embedding")
          .withColumn("amax",
            expr("aggregate(embedding, cast(0.0 as double), (a, x) -> greatest(a, abs(cast(x as double))))"))
          .withColumn("scale", col("amax") / 127)
          .select(col("vec_id"), col("scale"),
            expr("transform(embedding, x -> cast(floor(cast(x as double) / scale + 0.5d) as int))").as("q"),
            col("embedding"))
          .collect()
        rows.foreach { r =>
          val scale = r.getDouble(1)
          val q = r.getSeq[Int](2)
          val v = r.getSeq[Float](3)
          assert(q.forall(c => c >= -127 && c <= 127))
          q.zip(v).foreach { case (c, x) =>
            assert(math.abs(c * scale - x) <= scale / 2 + 1e-12,
              s"vec ${r.getLong(0)}: code $c for $x at scale $scale")
          }
        }
      }
    }
  }

  // DistRank replaced the global single-partition windows (q_win_dist,
  // q_rfm); this pins its histogram rank + integer ntile/percent_rank/
  // cume_dist formulas against Spark's OWN window functions on arbitrary
  // data — n = 1, n < k, heavy value ties (distinct tie keys), negative
  // values, bucket widths from degenerate (1) to one-bucket-holds-all.
  test("DistRank ≡ ntile/percent_rank/cume_dist over the global window") {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(1, 80)
      vals <- Gen.listOfN(n, Gen.choose(-500L, 500L))
      width <- Gen.oneOf(1L, 7L, 100L, 5000L)
      k <- Gen.oneOf(2, 4, 7)
    } yield (vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }, width, k)
    samples(gen, 8).foreach { case (rows, width, k) =>
      val df = rows.toDF("id", "v")
      val got = graft.ops.DistRank
        .withGlobalRank(df, col("v"), col("id"), width, "r", "n")
        .select(col("id"),
          graft.ops.DistRank.ntileFromRank("r", "n", k).as("t"),
          round(graft.ops.DistRank.percentRankFromRank(col("r"), col("n")), 9).as("pr"),
          round(graft.ops.DistRank.cumeDistFromRank(col("r"), col("n")), 9).as("cd"))
        .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2), r.getDouble(3))).toMap
      val w = Window.orderBy(col("v"), col("id"))
      val want = df.select(col("id"), ntile(k).over(w).as("t"),
          round(percent_rank().over(w), 9).as("pr"),
          round(cume_dist().over(w), 9).as("cd"))
        .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2), r.getDouble(3))).toMap
      assert(got == want, s"width=$width k=$k rows=${rows.take(6)}…")
    }
  }
}
