package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Mix64

/** Property tests for the aggregation algebra the reference demonstrates by
  * example (SURVEY §5.3) and for the hash kernels. Raw scalacheck driven
  * from funsuite (no scalatestplus bridge in the offline dep set).
  */
class PropertySpec extends AnyFunSuite {

  private def check(name: String)(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, s"$name: $res")
  }

  private val groups: Gen[List[List[Double]]] =
    Gen.nonEmptyListOf(Gen.nonEmptyListOf(Gen.choose(0, 10000000).map(_ / 100.0)))

  test("sum is re-aggregable over any grouping") {
    check("sum-reagg")(Prop.forAll(groups) { gs =>
      val flat = gs.flatten
      math.abs(gs.map(_.sum).sum - flat.sum) < 1e-4
    })
  }

  test("weighted recombination of group averages recovers the global average") {
    check("weighted-avg")(Prop.forAll(groups) { gs =>
      val flat = gs.flatten
      val recombined = gs.map(g => (g.sum / g.size) * g.size).sum / flat.size
      math.abs(recombined - flat.sum / flat.size) < 1e-4
    })
  }

  test("avg-of-avgs differs from the global avg when group sizes are skewed") {
    // the reference's Q2 lesson (assignment-5.md:160–187), pinned concretely
    val gs = List(List(1.0), List(100.0, 100.0, 100.0))
    val avgOfAvgs = gs.map(g => g.sum / g.size).sum / gs.size
    val global = gs.flatten.sum / gs.flatten.size
    assert(math.abs(avgOfAvgs - global) > 1.0)
  }

  test("cumulative sum's final element equals the total") {
    check("cumsum")(Prop.forAll(Gen.nonEmptyListOf(Gen.choose(-1000.0, 1000.0))) { xs =>
      math.abs(xs.scanLeft(0.0)(_ + _).tail.last - xs.sum) < 1e-6
    })
  }

  test("Mix64.mix is injective on samples (bijective finalizer)") {
    check("mix64-injective")(Prop.forAll(Gen.listOfN(500, Gen.long)) { xs =>
      xs.map(Mix64.mix).distinct.size == xs.distinct.size
    })
  }

  test("Mix64 seeded streams decorrelate") {
    check("mix64-seeds")(Prop.forAll(Gen.long) { x =>
      Mix64.mix(x ^ 1L) != Mix64.mix(x ^ 2L)
    })
  }

  // ---- FD closure algebra ------------------------------------------------

  private val attrNames: Gen[String] = Gen.oneOf("a", "b", "c", "d", "e", "f")
  private val fdGen: Gen[(String, Set[String])] = for {
    det <- attrNames
    deps <- Gen.nonEmptyListOf(attrNames)
  } yield (det, deps.toSet)

  test("FD closure is monotone: adding declarations never shrinks it") {
    check("fd-monotone")(Prop.forAll(Gen.listOf(fdGen), fdGen, Gen.someOf("a", "b", "c")) {
      (fds, extra, grouped) =>
        import graft.plans.FdRegistry
        FdRegistry.synchronized {
          FdRegistry.clear()
          fds.foreach { case (d, deps) => FdRegistry.declare(d, deps) }
          val before = FdRegistry.dependentsOf(grouped.toSet)
          FdRegistry.declare(extra._1, extra._2)
          val after = FdRegistry.dependentsOf(grouped.toSet)
          FdRegistry.clear()
          before.subsetOf(after)
        }
    })
  }

  test("composite determinants fire only when every part is grouped") {
    import graft.plans.FdRegistry
    FdRegistry.synchronized {
      FdRegistry.clear()
      FdRegistry.declareFor("t", Set("a", "b"), Set("x"))
      val t1: FdRegistry.Scope = ("t", 1L)
      assert(FdRegistry.closure(Set(("a", Set(t1)))).isEmpty)
      assert(FdRegistry.closure(Set(("b", Set(t1)))).isEmpty)
      assert(FdRegistry.closure(Set(("a", Set(t1)), ("b", Set(t1))))
        == Set(("x", Some(t1))))
      FdRegistry.clear()
    }
  }

  test("word gram hashes equal the split/xxhash64 reference on random text") {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    import org.apache.spark.unsafe.types.UTF8String
    import graft.functions.WordGramHashes
    // words of ASCII + multi-byte chars, glued with single/double spaces,
    // optional leading/trailing separators — every split edge case
    val word = Gen.stringOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('ü', 'ж', '.')))
    val textGen = for {
      ws <- Gen.listOf(word)
      seps <- Gen.listOfN(math.max(ws.size - 1, 0), Gen.oneOf(" ", "  "))
      lead <- Gen.oneOf("", " ")
      trail <- Gen.oneOf("", " ")
    } yield lead + (if (ws.isEmpty) "" else
      ws.head + seps.zip(ws.tail).map { case (s, w) => s + w }.mkString) + trail
    check("wordgram-ref")(Prop.forAll(textGen) { t =>
      val native = WordGramHashes
        .gramHashes(UTF8String.fromString(t), 3).toLongArray().toSeq
      val words = t.split(" ", -1)
      val hw = words.map { w =>
        val b = UTF8String.fromString(w)
        XXH64.hashUnsafeBytes(b.getBaseObject, b.getBaseOffset, b.numBytes, 42L)
      }
      val ref =
        if (words.length < 3) Seq.empty[Long]
        else (0 to words.length - 3).map { i =>
          var h = 42L
          (0 until 3).foreach(k => h = XXH64.hashLong(hw(i + k), h))
          h
        }
      native == ref
    })
  }

  test("stride-48 chunk windows cover every token; overlap only between neighbors") {
    // pure model of text_chunk's start/length math (C=64, S=48)
    val C = 64; val S = 48
    check("chunk-cover")(Prop.forAll(Gen.choose(1, 2000)) { n =>
      val starts = 0 until n by S
      val lens = starts.map(st => math.min(C, n - st))
      val covered = starts.zip(lens).flatMap { case (st, l) => st until st + l }
      lens.forall(l => l >= 1 && l <= C) &&
        covered.toSet == (0 until n).toSet &&
        // a token can appear in at most two chunks (C < 2*S)
        covered.groupBy(identity).values.forall(_.size <= 2)
    })
  }

  test("int8 max-abs quantization bounds every element's residual by scale/254") {
    // pure model of embedding_quantize's kernel
    val vecGen = Gen.nonEmptyListOf(Gen.choose(-1000000, 1000000).map(_ / 1000.0))
      .suchThat(_.exists(_ != 0.0))
    check("quant-bound")(Prop.forAll(vecGen) { xs =>
      val scale = xs.map(math.abs).max
      val qs = xs.map(x => math.round(x * 127.0 / scale).toDouble)
      qs.map(math.abs).max == 127.0 &&
        xs.zip(qs).forall { case (x, q) =>
          math.abs(x - q * scale / 127.0) <= scale / 254.0 * (1 + 1e-9)
        }
    })
  }
}
