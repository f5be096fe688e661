package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bracket_contended predicate (r11 VERDICT item 3): synthetic
  * readings must flip it exactly when any bracket side crosses 2x the
  * quiet mem floor — and never with baselines off (adjudication
  * intentionally dark is not "clean"). */
class BenchFlagsSpec extends AnyFunSuite {

  private val quiet = Seq(
    "a" -> ((1.1, 1.2)), "b" -> ((1.0, 1.3)), "c" -> ((1.2, 1.1)))

  test("quiet brackets stay unflagged; one hot reading on EITHER side " +
      "flips the flag") {
    assert(!Bench.bracketContendedFlag(quiet, 1.2, baselinesOn = true))
    // hot POST (the r11 tri_mem_post shape: 4.96 vs floor ~1.2)
    val hotPost = quiet :+ ("d" -> ((1.1, 4.96)))
    assert(Bench.bracketContendedFlag(hotPost, 1.2, baselinesOn = true))
    // hot PRE only — the key itself may still read clean, the BOX isn't
    val hotPre = quiet :+ ("d" -> ((8.7, 1.1)))
    assert(Bench.bracketContendedFlag(hotPre, 1.2, baselinesOn = true))
    // exactly at the bar does not flip (strict >)
    assert(!Bench.bracketContendedFlag(
      Seq("e" -> ((2.4, 2.4))), 1.2, baselinesOn = true))
  }

  test("baselines off forces the flag dark, never false-clean-true") {
    assert(!Bench.bracketContendedFlag(
      Seq("d" -> ((1.1, 99.0))), 1.2, baselinesOn = false))
  }

  test("rerunFlagged end to end: selects exactly the hot-bracketed keys, " +
      "probes each once, replaces readings per the adjudication kernel") {
    val floor = 1.2
    val probed = Seq(
      "quiet_key" -> Seq(3.0, 3.1),   // clean bracket: untouched
      "hot_fast"  -> Seq(18.0, 17.98), // hot bracket; clean re-run wins
      "hot_slow"  -> Seq(9.0, 9.2))    // hot bracket; hot re-run, orig better
    val brackets = Seq(
      "quiet_key" -> ((1.1, 1.2)),
      "hot_fast"  -> ((1.2, 4.9)),
      "hot_slow"  -> ((12.7, 1.2)))
    var probes = List.empty[(String, String)]
    var quiesces = 0
    // canary schedule: hot_fast re-runs under a CLEAN bracket (1.1, 1.2);
    // hot_slow under a HOT one (1.1, 4.0) with a slower reading
    val canaries = Iterator(1.1, 1.2, 1.1, 4.0)
    val rerunSamples = Map(
      "hot_fast" -> Seq(5.2, 5.12), "hot_slow" -> Seq(17.98, 18.5))
    val (adj, reruns) = Bench.rerunFlagged("sf10", probed, brackets,
      memExpected = floor, baselinesOn = true,
      probe = (t, k) => { probes ::= (t, k); rerunSamples(k) },
      canary = () => canaries.next(),
      quiesce = () => quiesces += 1)
    // exactly the two hot keys probed, once each, under the rerun label
    assert(probes.reverse == List(("sf10.rerun", "hot_fast"),
      ("sf10.rerun", "hot_slow")))
    assert(quiesces == 2)
    val byKey = adj.toMap
    assert(byKey("quiet_key") == Seq(3.0, 3.1)) // untouched
    assert(byKey("hot_fast") == Seq(5.2, 5.12)) // clean re-run reported
    assert(byKey("hot_slow") == Seq(9.0, 9.2))  // box condemned twice; orig
    assert(reruns.map(r => (r.key, r.used)) ==
      Seq(("hot_fast", "rerun"), ("hot_slow", "orig")))
    // baselines off: nothing re-runs even with hot brackets
    val (adj2, rr2) = Bench.rerunFlagged("sf10", probed, brackets,
      memExpected = floor, baselinesOn = false,
      probe = (_, _) => fail("must not probe with baselines off"),
      canary = () => fail("must not canary with baselines off"))
    assert(adj2 == probed && rr2.isEmpty)
  }

  test("re-run adjudication (r12 VERDICT item 1): a clean re-run bracket " +
      "supplies the reading even when slower; a hot one condemns the box " +
      "and keeps the better reading") {
    val floor = 1.2
    // the r12 driver shape: orig read 17.98 with a hot bracket, re-run
    // reads 5.12 under a clean bracket -> the clean reading reports
    assert(Bench.rerunChoice(17.98, 5.12, 1.1, 1.2, floor) == "rerun")
    // clean re-run bracket but SLOWER re-run: still the re-run — it is
    // the in-record quiet-box number, not the lucky one
    assert(Bench.rerunChoice(4.0, 5.0, 1.1, 1.2, floor) == "rerun")
    // hot re-run bracket, re-run faster anyway: better evidence wins
    assert(Bench.rerunChoice(17.98, 9.0, 4.9, 1.2, floor) == "rerun")
    // hot re-run bracket, re-run slower: box condemned twice, the
    // original (better) reading stays on record
    assert(Bench.rerunChoice(9.0, 17.98, 1.2, 4.9, floor) == "orig")
    // which keys re-run at all: strictly >2x floor on either side
    assert(Bench.bracketHot((1.1, 2.5), floor))
    assert(Bench.bracketHot((2.5, 1.1), floor))
    assert(!Bench.bracketHot((2.4, 2.4), floor))
  }
}
