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
