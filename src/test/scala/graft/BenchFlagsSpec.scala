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
}
