package graft.functions

import scala.io.Source

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Randomized cross-engine parity probe for the Jaro-Winkler
  * convention: 20k seeded random pairs scored by DuckDB's native
  * `jaro_winkler_similarity` (fixture `jaro_parity.csv`, generator
  * `tools/gen_jaro_parity_fixture.py`), replayed through
  * `JaroWinklerExpr.jaroWinkler`. This is what pins the convention
  * EDGES the textbook pins (Wave3Spec) and the part-name oracle
  * (`q_jaro_pairs`) cannot reach: odd transposition counts through the
  * integer `t/2`, the 0.7 boost-threshold boundary, match-window
  * floors on short strings, empties, and non-ASCII (accented latin,
  * greek, CJK, astral-plane emoji) under the UTF-8 BYTE convention —
  * this very probe exposed that DuckDB scores over encoded bytes, not
  * code points, and the kernel was switched to match.
  *
  * Both engines end in the same double arithmetic on small integers,
  * so agreement is required to 1e-12 — effectively bit-parity with
  * room for one associativity difference in the final 3-term average.
  */
class JaroParitySpec extends AnyFunSuite with Matchers {

  test("20k-random-pair DuckDB parity: conventions agree on every pair") {
    val in = getClass.getResourceAsStream("/jaro_parity.csv")
    in should not be null
    val src = Source.fromInputStream(in, "UTF-8")
    try {
      val lines = src.getLines().drop(1).toVector
      lines.size should be >= 20000
      var checked = 0
      lines.foreach { line =>
        // generator guarantees comma-free, quote-free strings
        val i = line.indexOf(',')
        val j = line.lastIndexOf(',')
        val a = line.substring(0, i)
        val b = line.substring(i + 1, j)
        val expected = line.substring(j + 1).toDouble
        val got = JaroWinklerExpr.jaroWinkler(a, b)
        withClue(s"pair (${a.length} cp '$a', ${b.length} cp '$b'): ") {
          got shouldBe expected +- 1e-12
        }
        checked += 1
      }
      checked should be >= 20000
    } finally src.close()
  }
}
