package graft.did

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** Replays the frozen end-to-end run and diffs it against the committed
  * fixture. Numeric tokens compare at 1e-9 (abs + rel) — wide enough for
  * aggregation-order float jitter, far tighter than any semantic change;
  * everything else (labels, cell grid, skip flags, row count and order)
  * must match exactly. */
class GoldenFixtureSpec extends AnyFunSuite with SparkSpec {

  test("end-to-end seeded run matches the committed golden fixture") {
    val in = getClass.getResourceAsStream("/" + GoldenFixture.resourceName)
    assert(in != null, s"missing resource ${GoldenFixture.resourceName} — " +
      "regenerate with: sbt \"Test/runMain graft.did.GoldenFixture\"")
    val golden = scala.io.Source.fromInputStream(in, "UTF-8")
      .getLines().toVector
    val fresh = GoldenFixture.lines(spark).toVector

    assert(fresh.length == golden.length,
      s"row count drifted: ${fresh.length} vs golden ${golden.length}")
    fresh.zip(golden).zipWithIndex.foreach { case ((f, g), ln) =>
      val ft = f.split(",", -1)
      val gt = g.split(",", -1)
      assert(ft.length == gt.length, s"line ${ln + 1} arity: '$f' vs '$g'")
      ft.zip(gt).foreach { case (a, b) =>
        (a.toDoubleOption, b.toDoubleOption) match {
          case (Some(x), Some(y)) =>
            assert(math.abs(x - y) <= 1e-9 + 1e-9 * math.abs(y),
              s"line ${ln + 1}: $x vs golden $y in '$g'")
          case _ =>
            assert(a == b, s"line ${ln + 1}: '$a' vs golden '$b'")
        }
      }
    }
  }
}
