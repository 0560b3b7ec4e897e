package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.expressions.Literal

/** The FastRound fast path must agree with Catalyst's BigDecimal HALF_UP
  * on EVERY double, including the region the original fixed 1e-9 band
  * under-covered: |x·10ˢ| beyond ~4.5e6, where the shortest-decimal /
  * binary discrepancy grows past a fixed absolute band. Pure-JVM test
  * (no Spark session): hammers the exact method pair the codegen
  * template mirrors. */
class FastRoundSpec extends AnyFunSuite {

  test("fast path ≡ BigDecimal HALF_UP across magnitudes, incl. .5 boundaries") {
    val rng = new scala.util.Random(42)
    for (scale <- Seq(4, 6, 9)) {
      val fr = graft.functions.FastRound(Literal(0.0), scale)
      val pow = math.pow(10.0, scale)
      // adversarial: doubles landing ON or NEAR a .5 decimal boundary in
      // scaled units up to 1e11 — far past the old band's safe range;
      // negatives included (HALF_UP rounds away from zero there)
      val boundary = (0 until 4000).map { _ =>
        (rng.nextLong() % 100000000000L + 0.5) / pow
      }
      // uniform sweep over ±2e7 scaled units
      val uniform = (0 until 4000).map(_ => (rng.nextDouble() - 0.5) * 4e7 / pow)
      for (x <- boundary ++ uniform)
        assert(fr.fastRound(x) === fr.exactRound(x),
          s"scale=$scale x=$x fast=${fr.fastRound(x)} exact=${fr.exactRound(x)}")
      // the canonical divergence traps: exact .5 at small magnitude and
      // the negative away-from-zero case
      assert(fr.fastRound(0.5 / pow) === fr.exactRound(0.5 / pow))
      assert(fr.fastRound(-0.5 / pow) === fr.exactRound(-0.5 / pow))
    }
  }
}
