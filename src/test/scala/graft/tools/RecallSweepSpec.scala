package graft.tools

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.VectorOps

/** Pins the contract RecallSweep's runtime guard re-checks per run:
  * the sweep's nearest-k probe at k=2 is the SAME ranking as the
  * deployed [[VectorOps.nearest2Pivots]] — rounded cosine6 ordering
  * with first-wins ties toward the lowest pivot id. If the two ever
  * diverge, the sweep would be measuring an index nobody serves. */
class RecallSweepSpec extends AnyFunSuite {

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val vec: Gen[Array[Double]] =
    Gen.listOfN(8, Gen.chooseNum(-100, 100).map(_ / 10.0)).map(_.toArray)

  test("property: nearestKPivots(k=2) == nearest2Pivots elementwise") {
    val cases = samples(for {
      nPiv <- Gen.chooseNum(2, 12)
      pivots <- Gen.listOfN(nPiv, vec)
      v <- vec
    } yield (v, pivots.toArray), 200)
    assert(cases.nonEmpty)
    cases.foreach { case (v, pivots) =>
      val (b1, b2) = VectorOps.nearest2Pivots(v, pivots)
      val topK = RecallSweep.nearestKPivots(v, pivots, 2)
      assert(topK.toSeq === Seq(b1, b2))
    }
  }

  test("nearestKPivots ties go to the lowest pivot id (duplicate pivots)") {
    val p = Array(1.0, 0.0, 0.0, 0.0)
    // pivots 1 and 2 are identical; both tie at cosine 1.0 with the
    // query — rank order must be (1, 2), never (2, 1)
    val pivots = Array(Array(0.0, 1.0, 0.0, 0.0), p.clone(), p.clone())
    assert(RecallSweep.nearestKPivots(p, pivots, 3).toSeq === Seq(1, 2, 0))
    assert(VectorOps.nearest2Pivots(p, pivots) === ((1, 2)))
  }

  test("nearestKPivots at k = B is a full ranking (exhaustive probe)") {
    samples(for { pivots <- Gen.listOfN(6, vec); v <- vec }
      yield (v, pivots.toArray), 50).foreach { case (v, pivots) =>
      val full = RecallSweep.nearestKPivots(v, pivots, pivots.length)
      assert(full.sorted.toSeq === pivots.indices.toSeq)
    }
  }
}
