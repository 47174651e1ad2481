package graft

import org.scalatest.funsuite.AnyFunSuite

/** The scale-corpus generator's text bijections (ScaleGen.charPerms):
  * every per-copy character map must be a true permutation of the
  * 36-char alphabet (a non-bijective map would merge tokens WITHIN a
  * copy and silently change dup-group/Jaccard structure), all k maps
  * must be pairwise distinct (cross-copy vocabulary disjointness is
  * what keeps near-dup pair counts linear in k), and the first 36 must
  * equal the round-5 rotations so pre-existing x10/x32 growth curves
  * stay comparable.
  */
class ScaleGenSpec extends AnyFunSuite {
  private val Alpha = ScaleGen.Alpha

  test("all 432 affine maps are distinct permutations of the alphabet") {
    val all = ScaleGen.charPerms(432)
    assert(all.size == 432)
    assert(all.toSet.size == 432, "maps must be pairwise distinct")
    all.foreach(p => assert(p.sorted == Alpha.sorted, s"not a bijection: $p"))
    assertThrows[IllegalArgumentException](ScaleGen.charPerms(433))
  }

  test("the first 36 maps are the round-5 rotations (series continuity)") {
    val rotations = (0 until 36).map(r => Alpha.drop(r) + Alpha.take(r))
    assert(ScaleGen.charPerms(36) == rotations)
  }
}
