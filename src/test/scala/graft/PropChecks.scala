package graft

import org.scalacheck.{Prop, Test => ScTest}

/** Minimal ScalaCheck bridge (scalatestplus is not in the offline cache). */
trait PropChecks {
  def checkProp(p: Prop, minSuccessful: Int = 100): Unit = {
    val params = ScTest.Parameters.default
      .withMinSuccessfulTests(minSuccessful)
      .withInitialSeed(org.scalacheck.rng.Seed(42L))
    val res = ScTest.check(params, p)
    assert(res.passed, s"property failed: ${res.status}")
  }
}
