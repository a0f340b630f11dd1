package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Deterministic ScalaCheck driver shared by the kernel property specs
  * (scalatestplus isn't in the offline cache, so generators are driven
  * directly). Unlike a bare `gen.apply(...).foreach(f)` loop, this one
  * retries failed generations (a `suchThat` miss returns None) and COUNTS
  * successful evaluations, failing loudly if fewer than `n` cases ran — a
  * property can't silently pass vacuously because its generator started
  * failing.
  */
object PropDrive {

  def forAll[A](gen: Gen[A], n: Int = 200, seed0: Long = 42L)(f: A => Unit): Unit = {
    var seed = Seed(seed0)
    var executed = 0
    var attempts = 0
    val maxAttempts = n * 10
    while (executed < n && attempts < maxAttempts) {
      gen.apply(Gen.Parameters.default, seed) match {
        case Some(a) => f(a); executed += 1
        case None    => // generator miss (e.g. suchThat) — retry with next seed
      }
      seed = seed.next
      attempts += 1
    }
    assert(executed == n,
      s"property ran only $executed of $n cases in $attempts attempts — generator is failing")
  }

  def forAll[A, B](genA: Gen[A], genB: Gen[B])(f: (A, B) => Unit): Unit =
    forAll(Gen.zip(genA, genB))(t => f(t._1, t._2))
}
