package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Minimal deterministic property runner (scalatestplus-scalacheck is not
  * in the offline cache; plain scalacheck Gen + fixed seeds suffice). */
trait PropHelper {
  def forAllN[T](gen: Gen[T], n: Int = 200)(f: T => Unit): Unit = {
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, Seed(42L + i)) match {
        case Some(v) =>
          try f(v)
          catch {
            case e: Throwable =>
              throw new AssertionError(s"property failed for input $v (seed ${42L + i})", e)
          }
        case None => ()
      }
      i += 1
    }
  }
}
