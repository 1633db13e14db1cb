package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.text.Winnow

/** Winnowing fingerprint guarantees (Schleimer et al., SIGMOD'03). */
class WinnowSpec extends AnyFunSuite {

  test("identical documents share all fingerprints") {
    val t = "die verſammlung der stadt und das land"
    assert(Winnow.fingerprints(t).toSeq == Winnow.fingerprints(t).toSeq)
  }

  test("a shared substring of length >= w+k-1 yields a shared fingerprint") {
    val shared = "gemeinsamer textabschnitt hier"
    val a = "prefix eins " + shared + " suffix alpha"
    val b = "anderer anfang " + shared + " ende beta"
    val fa = Winnow.fingerprints(a, 5, 4).toSet
    val fb = Winnow.fingerprints(b, 5, 4).toSet
    assert((fa & fb).nonEmpty)
  }

  test("disjoint alphabets share nothing; short/empty inputs are safe") {
    val fa = Winnow.fingerprints("aaaa bbbb cccc dddd", 5, 4).toSet
    val fb = Winnow.fingerprints("wxyz wzyx zyxw xywz", 5, 4).toSet
    assert((fa & fb).isEmpty)
    assert(Winnow.fingerprints("", 5, 4).isEmpty)
    assert(Winnow.fingerprints("abc", 5, 4).isEmpty)
    assert(Winnow.rollingHashes("abcde", 5).length == 1)
  }

  test("rolling hash equals direct hash at every position") {
    val t = "abcdefghij"
    val k = 4
    val rolled = Winnow.rollingHashes(t, k)
    val direct = (0 to t.length - k).map { i =>
      t.substring(i, i + k).foldLeft(0L)((h, c) => h * Winnow.Base + c)
    }
    assert(rolled.toSeq == direct)
  }
}
