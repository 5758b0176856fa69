package graft.api

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

class PredicatesSpec extends AnyFunSuite {

  test("wildcard metacharacters translate and LIKE metas are escaped") {
    assert(Predicates.wildcardToLike("a*b?c") == "a%b_c")
    assert(Predicates.wildcardToLike("100%_done") == "100\\%\\_done")
    assert(Predicates.wildcardToLike("") == "")
  }

  test("translation never leaves raw * or ? and escapes pre-existing metas") {
    val gen = Gen.listOf(Gen.oneOf(Gen.alphaNumChar,
      Gen.oneOf('*', '?', '%', '_', ' '))).map(_.mkString)
    val seed = org.scalacheck.rng.Seed(42L)
    Iterator.iterate(seed)(_.next).take(300).foreach { sd =>
      val s = gen.pureApply(Gen.Parameters.default, sd)
      val t = Predicates.wildcardToLike(s)
      assert(!t.contains('*') && !t.contains('?'))
      val unescaped = t.replace("\\%", "").replace("\\_", "")
      assert(unescaped.count(_ == '%') == s.count(_ == '*'), s"input=$s")
      assert(unescaped.count(_ == '_') == s.count(_ == '?'), s"input=$s")
    }
  }
}
