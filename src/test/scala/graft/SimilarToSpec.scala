package graft

import graft.functions.FlinkScalarsUtil.similarToRegex
import org.scalatest.funsuite.AnyFunSuite

/** SQL:2016 SIMILAR TO → regex translation (ref SqlLikeUtils.similar):
  * the oracle query q_fn_similar pins end-to-end behavior; these pin the
  * translation's edge cases directly. */
class SimilarToSpec extends AnyFunSuite {

  private def re(p: String, esc: Option[Char] = None) = similarToRegex(p, esc)

  test("wildcards translate and the result is whole-string anchored") {
    assert(re("%(bolt|rod)%") == "^(?:.*(bolt|rod).*)$")
    assert(re("(cold|small)_%") == "^(?:(cold|small)..*)$")
  }

  test("SIMILAR TO metacharacters pass through") {
    assert(re("Brand#[0-9]+") == "^(?:Brand#[0-9]+)$")
    assert(re("a{2,3}b?") == "^(?:a{2,3}b?)$")
  }

  test("regex-only specials become literal") {
    assert(re("c%.") == "^(?:c.*\\.)$")
    assert(re("a^b$c") == "^(?:a\\^b\\$c)$")
  }

  test("percent and underscore are literal inside a bracket expression") {
    assert(re("[%_]x") == "^(?:[%_]x)$")
    // leading ] and negation do not close the class early
    assert(re("[]a]%") == "^(?:[]a].*)$")
    assert(re("[^]a]_") == "^(?:[^]a].)$")
  }

  test("escape char makes its successor literal") {
    assert(re("%!_%", Some('!')) == "^(?:.*\\Q_\\E.*)$")
    assert(re("a!%b", Some('!')) == "^(?:a\\Q%\\Eb)$")
    // the escape char itself escaped
    assert(re("!!", Some('!')) == "^(?:\\Q!\\E)$")
  }

  test("translated patterns match as SIMILAR TO requires") {
    def m(s: String, p: String) = s.matches(re(p))
    assert(m("large bolt", "%(bolt|rod)%"))
    assert(!m("large bolts and more", "%(bolt|rod)")) // anchored: no trailing slack
    assert(m("cold widget", "(cold|small)_%"))
    assert(m("a_b", "a%b"))                    // % spans the underscore
    assert(!m("a_b", "a!_b"))                  // no escape declared: ! literal
    // with escape declared, !_ is a literal underscore
    assert("a_b".matches(re("a!_b", Some('!'))))
    assert(!"axb".matches(re("a!_b", Some('!'))))
  }
}
