package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

class PySpec extends AnyFunSuite {

  test("floatRepr matches CPython str(float) on kernel-relevant values") {
    // Decay constants (SURVEY.md §2.5 C9) — bit-exact strings.
    assert(Py.floatRepr(1.0) == "1.0")
    assert(Py.floatRepr(0.6472278485082303) == "0.6472278485082303")
    assert(Py.floatRepr(0.401877572016461) == "0.401877572016461")
    assert(Py.floatRepr(0.2373046875) == "0.2373046875")
    assert(Py.floatRepr(0.13168724279835398) == "0.13168724279835398")
    assert(Py.floatRepr(0.06754356352880654) == "0.06754356352880654")
    // Typical accumulated scores.
    assert(Py.floatRepr(-1.5) == "-1.5")
    assert(Py.floatRepr(3.0) == "3.0")
    assert(Py.floatRepr(7.0 * 0.6472278485082303) == "4.530594939557613")
    assert(Py.floatRepr(0.0) == "0.0")
    assert(Py.floatRepr(-0.75) == "-0.75")
    assert(Py.floatRepr(1e16) == "1e+16")
    assert(Py.floatRepr(1.5e-5) == "1.5e-05")
    assert(Py.floatRepr(123456.789) == "123456.789")
  }

  test("strip follows Python whitespace semantics (incl. NBSP)") {
    assert(Py.strip("   x \n\t") == "x")
    assert(Py.strip("") == "")
    assert(Py.strip("abc") == "abc")
    assert(Py.strip("!!foo!!", "!") == "foo")
    assert(Py.strip("!!!", "!") == "")
  }

  test("urljoin matches CPython") {
    assert(Py.urljoin("http://a/b/c", "d") == "http://a/b/d")
    assert(Py.urljoin("http://a/b/c", "/d") == "http://a/d")
    assert(Py.urljoin("http://a/b/c", "http://x/y") == "http://x/y")
    assert(Py.urljoin("http://a/b/c", "//x/y") == "http://x/y")
    assert(Py.urljoin("http://a/b/c", "?q=1") == "http://a/b/c?q=1")
    assert(Py.urljoin("http://a/b/c", "#f") == "http://a/b/c#f")
    assert(Py.urljoin("http://a/b/c/", "../d") == "http://a/b/d")
    assert(Py.urljoin("http://a/b", "../../x") == "http://a/x")
    assert(Py.urljoin("http://a", "b") == "http://a/b")
    assert(Py.urljoin("http://a/b/c", "") == "http://a/b/c")
    assert(Py.urljoin("http://a/b/c", "./") == "http://a/b/")
    assert(Py.urljoin("http://a/b/", ".") == "http://a/b/")
    assert(Py.urljoin("http://a/b/c", "g;x") == "http://a/b/g;x")
    assert(Py.urljoin("http://a/b/c", "mailto:x@y") == "mailto:x@y")
    // same-scheme absolute
    assert(Py.urljoin("http://a/b", "http://c") == "http://c")
  }

  test("netloc / unquote / quote") {
    assert(Py.netloc("http://example.com/x?y#z") == "example.com")
    assert(Py.netloc("relative/path") == "")
    assert(Py.unquote("a%20b%2Fc") == "a b/c")
    assert(Py.unquote("caf%C3%A9") == "café")
    assert(Py.unquote("100%") == "100%")
    assert(Py.unquote("a%zzb") == "a%zzb")
    assert(Py.quote("a b/c") == "a%20b/c")
    assert(Py.quote("http://x.com/a b?q=1") == "http%3A//x.com/a%20b%3Fq%3D1")
  }

  test("entities unescape") {
    assert(Entities.unescape("a &amp; b") == "a & b")
    assert(Entities.unescape("&lt;p&gt;") == "<p>")
    assert(Entities.unescape("&#65;&#x42;") == "AB")
    assert(Entities.unescape("&amp;nbsp;") == "&nbsp;")
    assert(Entities.unescape("&unknown;") == "&unknown;")
    assert(Entities.unescape("&ampx") == "&x") // legacy semicolon-less
    assert(Entities.unescape("&hellip;") == "…")
  }
}
