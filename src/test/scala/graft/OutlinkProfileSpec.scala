package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.html.Anchors

/** Outlink-profile semantics pinned for the `outlink_profiles`
  * oracle. */
class OutlinkProfileSpec extends AnyFunSuite {

  test("relative internal, same-host absolute internal, external, nofollow") {
    val html =
      """<a href="/about">a</a>
        |<a href="page2.html">b</a>
        |<a href="http://MySite.com:80/deep">c</a>
        |<a href="https://other.net/x" rel="NoFollow sponsored">d</a>
        |<a href="https://other.net/y">e</a>""".stripMargin
    assert(Anchors.outlinkProfile(html, "mysite.com") == ((5L, 3L, 2L, 1L)))
  }

  test("non-page schemes are skipped entirely; empty href too") {
    val html =
      """<a href="mailto:x@y.z">m</a><a href="javascript:void(0)">j</a>
        |<a href="tel:+123">t</a><a>bare</a>
        |<a href="http://h/x">real</a>""".stripMargin
    assert(Anchors.outlinkProfile(html, "h") == ((1L, 1L, 0L, 0L)))
  }

  test("no links and null are zero profiles") {
    assert(Anchors.outlinkProfile("<p>plain</p>", "h") == ((0L, 0L, 0L, 0L)))
    assert(Anchors.outlinkProfile(null, "h") == ((0L, 0L, 0L, 0L)))
  }
}
