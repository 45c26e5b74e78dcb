package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.html.Meta

/** Meta-refresh parse semantics pinned for the `meta_refresh`
  * oracle. */
class MetaRefreshSpec extends AnyFunSuite {

  test("plain form, quoted URL form, case-insensitive everywhere") {
    assert(Meta.metaRefresh(
      """<meta http-equiv="refresh" content="0;url=http://h/next">""") ==
      Some((0L, "http://h/next")))
    assert(Meta.metaRefresh(
      """<meta HTTP-EQUIV="Refresh" content="5; URL='http://h/q?a=1'">""") ==
      Some((5L, "http://h/q?a=1")))
  }

  test("delay-only refresh reloads self with empty target") {
    assert(Meta.metaRefresh(
      """<meta http-equiv="refresh" content="30">""") == Some((30L, "")))
  }

  test("non-numeric delay invalidates the refresh entirely") {
    assert(Meta.metaRefresh(
      """<meta http-equiv="refresh" content="abc;url=http://h/x">""")
      .isEmpty)
  }

  test("first refresh wins; other http-equiv values ignored; null safe") {
    assert(Meta.metaRefresh(
      """<meta http-equiv="content-type" content="text/html">
        |<meta http-equiv="refresh" content="1;url=http://h/a">
        |<meta http-equiv="refresh" content="2;url=http://h/b">"""
        .stripMargin) == Some((1L, "http://h/a")))
    assert(Meta.metaRefresh("<p>none</p>").isEmpty)
    assert(Meta.metaRefresh(null).isEmpty)
  }
}
