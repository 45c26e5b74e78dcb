package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.html.Meta

/** hreflang-alternate semantics pinned for the `hreflang_pairs`
  * oracle. */
class AlternatesSpec extends AnyFunSuite {

  test("pairs in document order; x-default passes") {
    val html =
      """<link rel="alternate" hreflang="en" href="http://h/en/">
        |<link rel="alternate" hreflang="de" href="http://h/de/">
        |<link rel="alternate" hreflang="x-default" href="http://h/">"""
        .stripMargin
    assert(Meta.alternates(html) == Vector(("en", "http://h/en/"),
      ("de", "http://h/de/"), ("x-default", "http://h/")))
  }

  test("rel is token- and case-insensitive; decoys skipped") {
    val html =
      """<link rel="Alternate stylesheet" hreflang="fr" href="http://h/fr">
        |<link rel="canonical" hreflang="es" href="http://h/es">
        |<link rel="alternate" href="http://h/feed.xml">
        |<link rel="alternate" hreflang="it">""".stripMargin
    assert(Meta.alternates(html) == Vector(("fr", "http://h/fr")),
      "canonical decoy, missing hreflang, and missing href all skip")
  }

  test("null and plain pages yield nothing") {
    assert(Meta.alternates("<p>x</p>").isEmpty)
    assert(Meta.alternates(null).isEmpty)
  }

  test("nextLink: first rel=next href, token/case-insensitive") {
    assert(Meta.nextLink(
      """<link rel="prev" href="http://h/1">
        |<link rel="NEXT" href="http://h/3">
        |<link rel="next" href="http://h/4">""".stripMargin) ==
      "http://h/3")
    assert(Meta.nextLink("""<link rel="next prefetch" href="http://h/n">""") ==
      "http://h/n")
    assert(Meta.nextLink("""<link rel="next">""") == "")
    assert(Meta.nextLink("<p>x</p>") == "")
    assert(Meta.nextLink(null) == "")
  }
}
