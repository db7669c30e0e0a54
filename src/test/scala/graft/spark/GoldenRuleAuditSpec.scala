package graft.spark

import org.scalatest.funsuite.AnyFunSuite

import graft.kernel.{Patterns, Py}

/** Machine-checked INTENT audit for the per-rule golden corpus (VERDICT
  * r02 task 3): for every per-rule case, verify against the LIVE rule
  * tables that
  *   - the target rule actually fires on the case's class/href/src/id,
  *   - no OTHER points rule fires except the declared same-sign
  *     co-matches (so the A/B selection delta is attributable to the
  *     target rule),
  *   - strip shadowing is declared exactly when a strip rule co-fires,
  *   - the neutral scaffold classes/hrefs used by the case constructors
  *     fire NOTHING (they cannot tilt the A/B vote),
  *   - the coverage ledger accounts for every index of both tables:
  *     each rule has a golden page or a documented dead-rule entry.
  *
  * The end-to-end behavior (selection moved, junk gone) is asserted by
  * GoldenSpec's byte-goldens + markers; this spec pins WHY each page
  * proves its rule.
  */
class GoldenRuleAuditSpec extends AnyFunSuite {

  /** classid synthesis exactly as Patterns.processInner (empty id). */
  private def classidOf(rawClass: String): String =
    Py.strip(Py.strip(Patterns.separateWords(rawClass)) + "!!!", "!")

  private def pointsMatches(attr: String, v: String): Seq[Int] =
    Patterns.AttrPoints.indices.filter { i =>
      Patterns.AttrPoints(i)._2 == attr &&
        Patterns.AttrPoints(i)._3.matcher(v).find()
    }

  private def stripMatches(attr: String, v: String): Seq[Int] =
    Patterns.AttrStrip.indices.filter { i =>
      Patterns.AttrStrip(i)._1 == attr &&
        Patterns.AttrStrip(i)._2.matcher(v).find()
    }

  private def resolve(attr: String, value: String): (String, String) =
    attr match {
      case "class" => ("classid", classidOf(value))
      case other   => (other, value)
    }

  test("every points audit: target fires, co-matches declared, same sign") {
    for (a <- GoldenCases.r3PointsAudits) {
      val (mAttr, v) = resolve(a.attr, a.value)
      val target = Patterns.AttrPoints(a.ruleIdx)
      assert(target._2 == mAttr,
        s"${a.caseName}: rule ${a.ruleIdx} is on attr ${target._2}, case audits $mAttr")
      val matched = pointsMatches(mAttr, v)
      assert(matched.contains(a.ruleIdx),
        s"${a.caseName}: rule ${a.ruleIdx} (${target._3.pattern}) does not fire on '$v'")
      val extras = matched.toSet - a.ruleIdx
      assert(extras.subsetOf(a.allowedExtra),
        s"${a.caseName}: undeclared co-matching rules ${extras -- a.allowedExtra} on '$v'")
      for (e <- extras if !a.differential) {
        assert(Patterns.AttrPoints(e)._1.sign == target._1.sign,
          s"${a.caseName}: co-match $e has opposite sign to target ${a.ruleIdx}")
      }
      val stripped = stripMatches(mAttr, v).nonEmpty
      assert(stripped == a.strippedToo,
        s"${a.caseName}: strip shadowing is $stripped but declared ${a.strippedToo} for '$v'")
    }
  }

  test("every strip audit: the target strip rule fires on the case value") {
    for (a <- GoldenCases.r3StripAudits) {
      val (mAttr, v) = resolve(a.attr, a.value)
      val target = Patterns.AttrStrip(a.ruleIdx)
      assert(target._1 == mAttr,
        s"${a.caseName}: strip rule ${a.ruleIdx} is on attr ${target._1}, case audits $mAttr")
      assert(target._2.matcher(v).find(),
        s"${a.caseName}: strip rule ${a.ruleIdx} (${target._2.pattern}) does not fire on '$v'")
    }
  }

  test("neutral scaffold classes and hrefs fire no rule at all") {
    for (cls <- Seq("wrapone", "wraptwo", "plain", "plain2", "plainchild",
        "innerwrap", "blog-post")) {
      val v = classidOf(cls)
      val extras = if (cls == "blog-post") Set(48) else Set.empty[Int]
      assert((pointsMatches("classid", v).toSet -- extras).isEmpty,
        s"scaffold class '$cls' fires points rules ${pointsMatches("classid", v)}")
      assert(stripMatches("classid", v).isEmpty,
        s"scaffold class '$cls' fires strip rules ${stripMatches("classid", v)}")
    }
    for (href <- Seq("http://other1.test/x", "http://other2.test/x",
        "http://other3.test/x")) {
      assert(pointsMatches("href", href).isEmpty, s"neutral href $href fires points")
      assert(stripMatches("href", href).isEmpty, s"neutral href $href fires strip")
    }
  }

  test("coverage ledger: every ATTR_POINTS index has a page or a dead-rule note") {
    val allIdx = Patterns.AttrPoints.indices.toSet
    val ledgered = GoldenCases.pointsRuleLedger.keySet
    val dead = GoldenCases.pointsRuleDead.keySet
    assert(ledgered.intersect(dead).isEmpty)
    assert(ledgered ++ dead == allIdx,
      s"unaccounted points rules: ${allIdx -- ledgered -- dead}")
    for ((idx, name) <- GoldenCases.pointsRuleLedger)
      assert(GoldenCases.byName.contains(name),
        s"points ledger $idx -> $name: no such golden case")
  }

  test("coverage ledger: every ATTR_STRIP index has a page or a dead-rule note") {
    val allIdx = Patterns.AttrStrip.indices.toSet
    val ledgered = GoldenCases.stripRuleLedger.keySet
    val dead = GoldenCases.stripRuleDead.keySet
    assert(ledgered.intersect(dead).isEmpty)
    assert(ledgered ++ dead == allIdx,
      s"unaccounted strip rules: ${allIdx -- ledgered -- dead}")
    for ((idx, name) <- GoldenCases.stripRuleLedger)
      assert(GoldenCases.byName.contains(name),
        s"strip ledger $idx -> $name: no such golden case")
  }

  test("dead rules are genuinely unmatchable through classid synthesis") {
    // usertext-body (points 43): classid never contains '-'
    assert(!classidOf("usertext-body").contains("-"))
    assert(pointsMatches("classid", classidOf("usertext-body")).forall(_ != 43))
    // ^post_(\d+_)?info (strip 6): classid never contains '_'
    assert(!classidOf("post_3_info").contains("_"))
    assert(!stripMatches("classid", classidOf("post_3_info")).contains(6))
  }

  test("audit case names resolve to registered cases") {
    val names = (GoldenCases.r3PointsAudits.map(_.caseName) ++
      GoldenCases.r3StripAudits.map(_.caseName))
      .map(_.takeWhile(_ != '#'))
    for (n <- names)
      assert(GoldenCases.byName.contains(n), s"audit references unknown case $n")
  }
}
