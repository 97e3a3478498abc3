package graft

/** Proves the Verify staleness gate fires on every narrowing it exists to
  * catch (round 6's silent 132→100 correctness shrink) — pure JVM, no
  * Spark session. The REAL repo state must be green; each trigger is then
  * exercised by perturbing one input.
  */
class VerifyGateSpec extends org.scalatest.funsuite.AnyFunSuite {

  private val realSurvey = java.nio.file.Files.readString(
    java.nio.file.Paths.get("SURVEY.md"))

  test("real repo state is gate-green: registry == survey == oracles") {
    val problems = Verify.gateProblems(Nil, Some(realSurvey))
    assert(problems.isEmpty, problems.mkString("; "))
  }

  test("survey parse sees every registry key with its check column") {
    val rows = Verify.surveyRows(realSurvey)
    assert(rows.keySet == SparkEntry.queries.keySet)
    // the four ANN keys are the only no-oracle rows, declared "rows"
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.forall(k => rows(k).contains("rows")))
  }

  test("a failed dump is a gate failure") {
    val problems = Verify.gateProblems(Seq("q01_agg_pricing"), Some(realSurvey))
    assert(problems.exists(_.contains("dump(s) FAILED")), problems.mkString("; "))
  }

  test("a survey row the registry lacks is a gate failure") {
    val extra = realSurvey.replace(
      "## §3", "| q99_phantom_key | made up | oracle |\n\n## §3")
    // splice the phantom row INSIDE §2 (just before §3 starts)
    val problems = Verify.gateProblems(Nil, Some(extra))
    assert(problems.exists(_.contains("q99_phantom_key")), problems.mkString("; "))
  }

  test("a registry key the survey lacks is a gate failure") {
    val shrunk = realSurvey.replace("| q01_agg_pricing |", "| q01_agg_pricing_GONE |")
    val problems = Verify.gateProblems(Nil, Some(shrunk))
    assert(problems.exists(p => p.contains("absent from SURVEY") &&
      p.contains("q01_agg_pricing")), problems.mkString("; "))
  }

  test("a no-oracle key not declared \"rows\" in the survey is a gate failure") {
    // flip d06's check column so it no longer declares the rows-only status
    val rows = Verify.surveyRows(realSurvey)
    val d06Row = realSurvey.linesIterator.find(_.startsWith("| d06_ann_lsh |")).get
    val broken = realSurvey.replace(d06Row,
      d06Row.reverse.replaceFirst(java.util.regex.Pattern.quote("swor"), "elcaro").reverse)
    assume(rows("d06_ann_lsh").contains("rows"))
    val problems = Verify.gateProblems(Nil, Some(broken))
    assert(problems.exists(_.contains("d06_ann_lsh")), problems.mkString("; "))
  }
}
