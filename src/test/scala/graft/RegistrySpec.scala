package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry-level invariants the driver contract and the bench artifact
  * depend on, asserted at test time instead of discovered at gate time.
  */
class RegistrySpec extends AnyFunSuite {

  private lazy val reg = SparkEntry.registry

  test("query names are unique and well-formed") {
    val names = reg.map(_.name)
    assert(names.distinct.size === names.size, "duplicate query name")
    names.foreach(n => assert(n.matches("^q\\d+_[a-z0-9_]+$"),
      s"query name '$n' breaks the qNN_snake_case convention"))
  }

  test("qNN prefixes are unique (the bench short-key rung depends on it)") {
    // Bench's capture-window degradation ladder re-keys the per-query map
    // by the qNN prefix when full names outgrow the driver's 2000-char
    // tail — at 96 queries that rung IS the active one, so a prefix
    // collision would silently drop every per-query value from the
    // artifact (Bench guards at runtime; this catches it in sbt test)
    val prefixes = reg.map(_.name.takeWhile(_ != '_'))
    assert(prefixes.distinct.size === prefixes.size,
      s"colliding qNN prefixes: ${prefixes.diff(prefixes.distinct).distinct}")
  }

  test("every oracle belongs to a registered query and none is blank") {
    val names = reg.map(_.name).toSet
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(names.contains(k), s"oracle for unknown query $k")
      assert(sql.trim.nonEmpty, s"blank oracle for $k")
    }
  }

  test("every query carries survey coverage tags") {
    reg.foreach(q => assert(q.survey.trim.nonEmpty,
      s"${q.name} has no SURVEY.md operator tag — coverage ledger breaks"))
  }

  test("every L-numbered row in SURVEY §2.11a is covered by a registered query") {
    // the coverage ledger can't rot silently: parse the L-operator table
    // out of SURVEY.md and require each row's id to appear in some
    // registered query's survey tags (streaming-only forms are covered
    // by their batch twin's tag plus a named spec, so the same id always
    // exists on a query)
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    val tableIds = "(?m)^\\| (L\\d+) \\|".r
      .findAllMatchIn(survey).map(_.group(1)).toSet
    assert(tableIds.size >= 60, s"SURVEY §2.11a table parse broke: " +
      s"only ${tableIds.size} L-rows found")
    val tagged = reg.flatMap(_.survey.split("\\s+")).toSet
    val uncovered = tableIds.filterNot(tagged.contains)
    assert(uncovered.isEmpty,
      s"SURVEY §2.11a rows with no registered query tag: " +
        uncovered.toSeq.sorted.mkString(", "))
  }

  test("README's pipeline and L-range counts match the registry") {
    // the README prose has drifted twice (ADVICE r11, r12 notes §5) —
    // extend the SURVEY tag guard to the two count-bearing claims in
    // README.md: the registered-pipeline count and the top of the
    // L-operator range (VERDICT r12 #8)
    val readme = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")), "UTF-8")
    val pipelineCounts = "(\\d+) named pipelines".r
      .findAllMatchIn(readme).map(_.group(1).toInt).toSeq
    assert(pipelineCounts.nonEmpty, "README no longer states the pipeline " +
      "count — update this guard alongside the prose")
    pipelineCounts.foreach(n => assert(n === reg.size,
      s"README claims $n named pipelines, registry has ${reg.size}"))
    val maxL = reg.flatMap(_.survey.split("\\s+"))
      .collect { case s if s.matches("L\\d+") => s.drop(1).toInt }.max
    val lRanges = "L1[-–]L(\\d+)".r
      .findAllMatchIn(readme).map(_.group(1).toInt).toSeq
    assert(lRanges.nonEmpty, "README no longer states the L-operator " +
      "range — update this guard alongside the prose")
    lRanges.foreach(n => assert(n === maxL,
      s"README claims L1-L$n, registry tags reach L$maxL"))
  }
}
