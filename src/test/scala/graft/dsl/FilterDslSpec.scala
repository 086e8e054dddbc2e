package graft.dsl

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Table-driven semantics tests for the filter DSL, derived line-by-line
  * from the reference evaluator (`tak-cot-proxy/index.mjs:181-244`).
  * Each case: (filter list, expected matching ids).
  */
class FilterDslSpec extends SparkSpec {
  import spark.implicits._

  // features: id, callsign (nullable str), magnitude (nullable num in JSON),
  // quality (nullable str) — metadata carried as a JSON string column
  private lazy val features = Seq(
    (1, """{"magnitude": 5.0, "quality": "best", "mmi": 6, "depth": 12}""", "M5.0 Cook Strait"),
    (2, """{"magnitude": 2.0, "quality": "deleted", "mmi": 3, "depth": 5}""", "M2.0 Taupo"),
    (3, """{"quality": "good", "mmi": 7, "depth": 4}""", "no-mag"), // magnitude MISSING
    (4, """{"magnitude": 3.5, "mmi": 8, "depth": 33}""", null) // quality MISSING, callsign null
  ).toDF("id", "metadata", "callsign")

  private val resolve: String => org.apache.spark.sql.Column = path =>
    if (path.startsWith("metadata."))
      get_json_object(col("metadata"), "$." + path.stripPrefix("metadata."))
    else col(path)

  private def matches(filters: String*): Seq[Int] =
    features.filter(FilterDsl.compile(filters, resolve))
      .select("id").as[Int].collect().sorted.toSeq

  test("comparison ops on numbers") {
    assert(matches("metadata.magnitude >= 3") === Seq(1, 4))
    assert(matches("metadata.magnitude > 3.5") === Seq(1))
    assert(matches("metadata.magnitude <= 3.5") === Seq(2, 4))
    assert(matches("metadata.magnitude < 2.5") === Seq(2))
    assert(matches("metadata.magnitude == 5") === Seq(1))
    assert(matches("metadata.magnitude = 5") === Seq(1)) // '=' alias
  }

  test("missing field fails ALL comparisons against concrete values — including !=") {
    // id 3 has no magnitude: != must NOT match it (index.mjs:184-189)
    assert(matches("metadata.magnitude != 5") === Seq(2, 4))
    assert(matches("metadata.magnitude != 99") === Seq(1, 2, 4))
    assert(matches("metadata.magnitude > 0") === Seq(1, 2, 4))
    assert(matches("metadata.magnitude < 99") === Seq(1, 2, 4))
  }

  test("null literal comparisons") {
    assert(matches("metadata.magnitude == null") === Seq(3)) // missing == null → true
    assert(matches("metadata.magnitude != null") === Seq(1, 2, 4)) // present != null → true
    assert(matches("callsign == null") === Seq(4))
  }

  test("string equality is exact") {
    assert(matches("""metadata.quality == "deleted"""") === Seq(2))
    assert(matches("metadata.quality == 'deleted'") === Seq(2)) // single quotes
    // missing quality (id 4) must NOT pass != (non-SQL semantics)
    assert(matches("""metadata.quality != "deleted"""") === Seq(1, 3))
  }

  test("compound and") {
    assert(matches("""metadata.magnitude >= 3 and metadata.quality != "deleted"""") === Seq(1))
    assert(matches("metadata.mmi >= 6 and metadata.depth < 20") === Seq(1, 3))
  }

  test("top-level list is OR") {
    assert(matches("metadata.magnitude >= 5", """metadata.quality == "good"""") === Seq(1, 3))
  }

  test("in list") {
    assert(matches("metadata.mmi in [6, 7, 8]") === Seq(1, 3, 4))
    assert(matches("""metadata.quality in ["best", "good"]""") === Seq(1, 3))
    // missing field: in → false (id 4 has no quality)
    assert(matches("""metadata.quality in ["deleted", "missing"]""") === Seq(2))
  }

  test("$contains") {
    assert(matches("""$contains(callsign, "Cook")""") === Seq(1))
    assert(matches("""$contains(callsign, "M")""") === Seq(1, 2)) // null callsign → false
  }

  test("modulo") {
    assert(matches("metadata.depth % 2 == 0") === Seq(1, 3)) // 12, 4 even; 5, 33 odd
    assert(matches("metadata.depth % 10 >= 3") === Seq(2, 3, 4)) // 5%10=5, 4%10=4, 33%10=3
    // missing path → false
    assert(matches("metadata.nope % 2 == 0") === Seq())
    // non-numeric divisor: JS computes value % "foo" = NaN, then
    // NaN !== v → TRUE for every present numeric field, while every other
    // op against NaN is false (index.mjs:220-224, :191-199)
    assert(matches("metadata.depth % foo != 5") === Seq(1, 2, 3, 4))
    assert(matches("metadata.depth % foo == 5") === Seq())
    assert(matches("metadata.depth % foo >= 0") === Seq())
    assert(matches("metadata.nope % foo != 5") === Seq()) // missing field stays false
    // zero divisor: x % 0 is NaN in JS too
    assert(matches("metadata.depth % 0 != 5") === Seq(1, 2, 3, 4))
    assert(matches("metadata.depth % 0 == 5") === Seq())
  }

  test("unparseable expression evaluates true") {
    assert(matches("complete nonsense @@") === Seq(1, 2, 3, 4))
  }

  test("empty filter list evaluates true") {
    assert(matches() === Seq(1, 2, 3, 4))
  }

  // --- typed-column semantics (strict equality, array membership) ---

  private lazy val typed = Seq(
    (1, 5.0, "alpha", Seq("red", "blue"), Seq(1, 2)),
    (2, 3.0, "bravo", Seq("green"), Seq(3)),
    (3, 10.0, "5", Seq.empty[String], Seq.empty[Int])
  ).toDF("id", "mag", "name", "tags", "nums")

  private val typedTypes = FilterDsl.PathTypes(Map(
    "mag" -> FilterDsl.TNumeric, "name" -> FilterDsl.TString,
    "tags" -> FilterDsl.TArray, "nums" -> FilterDsl.TArray))

  private def typedMatches(filters: String*): Seq[Int] =
    typed.filter(FilterDsl.compile(filters, col(_), typedTypes))
      .select("id").as[Int].collect().sorted.toSeq

  test("strict equality: number field vs string literal never matches ==") {
    // JS `5 !== "5"` (index.mjs:191-192): strict for ==/!=
    assert(typedMatches("""mag == "5"""") === Seq())
    assert(typedMatches("""mag != "5"""") === Seq(1, 2, 3)) // present → true
    assert(typedMatches("mag == 5") === Seq(1))
    // string field vs numeric literal: row 3 has name "5" but 5 !== "5"
    assert(typedMatches("name == 5") === Seq())
    assert(typedMatches("name != 5") === Seq(1, 2, 3))
  }

  test("strict relational ops still coerce (JS semantics)") {
    // `mag > "4"`: JS coerces "4" to 4 for relational ops
    assert(typedMatches("""mag > "4"""") === Seq(1, 3))
    assert(typedMatches("""mag > "abc"""") === Seq()) // NaN → false
    // in-list is strict per element
    assert(typedMatches("""mag in [5, "10"]""") === Seq(1)) // "10" !== 10.0
  }

  test("$contains on array columns is element membership, not substring") {
    assert(typedMatches("""$contains(tags, "red")""") === Seq(1))
    assert(typedMatches("""$contains(tags, "re")""") === Seq()) // NOT substring
    assert(typedMatches("$contains(nums, 2)") === Seq(1))
    assert(typedMatches("$contains(nums, 9)") === Seq())
    // number field: neither string nor array → false (index.mjs:219)
    assert(typedMatches("""$contains(mag, "5")""") === Seq())
  }

  test("array fields: equality/modulo against scalars") {
    assert(typedMatches("tags == 5") === Seq())
    assert(typedMatches("tags != 5") === Seq(1, 2, 3)) // present array !== scalar
    assert(typedMatches("tags % 2 == 0") === Seq()) // typeof array != number
  }

  test("legacy object-format filter") {
    val got = typed.filter(FilterDsl.compileLegacy("mag", ">", FilterDsl.LNum(4), col(_), typedTypes))
      .select("id").as[Int].collect().sorted.toSeq
    assert(got === Seq(1, 3))
    val missing = typed.filter(FilterDsl.compileLegacy("nope", "!=", FilterDsl.LNum(4),
        _ => lit(null), typedTypes))
      .select("id").as[Int].collect()
    assert(missing.isEmpty, "legacy comparison keeps missing-field-fails semantics")
  }

  test("parser shapes") {
    import FilterDsl._
    assert(parse("a.b >= 3").contains(Compare("a.b", ">=", LNum(3))))
    assert(parse("a = 'x'").contains(Compare("a", "==", LStr("x"))))
    assert(parse("a in [1, 2]").contains(In("a", Seq(LNum(1), LNum(2)))))
    assert(parse("a % 2 != 0").contains(Modulo("a", 2, "!=", LNum(0))))
    assert(parse("$contains(a.b, \"x\")").contains(Contains("a.b", LStr("x"))))
    assert(parse("a == true").contains(Compare("a", "==", LBool(true))))
    assert(parse("a == null").contains(Compare("a", "==", LNull)))
    assert(parse("a >= 1 and b < 2").contains(
      And(Seq(Compare("a", ">=", LNum(1)), Compare("b", "<", LNum(2))))))
  }
}
