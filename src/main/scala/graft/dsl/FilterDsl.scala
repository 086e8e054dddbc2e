package graft.dsl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's string filter-expression DSL, compiled to Catalyst
  * `Column` predicate trees at PLAN time (SURVEY F12 — the flagship custom
  * component).
  *
  * Grammar and semantics from `display-proxy/lambdas/tak-cot-proxy/index.mjs`
  * (parser `:125-179`, evaluator `:181-240`, value parser `:110-123`):
  *
  *  - expression  := clause (" and " clause)*        — AND within a string
  *  - filter list := [expr, expr, …]                 — OR across strings
  *  - clause      := path op literal                 op ∈ == != > < >= <= =
  *                 | path % divisor op literal       (modulo)
  *                 | path in [lit, lit, …]
  *                 | $contains(path, lit)
  *  - literal     := null | true | false | "str" | 'str' | number | bare-str
  *
  * '''Missing-field semantics (NON-SQL, `:184-199`)''': when the path
  * resolves to null/missing, every comparison against a concrete value is
  * FALSE — including `!=`. Only `path == null` is true for a missing field,
  * and `path != null` is true only for a present field. The compiler encodes
  * this with explicit null guards so Spark's 3VL can't leak through.
  *
  * Unparseable expressions evaluate TRUE (reference `evaluateFilter` returns
  * true for a null parse, `:201`); an empty filter list is TRUE (`:242-244`).
  *
  * Dynamic-JSON note: the reference evaluates over parsed JSON, where
  * numeric fields are JS numbers. When the resolver supplies string-typed
  * columns (e.g. `get_json_object`), numeric-literal comparisons cast the
  * column to double (non-numeric text → null → false), which matches the
  * JS-on-parsed-JSON behavior. String literals compare as strings, booleans
  * as booleans.
  *
  * Scale: the output is a pure `Column` tree — predicate pushdown, codegen
  * and pruning all apply as if the user had written the predicates by hand.
  */
object FilterDsl {

  // --- AST ---
  sealed trait Lit
  case object LNull extends Lit
  final case class LBool(b: Boolean) extends Lit
  final case class LNum(d: Double) extends Lit
  final case class LStr(s: String) extends Lit

  sealed trait Filter
  final case class And(conds: Seq[Filter]) extends Filter
  final case class Compare(path: String, op: String, value: Lit) extends Filter
  final case class Modulo(path: String, divisor: Double, op: String, value: Lit) extends Filter
  final case class In(path: String, values: Seq[Lit]) extends Filter
  final case class Contains(path: String, value: Lit) extends Filter

  // --- parser (mirrors the reference's regex dispatch order) ---

  private val ContainsRe = """^\$contains\(\s*(.+?)\s*,\s*(.+?)\s*\)$""".r
  private val InRe = """^(.+?)\s+in\s+\[(.+)\]$""".r
  private val ModRe = """^(.+?)\s+%\s+(\S+)\s+(==|!=|>|<|>=|<=)\s+(.+)$""".r
  private val StdRe = """^(.+?)\s+(==|!=|>=|<=|>|<|=)\s+(.+)$""".r

  def parseValue(raw: String): Lit = raw match {
    case "null" => LNull
    case "true" => LBool(true)
    case "false" => LBool(false)
    case s if (s.startsWith("\"") && s.endsWith("\"") && s.length >= 2) ||
              (s.startsWith("'") && s.endsWith("'") && s.length >= 2) =>
      LStr(s.substring(1, s.length - 1))
    case s => s.toDoubleOption.map(LNum).getOrElse(LStr(s))
  }

  /** None = unparseable (evaluates true, like the reference). */
  def parse(expr: String): Option[Filter] = {
    if (expr.contains(" and ")) {
      val parsed = expr.split("""\s+and\s+""").toSeq.map(p => parse(p.trim)).flatten
      return parsed match {
        case Seq() => None
        case Seq(one) => Some(one)
        case many => Some(And(many))
      }
    }
    expr.trim match {
      case ContainsRe(path, value) => Some(Contains(path.trim, parseValue(value.trim)))
      case InRe(path, values) =>
        Some(In(path.trim, values.split(",").toSeq.map(v => parseValue(v.trim))))
      case ModRe(path, div, op, value) =>
        parseValue(div) match {
          case LNum(d) => Some(Modulo(path.trim, d, op, parseValue(value.trim)))
          case _ => Some(Modulo(path.trim, Double.NaN, op, parseValue(value.trim)))
        }
      case StdRe(path, op, value) =>
        Some(Compare(path.trim, if (op == "=") "==" else op, parseValue(value.trim)))
      case _ => None
    }
  }

  // --- compiler ---

  /** Plan-time type annotation for a path — enables the reference's JS
    * STRICT equality (`5 !== "5"`, `index.mjs:191-192`) and array
    * membership (`:216-219`), which need type knowledge the Column API
    * can't recover from a dynamic resolver. Unannotated paths keep the
    * coercive behavior (correct for JSON-string resolvers, where numbers
    * and strings are indistinguishable after extraction).
    */
  sealed trait PathType
  case object TUnknown extends PathType
  case object TNumeric extends PathType
  case object TString extends PathType
  case object TArray extends PathType

  final case class PathTypes(types: Map[String, PathType]) {
    def apply(p: String): PathType = types.getOrElse(p, TUnknown)
  }
  object PathTypes { val empty: PathTypes = PathTypes(Map.empty) }

  /** Comparison against a concrete literal with missing-field-fails-all
    * semantics: `coalesce(col IS NOT NULL AND (col op lit), false)`.
    *
    * Strict-typing table (JS semantics, `index.mjs:191-199`): `===`/`!==`
    * never coerce — a type-mismatched `==` is false and a type-mismatched
    * `!=` is true FOR A PRESENT FIELD; relational ops DO coerce
    * (`"5" > 3` is numeric in JS), and an unparseable coercion is NaN →
    * false.
    */
  private def cmp(c: Column, op: String, l: Lit, pt: PathType): Column = {
    def guard(typed: Column, p: Column => Column): Column =
      coalesce(typed.isNotNull && p(typed), lit(false))
    def presentTrue: Column = coalesce(c.isNotNull, lit(false))
    (op, l) match {
      case ("==", LNull) => c.isNull
      case ("!=", LNull) => c.isNotNull
      case (_, LNull) => lit(false) // >,<,>=,<= vs null: false either way
      case (o, lv) => (pt, lv) match {
        case (TArray, _) => // array === scalar is never true; !== is
          if (o == "!=") presentTrue else lit(false)
        case (TString, LNum(d)) =>
          o match {
            case "==" => lit(false)
            case "!=" => presentTrue
            case _ => guard(c.cast("double"), t => applyOp(t, o, lit(d)))
          }
        case (TNumeric, LStr(s)) =>
          o match {
            case "==" => lit(false)
            case "!=" => presentTrue
            case _ => s.toDoubleOption match {
              case Some(d) => guard(c.cast("double"), t => applyOp(t, o, lit(d)))
              case None => lit(false) // NaN relational → false
            }
          }
        case (_, LNum(d)) =>
          guard(c.cast("double"), t => applyOp(t, o, lit(d)))
        case (_, LBool(b)) =>
          guard(c.cast("boolean"), t => applyOp(t, o, lit(b)))
        case (_, LStr(s)) =>
          guard(c.cast("string"), t => applyOp(t, o, lit(s)))
      }
    }
  }

  private def applyOp(c: Column, op: String, v: Column): Column = op match {
    case "==" => c === v
    case "!=" => c =!= v
    case ">" => c > v
    case "<" => c < v
    case ">=" => c >= v
    case "<=" => c <= v
    case _ => lit(true) // reference default branch (`:196`)
  }

  private def litOf(l: Lit): Column = l match {
    case LStr(s) => lit(s)
    case LNum(d) => lit(d)
    case LBool(b) => lit(b)
    case LNull => lit(null)
  }

  /** Compile one parsed filter against a path resolver. */
  def compileFilter(f: Filter, resolve: String => Column,
      types: PathTypes = PathTypes.empty): Column = f match {
    case And(conds) => conds.map(compileFilter(_, resolve, types)).reduce(_ && _)
    case Compare(path, op, value) => cmp(resolve(path), op, value, types(path))
    case Modulo(path, _, _, _)
        if types(path) == TString || types(path) == TArray =>
      lit(false) // modulo requires `typeof actual === 'number'` (:220)
    case Modulo(path, div, op, value) if !div.isNaN && div != 0.0 =>
      val d = resolve(path).cast("double")
      coalesce(d.isNotNull && cmp(d % div, op, value, TNumeric), lit(false))
    case Modulo(path, _, op, _) =>
      // Non-numeric or zero divisor: the reference still computes
      // `actual % divisor` (= NaN) and compares, so for a present numeric
      // field `!=` is TRUE (NaN !== v) while every other op is false
      // (`index.mjs:220-224`, `:191-199`).
      if (op == "!=") coalesce(resolve(path).cast("double").isNotNull, lit(false))
      else lit(false)
    case In(path, values) =>
      val c = resolve(path)
      val hits = values.map(v => cmp(c, "==", v, types(path)))
      coalesce(c.isNotNull && hits.reduceOption(_ || _).getOrElse(lit(false)), lit(false))
    case Contains(path, value) if types(path) == TArray =>
      // array membership via strict includes (`:218`). array_contains, not
      // an exists() lambda: identical three-valued semantics for equality
      // (true if present, null only when absent-but-null-present, false
      // otherwise) but codegen'd — HOF lambdas run interpreted per row
      val c = resolve(path)
      coalesce(c.isNotNull && array_contains(c, litOf(value)), lit(false))
    case Contains(path, _) if types(path) == TNumeric =>
      lit(false) // not a string, not an array → false (`:219`)
    case Contains(path, value) =>
      val c = resolve(path).cast("string")
      val needle = value match {
        case LStr(s) => s
        case LNum(d) => if (d == d.floor && !d.isInfinite) d.toLong.toString else d.toString
        case LBool(b) => b.toString
        case LNull => "null"
      }
      coalesce(c.isNotNull && c.contains(lit(needle)), lit(false))
  }

  /** Legacy object-format filter `{path, op, value}` (`index.mjs:236-239`)
    * — evaluated straight through the comparison table.
    */
  def compileLegacy(path: String, op: String, value: Lit,
      resolve: String => Column, types: PathTypes = PathTypes.empty): Column =
    cmp(resolve(path), if (op == "=") "==" else op, value, types(path))

  /** Compile a filter LIST (OR semantics; empty/absent → true). */
  def compile(filters: Seq[String], resolve: String => Column,
      types: PathTypes = PathTypes.empty): Column =
    filters
      .map(f => parse(f).map(compileFilter(_, resolve, types)).getOrElse(lit(true)))
      .reduceOption(_ || _)
      .getOrElse(lit(true))

  /** Resolver for dot-paths into real (struct) columns. */
  def structResolver(root: String => Column): String => Column =
    path => path.split('.').toSeq match {
      case head +: tail => tail.foldLeft(root(head))(_.getField(_))
      case _ => root(path)
    }

  /** Resolver for dot-paths into a JSON-string column (dynamic metadata —
    * data model §1.1.3): `a.b.c` → `get_json_object(json, '$.a.b.c')`.
    *
    * Parse-per-reference: every compiled predicate that touches the column
    * re-parses the document. Prefer [[mapResolver]] over a once-parsed
    * `from_json(json, map<string,string>)` column for hot paths.
    */
  def jsonResolver(json: Column): String => Column =
    path => get_json_object(json, "$." + path)

  /** Parse-ONCE resolver (data-model hazard 10): dot-paths against a
    * pre-parsed `map<string,string>` column (`from_json(json,
    * MapType(StringType, StringType))`, materialized behind an encoder
    * fence by the caller). Top-level lookups are map probes — scalars
    * surface exactly as `get_json_object` renders them (numbers/booleans as
    * their JSON text, strings unquoted, missing → null) — and deeper paths
    * descend into the nested JSON text the map value holds.
    *
    * VariantType decision (§1.1.3, evaluated round 4 on Spark 4.1.2 with
    * `graft.tools.VariantProbe`): `parse_json`/`variant_get` are available
    * AND a Variant column crosses the encoder fence, but on the
    * reference-sized documents (few keys, one nesting level) throughput is
    * identical — map 0.44-0.50 s vs variant 0.44-0.53 s steady-state for
    * parse + 3 path extracts over sf0.1 events. The map stays because it
    * is the representation the DuckDB oracle can replicate (hash-parity is
    * the engine's correctness gate; Variant binaries have no DuckDB twin).
    * For corpora of large deeply-nested documents, swap the `from_json`
    * for `parse_json` and this resolver for `variant_get` — the shredded
    * binary then skips the per-path re-parse of nested text below.
    */
  def mapResolver(m: Column): String => Column =
    path => path.split('.').toSeq match {
      case Seq(k) => m.getItem(k)
      case k +: rest => get_json_object(m.getItem(k), "$." + rest.mkString("."))
      case _ => m.getItem(path)
    }
}
