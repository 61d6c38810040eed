package graft.query

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Termination/failure-mode fuzz for the native-query compiler: a
  * random query JSON — valid, partially valid, or garbage — must
  * either COMPILE (plan analysis succeeds) or fail with the documented
  * loud types (`IllegalArgumentException` from the compiler's `fail`,
  * or Spark's `AnalysisException` for resolution errors). Anything
  * else (NullPointerException, MatchError, StackOverflowError, a
  * hang) is a compiler bug: a hostile or buggy client on the serve
  * endpoint must always get a clean 400, never take the broker down.
  * Only ANALYSIS runs (`.schema` / resolved plan) — no execution, so
  * thousands of samples stay cheap.
  */
class NativeQueryFuzzSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestSession.spark

  private lazy val events: DataFrame = {
    import spark.implicits._
    Seq(("2024-01-01 01:00:00", "click", 1L, 10.0, Seq("a", "b")),
        ("2024-01-02 02:00:00", "view", 2L, 20.0, Seq("c")))
      .toDF("t", "event_type", "user_id", "value", "tags")
      .select(to_timestamp(col("t")).as("__time"), col("event_type"),
              col("user_id"), col("value"), col("tags"))
  }

  // ---- a grammar of plausible-to-broken query fragments -----------------

  private val word: Gen[String] = Gen.oneOf("event_type", "user_id", "value",
    "tags", "__time", "nope", "", "n", "x y", "café", "1bad")
  private def js(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
  private val scalarJson: Gen[String] = Gen.oneOf(
    word.map(js), Gen.choose(-5, 100).map(_.toString),
    Gen.oneOf("true", "false", "null", "-1.5", "[]", "{}", "3.14"))

  private lazy val filterGen: Gen[String] = {
    val leaf = for {
      t <- Gen.oneOf("selector", "in", "bound", "like", "regex", "null",
        "interval", "expression", "range", "equals", "spatial", "search",
        "columnComparison", "true", "false", "bogus")
      d <- word
      v <- scalarJson
      ord <- Gen.oneOf("\"lexicographic\"", "\"numeric\"", "\"alphanumeric\"",
        "\"version\"", "\"strlen\"", "{\"type\": \"version\"}", "\"wat\"", "7")
    } yield t match {
      case "selector" => s"""{"type":"selector","dimension":${js(d)},"value":$v}"""
      case "in"       => s"""{"type":"in","dimension":${js(d)},"values":[$v, "x"]}"""
      case "bound" =>
        s"""{"type":"bound","dimension":${js(d)},"lower":$v,"ordering":$ord}"""
      case "like"   => s"""{"type":"like","dimension":${js(d)},"pattern":$v}"""
      case "regex"  => s"""{"type":"regex","dimension":${js(d)},"pattern":"[a-"}"""
      case "null"   => s"""{"type":"null","column":${js(d)}}"""
      case "interval" =>
        s"""{"type":"interval","dimension":"__time","intervals":[$v]}"""
      case "expression" => s"""{"type":"expression","expression":$v}"""
      case "range" =>
        s"""{"type":"range","column":${js(d)},"matchValueType":"LONG","lower":$v}"""
      case "equals" =>
        s"""{"type":"equals","column":${js(d)},"matchValueType":"DOUBLE","matchValue":$v}"""
      case "spatial" =>
        s"""{"type":"spatial","dimension":${js(d)},"bound":{"type":"polygon","abscissa":[0,1,$v],"ordinate":[0,1,2]}}"""
      case "search" =>
        s"""{"type":"search","dimension":${js(d)},"query":{"type":"contains","value":$v}}"""
      case "columnComparison" =>
        s"""{"type":"columnComparison","dimensions":[${js(d)}, "value"]}"""
      case "true" | "false" => s"""{"type":"$t"}"""
      case other => s"""{"type":"$other","dimension":${js(d)}}"""
    }
    def combo(depth: Int): Gen[String] =
      if (depth <= 0) leaf
      else Gen.frequency(
        3 -> leaf,
        1 -> (for { a <- combo(depth - 1); b <- combo(depth - 1) }
          yield s"""{"type":"and","fields":[$a, $b]}"""),
        1 -> combo(depth - 1).map(f => s"""{"type":"not","field":$f}"""))
    combo(2)
  }

  private val aggGen: Gen[String] = for {
    t <- Gen.oneOf("count", "longSum", "doubleSum", "doubleMin", "longMax",
      "thetaSketch", "variance", "doubleMean", "hyperUnique", "bogusAgg",
      "cardinality")
    f <- word
    n <- Gen.oneOf("n", "m", "", "n n")
  } yield
    if (t == "count") s"""{"type":"count","name":${js(n)}}"""
    else s"""{"type":"$t","name":${js(n)},"fieldName":${js(f)}}"""

  private val granGen: Gen[String] = Gen.oneOf(
    "\"all\"", "\"day\"", "\"hour\"", "\"century\"", "17",
    """{"type":"period","period":"P1D"}""",
    """{"type":"period","period":"P42X"}""",
    """{"type":"duration","duration":0}""",
    """{"type":"duration","duration":3600000,"origin":"2024-01-01T00:00:00Z"}""",
    """{"type":"duration","duration":3600000,"origin":"whenever"}""",
    """{"type":"period","period":"P1M","origin":"2024-01-01T00:00:00Z"}""")

  private val dimGen: Gen[String] = Gen.oneOf(
    word.map(js),
    word.map(w => s"""{"type":"default","dimension":${js(w)},"outputName":"d"}"""),
    word.map(w =>
      s"""{"type":"extraction","dimension":${js(w)},"outputName":"d","extractionFn":{"type":"substring","index":1}}"""),
    word.map(w =>
      s"""{"type":"listFiltered","delegate":{"type":"default","dimension":${js(w)},"outputName":"d"},"values":["a"]}"""),
    Gen.const("""{"type":"wat","dimension":"event_type"}"""))

  private val dataSourceGen: Gen[String] = Gen.oneOf(
    Gen.const("\"events\""),
    Gen.const("""{"type":"table","name":"events"}"""),
    Gen.const("""{"type":"union","dataSources":["events","events"]}"""),
    Gen.const("""{"type":"lookup","lookup":"no_such_lookup"}"""),
    word.map(w => s"""{"type":"unnest","base":"events",
      "virtualColumn":{"type":"expression","name":"u","expression":${js(w)}}}"""),
    Gen.const("""{"type":"join","left":"events","right":"events",
      "rightPrefix":"r.","joinType":"INNER","condition":"user_id == \"r.user_id\""}"""),
    Gen.const("""{"type":"wat"}"""))

  private val postAggGen: Gen[String] = Gen.oneOf(
    """{"type":"arithmetic","name":"p","fn":"/","fields":[
       {"type":"fieldAccess","fieldName":"n"},{"type":"constant","value":0}]}""",
    """{"type":"doubleGreatest","name":"p","fields":[
       {"type":"fieldAccess","fieldName":"nope"}]}""",
    """{"type":"expression","name":"p","expression":"1 +"}""",
    """{"type":"stddev","name":"p","fieldName":"missing"}""",
    """{"type":"wat","name":"p"}""")

  private val vcGen: Gen[String] = Gen.oneOf(
    word.map(w =>
      s"""{"type":"expression","name":"v","expression":${js(w)}}"""),
    Gen.const("""{"type":"nested-field","columnName":"event_type",
      "outputName":"v","path":"$.a","expectedType":"LONG"}"""),
    Gen.const("""{"type":"nested-field","columnName":"event_type",
      "outputName":"v","path":"$.a","expectedType":"WAT"}"""),
    Gen.const("""{"type":"wat","name":"v"}"""))

  private val limitSpecGen: Gen[String] = Gen.oneOf(
    """{"type":"default","limit":2,"columns":["d"]}""",
    """{"type":"default","limit":-3,"columns":[
       {"dimension":"d","dimensionOrder":{"type":"version"},
        "direction":"descending"}]}""",
    """{"type":"default","columns":[{"dimension":"missing_col",
       "dimensionOrder":"alphanumeric"}]}""",
    """{"type":"wat"}""")

  private val havingGen: Gen[String] = Gen.oneOf(
    """{"type":"greaterThan","aggregation":"n","value":1}""",
    """{"type":"and","havingSpecs":[
       {"type":"dimSelector","dimension":"d","value":"x"},
       {"type":"filter","filter":{"type":"selector",
        "dimension":"missing","value":"y"}}]}""",
    """{"type":"wat"}""")

  private val queryGen: Gen[String] = for {
    qt <- Gen.oneOf("timeseries", "topN", "groupBy", "scan", "search",
      "timeBoundary", "segmentMetadata", "dataSourceMetadata", "nonsense")
    ds <- dataSourceGen
    filter <- Gen.option(filterGen)
    agg <- aggGen
    gran <- granGen
    dim <- dimGen
    vc <- Gen.option(vcGen)
    post <- Gen.option(postAggGen)
    limit <- Gen.option(limitSpecGen)
    having <- Gen.option(havingGen)
    ivs <- Gen.option(Gen.oneOf(
      """["2024-01-01T00:00:00.000Z/2024-01-03T00:00:00.000Z"]""",
      """["backwards/2024-01-01"]""", """["2024-01-01T00:00:00Z"]""",
      "[17]"))
    thresh <- Gen.oneOf("-1", "0", "2", "\"two\"")
  } yield {
    val common = Seq(
      s""""queryType":${js(qt)}""",
      s""""dataSource":$ds""",
      s""""granularity":$gran""") ++
      filter.map(f => s""""filter":$f""") ++
      vc.map(v => s""""virtualColumns":[$v]""") ++
      ivs.map(i => s""""intervals":$i""") ++
      (qt match {
        case "timeseries" => Seq(s""""aggregations":[$agg]""") ++
          post.map(p => s""""postAggregations":[$p]""")
        case "topN" => Seq(s""""dimension":$dim""", s""""threshold":$thresh""",
          s""""metric":"n"""", s""""aggregations":[$agg]""")
        case "groupBy" => Seq(s""""dimensions":[$dim]""",
          s""""aggregations":[$agg]""") ++
          post.map(p => s""""postAggregations":[$p]""") ++
          limit.map(l => s""""limitSpec":$l""") ++
          having.map(h => s""""having":$h""")
        case "search" => Seq(
          """"searchDimensions":["event_type"]""",
          """"query":{"type":"insensitive_contains","value":"c"}""")
        case _ => Seq.empty
      })
    common.mkString("{", ",", "}")
  }

  test("random query JSON compiles or fails LOUDLY — no hangs, no weird throwables") {
    val prop = Prop.forAllNoShrink(queryGen) { q =>
      try {
        NativeQuery.run(q, _ => events).schema // analysis only
        true
      } catch {
        case _: IllegalArgumentException => true // the compiler's fail()
        case _: org.apache.spark.sql.AnalysisException => true
        case e: Throwable =>
          println(s"UNEXPECTED ${e.getClass.getName}: ${e.getMessage}\n  query: $q")
          false
      }
    }
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(600), prop)
    assert(r.passed, r.status.toString)
  }
}
