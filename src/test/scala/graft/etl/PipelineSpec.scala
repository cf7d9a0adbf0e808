package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** End-to-end pipeline behavior on the reference's golden fixture, plus
  * characterization tests for every quirk in SURVEY.md §7.4. */
class PipelineSpec extends SparkSpec {

  test("preJoin (C1..C10) reproduces the golden-fixture surface") {
    val out = Pipeline.preJoin(Fixtures.goldenLogs, Fixtures.types)
    assert(out.columns.toSeq == Seq("maid", "siteseq", "userid",
      "transaction_date", "transaction_time", "logtype", "productCode", "productName"))
    // KST shift: 01:43:09 UTC → 10:43:09. The -48 row's 2-element arrays
    // explode into two rows; the other sites' purchase branch looks for
    // productCode/productName keys the fixture doesn't carry → nulls.
    // sorted-column order: logtype|maid|productCode|productName|siteseq|date|time|userid
    assert(rowSet(out) == Set(
      "purchase|test_maid1|NULL|NULL|4550|2019-06-01|10:43:09|uid-1",
      "purchase|test_maid2|NULL|NULL|155138|2019-06-01|10:43:09|uid-2",
      "purchase|test_maid3|-48-pc1|-48-pn1|-48|2019-06-01|10:43:09|uid-3",
      "purchase|test_maid3|-48-pc2|-48-pn2|-48|2019-06-01|10:43:09|uid-3",
      "purchase|test_maid4|NULL|NULL|155138|2019-06-01|10:43:09|uid-4"))
  }

  test("full chain (C1..C13): inner join drops unmatched, enriches matched") {
    val cats = Fixtures.categories(Seq(
      Fixtures.catRow("-48", "-48-pc1", "a")))
    val out = Pipeline.transformData(Fixtures.goldenLogs, cats, Fixtures.types)
    assert(out.columns.toSeq == Schemas.outputColumns)
    // only the -48/-48-pc1 row has a category match; no login rows exist
    assert(rowSet(out) == Set(
      "c1-a|c2-a|c3-a|c4-a|ic1-a|ic2-a|ic3-a|ic4-a|intg-a|-48-pc1|name-a|purchase|-48|2019-06-01|10:43:09|uid-3"))
  }

  test("C12 quirk: a matching login row appears twice and survives dedup") {
    val rows = Seq(Fixtures.logRow("m1", "-48", "u1", "c1",
      "2019-06-01T01:43:09.000Z", "login",
      """{"goodsCode": ["g1"], "goodsName": ["n1"]}"""))
    val cats = Fixtures.categories(Seq(Fixtures.catRow("-48", "g1", "x")))
    val out = Pipeline.transformData(Fixtures.logs(rows), cats, Fixtures.types)
    // once enriched via the join, once null-padded via the login branch
    assert(out.count() == 2)
    assert(out.filter(col("ITEM_CODE").isNull).count() == 1)
    assert(out.filter(col("ITEM_CODE") === "g1").count() == 1)
  }

  test("C11: null userid falls back to maid") {
    val rows = Seq(
      Fixtures.logRow("m-dev", "-48", null, "c1", "2019-06-01T01:43:09.000Z",
        "purchase", """{"goodsCode": ["g1"], "goodsName": ["n1"]}"""))
    val out = Pipeline.preJoin(Fixtures.logs(rows), Fixtures.types)
      .transform(Transforms.selectValidId)
    assert(rowSeq(out.select("userid")).flatten == Seq("m-dev"))
  }

  test("C5+C6: second-precision timestamps get padded then parsed; millis truncate") {
    val rows = Seq(
      Fixtures.logRow("m1", "-48", "u1", "c1", "2019-06-01T01:43:09Z", // no millis
        "purchase", """{"goodsCode": ["g1"], "goodsName": ["n1"]}"""),
      Fixtures.logRow("m2", "-48", "u2", "c2", "2019-06-01T01:43:09.999Z", // millis dropped
        "purchase", """{"goodsCode": ["g2"], "goodsName": ["n2"]}"""))
    val out = Pipeline.preJoin(Fixtures.logs(rows), Fixtures.types)
    assert(rowSeq(out.select("transaction_time")).flatten.toSet == Set("10:43:09"))
  }

  test("C8 quirk: comma scrub also eats the adjacent non-quote char") {
    val rows = Seq(
      Fixtures.logRow("m1", "-48", "u1", "c1", "2019-06-01T01:43:09.000Z",
        "purchase", """{"goodsCode": ["a,b"], "goodsName": ["n1"]}"""))
    val out = Pipeline.preJoin(Fixtures.logs(rows), Fixtures.types)
    // json_tuple yields ["a,b"]; the comma sits between non-quote chars
    // a and b, so the regex eats `a,` → ["b"]
    assert(rowSeq(out.select("productCode")).flatten == Seq("b"))
  }

  test("C10: explode_outer keeps rows whose product array is null") {
    val rows = Seq(
      Fixtures.logRow("m1", "4550", "u1", "c1", "2019-06-01T01:43:09.000Z",
        "purchase", """{"other": 1}""")) // no productCode/productName keys
    val out = Pipeline.preJoin(Fixtures.logs(rows), Fixtures.types)
    assert(out.count() == 1)
    assert(rowSeq(out.select("productCode")).flatten == Seq(null))
  }

  test("C12: USER_ID truncated to 100 chars") {
    val longId = "u" * 150
    val rows = Seq(
      Fixtures.logRow("m1", "-48", longId, "c1", "2019-06-01T01:43:09.000Z",
        "purchase", """{"goodsCode": ["g1"], "goodsName": ["n1"]}"""))
    val cats = Fixtures.categories(Seq(Fixtures.catRow("-48", "g1", "x")))
    val out = Pipeline.transformData(Fixtures.logs(rows), cats, Fixtures.types)
    assert(rowSeq(out.select("USER_ID")).flatten == Seq("u" * 100))
  }

  test("C3 (type2): view rows take productCode from last og:url segment") {
    val rows = Seq(
      Fixtures.logRow("m1", "155138", "u1", "c1", "2019-06-01T01:43:09.000Z",
        "view", """{"og:url": "http://shop/p/12345", "og:title": "Widget"}"""))
    val out = Pipeline.preJoin(Fixtures.logs(rows), Fixtures.types)
    assert(rowSeq(out.select("productCode", "productName")) ==
      Seq(Seq("12345", "Widget")))
  }

  test("C2 (type1): cart rows use goodsCode/name keys") {
    val rows = Seq(
      Fixtures.logRow("m1", "-48", "u1", "c1", "2019-06-01T01:43:09.000Z",
        "cart", """{"goodsCode": ["g1"], "name": ["CartName"]}"""))
    val out = Pipeline.preJoin(Fixtures.logs(rows), Fixtures.types)
    assert(rowSeq(out.select("productCode", "productName")) ==
      Seq(Seq("g1", "CartName")))
  }

  test("C1 (default): view rows use rb:itemId/rb:itemName keys") {
    val rows = Seq(
      Fixtures.logRow("m1", "154992", "u1", "c1", "2019-06-01T01:43:09.000Z",
        "view", """{"rb:itemId": "rb1", "rb:itemName": "RbName"}"""))
    val out = Pipeline.preJoin(Fixtures.logs(rows), Fixtures.types)
    assert(rowSeq(out.select("productCode", "productName")) ==
      Seq(Seq("rb1", "RbName")))
  }

  test("typed pipeline returns Dataset[EtlResult] with identical rows") {
    val cats = Fixtures.categories(Seq(Fixtures.catRow("-48", "-48-pc1", "a")))
    val typed = Pipeline.transformDataTyped(Fixtures.goldenLogs, cats, Fixtures.types)
    val results: Seq[EtlResult] = typed.collect().toSeq
    assert(results.map(_.USER_ID) == Seq("uid-3"))
    assert(results.head.ITEM_CODE == "-48-pc1")
    assert(results.head.CAT1 == "c1-a")
  }

  test("C13: duplicate rows collapse") {
    val dup = Fixtures.logRow("m1", "-48", "u1", "c1", "2019-06-01T01:43:09.000Z",
      "purchase", """{"goodsCode": ["g1"], "goodsName": ["n1"]}""")
    val cats = Fixtures.categories(Seq(Fixtures.catRow("-48", "g1", "x")))
    val out = Pipeline.transformData(Fixtures.logs(Seq(dup, dup)), cats, Fixtures.types)
    assert(out.count() == 1)
  }
}
