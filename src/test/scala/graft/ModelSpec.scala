package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model._

class ModelSpec extends AnyFunSuite {

  test("Relationship renders and parses the reference edge format") {
    val r = Relationship("orders", "user_id", "users", "id")
    assert(r.render == "orders.user_id -> users.id")
    assert(Relationship.parse(r.render).contains(r))
    // the reference also uses the arrow glyph (db_connector.py:124-126)
    assert(Relationship.parse("a.x → b.y").contains(Relationship("a", "x", "b", "y")))
    assert(Relationship.parse("nonsense").isEmpty)
  }

  test("CatalogModel table lookup and PK extraction") {
    val cat = graft.catalog.SampleCatalogs.postgresEcommerce
    assert(cat.tables.map(_.name) ==
      Seq("users", "products", "categories", "orders", "order_items"))
    assert(cat.table("users").get.pkColumns == Seq("id"))
    assert(cat.table("missing").isEmpty)
    assert(cat.constraints.mandatoryFilters == Seq("is_deleted = false"))
  }

  test("GenerateResult serializes to the reference wire contract (golden)") {
    // shapes captured from the reference's no-key fallback response
    // (sql_generator.py:283-313) and response model (main.py:41-50)
    val r = GenerateResult(
      intentSummary = "사용자 요청: 최근 주문 10건 조회",
      sql = "SELECT * FROM orders ORDER BY created_at DESC LIMIT 10",
      assumptions = Seq("최근 순서는 created_at 기준입니다."),
      safetyNotes = Seq("LIMIT 10을 자동으로 추가하여 결과를 제한했습니다."),
      tablesUsed = Seq("orders"),
      etlPipeline = Some(EtlSpec(
        ExtractSpec(Seq("orders"), Seq("is_deleted = false")),
        Seq(TransformStep.NullDefault(Map.empty),
          TransformStep.DateStandardize("created_at"),
          TransformStep.TypeValidate("amount", "double")),
        LoadSpec("processed_orders", "append"))))
    val golden =
      """{"intent_summary": "사용자 요청: 최근 주문 10건 조회", """ +
      """"sql": "SELECT * FROM orders ORDER BY created_at DESC LIMIT 10", """ +
      """"assumptions": ["최근 순서는 created_at 기준입니다."], """ +
      """"safety_notes": ["LIMIT 10을 자동으로 추가하여 결과를 제한했습니다."], """ +
      """"tables_used": ["orders"], "is_blocked": false, "block_reason": null, """ +
      """"etl_pipeline": {"extract": {"source_tables": ["orders"], """ +
      """"conditions": "is_deleted = false"}, """ +
      """"transform": ["NULL 값 기본값 처리","날짜 형식 표준화","데이터 타입 검증"], """ +
      """"load": {"target_table": "processed_orders", "write_mode": "append"}}}"""
    assert(r.toJsonString == golden)

    // field-for-field: parse as real JSON, assert snake_case keys in
    // the reference's declaration order
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = om.readTree(r.toJsonString)
    val keys = {
      val it = node.fieldNames(); val b = Seq.newBuilder[String]
      while (it.hasNext) b += it.next(); b.result()
    }
    assert(keys == Seq("intent_summary", "sql", "assumptions",
      "safety_notes", "tables_used", "is_blocked", "block_reason",
      "etl_pipeline"))
    assert(node.get("etl_pipeline").get("extract").get("source_tables")
      .get(0).asText() == "orders")
    assert(node.get("etl_pipeline").get("load").get("write_mode")
      .asText() == "append")

    // blocked responses: block_reason a string, etl_pipeline key ABSENT
    val blocked = GenerateResult("요청이 차단되었습니다", "",
      isBlocked = true, blockReason = Some("destructive keyword: drop"))
    assert(blocked.toJsonString ==
      """{"intent_summary": "요청이 차단되었습니다", "sql": "", """ +
      """"assumptions": [], "safety_notes": [], "tables_used": [], """ +
      """"is_blocked": true, "block_reason": "destructive keyword: drop"}""")
    assert(!om.readTree(blocked.toJsonString).has("etl_pipeline"))
  }

  test("ResultSet serializes to the reference wire contract (golden)") {
    // shape captured from db_connector.py:238-243 (returns_rows branch)
    val rs = ResultSet(
      columns = Seq("id", "name"),
      data = Seq(Map("id" -> "1", "name" -> "위젯"),
        Map("id" -> "2", "name" -> null)),
      rowCount = 2)
    assert(rs.toJsonString ==
      """{"success": true, "columns": ["id","name"], """ +
      """"data": [{"id": "1","name": "위젯"},{"id": "2","name": null}], """ +
      """"row_count": 2}""")
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = om.readTree(rs.toJsonString)
    val keys = {
      val it = node.fieldNames(); val b = Seq.newBuilder[String]
      while (it.hasNext) b += it.next(); b.result()
    }
    assert(keys == Seq("success", "columns", "data", "row_count"))
    assert(node.get("data").get(1).get("name").isNull)
  }

  test("mysql HR catalog carries ENUM/TIME types and self-FK") {
    val cat = graft.catalog.SampleCatalogs.mysqlHr
    val emp = cat.table("employees").get
    assert(emp.columns.find(_.name == "manager_id").get.foreignKey
      .contains("employees.id"))
    val att = cat.table("attendance").get
    assert(att.columns.find(_.name == "check_in").get.dataType == "TIME")
    assert(cat.constraints.validStatusValues("employees.status")
      .contains("resigned"))
  }
}
