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
