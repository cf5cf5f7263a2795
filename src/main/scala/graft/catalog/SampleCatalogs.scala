package graft.catalog

import graft.model._

/** The reference's two embedded demo catalogs, re-expressed as
  * CatalogModel — golden-test fixtures for the planner/compiler contract
  * (FIXTURES.md §A; sample_metadata.py:6-163).
  */
object SampleCatalogs {

  /** SAMPLE_POSTGRES_ECOMMERCE (sample_metadata.py:6-81). */
  val postgresEcommerce: CatalogModel = CatalogModel(
    dbType = "postgresql",
    dbVersion = "15",
    tables = Seq(
      TableModel("users", "service users", Seq(
        ColumnModel("id", "SERIAL", nullable = false, primaryKey = true),
        ColumnModel("email", "VARCHAR(255)"),
        ColumnModel("username", "VARCHAR(100)"),
        ColumnModel("created_at", "TIMESTAMP"),
        ColumnModel("status", "VARCHAR(20)"),
        ColumnModel("is_deleted", "BOOLEAN"))),
      TableModel("products", "product catalog", Seq(
        ColumnModel("id", "SERIAL", nullable = false, primaryKey = true),
        ColumnModel("name", "VARCHAR(255)"),
        ColumnModel("category_id", "INTEGER",
          foreignKey = Some("categories.id")),
        ColumnModel("price", "DECIMAL(10,2)"),
        ColumnModel("stock", "INTEGER"),
        ColumnModel("is_deleted", "BOOLEAN"))),
      TableModel("categories", "product categories", Seq(
        ColumnModel("id", "SERIAL", nullable = false, primaryKey = true),
        ColumnModel("name", "VARCHAR(100)"),
        ColumnModel("parent_id", "INTEGER", foreignKey = Some("categories.id")))),
      TableModel("orders", "customer orders", Seq(
        ColumnModel("id", "SERIAL", nullable = false, primaryKey = true),
        ColumnModel("user_id", "INTEGER", foreignKey = Some("users.id")),
        ColumnModel("order_date", "TIMESTAMP"),
        ColumnModel("total_amount", "DECIMAL(12,2)"),
        ColumnModel("status", "VARCHAR(30)"),
        ColumnModel("shipping_address", "TEXT"))),
      TableModel("order_items", "order line items", Seq(
        ColumnModel("id", "SERIAL", nullable = false, primaryKey = true),
        ColumnModel("order_id", "INTEGER", foreignKey = Some("orders.id")),
        ColumnModel("product_id", "INTEGER", foreignKey = Some("products.id")),
        ColumnModel("quantity", "INTEGER"),
        ColumnModel("unit_price", "DECIMAL(10,2)")))),
    relationships = Seq(
      Relationship("products", "category_id", "categories", "id"),
      Relationship("categories", "parent_id", "categories", "id"),
      Relationship("orders", "user_id", "users", "id"),
      Relationship("order_items", "order_id", "orders", "id"),
      Relationship("order_items", "product_id", "products", "id")),
    constraints = Constraints(
      softDeleteRule = Some("is_deleted = false"),
      mandatoryFilters = Seq("is_deleted = false")))

  /** SAMPLE_MYSQL_HR (sample_metadata.py:83-163). Note the TIME columns —
    * no Spark TIME type; carried as "TIME" strings per SURVEY.md §1.2.
    */
  val mysqlHr: CatalogModel = CatalogModel(
    dbType = "mysql",
    dbVersion = "8",
    tables = Seq(
      TableModel("employees", "employee roster", Seq(
        ColumnModel("id", "INT AUTO_INCREMENT", nullable = false,
          primaryKey = true),
        ColumnModel("name", "VARCHAR(100)"),
        ColumnModel("email", "VARCHAR(255)"),
        ColumnModel("department_id", "INT", foreignKey = Some("departments.id")),
        ColumnModel("position", "VARCHAR(100)"),
        ColumnModel("salary", "DECIMAL(12,2)"),
        ColumnModel("hire_date", "DATE"),
        ColumnModel("manager_id", "INT", foreignKey = Some("employees.id")),
        ColumnModel("status", "ENUM('active','resigned','on_leave')"))),
      TableModel("departments", "org departments", Seq(
        ColumnModel("id", "INT AUTO_INCREMENT", nullable = false,
          primaryKey = true),
        ColumnModel("name", "VARCHAR(100)"),
        ColumnModel("budget", "DECIMAL(15,2)"),
        ColumnModel("head_id", "INT", foreignKey = Some("employees.id")))),
      TableModel("attendance", "daily attendance", Seq(
        ColumnModel("id", "INT AUTO_INCREMENT", nullable = false,
          primaryKey = true),
        ColumnModel("employee_id", "INT", foreignKey = Some("employees.id")),
        ColumnModel("date", "DATE"),
        ColumnModel("check_in", "TIME"),
        ColumnModel("check_out", "TIME"),
        ColumnModel("status", "ENUM('present','absent','late','half_day')"))),
      TableModel("projects", "projects", Seq(
        ColumnModel("id", "INT AUTO_INCREMENT", nullable = false,
          primaryKey = true),
        ColumnModel("name", "VARCHAR(200)"),
        ColumnModel("department_id", "INT", foreignKey = Some("departments.id")),
        ColumnModel("start_date", "DATE"),
        ColumnModel("end_date", "DATE"),
        ColumnModel("status",
          "ENUM('planning','in_progress','completed','on_hold')"))),
      TableModel("project_members", "project membership", Seq(
        ColumnModel("id", "INT AUTO_INCREMENT", nullable = false,
          primaryKey = true),
        ColumnModel("project_id", "INT", foreignKey = Some("projects.id")),
        ColumnModel("employee_id", "INT", foreignKey = Some("employees.id")),
        ColumnModel("role", "VARCHAR(50)")))),
    relationships = Seq(
      Relationship("employees", "department_id", "departments", "id"),
      Relationship("employees", "manager_id", "employees", "id"),
      Relationship("departments", "head_id", "employees", "id"),
      Relationship("attendance", "employee_id", "employees", "id"),
      Relationship("projects", "department_id", "departments", "id"),
      Relationship("project_members", "project_id", "projects", "id"),
      Relationship("project_members", "employee_id", "employees", "id")),
    constraints = Constraints(
      validStatusValues = Map(
        "employees.status" -> Seq("active", "resigned", "on_leave")),
      mandatoryFilters = Seq("status != 'resigned'")))
}
