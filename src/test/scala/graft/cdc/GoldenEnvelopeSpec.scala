package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Golden fixture test (FIXTURES.md §A3): the reference's documented DML
  * probe (`README.md:858-874` — insert 'Test Product' @99.99, update to
  * 149.99, delete; plus a second never-deleted key) replayed through
  * envelope_parse → unwrap → apply_changes. Expected: key 1 fully
  * disappears, key 2 survives; prefixes materialize the intermediate
  * states; unwrap keeps delete rows flagged `__deleted='true'` matching
  * the observed sink table (`.idea/dataSources/d5573bb8-...xml:4132-4209`).
  */
class GoldenEnvelopeSpec extends SparkSpec {

  private def env(
      op: String, scn: Long, id: Long, name: String, desc: String,
      price: String, stock: Long): String = {
    val row =
      s"""{"ID":$id,"NAME":"$name","DESCRIPTION":"$desc","PRICE":$price,
         |"STOCK":$stock,"CREATED_DATE":"2024-01-01T00:00:00Z",
         |"UPDATED_DATE":"2024-01-01T00:00:00Z"}""".stripMargin.replace("\n", "")
    val (before, after) =
      if (op == "d") (row, "null")
      else if (op == "u") (row, row)
      else ("null", row)
    s"""{"before":$before,"after":$after,"op":"$op","ts_ms":${1700000000000L + scn},
       |"source":{"scn":$scn,"xid":"tx$scn","rid":"r$scn","db":"ORACLE",
       |"schema":"OLR_DB","table":"PRODUCT"}}""".stripMargin.replace("\n", "")
  }

  // the probe, ascending scn: c(99.99) → u(149.99) → d ; key 2 inserted, kept
  private val probe = Seq(
    env("c", 1, 1, "Test Product", "CDC Test", "99.99", 10),
    env("u", 2, 1, "Test Product", "CDC Test", "149.99", 10),
    env("c", 3, 2, "Other Product", "kept", "10.00", 5),
    env("d", 4, 1, "Test Product", "CDC Test", "149.99", 10)
  )

  private def parsed(jsons: Seq[String]) = {
    val s = spark
    import s.implicits._
    Ops.envelopeParse(jsons.toDF("value"), "value", Envelope.productRow)
  }

  private def materialized(jsons: Seq[String]) = {
    val flat = Ops.unwrap(Ops.tableFilter(parsed(jsons), "OLR_DB", "PRODUCT"))
    Ops.applyChanges(flat, keys = Seq("ID"), ordering = Seq("scn"))
  }

  test("full probe: deleted key gone, second key survives") {
    val rows = materialized(probe).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert(r.getAs[Long]("ID") == 2L)
    assert(r.getAs[String]("NAME") == "Other Product")
    assert(r.getAs[java.math.BigDecimal]("PRICE").toPlainString == "10.00")
  }

  test("prefix after insert: one row at 99.99") {
    val rows = materialized(probe.take(1)).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[java.math.BigDecimal]("PRICE").toPlainString == "99.99")
  }

  test("prefix after update: one row at 149.99") {
    val rows = materialized(probe.take(2)).collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[java.math.BigDecimal]("PRICE").toPlainString == "149.99")
  }

  test("unwrap rewrites deletes (keeps the row, flags __deleted)") {
    val flat = Ops.unwrap(parsed(probe))
    val byScn = flat.orderBy("scn").collect()
    assert(byScn.length == 4)
    assert(byScn.map(_.getAs[String]("__deleted")).toSeq ==
      Seq("false", "false", "false", "true"))
    // the delete row carries the before-image payload
    assert(byScn.last.getAs[String]("NAME") == "Test Product")
  }

  test("table_filter drops foreign tables before any processing") {
    val foreign = env("c", 9, 99, "X", "Y", "1.00", 1)
      .replace(""""table":"PRODUCT"""", """"table":"OTHER"""")
    val kept = Ops.tableFilter(parsed(probe :+ foreign), "OLR_DB", "PRODUCT")
    assert(kept.count() == 4)
  }
}
