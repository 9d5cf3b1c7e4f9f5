package graft.cdc

import graft.SparkSpec
import org.apache.spark.sql.types._

/** The golden materialized shape (FIXTURES.md A2): unwrap + wire-format
  * casts must reproduce the auto-created Postgres sink table of the
  * reference's live run — NUMBERs as strings (even the PK), dates as
  * epoch-ms bigint, `__deleted` as 'true'/'false' text.
  */
class WireFormatSpec extends SparkSpec {

  test("product envelope materializes to the observed sink schema") {
    val s = spark
    import s.implicits._
    val probe = Seq(
      """{"before":null,"after":{"ID":1,"NAME":"Test Product","DESCRIPTION":"CDC Test",
        |"PRICE":99.99,"STOCK":10,"CREATED_DATE":"2024-01-01T00:00:00Z",
        |"UPDATED_DATE":"2024-01-01T00:00:00Z"},"op":"c","ts_ms":1700000000000,
        |"source":{"scn":1,"xid":"t1","rid":"r1","db":"O","schema":"OLR_DB","table":"PRODUCT"}}"""
        .stripMargin.replace("\n", ""))
    val flat = Ops.unwrap(Ops.envelopeParse(probe.toDF("value"), "value", Envelope.productRow))
    val wire = Ops.toWireFormat(flat.drop("op"))
    val bySchema = wire.schema.fields.map(f => f.name -> f.dataType).toMap
    // FIXTURES.md A2 golden: products(ID text, NAME text, DESCRIPTION text,
    //   PRICE text, STOCK text, CREATED_DATE bigint, UPDATED_DATE bigint,
    //   __deleted text)
    assert(bySchema("ID") == StringType)
    assert(bySchema("NAME") == StringType)
    assert(bySchema("DESCRIPTION") == StringType)
    assert(bySchema("PRICE") == StringType)
    assert(bySchema("STOCK") == StringType)
    assert(bySchema("CREATED_DATE") == LongType)
    assert(bySchema("UPDATED_DATE") == LongType)
    assert(bySchema("__deleted") == StringType)
    val r = wire.collect().head
    assert(r.getAs[String]("ID") == "1")
    assert(r.getAs[String]("PRICE") == "99.99")
    assert(r.getAs[Long]("CREATED_DATE") == 1704067200000L)
    assert(r.getAs[String]("__deleted") == "false")
  }
}
