package graft.core

import java.nio.file.Files

import org.apache.spark.sql.types._

import graft.SparkTestBase

/** Schema version history — the reference's SchemaInfo ids (ids begin at
  * 1, +1 per schema change, fluss-common/.../metadata/SchemaInfo.java:27)
  * and the Admin.getTableSchema(path[, schemaId]) surface.
  */
class SchemaHistorySpec extends SparkTestBase {

  private def newCatalog() =
    new Catalog(Files.createTempDirectory("graft-schema-wh").toString, spark)

  private val schema = StructType(Seq(
    StructField("k", LongType),
    StructField("v", IntegerType)))

  test("create records schema id 1; each ADD COLUMN increments") {
    val cat = newCatalog()
    cat.createTable("db", "s1", TableDescriptor(schema, primaryKey = Seq("k")))
    assert(cat.getTableSchema("db", "s1") == (schema, 1))
    cat.addColumn("db", "s1", StructField("a", StringType, nullable = true))
    cat.addColumn("db", "s1", StructField("b", DoubleType, nullable = true))
    val all = cat.listTableSchemas("db", "s1")
    assert(all.map(_._1) == Seq(1, 2, 3))
    assert(all.map(_._2.fieldNames.length) == Seq(2, 3, 4))
    // every recorded version is retrievable by id, bit-exact
    assert(cat.getTableSchema("db", "s1", 1) == schema)
    assert(cat.getTableSchema("db", "s1", 3).fieldNames.toSeq ==
      Seq("k", "v", "a", "b"))
    assert(cat.getTableSchema("db", "s1")._2 == 3)
    // unrecorded ids fail loudly with the recorded range
    val e = intercept[IllegalArgumentException] {
      cat.getTableSchema("db", "s1", 9)
    }
    assert(e.getMessage.contains("1..3"))
  }

  test("pre-history tables read as version 1 and back-fill on ALTER") {
    val cat = newCatalog()
    cat.createTable("db", "s2", TableDescriptor(schema, primaryKey = Seq("k")))
    // simulate a table created before history recording existed
    WarehouseIO.deleteRecursively(s"${cat.warehouse}/db/s2/_schemas")
    assert(cat.listTableSchemas("db", "s2") == Seq((1, schema, 0L)))
    assert(cat.getTableSchema("db", "s2") == (schema, 1))
    // first ALTER back-fills the pre-change schema as id 1
    cat.addColumn("db", "s2", StructField("a", StringType, nullable = true))
    val all = cat.listTableSchemas("db", "s2")
    assert(all.map(_._1) == Seq(1, 2))
    assert(all.head._2 == schema)
    assert(all.last._2.fieldNames.toSeq == Seq("k", "v", "a"))
  }
}
