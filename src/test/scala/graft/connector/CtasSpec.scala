package graft.connector

import graft.SparkTestBase
import java.nio.file.Files

class CtasSpec extends SparkTestBase {
  test("CTAS and RTAS through the catalog") {
    val wh = Files.createTempDirectory("graft-ctas-wh").toString
    spark.conf.set("spark.sql.catalog.gctas", "graft.connector.GraftCatalog")
    spark.conf.set("spark.sql.catalog.gctas.warehouse", wh)
    spark.sql("CREATE TABLE gctas.db.src (k BIGINT, v INT) USING graft " +
      "TBLPROPERTIES ('bucket.key' = 'k')")
    spark.sql("INSERT INTO gctas.db.src VALUES (1, 1), (2, 2)")
    spark.sql("CREATE TABLE gctas.db.dst USING graft " +
      "TBLPROPERTIES ('bucket.key' = 'k') AS SELECT * FROM gctas.db.src")
    assert(spark.sql("SELECT count(*) FROM gctas.db.dst").head.getLong(0) == 2)
  }
}
