package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestBase {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[8]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // hash path for the LatestRow PK collapse (buffer = one row)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1000000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // engine streaming-state defaults (RocksDB + changelog ckpt): every
    // streaming spec exercises the production state store
    graft.streaming.GraftStream.applyScaleStateStore(s)
    s
  }
}

abstract class SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestBase.spark

  /** Order-insensitive row comparison (multisets). */
  def assertSameRows(got: Seq[org.apache.spark.sql.Row],
      exp: Seq[org.apache.spark.sql.Row]): Unit = {
    val g = got.map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|"))
    val e = exp.map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|"))
    assert(g == e, s"\ngot: ${g.mkString("\n     ")}\nexp: ${e.mkString("\n     ")}")
  }
}
