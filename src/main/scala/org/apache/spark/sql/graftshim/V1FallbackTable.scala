package org.apache.spark.sql.graftshim

import org.apache.spark.sql.connector.catalog.V2TableWithV1Fallback

/** Public re-export of `V2TableWithV1Fallback` (which is `private[sql]`):
  * the interface Spark's analyzer and DataStreamWriter consult to route
  * STREAMING reads/writes over a DSv2 catalog table to its V1 provider —
  * the bridge Delta Lake's DeltaTableV2 rides for `readStream.table` /
  * `writeStream.toTable`. Batch paths never look at it. Like
  * [[StreamShims]], this trait lives under `org.apache.spark.sql` solely
  * to satisfy the access modifier; it adds no behavior.
  */
trait V1FallbackTable extends V2TableWithV1Fallback
