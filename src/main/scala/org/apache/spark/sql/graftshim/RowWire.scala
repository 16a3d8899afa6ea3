package org.apache.spark.sql.graftshim

import org.apache.spark.serializer.Serializer
import org.apache.spark.sql.execution.UnsafeRowSerializer

/** Bridge to Spark's Tungsten shuffle wire format. `UnsafeRowSerializer`
  * (what every SQL Exchange puts on the wire: raw row bytes, no
  * per-record object framing) is `private[sql]`, so this one-liner
  * re-export lives under `org.apache.spark.sql` like [[ArrowLane]];
  * it adds no behavior. Contract inherited from the Exchange usage:
  * pair keys must be Int partition ids and are NOT serialized —
  * anything the reduce side needs must ride in the row itself.
  */
object RowWire {
  def serializer(numFields: Int): Serializer = new UnsafeRowSerializer(numFields)
}
