package graft.sources

import org.apache.spark.sql.types.Decimal
import org.apache.spark.sql.vectorized.{ColumnarArray, ColumnarMap, ColumnVector}
import org.apache.spark.unsafe.types.{CalendarInterval, GeographyVal, GeometryVal, UTF8String}

/** A zero-copy "kept rows" view over a delegate [[ColumnVector]]: row
  * `i` of this vector is row `mapping(i)` of the delegate — the
  * vectorized merge-on-read subtraction shape (Iceberg's
  * `ColumnVectorWithFilter` / deletion-vector read path, re-expressed
  * over Spark's public vector API; see
  * [[LakeCatalog.RowIdxSkipColumnarReader]]). Children map through the
  * SAME row mapping (struct fields share their parent's row ids), and
  * array/map accessors delegate with the mapped ordinal, so nested data
  * rides the delegate's underlying buffers untouched.
  *
  * `close()` is a no-op: the delegate vectors belong to the parquet
  * reader's reusable batch, which the reader itself closes — a consumer
  * closing the wrapper batch must not tear down buffers the NEXT batch
  * iteration still owns.
  *
  * `hasNull` may over-report (it answers for the whole delegate batch,
  * kept rows included or not) — safe: consumers use it only to pick the
  * null-checking code path. `numNulls` answers exactly, by scan.
  */
private[sources] final class MorMappedColumnVector(
    inner: ColumnVector, mapping: Array[Int])
    extends ColumnVector(inner.dataType()) {

  override def close(): Unit = ()
  override def hasNull: Boolean = inner.hasNull
  override def numNulls(): Int = {
    var c = 0
    var i = 0
    while (i < mapping.length) {
      if (inner.isNullAt(mapping(i))) c += 1
      i += 1
    }
    c
  }

  override def isNullAt(i: Int): Boolean = inner.isNullAt(mapping(i))
  override def getBoolean(i: Int): Boolean = inner.getBoolean(mapping(i))
  override def getByte(i: Int): Byte = inner.getByte(mapping(i))
  override def getShort(i: Int): Short = inner.getShort(mapping(i))
  override def getInt(i: Int): Int = inner.getInt(mapping(i))
  override def getLong(i: Int): Long = inner.getLong(mapping(i))
  override def getFloat(i: Int): Float = inner.getFloat(mapping(i))
  override def getDouble(i: Int): Double = inner.getDouble(mapping(i))
  override def getArray(i: Int): ColumnarArray = inner.getArray(mapping(i))
  override def getMap(i: Int): ColumnarMap = inner.getMap(mapping(i))
  override def getDecimal(i: Int, precision: Int, scale: Int): Decimal =
    inner.getDecimal(mapping(i), precision, scale)
  override def getUTF8String(i: Int): UTF8String =
    inner.getUTF8String(mapping(i))
  override def getBinary(i: Int): Array[Byte] = inner.getBinary(mapping(i))
  override def getInterval(i: Int): CalendarInterval =
    inner.getInterval(mapping(i))
  override def getGeography(i: Int): GeographyVal =
    inner.getGeography(mapping(i))
  override def getGeometry(i: Int): GeometryVal =
    inner.getGeometry(mapping(i))
  override def getChild(ordinal: Int): ColumnVector =
    new MorMappedColumnVector(inner.getChild(ordinal), mapping)
}
