package graft.api

import org.apache.spark.sql.types._

/** pandas-dtype view of a Spark schema plus per-aggregation capability
  * rules — the Spark re-expression of eland's capability matrix
  * (eland/field_mappings.py:128-181) and ES→pandas dtype map
  * (ES_DTYPE_TO_PD_DTYPE, eland/field_mappings.py:152-167).
  */
object PdDtypes {

  def pdDtype(dt: DataType): String = dt match {
    case LongType | IntegerType | ShortType | ByteType    => "int64"
    case DoubleType | FloatType                           => "float64"
    case BooleanType                                      => "bool"
    case TimestampType | TimestampNTZType | DateType      => "datetime64[ns]"
    case _                                                => "object"
  }

  def isNumeric(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _              => false
  }

  def isTemporal(dt: DataType): Boolean = dt match {
    case TimestampType | TimestampNTZType | DateType => true
    case _                                           => false
  }

  /** Aggregation/field compatibility, mirroring
    * Field.is_es_agg_compatible (eland/field_mappings.py:96-118):
    * numerics take everything; bools sum/mean like ints; timestamps only
    * min/max/mean/median/quantile; strings only count/nunique/mode.
    */
  def aggCompatible(agg: String, dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case BooleanType =>
      Set("count", "nunique", "sum", "mean", "min", "max", "mode")(agg)
    case TimestampType | TimestampNTZType | DateType =>
      Set("count", "nunique", "min", "max", "mean", "median", "quantile", "mode")(agg)
    case _ =>
      Set("count", "nunique", "mode")(agg)
  }
}
