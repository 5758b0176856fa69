package graft.api

import org.apache.spark.sql.types._

/** ES-style searchable/aggregatable capability matrix over a Spark
  * schema — the Spark re-expression of eland's FieldMappings capability
  * matrix and `.keyword` multi-field substitution
  * (eland/field_mappings.py:431-458: build per-field
  * is_searchable/is_aggregatable rows, then fall back to the
  * `<field>.keyword` sub-field as the aggregatable name for analyzed
  * text).
  *
  * In ES, a dynamically-mapped JSON string becomes `text` (analyzed,
  * searchable, NOT aggregatable) with a `.keyword` sub-field (exact,
  * aggregatable). Parquet has one physical string column, so the model
  * here is: a string column's es dtype defaults to "text", its
  * aggregatable name is `<col>.keyword`, and both names resolve to the
  * same physical column — the matrix preserves eland's semantics
  * (es_match refuses keyword/non-text fields, aggregations advertise
  * the keyword name) without duplicating data.
  */
object FieldCaps {

  /** One row of the capability matrix (eland's column_labels:
    * es_field_name, is_source, es_dtype, es_date_format, pd_dtype,
    * is_searchable, is_aggregatable, is_scripted,
    * aggregatable_es_field_name — minus the ES-transport-only ones).
    */
  final case class FieldCapability(
      column: String,
      esDtype: String,
      pdDtype: String,
      isSearchable: Boolean,
      isAggregatable: Boolean,
      /** The name aggregations should address — `<col>.keyword` for
        * analyzed text (same physical column), the column itself
        * otherwise, None for a text field explicitly mapped without a
        * keyword sub-field.
        */
      aggregatableName: Option[String])

  /** Default Spark→ES dtype mapping (the reverse of eland's
    * ES_DTYPE_TO_PD_DTYPE, eland/field_mappings.py:152-167).
    */
  def defaultEsDtype(dt: DataType): String = dt match {
    case LongType                           => "long"
    case IntegerType                        => "integer"
    case ShortType                          => "short"
    case ByteType                           => "byte"
    case DoubleType                         => "double"
    case FloatType                          => "float"
    case BooleanType                        => "boolean"
    case TimestampType | TimestampNTZType | DateType => "date"
    case BinaryType                         => "binary"
    case StringType                         => "text"
    case ArrayType(inner, _)                => defaultEsDtype(inner)
    case _                                  => "object"
  }

  /** Build the matrix. `overrides` pins a column's es dtype (e.g.
    * "keyword" for an exact-match string column, or "text_no_keyword"
    * for analyzed text WITHOUT the keyword sub-field — eland surfaces
    * such fields as non-aggregatable).
    */
  def matrix(schema: StructType,
             overrides: Map[String, String] = Map.empty): Seq[FieldCapability] =
    schema.fields.toSeq.map { f =>
      val es = overrides.getOrElse(f.name, defaultEsDtype(f.dataType))
      es match {
        case "text" =>
          FieldCapability(f.name, "text", PdDtypes.pdDtype(f.dataType),
            isSearchable = true, isAggregatable = false,
            aggregatableName = Some(s"${f.name}.keyword"))
        case "text_no_keyword" =>
          FieldCapability(f.name, "text", PdDtypes.pdDtype(f.dataType),
            isSearchable = true, isAggregatable = false,
            aggregatableName = None)
        case other =>
          // keyword / numerics / dates / booleans: exact value fields —
          // searchable and aggregatable under their own name
          FieldCapability(f.name, other, PdDtypes.pdDtype(f.dataType),
            isSearchable = true, isAggregatable = true,
            aggregatableName = Some(f.name))
      }
    }
}
