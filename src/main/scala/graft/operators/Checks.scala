package graft.operators

import org.apache.spark.sql.DataFrame

/** Shared loud-refusal gates. One definition so the accepted type set
  * cannot drift between the operators that feed each other (the
  * connected-components facades, the z-order layout).
  */
private[graft] object Checks {

  /** Refuse non-integral columns where the operator's arithmetic
    * (long casts, exact bucket math) would otherwise turn values into
    * NULLs or garbage silently.
    */
  def requireIntegral(df: DataFrame, colName: String, who: String,
                      hint: String = ""): Unit = {
    import org.apache.spark.sql.types._
    val dt = df.schema(colName).dataType
    require(dt == ByteType || dt == ShortType || dt == IntegerType ||
      dt == LongType,
      s"$who: $colName is $dt — must be integral" +
        (if (hint.nonEmpty) s" ($hint)" else ""))
  }
}
