package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data LAYOUT: Z-order (Morton) clustering, the
  * standard lakehouse recipe (Delta OPTIMIZE ZORDER BY, Hudi/Iceberg
  * sort orders) for making parquet min/max stats selective on SEVERAL
  * columns at once. A single-column sort gives perfect file skipping
  * on that column and none on any other; interleaving the bits of k
  * normalized columns gives every column ~1/k of its bits of
  * selectivity — a query constraining ANY of the layout columns
  * prunes most files. At 100 TB the scan is the workload, and
  * pruning files beats every downstream optimization.
  *
  * Morton 1966 ("A computer oriented geodetic data base..."); the
  * equi-width normalize-then-interleave spelling below is the one
  * public lakehouse implementations use for integer keys.
  *
  * Everything here is exact integer arithmetic (bucket = integral
  * `div`, interleave = shift/and/or folds — all codegen'd, fully
  * engine-replayable); min/max normalization bounds ride the plan as
  * a 1-row broadcast crossJoin, never a driver collect.
  */
object Layout {

  /** Bit-interleave already-bucketed non-negative integer columns
    * (each in [0, 2^bits)): bit j of column i lands at output bit
    * j * n + i, so all columns share the high bits fairly. n * bits
    * must fit a signed long (<= 62 enforced).
    */
  def interleaveBits(cols: Seq[Column], bits: Int): Column = {
    val n = cols.size
    require(n >= 1, "interleaveBits: need at least one column")
    require(bits >= 1 && n * bits <= 62,
      s"interleaveBits: $n cols x $bits bits exceeds a signed long")
    cols.zipWithIndex.map { case (c, i) =>
      val l = c.cast("long")
      (0 until bits).map { j =>
        shiftleft(shiftright(l, j).bitwiseAND(lit(1L)), j * n + i)
      }.reduce(_ bitwiseOR _)
    }.reduce(_ bitwiseOR _)
  }

  /** `df` plus a `zkey` column: each layout column equi-width
    * bucketed to [0, 2^bits) between its own min and max (exact
    * integral arithmetic: (v - min) * (2^bits - 1) div (max - min);
    * a constant column buckets to 0), buckets bit-interleaved. The
    * min/max frame is ONE row, crossJoined in-plan (broadcast).
    * Layout columns must be integral (cast timestamps/doubles to a
    * fixed-point integer first — exactness is the contract here).
    */
  def withZorderKey(df: DataFrame, colNames: Seq[String],
                    bits: Int = 16): DataFrame = {
    require(colNames.nonEmpty, "withZorderKey: no layout columns")
    // the bucket expressions below splice the name into expr() SQL
    // (backtick-quoted reference + inside a quoted raise_error
    // literal); long integer division (`div`) has no Column-API
    // spelling, so the splice stays — a name that could break the
    // parse or corrupt the error SQL is refused loudly instead
    colNames.foreach { c =>
      require(!c.exists(ch => ch == '`' || ch == '\'' || ch == '\\'),
        s"withZorderKey: column name <$c> contains a backtick/quote/" +
          "backslash - rename (withColumnRenamed) before layout")
    }
    colNames.foreach(Checks.requireIntegral(df, _, "withZorderKey",
      "cast timestamps/doubles to a fixed-point integer first"))
    val maxBucket = (1L << bits) - 1
    val bounds = df.agg(
      min(col(colNames.head)).cast("long").as("_zmin0"),
      (max(col(colNames.head)).cast("long").as("_zmax0") +:
        colNames.tail.zipWithIndex.flatMap { case (c, i0) =>
          val i = i0 + 1
          Seq(min(col(c)).cast("long").as(s"_zmin$i"),
            max(col(c)).cast("long").as(s"_zmax$i"))
        }): _*)
    val joined = df.crossJoin(broadcast(bounds))
    // two exact regimes, chosen per column from the bounds row:
    //  - span small enough that (v-min)*maxBucket fits a long: the
    //    scale-UP formula (small-span columns spread across the full
    //    bit range, keeping the interleave fair between columns)
    //  - wider spans: scale DOWN by an integer width (span div 2^bits
    //    + 1) — no multiplication, so epoch-micros timestamps and
    //    snowflake ids cannot overflow
    // a span that itself exceeds a signed long refuses loudly
    // (try_subtract guard) instead of wrapping into garbage keys
    // outer coalesce: a NULL layout VALUE buckets to 0 (a valid
    // interleave with the other columns' bits) rather than poisoning
    // the whole zkey to NULL; the raise_error branch still fires on a
    // bad SPAN because it throws, it does not return null
    val lim = Long.MaxValue / maxBucket
    val buckets = colNames.zipWithIndex.map { case (c, i) =>
      expr(
        s"""coalesce(CASE
           |  WHEN _zmax$i IS NULL OR _zmax$i = _zmin$i THEN 0L
           |  WHEN try_subtract(_zmax$i, _zmin$i) IS NULL
           |    THEN raise_error(
           |      'withZorderKey: range of $c exceeds a signed long')
           |  WHEN _zmax$i - _zmin$i <= ${lim}L
           |    THEN ((cast(`$c` as bigint) - _zmin$i) * ${maxBucket}L)
           |         div (_zmax$i - _zmin$i)
           |  ELSE (cast(`$c` as bigint) - _zmin$i)
           |       div ((_zmax$i - _zmin$i) div ${maxBucket}L + 1L)
           |END, 0L)""".stripMargin)
    }
    joined.withColumn("zkey", interleaveBits(buckets, bits))
      .drop(colNames.indices.flatMap(i =>
        Seq(s"_zmin$i", s"_zmax$i")): _*)
  }

  /** Physically cluster `df` by the Z-order of `colNames`: range
    * partition + sort on the interleaved key, so each output
    * partition (and the parquet files written from it) covers a
    * compact hyper-rectangle of the layout space — tight min/max
    * stats on EVERY layout column. One range shuffle, the same cost
    * as any global sort; the key is dropped from the result.
    */
  def zorderBy(df: DataFrame, colNames: Seq[String], bits: Int = 16,
               partitions: Int = 0): DataFrame = {
    val nPart =
      if (partitions > 0) partitions
      else df.sparkSession.sessionState.conf.numShufflePartitions
    withZorderKey(df, colNames, bits)
      .repartitionByRange(nPart, col("zkey"))
      .sortWithinPartitions("zkey")
      .drop("zkey")
  }
}
