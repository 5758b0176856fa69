package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Geo

/** Cell-partitioned GEO layout — how a radius query survives 100 TB:
  * points are written once partitioned by their [[Geo.cellId]] grid
  * cell (the geohash-grid analog of [[graft.Tables.savePartitioned]]'s
  * year layout), and a `geo_distance` read enumerates the candidate
  * cells DRIVER-SIDE ([[Geo.cellsWithinRadius]] — a provably covering
  * superset) so the scan prunes partition directories at planning
  * time and the exact haversine verify touches only the disk's
  * neighborhood. Without the layout, every radius query is a full
  * corpus scan (f27's shape — right for ad-hoc analytics, wrong for a
  * serving workload); with it, cost is O(points near the origin).
  *
  * The grid resolution and the point column ride a one-row
  * `_geo_meta` table beside the data (underscore-prefixed, so plain
  * parquet directory readers skip it), which is how the read path is
  * guaranteed to prune with the SAME cell function the writer used —
  * the InvertedIndex stats discipline.
  *
  * NULL points land in the default partition and can never satisfy a
  * radius predicate (NULL distance), matching ES's missing-field
  * semantics.
  */
object GeoLayout {

  /** Write `df` partitioned by the `cellDeg`-degree grid cell of
    * `pointCol` (a lat/lon struct column). Repartitioned by cell
    * before the write so each cell directory is a handful of files,
    * not one per input task (the small-files discipline).
    */
  def writeCellPartitioned(df: DataFrame, pointCol: String,
                           dir: String, cellDeg: Double): Unit = {
    require(df.columns.contains(pointCol), s"no column $pointCol")
    df.withColumn("geo_cell", Geo.cellId(col(pointCol), cellDeg))
      .repartition(col("geo_cell"))
      .write.mode("overwrite").partitionBy("geo_cell").parquet(dir)
    val spark = df.sparkSession
    import spark.implicits._
    Seq((cellDeg, pointCol)).toDF("cell_deg", "point_col")
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/_geo_meta")
  }

  /** All rows within `radiusMeters` of the origin: the candidate-cell
    * IN filter prunes partition directories at planning time
    * (spec-pinned), then the exact haversine keeps only true hits —
    * results are IDENTICAL to a full-scan radius filter (the gc1
    * oracle proves it), only the read is bounded.
    */
  def readWithinRadius(spark: SparkSession, dir: String,
                       originLat: Double, originLon: Double,
                       radiusMeters: Double): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(
      new org.apache.hadoop.fs.Path(s"$dir/_geo_meta/_SUCCESS")),
      s"$dir has no committed _geo_meta — writeCellPartitioned() first")
    val meta = spark.read.parquet(s"$dir/_geo_meta").head()
    val cellDeg = meta.getAs[Double]("cell_deg")
    val pointCol = meta.getAs[String]("point_col")
    val cells = Geo.cellsWithinRadius(originLat, originLon,
      radiusMeters, cellDeg)
    spark.read.parquet(dir)
      .filter(col("geo_cell").isInCollection(cells))
      .filter(Geo.distanceToMeters(col(pointCol), originLat, originLon)
        <= radiusMeters)
  }
}
