package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys.
  *
  * AQE's skew-join split handles sort-merge skew at runtime; salting
  * is the plan-level tool when one key dominates (the classic
  * power-law user_id): the big side gets a salt in [0, salts), the
  * small side is replicated once per salt value, and the join key
  * becomes (key, salt) — hot keys spread over `salts` tasks instead
  * of one straggler.
  *
  * Correctness is oracle-checked (`j6_salted_join` compares against
  * the plain-join SQL): every big-side row matches exactly one
  * replica of its small-side row, so the salted join is row-for-row
  * equal to the plain join.
  */
object Skew {

  /** Inner equi-join with a salted key. `salts` multiplies the small
    * side, so keep it ~8-32: enough to break a straggler, cheap to
    * replicate a broadcastable dim.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 salts: Int = 16): DataFrame = {
    require(salts > 0)
    // salt from a per-row id: spreads rows of the SAME key; which salt
    // a row gets is irrelevant to correctness, only its distribution
    val saltedBig = big.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)).cast("int"))
    val expandedSmall = small.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(expandedSmall, Seq(key, "_salt")).drop("_salt")
  }
}
